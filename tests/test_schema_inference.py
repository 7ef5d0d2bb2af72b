"""Sample-JSON schema inference + JSON decode — mirrors the
reference's decoder unit tests (crates/core/src/formats/decoders/
json.rs:51-149) and inference rules (utils/arrow_helpers.rs:232-296).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from denormalized_spark.sources.kafka import (
    decode_json_payload,
    infer_schema_from_json,
    to_kafka_json_rows,
)


def test_flat_types():
    s = infer_schema_from_json(
        '{"i": 3, "f": 1.5, "s": "x", "b": true, "z": null}'
    )
    assert s["i"].dataType == T.LongType()
    assert s["f"].dataType == T.DoubleType()
    assert s["s"].dataType == T.StringType()
    assert s["b"].dataType == T.BooleanType()
    # null → string (lossless upgrade; reference uses Arrow Null)
    assert s["z"].dataType == T.StringType()
    assert all(f.nullable for f in s.fields)


def test_integral_float_is_double():
    # JSON 2.0 arrives as float → Double (reference: integral check is
    # on the JSON token, 2.0 is a float token)
    s = infer_schema_from_json('{"x": 2.0}')
    assert s["x"].dataType == T.DoubleType()


def test_nested_struct_and_list():
    s = infer_schema_from_json(
        '{"gps": {"lat": 1.5, "lon": -2.5}, "readings": [1, 2, 3], "tags": ["a"]}'
    )
    assert isinstance(s["gps"].dataType, T.StructType)
    assert s["gps"].dataType["lat"].dataType == T.DoubleType()
    assert s["readings"].dataType == T.ArrayType(T.LongType(), True)
    assert s["tags"].dataType == T.ArrayType(T.StringType(), True)


def test_empty_list_defaults_string():
    s = infer_schema_from_json('{"xs": []}')
    assert s["xs"].dataType == T.ArrayType(T.StringType(), True)


def test_deep_nesting():
    s = infer_schema_from_json('{"a": {"b": {"c": 7}}}')
    assert s["a"].dataType["b"].dataType["c"].dataType == T.LongType()


def test_non_object_rejected():
    with pytest.raises(ValueError):
        infer_schema_from_json("[1, 2, 3]")


def test_invalid_json_rejected():
    with pytest.raises(json.JSONDecodeError):
        infer_schema_from_json("{not json")


def test_decode_json_payload_roundtrip(spark):
    """Wire-format decode without a broker: a batch DataFrame shaped
    like the Kafka source (value bytes + timestamp) decodes to typed
    columns (reference JsonDecoder round-trip test, json.rs:51-149)."""
    sample = '{"sensor": "s1", "speed": 3.25, "ok": true}'
    schema = infer_schema_from_json(sample)
    raw = spark.createDataFrame(
        [(sample.encode(),), ('{"sensor": "s2", "speed": 1.0, "ok": false}'.encode(),)],
        T.StructType([T.StructField("value", T.BinaryType())]),
    ).withColumn("timestamp", F.current_timestamp())
    out = decode_json_payload(raw, schema).orderBy("sensor").collect()
    assert [r["sensor"] for r in out] == ["s1", "s2"]
    assert out[0]["speed"] == 3.25 and out[0]["ok"] is True
    assert out[1]["ok"] is False


def test_decode_malformed_row_yields_nulls(spark):
    """from_json is permissive (null row on parse failure) — unlike
    the reference which errors the whole batch (json.rs error test);
    documented divergence: per-row nulls beat poison-pill batches at
    scale."""
    schema = infer_schema_from_json('{"a": 1}')
    raw = spark.createDataFrame(
        [(b"{broken",), (b'{"a": 5}',)],
        T.StructType([T.StructField("value", T.BinaryType())]),
    ).withColumn("timestamp", F.current_timestamp())
    out = decode_json_payload(raw, schema).collect()
    assert sorted([r["a"] for r in out], key=lambda x: (x is None, x)) == [5, None]


def test_kafka_json_row_encoder(spark):
    """Sink-side row encoder (reference utils/row_encoder.rs:16-44,
    golden-string test): each row → one JSON object in `value`."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    vals = [json.loads(r["value"]) for r in to_kafka_json_rows(df).collect()]
    assert sorted(vals, key=lambda d: d["id"]) == [
        {"id": 1, "name": "a"},
        {"id": 2, "name": "b"},
    ]


def test_encoding_registry_dispatch(spark):
    from denormalized_spark.sources import kafka as K

    raw = spark.createDataFrame(
        [(b'{"a": 1, "b": "x"}', None)], "value binary, timestamp timestamp"
    )
    out = K.decode_payload(raw, "JSON", "a long, b string").collect()
    assert out[0].a == 1 and out[0].b == "x"

    with pytest.raises(ValueError, match="unknown encoding"):
        K.decode_payload(raw, "protobuf", None)

    K.register_decoder("raw_bytes", lambda df, _s: df.select("value"))
    try:
        got = K.decode_payload(raw, "raw_bytes", None).collect()
        assert got[0].value == b'{"a": 1, "b": "x"}'
    finally:
        K.DECODERS.pop("raw_bytes", None)
