"""Feast feature-store sink contract (sources/feast.py vs reference
py-denormalized/python/denormalized/feast_data_stream.py:100-123):
each emitted micro-batch is converted to pandas and pushed to the
store's push source; empty batches are skipped. Tested against a
stand-in FeatureStore — no feast install needed (the import guard
falls back to string push modes, asserted here too).
"""

from __future__ import annotations

import datetime
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from denormalized_spark.datastream import DataStream
from denormalized_spark.sources.feast import _resolve_push_mode, write_feast_feature


class FakeFeatureStore:
    def __init__(self):
        self.pushes = []

    def push(self, source_name, pdf, to=None):
        self.pushes.append((source_name, pdf.copy(), to))


def test_push_mode_fallback_without_feast():
    # container has no feast: the resolver must hand back the raw string
    assert _resolve_push_mode("online") == "online"
    assert _resolve_push_mode("both") == "both"
    with pytest.raises(ValueError):
        write_feast_feature(None, FakeFeatureStore(), "s", to="nope")


def test_streaming_push_per_microbatch(spark):
    """Windowed aggregate → Feast push source: one push per non-empty
    micro-batch, carrying the stream's output schema and values."""
    base = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def at(s):
        return base + datetime.timedelta(seconds=s)

    stage = tempfile.mkdtemp(prefix="feast_stage_")
    schema = "sensor string, ts timestamp, reading double"
    batches = [
        [("a", at(0), 1.0), ("a", at(30), 3.0), ("b", at(10), 10.0)],
        [("a", at(3700), 5.0)],   # hour 2: closes hour-1 windows
        [("a", at(7300), 7.0)],   # hour 3: closes hour-2 windows
    ]
    for i, chunk in enumerate(batches):
        path = os.path.join(stage, f"part{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (1_000_000 + i, 1_000_000 + i))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "part*"))
    )
    ds = DataStream(sdf, event_time="ts").window(
        ["sensor"], [F.avg("reading").alias("avg_reading")], 3600_000
    )
    store = FakeFeatureStore()
    q = write_feast_feature(
        ds,
        store,
        push_source_name="sensor_push_source",
        checkpoint=tempfile.mkdtemp(prefix="ck_feast_"),
    )
    q.awaitTermination(180)

    assert store.pushes, "no batch was pushed"
    for source_name, pdf, to in store.pushes:
        assert source_name == "sensor_push_source"
        assert to == "online"
        assert len(pdf) > 0, "empty batches must be skipped, not pushed"
        assert {"sensor", "avg_reading", "window_start_time", "window_end_time"} <= set(
            pdf.columns
        )
    rows = {
        (r.sensor, r.window_start_time, r.avg_reading)
        for _, pdf, _ in store.pushes
        for r in pdf.itertuples()
    }
    assert (("a", at(0), 2.0) in rows) and (("b", at(0), 10.0) in rows)
    assert ("a", at(3600), 5.0) in rows


def test_chunked_push_bounds_driver_memory(spark):
    """A batch larger than max_rows_per_push is pushed in bounded
    pandas chunks — one store.push per chunk, all rows delivered
    exactly once, no single whole-batch toPandas."""
    rows = [(f"s{i}", float(i)) for i in range(7)]
    df = spark.createDataFrame(rows, "sensor string, avg_reading double")
    store = FakeFeatureStore()
    write_feast_feature(
        DataStream(df), store, push_source_name="src", max_rows_per_push=3
    )
    sizes = sorted(len(pdf) for _, pdf, _ in store.pushes)
    assert len(store.pushes) == 3 and sizes == [1, 3, 3]
    got = {
        (r.sensor, r.avg_reading)
        for _, pdf, _ in store.pushes
        for r in pdf.itertuples()
    }
    assert got == set(rows)
    with pytest.raises(ValueError):
        write_feast_feature(
            DataStream(df), store, push_source_name="src", max_rows_per_push=0
        )


def test_batch_datastream_pushes_once(spark):
    df = spark.createDataFrame(
        [("a", 1.5), ("b", 2.5)], "sensor string, avg_reading double"
    )
    store = FakeFeatureStore()
    write_feast_feature(DataStream(df), store, push_source_name="src", to="offline")
    assert len(store.pushes) == 1
    source_name, pdf, to = store.pushes[0]
    assert source_name == "src" and to == "offline" and len(pdf) == 2


def test_chunk_dtypes_pinned_and_exact(spark):
    """Regression (round 8/9): chunk dtypes come from the BATCH schema,
    built directly at the target dtype — an int column with a NULL in
    the chunk must present as nullable Int64 (not float64/object), an
    all-None int chunk as Int64 (not object), and a long above 2^53
    must survive EXACTLY (the from_records float64 intermediate would
    collapse 2^53+1 to 2^53)."""
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [(big, None, "x", None), (None, None, None, 1.5)],
        "n long, m long, s string, v double",
    )
    store = FakeFeatureStore()
    write_feast_feature(DataStream(df), store, push_source_name="src")
    assert len(store.pushes) == 1
    pdf = store.pushes[0][1]
    assert str(pdf["n"].dtype) == "Int64"
    assert str(pdf["m"].dtype) == "Int64"  # all-None chunk still pinned
    assert str(pdf["s"].dtype) == "string"
    assert str(pdf["v"].dtype) == "float64"
    vals = set(pdf["n"].dropna().astype("int64").tolist())
    assert vals == {big}  # exact past 2^53 — no float intermediate
