"""Façade parity odds-and-ends: CSV/JSON sources, describe, unnest,
Feast-sink gating (reference vendored context.py/dataframe.py +
feast_data_stream.py)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from denormalized_spark.context import Context
from denormalized_spark.datastream import DataStream


def test_from_csv(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k,v\n1,a\n2,b\n")
    ds = Context(spark).from_csv(str(p))
    rows = sorted((r["k"], r["v"]) for r in ds.df.collect())
    assert rows == [(1, "a"), (2, "b")]  # inferSchema: k is numeric


def test_from_json(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    ds = Context(spark).from_json(str(p))
    rows = sorted((r["k"], r["v"]) for r in ds.df.collect())
    assert rows == [(1, "a"), (2, "b")]


def test_csv_streaming_example_shape(spark, tmp_path):
    """The reference's csv_streaming.rs example (14-63): read CSV,
    window-aggregate, emit — translated 1:1 through the façade."""
    p = tmp_path / "prices.csv"
    rows = ["ts,symbol,price"]
    for i in range(10):
        rows.append(f"2024-01-01 00:{i:02d}:00,AAPL,{100 + i}")
    p.write_text("\n".join(rows) + "\n")
    ds = Context(spark).from_csv(str(p)).with_timestamp("ts", unit="timestamp", target="et")
    out = ds.window(
        ["symbol"], [F.round(F.avg("price"), 2).alias("avg_price")], 300_000
    ).df.orderBy("window_start_time").collect()
    assert [r["avg_price"] for r in out] == [102.0, 107.0]


def test_describe(events):
    ds = DataStream(events.select("value"))
    rows = {r["summary"]: r["value"] for r in ds.describe("value").df.collect()}
    assert {"count", "mean", "stddev", "min", "max", "null_count"} <= set(rows)
    assert int(rows["count"]) == 1000
    assert int(rows["null_count"]) == 0


def test_unnest_column(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, []), (3, None)], ["k", "xs"])
    ds = DataStream(df)
    got = sorted(
        ((r["k"], r["xs"]) for r in ds.unnest_column("xs").df.collect()),
        key=lambda t: (t[0], t[1] is None, t[1] or 0),
    )
    assert got == [(1, 10), (1, 20), (2, None), (3, None)]
    strict = ds.unnest_column("xs", preserve_nulls=False).df.collect()
    assert sorted((r["k"], r["xs"]) for r in strict) == [(1, 10), (1, 20)]


def test_feast_sink_gated(spark):
    from denormalized_spark.sources.feast import write_feast_feature

    ds = DataStream(spark.range(1))
    with pytest.raises(RuntimeError, match="feast is not installed"):
        write_feast_feature(ds, None, "src")
