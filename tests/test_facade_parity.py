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


def test_feast_sink_duck_typed_without_feast(spark):
    """Without the optional feast install the sink degrades to string
    push modes and still pushes per batch — the contract a stand-in
    FeatureStore (or the real one) sees is identical
    (tests/test_feast_sink.py covers it end-to-end)."""
    from denormalized_spark.sources.feast import write_feast_feature

    pushes = []

    class Store:
        def push(self, name, pdf, to=None):
            pushes.append((name, len(pdf), to))

    write_feast_feature(DataStream(spark.range(3)), Store(), "src")
    assert pushes == [("src", 3, "online")]
    with pytest.raises(ValueError, match="online/offline/both"):
        write_feast_feature(DataStream(spark.range(1)), Store(), "src", to="bogus")


def test_from_stream_csv_windowed(spark, tmp_path):
    """csv_streaming as a REAL stream: two csv files drive two
    micro-batches through a windowed aggregate."""
    import tempfile

    d = tmp_path / "csvstream"
    d.mkdir()
    (d / "a.csv").write_text(
        "ts,symbol,price\n2024-01-01 00:00:00,AAPL,100\n2024-01-01 00:01:00,AAPL,104\n"
    )
    (d / "b.csv").write_text(
        "ts,symbol,price\n2024-01-01 00:06:00,AAPL,110\n2024-01-01 00:11:00,AAPL,120\n"
    )
    ds = Context(spark).from_stream_csv(
        str(d),
        "ts timestamp, symbol string, price double",
        max_files_per_trigger=1,
    ).with_timestamp("ts", unit="timestamp", target="et")
    win = ds.window(["symbol"], [F.round(F.avg("price"), 2).alias("avg_price")], 300_000)
    rows = []
    q = win.sink(
        lambda df: rows.extend(df.collect()),
        checkpoint=tempfile.mkdtemp(prefix="ck_csvs_"),
    )
    q.awaitTermination(120)
    # append mode: the final (00:10) window stays open; first two close
    got = {(r.window_start_time.minute, r.avg_price) for r in rows}
    assert got == {(0, 102.0), (5, 110.0)}


def test_stream_static_dimension_join(spark, tmp_path):
    """Stream⋈static-dimension join — the enrichment pattern the
    reference models with Joinable stream/batch polymorphism
    (datastream.rs:379-395). The static side broadcasts per batch."""
    import tempfile

    d = tmp_path / "evstream"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"uid": 1, "v": 10}\n{"uid": 2, "v": 20}\n{"uid": 9, "v": 90}\n'
    )
    sds = Context(spark).from_stream_json(str(d), "uid long, v long")
    dim = DataStream(
        spark.createDataFrame([(1, "gold"), (2, "silver")], ["uid2", "tier"])
    )
    joined = sds.join(dim, "left", ["uid"], ["uid2"], broadcast_right=True)
    rows = []
    q = joined.sink(
        lambda df: rows.extend(df.collect()),
        checkpoint=tempfile.mkdtemp(prefix="ck_ssj_"),
    )
    q.awaitTermination(120)
    got = {(r.uid, r.tier) for r in rows}
    assert got == {(1, "gold"), (2, "silver"), (9, None)}


def test_writers_and_registration(spark, tmp_path):
    ds = DataStream(
        spark.createDataFrame([(1, "a", 10.0), (2, "b", 20.0)], ["k", "g", "v"])
    )
    pq = str(tmp_path / "out_pq")
    ds.to_parquet(pq, partition_by=["g"], sort_within_partitions=["k"])
    back = spark.read.parquet(pq)
    assert sorted((r.k, r.g, r.v) for r in back.collect()) == [
        (1, "a", 10.0), (2, "b", 20.0)
    ]
    import os
    assert any(d.startswith("g=") for d in os.listdir(pq))  # partition layout

    cs = str(tmp_path / "out_csv")
    ds.to_csv(cs)
    assert Context(spark).from_csv(cs).count() == 2

    js = str(tmp_path / "out_json")
    ds.to_json(js)
    assert Context(spark).from_json(js).count() == 2

    ctx = Context(spark)
    ctx.register_parquet("t_pq_reg", pq)
    assert ctx.sql("SELECT count(*) AS n FROM t_pq_reg").df.collect()[0].n == 2
    ctx.register_table("t_ds_reg", ds)
    assert ctx.sql("SELECT sum(v) AS s FROM t_ds_reg").df.collect()[0].s == 30.0


def test_salted_window_agg_matches_plain(spark, events):
    """The skew-salted two-stage window aggregation must produce the
    same rows as the plain single-stage one."""
    from denormalized_spark.operators.windows import salted_window_agg, window_aggregate

    salted = salted_window_agg(
        events,
        "ts",
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
        3600_000,
        salt_buckets=8,
    )
    plain = window_aggregate(
        events,
        "ts",
        ["event_type"],
        [
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        ],
        3600_000,
    )

    def key(rows):
        return {
            (r.window_start_time, r.event_type): (
                r.n,
                round(r.sum_value, 6),
                r.min_value,
                r.max_value,
            )
            for r in rows
        }

    assert key(salted.collect()) == key(plain.collect())


def test_reference_public_api_parity():
    """Name-level parity with the reference's public Python surface:
    every method a py-denormalized user calls exists on our façade
    with the same name (DataStream: data_stream.py:44-232; Context:
    context.py:32-39; udf/udaf: datafusion/udf.py:78-248), so scripts
    port by changing only the import line (see examples/)."""
    import importlib

    from denormalized_spark import Context
    from denormalized_spark.datastream import DataStream

    udf_mod = importlib.import_module("denormalized_spark.udf")

    ds_methods = [
        "schema", "select", "filter", "with_column", "drop_columns",
        "join_on", "join", "window", "print_stream", "print_schema",
        "print_plan", "print_physical_plan", "sink_kafka", "sink",
        # vendored DataFrame surface users rely on (dataframe.py)
        "describe", "unnest_column", "sort", "limit", "distinct",
        "union", "intersect", "count",
    ]
    for m in ds_methods:
        assert hasattr(DataStream, m), f"DataStream.{m} missing"

    for m in ["from_topic", "sql", "register_table", "from_batch"]:
        assert hasattr(Context, m), f"Context.{m} missing"

    for m in ["udf", "udaf", "Accumulator", "ScalarUDF", "AggregateUDF", "Volatility"]:
        assert hasattr(udf_mod, m), f"udf.{m} missing"

    import inspect

    # from_topic positional order is part of the contract
    # (reference context.py:32-39)
    params = list(inspect.signature(Context.from_topic).parameters)
    assert params[1:6] == [
        "topic", "sample_event", "bootstrap_servers", "timestamp_column", "group_id"
    ]


def test_datafusion_compat_shim(spark):
    """Reference scripts' import block works after renaming only the
    package: `from denormalized_spark.datafusion import col, lit,
    functions as f, udf, udaf, Accumulator`."""
    from denormalized_spark.datafusion import (  # noqa: F401
        Accumulator,
        col,
        functions as f,
        lit,
        udaf,
        udf,
    )

    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], ["k", "v"])
    from denormalized_spark.datastream import DataStream

    out = {
        r.k: (r.n, r.avg_v)
        for r in DataStream(df)
        .aggregate([col("k")], [f.count("*").alias("n"), f.avg(col("v")).alias("avg_v")])
        .filter(col("n") > lit(0))
        .df.collect()
    }
    assert out == {1: (2, 3.0), 2: (1, 6.0)}
    # single-expression + global forms (reference accepts both)
    [g] = DataStream(df).aggregate([], f.sum("v").alias("s")).df.collect()
    assert g.s == 12.0
