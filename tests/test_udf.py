"""§2.9 UDF/UDAF protocol tests (reference udf.py:78-248)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest
from pyspark.sql import functions as F

from denormalized_spark.udf import Accumulator, Volatility, udaf, udf


def test_scalar_udf_arrow_kernel(spark):
    """func receives pyarrow Arrays (reference udf_example.py:31-36)."""
    seen_types = []

    def gt(lhs: pa.Array, rhs: pa.Array) -> pa.Array:
        seen_types.append((type(lhs), type(rhs)))
        return pc.greater(lhs, rhs)

    greater_than = udf(gt, [pa.float64(), pa.float64()], pa.bool_(), "stable")
    df = spark.createDataFrame([(1.0, 2.0), (3.0, 2.0)], ["a", "b"])
    got = [r[0] for r in df.select(greater_than("a", "b")).collect()]
    assert got == [False, True]
    assert all(issubclass(t, pa.Array) for pair in seen_types for t in pair)


def test_scalar_udf_name_and_column_args(spark):
    def double_it(x: pa.Array) -> pa.Array:
        return pc.multiply(x, pa.scalar(2.0))

    d = udf(double_it, [pa.float64()], pa.float64(), Volatility.Immutable)
    df = spark.createDataFrame([(4.0,)], ["x"])
    row = df.select(d(F.col("x"))).collect()[0]
    assert row["double_it"] == 8.0


def test_udf_requires_callable():
    with pytest.raises(TypeError):
        udf("not callable", [pa.int64()], pa.int64(), "immutable")


def test_udaf_requires_accumulator():
    with pytest.raises(TypeError):
        udaf(dict, [pa.int64()], pa.int64(), [pa.int64()], "immutable")


class Summer(Accumulator):
    merged = []

    def __init__(self):
        self.total = 0

    def update(self, values: pa.Array) -> None:
        self.total += pc.sum(values).as_py() or 0

    def merge(self, states: list[pa.Array]) -> None:
        Summer.merged.append(len(states[0]))
        self.total += pc.sum(states[0]).as_py() or 0

    def state(self) -> list[pa.Scalar]:
        return [pa.scalar(self.total)]

    def evaluate(self) -> pa.Scalar:
        return pa.scalar(self.total)


def test_udaf_grouped(spark):
    s = udaf(Summer, [pa.int64()], pa.int64(), [pa.int64()], "immutable")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 10)], ["k", "v"]
    )
    got = {r["k"]: r["total"] for r in s.apply(df, ["k"], "v", alias="total").collect()}
    assert got == {"a": 3, "b": 10}


def test_udaf_global(spark):
    s = udaf(Summer, [pa.int64()], pa.int64(), [pa.int64()], "immutable")
    df = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    got = s.apply(df, [], "v", alias="total").collect()
    assert len(got) == 1 and got[0]["total"] == 4950


def test_udaf_merge_protocol_exercised(spark):
    """Chunked update → merge of partial states must be exercised
    (the reference's merge_batch path) — small chunk_size forces
    multiple partials."""
    s = udaf(Summer, [pa.int64()], pa.int64(), [pa.int64()], "immutable")
    s.chunk_size = 10
    df = spark.createDataFrame([(i,) for i in range(45)], ["v"]).coalesce(1)
    got = s.apply(df, [], "v", alias="total").collect()
    assert got[0]["total"] == sum(range(45))


class MapCounter(Accumulator):
    """Map-typed state — the reference's udaf_example.py:31-66 shape."""

    state_type = pa.map_(pa.string(), pa.int64())

    def __init__(self):
        from collections import Counter

        self.counts = Counter()

    def update(self, values: pa.Array) -> None:
        self.counts.update(v for v in values.to_pylist() if v is not None)

    def merge(self, states: list[pa.Array]) -> None:
        for partial in states[0].to_pylist():
            for k, v in partial or []:
                self.counts[k] += v

    def state(self) -> list[pa.Scalar]:
        return [pa.scalar(list(self.counts.items()), type=self.state_type)]

    def evaluate(self) -> pa.Scalar:
        return pa.scalar(
            sorted(self.counts.items()), type=self.state_type
        )


def test_udaf_map_typed_state(spark):
    c = udaf(
        MapCounter,
        [pa.string()],
        MapCounter.state_type,
        [MapCounter.state_type],
        "stable",
    )
    df = spark.createDataFrame(
        [("x",), ("y",), ("x",), ("x",)], ["s"]
    )
    got = c.apply(df, [], "s", alias="counts").collect()[0]["counts"]
    assert dict(got) == {"x": 3, "y": 1}


def test_windowed_udaf(spark):
    """The reference's headline UDAF usage: inside a window
    (udaf_example.py:76-83)."""
    from denormalized_spark.datastream import DataStream
    from denormalized_spark.udf import window_udaf

    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1), ("2024-01-01 00:20:00", 2),
         ("2024-01-01 01:10:00", 10)],
        ["ts_str", "v"],
    ).select(F.to_timestamp("ts_str").alias("ts"), "v")
    ds = DataStream(df, event_time="ts")
    s = udaf(Summer, [pa.int64()], pa.int64(), [pa.int64()], "immutable")
    out = window_udaf(ds, s, "v", [], 3600_000, alias="total")
    got = {r["window_start_time"].hour: r["total"] for r in out.collect()}
    assert got == {0: 3, 1: 10}


class StructMapCounter(Accumulator):
    """The reference udaf_example.py:33 state shape EXACTLY: a struct
    wrapping a map — regression for nested map normalization."""

    acc_state_type = pa.struct([("counts", pa.map_(pa.string(), pa.int64()))])

    def __init__(self):
        from collections import Counter

        self.counts = Counter()

    def update(self, values: pa.Array) -> None:
        if values is not None:
            self.counts.update(v for v in values.to_pylist() if v is not None)

    def merge(self, states) -> None:
        if states is None or len(states) == 0:
            return
        for state in states[0].to_pylist():
            if state is not None:
                for k, v in state["counts"]:
                    self.counts[k] += v

    def state(self):
        return [pa.scalar({"counts": dict(self.counts)}, type=self.acc_state_type)]

    def evaluate(self):
        return self.state()[0]


def test_udaf_struct_of_map_state(spark):
    c = udaf(
        StructMapCounter,
        [pa.string()],
        StructMapCounter.acc_state_type,
        [StructMapCounter.acc_state_type],
        "stable",
    )
    df = spark.createDataFrame([("x",), ("y",), ("x",)], ["s"])
    got = c.apply(df, [], "s", alias="out").collect()[0]["out"]
    assert dict(got["counts"]) == {"x": 2, "y": 1}
