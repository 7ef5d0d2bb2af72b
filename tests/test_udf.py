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


class TestVolatilityContract:
    """Pin the reference's volatility semantics (reference
    py-denormalized/python/denormalized/datafusion/udf.py:34-75) onto
    Spark's determinism model: Immutable/Stable -> deterministic
    (the optimizer may deduplicate repeated calls and push filters
    through them), Volatile -> nondeterministic (every reference is
    evaluated independently; filters never reorder across it)."""

    @staticmethod
    def _rand_udf(volatility, name):
        import numpy as np

        def rand_kernel(a: pa.Array) -> pa.Array:
            return pa.array(np.random.random(len(a)))

        return udf(rand_kernel, [pa.int64()], pa.float64(),
                   volatility=volatility, name=name)

    def test_determinism_flag_mapping(self):
        for vol, det in [
            (Volatility.Immutable, True),
            (Volatility.Stable, True),
            (Volatility.Volatile, False),
            ("immutable", True),
            ("stable", True),
            ("volatile", False),
        ]:
            u = self._rand_udf(vol, f"u_{str(vol)}")
            assert u._judf.deterministic is det, vol

    def test_immutable_duplicate_calls_collapse(self, spark):
        """Deterministic UDFs: the optimizer may (and on this plan
        does) evaluate duplicate calls once — a randomness-smuggling
        kernel declared Immutable yields IDENTICAL columns."""
        u = self._rand_udf("immutable", "imm_r")
        out = spark.range(16).select(u("id").alias("a"), u("id").alias("b"))
        assert all(r.a == r.b for r in out.collect())

    def test_volatile_duplicate_calls_stay_independent(self, spark):
        """Volatile: every reference evaluates independently, exactly
        like the reference engine's Volatile class."""
        u = self._rand_udf("volatile", "vol_r")
        out = spark.range(16).select(u("id").alias("a"), u("id").alias("b"))
        rows = out.collect()
        assert any(r.a != r.b for r in rows)

    def test_stable_consistent_within_query(self, spark):
        """Stable contract: same input -> same result WITHIN one query
        (Spark has no cross-query stability class; Stable maps to
        deterministic, documented in udf.py)."""
        u = self._rand_udf("stable", "stb_r")
        out = spark.range(8).select(u("id").alias("a"), u("id").alias("b"))
        assert all(r.a == r.b for r in out.collect())

    def test_filter_pushdown_only_through_deterministic(self, spark):
        """Optimizer reordering: a filter on a deterministic UDF's
        output is pushed below its projection (the UDF re-evaluates
        under the filter); a volatile UDF pins the filter above it."""
        imm = self._rand_udf("immutable", "imm_p")
        vol = self._rand_udf("volatile", "vol_p")

        def optimized(u):
            df = spark.range(8).select("id", u("id").alias("x"))
            return (
                df.filter(F.col("x") > 0.0)
                ._jdf.queryExecution().optimizedPlan().toString()
            )

        p_imm, p_vol = optimized(imm), optimized(vol)
        # deterministic: two ArrowEvalPython nodes (filter pushed into a
        # re-evaluation below the project)
        assert p_imm.count("ArrowEvalPython") == 2
        # volatile: single evaluation, filter stays directly above it
        assert p_vol.count("ArrowEvalPython") == 1
        assert p_vol.index("Filter") < p_vol.index("ArrowEvalPython")
