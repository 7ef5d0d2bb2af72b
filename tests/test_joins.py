"""operators/joins.py: the salted skew-safe equi-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from denormalized_spark.operators.joins import salted_join


def test_salted_join_equals_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for k in (1, 2, 3) for i in range(20)], "k long, i long"
    )
    right = spark.createDataFrame([(1, "a"), (2, "b"), (4, "d")], "k long, v string")
    plain = left.join(right, "k").select("k", "i", "v")
    salted = salted_join(
        left, right, "k", left_salt=F.col("i"), n_salts=4
    ).select("k", "i", "v")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, 0), (9, 1)], "k long, i long")
    right = spark.createDataFrame([(1, "a")], "k long, v string")
    out = salted_join(left, right, "k", left_salt=F.col("i"), n_salts=3, how="left")
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 9: None}


def test_salted_join_validates_how(spark):
    df = spark.createDataFrame([(1, 0)], "k long, i long")
    with pytest.raises(ValueError):
        salted_join(df, df, "k", left_salt=F.col("i"), how="full")


def test_bloom_semi_join_equals_plain_semi(spark):
    """The Bloom gate is semantics-preserving: result == plain left
    semi join, including keys that are Bloom false positives of the
    bitmap (they're dropped by the exact stage)."""
    from denormalized_spark.operators.joins import bloom_semi_join

    fact = spark.createDataFrame(
        [(k, k * 10) for k in range(200)], "k long, v long"
    )
    keys = spark.createDataFrame([(3,), (77,), (150,)], "kk long")
    got = sorted(
        r.k for r in bloom_semi_join(fact, keys, "k", "kk", bits=256, probes=3)
        .collect()
    )
    want = sorted(
        r.k for r in fact.join(
            keys.withColumnRenamed("kk", "k"), "k", "left_semi"
        ).collect()
    )
    assert got == want == [3, 77, 150]


def test_bloom_derive_bits_sizing():
    """bits ≈ next pow2 ≥ 10·|keys|, floored 2^16, capped 2^27."""
    from denormalized_spark.operators.joins import _derive_bloom_bits

    assert _derive_bloom_bits(0) == 1 << 16
    assert _derive_bloom_bits(6000) == 1 << 16      # 60k ≤ 65536
    assert _derive_bloom_bits(8000) == 1 << 17      # 80k > 65536
    assert _derive_bloom_bits(100_000) == 1 << 20
    assert _derive_bloom_bits(10**9) == 1 << 27     # broadcast cap


def test_bloom_semi_join_derived_bits_fp_rate(spark):
    """At the regime where the OLD fixed 2^16 default saturated
    (8k build keys ≳ bits/10), the derived sizing keeps the Bloom
    gate useful: fp-rate on a disjoint probe set stays well under
    50% (expected ≈1.7% at m/n=10, k=3). r13 verdict item 4."""
    from denormalized_spark.operators.joins import bloom_semi_join

    n = 8000
    keys = spark.range(n).selectExpr("id AS kk")
    # probe set fully disjoint from the build keys: every gate pass
    # is a false positive.
    fact = spark.range(10**6, 10**6 + n).selectExpr("id AS k")
    passed = bloom_semi_join(fact, keys, "k", "kk", gate_only=True).count()
    assert passed / n < 0.5
    # and with the sized bitmap it should actually be tight
    assert passed / n < 0.1
