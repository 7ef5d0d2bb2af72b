"""Join-strategy operators: the hand-rolled patterns a 100 TB job
reaches for when the planner's defaults aren't enough.

Spark-first posture: AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``) is the FIRST answer to a
skewed shuffle join and is on in this repo's sessions — the explicit
salted join here is for the cases AQE can't fix: a skewed AGGREGATION
feeding the join, deterministic partitioning requirements, or an
engine without AQE. The operator is semantics-preserving (result ==
the plain join, hash-proven by its oracle), so it can be dropped in
and out freely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_salt: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by key salting: the LEFT (large, possibly
    hot-keyed) side gets a deterministic salt in [0, n_salts) per ROW,
    the RIGHT side is replicated once per salt value, and the join
    runs on (key, salt) — a single hot key's rows now land on
    ``n_salts`` reducers instead of one. The classic pre-AQE skew
    remedy (and still the remedy when the skew is in a downstream
    aggregation AQE can't re-split).

    ``left_salt`` must be DETERMINISTIC in the row (e.g. a secondary
    column mod n_salts, or an md5 of a row id — never rand()): the
    repo's engine-parity contract, and what makes retries/speculative
    tasks safe. Semantics-preserving for inner/left joins on an
    equi-key: every left row meets every matching right row exactly
    once (the right replication is keyed by the SAME salt the left
    row carries).

    Scale shape: right-side replication multiplies the small side by
    n_salts (bounded, choose n_salts ≈ skew factor); the shuffle is
    on (key, salt) — n_salts× more, smaller partitions. Returns the
    joined frame without the salt column."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join: how must be inner/left, got {how!r}")
    ls = left.withColumn("_salt", (left_salt % n_salts).cast("int"))
    rs = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return ls.join(rs, [on, "_salt"], how).drop("_salt")
