"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan
2005, "An improved data stream summary") as a first-class DataFrame
operator — the constant-size summary behind heavy-hitter detection,
frequency capping, and approximate token statistics over corpora too
large (or too streaming) for an exact groupBy to be kept around.

Design for Spark's execution model:

- The sketch IS a tiny DataFrame ``(cm_row, cm_col, cnt)`` of at most
  depth × width cells — metadata, not data. Cells are SUMS, so the
  sketch is partition-order independent (bit-identical under any
  partitioning / any union order) and MERGEABLE: the sketch of a
  union is the cell-wise sum of the sketches (Agarwal et al. 2012,
  "Mergeable summaries"). That is exactly what a ``groupBy(row,
  col).sum`` over unioned inputs computes — no custom combiner.
- Build cost: one exact per-key partial aggregation (map-side
  combinable — the shuffle carries one row per distinct key per
  partition, NOT the corpus), then each distinct key fans out to
  ``depth`` cells. Summing pre-counted keys into cells is identical
  to incrementing per occurrence, at a fraction of the shuffle.
- Probes broadcast the sketch (≤ depth·width rows) and take the min
  over the key's ``depth`` cells — map-side, scan speed.

Hash family: the repo's portable md5 contract (first 8 hex chars of
``"cm{row}:" || key`` mod width) — deterministic across engines, so
the DuckDB oracles replay the sketch bit-for-bit. Guarantees: the
estimate never undercounts, and overcounts by more than 2N/width with
probability at most (1/2)^depth.

Reference parity: the reference engine exposes approximate aggregates
(approx_distinct / approx_median — covered by functions/__init__.py);
Count-Min extends that family to point-frequency queries the same way
its DataFusion base would via a sketch UDAF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_hash(key: Column | str, row: int, width: int) -> Column:
    """Row-``row`` bucket of ``key``: md5("cm{row}:" || key) mod width
    — independent-enough hash functions indexed by the row salt, and
    replayable in any engine with md5."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cm{row}:"), c.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long"),
        F.lit(width),
    )


def count_min(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    count_col: str | None = None,
) -> DataFrame:
    """Build a depth × width Count-Min sketch of ``key_col``'s
    frequency distribution; returns ``(cm_row, cm_col, cnt)`` with
    only touched cells present (absent cell ≡ 0).

    Pass ``count_col`` to sketch pre-aggregated ``(key, count)`` pairs
    (e.g. a partial count from another pipeline stage) instead of raw
    occurrences. Plan: exact per-key counts first (partial agg), then
    ``depth`` cells per distinct key into a ≤ depth·width-row final
    agg. The result is deterministic and mergeable — see module doc.
    """
    if count_col is None:
        keyed = df.groupBy(F.col(key_col).alias("_k")).agg(F.count("*").alias("_c"))
    else:
        keyed = df.select(F.col(key_col).alias("_k"), F.col(count_col).alias("_c"))
    cells = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cm_row"),
                        cm_hash(F.col("_k"), r, width).alias("cm_col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell"),
        "_c",
    )
    return cells.groupBy(
        F.col("_cell.cm_row").alias("cm_row"), F.col("_cell.cm_col").alias("cm_col")
    ).agg(F.sum("_c").cast("long").alias("cnt"))


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width, hash family):
    cell-wise sum. ``sketch(A ∪ B) == cm_merge(sketch(A), sketch(B))``
    exactly — the mergeable-summaries property that lets each shard /
    micro-batch sketch independently."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("cm_row", "cm_col").agg(F.sum("cnt").cast("long").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 512,
    out_col: str = "cm_count",
) -> DataFrame:
    """Point-frequency estimates for every row of ``items``: the min
    over the key's ``depth`` sketch cells (missing cell = 0). The
    sketch is broadcast — probing is a map-side join + a per-key
    ``depth``-row min, scan speed over ``items``."""
    probes = items.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("cm_row"),
                        cm_hash(key_col, r, width).alias("cm_col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select(key_col, "_cell.cm_row", "_cell.cm_col")
    return (
        probes.join(F.broadcast(sketch), ["cm_row", "cm_col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col))
    )


def cm_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Keys whose Count-Min estimate reaches ``threshold``, with the
    exact count beside the estimate: ``(key, cm_count, exact_count)``.
    Count-Min never undercounts, so this NEVER misses a true heavy
    hitter — false positives (cm_count ≥ threshold > exact_count) are
    the sketch's documented one-sided error, bounded by 2N/width per
    row with probability (1/2)^depth.

    Batch shape: the candidate set is the exact per-key count table
    (already computed as the sketch's first stage — Catalyst reuses
    the partial agg). In streaming, the same sketch updates
    incrementally (cell sums — see :func:`cm_merge`) while candidates
    come from each micro-batch's keys; the batch form is the
    replayable twin the oracle checks."""
    keyed = df.groupBy(F.col(key_col)).agg(F.count("*").alias("exact_count"))
    sketch = count_min(keyed, key_col, depth, width, count_col="exact_count")
    est = cm_estimate(sketch, keyed, key_col, depth, width)
    return (
        keyed.join(est, key_col)
        .filter(F.col("cm_count") >= threshold)
        .select(key_col, "cm_count", "exact_count")
    )
