"""Scale-safe GLOBAL ranking (row_number / ntile / percent_rank /
cume_dist over a total order).

An unpartitioned ``Window.orderBy`` is a single-reducer sort by
construction — the one plan shape that cannot finish at 100 TB. The
reference inherits the same limitation (DataFusion's unpartitioned
window is also one partition). This module computes the identical
results with bounded parallelism:

1. ``repartitionByRange`` on the sort key — Spark's sampled range
   partitioner (the same machinery behind a distributed ORDER BY);
   every partition holds a contiguous key range.
2. Per-partition local sort + local row_number
   (``Window.partitionBy(spark_partition_id())`` — bounded state).
3. Per-partition row counts → prefix-sum offsets. The counts relation
   has exactly ``numPartitions`` rows, so its unpartitioned window is
   a few-KB single task, and it broadcast-joins back.
4. global row_number = local + partition offset; ntile/percent_rank/
   cume_dist derive from it with SQL-standard semantics (ties resolve
   by the caller-supplied total tiebreak order; rank aggregation over
   equal keys is partitioned BY the key — bounded).

The heavy data is touched by: one range shuffle + one local sort —
the same cost as a distributed ORDER BY, with no single-reducer stage.
The grand total and the per-partition offsets BOTH derive from the
numPartitions-row counts relation (never a second pass over the
data), and ride one broadcast back onto the ranked rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rank_pid"
_LRN = "_rank_local_rn"
_RN = "_global_rn"


def with_global_row_number(
    df: DataFrame,
    order_by: Sequence[Column],
    out_col: str = "row_number",
    num_partitions: int | None = None,
    total_col: str | None = None,
) -> DataFrame:
    """Append a global 1-based row_number under a total order.

    ``order_by`` must be a TOTAL order (add a unique tiebreak column)
    for deterministic output. ``total_col`` additionally appends the
    global row count — it rides the same broadcast offsets relation,
    so asking for it costs nothing extra (derived from the
    numPartitions-row counts, NOT a second pass over the data).

    CONSUMPTION CONTRACT: the row number is assembled from
    range-sampled partition boundaries + spark_partition_id, which are
    only consistent WITHIN one execution of this subplan. A downstream
    plan that re-executes it twice with different layouts — e.g.
    feeding this output into a SECOND with_global_row_number call —
    can silently produce different numbers on each internal
    consumption (measured at ~100k rows: 97% of first-pass rns wrong
    under chaining). Consume the output once per plan, join results of
    independent calls by key (analytics.rfm_scores shows the shape),
    or localCheckpoint before reusing.
    """
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(n), *order_by).withColumn(
        _PID, F.spark_partition_id()
    )
    local = ranged.withColumn(
        _LRN, F.row_number().over(Window.partitionBy(_PID).orderBy(*order_by))
    )
    counts = local.groupBy(_PID).agg(F.count("*").alias("_cnt"))
    # prefix sum + grand total over numPartitions rows — a few KB,
    # broadcast back (both from the SAME tiny relation: no extra pass)
    allw = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("_total", F.sum("_cnt").over(allw)).select(_PID, "_offset", "_total")
    out = (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, (F.col(_LRN) + F.col("_offset")).cast("int"))
        .drop(_PID, _LRN, "_offset")
    )
    if total_col:
        return out.withColumnRenamed("_total", total_col)
    return out.drop("_total")


def with_global_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value: Column,
    out_col: str = "running_sum",
    exclusive: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a global running sum of ``value`` under a total order —
    same shape as :func:`with_global_row_number` (range shuffle +
    local cumsum + numPartitions-row prefix-sum broadcast), so a
    corpus-wide cumulative token count never needs a single-reducer
    sort. ``exclusive=True`` gives each row the sum of everything
    strictly BEFORE it (an offset); ``False`` includes the row."""
    n = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = (
        df.withColumn("_rs_val", value.cast("long"))
        .repartitionByRange(int(n), *order_by)
        .withColumn(_PID, F.spark_partition_id())
    )
    end = -1 if exclusive else Window.currentRow
    local = ranged.withColumn(
        "_rs_local",
        F.coalesce(
            F.sum("_rs_val").over(
                Window.partitionBy(_PID)
                .orderBy(*order_by)
                .rowsBetween(Window.unboundedPreceding, end)
            ),
            F.lit(0),
        ),
    )
    sums = local.groupBy(_PID).agg(F.sum("_rs_val").alias("_cnt"))
    offsets = sums.withColumn(
        "_offset",
        F.coalesce(
            F.sum("_cnt").over(
                Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(_PID, "_offset")
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col("_rs_local") + F.col("_offset"))
        .drop(_PID, "_rs_val", "_rs_local", "_offset")
    )


def global_ranks(
    df: DataFrame,
    order_by: Sequence[Column],
    rank_keys: Sequence[Column | str],
    ntile: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``row_number`` and, derived from it, ``rank``,
    ``percent_rank``, ``cume_dist`` and (optionally) ``ntile_<n>`` —
    all without an unpartitioned window over the data.

    ``rank_keys``: the ORDER BY expressions WITHOUT the tiebreak —
    rows equal on these share rank/percent_rank/cume_dist (computed
    as min/max row_number over the equal-key group: a window
    PARTITIONED by the key, bounded state).
    """
    out = with_global_row_number(df, order_by, _RN, num_partitions, total_col="_total")
    keyw = Window.partitionBy(*[F.col(k) if isinstance(k, str) else k for k in rank_keys])
    rank = F.min(_RN).over(keyw)
    cmax = F.max(_RN).over(keyw)
    out = (
        out.withColumn("rank", rank.cast("int"))
        .withColumn(
            "percent_rank",
            F.when(F.col("_total") == 1, F.lit(0.0)).otherwise(
                (rank - 1).cast("double") / (F.col("_total") - 1)
            ),
        )
        .withColumn("cume_dist", cmax.cast("double") / F.col("_total"))
    )
    if ntile:
        # SQL-standard ntile over row_number: the first (N mod k)
        # tiles get ceil(N/k) rows, the rest floor(N/k)
        N, k = F.col("_total"), F.lit(ntile)
        q = (N / k).cast("int")  # floor for positive ints
        r = N % k
        big = q + 1
        in_big = F.col(_RN) <= r * big
        tile = F.when(
            in_big, ((F.col(_RN) - 1) / big).cast("int") + 1
        ).otherwise(
            F.when(q > 0, r + ((F.col(_RN) - r * big - 1) / q).cast("int") + 1)
            .otherwise(r)  # degenerate N < k: every row is its own tile
        )
        out = out.withColumn(f"ntile_{ntile}", tile.cast("int"))
    return out.withColumnRenamed(_RN, "row_number").drop("_total")
