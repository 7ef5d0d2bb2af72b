"""Storage-layout operators: Z-order (Morton-curve) clustering for
multi-column data-skipping.

At 100 TB the scan is the query: parquet min/max row-group stats let
Spark skip files/row-groups whose ranges can't match a predicate, but
sorting by ONE column destroys locality in every other. Interleaving
the bits of several columns (the Z-/Morton curve — Morton 1966; the
same layout Delta Lake's OPTIMIZE ZORDER BY and ClickHouse's
mortonEncode use) gives every interleaved column partial locality, so
a conjunctive box predicate (user X AND hour Y) prunes on all of them
at once.

Not in the reference (it has no storage-layout surface at all — its
sinks are append-only streams, crates/core/src/datastream.rs); added
because table layout is where a 1000-executor scan is won or lost.

Everything here is expression-level (shifts/masks inside whole-stage
codegen) plus one 1-row min/max broadcast — no UDFs, no extra
shuffle beyond the final range partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_to_bits(c: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Min-max scale ``c`` onto the [0, 2^bits) integer grid. Pure
    IEEE double ops in a fixed order (subtract, divide, multiply,
    floor) so any engine replays it bit-for-bit; the single boundary
    case (c == cmax → 2^bits) is clamped, not epsilon-fudged."""
    n = F.lit(float(1 << bits))
    span = (cmax - cmin).cast("double")
    u = F.when(span > 0, (c.cast("double") - cmin.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(F.floor(u * n).cast("long"), F.lit((1 << bits) - 1))


def interleave_bits(scaled: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``k`` already-scaled ``bits``-bit integers:
    output bit (i·k + j) is bit i of column j (column 0 owns the most
    significant position of each group, matching the usual ZORDER BY
    column order). 2·bits·k shift/mask terms, all inside codegen."""
    k = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(scaled):
            src = F.shiftright(c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(src, i * k + (k - 1 - j))
    return z


def zorder_values(
    df: DataFrame, cols: Sequence[str], bits: int = 8, out_col: str = "zval"
) -> DataFrame:
    """Append the Z-order value of ``cols`` (min-max scaled to
    ``bits`` bits each, then bit-interleaved). One extra 1-row min/max
    aggregate broadcast onto the scan — the data pass itself is
    map-only."""
    cols = list(cols)
    if not cols:
        raise ValueError("cols must name at least one column")
    if bits < 1 or bits * len(cols) > 62:
        raise ValueError(
            f"bits*len(cols) must fit a signed 64-bit value (<= 62 bits), "
            f"got bits={bits} over {len(cols)} columns"
        )
    reserved = {out_col, *(f"_mn_{c}" for c in cols), *(f"_mx_{c}" for c in cols)}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(f"output/scratch column names collide: {sorted(clash)}")
    bounds = df.agg(
        *[F.min(c).alias(f"_mn_{c}") for c in cols],
        *[F.max(c).alias(f"_mx_{c}") for c in cols],
    )
    with_bounds = df.crossJoin(F.broadcast(bounds))
    scaled = [
        _scale_to_bits(
            F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits
        )
        for c in cols
    ]
    return with_bounds.withColumn(out_col, interleave_bits(scaled, bits)).drop(
        *[f"_mn_{c}" for c in cols], *[f"_mx_{c}" for c in cols]
    )


def zorder_repartition(
    df: DataFrame, cols: Sequence[str], num_partitions: int, bits: int = 8
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort by the
    Z-value so every output file owns a compact curve segment — a
    contiguous 2^k-aligned block of the grid, i.e. a bounded box in
    EVERY interleaved dimension. Parquet min/max stats then prune
    conjunctive predicates on any of ``cols``
    (tests/test_layout.py measures the skip-rate win vs a
    single-column sort on real row-group footers)."""
    z = zorder_values(df, cols, bits=bits)
    return (
        z.repartitionByRange(num_partitions, F.col("zval"))
        .sortWithinPartitions("zval")
        .drop("zval")
    )
