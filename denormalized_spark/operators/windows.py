"""Streaming/batch windowed aggregation.

Re-expresses the reference's core custom operator — the ~2.3k-LoC
``StreamingWindowExec`` pipeline (reference:
crates/core/src/physical_plan/continuous/streaming_window.rs:201-564,
grouped_window_agg_stream.rs:63-441) — as Spark's built-in
``groupBy(window(ts, ...))`` aggregation. Spark already provides
everything the reference hand-built:

- epoch-aligned tumbling/sliding windows (reference snaps window
  starts to epoch boundaries, streaming_window.rs:1088-1094; Spark's
  ``F.window`` has identical alignment),
- watermark-driven emission on window close (reference
  trigger_windows, streaming_window.rs:703-730; Spark append mode),
- late-data drop past the watermark (reference seen_windows set,
  streaming_window.rs:982-991),
- partial/final aggregation and hash-shuffle placement (reference's
  custom physical rule coalesce_before_streaming_window_aggregate.rs;
  Spark's EnsureRequirements inserts the hash exchange, and the agg
  is map-side partial automatically),
- session windows, which the reference declares but left ``todo!()``
  (planner/streaming_window.rs:130) — ``F.session_window`` works.

Output schema parity: the reference emits flattened
``window_start_time``/``window_end_time`` Timestamp(ms) columns
(logical_plan/streaming_window.rs:83-107); we project
``window.start``/``window.end`` to the same names so downstream
window-aligned joins (examples/examples/stream_join.rs:70-80)
translate 1:1.

Scale notes (100 TB): the aggregation shuffles once on
(window, *group keys) — the window expression is computed map-side so
partial aggregation happens before the exchange. No driver-side state;
streaming state lives in the state store (RocksDB provider
recommended, see streaming/checkpoint.py). Skewed group keys are
handled by AQE; for pathological single-key skew pre-salt with
``salted_window_agg``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WINDOW_START = "window_start_time"
WINDOW_END = "window_end_time"


def _ms_to_interval(ms: int) -> str:
    """Millis → Spark interval string. Whole seconds stay readable;
    the reference's public API takes millis ints
    (py-denormalized data_stream.py:151-181)."""
    if ms % 1000 == 0:
        return f"{ms // 1000} seconds"
    return f"{ms} milliseconds"


def window_aggregate(
    df: DataFrame,
    time_column: str,
    group_exprs: Sequence[Column | str],
    aggr_exprs: Sequence[Column],
    window_length_ms: int,
    slide_ms: int | None = None,
    *,
    flatten: bool = True,
) -> DataFrame:
    """Tumbling (slide_ms=None) or sliding window aggregation.

    Semantics per the reference (SURVEY §2.4): a row with timestamp t
    belongs to every window ``[start, start + length)`` with
    epoch-aligned start stepping by ``slide``; output carries the
    group keys, the aggregates, and flattened window bound columns.
    """
    slide = _ms_to_interval(slide_ms) if slide_ms else None
    win = F.window(F.col(time_column), _ms_to_interval(window_length_ms), slide)
    keys = [F.col(g) if isinstance(g, str) else g for g in group_exprs]
    out = df.groupBy(win.alias("window"), *keys).agg(*aggr_exprs)
    if flatten:
        out = flatten_window(out)
    return out


def session_window_aggregate(
    df: DataFrame,
    time_column: str,
    group_exprs: Sequence[Column | str],
    aggr_exprs: Sequence[Column],
    gap_ms: int | Column,
    *,
    flatten: bool = True,
) -> DataFrame:
    """Session windows (gap-based). The reference enum has
    ``Session(len, key)`` but execution is ``todo!()``
    (planner/streaming_window.rs:130) — Spark gives it natively.

    ``gap_ms`` may be a **Column of milliseconds** for DYNAMIC gaps —
    a per-event timeout (e.g. short for high-frequency event types,
    long for purchases), which Spark's session_window supports via an
    interval-string gap expression. Merge semantics (pinned by
    tests): an event extends a session when its time is <= the
    running max session end; session end = max(event_time + gap) over
    members.
    """
    if isinstance(gap_ms, Column):
        gap = F.concat(gap_ms.cast("long").cast("string"), F.lit(" milliseconds"))
    else:
        gap = _ms_to_interval(gap_ms)
    win = F.session_window(F.col(time_column), gap)
    keys = [F.col(g) if isinstance(g, str) else g for g in group_exprs]
    out = df.groupBy(win.alias("session_window"), *keys).agg(*aggr_exprs)
    if flatten:
        out = (
            out.withColumn(WINDOW_START, F.col("session_window.start"))
            .withColumn(WINDOW_END, F.col("session_window.end"))
            .drop("session_window")
        )
    return out


def flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    """Project the struct window column to the reference's flattened
    output schema (`window_start_time`, `window_end_time`)."""
    return (
        df.withColumn(WINDOW_START, F.col(f"{window_col}.start"))
        .withColumn(WINDOW_END, F.col(f"{window_col}.end"))
        .drop(window_col)
    )


def salted_window_agg(
    df: DataFrame,
    time_column: str,
    group_exprs: Sequence[str],
    sum_like_aggs: dict[str, Column],
    window_length_ms: int,
    slide_ms: int | None = None,
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-stage salted aggregation for pathologically skewed keys.

    Stage 1 aggregates on (window, keys, salt) — spreading one hot key
    over ``salt_buckets`` reducers — stage 2 re-aggregates without the
    salt. Only algebraic (sum/count/min/max-like) aggregates can be
    split this way; ``sum_like_aggs`` maps output name → stage-1 agg,
    and stage 2 applies the matching combiner (sum for sum/count,
    min/max pass through) keyed by the expression's name prefix.
    """
    slide = _ms_to_interval(slide_ms) if slide_ms else None
    win = F.window(F.col(time_column), _ms_to_interval(window_length_ms), slide)
    salted = df.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    stage1 = salted.groupBy(win.alias("window"), *group_exprs, "_salt").agg(
        *[a.alias(n) for n, a in sum_like_aggs.items()]
    )
    combiners = []
    for name in sum_like_aggs:
        if name.startswith("min"):
            combiners.append(F.min(name).alias(name))
        elif name.startswith("max"):
            combiners.append(F.max(name).alias(name))
        else:  # sum / count partials combine by summation
            combiners.append(F.sum(name).alias(name))
    out = stage1.groupBy("window", *group_exprs).agg(*combiners)
    return flatten_window(out)
