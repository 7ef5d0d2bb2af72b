"""Custom stateful operators: sessionization with arbitrary per-key
state, on both execution paths.

The reference's only stateful streaming operator is the windowed
aggregation (crates/core/src/physical_plan/continuous/
grouped_window_agg_stream.rs); its UDAF Accumulator protocol
(py-denormalized/python/denormalized/datafusion/udf.py:146-248) is
batch-only. This module supplies the missing piece — user-defined
per-key state that outlives a micro-batch — the Spark way:

- **batch**: exact sessionization with window functions (lag → gap
  flag → running sum = session id → groupBy). Pure JVM, two window
  passes over one shuffle on the key, then a partial+final aggregate.
  This is the 100 TB path for backfills.

- **streaming**: ``applyInPandasWithState`` (GroupState + event-time
  timeout). Arrow-batched per key-partition; state is (start, end,
  count) per key — O(1) per key, stored in the state store (RocksDB
  provider for large key spaces, streaming/checkpoint.py). Sessions
  close (a) on an in-batch gap > ``gap_ms``, (b) on event-time
  timeout once the watermark passes the session end + gap.

Both paths emit the same rows for ordered input: (keys…,
session_start, session_end, n_events) — asserted by
tests/test_stateful.py stream-vs-batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def sessionize_batch(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    gap_ms: int,
) -> DataFrame:
    """Exact batch sessionization: a new session starts when the gap
    from the previous event (same keys) exceeds ``gap_ms``."""
    from pyspark.sql import Window

    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(event_time)
    ts_s = F.col(event_time).cast("timestamp_ltz").cast("double")
    prev = F.lag(event_time).over(w).cast("timestamp_ltz").cast("double")
    new_session = F.when(
        prev.isNull() | ((ts_s - prev) * 1000.0 > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(event_time).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_sid = df.withColumn("_sid", F.sum(new_session).over(run))
    return (
        with_sid.groupBy(*keys, "_sid")
        .agg(
            F.min(event_time).alias("session_start"),
            F.max(event_time).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("_sid")
    )


def sessionize_stream(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    gap_ms: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization with user-defined state
    (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout).

    Per key the state is one open session (start_us, end_us, n). Each
    batch: sort the key's rows, split on gaps, emit every session
    closed by a gap, keep the trailing open session in state with an
    event-time timeout at end + gap; the timeout fires once the
    watermark passes it and flushes the session. Late rows older than
    the watermark were already dropped by ``withWatermark``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from pyspark.sql.types import LongType, StructField

    keys = list(keys)
    ts_type = df.schema[event_time].dataType  # timestamp or timestamp_ntz
    out_schema = StructType(
        [df.schema[k] for k in keys]
        + [
            StructField("session_start", ts_type),
            StructField("session_end", ts_type),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_ms * 1000

    def _emit(key, sessions):
        return pd.DataFrame(
            [
                {
                    **{k: kv for k, kv in zip(keys, key)},
                    "session_start": pd.Timestamp(s, unit="us"),
                    "session_end": pd.Timestamp(e, unit="us"),
                    "n_events": n,
                }
                for (s, e, n) in sessions
            ]
        )

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            s, e, n = state.get
            state.remove()
            yield _emit(key, [(s, e, n)])
            return
        rows = pd.concat(list(pdf_iter))
        ts = rows[event_time].astype("datetime64[us]").astype("int64").sort_values()
        open_sess = tuple(state.get) if state.exists else None
        closed = []
        for t_us in ts:
            t_us = int(t_us)
            if open_sess is None:
                open_sess = (t_us, t_us, 1)
            elif t_us - open_sess[1] > gap_us:
                closed.append(open_sess)
                open_sess = (t_us, t_us, 1)
            else:
                open_sess = (open_sess[0], max(open_sess[1], t_us), open_sess[2] + 1)
        state.update(open_sess)
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        if closed:
            yield _emit(key, closed)

    return (
        df.withWatermark(event_time, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    gap_ms: int,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Path-polymorphic sessionization (the DataStream entry point)."""
    if df.isStreaming:
        return sessionize_stream(df, keys, event_time, gap_ms, watermark)
    return sessionize_batch(df, keys, event_time, gap_ms)
