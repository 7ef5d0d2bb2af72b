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


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    watermark: str = "0 seconds",
    matched_time_col: str | None = "matched_time",
) -> DataFrame:
    """Stream-stream as-of join (Flink's event-time temporal join;
    Spark has no native equivalent): every left event is enriched with
    the latest right event at-or-before it on the same keys.

    Correctness under out-of-order arrival: a left event at time t can
    only be finalized once no right event with ``rt <= t`` can still
    arrive — i.e. once the watermark passes t. So per key the state
    holds (a) the right-side history, (b) pending left rows; each
    invocation emits every pending left with ``t <= watermark``,
    matching against the history, then prunes the history to the
    single latest right at-or-before the new watermark (earlier rights
    can never match a future emittable left). An event-time timeout at
    the oldest pending left flushes keys that receive no further
    traffic. State per key is O(pending lefts + unexpired rights) —
    bounded by the watermark delay, the same bound Spark's own
    stream-stream joins carry.

    Both inputs are unioned (tagged) so ONE stateful operator sees the
    key's full timeline — the union+window trick of the batch
    :func:`~denormalized_spark.operators.temporal.asof_join`, replayed
    incrementally.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StringType, StructField

    keys = list(on)
    right_cols = list(right_cols)
    left_payload = [c for c in left.columns if c not in keys and c != left_time]
    ts_type = left.schema[left_time].dataType

    lu = left.withWatermark(left_time, watermark).select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_payload],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
    )
    ru = right.withWatermark(right_time, watermark).select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        *[F.col(c) for c in right_cols],
    )
    u = lu.unionByName(ru)

    out_schema = StructType(
        [left.schema[k] for k in keys]
        + [StructField(left_time, ts_type)]
        + [left.schema[c] for c in left_payload]
        + [StructField(c, right.schema[c].dataType) for c in right_cols]
        + ([StructField(matched_time_col, ts_type)] if matched_time_col else [])
    )
    # state: JSON blobs (pandas-serializable regardless of payload
    # types); tiny per key, rewritten per batch
    state_schema = StructType(
        [StructField("lefts", StringType()), StructField("rights", StringType()),
         StructField("oldest_left_us", LongType())]
    )

    def _enc(rows) -> str:
        import json

        return json.dumps(rows)

    def _dec(blob) -> list:
        import json

        return json.loads(blob) if blob else []

    def fn(key, pdf_iter, state):
        import json

        lefts, rights = [], []
        if state.exists:
            lb, rb, _ = state.get
            lefts, rights = _dec(lb), _dec(rb)
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            ts_us = pdf["_t"].astype("datetime64[us]").astype("int64")
            for i in range(len(pdf)):
                row = pdf.iloc[i]
                if int(row["_side"]) == 1:
                    lefts.append(
                        [int(ts_us.iloc[i]), {c: _json_safe(row[c]) for c in left_payload}]
                    )
                else:
                    rights.append(
                        [int(ts_us.iloc[i]), {c: _json_safe(row[c]) for c in right_cols}]
                    )
        wm_us = state.getCurrentWatermarkMs() * 1000
        lefts.sort(key=lambda x: x[0])
        rights.sort(key=lambda x: x[0])
        emit, pending = [], []
        for t_us, payload in lefts:
            if t_us <= wm_us:
                match = None
                for rt_us, rp in rights:
                    if rt_us <= t_us:
                        match = (rt_us, rp)
                    else:
                        break
                emit.append((t_us, payload, match))
            else:
                pending.append([t_us, payload])
        # prune right history: everything strictly older than the
        # latest right at-or-before the watermark can never match a
        # future emittable left (their t > wm >= that right's time)
        keep_from = 0
        for i, (rt_us, _) in enumerate(rights):
            if rt_us <= wm_us:
                keep_from = i
            else:
                break
        rights = rights[keep_from:]
        if pending or rights:
            oldest = pending[0][0] if pending else None
            state.update((_enc(pending), _enc(rights), oldest))
            # flush keys that go quiet: wake when the watermark passes
            # the oldest pending left (+1ms so wm strictly covers it)
            if oldest is not None:
                state.setTimeoutTimestamp(oldest // 1000 + 1)
        else:
            state.remove()
        if emit:
            rows = []
            for t_us, payload, match in emit:
                r = {k: kv for k, kv in zip(keys, key)}
                r[left_time] = pd.Timestamp(t_us, unit="us")
                r.update(payload)
                for c in right_cols:
                    r[c] = match[1][c] if match else None
                if matched_time_col:
                    r[matched_time_col] = (
                        pd.Timestamp(match[0], unit="us") if match else None
                    )
                rows.append(r)
            yield pd.DataFrame(rows)

    return u.groupBy(*keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def _json_safe(v):
    """numpy/pandas scalars → plain JSON-serializable Python values."""
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v):
        return None
    if pd.isna(v):
        return None
    if hasattr(v, "item"):
        return v.item()
    return v
