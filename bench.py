"""Benchmark harness — times the headline queries and prints ONE JSON line.

Usage: python bench.py
    $SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
    $SPARK_GRAFT_CPUS    local[N] parallelism (default 32)

Each query is forced with a noop sink (full execution, no driver
collect) and timed wall-clock. Output:
    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <float>}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Headline set: one per major operator family, weighted toward the
# scale-critical plans (shuffle joins, windowed aggs, LSH dedup, ANN).
HEADLINE = [
    "agg_pricing_summary",      # TPC-H Q1 shape: scan + partial/final agg
    "filter_revenue",           # pushdown filter + agg
    "join_top_orders",          # lineitem⋈orders shuffle join + topk
    "join_region_volume",       # 6-table join, 5 broadcast dims
    "over_rank_per_customer",   # partitioned OVER window
    "window_tumbling_1h",       # event-time tumbling window agg
    "window_sliding_1h_30m",    # sliding window agg
    "window_session_30m",       # session window agg
    "dedup_exact",              # hash-groupBy dedup
    "dedup_lsh_candidates",     # MinHash-LSH banded self-join
    "dedup_simhash",            # per-row simhash signatures
    "text_stats",               # scan-speed text projections
    "sim_topk_query0",          # brute-force cosine top-k (broadcast)
    "sim_lsh_buckets",          # hyperplane-LSH ANN buckets
    "join_asof_purchase_click", # joinless union+window as-of join
    "join_range_order_bursts",  # bin-bucketed interval join
    "sessionize_users",         # stateful gap sessionization (batch twin)
    "dedup_embedding_neardup",  # LSH-gated semantic dedup
    "agg_rollup_pricing",       # multi-dim rollup aggregation
    "curation_pipeline",        # decontaminate → mixture-sample funnel
    "text_unigram_quality",     # unigram-LM scoring: token shuffle + broadcast LM
    "curation_full_funnel",     # classifier→dedup→decontaminate→split, one plan
]


def main() -> None:
    t_start = time.time()
    from denormalized_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # JVM/codegen/parquet-reader warmup so q1 isn't charged for
    # session startup (measured: first parquet query pays ~2.5s of
    # one-time vectorized-reader + codegen init at any SF)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from denormalized_spark.sources.files import load_table

    warm = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    warm.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    # min of 2 runs per query: run 1 pays the per-plan codegen (1-3 s
    # for the big LSH expression trees — a fixed cost that amortizes
    # away over a 100 TB scan), run 2 measures steady-state execution.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        runs = []
        for _ in range(2):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        cold[name] = round(runs[0], 3)

    stream_rows, stream_wall = _stream_throughput(spark)
    state_rows, state_wall = _stateful_stream_throughput(spark)

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else 0.0
    out = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "sf": sf,
        "stream_rows": stream_rows,
        "stream_wall": round(stream_wall, 3),
        "stream_rows_per_sec": round(stream_rows / stream_wall) if stream_wall else None,
        "stateful_stream_rows_per_sec": (
            round(state_rows / state_wall) if state_wall else None
        ),
        "wall_total": round(time.time() - t_start, 3),
    }
    print(json.dumps(out))


def _stream_throughput(spark) -> tuple[int, float]:
    """End-to-end Structured Streaming throughput: events table →
    event-time tumbling window aggregation → foreachBatch sink,
    availableNow trigger (the whole file drains through the streaming
    engine with real state-store updates). The reference's only
    published workload figure is its Kafka generator's ~58k msgs per
    60 s run (docs/kafka_rideshare_example.md); this measures the
    analogous pipeline at the bench scale factor."""
    import tempfile

    from pyspark.sql import functions as F

    from denormalized_spark.context import Context

    ctx = Context(spark)
    ds = ctx.from_stream_parquet(SF_DIR, "events", event_time="ts")
    windowed = ds.window(
        ["event_type"],
        [F.count("*").alias("n"), F.sum("value").alias("total")],
        window_length_ms=3600_000,
    )
    n_in = ctx.from_parquet(f"{SF_DIR}/events.parquet").df.count()
    emitted = []
    t0 = time.time()
    q = windowed.sink(
        lambda df: emitted.append(df.count()),
        checkpoint=tempfile.mkdtemp(prefix="bench_stream_"),
    )
    q.awaitTermination(600)
    return n_in, time.time() - t0


def _stateful_stream_throughput(spark) -> tuple[int, float]:
    """CUSTOM-STATE streaming throughput: the same events drained
    through applyInPandasWithState gap sessionization (GroupState +
    event-time timeout) — the reference's custom stateful-operator
    path, where state crosses the Python boundary per group."""
    import tempfile

    from denormalized_spark.context import Context

    ctx = Context(spark)
    ds = ctx.from_stream_parquet(SF_DIR, "events", event_time="ts")
    sess = ds.sessionize(["user_id"], gap_ms=1800_000)
    n_in = ctx.from_parquet(f"{SF_DIR}/events.parquet").df.count()
    emitted = []
    t0 = time.time()
    q = sess.sink(
        lambda df: emitted.append(df.count()),
        checkpoint=tempfile.mkdtemp(prefix="bench_state_"),
    )
    q.awaitTermination(600)
    return n_in, time.time() - t0


if __name__ == "__main__":
    main()
