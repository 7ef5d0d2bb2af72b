"""SparkSession factory with scale-oriented defaults.

The reference tunes its engine for single-node latency (batch_size=32,
coalesce_batches=false — crates/core/src/context.rs:27-37). A Spark
build tunes the opposite direction: large columnar batches, AQE for
runtime re-planning, and shuffle-partition counts sized to the
cluster. These defaults are chosen so the same code runs on
``local[32]`` for tests and on a 1000-executor cluster unchanged:

- AQE on: coalesces post-shuffle partitions at runtime, rewrites
  skewed joins, and converts sort-merge joins to broadcast when the
  runtime size allows — this is what makes one static config survive
  a 100× scale-up.
- ``spark.sql.shuffle.partitions`` is only the pre-AQE upper bound;
  AQE coalesces it down. On a real cluster, set it to 2-3× total
  cores via ``extra_conf``.
- UTC session timezone: parquet/DuckDB timestamps are UTC-naive;
  pinning the session TZ makes event-time arithmetic deterministic.
- Arrow enabled: every Python-boundary crossing (pandas UDFs,
  toPandas, applyInPandas) is Arrow-batched, never row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs — shared verbatim by __spark_entry__._configure
# so a driver-provided session gets IDENTICAL semantics (especially the
# timestamp confs: a session without inferTimestampNTZ=false reads naive
# parquet timestamps as TIMESTAMP_NTZ, changing column types engine-wide).
RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Pre-AQE shuffle parallelism. Local default: ~cores. Cluster:
    # override to 2-3x total executor cores.
    "spark.sql.shuffle.partitions": "32",
    # Keep scan partitions big enough to amortize task overhead but
    # small enough to fit in executor memory at 100 TB inputs.
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB
    # Broadcast threshold: dimension tables (region/nation/customer/
    # supplier/part at reasonable SFs) should broadcast, not shuffle.
    "spark.sql.autoBroadcastJoinThreshold": "67108864",  # 64 MiB
    "spark.sql.ansi.enabled": "false",
    # Parquet TIMESTAMP(NANOS) (pandas/pyarrow default) is otherwise
    # unreadable; read as long and convert in sources.files.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive parquet timestamps (isAdjustedToUTC=false, e.g. pyarrow
    # timestamp[us]) would otherwise read as TIMESTAMP_NTZ, which
    # withWatermark rejects; read them as session-TZ TIMESTAMP (UTC
    # above), matching DuckDB's naive interpretation value-for-value.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}

_DEFAULTS = {
    **RUNTIME_CONF,
    "spark.ui.showConsoleProgress": "false",
    # Local-mode JVM heap. Spark's 1g default OOMs collect_list-heavy
    # aggregations long before the box's memory is used; on a real
    # cluster this is spark.executor.memory territory instead. Only
    # effective at JVM launch (first session build).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
}


from contextlib import contextmanager


@contextmanager
def state_partition_scope(spark: SparkSession, n: int):
    """Pin the state-store partition count for streaming queries
    started (and first-batch-planned) inside this scope.

    Spark captures ``spark.sql.shuffle.partitions`` into the streaming
    checkpoint at the first micro-batch and every stateful operator
    gets one state-store instance per partition, FOREVER (restarts
    reuse the checkpointed count). Each instance costs a per-batch
    commit + Python-worker channel, so the count should track the
    workload: 2-3x total executor cores on a production cluster,
    but near the distinct-key/core balance point for small key spaces
    (measured on local[32]: an applyInPandasWithState drain of 100k
    rows / 1.5k keys runs 4x faster at 8 partitions than at 32 —
    pure per-partition fixed cost).

    Keep the query's first ``awaitTermination`` inside the scope: the
    first batch is planned asynchronously after ``start()``.
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield spark
    finally:
        spark.conf.set(key, prev)


def get_spark(
    app_name: str = "denormalized_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset and
    no cluster manager is configured, so tests and bench share one
    code path with production (where ``master`` comes from
    spark-submit and this argument stays None).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master("local[*]")
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
