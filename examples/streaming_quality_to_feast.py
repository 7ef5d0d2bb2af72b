"""streaming_quality_to_feast — the reference's headline pipeline
shape (source → window → gate → sink; docs/kafka_rideshare_example.md
is the Kafka form) composed end-to-end from the LLM-data pieces, in
ONE writeStream graph:

    documents stream
      → online MinHash-LSH near-dup gate   (first claimant survives)
      → per-hour corpus-quality monitor    (windowed aggregation,
                                            chained via the gate's
                                            ts_mode="window_time")
      → Feast feature push                 (per-micro-batch
                                            store.push — the
                                            reference's
                                            FeastDataStream sink)

The gate's ``ts_mode="window_time"`` output keeps the event-time tag,
which is what lets a SECOND stateful operator (the monitor's windowed
aggregation) run downstream of it in the same query — re-declaring a
watermark there would hold its windows open forever.

No broker and no feast install needed: the documents table replays as
a file-backed stream, and a console stand-in implements the
``store.push(name, pandas_df, to=...)`` contract when feast is
absent (the sink calls the identical API either way).

    PYTHONPATH=. python examples/streaming_quality_to_feast.py [sf_dir]
"""

import os
import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.datastream import DataStream
from denormalized_spark.operators.text import quality_score, token_count
from denormalized_spark.sources.feast import write_feast_feature

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
)


class ConsoleFeatureStore:
    """Stand-in for feast.FeatureStore when feast isn't installed:
    same ``push`` signature, prints instead of materializing."""

    def __init__(self):
        self.pushed_rows = 0

    def push(self, push_source_name, pdf, to="online"):
        self.pushed_rows += len(pdf)
        print(f"feast.push[{push_source_name}] to={to} rows={len(pdf)}")
        print(pdf.to_string(index=False))


def main() -> None:
    ctx = Context(app_name="streaming_quality_to_feast")
    spark = ctx.spark

    # Replay documents as a time-ordered stream: 1 doc per minute,
    # chunked into ~50-minute files so the watermark ratchets per
    # micro-batch (FileStreamSource orders files by mtime).
    docs = ctx.from_parquet(f"{SF_DIR}/documents.parquet").df.withColumn(
        "ts", F.timestamp_millis(F.col("doc_id") * 60_000)
    )
    stage = tempfile.mkdtemp(prefix="qf_docs_")
    n_chunks = 10
    chunk = (docs.count() + n_chunks - 1) // n_chunks
    for k in range(n_chunks):
        p = os.path.join(stage, f"part{k}")
        docs.filter(
            (F.col("doc_id") >= k * chunk) & (F.col("doc_id") < (k + 1) * chunk)
        ).coalesce(1).write.mode("overwrite").parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (1_000_000 + k, 1_000_000 + k))
    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(stage, "part*"))
    )

    # gate → monitor → feast, one query
    gated = DataStream(sdf, event_time="ts").near_dedup(
        "doc_id", "text", payload_cols=("text",), ts_mode="window_time"
    )
    monitor = gated.window(
        [],
        [
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).cast("long").alias("n_tokens"),
            F.round(F.avg(quality_score("text")), 6).alias("mean_quality"),
            F.sum(F.when(quality_score("text") >= 0.5, 1).otherwise(0))
            .cast("long")
            .alias("n_pass"),
        ],
        window_length_ms=3600_000,
    )

    store = ConsoleFeatureStore()
    q = write_feast_feature(
        monitor,
        store,
        push_source_name="corpus_quality_hourly",
        checkpoint=tempfile.mkdtemp(prefix="qf_ck_"),
    )
    q.awaitTermination(300)
    print(
        f"pushed {store.pushed_rows} hourly quality rows "
        f"(of {docs.count()} documents streamed through the near-dup gate)"
    )


if __name__ == "__main__":
    main()
