"""streaming_llm_gate example — the LLM-data streaming surface built
ON TOP of the reference's API (the reference has no equivalent): an
online MinHash-LSH near-duplicate gate (first claimant of every LSH
band survives), a TRAINED hashed-linear quality gate (engine-portable
gradient descent), and dynamic-gap session windows — all running as
one Structured Streaming job.

No broker needed: ``--demo`` replays the documents/events parquet
tables as file-backed streams.

    PYTHONPATH=. python examples/streaming_llm_gate.py --demo
"""

import os
import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.datastream import DataStream
from denormalized_spark.operators.text import (
    linear_classifier_score,
    train_linear_classifier,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main_demo() -> None:
    ctx = Context(app_name="streaming_llm_gate")
    spark = ctx.spark

    # 1. TRAIN the cheap linear gate on the batch corpus (label: is
    #    the doc English?) — 3 one-aggregation GD passes; the same
    #    trajectory a DuckDB oracle can replay bit-for-bit.
    docs = ctx.from_parquet(f"{SF_DIR}/documents.parquet").df
    weights = train_linear_classifier(
        docs, (F.col("lang") == "en").cast("long"), "text", dim=8, iters=3,
        lr_bits=25,
    )
    print("trained gate weights:", weights)

    # 2. Replay the corpus as a stream and run the ONLINE pipeline:
    #    near-dup gate -> trained quality gate.
    stage = tempfile.mkdtemp(prefix="llm_gate_docs_")
    docs.withColumn(
        "ts", F.timestamp_millis(F.col("doc_id") * 1000)
    ).write.mode("overwrite").parquet(stage)
    sdf = (
        spark.readStream.schema(
            spark.read.parquet(stage).schema
        ).parquet(stage)
    )
    ds = DataStream(sdf, event_time="ts").near_dedup(
        "doc_id", "text", payload_cols=("text", "lang")
    )
    gated = ds.df.withColumn(
        "gate_score", linear_classifier_score(weights, "text")
    )
    kept = []
    q = DataStream(gated, event_time=None).sink(
        lambda b: kept.append(b.count()),
        checkpoint=tempfile.mkdtemp(prefix="llm_gate_ck_"),
    )
    q.awaitTermination(300)
    print(f"near-dup gate passed {sum(kept)} docs through (of {docs.count()})")

    # 3. Dynamic-gap session windows over the events stream: clicks
    #    time out after 10 min, everything else after 30.
    ev = ctx.from_stream_parquet(SF_DIR, "events", event_time="ts")
    gap = F.when(F.col("event_type") == "click", F.lit(600_000)).otherwise(
        F.lit(1_800_000)
    )
    sessions = []
    q2 = ev.session_window(
        ["user_id"], [F.count("*").alias("n")], gap
    ).sink(
        lambda b: sessions.append(b.count()),
        checkpoint=tempfile.mkdtemp(prefix="llm_gate_sess_"),
    )
    q2.awaitTermination(300)
    print(f"dynamic-gap sessionization emitted {sum(sessions)} sessions")
    print("streaming_llm_gate demo done")


if __name__ == "__main__":
    if "--demo" in sys.argv:
        main_demo()
    else:
        print("A Kafka-based variant would subscribe the same pipeline "
              "to a topic; run with --demo for the file-backed replay.")
