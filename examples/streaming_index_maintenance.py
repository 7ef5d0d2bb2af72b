"""streaming_index_maintenance — the live IVF-index upkeep loop:
seed a coarse quantizer from the first vector load, then stream
arriving vector batches through streaming/ivf.IVFMaintainer
(foreachBatch; Sculley 2010's mini-batch running-mean update) and
watch list sizes and centroid drift accumulate until the drift signal
says "schedule a refit".

    PYTHONPATH=. python examples/streaming_index_maintenance.py [sf_dir]

Lifecycle shown here (the maintenance leg of
examples/ann_index_serving.py's build/serve split):

    1. seed    — label_centroids over the initial corpus half
    2. stream  — new batches assign to their nearest list map-side;
                 per batch only k·(dim+2) numbers reach the driver
    3. monitor — per-cluster n_before/n_added and micro-floored L2
                 drift (sim_ivf_incremental is the batch-checkable
                 twin of this loop)
    4. decide  — drift above threshold → full kmeans_fit refit

Self-contained: stages parquet micro-batches from the embeddings
table and drains them with an availableNow stream.
"""

import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

from denormalized_spark.operators.similarity import label_centroids
from denormalized_spark.session import get_spark
from denormalized_spark.sources.files import load_table
from denormalized_spark.streaming.ivf import IVFMaintainer


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("streaming_index_maintenance", master="local[4]")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. seed the quantizer from the initial load (even vec_ids)
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    cent_rows = label_centroids(seed).collect()  # k metadata rows
    maintainer = IVFMaintainer(
        {r["cluster"]: list(r["centroid"]) for r in cent_rows}
    )

    # 2. stage the arriving half as three time-ordered parquet batches
    stream_dir = tempfile.mkdtemp(prefix="ivf_batches_")
    arriving = emb.filter(F.col("vec_id") % 2 == 1)
    now = time.time()
    for i in range(3):
        tmp = os.path.join(stream_dir, f"_b{i}")
        arriving.filter(F.col("vec_id") % 6 == 2 * i + 1).select(
            "embedding"
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dest = os.path.join(stream_dir, f"b{i}.parquet")
        os.rename(os.path.join(tmp, part), dest)
        os.utime(dest, (now - 300 + i * 100,) * 2)

    schema = spark.read.parquet(stream_dir).schema
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
        .writeStream.foreachBatch(lambda df, e: maintainer.update(df, e))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_ivfm_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # 3. the maintenance report
    print(f"batches drained: {maintainer.n_batches}, "
          f"vectors folded in: {maintainer.n_rows}")
    worst = 0
    for k in sorted(maintainer.centroids):
        drift = maintainer.last_drift_micro.get(k, 0)
        worst = max(worst, drift)
        print(f"  list {k}: size {maintainer.counts[k]:5d}  "
              f"last-batch drift {drift} micro")

    # 4. the refit decision the drift signal exists for
    threshold = 50_000  # 0.05 L2 in micro units
    verdict = "REFIT (kmeans_fit)" if worst > threshold else "serve on"
    print(f"max drift {worst} micro vs threshold {threshold} -> {verdict}")


if __name__ == "__main__":
    main()
