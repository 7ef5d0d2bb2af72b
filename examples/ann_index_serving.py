"""ann_index_serving — the ANN index lifecycle end-to-end: build a
persistent IVF+PQ index once at ingest, store it as parquet
PARTITIONED BY cluster, then serve query batches against the stored
index without ever re-fitting or re-reading full vectors.

    PYTHONPATH=. python examples/ann_index_serving.py [sf_dir]

Build (once per corpus load):
    1. coarse quantizer  — label_centroids (or kmeans_fit)
    2. assignment        — assign_clusters: each vector's cluster
    3. PQ codes          — pq_encode: m small ints per vector
    4. persist           — parquet partitioned by cluster; centroid
                           table + codebooks stored beside it

Serve (per query / query block):
    5. probe             — rank the k-row centroid table, pick nprobe
    6. partition-pruned scan — only the probed cluster directories
    7. ADC               — m lookup-table reads per row, top-k
    8. (re-rank the short list with full vectors where needed)

At 100 TB the partition pruning in step 6 is visible in the scan plan
(PartitionFilters on cluster), and step 7 reads m ints per row, not
dim floats. This is the ANN twin of examples/incremental_dedup_load's
band-index lifecycle.
"""

import json
import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.similarity import (
    assign_clusters,
    ivf_pq_topk,
    label_centroids,
    pq_codebooks_from_labels,
    pq_encode,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="ann_index_serving")
spark = ctx.spark
emb = ctx.from_parquet(f"{sf_dir}/embeddings.parquet").df

root = tempfile.mkdtemp(prefix="ann_index_")
index_path = f"{root}/vectors"
meta_path = f"{root}/meta"

# ---- build ----------------------------------------------------------
cent = label_centroids(emb, "label", "embedding", dim=64)
books = pq_codebooks_from_labels(emb, m=4, dim=64)
assigned = assign_clusters(emb, cent, "vec_id", "embedding")
encoded = pq_encode(assigned, books).select("vec_id", "cluster", "pq_code")
encoded.write.mode("overwrite").partitionBy("cluster").parquet(index_path)
cent.write.mode("overwrite").parquet(meta_path)
with open(f"{root}/codebooks.json", "w") as f:
    json.dump(books, f)
n = spark.read.parquet(index_path).count()
print(f"index built: {n} vectors, partitioned by cluster at {index_path}")

# ---- serve ----------------------------------------------------------
stored = spark.read.parquet(index_path)
stored_cent = spark.read.parquet(meta_path)
stored_books = json.load(open(f"{root}/codebooks.json"))

queries = [r["embedding"] for r in emb.filter(F.col("vec_id") < 3).collect()]
for qi, qvec in enumerate(queries):
    top = ivf_pq_topk(
        stored, stored_cent, stored_books, [float(x) for x in qvec],
        k=5, nprobe=2,
    )
    rows = top.collect()
    print(
        f"query {qi}: top-5 ids {[r['vec_id'] for r in rows]} "
        f"adc {[round(r['adc_dist'], 3) for r in rows]}"
    )

# the probed scan prunes partitions — show it in the physical plan
plan = (
    ivf_pq_topk(stored, stored_cent, stored_books,
                [float(x) for x in queries[0]], k=5, nprobe=2)
    ._jdf.queryExecution().executedPlan().toString()
)
pruned = "dynamicpruning" in plan.lower() or "PartitionFilters" in plan
print(f"partition pruning visible in plan: {pruned}")
