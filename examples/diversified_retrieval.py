"""diversified_retrieval — the retrieval rerank stack the round-12
operators enable, in one script: maximum-inner-product scoring
(magnitude-aware, unlike cosine), the SIMPLE-LSH norm-augmentation
reduction that lets the existing cosine-LSH index serve MIPS
sublinearly, and a Maximal-Marginal-Relevance rerank so near-duplicate
passages don't crowd the context window — finished with a
histogram-binning calibration of a relevance pseudo-probability so the
downstream gate thresholds a CALIBRATED score.

    PYTHONPATH=. python examples/diversified_retrieval.py [sf_dir]

Plan shapes at 100 TB:
- MIPS leg: 1-row query broadcast, scan-speed inner products,
  TakeOrderedAndProject (operators/similarity.mips_topk); sublinear:
  mips_augment (unit-sphere reduction, Neyshabur & Srebro 2015) feeds
  the hyperplane-LSH bucket index unchanged.
- MMR rerank: k scan+TakeOrdered(1) metadata probes; the selected set
  re-enters as ≤k literal vectors (Carbonell & Goldstein 1998).
- calibration: a ≤10-row map broadcast over the corpus
  (operators/analytics.calibration_apply; Zadrozny & Elkan 2001).
"""

import sys

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.analytics import calibration_apply
from denormalized_spark.operators.similarity import (
    mips_augment,
    mips_topk,
    mmr_select,
)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="diversified_retrieval")
emb = ctx.from_parquet(f"{sf_dir}/embeddings.parquet").df
docs = ctx.from_parquet(f"{sf_dir}/documents.parquet").df

qv = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
cands = emb.filter(F.col("vec_id") != 0)

# -- 1. magnitude-aware first-stage retrieval ------------------------------
qdf = ctx.spark.createDataFrame([(list(qv),)], "qvec array<double>")
first = mips_topk(cands, qdf, k=20)
print("MIPS top-20 (first stage):")
first.show(5, truncate=False)

# -- 2. the sublinear path: augmented vectors are unit-norm, so any
#       cosine-LSH index serves MIPS unchanged --------------------------
aug = mips_augment(cands)
n_unit = aug.select(
    F.abs(
        F.aggregate(
            F.col("aug"), F.lit(0.0), lambda a, v: a + v * v
        )
        - 1.0
    ).alias("dev")
).agg(F.max("dev").alias("max_dev")).collect()[0]
print(f"augmented vectors unit-norm to {n_unit['max_dev']:.2e}")

# -- 3. MMR rerank: diversity-aware top-8 ----------------------------------
reranked = mmr_select(cands, list(qv), k=8)
print("MMR-diversified top-8:")
reranked.show(truncate=False)

# -- 4. calibrated quality gate over the whole corpus ----------------------
scored = docs.select(
    "doc_id",
    F.least(
        F.lit(1000).cast("long"),
        (F.length("text") % 1009).cast("long"),
    ).alias("s"),
    F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
)
calibrated = calibration_apply(scored, "s", "y")
print("calibrated gate sample:")
calibrated.select("doc_id", "s", "bin", "calibrated_milli").show(5)
print(f"retrieval report complete: {reranked.count()} diversified hits")
