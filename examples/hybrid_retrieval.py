"""hybrid_retrieval — the full lexical + dense retrieval stack in one
script: Okapi BM25 over the document text (sparse leg), brute-force
cosine over the embedding column (dense leg — swap in the IVF/LSH
paths from ann_index_serving at corpus scale), fused with
reciprocal-rank fusion (Cormack et al. 2009).

    PYTHONPATH=. python examples/hybrid_retrieval.py [sf_dir]

Why hybrid: BM25 wins on exact-term queries (names, codes, rare
words), embeddings win on paraphrase; RRF combines both with zero
training. Plan shapes at 100 TB:

- BM25 leg: postings pruned to the |q| query terms MAP-SIDE, corpus
  stats a 1-row broadcast, top-k via TakeOrderedAndProject
  (operators/text.bm25_topk).
- dense leg: broadcast query vector, scan-speed scoring, TakeOrdered
  (operators/similarity.cosine_topk; production: ivf_batch_topk).
- fusion: both inputs are already top-n metadata — union + keyed sum
  + TakeOrdered, cost independent of corpus size.

The demo treats vec_id as the document id (the synthetic tables are
row-aligned); on real data the embedding table carries the doc key.
"""

import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.similarity import cosine_topk, rrf_fuse
from denormalized_spark.operators.text import bm25_topk

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context(app_name="hybrid_retrieval")
docs = ctx.from_parquet(f"{sf_dir}/documents.parquet").df
emb = ctx.from_parquet(f"{sf_dir}/embeddings.parquet").df

QUERY_TERMS = ["scan", "join", "filter"]
N = 10

# -- sparse leg: BM25 top-n with dense ranks -------------------------------
lex = bm25_topk(docs, QUERY_TERMS, k=N)
lex_ranked = lex.select(
    F.col("doc_id").alias("vec_id"),
    F.row_number()
    .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
    .alias("rank"),
)

# -- dense leg: cosine top-n against query vector (vec 0 as the "query") ---
qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
den = cosine_topk(emb.filter(F.col("vec_id") != 0), qvec, k=N)
den_ranked = den.select(
    "vec_id",
    F.row_number()
    .over(Window.orderBy(F.desc("cosine_sim"), F.asc("vec_id")))
    .alias("rank"),
)

# -- fuse -------------------------------------------------------------------
fused = rrf_fuse([lex_ranked, den_ranked], id_col="vec_id", topk=N)
rows = fused.collect()
print(f"hybrid top-{N} (RRF of BM25[{' '.join(QUERY_TERMS)}] + dense[q=vec0]):")
for r in rows:
    print(f"  doc {r['vec_id']:>6}  rrf={r['rrf_score']}")
assert 1 <= len(rows) <= N
print("OK")
