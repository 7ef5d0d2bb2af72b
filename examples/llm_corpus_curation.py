"""llm_corpus_curation — showcase of this engine's extension surface
beyond the reference: the full pre-training data-prep funnel over the
documents table, landed as a partitioned train/val parquet layout.

    python examples/llm_corpus_curation.py [sf_dir]

Stages (each oracle-checked by the `curation_*`/`dedup_*`/`text_*`
query entries; see denormalized_spark/queries/):
  1. model-based quality filter  (hashed-linear classifier, scan-speed)
  2. near-dup removal            (fingerprint, min-id survivor)
  3. benchmark decontamination   (5-gram overlap, broadcast gate)
  4. deterministic 90/10 split   (group-safe md5 fractions)
  5. per-source token budget     + partitioned parquet landing
  6. data card                   (grouping-sets corpus report)
  7. tokenizer induction         (BPE merge table over the kept split)
"""

import sys
import tempfile

from denormalized_spark import Context
from denormalized_spark.datastream import DataStream
from denormalized_spark.operators import curation, text
from pyspark.sql import functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context()
docs = ctx.from_parquet(f"{sf_dir}/documents.parquet").df
corpus = docs.filter(F.col("doc_id") % 20 != 7)
bench = docs.filter(F.col("doc_id") % 20 == 7)  # stand-in eval set

# 1. quality filter
q = corpus.filter(text.hashed_linear_score("text") > 0.5)
# 2. fingerprint dedup (min-id survivor) — rank-limit window: one
#    fingerprint shuffle, one corpus pass
from pyspark.sql import Window

w = Window.partitionBy("f").orderBy("doc_id")
fp = q.withColumn("f", text.fingerprint("text"))
dd = (fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("f", "_rn"))
# 3. decontaminate vs the benchmark
clean = curation.decontaminate(dd, bench, n=5)
# 4. split
sp = curation.split_assign(clean, {"train": 0.9, "val": 0.1})

# 5. report + landing
report = sp.groupBy("split", "source").agg(
    F.count("*").alias("n_docs"),
    F.sum(text.token_count("text")).alias("n_tokens"),
)
report.orderBy("split", "source").show(20, truncate=False)

out = tempfile.mkdtemp(prefix="curated_")
DataStream(sp).to_parquet(out, partition_by=["split"])
print(f"curated corpus written to {out}/split=train|val")
print(f"kept {sp.count()} of {docs.count()} docs")

# 6. the data card the snapshot ships with: per-lang/per-source/overall
#    doc+token volume, mean quality, Gopher pass rate, exact-dup rate
print("data card (grouping_level 3 = grand total):")
curation.corpus_report(sp.drop("split"), ["lang", "source"]).orderBy(
    "grouping_level", "lang", "source"
).show(30, truncate=False)

# 7. induce a starter BPE merge table from the train split
merges = text.bpe_train(
    sp.filter(F.col("split") == "train"), num_merges=6, max_vocab=2000
)
print("learned BPE merges (rank order):")
merges.orderBy("rank").show(6, truncate=False)
