"""tokenizer_shards — the training-shard write-out pipeline the BPE
stack exists for: induce a tokenizer, persist the model, tokenize the
corpus to id sequences, pack them into fixed-length training
sequences, and land shards + vocab as parquet.

    python examples/tokenizer_shards.py [sf_dir]

Stages (each oracle-checked by `text_bpe_*` query entries; see
denormalized_spark/queries/llm_pipeline.py):
  1. tokenizer induction      (bpe_train — ONE corpus shuffle, then
                               vocabulary-bounded rounds)
  2. model persistence        (bpe_save / bpe_load parquet round trip)
  3. vocabulary table         (bpe_vocab_table: sorted alphabet ids,
                               then merge ranks — GPT-style id order)
  4. tokenize to ids          (bpe_tokenize — Arrow-batched kernel,
                               per-distinct-word cache, no shuffle)
  5. sequence packing         (pack_token_sequences — prefix-sum
                               offsets, fragment slices, one
                               seq-keyed assembly shuffle)
  6. shard landing            (parquet: input_ids ready for a loader)
"""

import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators import text

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_root = tempfile.mkdtemp(prefix="shards_")

ctx = Context()
spark = ctx.spark
docs = ctx.from_parquet(f"{sf_dir}/documents.parquet").df.select(
    "doc_id", "text"
)

# 1-2. induce + persist + reload the merge table (the model artifact)
merges_df = text.bpe_train(docs, num_merges=16, max_vocab=2000)
text.bpe_save(merges_df, f"{out_root}/merges")
merges = text.bpe_load(spark, f"{out_root}/merges")
print(f"learned {len(merges)} merges; first 5: {merges[:5]}")

# 3. vocabulary table (alphabet + merge pieces with their ids)
alphabet = text.corpus_alphabet(docs)
vocab = text.bpe_vocab_table(spark, merges, alphabet)
vocab.write.mode("overwrite").parquet(f"{out_root}/vocab")
print(f"vocab: {vocab.count()} pieces ({len(alphabet)} base chars)")

# 4. tokenize every document to its ordered id sequence
toks = text.bpe_tokenize(docs, merges, alphabet)

# 5. pack into 256-token training sequences, EOS-separated, padded
eos = len(alphabet) + len(merges)  # first id past the vocab
packed = text.pack_token_sequences(
    toks, seq_len=256, sep_id=eos, pad_id=eos + 1
)

# 6. land the shards
packed.write.mode("overwrite").parquet(f"{out_root}/shards")
n_seq, n_tok = packed.agg(
    F.count("*"), F.sum("n_real")
).collect()[0]
total = toks.agg(F.sum("n_tokens") + F.count("*")).collect()[0][0]
assert n_tok == total, (n_tok, total)  # ids + one EOS per doc, conserved
print(
    f"wrote {n_seq} sequences ({n_tok} tokens incl. EOS) to"
    f" {out_root}/shards — token count conserved"
)
