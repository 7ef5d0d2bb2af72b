"""Query registry: every implemented operator from SURVEY.md §2 gets
a (spark_impl, oracle_sql) pair. The driver runs both at sf=0.01 and
hash-compares results (order-insensitive, columns sorted by name), so

- every computed column is aliased IDENTICALLY in both,
- floats are rounded the same number of digits in both,
- all hashing is md5-based (identical across engines),
- top-k queries carry explicit tiebreaks so LIMIT is deterministic.

Known rounding hazard (fix pattern, applied where hit): Spark's
round() rounds the shortest DECIMAL repr half-up while DuckDB rounds
the BINARY value, so a quotient landing EXACTLY on a half-way decimal
(systematic when a k-decimal numerator divides a small integer — see
window_rollup_cascade's 307.03/8 = 38.37875 at sf0.001) diverges by
one final digit. Where a query hits this, replace the final round
with the explicit binary HALF_UP ``floor(x·10^d + 0.5)/10^d`` on BOTH
sides — identical IEEE ops, no repr dependence. Plain int/int rates
rounded at 6 digits can also land half-way when the reduced
denominator divides 2·10^6 but not 10^6 (e.g. 1/128); all current
entries are sweep-green at sf0.001/0.01/0.1 — apply the same fix if a
scale factor ever surfaces one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from denormalized_spark.queries import (
    analytics,
    curation,
    llm_pipeline,
    relational,
    streaming_windows,
    temporal,
    udf_queries,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for mod in (relational, streaming_windows, llm_pipeline, udf_queries, temporal, curation, analytics):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# The external correctness driver samples the FIRST 50 registry entries in
# order, so the front of the registry is a rotating re-verification window.
# Cumulative coverage through r5: every one of the 132 entries has at least
# one driver-green row (r1-r5 union). Round-6 window, in priority order:
# (1) the two BRAND-NEW r6 entries (never driver-verified), (2) entries
# whose operator or oracle CHANGED this round (the review fixes + the
# feature-hashing rewrite), (3) the staleness rotation — every entry whose
# latest driver green is r2 (11 scalars) or r3 (22: curation funnel, UDF/
# temporal, multimodal, ANN), then the oldest r4 entries that fit,
# starting with the ones whose underlying operator family was touched
# (dedup_near_gate sits on the capped near_dedup_batch default path).
# Everything displaced to 51+ was re-verified locally this session by the
# full-registry tools/check_correctness.py sweep at sf0.01.
_DRIVER_PRIORITY = [
    # brand-new r6 operators — never driver-verified
    "sim_ivf_batch", "text_bpe_encode_full", "curation_eval_sample",
    "dedup_corpus_overlap", "sim_projection_topk",
    "events_funnel", "events_cohort_retention", "events_anomaly_windows",
    "sim_pq_topk", "sim_ivf_pq_topk",
    "events_props_breakdown", "events_latency_percentiles",
    "events_session_funnel", "events_anomaly_online",
    "events_transitions", "curation_snapshot_diff", "dedup_fuzzy_names",
    "dedup_fuzzy_names_char", "events_key_skew",
    # operator/oracle changed this round — re-prove under the new code
    "curation_mixture_solver", "text_bpe_encode", "text_bpe_train",
    "dedup_incremental_gate", "text_train_linear_langid",
    "window_rollup_cascade",
    # the ENTIRE minhash family re-verifies this round: the r6 hash-
    # family fix (MERSENNE31) changed every signature-derived value
    # (oracles regenerated from the same constants — but the driver
    # must re-prove them, cumulative greens are stale for these)
    "dedup_minhash_signatures", "dedup_lsh_candidates",
    "dedup_jaccard_lsh_verified", "dedup_minhash_estimate",
    "dedup_connected_components", "dedup_near_gate",
    "dedup_cluster_representatives", "dedup_containment_pairs",
    "curation_split_leakage",
    # latest green r2 — the timestamp-free scalar family
    "array_funcs", "explode_top_tokens", "over_nth_value",
    "over_ntile_percentrank", "scalar_case_json", "scalar_encode_digest",
    "scalar_hash_funcs", "scalar_math_checksums", "scalar_regex",
    "scalar_string_funcs", "scalar_struct_funcs",
    # latest green r3 (curation_pipeline/full_funnel displaced to 51+:
    # both are bench headline queries, execution-exercised every round)
    "curation_chunks", "curation_contamination_report", "curation_decontaminate",
    "curation_mixture", "curation_pack",
    "curation_quota", "curation_redact", "curation_split",
    "join_asof_purchase_click", "join_range_order_bursts", "kmeans_clusters",
    "multimodal_audio_chunks", "multimodal_features", "sessionize_users",
    "sim_centroid_by_label", "sim_ivf_topk_query0", "sim_lsh_buckets",
    "udaf_weighted_avg_price", "udf_revenue_by_flag",
    "window_event_time_normalization",
    # positions 51+, re-rotated next round
    "curation_full_funnel", "curation_pipeline",
    "multimodal_bmp_stats", "multimodal_png_stats",
    "multimodal_wav_features", "agg_pricing_summary", "join_region_volume",
    "window_tumbling_1h", "text_trending_tokens", "window_resample_ffill",
    "curation_boilerplate_lines",
    "curation_validate", "text_token_entropy",
    "text_frequency_spectrum", "curation_data_card", "curation_quality_monitor",
    "text_bigram_quality", "curation_dedup_lines",
    "sim_outlier_scores", "sim_batch_topk", "curation_chunk_dup_rate",
    "sim_hard_negatives", "text_structure_stats", "text_lang_mismatch",
    "window_ohlc", "sim_ivf_recall", "curation_drift_report",
    "curation_decontaminate_bloom", "dedup_ngram_duplication_rate",
    "dedup_exact", "dedup_fingerprint",
    "dedup_jaccard_pairs", "dedup_simhash", "dedup_embedding_neardup",
    "text_gopher_rules", "text_quality_percentile_gate", "text_stats",
    "text_langid_accuracy", "text_langid_ngram_confusion", "text_token_totals",
    "text_unigram_quality", "text_quality_classifier", "text_bpe_pairs",
    "text_tfidf_keywords", "text_repetition",
    "sim_quantize_int8", "sim_topk_query0", "sim_topk_quantized_query0",
    "sim_threshold_pairs",
]

def _reorder(d: dict) -> dict:
    missing = set(_DRIVER_PRIORITY) - set(d)
    assert not missing, f"_DRIVER_PRIORITY names absent from registry: {missing}"
    front = {k: d[k] for k in _DRIVER_PRIORITY}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}

QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)
