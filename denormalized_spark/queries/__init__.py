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
# Cumulative coverage through r14: r14 ran its 50-slot window green
# (CORRECTNESS_r14.json, 50/50), so the only entries with NO driver row
# ever are the 24 r13-overflow entries (slots 51-74 of the r14 list) and
# the 9 r14-wave entries (slots 75+). Round-15 window, in priority order:
# (1) those 33 never-driver-run entries — exactly the rotation the r14
# verdict's hygiene item asked for now that the front-50 clocks reset;
# (2) the entries whose OPERATOR code changed in r15 (markov driver-side
# power iteration; lsh_signature_arrays long shift + the salting knob on
# lsh_bucketed_neighbors; the decontaminate gram_source guard; the pca
# NULL passthrough) — their r14 greens predate the change, so they
# re-verify. markov/pca are already in cohort (1).
# (3) The remaining slots and everything past 50 keep the r14 window's
# order (all freshly green in r14), so the next staleness drain starts
# from the r12 cohort in a later round.
_DRIVER_PRIORITY = [
    # --- (1) never-driver-run: r13 overflow (24) ---
    "sim_blend_rerank", "sim_split_drift", "events_ipw_ate",
    "curation_neyman_alloc", "dedup_eval_pairs", "dedup_cdc_chunks",
    "text_ad_bigram", "text_readability_fk", "pivot_user_event_matrix",
    "events_seasonal_strength", "agg_theil_inequality",
    "graph_assortativity", "text_burrows_delta",
    "events_markov_stationary", "text_textrank_keywords", "sim_knn_ood",
    "agg_hhi_concentration", "dedup_lsh_scurve", "events_qini_uplift",
    "join_bloom_semi_revenue", "dedup_fastcdc_chunks",
    "curation_softdedup_weights", "events_markov_entropy_rate",
    "sim_pca_top_component",
    # --- (1) never-driver-run: r14 wave (9) ---
    "dedup_fastcdc_maxclamp", "dedup_eval_bcubed", "events_holt_winters",
    "text_quality_auc", "text_js_divergence_matrix", "text_word_burstiness",
    "events_changepoint_binseg", "sim_nprobe_curve", "sim_pq_distortion",
    # --- (2) operator code changed in r15: re-verify ---
    "sim_lsh_buckets", "dedup_embedding_neardup",
    "curation_semantic_decontaminate", "curation_decontaminate",
    "curation_decontaminate_bloom", "curation_full_funnel",
    "curation_pipeline",
    # --- (3) the r14 window in its prior order (fills slots 41-50;
    # the rest land 51+ keeping that order) ---
    "join_salted_priority_revenue", "events_cohort_ltv",
    "sim_recall_curve", "curation_contamination_sensitivity",
    "sim_mips_topk", "events_bootstrap_ci", "text_rake_keywords",
    "sim_mmr_rerank",
    "curation_eval_sample", "curation_mixture", "curation_mixture_solver",
    "curation_pack", "curation_split_leakage", "dedup_cluster_representatives",
    "dedup_connected_components", "dedup_containment_pairs",
    "dedup_corpus_overlap", "dedup_fuzzy_names", "dedup_fuzzy_names_char",
    "dedup_jaccard_lsh_verified", "dedup_minhash_estimate",
    "dedup_minhash_signatures", "events_anomaly_online",
    "events_anomaly_windows", "events_key_skew", "events_latency_percentiles",
    "events_props_breakdown", "events_transitions", "explode_top_tokens",
    "over_nth_value", "over_ntile_percentrank", "scalar_case_json",
    "scalar_encode_digest", "scalar_hash_funcs", "scalar_math_checksums",
    "scalar_regex", "scalar_string_funcs", "scalar_struct_funcs",
    "sim_ivf_batch", "sim_ivf_pq_topk", "sim_pq_topk", "sim_projection_topk",
    "text_bpe_encode", "text_bpe_encode_full", "text_bpe_train",
    "text_train_linear_langid", "window_rollup_cascade",
    "curation_contamination_ngram13", "sim_ivf_incremental",
    "dedup_paragraph_blocks",
]

def _reorder(d: dict) -> dict:
    missing = set(_DRIVER_PRIORITY) - set(d)
    assert not missing, f"_DRIVER_PRIORITY names absent from registry: {missing}"
    front = {k: d[k] for k in _DRIVER_PRIORITY}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}

QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)
