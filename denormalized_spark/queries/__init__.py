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
# Cumulative coverage through r10: every entry except the four named below
# has at least one driver-green row (r1-r10 union; latest-green per entry
# computable from the CORRECTNESS_r0*.json union). Round-11 window, in
# priority order:
# (1) the two r10 driver-REDS — sim_jl_project and dedup_weighted_minhash
# died in the driver canonicalizer on raw array output columns and were
# reshaped this round to (id, idx, value) rows with zipped-unnest oracles;
# (2) events_drawdown + agg_backlog_ledger, which landed after the r10
# window filled and have never run under the driver;
# (3) the BRAND-NEW r11 entries: SCD2 validity intervals, the daily-revenue
# autocorrelation function (decimal38/HUGEINT exactness), the co-visitation
# triangle census (degree-ordered counting), the KMV set-operation algebra,
# the two-sample Kolmogorov-Smirnov drift test, chi-squared independence
# with Cramér's V, PMI collocations, Fellegi-Sunter linkage scoring, the
# PSI drift metric, exact-percentile winsorization, and rank
# normalization;
# (4) the staleness drain: 14 of the latest-green-r5 cohort
# (2+2+11+13+8+14 = 50). The 20 r5 entries displaced by this session's
# operator waves (t-digest ×3, Mann-Kendall, Kaplan-Meier, EWMA, CUPED,
# vocab richness, k-core, NDCG, CM join-size, MASE, gains table, CCF,
# temperature mixture, tokenizer fertility, changepoint effect, EB
# shrinkage, mixture divergence, threshold curve — all swept at three
# SFs locally) plus
# sketch_bloom_probe (operator changed: probe-key dedup fixing the
# r10-ADVICE false-negative) and the r6 cohort rotate into the r12
# window. Everything displaced to 51+ keeps its registry order.
_DRIVER_PRIORITY = [
    # the only registry entry with no driver row ever (r11 verdict item 2)
    "graph_item_cf_parts",
    # operator changed r11 (probe-key dedup) AFTER its last driver green —
    # stale evidence; judge re-ran locally green, driver row still needed
    "sketch_bloom_probe",
    # --- new r12 operators (never driver-verified) ---
    "graph_label_propagation", "events_holt_linear",
    "text_calibration_reliability", "text_calibration_summary",
    "text_calibration_apply", "text_zipf_buckets", "text_wordpiece_train",
    "join_small_order_revenue", "join_large_volume_orders",
    "agg_value_concentration", "join_idle_rich_customers",
    "events_bootstrap_ci", "sim_mips_topk", "text_unigram_viterbi",
    "events_active_streaks", "events_sprt_monitor", "text_rake_keywords",
    "events_hazard_na", "sim_mmr_rerank", "events_did_estimate",
    "graph_link_prediction",
    # staleness drain, oldest-first (r11 verdict item 3): the full
    # latest-green-r5 cohort (21 entries) ...
    "sim_quantize_int8", "sim_threshold_pairs", "sim_topk_quantized_query0",
    "sim_topk_query0", "text_bigram_quality", "text_bpe_pairs",
    "text_frequency_spectrum", "text_gopher_rules", "text_lang_mismatch",
    "text_langid_accuracy", "text_langid_ngram_confusion",
    "text_quality_classifier", "text_quality_percentile_gate",
    "text_repetition", "text_stats", "text_structure_stats",
    "text_tfidf_keywords", "text_token_entropy", "text_token_totals",
    "text_unigram_quality", "window_ohlc",
    # late-r12 wave: placed AFTER the r5 staleness drain so these
    # never-driver-run entries take window slots from the r6 cohort
    # (re-verification), not from the oldest (r5) drain
    "events_power_analysis", "agg_pareto_abc", "curation_span_corruption",
    # ... then as much of the latest-green-r6 cohort (42 entries) as fits
    # the 50-slot window; the remainder carries to r13
    "curation_chunks", "curation_contamination_report", "curation_decontaminate",
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
    # r12 overflow wave (beyond the 50-slot window): these land at the
    # BACK of the r12 priority so they front the r13 window next round
    "join_salted_priority_revenue", "events_cohort_ltv",
    "sim_recall_curve", "curation_contamination_sensitivity",
]

def _reorder(d: dict) -> dict:
    missing = set(_DRIVER_PRIORITY) - set(d)
    assert not missing, f"_DRIVER_PRIORITY names absent from registry: {missing}"
    front = {k: d[k] for k in _DRIVER_PRIORITY}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}

QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)
