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
# Cumulative coverage through r9: every one of the 182 pre-r10 entries has
# at least one driver-green row (r1-r9 union; latest-green per entry
# computable from the CORRECTNESS_r0*.json union). Round-10 window, in
# priority order:
# (1) the 34 BRAND-NEW r10 entries (never driver-verified): the salted
# skew-safe window agg and windowed-UDAF oracles (r9 verdict item 4),
# BM25 top-k retrieval, the Bloom filter pair, winnowing fingerprints +
# MOSS pairs, CUSUM changepoints, JL projection + measured distortion,
# Count-Sketch cells + AMS F2, the distributed-PCA pair (moments +
# power-iteration projection), sorted-neighborhood blocking pairs,
# seasonal-decomposition residual anomalies, HLL audience-overlap
# (inclusion-exclusion intersection with exact truth beside it),
# weighted (tf-bag) MinHash signatures, shard-merged Misra-Gries
# heavy hitters with certified undercount bounds, the
# direction='nearest' as-of join (pandas merge_asof parity), the
# forward+tolerance as-of join (conversion attribution), per-doc
# gram novelty by arrival order (first-occurrence attribution), the
# Z-order (Morton) layout key for multi-column data skipping, the
# linear-interpolation resample (integer slope, truncating div parity),
# the trailing-30-day RANGE window frame (value-based frames), and
# top-k session paths (n-gram path mining over sessionized events),
# MAD modified-z robust outliers (Iglewicz-Hoaglin), and the Benford
# first-digit conformity screen (chi-square on the milli grid), and
# U-shaped multi-touch attribution (range-join pairing, integer bp),
# per-group Gini concentration (integer rank-sum identity), and
# market-basket pair lift (within-basket self-join, micro-grid lift),
# RFM quintiles (scale-safe exact ntile from global row numbers), and
# the two-proportion z-test A/B analysis (micro-grid z, IEEE sqrt),
# and lead-duration-weighted TWAP (integer cent-ms products).
# events_drawdown (running-max peak-to-trough) landed after the window
# filled — locally triple-SF green, rotates into a future window;
# (2) the 11 entries whose OPERATOR code changed this round: the HLL trio
# (scale exponent now derived from p), sim_kcenter_select (empty/exhausted
# guards), dedup_span_strip (output-name collision guard),
# events_decayed_counts (dt clamp), and the five bucket-cap consumers
# rewired through operators/_bucketing.py (dedup_lsh_candidates,
# sim_lsh_buckets, dedup_embedding_neardup, curation_semantic_decontaminate,
# dedup_near_gate);
# (3) the staleness rotation — all 4 entries whose latest driver green is
# r4, then the oldest r5 entry (34 + 11 + 4 + 1 = 50). Everything
# displaced to 51+ keeps its registry order and was re-verified locally
# this session by the full-registry tools/check_correctness.py sweep at
# sf0.001/0.01/0.1.
_DRIVER_PRIORITY = [
    # r10 driver-reds, reshaped this round (posexplode → rows) — must go green
    "sim_jl_project", "dedup_weighted_minhash",
    # landed r10 after the window filled — never driver-run
    "events_drawdown", "agg_backlog_ledger",
    # brand-new r11 operators — never driver-verified
    "scd2_user_state", "events_acf_daily", "graph_covisit_triangles",
    "sketch_kmv_set_ops", "events_ks_drift", "events_chi2_weekday",
    "text_pmi_collocations", "dedup_fellegi_sunter",
    # operator code changed r11 (probe-key dedup) — re-prove
    "sketch_bloom_probe",
    # staleness drain: the entire latest-green-r5 cohort (35)
    "curation_data_card", "curation_decontaminate_bloom", "curation_dedup_lines",
    "curation_drift_report", "curation_quality_monitor", "curation_validate",
    "dedup_exact", "dedup_jaccard_pairs", "dedup_ngram_duplication_rate",
    "dedup_simhash", "sim_batch_topk", "sim_hard_negatives", "sim_ivf_recall",
    "sim_outlier_scores", "sim_quantize_int8", "sim_threshold_pairs",
    "sim_topk_quantized_query0", "sim_topk_query0", "text_bigram_quality",
    "text_bpe_pairs", "text_frequency_spectrum", "text_gopher_rules",
    "text_lang_mismatch", "text_langid_accuracy", "text_langid_ngram_confusion",
    "text_quality_classifier", "text_quality_percentile_gate", "text_repetition",
    "text_stats", "text_structure_stats", "text_tfidf_keywords",
    "text_token_entropy", "text_token_totals", "text_unigram_quality",
    "window_ohlc",
    # oldest r6 entries filling the window to 50
    "curation_chunks", "curation_contamination_report",
]

def _reorder(d: dict) -> dict:
    missing = set(_DRIVER_PRIORITY) - set(d)
    assert not missing, f"_DRIVER_PRIORITY names absent from registry: {missing}"
    front = {k: d[k] for k in _DRIVER_PRIORITY}
    rest = {k: v for k, v in d.items() if k not in front}
    return {**front, **rest}

QUERIES = _reorder(QUERIES)
ORACLES = _reorder(ORACLES)
