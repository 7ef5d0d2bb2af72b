"""Per-stage wall profiler for the three bench queries flagged
weak-by-record in the r13 verdict (curation_pipeline,
text_unigram_quality, curation_full_funnel — all pure-Catalyst
expression-tree plans over documents).

For each query it reports:
  cold   — first action on a fresh DataFrame: analysis + codegen +
           execution (what bench.py's per-query wall measures)
  warm   — second action on the SAME DataFrame: Spark re-analyzes the
           logical plan but the Janino codegen cache, file-listing
           cache, and JVM JIT are hot — approximately pure execution
  stageN — cumulative wall to materialize each pipeline stage with a
           count(); marginal = stageN - stage(N-1) isolates the stage

The point (r13 verdict item 2): the three queries' bench ratios moved
2-3x between driver runs with NO code change; totals can't distinguish
"the plan regressed" from "the host was loaded".  The compile/execute
split is the invariant to compare across rounds — compile cost
amortizes to zero at 100 TB, execution cost is the real plan quality.

Usage:  python tools/profile_stages.py [--sf-dir DIR] [--runs N]
Prints one aligned table per query plus a JSON line for the round doc.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def wall(action):
    t0 = time.perf_counter()
    action()
    return time.perf_counter() - t0


def profile_query(name, build, stages, runs):
    """build() -> final DataFrame; stages: [(label, fn() -> DataFrame)]
    where each fn builds the plan PREFIX up to that stage."""
    out = {"query": name}
    # cold: fresh DataFrame, first action (analysis + codegen + exec)
    colds = []
    for _ in range(runs):
        df = build()
        colds.append(wall(lambda: df.collect()))
    out["cold_first_s"] = round(colds[0], 3)
    out["cold_min_s"] = round(min(colds), 3)
    # warm: same DataFrame re-collected (codegen/JIT/file-cache hot)
    df = build()
    df.collect()
    warms = [wall(lambda: df.collect()) for _ in range(runs)]
    out["warm_min_s"] = round(min(warms), 3)
    out["compile_share"] = round(
        max(0.0, 1.0 - min(warms) / max(min(colds), 1e-9)), 3
    )
    # stage-cumulative walls (cold per stage prefix; count() to avoid
    # result-size effects). marginal_k = cum_k - cum_{k-1}
    cums = []
    for label, fn in stages:
        sdf = fn()
        t = min(wall(lambda: sdf.count()) for _ in range(runs))
        cums.append((label, t))
    out["stages"] = [
        {
            "stage": label,
            "cum_s": round(t, 3),
            "marginal_s": round(t - (cums[i - 1][1] if i else 0.0), 3),
        }
        for i, (label, t) in enumerate(cums)
    ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf = args.sf_dir

    from denormalized_spark.session import get_spark
    from denormalized_spark.operators import curation, text
    from denormalized_spark.queries.curation import _split
    from denormalized_spark.queries import curation as qc
    from denormalized_spark.queries import llm_pipeline as ql

    spark = get_spark("profile_stages")
    # one throwaway job so JVM/executor startup never lands on query 1
    spark.range(1000).count()

    results = []

    # --- curation_pipeline: decontaminate -> mixture -> token agg ---
    def cp_stage1():
        corpus, bench = _split(spark, sf)
        return curation.decontaminate(corpus, bench, n=5)

    def cp_stage2():
        return curation.mixture_sample(cp_stage1(), qc._MIX_RATES, seed="mix1")

    def cp_full():
        return qc.curation_pipeline(spark, sf)

    results.append(profile_query(
        "curation_pipeline", cp_full,
        [("decontaminate", cp_stage1), ("mixture_sample", cp_stage2),
         ("token_agg(full)", cp_full)],
        args.runs,
    ))

    # --- text_unigram_quality: tokenize -> vocab -> score-agg ---
    def tu_stage1():
        d = ql.t(spark, sf, "documents")
        return d.select("doc_id", text.tokens("text").alias("toks"))

    def tu_stage2():
        tok = tu_stage1().select(
            "doc_id", F.explode("toks").alias("token"))
        return tok.groupBy("token").agg(F.count("*").alias("cnt"))

    def tu_full():
        return ql.text_unigram_quality(spark, sf)

    results.append(profile_query(
        "text_unigram_quality", tu_full,
        [("tokenize", tu_stage1), ("vocab_agg", tu_stage2),
         ("score_agg(full)", tu_full)],
        args.runs,
    ))

    # --- curation_full_funnel: quality -> dedup -> decontam -> agg ---
    def ff_stage1():
        corpus, _ = _split(spark, sf)
        return corpus.filter(text.hashed_linear_score("text") > 0.5)

    def ff_stage2():
        from pyspark.sql import Window
        fp = ff_stage1().withColumn("f", text.fingerprint("text"))
        w = Window.partitionBy("f").orderBy("doc_id")
        return (fp.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("doc_id", "source", "text"))

    def ff_stage3():
        _, bench = _split(spark, sf)
        return curation.decontaminate(ff_stage2(), bench, n=5)

    def ff_full():
        return qc.curation_full_funnel(spark, sf)

    results.append(profile_query(
        "curation_full_funnel", ff_full,
        [("quality_filter", ff_stage1), ("fingerprint_dedup", ff_stage2),
         ("decontaminate", ff_stage3), ("split+agg(full)", ff_full)],
        args.runs,
    ))

    for r in results:
        print(f"\n== {r['query']} (sf={sf}, runs={args.runs}) ==")
        print(f"  cold first {r['cold_first_s']}s | cold min "
              f"{r['cold_min_s']}s | warm min {r['warm_min_s']}s | "
              f"compile share {r['compile_share']:.0%}")
        for s in r["stages"]:
            print(f"  {s['stage']:<22} cum {s['cum_s']:>7.3f}s   "
                  f"marginal {s['marginal_s']:>7.3f}s")
    print("\nJSON:", json.dumps({"sf": sf, "profiles": results}))


if __name__ == "__main__":
    main()
