"""Empirical scaling check: run the scale-critical operators at
sf0.001 → sf0.01 → sf0.1 (100× data span) and report wall-time growth.

    python tools/scale_check.py

A sub-quadratic operator should show time growth well under the data
growth squared; the LSH paths should be near-linear once the fixed
codegen overhead (~1-3 s for the big hyperplane expression trees —
constant, amortizes to zero at scale) is subtracted. This is the
evidence behind the docstrings' 100 TB claims, at laptop scale.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
QUERIES = [
    "agg_pricing_summary",       # scan + partial/final agg: linear
    "join_top_orders",           # shuffle join: n log n
    "window_tumbling_1h",        # windowed agg: linear
    "dedup_lsh_candidates",      # MinHash-LSH banding: ~linear in docs
    "dedup_jaccard_lsh_verified",# gated verify: ~linear in candidates
    "sim_lsh_buckets",           # hyperplane LSH: ~linear + bucket joins
    "join_asof_purchase_click",  # union+window: n log n
    "sessionize_users",          # window-fn sessionization: n log n
    "over_ntile_percentrank",    # distributed global rank: n log n
]


def main() -> None:
    from denormalized_spark.session import get_spark

    spark = get_spark(app_name="scale_check", master="local[32]")
    import __spark_entry__ as entry

    queries = entry.queries()
    # warm codegen/parquet paths so growth ratios measure data, not JIT
    from denormalized_spark.sources.files import load_table

    load_table(spark, SFS[0], "lineitem").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"{'query':30s} " + " ".join(f"{Path(s).name:>9s}" for s in SFS) + "   x(0.01→0.1)")
    for name in QUERIES:
        times = []
        for sf in SFS:
            t0 = time.time()
            queries[name](spark, sf).write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        ratio = times[-1] / times[-2] if times[-2] > 0 else float("nan")
        print(
            f"{name:30s} "
            + " ".join(f"{t:9.2f}" for t in times)
            + f"   {ratio:6.1f}x for 10x data"
        )


if __name__ == "__main__":
    main()
