"""Count-Min sketch: one-sided error, mergeability, partition-order
independence — the properties the sketch_cm_* oracles rely on."""

from __future__ import annotations

from pyspark.sql import functions as F

from denormalized_spark.operators import sketches


def _occurrences(spark, counts: dict[str, int]):
    rows = [(k,) for k, c in counts.items() for _ in range(c)]
    return spark.createDataFrame(rows, "tok string")

_COUNTS = {f"w{i}": (i % 7) + 1 for i in range(40)}


def test_never_undercounts(spark):
    df = _occurrences(spark, _COUNTS)
    sk = sketches.count_min(df, "tok", depth=4, width=16)  # heavy collisions
    est = sketches.cm_estimate(sk, df.distinct(), "tok", depth=4, width=16)
    got = {r["tok"]: r["cm_count"] for r in est.collect()}
    assert set(got) == set(_COUNTS)
    assert all(got[k] >= c for k, c in _COUNTS.items())


def test_exact_when_wide(spark):
    df = _occurrences(spark, _COUNTS)
    sk = sketches.count_min(df, "tok", depth=4, width=4096)
    est = sketches.cm_estimate(sk, df.distinct(), "tok", depth=4, width=4096)
    got = {r["tok"]: r["cm_count"] for r in est.collect()}
    # deterministic hashes: this fixed key set has no 4-row collision
    # at width 4096, so every estimate is exact
    assert got == _COUNTS


def test_mergeable(spark):
    a = {k: c for k, c in _COUNTS.items() if int(k[1:]) % 2 == 0}
    b = {k: c for k, c in _COUNTS.items() if int(k[1:]) % 2 == 1}
    whole = sketches.count_min(_occurrences(spark, _COUNTS), "tok", 4, 32)
    merged = sketches.cm_merge(
        sketches.count_min(_occurrences(spark, a), "tok", 4, 32),
        sketches.count_min(_occurrences(spark, b), "tok", 4, 32),
    )
    key = lambda df: sorted(
        (r["cm_row"], r["cm_col"], r["cnt"]) for r in df.collect()
    )
    assert key(whole) == key(merged)


def test_partitioning_invariant(spark):
    df = _occurrences(spark, _COUNTS)
    a = sketches.count_min(df, "tok", 4, 32)
    b = sketches.count_min(df.repartition(13), "tok", 4, 32)
    key = lambda d: sorted((r["cm_row"], r["cm_col"], r["cnt"]) for r in d.collect())
    assert key(a) == key(b)


def test_unseen_key_estimates_zero(spark):
    sk = sketches.count_min(_occurrences(spark, _COUNTS), "tok", 4, 4096)
    items = spark.createDataFrame([("never-seen-key",)], "tok string")
    est = sketches.cm_estimate(sk, items, "tok", 4, 4096).collect()
    assert est[0]["cm_count"] == 0


def test_preaggregated_counts_match_raw(spark):
    raw = sketches.count_min(_occurrences(spark, _COUNTS), "tok", 4, 32)
    pre = spark.createDataFrame(list(_COUNTS.items()), "tok string, c long")
    agg = sketches.count_min(pre, "tok", 4, 32, count_col="c")
    key = lambda d: sorted((r["cm_row"], r["cm_col"], r["cnt"]) for r in d.collect())
    assert key(raw) == key(agg)


def test_heavy_hitters_no_false_negatives(spark):
    counts = dict(_COUNTS)
    counts["big1"], counts["big2"] = 50, 80
    df = _occurrences(spark, counts)
    hh = sketches.cm_heavy_hitters(df, "tok", threshold=50, depth=4, width=16)
    got = {r["tok"]: (r["cm_count"], r["exact_count"]) for r in hh.collect()}
    assert {"big1", "big2"} <= set(got)
    assert got["big1"][1] == 50 and got["big2"][1] == 80
    # estimates are upper bounds even for the false positives
    assert all(cm >= ex for cm, ex in got.values())


# ---------------------------------------------------------------------------
# HyperLogLog register table
# ---------------------------------------------------------------------------


def _keys(spark, n, prefix="k"):
    return spark.createDataFrame([(f"{prefix}{i}",) for i in range(n)], "k string")


def test_hll_estimate_within_bound(spark):
    # sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma on a fixed corpus
    for n in (500, 2000):
        regs = sketches.hll_registers(_keys(spark, n), "k", p=6)
        est = sketches.hll_estimate(regs, p=6).collect()[0]["hll_estimate"]
        assert abs(est - n) / n < 0.39, (n, est)


def test_hll_mergeable(spark):
    a, b = _keys(spark, 300, "a"), _keys(spark, 400, "b")
    whole = sketches.hll_registers(a.unionByName(b), "k", p=6)
    merged = sketches.hll_merge(
        sketches.hll_registers(a, "k", p=6), sketches.hll_registers(b, "k", p=6)
    )
    key = lambda d: sorted((r["reg"], r["rho"]) for r in d.collect())
    assert key(whole) == key(merged)


def test_hll_duplicates_do_not_move_registers(spark):
    once = sketches.hll_registers(_keys(spark, 200), "k", p=6)
    thrice = sketches.hll_registers(
        _keys(spark, 200).unionByName(_keys(spark, 200)).unionByName(_keys(spark, 200)),
        "k",
        p=6,
    )
    key = lambda d: sorted((r["reg"], r["rho"]) for r in d.collect())
    assert key(once) == key(thrice)


def test_hll_small_range_linear_counting(spark):
    regs = sketches.hll_registers(_keys(spark, 12), "k", p=6)
    est = sketches.hll_estimate(regs, p=6).collect()[0]["hll_estimate"]
    # linear counting is near-exact this far below 2.5m
    assert abs(est - 12) <= 3


def test_hll_partitioning_invariant(spark):
    df = _keys(spark, 1000)
    a = sketches.hll_registers(df, "k", p=6)
    b = sketches.hll_registers(df.repartition(13), "k", p=6)
    key = lambda d: sorted((r["reg"], r["rho"]) for r in d.collect())
    assert key(a) == key(b)
    ea = sketches.hll_estimate(a, p=6).collect()[0]["hll_estimate"]
    eb = sketches.hll_estimate(b.repartition(5), p=6).collect()[0]["hll_estimate"]
    assert ea == eb


# ---------------------------------------------------------------------------
# KMV bottom-k sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    sk = sketches.kmv_sketch(_keys(spark, 40), "k", k=64)
    assert sk.count() == 40
    est = sketches.kmv_distinct_estimate(sk, k=64).collect()[0]["kmv_estimate"]
    assert est == 40.0


def test_kmv_estimate_within_bound(spark):
    # sigma ~ 1/sqrt(k-2) = 12.7% at k=64; allow 3 sigma
    for n in (800, 3000):
        sk = sketches.kmv_sketch(_keys(spark, n), "k", k=64)
        est = sketches.kmv_distinct_estimate(sk, k=64).collect()[0]["kmv_estimate"]
        assert abs(est - n) / n < 0.39, (n, est)


def test_kmv_mergeable(spark):
    a, b = _keys(spark, 500, "a"), _keys(spark, 700, "b")
    whole = sketches.kmv_sketch(a.unionByName(b), "k", k=64)
    merged = sketches.kmv_merge(
        64, sketches.kmv_sketch(a, "k", k=64), sketches.kmv_sketch(b, "k", k=64)
    )
    key = lambda d: sorted(r["kmv_h"] for r in d.collect())
    assert key(whole) == key(merged)


def test_kmv_jaccard_known_overlap(spark):
    # A = 0..599, B = 300..899: |A∩B| = 300, |A∪B| = 900, J = 1/3
    a = spark.createDataFrame([(f"k{i}",) for i in range(600)], "k string")
    b = spark.createDataFrame([(f"k{i}",) for i in range(300, 900)], "k string")
    j = sketches.kmv_jaccard(
        sketches.kmv_sketch(a, "k", k=64), sketches.kmv_sketch(b, "k", k=64), k=64
    ).collect()[0]["kmv_jaccard"]
    assert abs(j - 1 / 3) < 0.2
    # identical sets estimate J = 1 exactly (same sketches)
    j1 = sketches.kmv_jaccard(
        sketches.kmv_sketch(a, "k", k=64), sketches.kmv_sketch(a, "k", k=64), k=64
    ).collect()[0]["kmv_jaccard"]
    assert j1 == 1.0


def test_kmv_partitioning_invariant(spark):
    df = _keys(spark, 1200)
    a = sketches.kmv_sketch(df, "k", k=64)
    b = sketches.kmv_sketch(df.repartition(11), "k", k=64)
    key = lambda d: sorted(r["kmv_h"] for r in d.collect())
    assert key(a) == key(b)


# ---------------------------------------------------------------------------
# histogram sketch
# ---------------------------------------------------------------------------


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_hist_quantiles_within_bin_width(spark):
    xs = list(range(1000))  # uniform 0..999
    sk = sketches.hist_sketch(_vals(spark, xs), "v", 0.0, 1000.0, bins=50)
    row = sketches.hist_quantiles(sk, [0.5, 0.9], 0.0, 1000.0, bins=50).collect()[0]
    assert abs(row["q0_5"] - 500) <= 20  # one bin width
    assert abs(row["q0_9"] - 900) <= 20


def test_hist_clamps_out_of_range(spark):
    sk = sketches.hist_sketch(_vals(spark, [-5, 0, 99, 250]), "v", 0.0, 100.0, bins=10)
    got = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert got == {0: 2, 9: 2}  # -5 clamps low, 250 clamps high


def test_hist_mergeable(spark):
    a, b = _vals(spark, range(0, 500)), _vals(spark, range(500, 1000))
    whole = sketches.hist_sketch(_vals(spark, range(1000)), "v", 0.0, 1000.0, 20)
    merged = sketches.hist_merge(
        sketches.hist_sketch(a, "v", 0.0, 1000.0, 20),
        sketches.hist_sketch(b, "v", 0.0, 1000.0, 20),
    )
    key = lambda d: sorted((r["bin"], r["cnt"]) for r in d.collect())
    assert key(whole) == key(merged)
    qa = sketches.hist_quantiles(whole, [0.5], 0.0, 1000.0, 20).collect()[0]["q0_5"]
    qb = sketches.hist_quantiles(merged, [0.5], 0.0, 1000.0, 20).collect()[0]["q0_5"]
    assert qa == qb


def test_hist_partitioning_invariant(spark):
    df = _vals(spark, [(i * 37) % 1000 for i in range(800)])
    a = sketches.hist_sketch(df, "v", 0.0, 1000.0, 25)
    b = sketches.hist_sketch(df.repartition(9), "v", 0.0, 1000.0, 25)
    key = lambda d: sorted((r["bin"], r["cnt"]) for r in d.collect())
    assert key(a) == key(b)


# ---------------------------------------------------------------------------
# incremental sketch maintenance over a stream
# ---------------------------------------------------------------------------


def test_streaming_cm_sketch_merge_equals_batch(spark):
    """The deployment mode the mergeability guarantees exist for:
    each micro-batch is sketched independently and cm_merge'd into a
    running sketch (foreachBatch), and the final running sketch is
    bit-identical to sketching the whole corpus in one batch pass —
    no re-scan of history at any point."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="cms_stream_")
    all_rows = []
    for i in range(4):
        rows = [(f"w{(i * 7 + j) % 25}",) for j in range(60)]
        all_rows += rows
        path = os.path.join(d, f"part{i}")
        spark.createDataFrame(rows, "tok string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for fn in os.listdir(path):
            os.utime(os.path.join(path, fn), (1_000_000 + i, 1_000_000 + i))

    state = {"sketch": None}

    def upd(batch_df, _epoch):
        sk = sketches.count_min(batch_df, "tok", depth=4, width=32)
        prev = state["sketch"]
        merged = sk if prev is None else sketches.cm_merge(prev, sk)
        # pin the running sketch (≤128 rows of metadata) so lineage
        # doesn't chain across micro-batches
        state["sketch"] = spark.createDataFrame(
            merged.collect(), "cm_row int, cm_col long, cnt long"
        )

    q = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "part*"))
        .writeStream.foreachBatch(upd)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_cms_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    batch = sketches.count_min(
        spark.createDataFrame(all_rows, "tok string"), "tok", depth=4, width=32
    )
    key = lambda df: sorted((r["cm_row"], r["cm_col"], r["cnt"]) for r in df.collect())
    assert key(state["sketch"]) == key(batch)


def test_hist_grouped_matches_global_per_group(spark):
    rows = [(g, float((i * 13 + g * 7) % 1000)) for g in range(3) for i in range(300)]
    df = spark.createDataFrame(rows, "g int, v double")
    sk = sketches.hist_sketch_grouped(df, "v", ["g"], 0.0, 1000.0, 40)
    got = {
        r["g"]: (r["q0_5"], r["q0_9"])
        for r in sketches.hist_quantiles_grouped(
            sk, [0.5, 0.9], ["g"], 0.0, 1000.0, 40
        ).collect()
    }
    for g in range(3):
        one = df.filter(F.col("g") == g)
        gsk = sketches.hist_sketch(one, "v", 0.0, 1000.0, 40)
        row = sketches.hist_quantiles(gsk, [0.5, 0.9], 0.0, 1000.0, 40).collect()[0]
        assert got[g] == (row["q0_5"], row["q0_9"])


def test_hist_grouped_no_single_partition(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "g int, v double")
    sk = sketches.hist_sketch_grouped(df, "v", ["g"], 0.0, 10.0, 10)
    out = sketches.hist_quantiles_grouped(sk, [0.5], ["g"], 0.0, 10.0, 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_hll_grouped_matches_global_per_group(spark):
    rows = [(i % 3, f"k{i % 3}:{i % (200 * (i % 3 + 1))}") for i in range(2000)]
    df = spark.createDataFrame(rows, "g int, k string")
    got = {
        r["g"]: r["hll_estimate"]
        for r in sketches.hll_estimate_grouped(
            sketches.hll_registers_grouped(df, "k", ["g"], p=6), ["g"], p=6
        ).collect()
    }
    for g in range(3):
        one = df.filter(F.col("g") == g)
        est = sketches.hll_estimate(
            sketches.hll_registers(one, "k", p=6), p=6
        ).collect()[0]["hll_estimate"]
        assert got[g] == est


def test_hll_grouped_register_merge_across_groups(spark):
    # max-merging the per-group registers == the global registers
    rows = [(i % 4, f"k{i}") for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, k string")
    grouped = sketches.hll_registers_grouped(df, "k", ["g"], p=6)
    merged = grouped.groupBy("reg").agg(F.max("rho").alias("rho"))
    whole = sketches.hll_registers(df, "k", p=6)
    key = lambda d: sorted((r["reg"], r["rho"]) for r in d.collect())
    assert key(merged) == key(whole)


def test_hll_scale_derived_from_p(spark):
    # ADVICE r9: at p < 6 the saturated rho (61-p) used to exceed the
    # fixed 56-bit scaling and the term silently cast to 0. The scale
    # is now 62-p, so small-p estimates stay sane...
    regs = sketches.hll_registers(_keys(spark, 3000), "k", p=4)
    est = sketches.hll_estimate(regs, p=4).collect()[0]["hll_estimate"]
    # sigma ~ 1.04/sqrt(16) = 26%; allow 3 sigma
    assert abs(est - 3000) / 3000 < 0.78, est
    # ...and out-of-range p is rejected outright.
    import pytest as _pytest

    for bad_p in (3, 17):
        with _pytest.raises(ValueError):
            sketches.hll_estimate(regs, p=bad_p)
        with _pytest.raises(ValueError):
            sketches.hll_estimate_grouped(regs.withColumn("g", F.lit(1)), ["g"], p=bad_p)


def test_bloom_merge_law_and_no_false_negatives(spark):
    a, b = _keys(spark, 200, "a"), _keys(spark, 300, "b")
    whole = sketches.bloom_bits(a.unionByName(b), "k", m_bits=4096, n_hashes=4)
    merged = sketches.bloom_merge(
        sketches.bloom_bits(a, "k", m_bits=4096, n_hashes=4),
        sketches.bloom_bits(b, "k", m_bits=4096, n_hashes=4),
    )
    key = lambda d: sorted(r["bit"] for r in d.collect())
    assert key(whole) == key(merged)
    # every inserted key must probe as a member (no false negatives)
    mem = sketches.bloom_probe(
        whole, a.unionByName(b), "k", m_bits=4096, n_hashes=4
    )
    assert mem.filter(~F.col("bloom_member")).count() == 0


def test_bloom_probe_duplicate_probe_keys_no_false_negative(spark):
    """r10 ADVICE: a probe key appearing twice used to contribute
    2k joined bits, failing the count == k membership test — a false
    negative. The probe side now dedupes keys first."""
    ins = _keys(spark, 50, "in")
    bits = sketches.bloom_bits(ins, "k", m_bits=4096, n_hashes=4)
    dup_probes = ins.unionByName(ins).unionByName(ins)  # every key ×3
    mem = sketches.bloom_probe(bits, dup_probes, "k", m_bits=4096, n_hashes=4)
    assert mem.count() == 50  # one verdict row per distinct key
    assert mem.filter(~F.col("bloom_member")).count() == 0


def test_bloom_fpp_within_theory(spark):
    # n=500 keys in m=16384 bits, k=4: fpp = (1-e^(-4*500/16384))^4 ~ 1.7e-4...
    # use a smaller filter so the rate is measurable: m=2048 ->
    # (1-e^(-500*4/2048))^4 ~ 0.14; allow a generous 3x band
    ins = _keys(spark, 500, "in")
    bits = sketches.bloom_bits(ins, "k", m_bits=2048, n_hashes=4)
    out_keys = _keys(spark, 2000, "out")
    mem = sketches.bloom_probe(bits, out_keys, "k", m_bits=2048, n_hashes=4)
    fp = mem.filter(F.col("bloom_member")).count()
    rate = fp / 2000
    import math

    theory = (1 - math.exp(-4 * 500 / 2048)) ** 4
    assert rate < 3 * theory, (rate, theory)


def test_bloom_partitioning_invariant(spark):
    ks = _keys(spark, 400)
    a = sorted(
        r["bit"]
        for r in sketches.bloom_bits(ks, "k", m_bits=4096, n_hashes=4).collect()
    )
    b = sorted(
        r["bit"]
        for r in sketches.bloom_bits(
            ks.repartition(13), "k", m_bits=4096, n_hashes=4
        ).collect()
    )
    assert a == b


def test_count_sketch_merge_and_f2(spark):
    a, b = _keys(spark, 300, "a"), _keys(spark, 400, "b")
    whole = sketches.count_sketch(a.unionByName(b), "k", depth=5, width=64)
    merged = sketches.cs_merge(
        sketches.count_sketch(a, "k", depth=5, width=64),
        sketches.count_sketch(b, "k", depth=5, width=64),
    )
    key = lambda d: sorted(
        (r["cs_row"], r["cs_col"], r["cnt"]) for r in d.collect()
    )
    assert key(whole) == key(merged)
    # uniform frequencies f_k = 1: F2 = 700 exactly; AMS at width 64
    # has sigma ~ sqrt(2/64)*F2 ~ 124 per row, median tightens it —
    # allow 3 sigma
    est = sketches.cs_f2_estimate(whole, depth=5).collect()[0]["f2_estimate"]
    assert abs(est - 700) < 3 * 124, est
    with __import__("pytest").raises(ValueError):
        sketches.cs_f2_estimate(whole, depth=4)


def test_count_sketch_partitioning_invariant(spark):
    ks = _keys(spark, 500)
    key = lambda d: sorted(
        (r["cs_row"], r["cs_col"], r["cnt"]) for r in d.collect()
    )
    assert key(sketches.count_sketch(ks, "k", 5, 64)) == key(
        sketches.count_sketch(ks.repartition(13), "k", 5, 64)
    )


def test_hll_intersect_inclusion_exclusion(spark):
    # A = 400 keys, B = 300 keys, |A ∩ B| = 200 exactly
    a = _keys(spark, 400, "s")          # s0..s399
    b = spark.createDataFrame(
        [(f"s{i}",) for i in range(200, 500)], "k string"
    )                                   # s200..s499
    ra = sketches.hll_registers(a, "k", p=6)
    rb = sketches.hll_registers(b, "k", p=6)
    got = sketches.hll_intersect_estimate(ra, rb, p=6).collect()[0]
    # union is 500; per-estimate sigma ~ 13% at p=6, and the
    # intersection difference compounds ~3 of them — generous band
    assert abs(got["est_union"] - 500) / 500 < 0.39
    assert abs(got["est_intersect"] - 200) < 200, got
    # identical-set intersection equals the set estimate exactly
    same = sketches.hll_intersect_estimate(ra, ra, p=6).collect()[0]
    assert same["est_intersect"] == same["est_a"] == same["est_union"]


def test_misra_gries_guarantees(spark):
    """MG never overcounts; undercount is within the certified bound;
    a genuinely heavy key always survives when its count exceeds the
    bound. Shards = a data column, so the summary is identical under
    any partitioning."""
    rows = []
    for shard in ("s1", "s2", "s3"):
        rows += [("heavy", shard)] * 100
        rows += [(f"mid{i}", shard) for i in range(4) for _ in range(20)]
        rows += [(f"tail{shard}{i}", shard) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, shard string")
    exact = {r["k"]: r["n"] for r in df.groupBy("k").agg(F.count("*").alias("n")).collect()}
    got = {
        r["k"]: (r["mg_count"], r["error_bound"])
        for r in sketches.misra_gries_merged(df, "k", "shard", k=8).collect()
    }
    assert "heavy" in got
    for k, (mg, bound) in got.items():
        assert mg <= exact[k], k                      # never overcounts
        assert exact[k] - mg <= bound, (k, mg, bound)  # certified undercount
    a = sorted(got.items())
    b = sorted(
        (r["k"], (r["mg_count"], r["error_bound"]))
        for r in sketches.misra_gries_merged(
            df.repartition(13), "k", "shard", k=8
        ).collect()
    )
    assert a == b


def test_kmv_set_estimates_exact_below_k(spark):
    """With |A|=30, |B|=20, overlap 10 — all below k=64 — every
    estimate is EXACT: the sketches hold all hashes, the merged
    sketch is the full union, and the algebra reduces to counting."""
    a = _keys(spark, 30, "s")                       # s0..s29
    b = spark.createDataFrame([(f"s{i}",) for i in range(20, 40)], "k string")
    sa, sb = sketches.kmv_sketch(a, "k"), sketches.kmv_sketch(b, "k")
    r = sketches.kmv_set_estimates(sa, sb, 64).collect()[0]
    assert (r.est_a, r.est_b, r.est_union) == (30.0, 20.0, 40.0)
    assert r.kmv_jaccard == 0.25
    assert (r.est_intersect, r.est_diff_a, r.est_diff_b) == (10.0, 20.0, 10.0)


def test_kmv_set_estimates_within_error_bound(spark):
    """Above k the estimates carry sketch noise; at k=64 the relative
    standard error is ~1/sqrt(k-2) ~ 0.127 — assert a generous 4-sigma
    band on union and intersection for a 300/300-overlap-100 pair."""
    a = _keys(spark, 300, "x")
    b = spark.createDataFrame([(f"x{i}",) for i in range(200, 500)], "k string")
    sa, sb = sketches.kmv_sketch(a, "k"), sketches.kmv_sketch(b, "k")
    r = sketches.kmv_set_estimates(sa, sb, 64).collect()[0]
    assert abs(r.est_union - 500) < 500 * 0.51, r
    assert abs(r.est_intersect - 100) < 150, r


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def _tdvals(spark, n, scale=1.0):
    return spark.createDataFrame(
        [(i, float(((i * 37) % n) + 1) * scale) for i in range(n)], "id long, v double"
    )


def test_tdigest_size_invariant_and_accuracy(spark):
    """Clusters respect the size invariant (k(q2)-k(q1) <= 1 by
    construction, so at most delta clusters, tails smaller than the
    middle) and quantile estimates land within one centroid span of
    exact over a uniform permutation."""
    df = _tdvals(spark, 2000)
    cent = sketches.tdigest_centroids(df, "v", order_extra=["id"], delta=32)
    rows = cent.orderBy("cluster").collect()
    assert len(rows) <= 32
    ws = [r.w for r in rows]
    assert sum(ws) == 2000
    # tail compression: edge clusters strictly smaller than the peak
    assert ws[0] < max(ws) and ws[-1] < max(ws)
    est = sketches.tdigest_quantiles(
        cent.localCheckpoint(), [0.01, 0.5, 0.99]
    ).collect()[0]
    # uniform 1..2000: p1=20, p50=1000, p99=1980; spans are ~6% mid
    assert abs(est.q0_01 - 20) < 40, est
    assert abs(est.q0_5 - 1000) < 80, est
    assert abs(est.q0_99 - 1980) < 40, est


def test_tdigest_merge_law(spark):
    """Digest shards independently, merge, and the merged digest's
    quantiles stay within one compression step of the full-data
    digest's — the Dunning merge bound (and both within span-accuracy
    of exact)."""
    df = _tdvals(spark, 3000)
    full = sketches.tdigest_centroids(df, "v", order_extra=["id"], delta=32)
    a = sketches.tdigest_centroids(
        df.filter("id % 2 = 0"), "v", order_extra=["id"], delta=32
    )
    b = sketches.tdigest_centroids(
        df.filter("id % 2 = 1"), "v", order_extra=["id"], delta=32
    )
    merged = sketches.tdigest_merge(32, a, b)
    assert merged.agg(F.sum("w")).collect()[0][0] == 3000
    qf = sketches.tdigest_quantiles(full.localCheckpoint(), [0.5, 0.99]).collect()[0]
    qm = sketches.tdigest_quantiles(merged.localCheckpoint(), [0.5, 0.99]).collect()[0]
    assert abs(qf.q0_5 - qm.q0_5) < 3000 * 0.05
    assert abs(qf.q0_99 - qm.q0_99) < 3000 * 0.03


def test_tdigest_partition_order_independent(spark):
    """The build ranks under a caller-pinned total order, so the
    centroid table is identical under any input partitioning."""
    df = _tdvals(spark, 1000)
    a = sorted(
        (r.cluster, r.w, r.mean_e4)
        for r in sketches.tdigest_centroids(df, "v", order_extra=["id"]).collect()
    )
    b = sorted(
        (r.cluster, r.w, r.mean_e4)
        for r in sketches.tdigest_centroids(
            df.repartition(7), "v", order_extra=["id"]
        ).collect()
    )
    assert a == b


def test_cm_join_size_never_undercounts_and_is_close(spark):
    """The CM inner-product estimate of |A join B| is an upper bound
    on the exact size, and with width >> distinct keys it is exact."""
    a = spark.createDataFrame(
        [(f"k{i % 20}",) for i in range(200)], "k string"
    )
    b = spark.createDataFrame(
        [(f"k{i % 30}",) for i in range(150)], "k string"
    )
    exact = (
        a.groupBy("k").count().withColumnRenamed("count", "ca")
        .join(b.groupBy("k").count().withColumnRenamed("count", "cb"), "k")
        .selectExpr("sum(ca * cb) as s")
        .collect()[0].s
    )
    sa = sketches.count_min(a, "k", depth=4, width=512)
    sb = sketches.count_min(b, "k", depth=4, width=512)
    est = sketches.cm_join_size(sa, sb, depth=4).collect()[0]
    assert est.join_size_est >= exact
    assert est.join_size_est == exact  # 50 distinct keys vs width 512
