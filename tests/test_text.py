

class TestCcnetBuckets:
    def _df(self, spark):
        # lang 'a': docs 0-8 with increasingly repeated (=more probable)
        # tokens; lang 'b': 6 docs
        rows = []
        for i in range(9):
            toks = ["common"] * (i + 1) + [f"rare{i}"]
            rows.append((i, "a", " ".join(toks)))
        for i in range(9, 15):
            rows.append((i, "b", f"w{i % 3} w{i % 3} z{i}"))
        return spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def test_terciles_per_language(self, spark):
        from denormalized_spark.operators.text import ccnet_buckets

        out = ccnet_buckets(self._df(spark)).collect()
        per = {}
        for r in out:
            per.setdefault((r["lang"], r["bucket"]), []).append(r["doc_id"])
        assert {len(v) for k, v in per.items() if k[0] == "a"} == {3}
        assert {len(v) for k, v in per.items() if k[0] == "b"} == {2}
        # within lang 'a', heads have strictly higher scores than tails
        scores = {r["doc_id"]: r["rlogp"] for r in out if r["lang"] == "a"}
        assert min(scores[i] for i in per[("a", "head")]) >= max(
            scores[i] for i in per[("a", "tail")]
        )

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.text import ccnet_buckets

        df = self._df(spark)
        a = ccnet_buckets(df).collect()
        b = ccnet_buckets(df.repartition(7)).collect()
        key = lambda rs: sorted((r["doc_id"], r["bucket"]) for r in rs)
        assert key(a) == key(b)


class TestBm25:
    def _df(self, spark):
        # equal doc length, strictly decreasing query-term coverage:
        # rank order is forced regardless of the k1/b knobs
        rows = [
            (1, "scan join filter x"),
            (2, "scan join x y"),
            (3, "scan x y z"),
            (4, "x y z w"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ranking_and_coverage(self, spark):
        from denormalized_spark.operators.text import bm25_topk

        out = bm25_topk(
            self._df(spark), ["scan", "join", "filter"], k=10
        ).collect()
        assert [r["doc_id"] for r in out] == [1, 2, 3]  # doc 4: no terms
        scores = [r["bm25"] for r in out]
        assert scores[0] > scores[1] > scores[2] > 0

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.text import bm25_topk

        rows = [
            (i, " ".join(["scan"] * (i % 4) + ["join"] * (i % 3) + [f"w{i}"]))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = bm25_topk(df, ["scan", "join"], k=7).collect()
        b = bm25_topk(df.repartition(11), ["scan", "join"], k=7).collect()
        assert [(r["doc_id"], r["bm25"]) for r in a] == [
            (r["doc_id"], r["bm25"]) for r in b
        ]


class TestPmiCollocations:
    def test_planted_collocation_ranks_top(self, spark):
        """Hand-computed corpus: beta→gamma occurs only in doc A and
        'beta' is never a left slot elsewhere, 'gamma' never a right
        slot elsewhere — n_xy = n_x = n_y = 8 over N = 68 pairs, so
        PMI = ln(68/8), the maximum in this corpus; the frequent
        new↔york pairs score lower (bigger marginals)."""
        import math

        from denormalized_spark.operators.text import pmi_collocations

        docs = [("alpha beta gamma delta",)] * 8 + [
            ("gamma alpha delta beta",)
        ] * 8 + [("new york new york new york",)] * 4
        df = spark.createDataFrame(docs, "text string")
        out = pmi_collocations(df, "text", min_count=5, k=10).collect()
        assert (out[0].w1, out[0].w2) == ("beta", "gamma")
        assert out[0].pmi_micro == int(math.floor(math.log(68 / 8) * 1e6 + 0.5))
        # descending PMI with deterministic ties
        pmis = [r.pmi_micro for r in out]
        assert pmis == sorted(pmis, reverse=True)
        assert ("new", "york") in {(r.w1, r.w2) for r in out}

    def test_min_count_gates_hapax_pairs(self, spark):
        from denormalized_spark.operators.text import pmi_collocations

        docs = [("unique singleton pair",)] + [("common common",)] * 10
        df = spark.createDataFrame(docs, "text string")
        got = {(r.w1, r.w2) for r in pmi_collocations(df, "text", min_count=5, k=10).collect()}
        assert got == {("common", "common")}

    def test_closed_form_pmi(self, spark):
        """One doc 'a b' repeated 10x: the only pair, n_xy=n_x=n_y=N=10
        -> pmi = ln(10*10/(10*10)) = 0."""
        from denormalized_spark.operators.text import pmi_collocations

        df = spark.createDataFrame([("a b",)] * 10, "text string")
        r = pmi_collocations(df, "text", min_count=5, k=5).collect()
        assert len(r) == 1
        assert (r[0].n_xy, r[0].n_x, r[0].n_y, r[0].pmi_micro) == (10, 10, 10, 0)

    def test_rejects_bad_min_count(self, spark):
        import pytest

        from denormalized_spark.operators.text import pmi_collocations

        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError, match="min_count"):
            pmi_collocations(df, "text", min_count=0)


def test_tokenizer_fertility_counts(spark):
    """Hand-countable fertility: 'ab cd.' has 2 words, 3 subwords
    (ab, cd, '.'), 6 chars; fertility 1500 milli."""
    from denormalized_spark.operators.text import tokenizer_fertility

    df = spark.createDataFrame([("en", "ab cd.")], "lang string, text string")
    r = tokenizer_fertility(df).collect()[0]
    assert (r.n_docs, r.n_chars, r.n_words, r.n_subwords) == (1, 6, 2, 3)
    assert r.fertility_milli == 1500
    assert r.chars_per_subword_milli == 2000


def test_heaps_curve_cumulative_and_saturation(spark):
    """Each token is counted once at its FIRST bin: vocab_cum is
    monotone, its final value equals the corpus distinct count, and a
    corpus whose second half repeats the first contributes zero new
    vocabulary there (ratio 1000 milli)."""
    from denormalized_spark.operators.text import heaps_curve

    docs = [(i, f"w{i} w{i+1} common") for i in range(10)] + [
        (i, f"w{i-10} w{i-9} common") for i in range(10, 20)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(heaps_curve(df, n_bins=4).collect(), key=lambda r: r.bin)
    assert [r.bin for r in got] == [1, 2, 3, 4]  # zero-new bins emit too
    assert [r.vocab_cum for r in got] == sorted(r.vocab_cum for r in got)
    assert got[-1].vocab_cum == 12  # w0..w10 + common
    # second half adds nothing new: saturation visible as ratio 1000
    assert got[2].new_tokens == 0 and got[3].new_tokens == 0
    assert got[3].growth_ratio_milli == 1000
    tri = sorted(heaps_curve(df, n_bins=2, ngram=3).collect(), key=lambda r: r.bin)
    assert tri[-1].vocab_cum == 10  # 10 distinct trigram contexts


def test_zipf_buckets_hand_counts(spark):
    """Vocab of 7 types with frequencies 8,4,4,2,1,1,1: ranks 1..7 ->
    octaves {1}, {2,3}, {4..7}; masses 8, 8, 5."""
    from denormalized_spark.operators.text import zipf_buckets

    docs = [
        ("a " * 8 + "b " * 4 + "c " * 4 + "d " * 2 + "e f g",),
    ]
    df = spark.createDataFrame(docs, "text string")
    got = {r.bucket: r for r in zipf_buckets(df).collect()}
    assert set(got) == {0, 1, 2}
    assert (got[0].rank_lo, got[0].rank_hi, got[0].n_types, got[0].total_freq) == (1, 1, 1, 8)
    assert (got[1].rank_lo, got[1].rank_hi, got[1].total_freq) == (2, 3, 8)
    assert (got[2].rank_lo, got[2].rank_hi, got[2].total_freq) == (4, 7, 5)
    assert got[0].ratio_to_next_milli == 1000  # 8/8
    assert got[1].ratio_to_next_milli == 1600  # 8/5
    assert got[2].ratio_to_next_milli is None
    assert got[2].mean_freq_milli == 1250  # 5*1000/4


def test_wordpiece_train_prefers_surprising_pair(spark):
    """Corpus 'ab'×3 + 'cd'×1: BPE merges (a,b) first (count 3), but
    WordPiece's likelihood score ranks (c,d) first — 1/(1·1) = 1e12
    beats 3/(3·3) ≈ 0.33e12. Round 2 then merges (a,b)."""
    from denormalized_spark.operators.text import bpe_train, wordpiece_train

    df = spark.createDataFrame([("ab ab ab cd",)], "text string")
    wp = wordpiece_train(df, num_merges=2).collect()
    assert [(r.sym_a, r.sym_b) for r in wp] == [("c", "d"), ("a", "b")]
    r1 = wp[0]
    assert (r1.pair_count, r1.count_a, r1.count_b) == (1, 1, 1)
    assert r1.score_e12 == 1_000_000_000_000
    r2 = wp[1]
    assert (r2.pair_count, r2.count_a, r2.count_b) == (3, 3, 3)
    assert r2.score_e12 == 333_333_333_333
    bp = bpe_train(df, num_merges=1).collect()
    assert (bp[0].sym_a, bp[0].sym_b) == ("a", "b")


def test_unigram_viterbi_hand_segmentations(spark):
    """'the' -> 1 piece (8.6e6 beats t+h+e=12e6 and th+e=10.2e6);
    'forth' -> 'for'+'th' (9.4+6.2=15.6e6); 'zq' has no pieces ->
    2 char-fallbacks; packed tie-break prefers fewer pieces at equal
    cost."""
    from denormalized_spark.operators.text import unigram_viterbi_stats

    df = spark.createDataFrame(
        [("the the forth zq",)], "text string"
    )
    got = {r.word: (r.n_pieces, r.cost_micro)
           for r in unigram_viterbi_stats(df).collect()}
    assert got["the"] == (1, 8_600_000)
    assert got["forth"] == (2, 15_600_000)
    assert got["zq"] == (2, 8_000_000)


def test_unigram_viterbi_char_fallback_bounds_unknown(spark):
    """A word with NO vocabulary piece segments into length many
    chars — the fallback keeps every path finite."""
    from denormalized_spark.operators.text import unigram_viterbi_stats

    df = spark.createDataFrame([("xyzzy",)], "text string")
    r = unigram_viterbi_stats(df).collect()[0]
    assert (r.word, r.n_pieces, r.cost_micro) == ("xyzzy", 5, 20_000_000)


def test_rake_hand_example(spark):
    """'deep learning of deep networks': 'of' splits two phrases;
    deg(deep)=4 freq=2 -> 2000 milli, learning/networks 2000 each ->
    both phrases score 4000; tie orders by phrase."""
    from denormalized_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "deep learning of deep networks")], "doc_id long, text string"
    )
    got = rake_keywords(df).collect()
    assert [(r.phrase, r.n_words, r.n_occurrences, r.score_milli) for r in got] == [
        ("deep learning", 2, 1, 4000),
        ("deep networks", 2, 1, 4000),
    ]


def test_rake_repeated_phrase_counts_occurrences(spark):
    from denormalized_spark.operators.text import rake_keywords

    df = spark.createDataFrame(
        [(1, "big data and big data")], "doc_id long, text string"
    )
    got = {r.phrase: r for r in rake_keywords(df).collect()}
    bd = got["big data"]
    # deg(big)=4 freq 2 -> 2000; data same -> phrase 4000, seen twice
    assert (bd.n_occurrences, bd.score_milli) == (2, 4000)


def test_absolute_discount_bigram_hand_computed(spark):
    """c(a b)=2, c(a c)=1, D=0.75: MLE and discounted probabilities
    match the published formula computed by hand."""
    from denormalized_spark.operators.text import absolute_discount_bigram

    df = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    out = {(r.w1, r.w2): r for r in
           absolute_discount_bigram(df, discount=0.75, k=10).collect()}
    # pairs: (a,b)x2 (b,a)x2 (a,c)x1 -> types=3
    # left a: n_x=3, follows 2; left b: n_x=2, follows 1
    # cont: b preceded by {a}=1, a by {b}=1, c by {a}=1
    import math

    def ad(c12, nf, npred, cx, nt=3, d=0.75):
        return math.floor((max(c12 - d, 0.0) + d * nf * (npred / nt)) / cx * 1e6 + 0.5)

    assert out[("a", "b")].p_mle_micro == math.floor(2 / 3 * 1e6 + 0.5)
    assert out[("a", "b")].p_ad_micro == ad(2, 2, 1, 3)
    assert out[("a", "c")].p_ad_micro == ad(1, 2, 1, 3)
    assert out[("b", "a")].p_ad_micro == ad(2, 1, 1, 2)
    # discounting moves (a,c) below its MLE and keeps order sane
    assert out[("a", "c")].p_ad_micro < out[("a", "c")].p_mle_micro


def test_flesch_kincaid_hand_computed(spark):
    from denormalized_spark.operators.text import flesch_kincaid_by_group

    # "go to it" -> 3 words, syllables: go=1, to=1, it=1
    df = spark.createDataFrame(
        [("s1", "go to it"), ("s1", "aeiou xyz")], "source string, text string"
    )
    import math

    g1 = math.floor((0.39 * 3 + 11.8 * (3 / 3) - 15.59) * 1000 + 0.5)
    # "aeiou xyz": 2 words; aeiou = 1 vowel group, xyz = 0 -> min 1
    g2 = math.floor((0.39 * 2 + 11.8 * (2 / 2) - 15.59) * 1000 + 0.5)
    out = flesch_kincaid_by_group(df, "source").collect()[0]
    assert out.n_docs == 2
    assert out.avg_fk_milli == math.floor((g1 + g2) / 2 + 0.5)


def test_burrows_delta_uniform_corpus_is_zero_and_outlier_scores_higher(spark):
    from denormalized_spark.operators.text import burrows_delta_by_group

    # sources s1/s2 share a style; s3 is the deviant
    rows = (
        [("s1", i, "a b a b c") for i in range(3)]
        + [("s2", 10 + i, "a b a b c") for i in range(3)]
        + [("s3", 20, "c c c c c")]
    )
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    out = {r.grp: r for r in burrows_delta_by_group(df, m=3).collect()}
    assert out["s3"].avg_delta_milli > out["s1"].avg_delta_milli
    assert out["s1"].avg_delta_milli == out["s2"].avg_delta_milli


def test_js_divergence_matrix_identical_and_disjoint(spark):
    """Identical distributions -> JS ~ 0 (exactly 0 on the pico grid
    up to per-token floor loss); fully disjoint vocabularies ->
    JS = ln 2 (the upper bound, from the one-sided mass terms)."""
    import math

    from denormalized_spark.operators.text import js_divergence_matrix

    rows = [
        ("a", "x", 3), ("a", "y", 1),
        ("b", "x", 3), ("b", "y", 1),     # identical to a
        ("c", "p", 2), ("c", "q", 2),     # disjoint from a and b
    ]
    df = spark.createDataFrame(rows, "source string, token string, cnt long")
    out = {(r.source_a, r.source_b): r for r in js_divergence_matrix(df).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    assert ab.n_common_tokens == 2
    # identical: every matched term is 0·ln(1)=0; floor can lose at
    # most 1 pico per token
    assert -2 <= ab.js_pico <= 0
    ln2_pico = math.floor(0.5 * math.log(2.0) * 1e12) * 2
    ac = out[("a", "c")]
    assert ac.n_common_tokens == 0 or ac.n_common_tokens is None
    assert abs(ac.js_pico - ln2_pico) <= 2


def test_js_divergence_matrix_hand_computed_skew(spark):
    """Hand-checked asymmetric overlap: shared token with different
    masses plus one-sided tokens — matches the float formula to pico
    floor loss."""
    import math

    from denormalized_spark.operators.text import js_divergence_matrix

    rows = [("a", "x", 3), ("a", "z", 1), ("b", "x", 1), ("b", "w", 3)]
    df = spark.createDataFrame(rows, "source string, token string, cnt long")
    r = js_divergence_matrix(df).collect()[0]
    p, q = 3 / 4, 1 / 4
    m = (p + q) / 2
    want = (
        0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
        + 0.5 * math.log(2) * (1 / 4) + 0.5 * math.log(2) * (3 / 4)
    )
    assert abs(r.js_pico / 1e12 - want) < 1e-9


def test_word_burstiness_hand_computed(spark):
    """Bursty vs scattered: 'zz' appears 4x in one doc (burst 4000,
    Poisson gap well under 1000); 'aa' once in each of 4 docs (burst
    1000, gap near the Poisson expectation)."""
    from denormalized_spark.operators.text import word_burstiness

    rows = [
        (1, "aa zz zz zz zz"), (2, "aa bb"), (3, "aa bb"), (4, "aa bb"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.token: r for r in word_burstiness(df, top_k=10).collect()}
    assert out["zz"].cf == 4 and out["zz"].dfreq == 1
    assert out["zz"].burst_milli == 4000
    assert out["aa"].cf == 4 and out["aa"].dfreq == 4
    assert out["aa"].burst_milli == 1000
    # Poisson-expected docs for cf=4, N=4: 4*(1-e^-1) ~= 2.528
    import math
    exp_docs = 4 * (1 - math.exp(-1.0))
    assert out["zz"].poisson_gap_milli == math.floor(1 / exp_docs * 1000)
    assert out["aa"].poisson_gap_milli == math.floor(4 / exp_docs * 1000)
    assert out["zz"].poisson_gap_milli < 1000 < out["aa"].poisson_gap_milli
