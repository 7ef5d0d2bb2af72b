"""Dedup operator behavior: LSH bucket-size cap, candidate gating,
signature determinism, canonical-survivor semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from denormalized_spark.operators import dedup


@pytest.fixture(scope="module")
def boilerplate_corpus(spark):
    """Pathological dedup input: 30 identical boilerplate docs (one
    giant LSH bucket) + 2 genuinely similar pairs + unique docs."""
    rows = []
    for i in range(30):
        rows.append((i, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
    rows.append((100, "the quick brown fox jumps over the lazy dog today"))
    rows.append((101, "the quick brown fox jumps over the lazy cat today"))
    rows.append((200, "completely different text about spark execution engines"))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bucket_cap_bounds_pair_blowup(boilerplate_corpus):
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            boilerplate_corpus, num_hashes=8, bands=4
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(
            boilerplate_corpus, num_hashes=8, bands=4, max_bucket_size=5
        ).collect()
    }
    # 30 identical docs → all C(30,2)=435 pairs uncapped (every band
    # bucket holds all 30); the cap drops exactly those buckets
    # (exact dedup handles identical content), keeping everything else
    boiler_pairs = {p for p in uncapped if p[0] < 30 and p[1] < 30}
    assert len(boiler_pairs) == 435
    assert capped == uncapped - boiler_pairs


def test_jaccard_gating_equals_semijoin(documents):
    d = documents.limit(200)
    cand = dedup.lsh_candidate_pairs(d, num_hashes=8, bands=4)
    ungated = dedup.jaccard_pairs(d, min_jaccard=0.2)
    gated = dedup.jaccard_pairs(d, min_jaccard=0.2, candidates=cand)
    expected = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ungated.join(cand, ["id_a", "id_b"], "left_semi").collect()
    }
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in gated.collect()}
    assert got.keys() == expected.keys()
    for k in got:
        assert got[k] == pytest.approx(expected[k])


def test_jaccard_identical_docs_is_one(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "x y z w q r")],
        ["doc_id", "text"],
    )
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup.jaccard_pairs(df).collect()}
    assert got[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) not in got  # no shared shingles → no pair emitted


def test_minhash_signature_shape_and_determinism(documents):
    sig1 = dedup.minhash_signatures(documents.limit(20), num_hashes=6).collect()
    sig2 = dedup.minhash_signatures(documents.limit(20), num_hashes=6).collect()
    assert all(len(r["minhash"]) == 6 for r in sig1)
    assert {r["doc_id"]: r["minhash"] for r in sig1} == {
        r["doc_id"]: r["minhash"] for r in sig2
    }


def test_simhash_order_insensitive_and_discriminative(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "delta gamma beta alpha"),  # same token set, shuffled
            (3, "totally unrelated words here"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["sh"] for r in df.select("doc_id", dedup.simhash("text").alias("sh")).collect()}
    assert got[1] == got[2]  # bag-of-words: order must not matter
    assert got[1] != got[3]
    assert 0 <= got[1] < (1 << 32)


def test_simhash_near_dups_hamming(spark):
    """Deterministic contract: identical token sets → identical
    simhash → same prefix bucket, hamming 0, for any prefix width."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "lazy the dog quick jumps fox brown over the"),  # shuffled
            (3, "entirely different content about database query optimization plans"),
        ],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_near_dups(df, max_hamming=3, prefix_bits=8).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert got.get((1, 2)) == 0
    # the unrelated doc may share a bucket but must fail the hamming
    # verify (md5-derived hashes: deterministic for this input)
    assert (1, 3) not in got and (2, 3) not in got


def test_exact_dedup_canonical_min_id(spark):
    df = spark.createDataFrame(
        [(5, "same text"), (2, "same text"), (9, "other")], ["doc_id", "text"]
    )
    from denormalized_spark.operators.text import content_hash

    d = df.withColumn("key", content_hash("text"))
    got = {
        r["canonical_id"]: r["n_dups"]
        for r in dedup.exact_dedup_canonical(d, "key", "doc_id").collect()
    }
    assert got == {2: 2, 9: 1}


def test_connected_components_transitive_chain(spark):
    """a~b~c collapses into one component even though (a,c) never
    paired directly; disjoint pairs stay separate."""
    from denormalized_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id_a long, id_b long",
    )
    got = {r.id: r.label for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


class TestUnigramLM:
    def test_self_scored_corpus(self, spark):
        from denormalized_spark.operators.text import unigram_logprob_scores
        import math

        d = spark.createDataFrame(
            [(0, "a a b"), (1, "b c")], ["doc_id", "text"]
        )
        # corpus counts: a=2, b=2, c=1, total=5
        out = {r.doc_id: r for r in unigram_logprob_scores(d).collect()}
        assert out[0].n_tokens == 3 and out[0].sum_freq == 2 + 2 + 2
        assert out[1].n_tokens == 2 and out[1].sum_freq == 2 + 1
        exp0 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
        assert abs(out[0].avg_logp - exp0) < 1e-9

    def test_external_vocab_floors_unseen(self, spark):
        from denormalized_spark.operators.text import (
            unigram_logprob_scores,
            unigram_vocab,
        )
        import math

        ref = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
        target = spark.createDataFrame([(0, "a zz")], ["doc_id", "text"])
        vocab = unigram_vocab(ref)
        r = unigram_logprob_scores(target, vocab=vocab, unseen_floor=1e-9).collect()[0]
        exp = (math.log(1 / 2) + math.log(1e-9)) / 2
        assert abs(r.avg_logp - exp) < 1e-9
        assert r.sum_freq == 1  # unseen token contributes 0


class TestRepetition:
    def test_duplicate_line_fraction(self, spark):
        from denormalized_spark.operators.text import duplicate_line_fraction
        from pyspark.sql import functions as F

        d = spark.createDataFrame(
            [
                (0, "nav bar\nbody text\nnav bar\n  \nfooter"),
                (1, "one line only"),
                (2, "a\na\na\na"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.f
            for r in d.select("doc_id", duplicate_line_fraction("text").alias("f")).collect()
        }
        # doc 0: 4 non-empty lines, 3 distinct -> 1/4 duplicated
        assert abs(got[0] - 0.25) < 1e-9
        assert got[1] == 0.0
        assert abs(got[2] - 0.75) < 1e-9

    def test_ngram_repetition_fractions(self, spark):
        from denormalized_spark.operators.text import ngram_repetition

        # "a b a b a" -> bigrams: [a b, b a, a b, b a]: top=2/4, dup=4/4
        d = spark.createDataFrame(
            [(0, "a b a b a"), (1, "w x y z"), (2, "q")], ["doc_id", "text"]
        )
        out = {r.doc_id: r for r in ngram_repetition(d, 2).collect()}
        assert out[0].n_grams == 4
        assert abs(out[0].top_frac - 0.5) < 1e-9
        assert abs(out[0].dup_frac - 1.0) < 1e-9
        # all-unique bigrams
        assert out[1].n_grams == 3 and out[1].dup_frac == 0.0
        assert abs(out[1].top_frac - 1 / 3) < 1e-9
        # doc shorter than n emits no row
        assert 2 not in out

    def test_word_ngrams_order_and_multiplicity(self, spark):
        from denormalized_spark.operators.text import word_ngrams
        from pyspark.sql import functions as F

        d = spark.createDataFrame([("x y x y",)], ["text"])
        [r] = d.select(word_ngrams("text", 2).alias("g")).collect()
        assert r.g == ["x y", "y x", "x y"]
        [r3] = d.select(word_ngrams("text", 3).alias("g")).collect()
        assert r3.g == ["x y x", "y x y"]


class TestTfidf:
    def test_top_terms_hand_computed(self, spark):
        from denormalized_spark.operators.text import tfidf_top_terms
        import math

        d = spark.createDataFrame(
            [(0, "cat dog cat"), (1, "dog fish")], ["doc_id", "text"]
        )
        out = tfidf_top_terms(d, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # N=2; df: cat=1 dog=2 fish=1; idf(dog)=0
        r0 = sorted(by_doc[0], key=lambda r: r.rank)
        assert [r.token for r in r0] == ["cat", "dog"]
        assert abs(r0[0].tfidf - round(2 * math.log(2), 6)) < 1e-9
        assert r0[1].tfidf == 0.0 and r0[0].tf == 2 and r0[0].df_t == 1
        r1 = sorted(by_doc[1], key=lambda r: r.rank)
        assert [r.token for r in r1] == ["fish", "dog"]

    def test_k_truncates_with_token_tiebreak(self, spark):
        from denormalized_spark.operators.text import tfidf_top_terms

        # all tokens unique within the doc and absent elsewhere:
        # equal tfidf -> rank by token ascending
        d = spark.createDataFrame(
            [(0, "b a c"), (1, "zz yy")], ["doc_id", "text"]
        )
        out = [r.token for r in tfidf_top_terms(d, k=2).filter("doc_id = 0").orderBy("rank").collect()]
        assert out == ["a", "b"]


class TestBpePairs:
    def test_counts_hand_computed(self, spark):
        from denormalized_spark.operators.text import bpe_pair_counts

        d = spark.createDataFrame(
            [("lo w lo w",), ("lo w er",)], ["text"]
        )
        got = {r.pair: r.cnt for r in bpe_pair_counts(d).collect()}
        assert got == {"lo w": 3, "w lo": 1, "w er": 1}

    def test_topk_plan_is_take_ordered(self, spark):
        from denormalized_spark.operators.text import bpe_pair_counts

        d = spark.createDataFrame([("a b c",)], ["text"])
        plan = bpe_pair_counts(d, top_k=5)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestQualityClassifier:
    def test_trained_weights_map(self, spark):
        import hashlib
        import math

        from pyspark.sql import functions as F
        from denormalized_spark.operators.text import hashed_linear_score

        def bucket(tok: str, d: int = 1 << 16) -> int:
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % d

        weights = F.create_map(
            F.lit(bucket("good")), F.lit(2.0),
            F.lit(bucket("bad")), F.lit(-2.0),
        )
        d = spark.createDataFrame(
            [(0, "good good"), (1, "bad bad"), (2, "good bad"), (3, "unseen token")],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.s
            for r in d.select(
                "doc_id", hashed_linear_score("text", weights=weights).alias("s")
            ).collect()
        }
        sig = lambda x: 1 / (1 + math.exp(-x))
        assert abs(got[0] - sig(2.0)) < 1e-9
        assert abs(got[1] - sig(-2.0)) < 1e-9
        assert abs(got[2] - sig(0.0)) < 1e-9
        assert abs(got[3] - sig(0.0)) < 1e-9  # unseen buckets -> weight 0

    def test_pseudo_weights_deterministic(self, spark):
        from denormalized_spark.operators.text import hashed_linear_score

        d = spark.createDataFrame([(0, "alpha beta gamma")], ["doc_id", "text"])
        a = d.select(hashed_linear_score("text").alias("s")).collect()[0].s
        b = d.select(hashed_linear_score("text").alias("s")).collect()[0].s
        assert a == b and 0.0 < a < 1.0


class TestNgramLangId:
    def test_discriminates_real_sentences(self, spark):
        from denormalized_spark.operators.text import lang_id_ngram

        d = spark.createDataFrame(
            [
                (0, "the quick brown fox jumped over the lazy dog and then "
                    "the rest of the evening was over before the ending"),
                (1, "ich bin ein berliner und die kinder singen schoene "
                    "lieder in der schule und der lehrer freut sich"),
                (2, "le chat est sur le toit et les enfants que nous aimons "
                    "sont dans le jardin de la maison que nous avons"),
                (3, "la casa de mi amigo que esta en la ciudad es muy grande "
                    "y la gente que vive en ella es muy amable"),
                (4, "xxqz zzkk qqpp vvmm wwrr"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r.lang_pred_ngram for r in lang_id_ngram(d).collect()}
        assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "es"
        assert got[4] == "und"

    def test_deterministic_tiebreak(self, spark):
        from denormalized_spark.operators.text import lang_id_ngram

        # empty text: all scores 0 < threshold -> und
        d = spark.createDataFrame([(0, "")], ["doc_id", "text"])
        assert lang_id_ngram(d).collect()[0].lang_pred_ngram == "und"


def test_lsh_bucket_histogram(spark):
    from denormalized_spark.operators.dedup import (
        lsh_bucket_histogram,
        lsh_candidate_pairs,
    )

    d = spark.createDataFrame(
        [(i, "the same exact duplicated text body here") for i in range(4)]
        + [(9, "completely different content entirely unrelated words")],
        ["doc_id", "text"],
    )
    hist = {r.bucket_size: r for r in lsh_bucket_histogram(d, bands=4).collect()}
    # 4 identical docs share every band bucket -> size-4 buckets exist
    assert 4 in hist and hist[4].n_buckets == 4
    assert hist[4].n_pairs == 4 * 6  # 4 bands x C(4,2)
    # histogram pair count predicts the actual candidate volume shape:
    n_pairs = lsh_candidate_pairs(d, bands=4).count()
    assert n_pairs == 6  # C(4,2), deduped across bands


def test_minhash_estimate_bounds(spark):
    from denormalized_spark.operators.dedup import minhash_estimate_pairs

    d = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta theta"),  # identical
            (2, "one two three four five six seven eight nine"),   # disjoint
        ],
        ["doc_id", "text"],
    )
    cand = spark.createDataFrame([(0, 1), (0, 2)], ["id_a", "id_b"])
    got = {
        (r.id_a, r.id_b): r.jaccard_est
        for r in minhash_estimate_pairs(d, cand, num_hashes=16).collect()
    }
    assert got[(0, 1)] == 1.0   # identical shingle sets -> all hashes agree
    assert got[(0, 2)] == 0.0   # disjoint sets -> (almost surely) no agreement


# ---------------------------------------------------------------------------
# round 5: containment + cluster representatives
# ---------------------------------------------------------------------------


def test_containment_detects_subset_jaccard_misses(spark):
    """A short doc fully contained in a long one: containment_a = 1.0
    while Jaccard is small — the partial-dup signal."""
    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(20))
    df = spark.createDataFrame([(1, short), (2, long)], ["doc_id", "text"])
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    row = dedup.containment_pairs(df, cand, "doc_id", "text", shingle_n=3).collect()[0]
    assert row["containment_a"] == 1.0
    assert row["containment_b"] < 0.2
    assert row["max_containment"] == 1.0
    jac = dedup.jaccard_pairs(df, "doc_id", "text", candidates=cand).collect()[0]
    assert jac["jaccard"] < 0.2  # Jaccard alone would not flag this pair


def test_containment_requires_shared_shingle(spark):
    df = spark.createDataFrame(
        [(1, "aa bb cc dd ee"), (2, "vv ww xx yy zz")], ["doc_id", "text"]
    )
    cand = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    assert dedup.containment_pairs(df, cand).count() == 0


def test_cluster_representatives_prefers_quality(spark):
    """Two near-dup docs: the cluster keeps the higher-quality one,
    not the lower id; singletons represent themselves."""
    from denormalized_spark.operators.text import quality_score

    good = (
        "the quick brown fox jumps over the lazy dog and then runs to "
        "the forest with a happy bark while the sun sets over the hills"
    )
    bad = "!!! ### " + good + " ### !!! ???? ;;;; @@@@ %%%% ^^^^ &&&& **** (((("
    df = spark.createDataFrame(
        [(1, bad), (2, good), (9, "totally unrelated standalone text here")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    cc = dedup.connected_components(pairs)
    reps = {
        r["cluster"]: r
        for r in dedup.cluster_representatives(
            df, cc, quality_score("text")
        ).collect()
    }
    assert reps[1]["representative_id"] == 2  # higher quality wins over min id
    assert reps[1]["n_members"] == 2
    assert reps[9]["representative_id"] == 9  # singleton
    assert reps[9]["n_members"] == 1


def test_cluster_representatives_tiebreak_min_id(spark):
    """Equal scores → deterministic min-id survivor."""
    txt = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame([(5, txt), (3, txt)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(3, 5)], ["id_a", "id_b"])
    cc = dedup.connected_components(pairs)
    rep = dedup.cluster_representatives(df, cc, F.lit(1.0)).collect()[0]
    assert rep["representative_id"] == 3


def test_cluster_representatives_string_ids(spark):
    """String doc ids (common in real corpora: URLs, hashes) must not
    crash the tiebreak (regression: numeric negation under ANSI) and
    must keep the same argmax-quality / min-id-tiebreak semantics."""
    txt = "one two three four five six seven eight nine ten eleven twelve"
    df = spark.createDataFrame(
        [("doc-b", txt), ("doc-a", txt), ("doc-z", "unrelated standalone words here")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([("doc-a", "doc-b")], ["id_a", "id_b"])
    cc = dedup.connected_components(pairs)
    reps = {
        r["cluster"]: r
        for r in dedup.cluster_representatives(df, cc, F.lit(1.0)).collect()
    }
    assert reps["doc-a"]["representative_id"] == "doc-a"  # tie -> min id
    assert reps["doc-a"]["n_members"] == 2
    assert reps["doc-z"]["representative_id"] == "doc-z"


class TestCorpusOverlap:
    def test_identical_corpora_estimate_one(self, spark):
        from denormalized_spark.operators.dedup import corpus_overlap

        rows = [(i, f"document number {i} about streaming engines and state") for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = corpus_overlap(df, df, num_hashes=32).collect()[0]
        assert out["matching_hashes"] == 32
        assert out["jaccard_estimate"] == 1.0

    def test_disjoint_corpora_estimate_near_zero(self, spark):
        from denormalized_spark.operators.dedup import corpus_overlap

        a = spark.createDataFrame(
            [(i, f"alpha beta gamma delta epsilon token{i}") for i in range(20)],
            ["doc_id", "text"],
        )
        b = spark.createDataFrame(
            [(i, f"zebra yankee xray walrus victor item{i}") for i in range(20)],
            ["doc_id", "text"],
        )
        out = corpus_overlap(a, b, num_hashes=64).collect()[0]
        # disjoint shingle sets: expected J=0; allow hash-collision slack
        assert out["jaccard_estimate"] < 0.1

    def test_estimate_tracks_true_jaccard(self, spark):
        """Half-shared corpora: the slot-match estimator must land
        within the ±3/√k band of the exact shingle-set Jaccard."""
        from denormalized_spark.operators.dedup import (
            corpus_overlap,
            shingle_hashes,
        )
        from pyspark.sql import functions as F

        shared = [(i, f"common body text shard {i % 7} repeated widely") for i in range(30)]
        only_a = [(100 + i, f"exclusive alpha content piece {i}") for i in range(15)]
        only_b = [(200 + i, f"exclusive beta material unit {i}") for i in range(15)]
        a = spark.createDataFrame(shared + only_a, ["doc_id", "text"])
        b = spark.createDataFrame(shared + only_b, ["doc_id", "text"])

        sa = {
            h
            for r in a.select(F.explode(shingle_hashes("text", 3)).alias("h")).collect()
            for h in [r["h"]]
        }
        sb = {
            h
            for r in b.select(F.explode(shingle_hashes("text", 3)).alias("h")).collect()
            for h in [r["h"]]
        }
        true_j = len(sa & sb) / len(sa | sb)
        got = corpus_overlap(a, b, num_hashes=64).collect()[0]["jaccard_estimate"]
        assert abs(got - true_j) < 3 / (64 ** 0.5), (got, true_j)


class TestFuzzyNamePairs:
    def test_planted_typo_found_exact_distance(self, spark):
        from denormalized_spark.operators.dedup import fuzzy_name_pairs

        # J = 7/8 word-2-grams shared: the gate's any-band
        # probability is ~0.99 and this specific pair collides under
        # the deterministic hash constants (a 4-gram name missed all
        # bands — banding is probabilistic, pick gate-able fixtures)
        rows = [
            (1, "golden lavender spring lace ivory olive misty rose"),
            (2, "golden lavender spring lace ivory olive misty rose x"),
            (3, "completely different name here entirely other words now"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        got = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in fuzzy_name_pairs(
                df, "id", "name", max_distance=3, shingle_n=2
            ).collect()
        }
        assert got == {(1, 2): 2}

    def test_length_shortcut_prunes(self, spark):
        """A candidate pair whose lengths differ by more than the
        bound never reaches the DP (plan-level: the filter precedes
        levenshtein; behavior-level: excluded from output)."""
        from denormalized_spark.operators.dedup import fuzzy_name_pairs

        rows = [
            (1, "alpha beta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        out = fuzzy_name_pairs(df, "id", "name", max_distance=3, shingle_n=2)
        assert out.collect() == []

    def test_char_gate_catches_in_word_typo(self, spark):
        """A one-letter typo INSIDE a word deletes that word token, so
        the word gate can go blind; char 3-grams keep ~all grams
        shared and the pair gates through with its exact distance."""
        from denormalized_spark.operators.dedup import fuzzy_name_pairs

        rows = [
            (1, "chocolate lavender"),
            (2, "chocolate lavendar"),
            (3, "totally unrelated words"),
        ]
        df = spark.createDataFrame(rows, ["id", "name"])
        char = {
            (r["id_a"], r["id_b"]): r["distance"]
            for r in fuzzy_name_pairs(
                df, "id", "name", max_distance=3, shingle_n=3,
                shingle_unit="char",
            ).collect()
        }
        assert char == {(1, 2): 1}


class TestRepeatedSpans:
    """Cross-document repeated-passage detection (exact-substring
    dedup, n-gram-span form) and passage stripping."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        # docs 0/1/3 share the 7-token passage alpha..eta at different
        # offsets; doc 2 shares nothing; doc 4 is shorter than n.
        return spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta eta unique0 tail0"),
                (1, "lead1 alpha beta gamma delta epsilon zeta eta other1"),
                (2, "totally different words here nothing shared at all ok"),
                (3, "x1 x2 x3 alpha beta gamma delta epsilon zeta eta y1 y2"),
                (4, "short doc"),
            ],
            ["doc_id", "text"],
        )

    def test_spans_merge_overlapping_grams(self, corpus):
        spans = {
            r["doc_id"]: (r["span_start"], r["span_end"], r["span_tokens"])
            for r in dedup.repeated_ngram_spans(corpus, n=3, min_docs=2).collect()
        }
        # the 7-token shared passage -> ONE maximal span per doc, at
        # the doc-specific offset; docs 2 and 4 have none
        assert spans == {0: (0, 7, 7), 1: (1, 8, 7), 3: (3, 10, 7)}

    def test_min_docs_gate(self, spark):
        # passage shared by exactly 2 docs: min_docs=3 finds nothing
        df = spark.createDataFrame(
            [
                (0, "p q r s t u"),
                (1, "a p q r s t u b"),
                (2, "unrelated words entirely here now"),
            ],
            ["doc_id", "text"],
        )
        assert dedup.repeated_ngram_spans(df, n=3, min_docs=3).count() == 0
        assert dedup.repeated_ngram_spans(df, n=3, min_docs=2).count() == 2

    def test_within_doc_repeat_not_duplicated(self, spark):
        # a gram repeated only WITHIN one doc is not cross-doc dup
        df = spark.createDataFrame(
            [
                (0, "x y z x y z x y z"),
                (1, "totally other tokens only"),
            ],
            ["doc_id", "text"],
        )
        assert dedup.repeated_ngram_spans(df, n=3, min_docs=2).count() == 0

    def test_gap_splits_islands(self, spark):
        # two shared 3-grams separated by a > n token gap -> 2 spans
        df = spark.createDataFrame(
            [
                (0, "a b c g0 g1 g2 g3 x y z"),
                (1, "a b c h0 h1 h2 h3 x y z"),
            ],
            ["doc_id", "text"],
        )
        spans = sorted(
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in dedup.repeated_ngram_spans(df, n=3, min_docs=2).collect()
        )
        assert spans == [(0, 0, 3), (0, 7, 10), (1, 0, 3), (1, 7, 10)]

    def test_strip_reconstructs_survivors(self, corpus):
        out = {
            r["doc_id"]: r
            for r in dedup.strip_repeated_ngrams(corpus, n=3, min_docs=2).collect()
        }
        assert out[0]["clean_text"] == "unique0 tail0"
        assert out[1]["clean_text"] == "lead1 other1"
        assert out[3]["clean_text"] == "x1 x2 x3 y1 y2"
        # untouched docs pass through verbatim with zero spans
        assert out[2]["clean_text"] == out[2]["text"]
        assert out[2]["n_spans"] == 0 and out[4]["n_spans"] == 0
        for r in out.values():
            assert r["kept_tokens"] <= r["n_tokens"]
            assert r["kept_tokens"] == len(r["clean_text"].split())

    def test_strip_accepts_precomputed_spans(self, corpus):
        spans = dedup.repeated_ngram_spans(corpus, n=3, min_docs=2)
        a = dedup.strip_repeated_ngrams(corpus, n=3, min_docs=2)
        b = dedup.strip_repeated_ngrams(corpus, spans=spans, n=3, min_docs=2)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestPrefixFilterJaccardJoin:
    """AllPairs exact similarity self-join: agreement with the brute
    force on every pair, threshold boundary inclusivity, prefix-filter
    completeness, partitioning invariance."""

    def _df(self, spark, docs):
        return spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )

    @staticmethod
    def _brute(docs, thr_pct, ngram=1):
        def elems(s):
            ws = s.split()
            if ngram == 1:
                return set(ws)
            if len(ws) >= ngram:
                return {
                    " ".join(ws[i : i + ngram]) for i in range(len(ws) - ngram + 1)
                }
            return {" ".join(ws)}

        out = {}
        for i, a in enumerate(docs):
            for j in range(i + 1, len(docs)):
                sa, sb = elems(a), elems(docs[j])
                inter = len(sa & sb)
                if 100 * inter >= thr_pct * (len(sa) + len(sb) - inter):
                    out[(i, j)] = round(inter / (len(sa) + len(sb) - inter), 6)
        return out

    _DOCS = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",   # near-dup of 0
        "completely different words entirely here now",
        "the quick brown fox jumps over the lazy dog",   # exact dup of 0
        "quick brown fox",                                # subset, small
        "alpha beta gamma delta epsilon zeta eta theta",
    ]

    def test_matches_bruteforce_unigram(self, spark):
        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_jaccard_join(
                self._df(spark, self._DOCS), threshold_pct=50
            ).collect()
        }
        assert got == self._brute(self._DOCS, 50)

    def test_matches_bruteforce_bigram(self, spark):
        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_jaccard_join(
                self._df(spark, self._DOCS), threshold_pct=60, ngram=2
            ).collect()
        }
        assert got == self._brute(self._DOCS, 60, ngram=2)

    def test_threshold_boundary_inclusive(self, spark):
        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        # |∩|=3 of 3+5-3=5 union → J = 0.6 exactly: must be INCLUDED at 60
        docs = ["a b c", "a b c d e"]
        got = prefix_filter_jaccard_join(
            self._df(spark, docs), threshold_pct=60
        ).collect()
        assert len(got) == 1 and got[0]["jaccard"] == 0.6
        # and excluded at 61
        assert (
            prefix_filter_jaccard_join(self._df(spark, docs), threshold_pct=61).count()
            == 0
        )

    def test_exact_dup_scores_one(self, spark):
        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_filter_jaccard_join(
                self._df(spark, self._DOCS), threshold_pct=90
            ).collect()
        }
        assert got[(0, 3)] == 1.0

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        docs = [f"w{i % 9} w{(i + 1) % 9} w{(i + 2) % 9} w{(i * 3) % 11}" for i in range(60)]
        a = prefix_filter_jaccard_join(self._df(spark, docs), 60).collect()
        b = prefix_filter_jaccard_join(
            self._df(spark, docs).repartition(13), 60
        ).collect()
        key = lambda rs: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rs)
        assert key(a) == key(b)

    def test_bad_threshold(self, spark):
        import pytest as _pytest

        from denormalized_spark.operators.dedup import prefix_filter_jaccard_join

        with _pytest.raises(ValueError):
            prefix_filter_jaccard_join(self._df(spark, ["a"]), 0)


def test_strip_repeated_ngrams_output_name_collision(spark):
    # ADVICE r9: pre-existing output column names must raise, not
    # silently produce duplicate column names.
    df = spark.createDataFrame(
        [(1, "a b c", "x")], "doc_id long, text string, clean_text string"
    )
    with pytest.raises(ValueError, match="clean_text"):
        dedup.strip_repeated_ngrams(df, n=2, min_docs=2)


class TestWinnowing:
    def test_shared_substring_guarantee(self, spark):
        """Schleimer et al. 2003: any shared run of >= w+k-1 tokens
        must share at least one fingerprint (k=4, w=4 -> 7 tokens)."""
        shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
        df = spark.createDataFrame(
            [
                (1, f"one two three {shared} four five six"),
                (2, f"{shared} completely different tail here now"),
                (3, "nothing in common with the others at all"),
            ],
            "doc_id long, text string",
        )
        fps = dedup.winnow_fingerprints(df, k=4, w=4)
        h1 = {r["fp_hash"] for r in fps.filter("doc_id = 1").collect()}
        h2 = {r["fp_hash"] for r in fps.filter("doc_id = 2").collect()}
        h3 = {r["fp_hash"] for r in fps.filter("doc_id = 3").collect()}
        assert h1 & h2, "shared 7-token run must share a fingerprint"
        assert not (h1 & h3) and not (h2 & h3)

    def test_short_doc_and_density(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c"), (2, " ".join(f"w{i}" for i in range(103)))],
            "doc_id long, text string",
        )
        fps = dedup.winnow_fingerprints(df, k=4, w=4)
        assert fps.filter("doc_id = 1").count() == 0  # < k+w-1 tokens
        n = fps.filter("doc_id = 2").count()
        # expected density 2/(w+1) = 0.4 over 97 windows; all-distinct
        # grams here so selections are near-theory
        assert 20 <= n <= 70, n

    def test_pairs_and_partitioning(self, spark):
        rows = [(i, " ".join(f"t{(i * 7 + j) % 9}" for j in range(30))) for i in range(20)]
        rows.append((100, rows[0][1]))  # exact dup of doc 0
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.winnow_pairs(df, min_shared=3, max_bucket_size=64)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (0, 100) in got
        a = sorted(map(tuple, dedup.winnow_fingerprints(df).collect()))
        b = sorted(map(tuple, dedup.winnow_fingerprints(df.repartition(7)).collect()))
        assert a == b


def test_snm_candidate_pairs(spark):
    # 6 records sorted by key: every pair within 2 positions appears
    df = spark.createDataFrame(
        [(i, f"k{i:02d}") for i in range(6)], "doc_id long, key string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.snm_candidate_pairs(df, "key", window=3).collect()
    }
    want = {(i, j) for i in range(6) for j in range(i + 1, min(i + 3, 6))}
    assert got == want
    # near-dup rewrites sharing a prefix co-occur in the window
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over it"),
            (2, "the quick brown fox jumps over them"),
            (3, "zzz completely unrelated text zzz"),
            (4, "aaa another unrelated document aaa"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.snm_candidate_pairs(
            docs, F.substring("text", 1, 24), window=2
        ).collect()
    }
    assert (1, 2) in pairs


def test_snm_rejects_window_below_two(spark):
    # r10 ADVICE: window=1 used to divide by zero in the block
    # assignment; window<2 is meaningless and now raises like the
    # sibling operators' param validation.
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, key string")
    with pytest.raises(ValueError, match="window"):
        dedup.snm_candidate_pairs(df, "key", window=1)


class TestFellegiSunter:
    def _pairs(self, spark):
        return spark.createDataFrame(
            [(1, 2, "a", "a", 5, 5), (3, 4, "a", "b", 5, 6), (5, 6, "a", "a", 5, 6)],
            "id_a long, id_b long, na string, nb string, sa long, sb long",
        )

    def _comps(self):
        return [
            ("name", F.col("na") == F.col("nb"), 0.9, 0.01),
            ("size", F.col("sa") == F.col("sb"), 0.8, 0.2),
        ]

    def test_closed_form_weights(self, spark):
        import math

        out = {
            r.id_a: r
            for r in dedup.fellegi_sunter_scores(
                self._pairs(spark), self._comps()
            ).collect()
        }
        wn_a = int(math.floor(math.log(0.9 / 0.01) * 1e6 + 0.5))
        wn_d = int(math.floor(math.log(0.1 / 0.99) * 1e6 + 0.5))
        ws_a = int(math.floor(math.log(0.8 / 0.2) * 1e6 + 0.5))
        ws_d = int(math.floor(math.log(0.2 / 0.8) * 1e6 + 0.5))
        assert out[1].fs_score_micro == wn_a + ws_a and out[1].is_match
        assert out[3].fs_score_micro == wn_d + ws_d and not out[3].is_match
        # mixed evidence: name agrees, size disagrees -> still positive
        assert out[5].fs_score_micro == wn_a + ws_d and out[5].is_match
        assert out[5].agr_name and not out[5].agr_size

    def test_weights_helper_matches(self, spark):
        comps = self._comps()
        w = dedup.fs_weights_micro(comps)
        assert set(w) == {"name", "size"}
        assert all(wa > 0 > wd for wa, wd in w.values())

    def test_rejects_bad_mu(self, spark):
        import pytest

        with pytest.raises(ValueError, match="m must exceed u"):
            dedup.fellegi_sunter_scores(
                self._pairs(spark), [("x", F.lit(True), 0.2, 0.8)]
            )
        with pytest.raises(ValueError, match="must be in"):
            dedup.fellegi_sunter_scores(
                self._pairs(spark), [("x", F.lit(True), 1.0, 0.5)]
            )
        with pytest.raises(ValueError, match="non-empty"):
            dedup.fellegi_sunter_scores(self._pairs(spark), [])


def test_paragraph_block_dedup_hand_computed(spark):
    """Two docs sharing their first 4-token block (k=4) are both
    flagged with 1 duplicated block; a unique doc is absent."""
    from denormalized_spark.operators.dedup import paragraph_block_dedup

    shared = "a b c d"
    docs = spark.createDataFrame(
        [
            (1, shared + " e f g h i"),   # blocks: [a b c d], [e f g h], [i]
            (2, shared + " x y z"),        # blocks: [a b c d], [x y z]
            (3, "p q r s t u v w"),        # unique
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_block_dedup(docs, block_tokens=4).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_blocks, out[1].n_dup_blocks) == (3, 1)
    assert (out[2].n_blocks, out[2].n_dup_blocks) == (2, 1)
    assert out[1].dup_frac_milli == 333  # floor(1000/3 + .5)
    assert out[2].dup_frac_milli == 500


def test_paragraph_blocks_trailing_partial_and_short_doc(spark):
    from denormalized_spark.operators.dedup import paragraph_blocks

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x")], "doc_id long, text string"
    )
    rows = paragraph_blocks(docs, block_tokens=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: one full block + one trailing partial
    assert [r.block_idx for r in sorted(by_doc[1], key=lambda r: r.block_idx)] == [0, 1]
    # doc 2: a single sub-k block, still emitted
    assert len(by_doc[2]) == 1
    # identical token prefixes hash equal across docs
    docs2 = spark.createDataFrame(
        [(10, "a b c d zzz")], "doc_id long, text string"
    )
    h1 = sorted(by_doc[1], key=lambda r: r.block_idx)[0].block_hash
    h2 = paragraph_blocks(docs2, block_tokens=4).collect()
    h2 = sorted(h2, key=lambda r: r.block_idx)[0].block_hash
    assert h1 == h2


def test_cdc_chunks_shift_robustness(spark):
    """The CDC property fixed blocks lack: inserting one token at the
    FRONT of a document leaves every post-anchor chunk hash intact,
    so the two versions still share chunks."""
    from denormalized_spark.operators.dedup import cdc_chunks

    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16 w17 w18 w19 w20"
    docs = spark.createDataFrame(
        [(1, text), (2, "INSERTED " + text)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs, boundary_mod=4).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    shared = h1 & h2
    assert shared, "CDC chunks must re-synchronize after an insertion"


def test_cdc_chunk_boundaries_match_hash_rule(spark):
    """Every chunk after the first must START at a boundary token
    (hash % mod == 0) — verified against a per-token recomputation."""
    import hashlib

    from denormalized_spark.operators.dedup import cdc_chunks

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mod = 4
    toks = text.split()
    hs = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in toks]
    # expected chunk partition
    exp_chunks, cur = [], []
    for h in hs:
        if h % mod == 0 and cur:
            exp_chunks.append(cur)
            cur = []
        elif h % mod == 0:
            pass
        cur.append(h)
    if cur:
        exp_chunks.append(cur)
    # expected rolling hashes
    MOD = 1 << 32
    def roll(seq):
        acc = 0
        for x in seq:
            acc = (acc * 31 + x) % MOD
        return acc
    # handle the first-token-is-boundary edge the same way the
    # operator does (prefix-sum grouping): recompute via groups
    flags = [1 if h % mod == 0 else 0 for h in hs]
    grp, groups = 0, {}
    for h, f in zip(hs, flags):
        grp += f
        groups.setdefault(grp, []).append(h)
    exp = sorted(roll(v) for v in groups.values())

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(r.chunk_hash for r in cdc_chunks(df, boundary_mod=mod).collect())
    assert got == exp


def test_fastcdc_min_size_suppresses_early_boundary(spark):
    """A boundary token closer than min_tokens to the previous cut is
    skipped; the chunk partition matches a Python replay of the
    recurrence, and no chunk (except possibly the tail) is shorter
    than min_tokens."""
    import hashlib

    from denormalized_spark.operators.dedup import fastcdc_chunks

    words = [f"w{i}" for i in range(24)]
    text = " ".join(words)
    mod, mn = 4, 4
    hs = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in words]
    cuts = [1]
    for i in range(2, len(hs) + 1):
        if hs[i - 1] % mod == 0 and i - cuts[-1] >= mn:
            cuts.append(i)
    # python replay of chunk hashes
    MOD = 1 << 32
    chunks = {}
    for pos, h in enumerate(hs, start=1):
        cid = sum(1 for c in cuts if c <= pos) - 1
        chunks.setdefault(cid, []).append(h)
    def roll(seq):
        acc = 0
        for x in seq:
            acc = (acc * 31 + x) % MOD
        return acc
    want = {cid: (len(v), roll(v)) for cid, v in chunks.items()}

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r.chunk_idx: (r.n_tokens, r.chunk_hash)
        for r in fastcdc_chunks(df, boundary_mod=mod, min_tokens=mn).collect()
    }
    assert got == want
    sizes = [n for n, _ in got.values()]
    assert all(s >= mn for s in sizes[:-1])


def test_fastcdc_vs_cdc_chunk_counts(spark):
    """The min-size clamp can only reduce (or keep) the cut count —
    FastCDC never yields more chunks than plain CDC."""
    from denormalized_spark.operators.dedup import cdc_chunks, fastcdc_chunks

    text = " ".join(f"tok{i}" for i in range(60))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n_cdc = cdc_chunks(df, boundary_mod=4).count()
    n_fast = fastcdc_chunks(df, boundary_mod=4, min_tokens=5).count()
    assert n_fast <= n_cdc


def test_fastcdc_max_clamp_bounds_chunks_and_matches_replay(spark):
    """With max_tokens set, every chunk is <= max_tokens, forced cuts
    fire exactly where the Python replay of the widened acceptance
    predicate says, and max_tokens=None keeps the min-only behavior."""
    import hashlib

    from denormalized_spark.operators.dedup import fastcdc_chunks

    words = [f"w{i}" for i in range(40)]
    text = " ".join(words)
    mod, mn, mx = 16, 4, 6  # mod 16 -> sparse boundaries, clamp fires often
    hs = [int(hashlib.md5(w.encode()).hexdigest()[:8], 16) for w in words]
    cuts = [1]
    for i in range(2, len(hs) + 1):
        gap = i - cuts[-1]
        if (hs[i - 1] % mod == 0 and gap >= mn) or gap >= mx:
            cuts.append(i)
    MOD = 1 << 32
    chunks = {}
    for pos, h in enumerate(hs, start=1):
        cid = sum(1 for c in cuts if c <= pos) - 1
        chunks.setdefault(cid, []).append(h)

    def roll(seq):
        acc = 0
        for x in seq:
            acc = (acc * 31 + x) % MOD
        return acc

    want = {cid: (len(v), roll(v)) for cid, v in chunks.items()}
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        r.chunk_idx: (r.n_tokens, r.chunk_hash)
        for r in fastcdc_chunks(
            df, boundary_mod=mod, min_tokens=mn, max_tokens=mx
        ).collect()
    }
    assert got == want
    assert all(n <= mx for n, _ in got.values())
    assert len(got) > 1  # the clamp actually forced cuts here
    # default (max_tokens=None) unchanged: min-only recurrence
    cuts_min = [1]
    for i in range(2, len(hs) + 1):
        if hs[i - 1] % mod == 0 and i - cuts_min[-1] >= mn:
            cuts_min.append(i)
    got_min = fastcdc_chunks(df, boundary_mod=mod, min_tokens=mn).collect()
    assert len(got_min) == len(cuts_min)


def test_bcubed_eval_hand_computed(spark):
    """Textbook B-cubed: universe {1..6}; gold clusters {1,2},{3,4},
    {5},{6}; system over-merges {1,2,3,4} and leaves 5,6 singletons.
    Per element in the merged cluster: P=2/4, R=2/2; elements 5,6:
    P=R=1. B3P=(4*0.5+2*1)/6=2/3, B3R=1, F1=0.8."""
    from denormalized_spark.operators.dedup import bcubed_eval

    universe = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    sys_pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    gold_pairs = spark.createDataFrame([(1, 2), (3, 4)], "id_a long, id_b long")
    r = bcubed_eval(universe, sys_pairs, gold_pairs).collect()[0]
    assert r.n_docs == 6
    assert r.n_sys_clusters == 3 and r.n_gold_clusters == 4
    # cells: ({1234},{12}) n=2 -> p=2*2e6//4=1e6 each side of the sum
    # sum_p = 1000000+1000000+1000000+1000000 = 4_000_000? replay:
    # cells (sys{1,2,3,4}): (s1,g12) n=2 p=4e6//4=1e6 r=4e6//2=2e6
    #                        (s1,g34) n=2 p=1e6 r=2e6
    # (5,5) n=1 p=1e6 r=1e6 ; (6,6) n=1 p=1e6 r=1e6
    assert r.bcubed_precision_micro == (1_000_000 * 2 + 2_000_000) // 6  # 666666
    assert r.bcubed_recall_micro == 1_000_000
    # F1 = 2PR/(P+R) on the micro grid
    p, q_ = 666666, 1_000_000
    assert r.bcubed_f1_micro == (2 * p * q_) // (p + q_)


def test_bcubed_eval_perfect_match(spark):
    from denormalized_spark.operators.dedup import bcubed_eval

    universe = spark.createDataFrame([(i,) for i in range(1, 5)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = bcubed_eval(universe, pairs, pairs).collect()[0]
    assert r.bcubed_precision_micro == 1_000_000
    assert r.bcubed_recall_micro == 1_000_000
    assert r.bcubed_f1_micro == 1_000_000
