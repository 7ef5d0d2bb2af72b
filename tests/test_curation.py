"""Curation-operator semantics: decontamination, chunking, mixture
sampling — plus the ANN bucket-size cap that bounds degenerate LSH
buckets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from denormalized_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "web"),
        (1, "one two three four five six seven", "web"),
        # shares the 3-gram "three four five" with doc 1
        (2, "zz three four five qq rr ss tt", "forum"),
        (3, "totally unrelated words here now ok", "forum"),
        (4, "alpha beta gamma delta epsilon zeta", "code"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


class TestDecontaminate:
    def test_removes_ngram_overlap_only(self, spark, docs):
        bench = docs.filter(F.col("doc_id") == 1).select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") != 1)
        clean = curation.decontaminate(corpus, bench, n=3)
        assert sorted(r.doc_id for r in clean.select("doc_id").collect()) == [0, 3, 4]

    def test_flag_variant_matches_filter_variant(self, spark, docs):
        bench = docs.filter(F.col("doc_id") == 1).select("text")
        corpus = docs.filter(F.col("doc_id") != 1)
        flagged = curation.decontaminate(corpus, bench, n=3, return_flags=True)
        clean_ids = {
            r.doc_id for r in flagged.filter(~F.col("contaminated")).collect()
        }
        filt_ids = {
            r.doc_id for r in curation.decontaminate(corpus, bench, n=3).collect()
        }
        assert clean_ids == filt_ids
        # flag variant keeps the whole corpus
        assert flagged.count() == corpus.count()

    def test_short_benchmark_doc_uses_rolling_hash(self, spark):
        # benchmark doc shorter than n → its rolling-hash "gram" only
        # matches an identical short corpus doc, not substrings
        bench = spark.createDataFrame([(0, "tiny doc")], ["doc_id", "text"])
        corpus = spark.createDataFrame(
            [(1, "tiny doc"), (2, "tiny doc extended further here")],
            ["doc_id", "text"],
        )
        clean = curation.decontaminate(corpus, bench, n=5)
        assert [r.doc_id for r in clean.collect()] == [2]

    def test_corpus_side_has_no_shuffle(self, spark, docs):
        """The 100 TB contract: both joins against the corpus are
        broadcast — no Exchange ships corpus rows."""
        bench = docs.filter(F.col("doc_id") == 1).select("text")
        corpus = docs.filter(F.col("doc_id") != 1)
        plan = curation.decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestChunkDocuments:
    def test_disjoint_chunks_partition_tokens(self, spark, docs):
        out = curation.chunk_documents(docs, chunk_tokens=4, stride=4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc in docs.collect():
            n_tok = len(doc.text.split())
            chunks = sorted(by_doc[doc.doc_id], key=lambda r: r.chunk_id)
            assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
            assert sum(c.n_chunk_tokens for c in chunks) == n_tok
            # re-joining disjoint chunks reconstructs the document
            assert " ".join(c.chunk_text for c in chunks) == " ".join(doc.text.split())

    def test_overlapping_stride(self, spark, docs):
        out = curation.chunk_documents(
            docs.filter(F.col("doc_id") == 1), chunk_tokens=4, stride=2
        ).collect()
        chunks = sorted(out, key=lambda r: r.chunk_id)
        toks = "one two three four five six seven".split()
        for c in chunks:
            start = c.chunk_id * 2
            assert c.chunk_text == " ".join(toks[start : start + 4])
        # every token covered, tail fragment kept
        assert {t for c in chunks for t in c.chunk_text.split()} == set(toks)
        assert chunks[-1].n_chunk_tokens == 1  # "seven"

    def test_empty_doc_yields_no_chunks(self, spark):
        d = spark.createDataFrame([(0, ""), (1, "a b")], ["doc_id", "text"])
        out = curation.chunk_documents(d, chunk_tokens=4, stride=4).collect()
        assert {r.doc_id for r in out} == {1}

    def test_keep_text_false_drops_text(self, spark, docs):
        out = curation.chunk_documents(docs, chunk_tokens=4, keep_text=False)
        assert "chunk_text" not in out.columns
        assert "chunk_hash" in out.columns


class TestMixtureSample:
    def test_deterministic_and_rate_bounded(self, spark):
        n = 2000
        d = spark.range(n).select(
            F.col("id").alias("doc_id"), F.lit("web").alias("source")
        )
        s1 = {r.doc_id for r in curation.mixture_sample(d, {"web": 0.3}).collect()}
        s2 = {r.doc_id for r in curation.mixture_sample(d, {"web": 0.3}).collect()}
        assert s1 == s2  # same seed → identical sample
        assert abs(len(s1) / n - 0.3) < 0.05  # md5 fraction is uniform
        s3 = {
            r.doc_id
            for r in curation.mixture_sample(d, {"web": 0.3}, seed="other").collect()
        }
        assert s3 != s1

    def test_unknown_stratum_dropped_by_default(self, spark, docs):
        out = curation.mixture_sample(docs, {"web": 1.0})
        assert {r.source for r in out.collect()} == {"web"}

    def test_nested_rates(self, spark, docs):
        out = curation.mixture_sample(
            docs, {"web": 1.0, "forum": 0.0, "code": 1.0}
        ).collect()
        assert sorted(r.doc_id for r in out) == [0, 1, 4]

    def test_subset_property(self, spark):
        """Lower rate samples are subsets of higher rate samples (the
        fraction threshold is monotone) — what makes mixture re-weights
        incremental instead of a full resample."""
        d = spark.range(500).select(
            F.col("id").alias("doc_id"), F.lit("s").alias("source")
        )
        lo = {r.doc_id for r in curation.mixture_sample(d, {"s": 0.2}).collect()}
        hi = {r.doc_id for r in curation.mixture_sample(d, {"s": 0.6}).collect()}
        assert lo < hi


class TestPackDocuments:
    def test_concat_and_chop_invariants(self, spark):
        import random

        rng = random.Random(11)
        rows = [(i, rng.randint(0, 40)) for i in range(200)]
        d = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
        out = sorted(
            curation.pack_documents(d, seq_tokens=64).collect(),
            key=lambda r: r.doc_id,
        )
        # offsets are the exclusive prefix sum in doc_id order
        run = 0
        for r, (i, nt) in zip(out, rows):
            assert r.token_offset == run
            assert r.first_seq == run // 64
            last = (run + nt - 1) // 64 if nt > 0 else run // 64
            assert r.last_seq == last
            run += nt

    def test_no_single_reducer_over_data(self, spark):
        """The only unpartitioned window must be over the tiny
        per-partition sums relation, never the data: the plan's
        range-repartition carries the rows, and the offsets join is a
        broadcast."""
        d = spark.range(1000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 17).alias("n_tokens")
        )
        plan = curation.pack_documents(d, seq_tokens=128)._jdf.queryExecution().executedPlan().toString()
        assert "RangePartitioning" in plan or "rangepartitioning" in plan
        assert "BroadcastHashJoin" in plan


class TestRedactPii:
    def test_redacts_each_kind(self, spark):
        d = spark.createDataFrame(
            [(0, "mail a.b+c@ex.co at 192.168.0.1 ssn 123-45-6789 keep 1.2 words")],
            ["doc_id", "text"],
        )
        out = d.select(curation.redact_pii("text").alias("r")).collect()[0].r
        assert out == "mail <EMAIL> at <IP> ssn <SSN> keep 1.2 words"

    def test_no_pii_is_noop(self, spark, docs):
        same = docs.select(
            (curation.redact_pii("text") == F.col("text")).alias("eq")
        ).collect()
        assert all(r.eq for r in same)


class TestStreamingCuration:
    def test_decontaminate_per_microbatch_matches_batch(self, spark, sf_dir):
        """The streaming recipe for decontamination: the benchmark is
        static, so each micro-batch runs the batch operator inside
        foreachBatch (per-row scrubbing needs no cross-batch state —
        contamination is a property of the doc alone). Streamed union
        must equal the batch run."""
        import tempfile

        from denormalized_spark.sources.files import load_table, stream_table

        d = load_table(spark, sf_dir, "documents")
        bench = d.filter(F.col("doc_id") % 20 == 7)
        batch_ids = {
            r.doc_id
            for r in curation.decontaminate(
                d.filter(F.col("doc_id") % 20 != 7), bench, n=5
            ).collect()
        }

        stream = stream_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") % 20 != 7
        )
        got = []
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _e: got.extend(
                    r.doc_id for r in curation.decontaminate(b, bench, n=5).collect()
                )
            )
            .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_decon_"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert sorted(got) == sorted(batch_ids)


class TestQuotaSelect:
    def test_top_k_per_stratum_with_tiebreak(self, spark):
        rows = [
            (1, "a", 0.9), (2, "a", 0.5), (3, "a", 0.9), (4, "a", 0.1),
            (5, "b", 0.2),
        ]
        d = spark.createDataFrame(rows, ["doc_id", "source", "quality"])
        out = curation.quota_select(d, quota=2).collect()
        got = {(r.doc_id, r.source) for r in out}
        # ties at 0.9 break by min doc_id: 1 then 3; b keeps its only doc
        assert got == {(1, "a"), (3, "a"), (5, "b")}

    def test_plan_uses_window_group_limit(self, spark):
        """Rank-limit pushdown: the per-group top-k must not sort whole
        groups to completion — Spark's WindowGroupLimit caps each."""
        d = spark.range(100).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).alias("source"),
            F.rand(7).alias("quality"),
        )
        plan = curation.quota_select(d, quota=3)._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestAnnBucketCap:
    def test_cap_bounds_degenerate_bucket(self, spark):
        from denormalized_spark.operators.similarity import lsh_bucketed_neighbors

        # 40 identical vectors: every table puts them all in ONE bucket
        d = spark.range(40).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(1.0)] * 8).alias("embedding"),
        )
        uncapped = lsh_bucketed_neighbors(d, dim=8, num_planes=4, num_tables=1)
        assert uncapped.count() == 40 * 39 // 2
        capped = lsh_bucketed_neighbors(
            d, dim=8, num_planes=4, num_tables=1, max_bucket_size=10
        )
        assert capped.count() == 0  # the one oversized bucket is dropped

    def test_headline_entry_cap_bounds_degenerate_corpus(self, spark):
        """Regression (round 9): the sim_lsh_buckets /
        dedup_embedding_neardup ENTRY configs carry max_bucket_size —
        a corpus region that collapses to one embedding (boilerplate)
        must not trigger quadratic in-bucket pair generation. With
        every vector identical, each table has ONE bucket of size
        n > _LSH_CAP, so pair output is exactly 0 — bounded work, not
        n(n-1)/2 pairs."""
        from denormalized_spark.operators.similarity import lsh_bucketed_neighbors
        from denormalized_spark.queries.llm_pipeline import (
            _LSH_CAP,
            _LSH_PLANES,
            _LSH_TABLES,
            _ND_PLANES,
            _ND_TABLES,
        )

        n = _LSH_CAP + 8
        d = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(1.0)] * 64).alias("embedding"),
        )
        for planes, tables in ((_LSH_PLANES, _LSH_TABLES), (_ND_PLANES, _ND_TABLES)):
            out = lsh_bucketed_neighbors(
                d, dim=64, num_planes=planes, num_tables=tables,
                max_bucket_size=_LSH_CAP,
            )
            assert out.count() == 0

    def test_cap_keeps_small_buckets(self, spark, sf_dir):
        from denormalized_spark.operators.similarity import lsh_bucketed_neighbors
        from denormalized_spark.sources.files import load_table

        e = load_table(spark, sf_dir, "embeddings")
        base = lsh_bucketed_neighbors(e, dim=64, num_planes=4, num_tables=2)
        capped = lsh_bucketed_neighbors(
            e, dim=64, num_planes=4, num_tables=2, max_bucket_size=10**6
        )
        assert base.count() == capped.count()


class TestSplitAssign:
    def test_partition_and_determinism(self, spark):
        from denormalized_spark.operators.curation import split_assign

        d = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
        w = {"train": 0.8, "val": 0.1, "test": 0.1}
        out = split_assign(d, w).groupBy("split").count().collect()
        got = {r.split: r["count"] for r in out}
        assert set(got) == {"train", "val", "test"}
        assert sum(got.values()) == 2000
        assert 0.75 < got["train"] / 2000 < 0.85
        # deterministic: identical assignment on rerun
        a = {r.doc_id: r.split for r in split_assign(d, w).collect()}
        b = {r.doc_id: r.split for r in split_assign(d, w).collect()}
        assert a == b

    def test_group_aware_no_leakage(self, spark):
        from denormalized_spark.operators.curation import split_assign
        from pyspark.sql import functions as F

        # 100 groups x 5 members: every member must share its group's split
        d = spark.range(0, 500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 100).alias("cluster")
        )
        out = split_assign(d, {"train": 0.5, "test": 0.5}, group_col="cluster")
        n_violations = (
            out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("k"))
            .filter("k > 1")
            .count()
        )
        assert n_violations == 0

    def test_remainder_falls_to_last_split(self, spark):
        from denormalized_spark.operators.curation import split_assign

        d = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
        got = {
            r.split: r["count"]
            for r in split_assign(d, {"a": 0.1, "b": 0.1}).groupBy("split").count().collect()
        }
        # b absorbs the undeclared 0.8 remainder
        assert got["b"] > got["a"]
        assert sum(got.values()) == 1000


class TestBoilerplateLines:
    def test_threshold_and_whitespace_semantics(self, spark):
        from denormalized_spark.operators.curation import remove_boilerplate_lines

        boiler = "all rights reserved"
        rows = [
            (i, f"unique body {i}\n{boiler}\n\n  trailing {i}") for i in range(6)
        ] + [(99, "no footer here\nrare line")]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r.doc_id: r.clean_text
            for r in remove_boilerplate_lines(df, min_docs=5).collect()
        }
        for i in range(6):
            # boilerplate stripped; empty line and unique lines kept
            assert out[i] == f"unique body {i}\n\n  trailing {i}"
        assert out[99] == "no footer here\nrare line"  # below threshold

    def test_no_boilerplate_is_identity(self, spark):
        from denormalized_spark.operators.curation import remove_boilerplate_lines

        df = spark.createDataFrame(
            [(1, "a\nb"), (2, "c\nd")], ["doc_id", "text"]
        )
        out = remove_boilerplate_lines(df, min_docs=2).collect()
        assert all(r.clean_text == r.text for r in out)

    def test_cap_bounds_broadcast_deterministically(self, spark):
        from denormalized_spark.operators.curation import remove_boilerplate_lines

        # two boilerplate lines, cap keeps only the most frequent
        rows = [(i, "common both\nsecond footer") for i in range(10)] + [
            (i, "common both") for i in range(10, 15)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            r.doc_id: r.clean_text
            for r in remove_boilerplate_lines(
                df, min_docs=5, max_boilerplate_lines=1
            ).collect()
        }
        assert out[0] == "second footer"  # only the capped winner removed
        assert out[10] == ""


class TestValidateCorpus:
    def test_rules_and_null_profile(self, spark):
        from denormalized_spark.operators.curation import validate_corpus

        df = spark.createDataFrame(
            [(1, "hello world"), (2, ""), (3, None)], "id long, text string"
        )
        out = {
            r.rule: (r.n_rows, r.n_violations, r.pass_rate)
            for r in validate_corpus(
                df, {"nonempty": F.length("text") > 0}
            ).collect()
        }
        # NULL text: the rule evaluates to NULL -> counted as violation
        assert out["nonempty"] == (3, 2, round(1 / 3, 6))
        assert out["null__text"] == (3, 1, round(2 / 3, 6))
        assert out["null__id"] == (3, 0, 1.0)

    def test_single_scan_plan(self, spark):
        """The scale contract: all rules evaluate in ONE aggregation —
        exactly one scan of the source in the physical plan."""
        from denormalized_spark.operators.curation import validate_corpus

        df = spark.range(100).selectExpr("id", "cast(id as string) AS s")
        out = validate_corpus(
            df,
            {"a": F.col("id") >= 0, "b": F.length("s") > 0, "c": F.col("id") < 50},
            include_null_profile=False,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Range (0, 100") == 1


class TestBloomPrefilter:
    """Bloom-gated decontamination (the 100 TB explode-avoidance
    path): the gate may only ADD candidates (false positives are
    re-checked exactly), never drop one — gated output must equal the
    ungated output bit-for-bit."""

    def test_gated_equals_ungated(self, spark):
        from denormalized_spark.operators import curation

        rows = []
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        words = base.split()
        for i in range(120):
            # every doc: a rotated window over a tiny vocab → frequent
            # real overlaps AND high bloom-collision pressure
            txt = " ".join(words[(i + j) % len(words)] for j in range(7))
            rows.append((i, txt + f" unique{i}"))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        corpus = df.filter("doc_id % 10 != 3")
        bench = df.filter("doc_id % 10 = 3")
        for bits in (1 << 10, 1 << 14):  # small table = many collisions
            gated = {
                r.doc_id
                for r in curation.decontaminate(
                    corpus, bench, n=3, prefilter_bits=bits
                ).collect()
            }
            ungated = {
                r.doc_id
                for r in curation.decontaminate(
                    corpus, bench, n=3, prefilter_bits=None
                ).collect()
            }
            assert gated == ungated

    def test_gate_is_superset_of_contaminated(self, spark):
        """Bloom candidates ⊇ truly contaminated docs (no false
        negatives) and the bitmap actually prunes clean docs."""
        from denormalized_spark.operators import curation
        from denormalized_spark.operators.curation import (
            _bench_gram_bloom,
            _bloom_hit,
        )
        from denormalized_spark.operators.dedup import shingle_hashes

        clean_rows = [(i, f"doc{i} private words q{i} r{i} s{i} t{i}") for i in range(50)]
        dirty_rows = [(100 + i, "shared secret phrase canary token here") for i in range(5)]
        bench_rows = [(999, "the shared secret phrase canary token here indeed")]
        corpus = spark.createDataFrame(clean_rows + dirty_rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        bits = 1 << 16
        bench_grams = bench.select(
            F.explode(shingle_hashes("text", 3)).alias("gram")
        ).distinct()
        bloom = _bench_gram_bloom(bench_grams, bits, 3)
        cand = (
            corpus.join(F.broadcast(bloom))
            .filter(_bloom_hit(F.col("_bm"), shingle_hashes("text", 3), bits, 3))
        )
        cand_ids = {r.doc_id for r in cand.select("doc_id").collect()}
        assert {100, 101, 102, 103, 104} <= cand_ids
        assert len(cand_ids) < 55, "bloom pruned nothing"
        # and the end-to-end operator drops exactly the dirty docs
        kept = {
            r.doc_id
            for r in curation.decontaminate(
                corpus, bench, n=3, prefilter_bits=bits
            ).collect()
        }
        assert kept == {i for i in range(50)}


class TestMixtureSolve:
    def test_budget_math_and_binding_stratum(self, spark):
        from denormalized_spark.operators.curation import mixture_solve

        # src a: 1000 tokens, b: 100 tokens; weights 50/50 → binding
        # stratum is b: T = 200, a's rate = 100/1000, b's rate = 1.0
        rows = [(i, "a", "w " * 10) for i in range(100)] + [
            (1000 + i, "b", "w " * 10) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        sampled, rates = mixture_solve(df, {"a": 0.5, "b": 0.5})
        r = {x.source: x for x in rates.collect()}
        assert r["a"].available_tokens == 1000 and r["b"].available_tokens == 100
        assert abs(r["a"].rate - 0.1) < 1e-9 and r["b"].rate == 1.0
        assert r["a"].target_tokens == 100 and r["b"].target_tokens == 100
        got = sampled.groupBy("source").count().collect()
        by = {x.source: x["count"] for x in got}
        # b fully kept; a down-sampled (deterministic, so exact count
        # is fixed across runs — just assert the binding contract)
        assert by.get("b") == 10 and 0 < by.get("a", 0) < 100

    def test_strata_without_weights_are_dropped(self, spark):
        from denormalized_spark.operators.curation import mixture_solve

        df = spark.createDataFrame(
            [(1, "a", "x y"), (2, "zzz", "x y")],
            "doc_id long, source string, text string",
        )
        sampled, rates = mixture_solve(df, {"a": 1.0})
        assert {r.source for r in rates.collect()} == {"a"}
        assert {r.source for r in sampled.collect()} <= {"a"}


class TestDuplicatedNgramRate:
    def test_rates(self, spark):
        from denormalized_spark.operators.dedup import duplicated_ngram_rate

        rows = [
            (1, "a b c d e"),        # shares all grams with doc 2
            (2, "a b c d e"),
            (3, "p q r s t"),        # fully unique
            (4, "a b c x y z"),      # shares 'a b c' only
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in duplicated_ngram_rate(df, n=3).collect()}
        assert got[1].n_grams == 3 and got[1].n_shared == 3
        assert got[1].dup_gram_rate == 1.0
        assert got[3].n_shared == 0 and got[3].dup_gram_rate == 0.0
        assert got[4].n_grams == 4 and got[4].n_shared == 1
        assert got[4].dup_gram_rate == 0.25


class TestGramNovelty:
    def test_novelty_by_arrival_order(self, spark):
        from denormalized_spark.operators.dedup import gram_novelty

        rows = [
            (1, "a b c d"),        # grams abc, bcd — both first here
            (2, "a b c d"),        # exact re-crawl: nothing novel
            (3, "a b c x y z"),    # abc seen; bcx, cxy, xyz new
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in gram_novelty(df, n=3).collect()}
        assert got[1].n_grams == 2 and got[1].n_novel == 2
        assert got[1].novelty_rate == 1.0
        assert got[2].n_grams == 2 and got[2].n_novel == 0
        assert got[2].novelty_rate == 0.0
        assert got[3].n_grams == 4 and got[3].n_novel == 3
        assert got[3].novelty_rate == 0.75
        # conservation: every distinct gram has exactly one owner
        assert sum(r.n_novel for r in got.values()) == 5


# ---------------------------------------------------------------------------
# round 5: corpus data card
# ---------------------------------------------------------------------------


def test_corpus_report_levels_and_dup_rate(spark):
    """Grouping-sets report: per-lang, per-source, and grand-total rows
    with consistent counts; exact dups counted via content key."""
    from denormalized_spark.operators.curation import corpus_report

    dup_text = "the same exact document body appears twice in this corpus"
    rows = [
        (1, dup_text, "en", "web"),
        (2, dup_text, "en", "web"),
        (3, "a unique document with its own words and shape", "en", "books"),
        (4, "un documento completamente distinto de los demas", "es", "web"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = corpus_report(df, ["lang", "source"]).collect()
    total = [r for r in out if r["grouping_level"] == 3]
    assert len(total) == 1 and total[0]["n_docs"] == 4
    assert total[0]["dup_rate"] == 0.5  # docs 1+2 are the dup pair
    by_lang = {r["lang"]: r for r in out if r["grouping_level"] == 1}
    assert by_lang["en"]["n_docs"] == 3 and by_lang["es"]["n_docs"] == 1
    by_src = {r["source"]: r for r in out if r["grouping_level"] == 2}
    assert by_src["web"]["n_docs"] == 3 and by_src["books"]["n_docs"] == 1
    # level counts are consistent: lang rows and source rows each sum to 4
    assert sum(r["n_docs"] for r in by_lang.values()) == 4
    assert sum(r["n_docs"] for r in by_src.values()) == 4


def test_dedup_document_lines_keep_first(spark):
    """Duplicate trimmed lines drop (keep-first); whitespace-only
    lines always survive; later distinct lines are untouched."""
    from denormalized_spark.operators.curation import dedup_document_lines

    text = "alpha\nbeta\n  alpha  \n\nbeta\ngamma 3"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = dedup_document_lines(df).collect()[0]["clean_text"]
    # '  alpha  ' trims to a repeat of line 1 -> dropped; '' kept;
    # trailing digit must survive (regression: index-as-trimStr bug)
    assert got == "alpha\nbeta\n\ngamma 3"


def test_group_aware_split_never_crosses_clusters(spark):
    """The invariant curation_split_leakage audits: with group_col set
    to the near-dup cluster label, both members of every pair land in
    the same split, for any weights/seed; the naive per-doc split
    splits at least one crafted pair across the boundary."""
    from denormalized_spark.operators.curation import split_assign

    # 40 two-doc clusters: ids (2k, 2k+1) share cluster label 2k
    rows = [(i, i - (i % 2)) for i in range(80)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    grouped = split_assign(df, {"train": 0.5, "val": 0.5}, group_col="grp")
    naive = split_assign(df, {"train": 0.5, "val": 0.5})
    g = {r["doc_id"]: r["split"] for r in grouped.collect()}
    n = {r["doc_id"]: r["split"] for r in naive.collect()}
    assert all(g[2 * k] == g[2 * k + 1] for k in range(40))
    assert any(n[2 * k] != n[2 * k + 1] for k in range(40))


def test_chunk_dup_rate_detects_recycled_blocks(spark):
    """A doc assembled from another doc's chunks scores high even
    though whole-doc hashes differ; a fresh doc scores 0. Chunks are
    32 disjoint tokens, so build texts with exact 32-token blocks."""
    from denormalized_spark.operators.curation import chunk_documents
    from pyspark.sql import functions as F

    block_a = " ".join(f"a{i}" for i in range(32))
    block_b = " ".join(f"b{i}" for i in range(32))
    block_c = " ".join(f"c{i}" for i in range(32))
    rows = [
        (1, f"{block_a} {block_b}"),       # original
        (2, f"{block_b} {block_a}"),       # recycled, reordered: 2/2 shared
        (3, f"{block_c}"),                 # fresh: 0 shared
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    chunks = chunk_documents(df, chunk_tokens=32, keep_text=False).select(
        "doc_id", F.col("chunk_hash").alias("h")
    )
    hc = chunks.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
    got = {
        r["doc_id"]: r
        for r in chunks.join(hc, "h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("s"),
        )
        .collect()
    }
    assert got[1]["s"] == 2 and got[2]["s"] == 2
    assert got[3]["s"] == 0


def test_bloom_prefilter_non_multiple_of_64_bits(spark):
    """prefilter_bits not divisible by 64 must still honor the
    no-false-negatives guarantee (the raw value would leave a ragged
    bitmap tail whose probes drop): results equal the ungated path."""
    from denormalized_spark.operators.curation import decontaminate

    corpus = spark.createDataFrame(
        [(i, f"unique doc {i} alpha beta gamma delta {i}") for i in range(20)]
        + [(100, "the secret benchmark sentence appears right here today")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(0, "the secret benchmark sentence appears right here today")],
        ["doc_id", "text"],
    )
    plain = {r["doc_id"] for r in decontaminate(corpus, bench, n=5).collect()}
    for bits in (1000, 100_001):
        gated = {
            r["doc_id"]
            for r in decontaminate(
                corpus, bench, n=5, prefilter_bits=bits
            ).collect()
        }
        assert gated == plain
        assert 100 not in gated


def test_mixture_solve_empty_weighted_stratum_forces_zero_budget(spark):
    """A weighted stratum with no corpus rows makes the requested mix
    unsatisfiable: T = 0, every rate 0, nothing sampled — instead of
    silently dropping the constraint and over-reporting the plan."""
    from denormalized_spark.operators.curation import mixture_solve

    df = spark.createDataFrame(
        [(1, "web", "alpha beta gamma delta"), (2, "web", "epsilon zeta eta theta")],
        ["doc_id", "source", "text"],
    )
    sampled, rates = mixture_solve(df, {"web": 0.5, "books": 0.5})
    r = {row["source"]: row for row in rates.collect()}
    assert set(r) == {"web", "books"}
    assert r["books"]["available_tokens"] == 0 and r["books"]["rate"] == 0.0
    assert r["web"]["rate"] == 0.0 and r["web"]["target_tokens"] == 0
    assert sampled.count() == 0


class TestSampleNPerGroup:
    def test_exact_n_per_group_and_deterministic(self, spark):
        from denormalized_spark.operators.curation import sample_n_per_group

        rows = [(i, f"src{i % 3}") for i in range(90)]
        df = spark.createDataFrame(rows, ["doc_id", "source"])
        s1 = sample_n_per_group(df, 5, group_col="source")
        s2 = sample_n_per_group(df.repartition(7), 5, group_col="source")
        got1 = sorted((r["source"], r["doc_id"]) for r in s1.collect())
        got2 = sorted((r["source"], r["doc_id"]) for r in s2.collect())
        assert got1 == got2  # partitioning-independent
        from collections import Counter

        counts = Counter(s for s, _ in got1)
        assert counts == {"src0": 5, "src1": 5, "src2": 5}

    def test_append_stability(self, spark):
        """Reservoir property: appending rows can only DISPLACE
        members (new row ranks into the top-n), never reshuffle the
        survivors among the old rows."""
        from denormalized_spark.operators.curation import sample_n_per_group

        old = spark.createDataFrame(
            [(i, "s") for i in range(40)], ["doc_id", "source"]
        )
        new = spark.createDataFrame(
            [(100 + i, "s") for i in range(10)], ["doc_id", "source"]
        )
        before = {r["doc_id"] for r in sample_n_per_group(old, 8, "source").collect()}
        after = {
            r["doc_id"]
            for r in sample_n_per_group(old.union(new), 8, "source").collect()
        }
        # every survivor among the OLD ids was already in the sample
        assert (after - set(range(100, 110))) <= before


class TestImportanceWeights:
    """DSIR-style hashed-unigram importance weights: target-like docs
    score positive, arithmetic is exact integer micro-nats matching a
    Python replay (the portability contract the oracle relies on)."""

    _DOCS = [
        (1, "alpha alpha beta", True),
        (2, "alpha alpha alpha", True),
        (3, "gamma gamma delta", False),
        (4, "gamma delta delta", False),
        (5, "epsilon gamma", False),
    ]  # no bucket collisions among the 5 tokens at B=64 (35/48/23/56/51)

    def _df(self, spark):
        return spark.createDataFrame(
            self._DOCS, "doc_id long, text string, is_tgt boolean"
        )

    @staticmethod
    def _replay(docs, num_buckets):
        import hashlib
        import math
        from collections import Counter

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % num_buckets

        raw, tgt = Counter(), Counter()
        for _, text, is_tgt in docs:
            for tok in text.split():
                b = bucket(tok)
                raw[b] += 1
                if is_tgt:
                    tgt[b] += 1
        rt, tt = sum(raw.values()), sum(tgt.values())
        w = {
            b: math.floor(
                (
                    math.log((tgt[b] + 1) / (tt + num_buckets))
                    - math.log((raw[b] + 1) / (rt + num_buckets))
                )
                * 1e6
                + 0.5
            )
            for b in raw
        }
        return {
            doc_id: sum(w[bucket(tok)] for tok in text.split())
            for doc_id, text, _ in docs
        }

    def test_exact_micros_match_python_replay(self, spark):
        from denormalized_spark.operators.curation import importance_weights
        from pyspark.sql import functions as F

        out = importance_weights(
            self._df(spark), target=F.col("is_tgt"), num_buckets=64
        )
        got = {r["doc_id"]: r["weight_micros"] for r in out.collect()}
        assert got == self._replay(self._DOCS, 64)

    def test_kept_separates_target_like_docs(self, spark):
        from denormalized_spark.operators.curation import importance_weights
        from pyspark.sql import functions as F

        out = importance_weights(
            self._df(spark), target=F.col("is_tgt"), num_buckets=64
        )
        kept = {r["doc_id"]: r["kept"] for r in out.collect()}
        # alpha-heavy docs look like the target; gamma/delta docs don't
        assert kept[1] and kept[2]
        assert not kept[3] and not kept[4]

    def test_precomputed_weights_score_new_docs(self, spark):
        from denormalized_spark.operators.curation import (
            dsir_bucket_weights,
            importance_weights,
        )
        from pyspark.sql import functions as F

        fit = dsir_bucket_weights(
            self._df(spark), target=F.col("is_tgt"), num_buckets=64
        )
        new = spark.createDataFrame(
            [(100, "alpha beta gamma")], "doc_id long, text string"
        )
        out = importance_weights(new, weights=fit, num_buckets=64)
        row = out.collect()[0]
        replay = self._replay(self._DOCS + [(100, "alpha beta gamma", False)], 64)
        # replay refit includes doc 100 in the counts; instead rebuild
        # the expected sum from the FIT corpus weights only
        import hashlib
        import math
        from collections import Counter

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 64

        raw, tgt = Counter(), Counter()
        for _, text, is_tgt in self._DOCS:
            for tok in text.split():
                b = bucket(tok)
                raw[b] += 1
                if is_tgt:
                    tgt[b] += 1
        rt, tt = sum(raw.values()), sum(tgt.values())
        exp = sum(
            math.floor(
                (
                    math.log((tgt[bucket(tok)] + 1) / (tt + 64))
                    - math.log((raw[bucket(tok)] + 1) / (rt + 64))
                )
                * 1e6
                + 0.5
            )
            for tok in "alpha beta gamma".split()
        )
        assert row["weight_micros"] == exp and row["n_tokens"] == 3

    def test_requires_target_or_weights(self, spark):
        import pytest as _pytest

        from denormalized_spark.operators.curation import importance_weights

        with _pytest.raises(ValueError):
            importance_weights(self._df(spark))


class TestImportanceResample:
    """Gumbel-top-k DSIR resampling: exact key replay, without-
    replacement fixed-size output, weight-proportional bias, and the
    fit-on-sample/resample-shards deployment path."""

    def _corpus(self, spark, n=120):
        # even ids look like the target (alpha/beta vocab), odd don't
        rows = [
            (
                i,
                "alpha beta alpha" if i % 2 == 0 else "gamma delta delta",
                i % 2 == 0,
            )
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")

    def test_fixed_size_without_replacement(self, spark):
        from denormalized_spark.operators.curation import importance_resample
        from pyspark.sql import functions as F

        out = importance_resample(
            self._corpus(spark), n=30, target=F.col("is_tgt"), num_buckets=64
        ).collect()
        ids = [r["doc_id"] for r in out]
        assert len(ids) == 30 and len(set(ids)) == 30

    def test_key_matches_python_replay(self, spark):
        import hashlib
        import math

        from denormalized_spark.operators.curation import importance_resample
        from pyspark.sql import functions as F

        df = self._corpus(spark, n=40)
        out = importance_resample(
            df, n=40, target=F.col("is_tgt"), num_buckets=64, seed="t-rs"
        ).collect()
        for r in out:
            m = int(
                hashlib.md5(f"t-rs{r['doc_id']}".encode()).hexdigest()[:8], 16
            )
            g = math.floor(-math.log(-math.log((m + 0.5) / 2**32)) * 1e6 + 0.5)
            assert r["key_micros"] == r["weight_micros"] + g

    def test_bias_toward_high_weight_docs(self, spark):
        from denormalized_spark.operators.curation import importance_resample
        from pyspark.sql import functions as F

        out = importance_resample(
            self._corpus(spark), n=30, target=F.col("is_tgt"), num_buckets=64
        ).collect()
        n_target = sum(1 for r in out if r["doc_id"] % 2 == 0)
        # target-like docs carry strongly positive llr sums; with 60/60
        # available the 30 picks should be overwhelmingly target-like
        assert n_target >= 25

    def test_resample_with_prefit_weights_matches_inline_fit(self, spark):
        from denormalized_spark.operators.curation import (
            dsir_bucket_weights,
            importance_resample,
        )
        from pyspark.sql import functions as F

        df = self._corpus(spark)
        fit = dsir_bucket_weights(df, target=F.col("is_tgt"), num_buckets=64)
        a = importance_resample(df, n=20, weights=fit, num_buckets=64).collect()
        b = importance_resample(
            df, n=20, target=F.col("is_tgt"), num_buckets=64
        ).collect()
        key = lambda rs: sorted((r["doc_id"], r["key_micros"]) for r in rs)
        assert key(a) == key(b)

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.curation import importance_resample
        from pyspark.sql import functions as F

        df = self._corpus(spark)
        a = importance_resample(df, n=25, target=F.col("is_tgt"), num_buckets=64)
        b = importance_resample(
            df.repartition(17), n=25, target=F.col("is_tgt"), num_buckets=64
        )
        assert sorted(r["doc_id"] for r in a.collect()) == sorted(
            r["doc_id"] for r in b.collect()
        )


class TestWeightedSampleNPerGroup:
    def _df(self, spark):
        rows = [(i, f"g{i % 2}", 10 if i < 40 else 1000) for i in range(80)]
        return spark.createDataFrame(rows, "doc_id long, source string, w long")

    def test_exact_n_and_weight_bias(self, spark):
        from denormalized_spark.operators.curation import weighted_sample_n_per_group

        out = weighted_sample_n_per_group(
            self._df(spark), n=10, weight="w", group_col="source"
        ).collect()
        per = {}
        for r in out:
            per.setdefault(r["source"], []).append(r["doc_id"])
        assert all(len(v) == 10 and len(set(v)) == 10 for v in per.values())
        # heavy docs (w=1000, ids >= 40) dominate: ln(1000)-ln(10) = 4.6 nats
        # vs Gumbel noise, so expect a strong majority
        heavy = sum(1 for r in out if r["doc_id"] >= 40)
        assert heavy >= 16

    def test_key_matches_python_replay(self, spark):
        import hashlib
        import math

        from denormalized_spark.operators.curation import weighted_sample_n_per_group

        df = self._df(spark)
        out = weighted_sample_n_per_group(
            df, n=40, weight="w", group_col="source", seed="t-w"
        ).collect()

        def key(doc_id, w):
            m = int(hashlib.md5(f"t-w{doc_id}".encode()).hexdigest()[:8], 16)
            g = math.floor(-math.log(-math.log((m + 0.5) / 2**32)) * 1e6 + 0.5)
            return math.floor(math.log(w) * 1e6 + 0.5) + g

        rows = [(i, f"g{i % 2}", 10 if i < 40 else 1000) for i in range(80)]
        exp = {}
        for i, g, w in rows:
            exp.setdefault(g, []).append((key(i, w), -i))
        want = {
            g: sorted(i for _, i in sorted(v, reverse=True)[:40])
            for g, v in ((g, [(k, -i) for k, i in v]) for g, v in exp.items())
        }
        got = {}
        for r in out:
            got.setdefault(r["source"], []).append(r["doc_id"])
        got = {g: sorted(v) for g, v in got.items()}
        # n=40 >= group size: everything positive-weight survives
        assert got == {g: sorted(i for i in range(80) if f"g{i % 2}" == g) for g in got}

    def test_nonpositive_weights_dropped(self, spark):
        from denormalized_spark.operators.curation import weighted_sample_n_per_group

        df = spark.createDataFrame(
            [(1, "g", 5), (2, "g", 0), (3, "g", -1), (4, "g", None)],
            "doc_id long, source string, w int",
        )
        out = weighted_sample_n_per_group(df, n=10, weight="w", group_col="source")
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.curation import weighted_sample_n_per_group

        df = self._df(spark)
        a = weighted_sample_n_per_group(df, n=7, weight="w", group_col="source")
        b = weighted_sample_n_per_group(
            df.repartition(9), n=7, weight="w", group_col="source"
        )
        key = lambda d: sorted((r["source"], r["doc_id"]) for r in d.collect())
        assert key(a) == key(b)


class TestWinsorize:
    def test_clamps_tails_preserves_rows(self, spark):
        from denormalized_spark.operators.curation import winsorize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 101)], "id long, v double"
        )
        out = winsorize(df, "v", 0.10, 0.90).collect()
        assert len(out) == 100
        lo = out[0].winsor_lo
        hi = out[0].winsor_hi
        # percentile(0.1) of 1..100 = 10.9 (linear interpolation)
        assert abs(lo - 10.9) < 1e-9 and abs(hi - 90.1) < 1e-9
        got = {r.id: r.v_winsor for r in out}
        assert got[1] == lo and got[100] == hi  # tails clamp
        assert got[50] == 50.0  # interior untouched

    def test_rejects_bad_percentiles(self, spark):
        import pytest

        from denormalized_spark.operators.curation import winsorize

        df = spark.createDataFrame([(1, 1.0)], "id long, v double")
        with pytest.raises(ValueError, match="p_lo"):
            winsorize(df, "v", 0.9, 0.1)


class TestRankNormalize:
    def test_uniform_quantiles_and_tiebreak(self, spark):
        from denormalized_spark.operators.curation import rank_normalize

        df = spark.createDataFrame(
            [(1, 5.0), (2, 5.0), (3, 1.0), (4, 9.0)], "id long, v double"
        )
        got = {r.id: (r.rank, r.quantile_micro)
               for r in rank_normalize(df, "v", "id").collect()}
        # total order (v, id): 3 < 1 < 2 < 4; quantile = rank/5
        assert got == {3: (1, 200_000), 1: (2, 400_000),
                       2: (3, 600_000), 4: (4, 800_000)}

    def test_partitioning_invariant(self, spark):
        from denormalized_spark.operators.curation import rank_normalize

        df = spark.createDataFrame(
            [(i, float((i * 37) % 101)) for i in range(200)], "id long, v double"
        )
        key = lambda d: sorted((r.id, r.rank, r.quantile_micro) for r in d.collect())
        assert key(rank_normalize(df, "v", "id")) == key(
            rank_normalize(df.repartition(9), "v", "id")
        )


def test_temperature_mixture_upweights_small_strata(spark):
    """alpha=0.5 lifts low-resource strata: the small stratum's boost
    exceeds 1000 milli, the dominant one's sits below; shares sum to
    ~1e6; non-dyadic alpha is rejected."""
    import pytest

    from denormalized_spark.operators.curation import temperature_mixture

    rows = [("big", i) for i in range(900)] + [("small", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, x long")
    got = {r.stratum: r for r in temperature_mixture(df, "source").collect()}
    assert got["small"].boost_milli > 1000 > got["big"].boost_milli
    assert abs(got["big"].share_micro + got["small"].share_micro - 1_000_000) <= 1
    assert (
        abs(got["big"].temp_share_micro + got["small"].temp_share_micro - 1_000_000)
        <= 1
    )
    with pytest.raises(ValueError):
        temperature_mixture(df, "source", alpha_num=1, alpha_den=3)


def test_mixture_divergence_tv_and_missing_strata(spark):
    """Uniform 2-strata corpus vs a 75/25 target: TV = 0.25 (each
    side contributes |0.5-0.75|/2 = 0.125); a target stratum absent
    from the corpus appears with observed 0, and an untargeted
    stratum contributes its whole observed mass."""
    from denormalized_spark.operators.curation import mixture_divergence

    rows = [("a", i) for i in range(50)] + [("b", i) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, x long")
    got = {
        r.stratum: r
        for r in mixture_divergence(
            df, {"a": 0.75, "b": 0.25, "ghost": 0.0}, "source"
        ).collect()
    }
    assert got["a"].tv_contrib_micro == 125_000
    assert got["b"].tv_contrib_micro == 125_000
    assert got["ghost"].n == 0 and got["ghost"].obs_share_micro == 0
    # untargeted stratum: whole mass is divergence
    got2 = {
        r.stratum: r
        for r in mixture_divergence(df, {"a": 1.0}, "source").collect()
    }
    assert got2["b"].target_share_micro == 0
    assert got2["b"].tv_contrib_micro == 250_000


def test_span_corruption_deterministic_and_bounded(spark):
    """Masks are md5-deterministic (rerun-identical), coverage is
    within [n_starts, n_starts*max_span], and the zero-token doc is
    all zeros."""
    import hashlib

    from denormalized_spark.operators.curation import span_corruption_plan

    df = spark.createDataFrame(
        [(1, "w " * 200), (2, "")], "doc_id long, text string"
    )
    a = {r.doc_id: r for r in span_corruption_plan(df).collect()}
    b = {r.doc_id: r for r in span_corruption_plan(df).collect()}
    assert a == b
    r = a[1]
    assert r.n_tokens == 200
    assert r.n_starts >= 1
    assert r.n_starts <= r.n_masked <= r.n_starts * 5
    # python mirror of the start draw
    exp_starts = sum(
        1 for j in range(1, 201)
        if int(hashlib.md5(f"scs:1:{j}".encode()).hexdigest()[:8], 16) / 2**32 < 0.05
    )
    assert r.n_starts == exp_starts
    assert (a[2].n_tokens, a[2].n_masked, a[2].mask_rate_milli) == (0, 0, 0)


def test_neyman_allocation_hand_computed(spark):
    """Two strata, one with zero variance: all non-base seats go to
    the variable stratum; allocations sum to the budget exactly."""
    from denormalized_spark.operators.curation import neyman_allocation

    rows = [("a", 10), ("a", 20), ("a", 30)] + [("b", 5), ("b", 5), ("b", 5)]
    df = spark.createDataFrame(rows, "s string, y long")
    out = {r.stratum: r for r in neyman_allocation(df, "s", "y", 10).collect()}
    # stratum a: sigma = 10 exactly -> w = 3*10e6; b: sigma 0 -> w 0
    assert out["a"].sigma_micro == 10_000_000
    assert out["b"].sigma_micro == 0
    assert out["a"].alloc == 10 and out["b"].alloc == 0
    assert sum(r.alloc for r in out.values()) == 10


def test_neyman_largest_remainder_sums_to_budget(spark):
    from denormalized_spark.operators.curation import neyman_allocation

    rows = []
    for s, ys in [("a", [1, 9]), ("b", [2, 8]), ("c", [3, 7])]:
        rows += [(s, y) for y in ys]
    df = spark.createDataFrame(rows, "s string, y long")
    out = neyman_allocation(df, "s", "y", 7).collect()
    assert sum(r.alloc for r in out) == 7
    assert all(r.alloc >= 0 for r in out)


def test_softdedup_weights_cluster_and_singleton(spark):
    from denormalized_spark.operators.curation import softdedup_weights

    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, label long"
    )
    out = {r.doc_id: r for r in softdedup_weights(docs, comp).collect()}
    assert out[1].cluster_size == 3 and out[1].weight_milli == 333
    assert out[4].cluster_size == 1 and out[4].weight_milli == 1000
    # unit-mass property: the triplicate cluster contributes ~1 total
    assert sum(out[i].weight_milli for i in (1, 2, 3)) == 999


def test_neyman_all_zero_variance_falls_back_proportional(spark):
    """Every stratum constant (sigma 0 for all, so total weight 0):
    allocation falls back to proportional-to-size instead of NULL
    (r13 advisor edge), and still sums to the budget exactly."""
    from denormalized_spark.operators.curation import neyman_allocation

    rows = [("a", 5)] * 6 + [("b", 7)] * 3 + [("c", 2)] * 1
    df = spark.createDataFrame(rows, "s string, y long")
    out = {r.stratum: r for r in neyman_allocation(df, "s", "y", 10).collect()}
    assert all(r.w_micro == 0 for r in out.values())
    assert out["a"].alloc == 6 and out["b"].alloc == 3 and out["c"].alloc == 1
    assert sum(r.alloc for r in out.values()) == 10
