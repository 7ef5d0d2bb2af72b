"""Property-based tests (hypothesis): the custom operators against
independent reference implementations (pandas merge_asof, brute-force
loops) on adversarial small inputs — duplicate timestamps, empty
sides, singleton keys, boundary gaps."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from denormalized_spark.operators.temporal import asof_join, range_join
from denormalized_spark.streaming.stateful import sessionize_batch

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=50)


@given(
    lefts=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
    rights=st.dictionaries(st.tuples(keys, times), st.integers(0, 99), max_size=12),
)
@settings(**SETTINGS)
def test_asof_matches_pandas_merge_asof(spark, lefts, rights):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)] or [(99, -1, -1)],
        "k long, t long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(98, -2, -2)],
        "k long, rt long, rv long",
    )
    got = {
        (r.k, r.t, r.lid): (r.rv, r.matched_time)
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="rt", right_cols=["rv"]
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)] or [(99, -1, -1)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(98, -2, -2)],
        columns=["k", "rt", "rv"],
    ).sort_values("rt", kind="stable")
    exp = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction="backward"
    )
    expected = {
        (int(r.k), int(r.t), int(r.lid)): (
            None if pd.isna(r.rv) else int(r.rv),
            None if pd.isna(r.rt) else int(r.rt),
        )
        for r in exp.itertuples()
    }
    assert got == expected


@given(
    lefts=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
    rights=st.dictionaries(st.tuples(keys, times), st.integers(0, 99), max_size=12),
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tolerance=st.one_of(st.none(), st.integers(min_value=0, max_value=10)),
)
@settings(**SETTINGS)
def test_asof_directions_match_pandas(spark, lefts, rights, direction, tolerance):
    """All three directions × optional tolerance against the real
    pandas merge_asof — the parity the nearest tie-backward and the
    tolerance null-out claims rest on. Integer time units; our
    tolerance_ms is ms so ×1000 bridges the unit."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)] or [(99, -1, -1)],
        "k long, t long, lid long",
    )
    rdf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(98, -2, -2)],
        "k long, rt long, rv long",
    )
    got = {
        (r.k, r.t, r.lid): (r.rv, r.matched_time)
        for r in asof_join(
            ldf, rdf, on=["k"], left_time="t", right_time="rt",
            right_cols=["rv"], direction=direction,
            tolerance_ms=None if tolerance is None else tolerance * 1000,
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)] or [(99, -1, -1)],
        columns=["k", "t", "lid"],
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(
        [(k, t, v) for (k, t), v in rights.items()] or [(98, -2, -2)],
        columns=["k", "rt", "rv"],
    ).sort_values("rt", kind="stable")
    exp = pd.merge_asof(
        lp, rp, left_on="t", right_on="rt", by="k", direction=direction,
        tolerance=tolerance,
    )
    expected = {
        (int(r.k), int(r.t), int(r.lid)): (
            None if pd.isna(r.rv) else int(r.rv),
            None if pd.isna(r.rt) else int(r.rt),
        )
        for r in exp.itertuples()
    }
    assert got == expected


@given(
    points=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
    intervals=st.lists(
        st.tuples(keys, times, st.integers(0, 20)), min_size=0, max_size=6
    ),
    bin_width=st.sampled_from([1, 3, 7, 100]),
)
@settings(**SETTINGS)
def test_range_join_matches_brute_force(spark, points, intervals, bin_width):
    pdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)] or [(99, -1, -1)],
        "k long, pt long, pid long",
    )
    ivs = [(k, s, s + length, j) for j, (k, s, length) in enumerate(intervals)]
    idf = spark.createDataFrame(
        ivs or [(98, -5, -4, -1)], "k long, s long, e long, iv long"
    )
    got = {
        (r.pid, r.iv)
        for r in range_join(
            pdf, idf, "pt", "s", "e", on=["k"], bin_width_s=bin_width
        ).collect()
    }
    expected = {
        (pid, iv)
        for pid, (pk, pt) in enumerate(points)
        for (ik, s, e, iv) in ivs
        if pk == ik and s <= pt < e
    }
    assert got == expected


@given(
    events=st.lists(st.tuples(keys, times), min_size=1, max_size=15),
    gap=st.sampled_from([1, 3, 10]),
)
@settings(**SETTINGS)
def test_sessionize_matches_naive(spark, events, gap):
    import datetime

    base = datetime.datetime(2024, 1, 1)

    def at(s):
        return base + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [(k, at(t)) for k, t in events], "k long, ts timestamp"
    )
    got = {
        (r.k, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(df, ["k"], "ts", gap * 1000).collect()
    }

    expected = set()
    by_key: dict = {}
    for k, t in events:
        by_key.setdefault(k, []).append(t)
    for k, ts in by_key.items():
        ts.sort()
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > gap:
                expected.add((k, at(start), at(prev), n))
                start, n = t, 0
            n += 1
            prev = t
        expected.add((k, at(start), at(prev), n))
    assert got == expected


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
@pytest.mark.slow  # brute-force property sweep; fast cover in tests/test_dedup.py
def test_connected_components_matches_union_find(spark, edges):
    from denormalized_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.label for r in connected_components(pairs).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent}
    assert got == expected


# ---------------------------------------------------------------------------
# curation: chunking and packing vs brute-force reimplementations
# ---------------------------------------------------------------------------

words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=20
)


@given(
    docs=st.lists(words, min_size=1, max_size=8),
    chunk=st.integers(min_value=1, max_value=6),
    stride=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_chunking_matches_brute_force(spark, docs, chunk, stride):
    from denormalized_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_id): r.chunk_text
        for r in chunk_documents(df, chunk_tokens=chunk, stride=stride).collect()
    }
    expected = {}
    for i, toks in enumerate(docs):
        for cid, s in enumerate(range(0, len(toks), stride)):
            expected[(i, cid)] = " ".join(toks[s : s + chunk])
    assert got == expected


@given(
    ntoks=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=15),
    seq=st.integers(min_value=1, max_value=16),
)
@settings(**SETTINGS)
def test_packing_matches_brute_force(spark, ntoks, seq):
    from denormalized_spark.operators.curation import pack_documents

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(ntoks)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.token_offset, r.first_seq, r.last_seq)
        for r in pack_documents(df, seq_tokens=seq).collect()
    }
    off = 0
    for i, n in enumerate(ntoks):
        last = (off + n - 1) // seq if n > 0 else off // seq
        assert got[i] == (off, off // seq, last), (i, n, off, seq)
        off += n


_words = st.sampled_from(["a", "bb", "ccc", "dd", "e", "longword"])
_texts = st.lists(_words, min_size=0, max_size=12).map(" ".join)


@given(docs=st.lists(_texts, min_size=1, max_size=8))
@settings(**SETTINGS)
def test_tfidf_matches_brute_force(spark, docs):
    import math

    from denormalized_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {}
    for r in tfidf_top_terms(df, k=3).collect():
        got.setdefault(r.doc_id, []).append((r.rank, r.token, r.tfidf))

    # brute force
    toks = {i: t.split() for i, t in enumerate(docs)}
    n = len(docs)
    dfreq = {}
    for i, ts in toks.items():
        for w in set(ts):
            dfreq[w] = dfreq.get(w, 0) + 1
    for i, ts in toks.items():
        scores = {}
        for w in set(ts):
            scores[w] = round(ts.count(w) * math.log(n / dfreq[w]), 6)
        expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        have = sorted(got.get(i, []))
        assert [w for _, w in sorted(((r, t) for r, t, _ in have))] == [
            w for w, _ in expect
        ], (i, have, expect)
        for (_, tok, score), (ew, es) in zip(
            sorted(have, key=lambda x: x[0]), expect
        ):
            assert tok == ew and abs(score - es) < 1e-9


@given(docs=st.lists(_texts, min_size=1, max_size=8), n=st.sampled_from([2, 3]))
@settings(**SETTINGS)
def test_ngram_repetition_matches_brute_force(spark, docs, n):
    from denormalized_spark.operators.text import ngram_repetition

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.doc_id: r for r in ngram_repetition(df, n).collect()}
    for i, t in enumerate(docs):
        ts = t.split()
        grams = [" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)]
        if not grams:
            assert i not in got
            continue
        counts = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        r = got[i]
        assert r.n_grams == len(grams)
        assert abs(r.top_frac - max(counts.values()) / len(grams)) < 1e-9
        dup = sum(c for c in counts.values() if c > 1)
        assert abs(r.dup_frac - dup / len(grams)) < 1e-9


@given(docs=st.lists(_texts.filter(bool), min_size=1, max_size=6))
@settings(**SETTINGS)
def test_unigram_scores_match_brute_force(spark, docs):
    import math

    from denormalized_spark.operators.text import unigram_logprob_scores

    df = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {r.doc_id: r for r in unigram_logprob_scores(df).collect()}
    vocab = {}
    total = 0
    for t in docs:
        for w in t.split():
            vocab[w] = vocab.get(w, 0) + 1
            total += 1
    for i, t in enumerate(docs):
        ts = t.split()
        exp = sum(math.log(vocab[w] / total) for w in ts) / len(ts)
        assert got[i].n_tokens == len(ts)
        assert abs(got[i].avg_logp - exp) < 1e-6


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),         # group
            st.integers(min_value=-50, max_value=50),      # value
            st.integers(min_value=0, max_value=9),         # weight (0 = no mass)
        ),
        min_size=1,
        max_size=16,
    ),
    pct=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
)
@settings(**SETTINGS)
def test_weighted_percentile_column_matches_bruteforce(spark, data, pct):
    """Column-form approx_percentile_cont_with_weight vs the direct
    definition: smallest value whose cumulative weight (ascending by
    value) reaches pct * total. Integer weights -> exact arithmetic."""
    from denormalized_spark import functions as dnf

    df = spark.createDataFrame(data, "g long, v long, w long")
    got = {
        r.g: r.wp
        for r in df.groupBy("g")
        .agg(dnf.approx_percentile_cont_with_weight("v", "w", pct).alias("wp"))
        .collect()
    }
    for g in {d[0] for d in data}:
        rows = sorted((v, w) for gg, v, w in data if gg == g and w > 0)
        total = sum(w for _, w in rows)
        if total == 0:
            assert got[g] is None
            continue
        cum, expect = 0, None
        for v, w in rows:
            cum += w
            if cum >= pct * total:
                expect = float(v)
                break
        assert got[g] == expect, (g, pct, rows)


@given(
    syms=st.lists(st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=0, max_size=12),
    pair=st.tuples(st.sampled_from(["a", "b", "ab"]), st.sampled_from(["a", "b", "c"])),
)
@settings(**SETTINGS)
def test_merge_adjacent_matches_greedy_python(spark, syms, pair):
    """BPE merge fold vs a plain greedy left-to-right Python loop."""
    from denormalized_spark.operators.text import _merge_adjacent
    from pyspark.sql import functions as F

    a, b = pair
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_merge_adjacent(F.col("syms"), a, b).alias("m")).collect()[0]["m"]

    exp: list[str] = []
    for x in syms:
        if exp and exp[-1] == a and x == b:
            exp[-1] = a + b
        else:
            exp.append(x)
    assert got == exp


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=10).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_containment_matches_set_arithmetic(spark, docs):
    """Containment over explicit candidates vs Python set math on the
    same shingle definition (distinct word 3-grams, short-doc rolling
    fallback)."""
    from denormalized_spark.operators.dedup import containment_pairs, shingle_hashes
    from pyspark.sql import functions as F

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in df.select("doc_id", shingle_hashes("text").alias("sh")).collect()
    }
    cand = spark.createDataFrame(
        [(i, j) for i in range(len(docs)) for j in range(i + 1, len(docs))],
        "id_a long, id_b long",
    )
    got = {
        (r["id_a"], r["id_b"]): (r["containment_a"], r["containment_b"])
        for r in containment_pairs(df, cand).collect()
    }
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            inter = len(sets[i] & sets[j])
            if inter == 0:
                assert (i, j) not in got
            else:
                ca, cb = got[(i, j)]
                assert ca == pytest.approx(inter / len(sets[i]))
                assert cb == pytest.approx(inter / len(sets[j]))


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=2, max_size=8).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_bigram_scores_match_brute_force(spark, docs):
    """Interpolated bigram scorer vs plain Python counting on the
    same corpus (λ=0.7, self-scored so everything is seen)."""
    import math
    from collections import Counter

    from denormalized_spark.operators.text import bigram_logprob_scores

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}

    toks = {i: d.split() for i, d in enumerate(docs)}
    uni = Counter(t for ts in toks.values() for t in ts)
    T = sum(uni.values())
    bi = Counter(
        (ts[j], ts[j + 1]) for ts in toks.values() for j in range(len(ts) - 1)
    )
    ctx = Counter()
    for (w1, _), c in bi.items():
        ctx[w1] += c
    for i, ts in toks.items():
        pairs = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not pairs:
            assert i not in got
            continue
        lps = [
            math.log(0.7 * bi[p] / ctx[p[0]] + 0.3 * uni[p[1]] / T) for p in pairs
        ]
        assert got[i]["n_bigrams"] == len(pairs)
        assert got[i]["avg_logp2"] == pytest.approx(sum(lps) / len(lps), abs=1e-9)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=10).map(" ".join),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_token_entropy_matches_brute_force(spark, docs):
    import math
    from collections import Counter

    from denormalized_spark.operators.text import token_entropy_stats

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in token_entropy_stats(df).collect()}
    for i, d in enumerate(docs):
        c = Counter(d.split())
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        assert got[i]["n_tokens"] == n and got[i]["n_types"] == len(c)
        assert got[i]["entropy"] == pytest.approx(h, abs=1e-12)
