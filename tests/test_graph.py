"""PageRank: hand-computable geometries, an exact Python replay of
the rounded trajectory, dangling-mass conservation, partitioning
invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from denormalized_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _replay(pairs, iterations, damping=0.85, digits=9):
    nodes = sorted({n for p in pairs for n in p})
    n = len(nodes)
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    tele = float(round(1.0 - damping, 10))
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in pairs:
            contrib[d] += r[s] / out[s]
        dang = sum(r[v] for v in nodes if v not in out)
        r = {
            v: round(tele / n + damping * (contrib[v] + dang / n), digits)
            for v in nodes
        }
    return r


def test_two_node_cycle_is_uniform(spark):
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), iterations=5
        ).collect()
    }
    assert got == {"a": 0.5, "b": 0.5}


def test_matches_python_replay(spark):
    pairs = [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)] + [
        (f"n{i}", f"n{(i + 5) % 17}") for i in range(0, 17, 2)
    ]
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(_edges(spark, pairs), iterations=4).collect()
    }
    assert got == _replay(pairs, 4)


def test_dangling_mass_conserved(spark):
    # b has no out-edges: its mass redistributes, total stays 1
    pairs = [("a", "b"), ("c", "b"), ("c", "a")]
    res = graph.pagerank(_edges(spark, pairs), iterations=6).collect()
    total = sum(r["rank"] for r in res)
    assert total == pytest.approx(1.0, abs=1e-6)
    got = {r["node"]: r["rank"] for r in res}
    assert got == _replay(pairs, 6)
    assert got["b"] > got["a"] > got["c"]  # sink collects, source lowest


def test_zero_iterations_uniform(spark):
    res = graph.pagerank(_edges(spark, [("a", "b"), ("b", "c")]), iterations=0)
    assert {r["rank"] for r in res.collect()} == {1.0 / 3}


def test_partitioning_invariant(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 2) % 23}") for i in range(23)]
    a = graph.pagerank(_edges(spark, pairs), iterations=3).collect()
    b = graph.pagerank(
        _edges(spark, pairs).repartition(13), iterations=3, materialize_every=1
    ).collect()
    key = lambda rs: sorted((r["node"], r["rank"]) for r in rs)
    assert key(a) == key(b)


def test_weighted_matches_python_replay(spark):
    pairs = [("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 2.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(pairs, "src string, dst string, w double")
    got = {
        r["node"]: r["rank"]
        for r in graph.pagerank(df, iterations=5, weight_col="w").collect()
    }
    nodes = ["a", "b", "c"]
    out = {"a": 4.0, "b": 2.0, "c": 1.0}
    r = {v: 1.0 / 3 for v in nodes}
    for _ in range(5):
        contrib = {v: 0.0 for v in nodes}
        for s, d, w in pairs:
            contrib[d] += r[s] * w / out[s]
        r = {v: round(0.15 / 3 + 0.85 * contrib[v], 9) for v in nodes}
    assert got == r
    # weight asymmetry shows: b gets 3x c's share of a's rank
    assert got["b"] > got["c"]


def test_weighted_reduces_to_unweighted_on_unit_weights(spark):
    pairs = [(f"n{i}", f"n{(i * 5 + 1) % 11}") for i in range(11)]
    base = spark.createDataFrame(pairs, "src string, dst string")
    unit = base.withColumn("w", F.lit(1.0))
    a = graph.pagerank(base, iterations=3).collect()
    b = graph.pagerank(unit, iterations=3, weight_col="w").collect()
    key = lambda rs: sorted((r["node"], r["rank"]) for r in rs)
    assert key(a) == key(b)


def test_hits_matches_python_replay(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in graph.hits(_edges(spark, pairs), iterations=3).collect()
    }
    nodes = sorted({n for p in pairs for n in p})
    hub = {v: 1.0 for v in nodes}
    auth = {}
    for _ in range(3):
        raw = {v: 0.0 for v in nodes}
        for s, d in pairs:
            raw[d] += hub[s]
        nm = sum(raw.values())
        auth = {v: round(raw[v] / nm, 9) for v in nodes}
        raw = {v: 0.0 for v in nodes}
        for s, d in pairs:
            raw[s] += auth[d]
        nm = sum(raw.values())
        hub = {v: round(raw[v] / nm, 9) for v in nodes}
    assert got == {v: (hub[v], auth[v]) for v in nodes}
    # c is the authority (3 in-links); a is the top hub (2 out to hubs)
    assert max(got, key=lambda v: got[v][1]) == "c"


@pytest.mark.slow  # stress tier: deep-unroll Catalyst cost, hits covered fast by test_hits_matches_python_replay
def test_hits_scores_sum_to_one(spark):
    pairs = [(f"n{i}", f"n{(i * 3 + 2) % 13}") for i in range(13)]
    res = graph.hits(_edges(spark, pairs), iterations=4).collect()
    assert sum(r["hub"] for r in res) == pytest.approx(1.0, abs=1e-6)
    assert sum(r["auth"] for r in res) == pytest.approx(1.0, abs=1e-6)


@pytest.mark.slow  # stress tier: two full hits builds
def test_hits_partitioning_invariant(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 19}") for i in range(19)]
    a = graph.hits(_edges(spark, pairs), iterations=3).collect()
    b = graph.hits(
        _edges(spark, pairs).repartition(11), iterations=3, materialize_every=1
    ).collect()
    key = lambda rs: sorted((r["node"], r["hub"], r["auth"]) for r in rs)
    assert key(a) == key(b)


class TestTriangles:
    def test_k4_plus_isolated_edge(self, spark):
        """K4 has exactly 4 triangles and 12 wedges (clustering 1.0);
        the isolated edge adds nodes/edges but no wedges."""
        from denormalized_spark.operators.graph import triangle_stats

        edges = spark.createDataFrame(
            [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(10, 11)],
            "u long, v long",
        )
        r = triangle_stats(edges).collect()[0]
        assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (6, 7, 12, 4)
        assert r.clustering_micro == 1_000_000

    def test_triangle_free_star(self, spark):
        """A star K1,4 has C(4,2)=6 wedges and zero triangles."""
        from denormalized_spark.operators.graph import triangle_stats

        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 5)], "u long, v long"
        )
        r = triangle_stats(edges).collect()[0]
        assert (r.n_wedges, r.n_triangles, r.clustering_micro) == (6, 0, 0)

    def test_each_triangle_counted_once_under_skew(self, spark):
        """A hub node in many triangles (fan graph): each triangle is
        counted exactly once despite the shared low/high-degree corner,
        and the count is partitioning-invariant."""
        from denormalized_spark.operators.graph import triangle_stats

        # hub 0 connected to 1..10; rim edges (1,2),(3,4),...,(9,10)
        edges = [(0, i) for i in range(1, 11)] + [
            (i, i + 1) for i in range(1, 10, 2)
        ]
        df = spark.createDataFrame(edges, "u long, v long")
        a = triangle_stats(df).collect()[0]
        b = triangle_stats(df.repartition(7)).collect()[0]
        assert a.n_triangles == b.n_triangles == 5

    def test_covisitation_cap_drops_whole_bucket(self, spark):
        """An item touched by more than the cap contributes NO edges
        (bucket-cap contract: degenerate buckets drop whole)."""
        from denormalized_spark.operators.graph import covisitation_edges

        rows = [(u, "hot") for u in range(10)] + [
            (0, "nich"), (1, "nich"), (2, "nich")
        ]
        df = spark.createDataFrame(rows, "user long, item string")
        got = {
            (r.u, r.v)
            for r in covisitation_edges(
                df, "user", "item", max_users_per_item=5
            ).collect()
        }
        assert got == {(0, 1), (0, 2), (1, 2)}  # only the niche item

    def test_covisitation_duplicate_interactions_collapse(self, spark):
        """Repeat (user, item) interactions count once (distinct
        projection) and edges are distinct across shared items."""
        from denormalized_spark.operators.graph import covisitation_edges

        rows = [(1, "a"), (1, "a"), (2, "a"), (1, "b"), (2, "b")]
        df = spark.createDataFrame(rows, "user long, item string")
        got = [(r.u, r.v) for r in covisitation_edges(df, "user", "item").collect()]
        assert got == [(1, 2)]


@pytest.mark.slow  # stress tier: multi-round peel; operator oracle-covered by graph_kcore_parts
def test_kcore_path_cascade_and_fixpoint(spark):
    """A 6-node path has NO 2-core (peeling cascades from the
    endpoints inward — the case a plain degree>=2 filter gets wrong:
    only the endpoints have degree 1 initially); a triangle with a
    pendant keeps exactly its 3 triangle nodes. Fixed-round peeling
    at sufficient depth equals the fixpoint mode."""
    from denormalized_spark.operators.graph import kcore_peel

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "u long, v long"
    )
    assert kcore_peel(path, 2).count() == 0            # fixpoint
    assert kcore_peel(path, 2, rounds=1).count() > 0   # too shallow: not yet
    assert kcore_peel(path, 2, rounds=5).count() == 0  # deep enough

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "u long, v long"
    )
    got = sorted(r.n for r in kcore_peel(tri, 2).collect())
    assert got == [1, 2, 3]
    unrolled = sorted(
        (r.n, r.core_degree) for r in kcore_peel(tri, 2, rounds=3).collect()
    )
    fix = sorted((r.n, r.core_degree) for r in kcore_peel(tri, 2).collect())
    assert unrolled == fix


def test_item_cf_similarity_hand_cosine(spark):
    """3 users: items A,B co-occur for 2 of them; A appears for all
    3, B for 2 -> cos(A,B) = 2/(sqrt(3)*sqrt(2)) ~ 0.8165. Over-cap
    users drop whole; singleton pairs are killed by min_cocount."""
    from denormalized_spark.operators.graph import item_cf_similarity

    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
    ]
    df = spark.createDataFrame(rows, "u long, it string")
    got = {
        (r.item_a, r.item_b): r
        for r in item_cf_similarity(df, "u", "it", min_cocount=2).collect()
    }
    assert set(got) == {("A", "B")}  # (A,C) cocount 1 -> killed
    ab = got[("A", "B")]
    assert (ab.cocount, ab.n_a, ab.n_b) == (2, 3, 2)
    assert ab.cosine_milli == 816  # 2/sqrt(6) milli-floored
    capped = item_cf_similarity(df, "u", "it", max_items_per_user=1)
    assert capped.count() == 0  # every user over... under min_size=2


def test_label_propagation_barbell(spark):
    """Two triangles joined by one bridge edge: 4 synchronous rounds
    with self-vote + min-label ties converge to one community per
    clique (expectations from the exact Python mirror of the pinned
    tie-break order)."""
    from denormalized_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r.n: r.label for r in label_propagation(df, rounds=4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_label_propagation_validates_rounds(spark):
    import pytest

    from denormalized_spark.operators.graph import label_propagation

    df = spark.createDataFrame([(1, 2)], "u long, v long")
    with pytest.raises(ValueError):
        label_propagation(df, rounds=0)


def test_link_prediction_hand_wedges(spark):
    """Path graph 1-2-3 plus 3-4: non-edges at distance 2 are (1,3)?
    no — (1,3) IS distance 2 via node 2: cn=1, jaccard=1/(1+2-1)=500;
    (2,4) via 3: cn=1, jaccard=1/(2+1-1)=500; (1,4) is distance 3 —
    absent."""
    from denormalized_spark.operators.graph import link_prediction_scores

    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {
        (r.u, r.v): r
        for r in link_prediction_scores(df, min_common=1).collect()
    }
    assert set(got) == {(1, 3), (2, 4)}
    assert got[(1, 3)].common_neighbors == 1
    assert got[(1, 3)].jaccard_milli == 500
    assert got[(2, 4)].jaccard_milli == 500
    assert got[(1, 3)].pref_attachment == 1 * 2


def test_link_prediction_hub_cap_drops_whole(spark):
    """A star hub over cap contributes no wedges at all."""
    from denormalized_spark.operators.graph import link_prediction_scores

    star = [(0, i) for i in range(1, 6)]  # hub 0, degree 5
    df = spark.createDataFrame(star, "u long, v long")
    assert link_prediction_scores(df, max_degree=4, min_common=1).count() == 0
    # under the cap, all leaf pairs become candidates
    out = link_prediction_scores(df, max_degree=5, min_common=1)
    assert out.count() == 10  # C(5,2)


def test_iterative_loop_invariants_checkpointed(spark):
    """pagerank/hits read their loop-invariant tables (edges, nodes,
    out-degrees) from a localCheckpoint instead of re-embedding the
    edge subtree per iteration: the final plan scans materialized
    RDDs, and the values still match the exact Python replay (the
    checkpoint must be semantically inert)."""
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    pr = graph.pagerank(_edges(spark, pairs), iterations=3)
    plan = pr._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    got = {r["node"]: r["rank"] for r in pr.collect()}
    assert got == _replay(pairs, 3)

    ht = graph.hits(_edges(spark, pairs), iterations=2)
    plan = ht._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    rows = {r["node"]: (r["hub"], r["auth"]) for r in ht.collect()}
    assert set(rows) == {"a", "b", "c"}
    for hub, auth in rows.values():
        assert 0.0 <= hub <= 1.0 and 0.0 <= auth <= 1.0
