"""Iterative graph algorithms over edge-list DataFrames.

PageRank (Page et al. 1999) is the canonical "joins + aggregations in
a loop" distributed algorithm — the same execution shape as this
repo's k-means (`similarity.kmeans_fit`) and connected components
(`dedup.connected_components`): per iteration, one equi-join of the
rank table against the edge list and one destination-keyed partial
aggregation, plus a 1-row broadcast for the dangling mass. No
vertex-centric framework needed; Catalyst handles it as plain
shuffles, which is exactly how GraphFrames executes it too.

Engine portability: ranks are rounded per iteration (the kmeans
trick), so the whole trajectory is value-checkable against a DuckDB
unrolled-CTE replay despite being float arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    materialize_every: int | None = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """PageRank over an (src, dst) edge list; returns ``(node, rank)``
    with Σrank = 1 (dangling mass redistributed uniformly, the
    standard formulation). Pass ``weight_col`` (positive edge
    weights, e.g. transition counts) for weighted PageRank: each
    source divides its rank ∝ weight instead of uniformly — the
    out-"degree" becomes the source's weight sum and everything else
    is unchanged.

    Scale shape per iteration: one src-keyed equi-join of the n-row
    rank table against the edge list (both shuffle on the same key, so
    AQE reuses the edge exchange across iterations), one dst-keyed
    partial aggregation of contributions, and a 1-row dangling-mass
    broadcast — web-graph PageRank's textbook Spark plan. The node
    count crosses the driver once (a scalar); ``materialize_every``
    lazily localCheckpoints the rank table every N iterations to keep
    lineage flat on long runs, the same k-rows-of-metadata contract
    kmeans_fit uses.

    Per-iteration ``round_digits`` rounding re-synchronizes every
    engine/partitioning to identical ranks, making the ITERATIVE float
    trajectory oracle-checkable (see queries' graph_pagerank_events).
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("_w")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # one scalar to the driver
    outdeg = e.groupBy("src").agg(F.sum("_w").alias("outdeg"))
    ew = e.join(outdeg, "src")
    dangling_nodes = nodes.join(
        outdeg.select(F.col("src").alias("node")), "node", "left_anti"
    )
    ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
    for i in range(iterations):
        contribs = (
            ew.join(ranks, ew.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("_w") / F.col("outdeg")).alias("_s"))
        )
        dang = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang")
        )
        ranks = (
            nodes.join(contribs, nodes.node == contribs.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                F.round(
                    F.lit(damping_complement(damping)) / F.lit(float(n))
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("_s"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    ),
                    round_digits,
                ).alias("rank"),
            )
        )
        if materialize_every and (i + 1) % materialize_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def damping_complement(damping: float) -> float:
    """1 − damping as the double a SQL literal would parse to: plain
    ``1.0 - 0.85`` is 0.15000000000000002 in binary while an oracle's
    ``0.15`` literal is double(0.15) — the decimal re-round makes both
    engines hold the identical constant."""
    return float(round(1.0 - damping, 10))


def hits(
    edges: DataFrame,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    round_digits: int = 9,
    materialize_every: int | None = 4,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) over an (src, dst)
    edge list; returns ``(node, hub, auth)``, each score L1-normalized
    per iteration (the classic presentation normalizes L2; L1 gives
    identical rankings and keeps the normalizer a plain sum — exactly
    the 1-row metadata aggregate the oracle can replay).

    Same execution shape as :func:`pagerank`: each half-step is one
    edge-keyed equi-join + one keyed partial aggregation, plus a
    1-row norm broadcast; per-iteration rounding keeps the float
    trajectory engine-portable. Use on the link graph the reference's
    event-transition matrix induces: hubs = types that lead
    everywhere, authorities = types everything leads to."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    hub = nodes.withColumn("hub", F.lit(1.0))

    def _half(scores, score_col, join_on, out_key, out_col):
        raw = (
            e.join(scores, F.col(join_on) == scores.node)
            .groupBy(out_key)
            .agg(F.sum(score_col).alias("_raw"))
        )
        norm = raw.agg(F.sum("_raw").alias("_norm"))
        return (
            nodes.join(raw, nodes.node == F.col(out_key), "left")
            .crossJoin(F.broadcast(norm))
            .select(
                "node",
                F.round(
                    F.coalesce(F.col("_raw"), F.lit(0.0)) / F.col("_norm"),
                    round_digits,
                ).alias(out_col),
            )
        )

    auth = None
    for i in range(iterations):
        auth = _half(hub, "hub", "src", "dst", "auth")
        hub = _half(auth, "auth", "dst", "src", "hub")
        if materialize_every and (i + 1) % materialize_every == 0:
            auth = auth.localCheckpoint(eager=False)
            hub = hub.localCheckpoint(eager=False)
    if auth is None:  # iterations == 0
        auth = nodes.withColumn("auth", F.lit(1.0))
    return hub.join(auth, "node").select("node", "hub", "auth")
