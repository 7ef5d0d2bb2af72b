"""Similarity search over embedding columns (array<float>).

Two tiers, matching how ANN is actually deployed on Spark:

- ``cosine_topk`` — brute-force scan against one query vector. The
  dot product is ``F.aggregate``/``F.zip_with`` (JVM, codegen'd); the
  top-k is a single ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrderedAndProject — per-partition heaps + driver merge of k
  rows, NOT a full sort. This is the exact plan you want at 100 TB:
  embarrassingly parallel scan, k rows cross the wire per partition.

- ``lsh_bucketed_neighbors`` — random-hyperplane LSH: each vector
  gets a b-bit signature (sign of dot with b deterministic
  hyperplanes); candidates share a signature bucket. Turns all-pairs
  O(n²) into per-bucket joins. Hyperplane components are derived from
  md5 (deterministic, reproducible across engines and runs — no
  driver-side randomness to ship to executors).

An IVF variant would k-means the corpus and probe nearest centroids;
at the test's 500×64 scale LSH demonstrates the same
bucket-then-verify plan shape with zero ML dependencies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from denormalized_spark.operators._bucketing import (
    bucket_pin_partitions,
    capped_bucket_collect,
)


def dot(a: Column, b: Column) -> Column:
    """Elementwise product + sum, all JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force top-k cosine neighbors of a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cosine_sim")
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_topk_arrow(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`cosine_topk` scored in a vectorized Pandas UDF (numpy
    matmul over Arrow batches) instead of expression-tree folds.

    The expression path wins at small dims (stays in codegen, zero
    Python workers); this path wins at wide dims (≥~512) where one
    BLAS matmul per Arrow batch beats ~dim interpreted HOF ops per
    row. Same plan shape otherwise: scan → per-batch score →
    TakeOrderedAndProject. numpy's pairwise summation makes scores
    differ from the fold path in the last ulps — rank order is stable
    (unit-tested), but hash-exact oracles should use the expression
    path."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))

    def _kernel(vecs):
        m = np.asarray(vecs.tolist(), dtype=np.float64)
        sims = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
        return pd.Series(sims)

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf's signature inspection can't resolve — set real ones
    _kernel.__annotations__ = {"vecs": pd.Series, "return": pd.Series}
    _score = pandas_udf(_kernel, returnType="double")

    scored = df.select(F.col(id_col), _score(F.col(vec_col)).alias("cosine_sim"))
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_self_join_topk(
    df: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """For every vector, its top-k nearest other vectors (brute force
    all-pairs). Correctness baseline only: O(n²) — at scale use
    ``lsh_bucketed_neighbors``. The per-id top-k is a window rank
    (per-partition heap would need an RDD; rank after AQE-coalesced
    join is acceptable because the join output, not the rank, is the
    bottleneck)."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).select(
        "id_a", "id_b", cosine(F.col("v_a"), F.col("v_b")).alias("cosine_sim")
    )
    w = Window.partitionBy("id_a").orderBy(F.desc("cosine_sim"), F.asc("id_b"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
    )


def hyperplane_components(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane in [-0.5, 0.5]^dim:
    component j = md5("p<i>:<j>") -> first 15 hex chars -> 60-bit uint
    -> unit interval. Computed driver-side with hashlib (identical to
    what md5() in any engine yields), so the plane is a plain float
    literal array — Catalyst constant-folds it, and the DuckDB oracle
    can embed the very same literals."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"p{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        comps.append(h / float(1 << 60) - 0.5)
    return comps


def _hyperplane(plane_idx: int, dim: int) -> Column:
    return F.array(*[F.lit(c) for c in hyperplane_components(plane_idx, dim)])


def lsh_signature(
    vec_col: Column, dim: int, num_planes: int = 8, table: int = 0
) -> Column:
    """b-bit random-hyperplane signature as a long. ``table`` offsets
    the plane indices so multiple independent hash tables (the
    OR-construction that buys recall) draw disjoint hyperplanes."""
    return F.element_at(
        lsh_signature_arrays(vec_col, dim, num_planes, num_tables=1, first_table=table),
        1,
    )


def lsh_signature_arrays(
    vec_col: Column,
    dim: int,
    num_planes: int = 8,
    num_tables: int = 1,
    first_table: int = 0,
) -> Column:
    """ALL tables' hyperplane signatures as one array<long> — a single
    nested-HOF expression instead of ``num_tables × num_planes``
    separate fold chains.

    Value-identical to folding :func:`lsh_signature` per table: each
    plane's dot product is the same sequential zip_with/aggregate fold
    (identical IEEE op order), the bit is ``1 << i`` exactly
    (shiftleft), and the per-table bit sum is a sequential integer
    fold — bit-for-bit the arithmetic the per-plane form (and every
    oracle's unrolled SQL literal) evaluates.

    Why this form: Catalyst analysis/optimization walks the expression
    tree per pass, and 32 independent zip_with+aggregate chains (8
    tables × 4 planes at 64 dims ≈ thousands of nodes) made driver-side
    plan work the dominant cost of the LSH lanes at bench scale
    (measured r14: signature-stage analysis 3.5 s → 1.2 s, first
    execution 1.3 s → 0.4 s on the 8×4×64 config). The planes become
    one constant-folded 3-D literal and the lambda count drops from
    O(tables×planes) to 5, while per-row arithmetic is unchanged."""
    planes = F.array(
        *[
            F.array(
                *[
                    F.array(
                        *[
                            F.lit(c)
                            for c in hyperplane_components(
                                (first_table + t) * num_planes + i, dim
                            )
                        ]
                    )
                    for i in range(num_planes)
                ]
            )
            for t in range(num_tables)
        ]
    )

    def _dot(p: Column) -> Column:
        return F.aggregate(
            F.zip_with(vec_col, p, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # the shift base must be LONG: a Java int shift masks the count to
    # 5 bits, so plane 31 would land on the sign bit and plane 32 wrap
    # to bit 0 — the long shift (6-bit mask) matches the old unrolled
    # ``F.lit(1 << i)`` long literals through plane 62 (ADVICE r14)
    return F.transform(
        planes,
        lambda tp: F.aggregate(
            F.transform(
                tp,
                lambda p, i: F.when(
                    _dot(p) > 0,
                    F.call_function("shiftleft", F.lit(1).cast("long"), i),
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, b: acc + b,
        ),
    )


def lsh_bucketed_neighbors(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    min_cosine: float = 0.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 1,
    max_bucket_size: int | None = None,
    salt_target_pairs: int | None = None,
) -> DataFrame:
    """Candidate neighbor pairs sharing an LSH bucket, scored exactly.

    Plan shape: project per-table signatures (scan-speed) → explode
    ``num_tables`` (constant fan-out, like MinHash bands) → shuffle
    once on (table, bucket) → within-bucket self-join → distinct →
    exact cosine on candidates only.

    Recall math: a pair at angle θ shares one table's bucket with
    p = (1 − θ/π)^num_planes; OR across tables gives
    1 − (1 − p)^num_tables. More tables = recall, more planes =
    precision (smaller buckets). num_planes=16 → 65k buckets per
    table; size so buckets fit a task at the target corpus — bucket
    population grows LINEARLY with the corpus at fixed planes, and
    in-bucket pair generation is quadratic in population, so planes
    must scale with log2(corpus). ``max_bucket_size`` is the backstop
    for under-planed configs and degenerate data (a constant embedding
    region puts a whole corpus in one bucket): oversized buckets are
    dropped before pair generation, bounding memory; pairs inside them
    can still surface through the other tables.

    ``salt_target_pairs`` (opt-in) splits each bucket's anchor range
    into contiguous sub-ranges of ≈ that many pairs and redistributes
    them on (tbl, bucket, range-start) before scoring — guide-§2.5
    work salting for corpora whose bucket-size skew leaves the
    quadratic scoring stage straggling (AQE cannot split a single hot
    key). Output is bit-identical (proven by collected-value equality
    at 2 SFs + 3 edge configs). Default OFF: at bench scale the extra
    exchange costs more than the ~2.4× pair skew it recovers
    (interleaved r15 A/B, 8 alternating runs/arm: sim_lsh_buckets
    0.69→0.82–0.97 s, dedup_embedding_neardup ≈wash); enable it when
    the scoring stage is minutes long and straggler-bound, where the
    one extra exchange amortizes."""
    # one nested-HOF expression computes every table's signature (see
    # lsh_signature_arrays: same arithmetic, ~order-of-magnitude less
    # Catalyst work than per-plane fold chains); posexplode's position
    # is the table index the per-table struct form carried explicitly
    sig = df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(
            lsh_signature_arrays(F.col(vec_col), dim, num_planes, num_tables)
        ).alias("tbl", "bucket"),
    ).select(id_col, vec_col, "tbl", "bucket")
    # bucket-collect instead of a self-join: one aggregation gathers
    # each bucket's (id, vector, norm) members (signatures computed
    # ONCE — a self-join would re-evaluate the num_planes dot products
    # per side); pairs are generated per bucket with higher-order
    # functions, then deduped across tables BEFORE the O(dim) score.
    # The norm is precomputed per VECTOR (it was recomputed per pair:
    # 3 array folds per pair → 1), same expression → same value.
    member = F.struct(
        F.col(id_col).alias("mid"),
        F.col(vec_col).alias("mvec"),
        norm(F.col(vec_col)).alias("mnorm"),
    )
    # cap contract: operators/_bucketing.py — over-cap buckets drop
    # WHOLE, mirrored by the oracles' HAVING count BETWEEN 2 AND cap.
    # The shuffle is partition-pinned: each bucket row carries O(cap²)
    # downstream dot products, so AQE's byte-based coalescing would
    # serialize the scoring onto a few partitions (see _bucketing).
    buckets = capped_bucket_collect(
        sig, ["tbl", "bucket"], member, "_ms", max_bucket_size,
        # when pair-range salting redistributes the scoring (below),
        # the collect itself is cheap — let AQE coalesce it and let
        # the salt exchange do the spreading; unsalted, the pin keeps
        # the quadratic scoring off a handful of AQE-coalesced tasks
        num_partitions=None if salt_target_pairs else bucket_pin_partitions(sig),
    )
    # score INSIDE the pair generation: the dedup shuffle then carries
    # narrow (id_a, id_b, cos) rows, not two 64-float vectors, and the
    # min_cosine filter prunes before the exchange. A pair found in k
    # tables is scored k times (k ≤ num_tables, dupes only) — far
    # cheaper than shuffling vectors.
    def _pairs_over(arr: Column, n_anchors: Column | None = None) -> Column:
        """Anchor×suffix pair structs with the exact cosine scored
        inline; ``n_anchors`` limits anchors to the array's first
        elements (the salted form) — the pair SET and every score are
        the expressions of the unsalted full-array form verbatim."""
        anchors = arr if n_anchors is None else F.slice(arr, 1, n_anchors)
        return F.flatten(
            F.transform(
                anchors,
                lambda x, i: F.transform(
                    F.slice(arr, i + 2, F.greatest(F.size(arr) - i - 1, F.lit(0))),
                    lambda y: F.struct(
                        x["mid"].alias("id_a"),
                        y["mid"].alias("id_b"),
                        (dot(x["mvec"], y["mvec"]) / (x["mnorm"] * y["mnorm"])).alias(
                            "cosine_sim"
                        ),
                    ),
                ),
            )
        )

    ms = F.col("_ms")
    if salt_target_pairs:
        # Hot-bucket pair-range salting (guide §2.5): a bucket of n
        # members costs n(n−1)/2 dot products downstream, so the pinned
        # (tbl, bucket) shuffle still lands 2–3× more PAIR work on some
        # partitions than others (hash placement is per bucket; work is
        # quadratic in bucket size). Split each bucket's ANCHOR range
        # into contiguous sub-ranges of ≈``salt_target_pairs`` pairs —
        # boundaries from the inverse of the triangular pair count
        # (placement-only float math: the ranges partition [0, n−1)
        # whatever the rounding) — and redistribute on (tbl, bucket,
        # range-start). Each salt row carries only the member-array
        # SUFFIX its anchors pair against, so the extra exchange ships
        # O(split × bucket) bytes, proportional to the pair work being
        # moved. Pair set and scores are bit-identical: anchors i∈
        # [lo, hi) pair with members[i+1:], exactly the unsalted
        # enumeration, and the cap contract is applied before any
        # splitting. The whole-bucket cap semantics are untouched.
        n = F.size(ms)
        npairs = (n * (n - F.lit(1))).cast("double") / F.lit(2.0)
        sb = F.least(
            F.greatest(
                F.ceil(npairs / F.lit(float(salt_target_pairs))).cast("int"),
                F.lit(1),
            ),
            n - F.lit(1),
        )
        tn = (n * 2 - F.lit(1)).cast("double")

        def _lo(s: Column) -> Column:
            # smallest anchor index whose preceding pair count reaches
            # s/sb of the bucket's total: inverse of i(2n−1−i)/2
            return F.floor(
                (
                    tn
                    - F.sqrt(
                        tn * tn
                        - F.lit(8.0) * npairs * s.cast("double") / sb.cast("double")
                    )
                )
                / F.lit(2.0)
            ).cast("int")

        ranges = F.transform(
            F.sequence(F.lit(0), sb - F.lit(1)),
            lambda s: F.struct(_lo(s).alias("lo"), _lo(s + 1).alias("hi")),
        )
        salted = (
            buckets.select("tbl", "bucket", "_ms", F.explode(ranges).alias("_r"))
            .select(
                "tbl",
                "bucket",
                F.col("_r.lo").alias("_lo"),
                (F.col("_r.hi") - F.col("_r.lo")).alias("_na"),
                F.slice(ms, F.col("_r.lo") + 1, F.size(ms) - F.col("_r.lo")).alias("_sfx"),
            )
            .repartition(bucket_pin_partitions(df), "tbl", "bucket", "_lo")
        )
        out = salted.select(
            F.explode(_pairs_over(F.col("_sfx"), F.col("_na"))).alias("p")
        ).select("p.id_a", "p.id_b", "p.cosine_sim")
    else:
        out = buckets.select(F.explode(_pairs_over(ms)).alias("p")).select(
            "p.id_a", "p.id_b", "p.cosine_sim"
        )
    if min_cosine > 0:
        out = out.filter(F.col("cosine_sim") >= min_cosine)
    return out.dropDuplicates(["id_a", "id_b"])


def projection_components(comp_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random projection row in [-0.5, 0.5]^dim —
    the Johnson-Lindenstrauss matrix row, md5-derived like
    :func:`hyperplane_components` but under its own seed family so
    projections and LSH hyperplanes stay independent draws."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"rp{comp_idx}:{j}".encode()).hexdigest()[:15], 16)
        comps.append(h / float(1 << 60) - 0.5)
    return comps


def project_embeddings(
    df: DataFrame,
    out_dim: int,
    dim: int = 64,
    vec_col: str = "embedding",
    out_col: str = "proj",
    round_digits: int | None = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project the
    embedding column onto ``out_dim`` deterministic random directions
    — the standard 4-8× shrink applied to an embedding store before
    ANN indexing at corpus scale. Pairwise distances are preserved
    within ~√(ln n / out_dim): structure SEPARATED by more than that
    distortion survives (a planted near-dup stays top-1 — tested),
    while neighbors bunched within it may reorder, so treat the
    projected space as a candidate-recall stage and re-rank the
    short list with full vectors. Composes with
    :func:`quantize_embeddings` for the full 64-float → 16-int8
    storage path.

    Pure per-row projection: out_dim constant-folded literal rows,
    zero shuffles, no Python. Components are md5-derived literals, so
    engines replay the identical matrix (the oracle embeds the same
    floats) and runs are reproducible without shipping a matrix.
    See :func:`jl_project` for the Achlioptas ±1-sign variant with a
    measured distortion entry."""
    # one nested-HOF expression over a constant-folded 2-D literal
    # matrix (the lsh_signature_arrays trick): same per-component
    # sequential dot fold — bit-identical values — with O(1) lambdas
    # instead of out_dim separate fold chains for Catalyst to walk
    rows2d = F.array(
        *[
            F.array(*[F.lit(c) for c in projection_components(i, dim)])
            for i in range(out_dim)
        ]
    )
    comp = (
        (lambda r: F.round(dot(F.col(vec_col), r), round_digits))
        if round_digits is not None
        else (lambda r: dot(F.col(vec_col), r))
    )
    return df.withColumn(out_col, F.transform(rows2d, comp))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer + probed clusters
# ---------------------------------------------------------------------------

def quantize_embeddings(
    df: DataFrame,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Symmetric per-vector integer quantization — the standard
    4-8× storage/bandwidth reduction applied to embedding tables
    before ANN indexing at corpus scale (a 100 TB float32 embedding
    store becomes ~25 TB int8 with ~0.2% cosine error at 64 dims).

    Per vector: ``scale = max|x|``; ``q_i = round(x_i / scale * (2^
    (bits-1) - 1))``. Pure per-row projection — zero shuffles, no
    Python; dequantization is ``q_i * scale / qmax``."""
    qmax = (1 << (bits - 1)) - 1
    v = F.col(embedding_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    )
    out = df.withColumn("q_scale", scale)
    q = F.transform(
        F.col(embedding_col),
        lambda x: F.round(x / F.col("q_scale") * qmax).cast("int"),
    )
    return out.withColumn("q_vec", q)


def dequantize(q_vec: Column, q_scale: Column, bits: int = 8) -> Column:
    """Inverse of :func:`quantize_embeddings` (lossy)."""
    qmax = (1 << (bits - 1)) - 1
    return F.transform(q_vec, lambda q: q.cast("double") * q_scale / qmax)


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-label mean vectors — the coarse quantizer. (In an unlabeled
    corpus these come from a k-means pass; the centroid-update step is
    exactly sim_centroid_by_label's aggregation.) Components are
    rounded so both engines' averages agree bit-for-bit downstream."""
    aggs = [
        F.round(F.avg(F.element_at(vec_col, j + 1).cast("double")), round_digits).alias(
            f"_c{j}"
        )
        for j in range(dim)
    ]
    cent = df.groupBy(label_col).agg(*aggs)
    return cent.select(
        F.col(label_col).alias("cluster"),
        F.array(*[f"_c{j}" for j in range(dim)]).alias("centroid"),
    )


def outlier_scores(
    df: DataFrame,
    centroids: DataFrame | None = None,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    percentile: float = 0.1,
) -> DataFrame:
    """Embedding-space outlier detection for data curation: score each
    vector by cosine to its OWN label's centroid, then flag the bottom
    ``percentile`` per label — the standard screen for mislabeled or
    out-of-distribution rows before they poison a training mix (and
    the dual of the quality-percentile gate, in embedding space).

    Plan: k-row centroid table (one partial-agged groupBy — or pass
    precomputed ``centroids``) broadcast onto the scan; per-label
    thresholds are ANOTHER k-row aggregate (exact interpolated
    percentile over the rounded scores) broadcast back. Data is
    touched twice, shuffled never; both joins are k-row broadcasts.
    Rounded centroids/scores/thresholds keep the flag engine-portable
    (no float-boundary flips between engines)."""
    if centroids is None:
        centroids = label_centroids(df, label_col, vec_col, dim)
    cent = centroids.select(
        F.col("cluster").alias(label_col), F.col("centroid").alias("_c")
    )
    scored = df.join(F.broadcast(cent), label_col).select(
        id_col,
        label_col,
        F.round(cosine(F.col(vec_col), F.col("_c")), 6).alias("centroid_cos"),
    )
    thr = scored.groupBy(label_col).agg(
        F.round(
            F.expr(f"percentile(centroid_cos, {percentile})"), 6
        ).alias("_thr")
    )
    return scored.join(F.broadcast(thr), label_col).select(
        id_col,
        label_col,
        "centroid_cos",
        (F.col("centroid_cos") < F.col("_thr")).alias("is_outlier"),
    )


def assign_clusters(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
) -> DataFrame:
    """Assign each vector to its highest-cosine centroid.

    Plan: broadcast the (tiny) centroid table, score every vector
    against every centroid map-side, keep the argmax with a window
    PARTITIONED by the vector id (bounded state, deterministic
    label tie-break). At 100 TB the assignment is computed once at
    ingest and stored as a partition column — which is exactly what
    this projection produces."""
    from pyspark.sql import Window

    sim = cosine(F.col(vec_col), F.col("centroid"))
    if round_digits is not None:
        # rank on the rounded similarity: engines that differ by an
        # ulp then rank identically (ties fall to the cluster-asc
        # tiebreak in both)
        sim = F.round(sim, round_digits)
    scored = df.crossJoin(F.broadcast(centroids)).withColumn("_sim", sim)
    w = Window.partitionBy(id_col).orderBy(F.desc("_sim"), F.asc("cluster"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "cluster")
    )


def centroids_of(
    assigned: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Centroid-update step: per-cluster component means (rounded so
    every engine/iteration starts from bit-identical centroids)."""
    aggs = [
        F.round(F.avg(F.element_at(vec_col, j + 1).cast("double")), round_digits).alias(
            f"_c{j}"
        )
        for j in range(dim)
    ]
    cent = assigned.groupBy("cluster").agg(*aggs)
    return cent.select(
        "cluster", F.array(*[f"_c{j}" for j in range(dim)]).alias("centroid")
    )


def kmeans_fit(
    df: DataFrame,
    init_centroids: DataFrame,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
    materialize_every: int | None = None,
) -> DataFrame:
    """Lloyd's k-means over an embedding column: assign (broadcast
    centroids, argmax rounded-cosine, deterministic tiebreak) →
    update (per-cluster mean, rounded) — ``iterations`` times;
    returns the final assignment (id, vector, cluster).

    Scale shape per iteration: one broadcast crossJoin (k centroids —
    map-side), one per-id window argmax (bounded: k rows per id), one
    groupBy(cluster) with partial aggregation. No driver data motion
    unless ``materialize_every`` is set, which collects the k centroid
    ROWS (k ≈ tens — metadata, not data) to literals every N
    iterations to keep lineage short on long runs — the same
    k-rows-to-driver pattern Spark MLlib's KMeans uses per iteration.

    Per-iteration rounding is what makes the result engine-portable:
    each iteration re-synchronizes to 6-decimal centroids/similarities
    so float drift cannot cascade across iterations."""
    cent = init_centroids
    for i in range(iterations):
        assigned = assign_clusters(df, cent, id_col, vec_col, round_digits)
        cent = centroids_of(assigned, vec_col, dim, round_digits)
        if materialize_every and (i + 1) % materialize_every == 0:
            rows = cent.collect()  # k rows of metadata, not data
            spark = df.sparkSession
            cent = spark.createDataFrame(
                [(r["cluster"], [float(x) for x in r["centroid"]]) for r in rows],
                "cluster int, centroid array<double>",
            )
    return assign_clusters(df, cent, id_col, vec_col, round_digits)


def ivf_incremental_update(
    old: DataFrame,
    new: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Streaming IVF index maintenance: fold an ARRIVING batch into an
    existing coarse quantizer without refitting — the per-cluster
    running-mean update of mini-batch / web-scale k-means (Sculley
    2010, WWW): c' = (n·c + Σ_new x)/(n + m). This is what keeps an
    IVF index (ivf_topk / ivf_batch_topk) serving while the corpus
    grows: new vectors are assigned to their nearest existing list,
    list sizes and centroids drift, and the reported per-cluster
    drift is the signal for scheduling a full refit.

    Engine-exact: the blend uses only ROUNDED quantities — the stored
    6-digit centroid, the 6-digit per-component mean of the new batch,
    and integer counts — combined with one fixed IEEE expression per
    component, then re-rounded; the drift is the micro-floored L2 norm
    of the (fixed-order, unrolled) component deltas, so both engines
    replay it bit-for-bit.

    Scale shape (streaming posture): the old side is ONE already-keyed
    per-cluster count (at 100 TB this is index metadata, not a scan —
    list sizes are maintained with the index); the new batch does one
    broadcast-assign pass (k centroid rows map-side, per-id window
    argmax) and one partial/final per-cluster agg; the blend itself is
    a k-row broadcast join. Per micro-batch cost ∝ batch size, never
    corpus size. Returns ``(cluster, n_before, n_added, shift_micro,
    c0, c1, c2)`` — the first three updated components ride along as
    the value check."""
    a_old = assign_clusters(old, centroids, id_col, vec_col, round_digits)
    n_old = a_old.groupBy("cluster").agg(
        F.count("*").cast("long").alias("n_before")
    )
    a_new = assign_clusters(new, centroids, id_col, vec_col, round_digits)
    # the per-component means stay dim separate partial-agged avg
    # expressions (the data-touching leg), but everything downstream
    # consumes them as ONE array column: the blend and the drift are
    # nested-HOF expressions over (centroid, means) instead of dim
    # unrolled when/round columns — the lsh_signature_arrays plan-size
    # trick. Values are elementwise identical: zip_with applies the
    # SAME per-component blend expression, and the L2 fold seeds 0.0
    # (exact: 0.0 + x == x for the non-negative squared deltas).
    # Measured at sf0.1 (dim=64): DataFrame build 8.7 -> 2.4 s, first
    # noop exec 10.6 -> 1.9 s, results exceptAll-identical both ways.
    new_stats = (
        a_new.groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_added"),
            *[
                F.round(
                    F.avg(F.element_at(vec_col, j + 1).cast("double")), round_digits
                ).alias(f"_m{j}")
                for j in range(dim)
            ],
        )
        .select(
            "cluster",
            "n_added",
            F.array(*[f"_m{j}" for j in range(dim)]).alias("_m"),
        )
    )
    blended = (
        centroids.join(F.broadcast(n_old), "cluster", "left")
        .join(F.broadcast(new_stats), "cluster", "left")
        .select(
            "cluster",
            F.coalesce(F.col("n_before"), F.lit(0)).cast("long").alias("n_before"),
            F.coalesce(F.col("n_added"), F.lit(0)).cast("long").alias("n_added"),
            "centroid",
            "_m",
        )
    )
    nb, na = F.col("n_before"), F.col("n_added")
    u = F.when(
        na > 0,
        F.zip_with(
            "centroid",
            "_m",
            lambda c, m: F.round(
                (nb.cast("double") * c + na.cast("double") * m)
                / (nb + na).cast("double"),
                round_digits,
            ),
        ),
    ).otherwise(F.col("centroid"))
    up = blended.select("cluster", "n_before", "n_added", "centroid", u.alias("_u"))
    # fixed-order L2 fold over the component deltas — identical IEEE
    # accumulation order in both engines (ascending j, left-to-right)
    sq = F.aggregate(
        F.zip_with("_u", "centroid", lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    return up.select(
        "cluster",
        "n_before",
        "n_added",
        F.floor(F.sqrt(sq) * 1_000_000.0 + F.lit(0.5)).cast("long")
        .alias("shift_micro"),
        *[
            F.element_at("_u", j + 1).alias(f"c{j}")
            for j in range(min(3, dim))
        ],
    ).orderBy("cluster")


def semdedup(
    df: DataFrame,
    centroids: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = 6,
    max_cluster_size: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus with a coarse quantizer,
    then prune near-duplicates WITHIN each cluster — every pair with
    cosine >= ``tau`` drops its higher-id member (min-id survivor,
    the same star-dedup approximation ``dedup_embedding_neardup``
    uses). Cross-cluster near-dups are not compared — that blindness
    is the published algorithm's accepted recall tradeoff, which is
    what makes it tractable at corpus scale.

    Scale shape: one broadcast-assign pass (k centroid rows map-side,
    per-id window argmax — ``assign_clusters``), then the pairwise
    step is a self-join ON THE CLUSTER KEY: one shuffle per side,
    in-cluster pair work Σ cᵢ². The published control is k ∝ corpus
    size so E[c] stays constant (k ≈ √N is customary); at 100 TB the
    assignment is computed once at ingest and stored as a partition
    column, making the pair join a co-located per-partition job.
    ``max_cluster_size`` guards degenerate quantizers the same way
    ``lsh_bucketed_neighbors``'s bucket cap does: clusters over the
    cap are EXCLUDED from pruning (conservative — their members all
    survive) rather than generating quadratic pair work.

    The assignment feeds four consumers (size gate, both pair sides,
    the final anti-join); ``materialize=True`` lazily
    localCheckpoints it so the broadcast-score pass runs ONCE instead
    of four times — same pattern as pack_token_sequences' shared
    tokenize kernel. Pass False when the assignment is already a
    stored column (the at-ingest deployment) and recompute is free.

    Returns survivors as (id, vector, cluster). The reference has no
    semantic-dedup operator; this extends its dedup surface
    (/root/reference/crates/core/src/datastream.rs has only the
    relational ops) with the LLM-pipeline standard.
    """
    assigned = assign_clusters(df, centroids, id_col, vec_col, round_digits)
    if materialize:
        assigned = assigned.localCheckpoint(eager=False)
    eligible = assigned
    if max_cluster_size is not None:
        ok = (
            assigned.groupBy("cluster")
            .count()
            .filter(F.col("count") <= max_cluster_size)
            .select("cluster")
        )
        # k rows at most — broadcast keeps the gate shuffle-free
        eligible = assigned.join(F.broadcast(ok), "cluster")
    a = eligible.select(
        "cluster", F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
    )
    b = eligible.select(
        "cluster", F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
    )
    cos = cosine(F.col("_va"), F.col("_vb"))
    if round_digits is not None:
        cos = F.round(cos, round_digits)
    dups = (
        a.join(b, "cluster")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= tau)
        .select(F.col("_idb").alias("_dup"))
        .distinct()
    )
    return assigned.join(
        dups, assigned[id_col] == dups["_dup"], "left_anti"
    ).select(id_col, vec_col, "cluster")


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    round_digits: int | None = None,
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` clusters nearest to
    the query, brute-force only inside them.

    The scan cost drops from N vectors to ~N·nprobe/n_clusters; the
    probed-cluster scan is the same broadcast + TakeOrdered plan as
    the exact brute force. Recall loss is confined to neighbors that
    live in unprobed clusters.

    **Reusable index**: pass ``centroids`` (cluster, centroid) and
    ``assigned`` (id, vector, cluster — :func:`assign_clusters`
    output, at scale persisted as parquet PARTITIONED BY cluster so a
    probe prunes to nprobe partitions at the scan) to skip the
    quantizer fit + full-corpus assignment this function otherwise
    recomputes PER QUERY. Fit once at ingest, store, then every query
    is just: rank k centroids, scan nprobe clusters. Omitting them
    keeps the self-contained one-shot form (fit + assign + probe in
    one plan — fine for a single ad-hoc query, a scale-killer in a
    query loop; use :func:`ivf_batch_topk` for query blocks)."""
    if centroids is None:
        centroids = label_centroids(df, label_col, vec_col, dim)
    cent = centroids
    if assigned is None:
        assigned = assign_clusters(df, cent, id_col, vec_col)
    qv = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_qvec")
    )
    # rank clusters by cosine to the query: n_clusters rows — tiny
    probe = (
        cent.crossJoin(F.broadcast(qv))
        .select("cluster", cosine(F.col("centroid"), F.col("_qvec")).alias("_s"))
        .orderBy(F.desc("_s"), F.asc("cluster"))
        .limit(nprobe)
        .select("cluster")
    )
    cand = assigned.join(F.broadcast(probe), "cluster", "left_semi").filter(
        F.col(id_col) != query_vec_id
    )
    score = cosine(F.col(vec_col), F.col("_qvec"))
    if round_digits is not None:
        score = F.round(score, round_digits)  # rank on the rounded value
    return (
        cand.crossJoin(F.broadcast(qv))
        .select(id_col, score.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def pq_codebooks_from_labels(
    df: DataFrame,
    m: int = 4,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: the embedding space is split
    into ``m`` contiguous subspaces of dim/m components; each
    subspace gets k centroids. This fitter derives them from the
    per-label means (the same deterministic, engine-portable coarse
    quantizer the IVF stack uses — codes ordered by sorted label);
    production corpora would run :func:`kmeans_fit` per subspace for
    tighter cells, the downstream encode/ADC machinery is identical.

    Returns ``codebooks[s][c] = centroid subvector`` as plain floats
    — k·dim numbers of METADATA collected to the driver (the
    sanctioned k-row collect, same as kmeans_fit's
    materialize_every), which then ride into the encode/score
    expressions as literals: zero joins at scan time."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    aggs = [
        F.round(F.avg(F.element_at(vec_col, j + 1).cast("double")), round_digits).alias(
            f"_c{j}"
        )
        for j in range(dim)
    ]
    rows = sorted(
        df.groupBy(label_col).agg(*aggs).collect(),
        key=lambda r: r[label_col],
    )
    return [
        [[float(r[f"_c{s * sub + j}"]) for j in range(sub)] for r in rows]
        for s in range(m)
    ]


def pq_codebooks_kmeans(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
    init: list[list[list[float]]] | None = None,
) -> list[list[list[float]]]:
    """K-MEANS product-quantization codebooks — the production fitter
    :func:`pq_codebooks_from_labels` points at: per-subspace Lloyd's
    with ``k`` cells, run for ALL ``m`` subspaces simultaneously so
    each iteration costs ONE corpus pass (the :func:`pq_encode`
    assignment expression — codebooks as constant-folded literals,
    argmin per subspace) plus ONE exploded (subspace, code)-keyed
    partial-agged update shuffle; only the m·k centroid ROWS (metadata)
    ever reach the driver, once per iteration — the same
    k-rows-to-literals loop as ``kmeans_fit(materialize_every=...)``.

    Deterministic and engine-portable: init = the subvectors of the
    ``k`` smallest ``id_col`` rows (override with ``init``), every
    iteration re-rounds centroids and distances to ``round_digits`` so
    float drift cannot cascade, ties break code-asc, and an emptied
    cell keeps its previous centroid. On corpora where labels don't
    track subvector geometry (any real embedding space), this
    replaces the 10-codeword-per-subspace label books with ``k``
    fitted cells — the quantization-error drop shows up directly in
    the bench's ann_pq_rerank_recall lane."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub = dim // m
    if init is None:
        seeds = df.orderBy(id_col).limit(k).select(vec_col).collect()
        if len(seeds) < k:
            raise ValueError(f"need >= k={k} rows to seed the codebooks")
        init = [
            [
                [float(x) for x in r[vec_col][s * sub : (s + 1) * sub]]
                for r in seeds
            ]
            for s in range(m)
        ]
    books = init
    vecs = df.select(vec_col)
    for _ in range(iterations):
        enc = pq_encode(vecs, books, vec_col, round_digits=round_digits)
        ex = enc.select(
            F.col(vec_col), F.posexplode("pq_code").alias("s", "c")
        ).select(
            "s",
            "c",
            F.slice(
                F.col(vec_col), F.col("s") * sub + 1, F.lit(sub)
            ).alias("_sv"),
        )
        upd = ex.groupBy("s", "c").agg(
            *[
                F.round(
                    F.avg(F.element_at("_sv", j + 1).cast("double")),
                    round_digits,
                ).alias(f"_u{j}")
                for j in range(sub)
            ]
        )
        got = {
            (r["s"], r["c"]): [float(r[f"_u{j}"]) for j in range(sub)]
            for r in upd.collect()  # m·k rows of metadata
        }
        books = [
            [got.get((s, c), books[s][c]) for c in range(k)]
            for s in range(m)
        ]
    return books


def _sub_sqdist(sub_vec: Column, centroid: Column) -> Column:
    """Squared L2 distance between a subvector and a centroid array —
    zip_with + fold, left-to-right term order (the order the oracles
    replay)."""
    return F.aggregate(
        F.zip_with(
            sub_vec, centroid, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
    round_digits: int = 6,
) -> DataFrame:
    """PQ encoding: each vector becomes ``m`` small integer codes —
    the nearest codebook centroid per subspace (rounded distance,
    code-asc tiebreak, so every engine picks the same cell). With
    k=256, m=16 this is the standard 64-float → 16-byte compression
    of a billion-scale ANN store.

    Pure per-row projection — the codebooks are constant-folded
    literal ARRAYS scanned with higher-order functions (zip_with +
    fold per cell), not unrolled per-component expressions: the
    unrolled form generated m·k·subdim expression nodes and blew
    whole-stage codegen's 64 KB method limit at m=4, k=8, d=64
    (Janino fallback → interpreted projection, measured ~6 s flat in
    scale_check); the HOF form keeps the generated code size
    independent of the codebook. Zero shuffles, zero Python; at
    ingest the codes are stored next to the vector (or instead of
    it)."""
    sub = len(codebooks[0][0])
    # all m subquantizers in ONE nested-HOF expression over a 3-D
    # constant-folded codebook literal (the lsh_signature_arrays
    # trick): per-cell arithmetic is the identical rounded fold, but
    # Catalyst walks O(1) lambda chains instead of m of them
    books_lit = F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in cell]) for cell in book])
            for book in codebooks
        ]
    )
    vec = F.col(vec_col)
    codes = F.transform(
        books_lit,
        lambda book, s: F.array_min(
            F.transform(
                book,
                lambda cell, i: F.struct(
                    F.round(
                        _sub_sqdist(F.slice(vec, s * sub + 1, sub), cell),
                        round_digits,
                    ).alias("d"),
                    i.alias("c"),
                ),
            )
        )["c"],
    )
    return df.withColumn(out_col, codes)


def pq_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    full-precision; its distance to every codebook centroid is
    precomputed driver-side into an m×k lookup table (metadata), and
    each encoded row's approximate distance is the SUM OF m TABLE
    LOOKUPS — no vector arithmetic in the scan at all. This is the
    plan that makes billion-scale ANN affordable: the scan touches
    m bytes per row instead of dim floats, and
    TakeOrderedAndProject keeps k rows per partition.

    Compose with the IVF probe (:func:`ivf_batch_topk`) for
    probed+quantized retrieval; re-rank the short list with full
    vectors where exactness matters."""
    sub = len(codebooks[0][0])
    lut = []
    for s, book in enumerate(codebooks):
        row = []
        for c in book:
            d = sum(
                (query_vec[s * sub + j] - c[j]) ** 2 for j in range(sub)
            )
            row.append(round(d, round_digits))
        lut.append(row)
    # one zip_with+fold over a 2-D LUT literal instead of m chained
    # element_at terms: the fold seeds 0.0 (+0.0 + x ≡ x for the
    # non-negative rounded distances) and adds in the same s-ascending
    # order, so the sum is bit-identical to the chained form
    lut_lit = F.array(*[F.array(*[F.lit(v) for v in row]) for row in lut])
    code = F.col(code_col) if isinstance(code_col, str) else code_col
    dist = F.aggregate(
        F.zip_with(lut_lit, code, lambda row, c: F.element_at(row, c + 1)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        encoded.select(
            id_col, F.round(dist, round_digits).alias("adc_dist")
        )
        .orderBy(F.asc("adc_dist"), F.asc(id_col))
        .limit(k)
    )


def ivf_pq_topk(
    assigned_encoded: DataFrame,
    centroids: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    round_digits: int = 6,
) -> DataFrame:
    """The composed production ANN path: IVF probe × PQ/ADC scoring.
    ``assigned_encoded`` is the stored index — every vector's coarse
    cluster (:func:`assign_clusters`) AND its PQ codes
    (:func:`pq_encode`), persisted at ingest (at scale: parquet
    partitioned by cluster, m small ints per row — the full vector
    need not be read at all). A query then (1) ranks the k-row
    centroid table to ``nprobe`` clusters, (2) scans ONLY those
    partitions, (3) scores each row as m LUT reads, (4) TakeOrdered
    keeps k. Scan cost ≈ N·(nprobe/n_clusters)·m bytes — the
    billion-vector serving shape. Re-rank the returned short list
    with full vectors where exactness matters."""
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.select(
            "cluster", cosine(F.col("centroid"), qv).alias("_s")
        )
        .orderBy(F.desc("_s"), F.asc("cluster"))
        .limit(nprobe)
        .select("cluster")
    )
    cand = assigned_encoded.join(F.broadcast(probe), "cluster", "left_semi")
    return pq_topk(
        cand, codebooks, query_vec, k, id_col, code_col, round_digits
    )


def ivf_batch_topk(
    queries: DataFrame,
    assigned: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    round_digits: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Batched IVF retrieval against a PREBUILT index: top-``k``
    neighbors for a whole block of queries in ONE corpus pass — the
    production shape of ANN serving/mining on Spark (the brute-force
    twin is the sim_batch_topk query; this is its probed form:
    ~nprobe/n_clusters of the scan per query instead of all of it).

    Inputs: ``queries`` (qid, qvec) is a driver-small block (hundreds
    to tens of thousands — it is broadcast); ``assigned`` and
    ``centroids`` are the stored index from :func:`assign_clusters` /
    :func:`label_centroids` (or a k-means fit), built once at ingest —
    at scale ``assigned`` lives as parquet partitioned by cluster, so
    the probe join prunes to the probed partitions.

    Plan shape (corpus side scanned ONCE per batch, never per query):

    1. centroids × broadcast(queries) → per-query probe list: a
       (n_queries × n_clusters)-row metadata table, ranked to nprobe
       rows per query by a qid-partitioned window;
    2. the corpus joins the broadcast probe table on cluster — each
       corpus row fans out only to the queries probing its cluster
       (expected fan-out n_queries × nprobe / n_clusters);
    3. exact cosine per (query, candidate), then a qid-partitioned
       row_number ≤ k — Spark rewrites it to a WindowGroupLimit, so
       no query materializes more than k rows past the per-partition
       sort.

    ``exclude_self`` drops the query's own row (queries drawn from the
    corpus); set False for external query vectors whose ids don't
    share the corpus id domain."""
    from pyspark.sql import Window

    probe_sim = cosine(F.col("centroid"), F.col(qvec_col))
    wq = Window.partitionBy(qid_col).orderBy(F.desc("_ps"), F.asc("cluster"))
    probe = (
        centroids.crossJoin(F.broadcast(queries))
        .withColumn("_ps", probe_sim)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(qid_col, qvec_col, "cluster")
    )
    cand = assigned.join(F.broadcast(probe), "cluster")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col(qid_col))
    score = cosine(F.col(vec_col), F.col(qvec_col))
    if round_digits is not None:
        score = F.round(score, round_digits)  # rank on the rounded value
    wr = Window.partitionBy(qid_col).orderBy(F.desc("cosine_sim"), F.asc(id_col))
    return (
        cand.select(qid_col, id_col, score.alias("cosine_sim"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= k)
    )


def sqdist(a: Column, b: Column) -> Column:
    """Squared L2 distance between two vector columns, JVM-side.

    Left-to-right fold with a 0.0 seed, so the float evaluation order
    is identical to a left-associated SQL ``+`` chain — the property
    the cross-engine oracles rely on."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kcenter_select(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    materialize_every: int | None = 4,
) -> DataFrame:
    """Greedy k-center / farthest-point sampling over an embedding
    column (Gonzalez 1985; the coreset-selection workhorse of
    Sener & Savarese 2018, arXiv:1708.00489): seed with the min-id
    vector, then repeatedly pick the point FARTHEST from every center
    chosen so far — the classic 2-approximation to the k-center
    cover, used to select a maximally diverse training subset.

    Returns ``(center_rank, id, radius)`` — ``radius`` is the chosen
    point's distance² to its nearest prior center at selection time
    (a non-increasing sequence; the seed's is NULL). ``radius`` of the
    LAST center upper-bounds twice the optimal k-center cost.

    Scale shape per iteration (exactly MLlib's iterative contract):
    one distributed argmax over the corpus (TakeOrderedAndProject —
    per-partition max + driver merge of ONE row), then a map-side
    ``least(mindist, dist²-to-new-center)`` update against the new
    center shipped as a literal (64 floats — metadata, not data). No
    shuffle anywhere: the running min-distance column lives with the
    rows. ``materialize_every`` lazily localCheckpoints the running
    column every N picks so the lineage/codegen cost stays flat on
    large k. Total work: k scans — at 100 TB you run this on the
    pre-reduced corpus (per-cluster means or a uniform sample), which
    is how published coreset pipelines deploy it.

    Per-step rounding of distances (``round_digits``) makes the whole
    greedy trajectory engine-portable: ties broken by ascending id,
    every comparison happens on 6-decimal values both engines agree
    on. Mirrors the unrolled-CTE replay in the ``sim_kcenter_select``
    oracle.
    """
    if k < 1:
        raise ValueError("kcenter_select: k must be >= 1")
    spark = df.sparkSession

    def _lit_vec(vals: list[float]) -> Column:
        return F.array(*[F.lit(float(x)) for x in vals])

    seed = df.orderBy(F.asc(id_col)).select(id_col, vec_col).first()
    if seed is None:
        raise ValueError("kcenter_select: input DataFrame is empty")
    picks = [(1, seed[0], None)]
    cur = df.select(id_col, vec_col).withColumn(
        "_md",
        F.round(sqdist(F.col(vec_col), _lit_vec(list(seed[1]))), round_digits),
    )
    for r in range(2, k + 1):
        nxt = (
            cur.orderBy(F.desc("_md"), F.asc(id_col))
            .select(id_col, vec_col, "_md")
            .first()
        )
        if float(nxt[2]) == 0.0:
            # Every remaining point coincides with a chosen center:
            # fewer than k distinct vectors exist. Stop rather than
            # emit meaningless radius-0 repeats.
            break
        picks.append((r, nxt[0], float(nxt[2])))
        cur = cur.withColumn(
            "_md",
            F.least(
                F.col("_md"),
                F.round(
                    sqdist(F.col(vec_col), _lit_vec(list(nxt[1]))), round_digits
                ),
            ),
        )
        if materialize_every and (r - 1) % materialize_every == 0:
            cur = cur.localCheckpoint(eager=False)
    id_type = dict(df.dtypes)[id_col]
    return spark.createDataFrame(
        picks, f"center_rank int, {id_col} {id_type}, radius double"
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "vec_id",
    rank_col: str = "rank",
    k: int = 60,
    topk: int = 10,
    round_digits: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009): combine ranked
    retrieval lists into one, score(d) = Σ 1/(k + rankᵢ(d)) over the
    lists that retrieved d — the standard zero-training ensemble for
    hybrid search (dense + sparse retrievers, or several ANN probes).

    Inputs are (id, rank) tables — each retriever's ALREADY-truncated
    top-n, so every input is k-rows metadata regardless of corpus
    size; the fusion is a union + per-id sum + TakeOrdered over
    ≤ Σnᵢ rows. With two lists the score sum is two IEEE additions
    (commutative — partition-order exact); more lists rely on the
    ``round_digits`` grid the same way every iterative oracle here
    does. Ties break to ascending id."""
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col(rank_col).cast("long"))).alias("_s"),
        )
        for r in rankings
    ]
    u = parts[0]
    for s in parts[1:]:
        u = u.unionByName(s)
    return (
        u.groupBy(id_col)
        .agg(F.round(F.sum("_s"), round_digits).alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )


def semantic_decontaminate(
    df: DataFrame,
    eval_ids: DataFrame,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 4,
    num_tables: int = 8,
    max_bucket_size: int | None = 512,
    round_digits: int = 6,
) -> DataFrame:
    """SEMANTIC benchmark decontamination: drop corpus rows whose
    embedding is cosine-≥ ``tau`` near ANY eval-set row — the
    embedding-level complement of n-gram decontamination (paraphrased
    or translated eval leakage that no exact-substring check can see;
    the contamination audit recent LLM evals run). ``eval_ids`` is an
    id table marking the held-out rows inside ``df``.

    Plan: ONE LSH bucket-collect pass over the combined corpus
    (:func:`lsh_bucketed_neighbors` — signatures computed once, the
    verify runs only on gated candidates, the bucket cap bounds
    degenerate corpora), then keep only cross-split pairs and
    anti-join their corpus side out. Same recall/plane economics as
    the semantic-dedup path it shares machinery with; at production
    scale raise ``num_tables`` (linear cost)."""
    pairs = lsh_bucketed_neighbors(
        df,
        dim=dim,
        num_planes=num_planes,
        num_tables=num_tables,
        min_cosine=tau - 5e-7,
        id_col=id_col,
        vec_col=vec_col,
        max_bucket_size=max_bucket_size,
    ).filter(F.round(F.col("cosine_sim"), round_digits) >= tau)
    ev = eval_ids.select(F.col(id_col).alias("_eid"))
    flagged = (
        pairs.join(ev, pairs.id_a == F.col("_eid"), "left")
        .withColumn("_ea", F.col("_eid").isNotNull())
        .drop("_eid")
        .join(ev, pairs.id_b == F.col("_eid"), "left")
        .withColumn("_eb", F.col("_eid").isNotNull())
        .drop("_eid")
    )
    cont = (
        flagged.filter(F.col("_ea") != F.col("_eb"))
        .select(
            F.when(F.col("_ea"), F.col("id_b")).otherwise(F.col("id_a")).alias("_cid")
        )
        .distinct()
    )
    corpus = df.join(ev, df[id_col] == F.col("_eid"), "left_anti")
    return corpus.join(cont, corpus[id_col] == F.col("_cid"), "left_anti")


def jl_signs(j: int, dim: int) -> list[float]:
    """Deterministic ±1 sign row j of the JL projection matrix:
    component i = low bit of md5("jl{j}:{i}") — same engine-portable
    literal contract as :func:`hyperplane_components`."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"jl{j}:{i}".encode()).hexdigest()[-1], 16) & 1 else -1.0
        for i in range(dim)
    ]


def jl_project(
    df: DataFrame,
    dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection (Johnson & Lindenstrauss
    1984; Achlioptas 2003 proved ±1 sign matrices suffice — no
    Gaussians needed): ``y_j = (1/√k) Σᵢ s_ij·x_i`` with md5-derived
    sign literals. Pairwise distances are preserved within (1±ε) with
    high probability for k = O(log n / ε²) — the cheap dimensionality
    squeeze in front of brute-force scoring, clustering, or an ANN
    index (4× fewer bytes through every downstream shuffle at
    64→16).

    The ±1-sign variant of :func:`project_embeddings` (which draws
    CONTINUOUS md5-derived components): same guarantee class, but the
    matrix is signs only — products degenerate to negations, the
    cheapest JL form — and the `sim_jl_distortion` entry MEASURES the
    distance-preservation band that project_embeddings' docstring
    states analytically.

    Map-only scan: each output component is one JVM fold over the
    vector against a constant-folded sign array; no shuffle, no
    Python. Components rounded to ``round_digits`` for the
    cross-engine contract (the fold order matches the oracles'
    left-associated sum chain). Default out_dim=16 makes the 1/√k
    scale exactly 0.25 — representable, so both engines scale
    identically."""
    scale = 1.0 / (out_dim ** 0.5)
    comps = [
        F.round(
            dot(F.col(vec_col), F.array(*[F.lit(s) for s in jl_signs(j, dim)]))
            * F.lit(scale),
            round_digits,
        )
        for j in range(out_dim)
    ]
    return df.select(F.col(id_col), F.array(*comps).alias("jl_proj"))


def pca_moments(
    df: DataFrame, dim: int, vec_col: str = "embedding", quant_digits: int = 4
) -> DataFrame:
    """One-pass EXACT integer moment statistics for distributed PCA:
    components are quantized to the 10^-quant_digits grid once
    (floor HALF_UP — engine-portable), then a single scan emits, per
    row, the dim(dim+1)/2 upper-triangle products plus the first
    moments, all reduced by one keyed partial aggregation. Output
    ``(i, j, s)``: (0,0) = n, (i,0) = Σxqᵢ, (i,j≥i) = Σxqᵢ·xqⱼ —
    ~dim²/2 rows of METADATA, independent of corpus size. This is the
    100 TB PCA shape: the data pass is embarrassingly parallel and
    everything after it (centering, eigen-iteration) runs on a
    constant-size summary. Integer sums are partition-order exact, so
    the oracle replays every cell bit-for-bit.

    Overflow headroom at defaults: |xq| ≤ 10^4 · max|x|, products ≤
    10^8, summed over n rows — int64-safe to n ≈ 10^10 rows."""
    q = 10 ** quant_digits
    xq_arr = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * q + F.lit(0.5)).cast("long")
    )

    def _pairs(xq: Column) -> Column:
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: F.transform(
                    F.sequence(i, F.lit(dim)),
                    lambda j: F.struct(
                        i.alias("i"),
                        j.alias("j"),
                        (F.element_at(xq, i) * F.element_at(xq, j)).alias("p"),
                    ),
                ),
            )
        )

    from denormalized_spark.operators.dedup import eval_once

    second = (
        df.select(F.explode(eval_once(xq_arr, _pairs)).alias("_c"))
        .groupBy(F.col("_c.i").alias("i"), F.col("_c.j").alias("j"))
        .agg(F.sum("_c.p").alias("s"))
    )
    first = (
        df.select(F.posexplode(xq_arr).alias("i0", "xq"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(F.lit(0).alias("j"), F.sum("xq").alias("s"))
    )
    cnt = df.agg(
        F.lit(0).alias("i"), F.lit(0).alias("j"), F.count("*").alias("s")
    )
    return second.unionByName(first.select("i", "j", "s")).unionByName(
        cnt.select("i", "j", "s")
    )


def pca_power_top(
    moments: list[tuple[int, int, int]],
    dim: int,
    iterations: int = 3,
    scale_digits: int = 4,
) -> list[int]:
    """Top principal component by power iteration over the EXACT
    integer moment summary — driver-side, because after the one-pass
    scan the covariance is metadata (dim² cells), exactly like
    k-means centroids. Every arithmetic step is pinned to an
    engine-portable grid so a SQL oracle replays the trajectory:

    - centered matrix (scaled by n², which preserves eigenvectors):
      M = n·S − sx·sxᵀ, exact int, then quantized Mq =
      floor(M/n²·10^4 + 0.5) (M ≤ 2^53, so the double division is
      exact-input);
    - v₀ = e₁·1000; per iteration cv = Mq·v (exact int64), norm² =
      Σcv² in ARBITRARY-PRECISION int (HUGEINT in the oracle),
      v ← floor(cv/√norm² · 1000 + 0.5) — sqrt is IEEE
      correctly-rounded, and the milli grid absorbs the int→double
      cast rounding. Covariance is PSD, so the direction never flips
      sign between iterations and the e₁ seed fixes the sign
      deterministically.

    Convergence is (lambda2/lambda1)^t — on a near-isotropic corpus
    (this repo's synthetic embeddings: gap ~0.94) expect ~60
    iterations for |cos| > 0.98 vs the true eigenvector; each
    iteration is a dim x dim metadata matvec, so iterations are free
    relative to the one data pass. Returns the milli-unit eigenvector
    (ints). Project with :func:`pca_project`."""
    import math

    n = next(s for i, j, s in moments if i == 0 and j == 0)
    sx = {i: s for i, j, s in moments if j == 0 and i > 0}
    sm = {(i, j): s for i, j, s in moments if i > 0 and j > 0}
    q = 10 ** scale_digits
    mq = {}
    for i in range(1, dim + 1):
        for j in range(1, dim + 1):
            s = sm[(i, j)] if i <= j else sm[(j, i)]
            m_exact = n * s - sx[i] * sx[j]
            mq[(i, j)] = math.floor(float(m_exact) / (n * n) * q + 0.5)
    v = [1000] + [0] * (dim - 1)
    for _ in range(iterations):
        cv = [
            sum(mq[(i, j)] * v[j - 1] for j in range(1, dim + 1))
            for i in range(1, dim + 1)
        ]
        s2 = sum(c * c for c in cv)  # exact: Python bigint ≡ oracle HUGEINT
        norm = math.sqrt(float(s2))
        v = [math.floor(float(c) / norm * 1000 + 0.5) for c in cv]
    return v


def pca_project(
    df: DataFrame,
    v_milli: list[int],
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_digits: int = 4,
) -> DataFrame:
    """Project each vector onto a milli-unit component from
    :func:`pca_power_top`: the score is the EXACT integer dot of the
    quantized vector with the integer eigenvector, exposed in 10^-7
    units (``pc1_e7`` BIGINT) — no float leaves the plan, so the
    oracle hashes it bit-for-bit. Map-only scan."""
    q = 10 ** quant_digits
    xq = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * q + F.lit(0.5)).cast("long")
    )
    vlit = F.array(*[F.lit(int(c)) for c in v_milli])
    dotq = F.aggregate(
        F.zip_with(xq, vlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    return df.select(F.col(id_col), dotq.alias("pc1_e7"))


def pca_top_project(
    df: DataFrame,
    dim: int,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Convenience: one-pass moments → power iteration → projection.
    The moment collect is dim²/2 rows of metadata (sanctioned)."""
    rows = pca_moments(df, dim, vec_col).collect()
    v = pca_power_top([(r["i"], r["j"], r["s"]) for r in rows], dim, iterations)
    return pca_project(df, v, dim, id_col, vec_col)


def ndcg_weight_table(k: int, scale: int = 1_000_000) -> list[tuple[int, int]]:
    """Micro-integer DCG position discounts ``(rank, ⌊10⁶/log₂(rank+1)⌉)``
    for ranks 1..k — precomputed in Python and embedded as LITERALS in
    both the Spark plan and the oracle SQL (the fellegi_sunter /
    ewma_control damping-literal pattern), so neither engine evaluates
    a logarithm."""
    import math

    return [
        (r, math.floor(scale / math.log2(r + 1) + 0.5)) for r in range(1, k + 1)
    ]


def ndcg_eval(
    approx: DataFrame,
    exact: DataFrame,
    id_col: str,
    k: int,
) -> DataFrame:
    """Ranking-quality evaluation of an approximate retrieval list
    against the exact one: NDCG@k (Järvelin & Kekäläinen 2002) with
    graded relevance rel(id) = k+1 − exact_rank (the exact neighbor
    order IS the gold grading), plus MRR and hit count — the metrics
    that catch what recall@k cannot: an ANN index can hold 9/10
    recall while scrambling the head of the list, and NDCG's
    log-position discount bills exactly that.

    Inputs are ranked lists ``(id, rank)`` with rank 1..k. Emits one
    row ``(k, n_hits, dcg, idcg, ndcg_micro, mrr_micro)``.

    Engine-exact: position discounts are precomputed micro-integer
    literals (:func:`ndcg_weight_table`), so DCG and IDCG are pure
    integer dot products; NDCG is one correctly-rounded division,
    micro-floored; MRR is ⌊10⁶/first-hit-rank⌉. Everything here runs
    on two ≤k-row lists — metadata; the data-sized work happened in
    the retrieval that produced them."""
    spark = approx.sparkSession
    wdf = spark.createDataFrame(ndcg_weight_table(k), "_ndr int, _ndw long")
    ex = exact.select(
        F.col(id_col), F.col("rank").alias("_xr")
    )
    a = (
        approx.select(F.col(id_col), F.col("rank"))
        .join(ex, id_col, "left")
        .withColumn(
            "_rel",
            F.coalesce(F.lit(k + 1) - F.col("_xr"), F.lit(0)).cast("long"),
        )
        .join(F.broadcast(wdf.withColumnRenamed("_ndr", "rank")), "rank")
    )
    dcg = a.agg(
        F.sum(F.col("_rel") * F.col("_ndw")).cast("long").alias("dcg"),
        F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0)).cast("long").alias("n_hits"),
        F.min(F.when(F.col("_rel") > 0, F.col("rank"))).alias("_first"),
    )
    idcg = (
        exact.join(F.broadcast(wdf.withColumnRenamed("_ndr", "rank")), "rank")
        .agg(
            F.sum((F.lit(k + 1) - F.col("rank")).cast("long") * F.col("_ndw"))
            .cast("long")
            .alias("idcg")
        )
    )
    return dcg.crossJoin(F.broadcast(idcg)).select(
        F.lit(k).cast("long").alias("k"),
        "n_hits",
        "dcg",
        "idcg",
        F.when(
            F.col("idcg") > 0,
            F.floor(
                F.col("dcg").cast("double") / F.col("idcg").cast("double")
                * 1_000_000 + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")).alias("ndcg_micro"),
        F.when(
            F.col("_first").isNotNull(),
            F.floor(
                F.lit(1_000_000.0) / F.col("_first").cast("double") + F.lit(0.5)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")).alias("mrr_micro"),
    )


def mips_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
    round_digits: int | None = None,
) -> DataFrame:
    """Brute-force maximum-inner-product top-k against a 1-row query
    side: score = ⟨x, q⟩ WITHOUT normalization — the retrieval
    objective of recommendation / learned-embedding scoring where
    vector magnitude carries signal (popularity, confidence) and
    cosine would throw it away. Plan: broadcast the 1-row query,
    scan+score map-side, TakeOrderedAndProject — k rows per partition
    cross the wire; this IS the 100 TB exact plan. For the sublinear
    path, run :func:`mips_augment` and reuse the cosine LSH machinery
    unchanged (the reduction makes MIPS ≡ cosine).

    ``round_digits`` quantizes the score BEFORE ranking (one IEEE
    ``round`` both engines replay identically), so raw-score ties
    that round equal at the top-k boundary break on the id column
    in both engines instead of on engine-dependent raw-double
    ordering — the micro-floor-before-ranking exactness discipline."""
    score = dot(F.col(vec_col), F.col(query_vec_col))
    if round_digits is not None:
        score = F.round(score, round_digits)
    scored = df.crossJoin(F.broadcast(query_df)).select(
        F.col(id_col), score.alias("inner_product")
    )
    return scored.orderBy(F.desc("inner_product"), F.asc(id_col)).limit(k)


def mips_augment(
    df: DataFrame,
    vec_col: str = "embedding",
    aug_col: str = "aug",
) -> DataFrame:
    """Norm-augmentation reduction from MIPS to cosine similarity
    (Neyshabur & Srebro 2015's SIMPLE-LSH; Shrivastava & Li 2014's
    ALSH is the asymmetric ancestor): with M = max‖x‖ over the
    corpus, map every data vector to x' = [x/M, √(1 − ‖x‖²/M²)] —
    a UNIT vector — and a query to q' = [q/‖q‖, 0]. Then
    cos(q', x') = ⟨q, x⟩/(‖q‖·M), so cosine ORDER equals
    inner-product ORDER and every cosine-LSH index (hyperplane
    signatures, bucketed neighbors) serves MIPS unchanged.

    Scale shape: M is a 1-row broadcast (global max of a per-row
    norm — one partial/final agg); the augmentation is a per-row
    projection, no shuffle. Appends ``aug_col`` (dim+1 doubles)."""
    spark_norms = df.withColumn("_nrm", norm(F.col(vec_col)))
    mx = spark_norms.agg(F.max("_nrm").alias("_m"))
    return (
        spark_norms.crossJoin(F.broadcast(mx))
        .withColumn(
            aug_col,
            F.concat(
                F.transform(F.col(vec_col), lambda v: v.cast("double") / F.col("_m")),
                F.array(
                    F.sqrt(
                        F.greatest(
                            F.lit(0.0),
                            F.lit(1.0)
                            - (F.col("_nrm") * F.col("_nrm"))
                            / (F.col("_m") * F.col("_m")),
                        )
                    )
                ),
            ),
        )
        .drop("_nrm", "_m")
    )


def mmr_select(
    df: DataFrame,
    query_vec: list[float],
    k: int = 8,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein
    1998): greedily pick k items maximizing
    λ·rel(x) − (1−λ)·max_{s∈selected} sim(x, s) — the diversified
    top-k every RAG retriever and dedup-aware search layer runs when
    plain top-k returns near-duplicates. Round 1 is pure relevance;
    each later round penalizes similarity to everything already
    picked; ties break (id asc).

    Engine-exact: relevance and penalty are the repo's shared-fold
    cosines (identical IEEE term order in Spark and the oracle), the
    argmax compares those raw doubles, and λ enters as the same
    double literal — so the greedy trajectory is identical in both
    engines; scores are rounded only at output.

    Scale shape: k driver rounds, each one scan + TakeOrdered(1) —
    the kmeans/bpe sanctioned metadata-probe loop; the selected set
    re-enters as ≤k literal vectors (a few KB in the plan), never a
    join. Returns ``(round, id, relevance_r6, mmr_score_r6)``."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    base = df.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).withColumn("_rel", cosine(F.col("_v"), q))
    selected: list[tuple] = []
    out_rows = []
    for rnd in range(1, k + 1):
        rem = base
        if selected:
            rem = rem.filter(~F.col("_id").isin([s[0] for s in selected]))
            pen = F.greatest(
                *[
                    cosine(F.col("_v"), F.array(*[F.lit(float(c)) for c in s[1]]))
                    for s in selected
                ]
            ) if len(selected) > 1 else cosine(
                F.col("_v"),
                F.array(*[F.lit(float(c)) for c in selected[0][1]]),
            )
        else:
            pen = F.lit(0.0)
        score = F.lit(float(lam)) * F.col("_rel") - F.lit(1.0 - float(lam)) * pen
        best = (
            rem.withColumn("_s", score)
            .orderBy(F.desc("_s"), F.asc("_id"))
            .limit(1)
            .collect()  # 1 metadata row per round
        )
        if not best:
            break
        r = best[0]
        selected.append((r["_id"], list(r["_v"])))
        out_rows.append(
            (rnd, r["_id"], round(float(r["_rel"]), 6), round(float(r["_s"]), 6))
        )
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    # The id field keeps the INPUT column's type (string/int/long ids
    # all round-trip) instead of a hardcoded long.
    out_schema = StructType(
        [
            StructField("round", IntegerType()),
            StructField(id_col, df.schema[id_col].dataType),
            StructField("relevance_r6", DoubleType()),
            StructField("mmr_score_r6", DoubleType()),
        ]
    )
    return df.sparkSession.createDataFrame(out_rows, out_schema)


def blend_rerank(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_df: DataFrame,
    w_lex: float,
    w_dense: float,
    k: int = 15,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Calibrated lexical+dense score-blend rerank — the hybrid
    retrieval second stage (Ma, Korotkov & Lin 2021's linear
    interpolation of BM25 and dense scores; Karpukhin et al. 2020 use
    the same convex-blend form): the BM25 candidate set is re-scored
    by ``w_lex·lex_norm + w_dense·dense_norm`` where the weights come
    from a calibration fit (in production, calibration_summary's
    Platt coefficients — here pinned literals; ranking by the linear
    blend ≡ ranking by the calibrated sigmoid, since σ is monotone).
    Normalizations are self-contained and engine-exact: lex_norm =
    bm25_micro / max(bm25_micro) (two exact longs, one IEEE divide),
    dense_norm = (cos_r6 + 1)/2 (bounded, no corpus stats).

    Scale shape: the lexical leg is bm25_micro_scores' |q|-term
    postings plan; the candidate set (docs matching >= 1 query term)
    joins the embedding table on the ID KEY — one keyed shuffle whose
    left side is candidates, not corpus; the 1-row query vector and
    the 1-row max broadcast; top-k is TakeOrderedAndProject. Returns
    ``(id, bm25_micro, cosine_r6, blend_micro)``."""
    from denormalized_spark.operators.text import bm25_micro_scores

    lex = bm25_micro_scores(docs, query_terms, id_col=doc_id_col)
    mx = lex.agg(F.max("bm25_micro").alias("_mx"))
    dense = emb.crossJoin(F.broadcast(query_df)).select(
        F.col(vec_id_col).alias(doc_id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 6).alias("cosine_r6"),
    )
    blend = F.floor(
        (
            F.lit(float(w_lex))
            * (F.col("bm25_micro").cast("double") / F.col("_mx").cast("double"))
            + F.lit(float(w_dense))
            * ((F.col("cosine_r6") + F.lit(1.0)) / F.lit(2.0))
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        lex.join(dense, doc_id_col)
        .crossJoin(F.broadcast(mx))
        .select(
            doc_id_col,
            "bm25_micro",
            "cosine_r6",
            blend.alias("blend_micro"),
        )
        .orderBy(F.desc("blend_micro"), F.asc(doc_id_col))
        .limit(k)
    )


def split_centroid_drift(
    a: DataFrame,
    b: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    dim: int = 64,
    round_digits: int = 6,
) -> DataFrame:
    """Per-group embedding-centroid drift between two corpus splits —
    the train/serve skew check every embedding pipeline runs before
    trusting a split (a group whose two half-centroids diverge is
    either drifting or too small to trust). For each label present in
    either split: both counts and the 6-rounded cosine between the
    two half-centroids (1.0 = identical direction).

    Engine-exact: each half-centroid is the 6-rounded per-component
    mean (label_centroids' contract); the cosine runs the shared
    fixed-order fold over those rounded components, then rounds.

    Scale shape: two partial/final per-label aggs (map-side combine)
    + one k-row join — no corpus-sized shuffle beyond the keyed aggs.
    Returns ``(label, n_a, n_b, drift_cosine_r6)``."""
    ca = label_centroids(a, label_col, vec_col, dim, round_digits).select(
        F.col("cluster").alias(label_col), F.col("centroid").alias("_ca")
    )
    cb = label_centroids(b, label_col, vec_col, dim, round_digits).select(
        F.col("cluster").alias(label_col), F.col("centroid").alias("_cb")
    )
    na = a.groupBy(label_col).agg(F.count("*").cast("long").alias("n_a"))
    nb = b.groupBy(label_col).agg(F.count("*").cast("long").alias("n_b"))
    return (
        ca.join(cb, label_col)
        .join(na, label_col)
        .join(nb, label_col)
        .select(
            label_col,
            "n_a",
            "n_b",
            F.round(cosine(F.col("_ca"), F.col("_cb")), round_digits)
            .alias("drift_cosine_r6"),
        )
        .orderBy(label_col)
    )


def knn_ood_scores(
    df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """k-NN-distance out-of-distribution scoring (Sun, Ming, Zhu & Li
    2022, "Out-of-Distribution Detection with Deep Nearest Neighbors"):
    a vector's OOD score is its mean cosine DISTANCE to its ``k``
    nearest neighbors — high = isolated = out-of-distribution. The
    non-parametric complement of :func:`outlier_scores` (which needs a
    label/centroid structure; k-NN distance needs nothing).

    Exactness: per-pair cosines run the shared fixed-order fold, are
    micro-FLOORED to longs, and the k-NN selection ranks that
    quantized value (neighbor-id tiebreak) — so the k-set, its exact
    integer sum, and the one floored division per score replay
    identically in both engines.

    Scale shape: THIS form is the all-pairs oracle baseline (score a
    deterministic sample, as the query does); the corpus-scale path
    feeds the same scoring through the LSH/IVF candidate machinery
    (lsh_bucketed_neighbors / ivf_batch_topk) exactly like the dedup
    stack gates its verify stage. Returns ``(id, knn_dist_micro)``."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("_ia"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("_ib"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("_ia") != F.col("_ib")).select(
        "_ia",
        "_ib",
        F.floor(
            cosine(F.col("_va"), F.col("_vb")) * F.lit(1_000_000.0) + F.lit(0.5)
        ).cast("long").alias("_cm"),
    )
    w = Window.partitionBy("_ia").orderBy(F.desc("_cm"), F.asc("_ib"))
    top = pairs.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        top.groupBy(F.col("_ia").alias(id_col))
        .agg(F.sum("_cm").cast("long").alias("_s"), F.count("*").alias("_k"))
        .select(
            id_col,
            F.floor(
                (F.col("_k") * 1_000_000 - F.col("_s")).cast("double")
                / F.col("_k").cast("double")
                + F.lit(0.5)
            ).cast("long").alias("knn_dist_micro"),
        )
    )


def pca_power_top_component(
    df: DataFrame,
    dim: int = 8,
    iterations: int = 8,
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Top principal component of the first ``dim`` embedding
    coordinates by POWER ITERATION (von Mises & Pollaczek-Geiringer
    1929; the iteration inside every truncated-PCA/SVD solver): build
    the dim×dim sample covariance in ONE pass, then iterate
    v ← C·v / ‖C·v‖ from the deterministic e₁ start. Power iteration
    is the PCA that actually scales — the data is touched once for C;
    every iteration runs on dim² METADATA.

    Engine-exact: means and covariance cells are 6-rounded avg()
    aggregates (the label_centroids discipline — rounding absorbs
    partition-order noise); every iteration's matrix-vector product
    is a fixed-order literal-unrolled sum over the bound 1-row C
    frame and re-rounds each component after normalizing, the
    kmeans-style per-round re-synchronization that makes the float
    trajectory oracle-checkable as unrolled CTEs.

    Returns ``dim`` rows ``(idx, loading_r6)`` plus an 'eigenvalue'
    summary row (idx = -1) carrying the Rayleigh quotient vᵀCv —
    the variance captured along the component.

    EAGER: the iteration chain's 1-row result is collected at
    DataFrame-BUILD time (one bounded Spark job) and returned as a
    local relation — each call recomputes from the input; an empty
    input yields NULL loadings (nullable schema), not an error."""
    x = [F.element_at(vec_col, j + 1).cast("double") for j in range(dim)]
    means = df.agg(
        *[F.round(F.avg(x[j]), round_digits).alias(f"m{j}") for j in range(dim)]
    )
    centered = df.crossJoin(F.broadcast(means))
    cov = centered.agg(
        *[
            F.round(
                F.avg(
                    (x[j] - F.col(f"m{j}")) * (x[k] - F.col(f"m{k}"))
                ),
                round_digits,
            ).alias(f"c{j}_{k}")
            for j in range(dim)
            for k in range(dim)
        ]
    )
    # v0 = e1; iterate on the 1-row covariance frame
    frame = cov.select(
        "*", *[F.lit(1.0 if j == 0 else 0.0).alias(f"v{j}") for j in range(dim)]
    )
    ccols = [F.col(f"c{j}_{k}") for j in range(dim) for k in range(dim)]
    for _ in range(iterations):
        prod = [
            sum(
                [F.col(f"c{j}_{k}") * F.col(f"v{k}") for k in range(dim)],
                F.lit(0.0),
            ).alias(f"w{j}")
            for j in range(dim)
        ]
        frame = frame.select(*ccols, *prod)
        nrm = F.sqrt(
            sum([F.col(f"w{j}") * F.col(f"w{j}") for j in range(dim)], F.lit(0.0))
        )
        # zero-norm guard: if v landed in C's null space (e.g. the e1
        # start with a zero first row/column), fall back to e1 rather
        # than dividing by zero — deterministic, oracle-mirrored
        frame = frame.select(
            *ccols,
            *[
                F.when(
                    nrm > 0, F.round(F.col(f"w{j}") / nrm, round_digits)
                )
                .otherwise(F.lit(1.0 if j == 0 else 0.0))
                .alias(f"v{j}")
                for j in range(dim)
            ],
        )
    # Rayleigh quotient on the final rounded vector
    quad = sum(
        [
            F.col(f"v{j}") * F.col(f"c{j}_{k}") * F.col(f"v{k}")
            for j in range(dim)
            for k in range(dim)
        ],
        F.lit(0.0),
    )
    out = frame.select(
        *[F.col(f"v{j}") for j in range(dim)],
        F.round(quad, round_digits).alias("_ev"),
    )
    # r14: emit the dim+1 output rows from ONE execution of the
    # iteration chain. The previous per-component unionAll referenced
    # the whole chain once PER OUTPUT ROW — 9 copies of the subtree in
    # the analyzed plan (~1 MB of plan text, ~14 s of driver plan
    # work) and 9 redundant covariance jobs per run. The chain's
    # result is ONE row of dim+1 doubles — exactly the bounded
    # 1-row-metadata collect the MMR/k-means operators already use —
    # so collect it once and return a local relation (values
    # unchanged: the same rounded floats round-trip exactly).
    # NOTE: the collect makes this operator EAGER at DataFrame-build
    # time (one bounded Spark job; the result is dim+1 doubles). On an
    # empty input the avg() aggregates are NULL — pass the NULLs
    # through (nullable schema) exactly like the old unionAll form,
    # which emitted NULL loadings, instead of crashing on float(None).
    row = out.collect()[0]
    spark = df.sparkSession
    _f = lambda v: None if v is None else float(v)  # noqa: E731
    out_rows = [(-1, _f(row["_ev"]))] + [
        (j, _f(row[f"v{j}"])) for j in range(dim)
    ]
    return spark.createDataFrame(
        out_rows, "idx int, loading_r6 double"
    ).orderBy("idx")


def pq_distortion(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Per-subspace PQ reconstruction error (the distortion E[‖x−q(x)‖²]
    of Jégou et al. 2011 §2, reported per subquantizer): the mean
    squared distance between each sub-vector and its chosen codebook
    cell — the index-health number that tells you WHICH subspace's
    codebook has gone stale (refit candidate) and bounds the ADC
    score error (ADC bias grows with exactly this quantity). Read
    beside the recall curves: recall says the index degraded,
    distortion says where.

    Engine-exact: the per-row min cell reuses pq_encode's
    rounded-distance argmin (same struct-min tie-break); each row's
    chosen distance is micro-floored BEFORE the integer sum (Σ of
    floors — order-free), and the final mean is one integer DIV.

    Scale shape: pure per-row projection against constant-folded
    codebook literals (the pq_encode HOF form) + ONE global partial
    agg; the stack to m rows happens on the 1-row aggregate. Returns
    ``(subspace, n_vectors, mse_micro)``."""
    sub = len(codebooks[0][0])
    m = len(codebooks)
    cols = []
    for s, book in enumerate(codebooks):
        book_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in cell]) for cell in book]
        )
        sub_vec = F.slice(F.col(vec_col), s * sub + 1, sub)
        pairs = F.transform(
            book_lit,
            lambda cell, i: F.struct(
                F.round(_sub_sqdist(sub_vec, cell), round_digits).alias("d"),
                i.alias("c"),
            ),
        )
        cols.append(
            F.floor(
                F.array_min(pairs)["d"] * F.lit(1_000_000.0) + F.lit(0.5)
            ).cast("long").alias(f"_d{s}")
        )
    agg = df.select(*cols).agg(
        F.count("*").cast("long").alias("_n"),
        *[F.sum(f"_d{s}").cast("long").alias(f"_s{s}") for s in range(m)],
    )
    stack_expr = ", ".join(f"{s}, _s{s}" for s in range(m))
    return (
        agg.selectExpr("_n", f"stack({m}, {stack_expr}) AS (subspace, _sum)")
        .select(
            F.col("subspace").cast("int"),
            F.col("_n").alias("n_vectors"),
            F.expr("_sum DIV _n").cast("long").alias("mse_micro"),
        )
        .orderBy("subspace")
    )
