"""Streaming IVF index maintenance: a foreachBatch sink body that
keeps an IVF coarse quantizer current while vector batches stream in —
the live twin of operators/similarity.ivf_incremental_update (Sculley
2010's web-scale mini-batch k-means update), packaged the way
streaming/sketches.SketchMaintainer packages the mergeable-sketch
family.

Per micro-batch: ONE broadcast-assign pass of the batch against the
current centroids (k rows map-side, per-id window argmax) and one
per-cluster partial aggregation (count + component sums) — everything
that crosses to the driver is k·(dim+2) numbers, never vectors. State
is (per-cluster count, per-cluster mean); the update is the
running-mean blend c' = (n·c + Σx)/(n + m). When every batch's
vectors assign to the same clusters they would under the one-shot
batch fit (well-separated lists — the serving regime), the streamed
state equals the batch per-cluster means up to the 6-digit
re-rounding per batch; the parity test asserts exactly that regime,
plus exact count conservation under any batch split. Under heavy
drift assignments can migrate between batches — the published
mini-batch behavior, and precisely what the drift signal is for. Centroid drift per batch is
tracked so a refit can be scheduled when the quantizer has moved too
far — the maintenance signal sim_ivf_incremental's oracle checks at
batch scale.

At 100 TB this runs as the index-maintenance leg NEXT TO the serving
index: assignments partition new vectors to their IVF lists at ingest;
this maintainer keeps list statistics and centroids fresh between full
refits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class IVFMaintainer:
    """foreachBatch sink body maintaining IVF centroids + list sizes.

    ``centroids``: {cluster: list[float]} initial quantizer (e.g. a
    label_centroids / kmeans_fit result collected to the driver — k
    metadata rows). Call :meth:`update` per batch; read
    :attr:`counts`, :attr:`centroids`, :attr:`last_drift_micro`, or
    :meth:`centroids_df` for a broadcastable DataFrame."""

    def __init__(
        self,
        centroids: dict[int, list[float]],
        vec_col: str = "embedding",
        round_digits: int = 6,
    ):
        self.centroids: dict[int, list[float]] = {
            int(k): [float(x) for x in v] for k, v in centroids.items()
        }
        self.dim = len(next(iter(self.centroids.values())))
        self.vec_col = vec_col
        self.round_digits = round_digits
        self.counts: dict[int, int] = {k: 0 for k in self.centroids}
        self.last_drift_micro: dict[int, int] = {}
        self.n_rows = 0
        self.n_batches = 0

    def centroids_df(self, spark) -> DataFrame:
        rows = [(k, v) for k, v in sorted(self.centroids.items())]
        return spark.createDataFrame(rows, "cluster int, centroid array<double>")

    def update(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        import math

        from denormalized_spark.operators.similarity import assign_clusters

        self.n_batches += 1
        spark = batch_df.sparkSession
        cent = self.centroids_df(spark)
        # attach a synthetic id for the argmax window if none given
        b = batch_df.withColumn("_ivf_id", F.monotonically_increasing_id())
        assigned = assign_clusters(
            b, cent, "_ivf_id", self.vec_col, self.round_digits
        )
        stats = assigned.groupBy("cluster").agg(
            F.count("*").cast("long").alias("m"),
            *[
                F.sum(F.element_at(self.vec_col, j + 1).cast("double")).alias(
                    f"_s{j}"
                )
                for j in range(self.dim)
            ],
        ).collect()  # k metadata rows — never vectors
        for r in stats:
            k, m = int(r["cluster"]), int(r["m"])
            if m == 0:
                continue
            self.n_rows += m
            n = self.counts[k]
            old = self.centroids[k]
            new = [
                round((n * old[j] + float(r[f"_s{j}"])) / (n + m),
                      self.round_digits)
                for j in range(self.dim)
            ]
            drift = math.sqrt(sum((a - b_) ** 2 for a, b_ in zip(new, old)))
            self.last_drift_micro[k] = int(drift * 1_000_000 + 0.5)
            self.centroids[k] = new
            self.counts[k] = n + m
