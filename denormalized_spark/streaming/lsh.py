"""Streaming near-duplicate detection against a PERSISTENT banded
LSH index — the maintainer twin of the batch MinHash-LSH dedup family
(operators/dedup.lsh_candidate_pairs / near_dedup_batch) and the
third member of the foreachBatch-maintainer trio beside
streaming/sketches.SketchMaintainer and streaming/ivf.IVFMaintainer
(r13 verdict new-wave item c).

Contrast with operators/dedup.near_dedup_stream (the Structured
Streaming stateful-operator form): that gate keeps bucket ownership
in Spark's watermark-TTL'd state store, so its memory horizon IS the
watermark. This maintainer instead owns a DURABLE index at a parquet
path — unbounded horizon, inspectable between runs, shareable with
the batch pipeline — which is what a production ingest dedup leg
actually wants: "have we EVER seen this content" rather than "have we
seen it in the last hour".

Per micro-batch (everything distributed; ONLY counters reach the
driver):

1. signature + banding of the batch — pure JVM expressions
   (minhash_signature + band_structs, the exact batch operators);
2. probe: batch band rows anti/semi-joined against the index on
   (band, band_key).  The batch side is broadcast, so the probe is a
   map-side hash join over the index scan — no shuffle of the index;
   at 100 TB store the index bucketed/partitioned so the scan prunes;
3. within-batch claims: min-id per new bucket (deterministic owner —
   same tie-break the batch funnel's canonical-survivor rule uses);
4. docs that own ALL their bands survive; the rest are flagged as
   near-dups of earlier content;
5. the new buckets are APPENDED to the index parquet (partitioned by
   band), becoming visible to the next batch.

Determinism contract: feeding batches B₁, B₂, … equals the batch
near-dedup run over B₁∪B₂∪… processed in (batch, id) order — the
parity test replays exactly that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_INDEX_SCHEMA = "band int, band_key string, owner_id long"


class LSHDedupMaintainer:
    """foreachBatch sink body maintaining a banded LSH dedup index.

    ``index_path``: parquet directory holding (band, band_key,
    owner_id); created on first batch. Call :meth:`update` per batch;
    it returns the batch's SURVIVORS (docs whose content is new) as a
    DataFrame and records driver-side counters (:attr:`n_seen`,
    :attr:`n_survived`, :attr:`n_flagged`, :attr:`n_buckets_added`).
    """

    def __init__(
        self,
        index_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_hashes: int = 8,
        bands: int = 4,
        shingle_n: int = 3,
    ):
        self.index_path = index_path
        self.id_col = id_col
        self.text_col = text_col
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self.n_seen = 0
        self.n_survived = 0
        self.n_flagged = 0
        self.n_buckets_added = 0
        self.n_batches = 0

    def _index(self, spark) -> DataFrame:
        if os.path.isdir(self.index_path) and any(
            f.endswith(".parquet")
            for _, _, fs in os.walk(self.index_path)
            for f in fs
        ):
            return spark.read.schema(_INDEX_SCHEMA).parquet(self.index_path)
        return spark.createDataFrame([], _INDEX_SCHEMA)

    def update(self, batch_df: DataFrame, epoch_id: int | None = None) -> DataFrame:
        from denormalized_spark.operators.dedup import (
            band_structs,
            minhash_signature,
        )

        self.n_batches += 1
        spark = batch_df.sparkSession
        idx = self._index(spark)
        banded = (
            batch_df.select(
                F.col(self.id_col).alias("_id"),
                minhash_signature(
                    self.text_col, self.num_hashes, self.shingle_n
                ).alias("_mh"),
            )
            .select(
                "_id",
                F.explode(
                    band_structs("_mh", self.num_hashes, self.bands)
                ).alias("_bk"),
            )
            .select("_id", F.col("_bk.band").alias("band"),
                    F.col("_bk.band_key").alias("band_key"))
        )
        # the batch side is small: broadcast it into both probe joins
        # so the index is never shuffled
        banded = F.broadcast(banded.localCheckpoint(eager=True))
        # buckets already owned by earlier content
        hit_idx = banded.join(idx, ["band", "band_key"], "left_semi")
        # within-batch claim: min id per bucket (deterministic owner)
        claims = banded.groupBy("band", "band_key").agg(
            F.min("_id").alias("_owner")
        )
        # a band row is LOST if its bucket is in the index, or a
        # smaller id claimed it within this batch
        lost = hit_idx.select("_id").union(
            banded.join(claims, ["band", "band_key"])
            .filter(F.col("_id") != F.col("_owner"))
            .select("_id")
        ).distinct()
        survivors = (
            banded.select("_id").distinct()
            .join(lost, "_id", "left_anti")
            .select(F.col("_id").alias(self.id_col))
        )
        # new buckets -> owned by the batch claimant, appended to the
        # index (visible to the NEXT batch)
        new_buckets = (
            claims.join(idx, ["band", "band_key"], "left_anti")
            .select(
                F.col("band").cast("int"),
                "band_key",
                F.col("_owner").cast("long").alias("owner_id"),
            )
        )
        n_new = new_buckets.count()
        new_buckets.write.mode("append").partitionBy("band").parquet(
            self.index_path
        )
        n_docs = batch_df.select(self.id_col).distinct().count()
        n_surv = survivors.count()
        self.n_seen += n_docs
        self.n_survived += n_surv
        self.n_flagged += n_docs - n_surv
        self.n_buckets_added += n_new
        return survivors
