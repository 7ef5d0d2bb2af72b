"""incremental_dedup_load — the daily-load dedup pattern end-to-end:
maintain a persistent LSH band index on disk and gate each day's
increment against ALL of history without ever rescanning it.

    PYTHONPATH=. python examples/incremental_dedup_load.py [sf_dir]

Day 0 bootstraps the index from an empty corpus; each subsequent day
the increment is deduped (a) against history via one keyed join with
the stored index and (b) within itself via the first-claimant band
gate, then the index parquet is replaced with the min-owner merge.
The operators are oracle-checked by the `dedup_incremental_gate`
query entry; this script shows the operational loop around them
(index persistence, day-over-day survivor accounting).

At 100 TB: write the index with .bucketBy(band_key) so the daily join
is shuffle-free, and keep per-day increments as separate partitions.
"""

import sys
import tempfile

from pyspark.sql import functions as F

from denormalized_spark import Context
from denormalized_spark.operators.dedup import band_index, near_dedup_incremental

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

ctx = Context()
spark = ctx.spark
docs = ctx.from_parquet(f"{sf_dir}/documents.parquet").df

index_path = tempfile.mkdtemp(prefix="dedup_index_") + "/bands"

# bootstrap: empty history
empty = spark.createDataFrame([], "doc_id long, text string")
band_index(empty).write.mode("overwrite").parquet(index_path)

for day in range(3):
    increment = docs.filter(F.col("doc_id") % 3 == day).select("doc_id", "text")
    index = spark.read.parquet(index_path)
    flags, updated = near_dedup_incremental(increment, index)
    stats = flags.agg(
        F.count("*").alias("arrived"),
        F.sum(F.col("dup_of_history").cast("int")).alias("dup_of_history"),
        F.sum(F.col("kept").cast("int")).alias("kept"),
    ).collect()[0]
    print(
        f"day {day}: arrived={stats['arrived']} "
        f"dup_of_history={stats['dup_of_history']} kept={stats['kept']}"
    )
    # replace the index atomically-ish (real pipelines write to a new
    # path and swap a pointer); materialize before overwriting the
    # input of this very plan
    new_index = updated.localCheckpoint(eager=True)
    new_index.write.mode("overwrite").parquet(index_path)

final = spark.read.parquet(index_path)
print(f"final index buckets: {final.count()}")
