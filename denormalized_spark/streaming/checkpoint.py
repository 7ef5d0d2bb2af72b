"""Checkpointing / state backend configuration.

The reference hand-builds a checkpointing subsystem: a barrier
orchestrator broadcasting epochs every 10 s
(crates/orchestrator/src/orchestrator.rs:29-81), per-partition Kafka
offset persistence + resume (kafka_stream_read.rs:108-140), window
accumulator state serialization/restore
(grouped_window_agg_stream.rs:160-211, :355-417), and pluggable
SlateDB/RocksDB state backends (state_backend/rocksdb_backend.rs:16-148).

On Spark every piece is built-in and engaged by configuration:

- **offset resume** — the checkpoint's offset log (WAL) records the
  exact source range per micro-batch; a restarted query replays from
  the last committed batch. (= the reference's BatchReadMetadata.)
- **operator state** — windowed-aggregation state lives in the state
  store, snapshotted per batch under ``checkpointLocation/state``;
  restored on restart so windows spanning a restart emit exactly
  once. (= the reference's accumulator serde.)
- **state backend** — the default provider keeps state on-heap +
  checkpoint files; the RocksDB provider (``enable_rocksdb_state_store``)
  moves it off-heap onto local SSD with changelog checkpointing —
  the right choice when keyed state exceeds executor memory (100 TB
  corpora ⇒ billions of window×key states). (= the reference's
  RocksDB backend, minus the hand-rolled serde.)

tests/test_checkpoint.py proves the contract the reference implements
by hand: kill a windowed file-stream query, restart from the same
checkpoint, observe state restore + offset resume + no re-emission of
closed windows.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

#: Spark's built-in RocksDB state store provider (equivalent of the
#: reference's rocksdb_backend.rs, but spill-capable and incremental).
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def enable_rocksdb_state_store(
    spark: SparkSession, *, changelog: bool = True
) -> SparkSession:
    """Switch streaming state to the RocksDB provider.

    ``changelog=True`` checkpoints per-batch deltas instead of full
    SST snapshots — the difference between O(changed keys) and
    O(total state) upload per batch, which is what makes large state
    viable on a 1000-executor cluster.

    Session-level conf: applies to queries STARTED afterwards; running
    queries keep their provider (it is sticky per checkpoint).
    """
    spark.conf.set(_PROVIDER_CONF, ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_CONF, "true" if changelog else "false")
    return spark


def use_default_state_store(spark: SparkSession) -> SparkSession:
    """Revert to the default (HDFS-backed in-memory) provider."""
    spark.conf.unset(_PROVIDER_CONF)
    return spark


def checkpoint_dir(base: str | None = None, name: str = "query") -> str:
    """Allocate a checkpoint directory.

    With ``base`` (a durable path — HDFS/S3/... in production) the
    directory is deterministic, so a restarted job resumes; without,
    a fresh local tempdir (tests / throwaway runs).
    """
    if base is not None:
        path = os.path.join(base, name)
        os.makedirs(path, exist_ok=True)
        return path
    return tempfile.mkdtemp(prefix=f"ckpt_{name}_")
