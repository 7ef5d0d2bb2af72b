"""Streaming infrastructure: checkpoint/state-store configuration."""

from denormalized_spark.streaming.checkpoint import (
    ROCKSDB_PROVIDER,
    checkpoint_dir,
    enable_rocksdb_state_store,
)

__all__ = ["ROCKSDB_PROVIDER", "checkpoint_dir", "enable_rocksdb_state_store"]
