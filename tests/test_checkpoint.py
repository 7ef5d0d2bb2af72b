"""Checkpoint/recovery: kill a windowed streaming query, restart from
the same checkpoint, observe (a) offset resume — already-read files
are not reprocessed, (b) state restore — a window whose rows all
arrived before the restart emits (once) after it, (c) no re-emission
of windows closed before the restart.

This is the contract the reference implements by hand:
offset persistence/resume (kafka_stream_read.rs:108-140) and window
accumulator state restore (grouped_window_agg_stream.rs:160-211).
Spark equivalent: the checkpoint's offset WAL + state store — plus
the RocksDB provider (state_backend/rocksdb_backend.rs analogue),
enabled here to prove the config path works.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from denormalized_spark.datastream import DataStream
from denormalized_spark.streaming.checkpoint import (
    checkpoint_dir,
    enable_rocksdb_state_store,
    use_default_state_store,
)

BASE = "2024-01-01 "


def _write_file(spark, tmp_path, stream_dir, rows, name, age_s):
    df = spark.createDataFrame(rows).select(F.to_timestamp("ts_str").alias("ts"), "v")
    tmp_out = str(tmp_path / f"_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp_out)
    part = [f for f in os.listdir(tmp_out) if f.endswith(".parquet")][0]
    dest = str(stream_dir / name)
    os.rename(os.path.join(tmp_out, part), dest)
    t = time.time() - age_s
    os.utime(dest, (t, t))


def _run(spark, stream_dir, schema, ckpt, timeout=180):
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stream_dir))
    )
    rows = []
    q = DataStream(sdf, event_time="ts").window(
        [], [F.count("*").alias("n")], 3600_000
    ).sink(lambda df: rows.extend(df.collect()), checkpoint=ckpt)
    q.awaitTermination(timeout)
    return rows


def test_kill_restart_resumes_offsets_and_state(spark, tmp_path):
    stream_dir = tmp_path / "ck_stream"
    stream_dir.mkdir()
    ckpt = checkpoint_dir(str(tmp_path), "winq")

    # hour 0: 3 rows; hour 1: 2 rows (still open at first shutdown)
    _write_file(
        spark,
        tmp_path,
        stream_dir,
        [
            Row(ts_str=BASE + "00:10:00", v=1),
            Row(ts_str=BASE + "00:20:00", v=1),
            Row(ts_str=BASE + "00:50:00", v=1),
            Row(ts_str=BASE + "01:10:00", v=1),
            Row(ts_str=BASE + "01:20:00", v=1),
        ],
        "a.parquet",
        age_s=100,
    )
    schema = spark.read.parquet(str(stream_dir)).schema

    enable_rocksdb_state_store(spark)
    try:
        # run 1: drains file A, watermark → 01:20, emits hour-0 only
        rows1 = _run(spark, stream_dir, schema, ckpt)
        emitted1 = {r["window_start_time"].hour: r["n"] for r in rows1}
        assert emitted1 == {0: 3}, rows1

        # "crash": query already terminated; new data lands
        _write_file(
            spark,
            tmp_path,
            stream_dir,
            [Row(ts_str=BASE + "02:10:00", v=1), Row(ts_str=BASE + "02:20:00", v=1),
             Row(ts_str=BASE + "03:05:00", v=1)],
            "b.parquet",
            age_s=0,
        )

        # run 2, same checkpoint: must NOT reprocess file A (offset
        # resume), must emit hour-1 from RESTORED state and hour-2
        # from new data, must NOT re-emit hour 0.
        rows2 = _run(spark, stream_dir, schema, ckpt)
        emitted2 = {r["window_start_time"].hour: r["n"] for r in rows2}
        assert emitted2 == {1: 2, 2: 2}, rows2
    finally:
        use_default_state_store(spark)


def test_fresh_checkpoint_reprocesses_everything(spark, tmp_path):
    """Control: without the old checkpoint the same directory replays
    from scratch — proving run 2 above really did resume."""
    stream_dir = tmp_path / "ck_stream2"
    stream_dir.mkdir()
    _write_file(
        spark,
        tmp_path,
        stream_dir,
        [
            Row(ts_str=BASE + "00:10:00", v=1),
            Row(ts_str=BASE + "01:10:00", v=1),
            Row(ts_str=BASE + "02:10:00", v=1),
        ],
        "a.parquet",
        age_s=100,
    )
    schema = spark.read.parquet(str(stream_dir)).schema
    rows = _run(spark, stream_dir, schema, checkpoint_dir(str(tmp_path), "fresh"))
    emitted = {r["window_start_time"].hour: r["n"] for r in rows}
    assert emitted == {0: 1, 1: 1}  # hour-2 window held (wm = 02:10)


def test_context_with_checkpointing_builder(spark, tmp_path, sf_dir):
    """Reference README.md:100-111 builder parity: one call enables
    the RocksDB state backend and a default checkpoint root; a sink
    started WITHOUT checkpoint= lands its state under that root."""
    import os

    from denormalized_spark.context import Context
    from denormalized_spark.streaming.checkpoint import ROCKSDB_PROVIDER

    root = str(tmp_path / "ckroot")
    ctx = Context(spark).with_checkpointing(root)
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass") == ROCKSDB_PROVIDER
    assert spark.conf.get("spark.sql.streaming.checkpointLocation") == root

    from pyspark.sql import functions as F

    sds = ctx.from_stream_parquet(sf_dir, "events", event_time="ts")
    rows = []
    q = sds.window([], [F.count("*").alias("n")], 3600_000).sink(
        lambda df: rows.extend(df.collect())
    )
    q.awaitTermination(120)
    assert rows and os.listdir(root)  # state landed under the root


def test_quality_monitor_restart_no_reemission(spark, tmp_path):
    """The windowed corpus-quality monitor (curation_quality_monitor's
    plan) across a kill/restart: hour-0 quality stats emit once in run
    1; run 2 from the same checkpoint emits the restored hour-1 window
    exactly once, with the same mean_quality the batch plan computes —
    windowed-agg state restore for a TEXT pipeline, not just counts."""
    from denormalized_spark.operators.text import quality_score, token_count

    stream_dir = tmp_path / "qm_stream"
    stream_dir.mkdir()
    ckpt = checkpoint_dir(str(tmp_path), "qmon")

    good = ("the quick brown fox jumps over the lazy dog and then runs into "
            "the woods while it is still light outside today")

    def doc_rows(specs):
        return [Row(ts_str=t, v=txt) for t, txt in specs]

    _write_file(
        spark, tmp_path, stream_dir,
        doc_rows([
            (BASE + "00:05:00", good),
            (BASE + "00:25:00", "x"),
            (BASE + "01:10:00", good),
            (BASE + "01:30:00", good),
        ]),
        "a.parquet", age_s=100,
    )
    schema = spark.read.parquet(str(stream_dir)).schema

    def run(timeout=180):
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(stream_dir))
        )
        m = sdf.withWatermark("ts", "0 seconds").select(
            F.window("ts", "1 hour").alias("w"),
            token_count("v").alias("nt"),
            quality_score("v").alias("q"),
        )
        agg = (
            m.groupBy("w")
            .agg(F.count("*").alias("n_docs"), F.round(F.avg("q"), 6).alias("mq"))
            .select(F.col("w.start").alias("ws"), "n_docs", "mq")
        )
        rows = []
        q = (
            agg.writeStream.foreachBatch(lambda df, _e: rows.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout)
        return rows

    rows1 = run()
    got1 = {r["ws"].hour: (r["n_docs"], r["mq"]) for r in rows1}
    assert set(got1) == {0} and got1[0][0] == 2

    _write_file(
        spark, tmp_path, stream_dir,
        doc_rows([(BASE + "02:20:00", "y")]),
        "b.parquet", age_s=0,
    )
    rows2 = run()
    got2 = {r["ws"].hour: (r["n_docs"], r["mq"]) for r in rows2}
    # hour-1 from restored state exactly once, never hour-0 again
    assert set(got2) == {1}, rows2
    assert got2[1][0] == 2
    # restored-state quality equals the batch computation on hour-1 docs
    batch = spark.createDataFrame([(good,), (good,)], ["v"]).agg(
        F.round(F.avg(quality_score("v")), 6)
    ).collect()[0][0]
    assert got2[1][1] == batch
