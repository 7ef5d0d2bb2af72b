"""Multimodal column plumbing: image/audio/video as opaque binary.

Convention: a modality column is ``binary`` payload + a typed
metadata struct (``{mime, width, height, duration_ms, ...}``). The
Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual codecs (PIL/ffmpeg/...)
are not in this container, so the decode kernels are STUBBED: they
raise ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic md5-seeded fake is produced (tests use the fake path).

Scale notes: binary payloads ride the normal columnar path
(parquet binary columns), so partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` like any column. Decode runs in
``mapInPandas`` — per-partition Arrow batches, one Python worker per
task, no shuffle. Feature vectors come back as array<float> ready for
operators.similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

AUDIO_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def attach_image_meta(df: DataFrame, binary_col: str, mime: str = "image/png") -> DataFrame:
    """Attach a metadata struct column for an opaque image payload.
    Real pipelines read this from the container header at ingest."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
        ),
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: md5-chained floats in
    [0,1). Stable across runs/engines — usable in assertions."""
    out = []
    seed = payload or b""
    h = hashlib.md5(seed).digest()
    while len(out) < dim:
        for i in range(0, len(h), 4):
            out.append(int.from_bytes(h[i : i + 4], "big") / 2**32)
            if len(out) == dim:
                break
        h = hashlib.md5(h).digest()
    return out


def image_features(
    df: DataFrame,
    binary_col: str = "payload",
    dim: int = 16,
    *,
    fake: bool = False,
) -> DataFrame:
    """binary image -> feature vector via mapInPandas.

    The Arrow plumbing (batch iterator in, batch iterator out,
    schema = input + features array<float>) is the real operator;
    only the kernel is stubbed (no image libs in this container).
    """
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/opencv (not in this container); "
                    "pass fake=True for the deterministic test kernel"
                )
            pdf = pdf.copy()
            pdf["features"] = [
                _fake_features(bytes(p) if p is not None else b"", dim)
                for p in pdf[binary_col]
            ]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def audio_chunks(
    df: DataFrame,
    binary_col: str = "payload",
    chunk_ms: int = 1000,
    sample_rate: int = 16_000,
    bytes_per_sample: int = 2,
    *,
    fake: bool = False,
) -> DataFrame:
    """audio binary → exploded fixed-duration chunk rows
    (chunk_idx, offset_bytes, chunk binary, chunk_hash) — the audio
    analogue of :func:`sample_frames` (ASR/audio-tokenizer pipelines
    segment before feature extraction). Chunk boundaries come from the
    PCM geometry ``sample_rate × bytes_per_sample × chunk_ms/1000``;
    a real kernel would decode the container first (ffmpeg — stubbed
    here), but the byte segmentation, fan-out shape, and Arrow batch
    plumbing are identical and fully exercised in fake mode. Fan-out:
    rows × ceil(len/chunk_bytes); size partitions for the post-explode
    volume at scale."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("offset_bytes", T.LongType()),
            T.StructField("chunk", T.BinaryType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )
    chunk_bytes = max(1, sample_rate * bytes_per_sample * chunk_ms // 1000)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires ffmpeg/soundfile (not in this container)"
                )
            if pdf.empty:
                continue
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[binary_col]) if row[binary_col] is not None else b""
                n_chunks = max(1, -(-len(payload) // chunk_bytes))
                for ci in range(n_chunks):
                    chunk = payload[ci * chunk_bytes : (ci + 1) * chunk_bytes]
                    d = dict(row)
                    d["chunk_idx"] = ci
                    d["offset_bytes"] = ci * chunk_bytes
                    d["chunk"] = chunk
                    d["chunk_hash"] = hashlib.md5(chunk).hexdigest()
                    rows.append(d)
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame, binary_col: str = "payload", size: tuple[int, int] = (224, 224), *, fake: bool = False
) -> DataFrame:
    """binary -> resized binary. Stub kernel: identity passthrough in
    fake mode (real kernel: PIL resize per Arrow batch)."""
    schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires PIL (not in this container)")
            yield pdf

    return df.mapInPandas(kernel, schema)


def sample_frames(
    df: DataFrame,
    binary_col: str = "payload",
    every_ms: int = 1000,
    n_frames: int = 4,
    *,
    fake: bool = False,
) -> DataFrame:
    """video binary -> exploded frame rows (frame_idx, frame binary).
    Fan-out operator: output rows = input rows × n_frames; partition
    counts must be sized for the POST-explode volume at scale."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("frame_idx", T.IntegerType()), T.StructField("frame", T.BinaryType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling requires ffmpeg (not in this container)")
            if pdf.empty:
                continue
            # vectorized fan-out: repeat each row n_frames times, tile
            # the frame index — no per-row python loop over the frame
            # (the md5 itself is per-cell; a real ffmpeg kernel decodes
            # per payload the same way)
            out = pdf.loc[np.repeat(pdf.index.values, n_frames)].reset_index(drop=True)
            out["frame_idx"] = np.tile(np.arange(n_frames, dtype="int32"), len(pdf))
            out["frame"] = [
                hashlib.md5(
                    (bytes(p) if p is not None else b"") + str(i).encode()
                ).digest()
                for p, i in zip(out[binary_col], out["frame_idx"])
            ]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(kernel, out_schema)
