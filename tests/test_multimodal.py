"""Multimodal plumbing: binary columns + metadata structs through
mapInPandas (Arrow-batched). Kernels are the deterministic fakes; the
schema/partitioning/batch plumbing under test is the real operator."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from denormalized_spark.operators import multimodal


@pytest.fixture(scope="module")
def binary_df(spark):
    rows = [(i, hashlib.md5(str(i).encode()).digest()) for i in range(20)]
    return spark.createDataFrame(
        rows, T.StructType([
            T.StructField("img_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ])
    )


def test_image_features_fake_kernel(binary_df):
    out = multimodal.image_features(binary_df, "payload", dim=8, fake=True)
    assert out.schema["features"].dataType == T.ArrayType(T.FloatType())
    rows = out.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["features"]) == 8
        assert all(0.0 <= x < 1.0 for x in r["features"])
        # deterministic: must equal the driver-side fake
        expected = multimodal._fake_features(bytes(r["payload"]), 8)
        assert r["features"] == pytest.approx(expected, abs=1e-6)


def test_image_features_real_kernel_raises(binary_df):
    with pytest.raises(Exception, match="NotImplementedError|image decode"):
        multimodal.image_features(binary_df, "payload", fake=False).collect()


def test_features_feed_similarity(binary_df):
    """Extracted features must compose with operators.similarity —
    the multimodal → embedding-dedup pipeline contract."""
    from denormalized_spark.operators import similarity

    feats = multimodal.image_features(binary_df, "payload", dim=8, fake=True)
    pairs = similarity.lsh_bucketed_neighbors(
        feats, dim=8, num_planes=2, id_col="img_id", vec_col="features"
    )
    assert pairs.columns == ["id_a", "id_b", "cosine_sim"]
    pairs.count()  # executes the composed plan


def test_resize_passthrough(binary_df):
    out = multimodal.resize_images(binary_df, "payload", fake=True)
    assert out.schema == binary_df.schema
    assert out.count() == 20


def test_sample_frames_fanout(binary_df):
    out = multimodal.sample_frames(binary_df, "payload", n_frames=4, fake=True)
    rows = out.collect()
    assert len(rows) == 80  # 20 videos × 4 frames
    by_id = {}
    for r in rows:
        by_id.setdefault(r["img_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in by_id.values())
    # frames are deterministic md5 chains
    r0 = next(r for r in rows if r["img_id"] == 0 and r["frame_idx"] == 1)
    expected = hashlib.md5(hashlib.md5(b"0").digest() + b"1").digest()
    assert bytes(r0["frame"]) == expected


def test_attach_image_meta(binary_df):
    out = multimodal.attach_image_meta(binary_df, "payload", mime="image/jpeg")
    meta = out.select("payload_meta").first()["payload_meta"]
    assert meta["mime"] == "image/jpeg"
    assert meta["width"] is None


def test_audio_chunks_fake_kernel(binary_df):
    import hashlib

    from denormalized_spark.operators.multimodal import audio_chunks

    out = audio_chunks(
        binary_df, "payload", chunk_ms=1, sample_rate=4000, bytes_per_sample=1, fake=True
    ).collect()  # chunk_bytes = 4
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.img_id, []).append(r)
    for _img, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        payload = bytes(next(r for r in rows).payload)
        joined = b"".join(bytes(r.chunk) for r in rows)
        assert joined == payload  # chunks reassemble the payload
        for i, r in enumerate(rows):
            assert r.chunk_idx == i and r.offset_bytes == i * 4
            assert r.chunk_hash == hashlib.md5(bytes(r.chunk)).hexdigest()


def test_audio_chunks_real_kernel_raises(binary_df):
    import pytest

    from denormalized_spark.operators.multimodal import audio_chunks

    with pytest.raises(Exception, match="ffmpeg|NotImplemented"):
        audio_chunks(binary_df, "payload", fake=False).collect()
