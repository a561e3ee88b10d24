"""Unit tests for the multimodal binary-column operators
(operators/multimodal.py): schema, mapInPandas batch plumbing, the
stubbed decoder, and the deterministic fake decoder."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from inpe_queimadas_etl_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    decode_media,
    extract_features,
    fake_decode,
    media_from_documents,
    nn_resize,
    resize_media,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return media_from_documents(docs).cache()


def _shape(schema: T.StructType) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in schema.fields]


def test_media_schema_is_binary(media):
    assert _shape(media.schema) == _shape(MEDIA_SCHEMA)
    row = media.orderBy("media_id").first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.kind in ("image", "audio", "video")
    assert row.meta.width >= 16 and row.meta.height >= 16


def test_extract_features_matches_local(media, spark):
    feats = extract_features(media)
    assert _shape(feats.schema) == _shape(FEATURE_SCHEMA)
    got = {r.media_id: r for r in feats.collect()}
    for row in media.collect():
        b = np.frombuffer(bytes(row.payload), dtype=np.uint8)
        r = got[row.media_id]
        assert r.byte_len == len(b)
        assert r.mean_byte == pytest.approx(float(b.sum()) / len(b))
        hist = np.bincount(b >> 5, minlength=8)
        assert [getattr(r, f"h{i}") for i in range(8)] == hist[:8].tolist()


def test_sample_frames_explodes_rows(media):
    frames = sample_frames(media, frame_bytes=32, stride=4)
    assert _shape(frames.schema) == _shape(FRAME_SCHEMA)
    one = media.orderBy("media_id").first()
    b = bytes(one.payload)
    rows = (
        frames.filter(F.col("media_id") == one.media_id)
        .orderBy("frame_idx")
        .collect()
    )
    n_frames = (len(b) + 31) // 32
    assert [r.frame_idx for r in rows] == list(range(0, n_frames, 4))
    for r in rows:
        chunk = b[r.frame_idx * 32 : (r.frame_idx + 1) * 32]
        assert r.frame_len == len(chunk)
        assert r.frame_md5 == hashlib.md5(chunk).hexdigest()


def test_decode_media_stub_raises(media):
    with pytest.raises(Exception) as exc:
        decode_media(media, use_fake=False).limit(1).collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_decode_media_fake_is_deterministic(media):
    decoded = decode_media(media, use_fake=True)
    assert _shape(decoded.schema) == _shape(DECODED_SCHEMA)
    rows = {r.media_id: r for r in decoded.collect()}
    for row in media.collect():
        arr = fake_decode(bytes(row.payload), row.meta.asDict())
        r = rows[row.media_id]
        assert r.shape == [row.meta.height, row.meta.width]
        assert r.pixels_md5 == hashlib.md5(arr.tobytes()).hexdigest()


def test_nn_resize_gather_semantics():
    arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = nn_resize(arr, 2, 2)
    # src rows (0*3//2, 1*3//2) = (0, 1); src cols (0*4//2, 1*4//2) = (0, 2)
    assert out.tolist() == [[0, 2], [4, 6]]
    # upscale repeats source pixels, never interpolates
    up = nn_resize(arr, 6, 4)
    assert up.shape == (6, 4)
    assert set(np.unique(up)) <= set(np.unique(arr))


def test_resize_media_matches_local(media):
    resized = resize_media(media, dst_h=8, dst_w=12, use_fake=True)
    assert _shape(resized.schema) == _shape(RESIZED_SCHEMA)
    rows = {r.media_id: r for r in resized.collect()}
    for row in media.limit(20).collect():
        arr = fake_decode(bytes(row.payload), row.meta.asDict())
        out = nn_resize(arr, 8, 12)
        r = rows[row.media_id]
        assert r.src_shape == [row.meta.height, row.meta.width]
        assert r.dst_shape == [8, 12]
        assert r.resized_md5 == hashlib.md5(out.tobytes()).hexdigest()
        assert r.mean_px == pytest.approx(float(out.mean()))
