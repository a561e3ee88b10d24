"""Multimodal column operators: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video alongside
text. The engine models media as an opaque ``binary`` payload column
plus a typed metadata struct, and implements the per-item operators
(feature extraction, frame sampling, decode) as Arrow-batched
``mapInPandas`` transforms so the payloads never leave the executor
and never pass through row-at-a-time Python.

Scale notes:
- payload bytes stay columnar end-to-end (parquet binary -> Arrow
  buffer -> numpy ``frombuffer`` view — zero copies per batch);
- every operator is map-side (no shuffle): partitioning of the media
  table is preserved, so a downstream groupBy on ``media_id`` can
  reuse it;
- real image/audio codecs are not available in this container, so
  ``decode_media`` is a clearly-marked stub behind an import-try; the
  Spark-side plumbing (schema, batch iteration, output shape) is real
  and tested, and ``fake_decode`` provides a deterministic stand-in
  with the same signature for tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

_KINDS = ["image", "audio", "video"]


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministically lift the ``documents`` table into the media
    model: payload = UTF-8 bytes of the text, kind/meta derived from
    stable columns. This is the test stand-in for a real binary lake
    (the payload column is genuinely ``binary``; every downstream
    operator treats it as opaque bytes)."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]),
        (F.col("doc_id") % len(_KINDS)).cast("int") + 1,
    )
    meta = F.struct(
        (16 + F.col("n_chars") % 32).cast("int").alias("width"),
        (16 + F.col("n_chars") % 24).cast("int").alias("height"),
        (1 + F.col("n_chars") % 7).cast("int").alias("n_frames"),
        F.lit(16000).alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


_FEATURE_BINS = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
    + [T.StructField(f"h{i}", T.LongType()) for i in range(_FEATURE_BINS)]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-item feature extraction over the opaque payload: byte
    length, exact mean byte value, and an 8-bin byte histogram
    (bin = byte // 32). Arrow-batched ``mapInPandas``; the histogram
    is ``np.bincount`` over a zero-copy byte view."""

    def featurize(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(b >> 5, minlength=_FEATURE_BINS)
                total = int(b.sum(dtype=np.int64))
                rows.append(
                    (int(mid), len(b), float(total) / len(b) if len(b) else None)
                    + tuple(int(h) for h in hist[:_FEATURE_BINS])
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, stride: int = 4
) -> DataFrame:
    """Frame sampling for video-like payloads: split the payload into
    fixed-size frames and keep every ``stride``-th one (the classic
    decode-free keyframe subsample). Emits one row per kept frame —
    ``mapInPandas`` output may have more rows than its input, which is
    exactly what a frame exploder needs."""

    def sample(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(i)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("src_shape", T.ArrayType(T.IntegerType())),
        T.StructField("dst_shape", T.ArrayType(T.IntegerType())),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("mean_px", T.DoubleType()),
    ]
)


def nn_resize(arr: np.ndarray, dst_h: int, dst_w: int) -> np.ndarray:
    """Nearest-neighbor resample to (dst_h, dst_w): the index map is
    ``src_i = floor(i * src_h / dst_h)`` — pure integer gather, fully
    vectorized, identical on every platform (no float interpolation)."""
    src_h, src_w = arr.shape
    rows = (np.arange(dst_h) * src_h) // dst_h
    cols = (np.arange(dst_w) * src_w) // dst_w
    return arr[np.ix_(rows, cols)]


def resize_media(
    media: DataFrame, dst_h: int = 16, dst_w: int = 16, use_fake: bool = False
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> summarize, per item, as one
    Arrow-batched ``mapInPandas`` pass (the standard image-normalization
    step before feature extraction in a training pipeline). Map-side
    only; the codec is the same stub/fake switch as
    :func:`decode_media` — the resize math itself
    (:func:`nn_resize`) is real and deterministic."""

    def resize(batches):
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                if not use_fake:
                    raise NotImplementedError(
                        "media codecs (PIL/soundfile/av) not available in "
                        "this container; pass use_fake=True for the "
                        "deterministic stand-in decoder"
                    )
                arr = fake_decode(bytes(payload), meta)
                out = nn_resize(arr, dst_h, dst_w)
                rows.append(
                    (
                        int(mid),
                        list(arr.shape),
                        list(out.shape),
                        hashlib.md5(out.tobytes()).hexdigest(),
                        float(out.mean()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("shape", T.ArrayType(T.IntegerType())),
        T.StructField("pixels_md5", T.StringType()),
    ]
)


def fake_decode(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decoder: tile the payload bytes into an
    (height, width) uint8 array from the metadata dims. Same signature
    a real codec-backed decoder would have."""
    h, w = int(meta["height"]), int(meta["width"])
    b = np.frombuffer(payload, dtype=np.uint8)
    if b.size == 0:
        return np.zeros((h, w), dtype=np.uint8)
    reps = (h * w + b.size - 1) // b.size
    return np.tile(b, reps)[: h * w].reshape(h, w)


def decode_media(media: DataFrame, use_fake: bool = False) -> DataFrame:
    """Decode payloads to pixel/sample arrays via ``mapInPandas``.

    Real decoding needs PIL / soundfile / av, none of which ship in
    this container — the codec call is STUBBED: without ``use_fake``
    each row raises ``NotImplementedError`` at executor time. With
    ``use_fake=True`` the deterministic :func:`fake_decode` runs, so
    the full Spark plumbing (binary batch in, decoded summary out) is
    exercised end to end."""

    def decode(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if not use_fake:
                    raise NotImplementedError(
                        "media codecs (PIL/soundfile/av) not available in this "
                        "container; pass use_fake=True for the deterministic "
                        "stand-in decoder"
                    )
                arr = fake_decode(bytes(payload), meta)
                rows.append(
                    (
                        int(mid),
                        str(kind),
                        list(arr.shape),
                        hashlib.md5(arr.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)
