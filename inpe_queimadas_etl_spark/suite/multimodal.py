"""Multimodal suite: opaque-binary media columns checked against a
character-arithmetic DuckDB oracle.

The media table is synthesized deterministically from ``documents``
(payload = UTF-8 bytes of the text — pure ASCII in the testdata, so
byte offsets equal character offsets and DuckDB can state byte-level
expectations with ``substr``/``unicode``). The Spark side runs the
real binary operators from ``operators/multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    extract_features,
    media_from_documents,
    resize_media,
    sample_frames,
)
from ..session import load_table
from . import query


@query(
    "mm1_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5,
           CAST(16 + n_chars % 32 AS INTEGER) AS width,
           CAST(16 + n_chars % 24 AS INTEGER) AS height
    FROM documents
    """,
)
def mm1_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-model lift: binary payload + typed metadata struct. The
    payload is genuinely BinaryType; byte length and MD5 are computed
    on the binary column JVM-side (no Python)."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


@query(
    "mm2_byte_histogram",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, length(text))) AS i
        FROM documents
    ),
    ords AS (
        SELECT doc_id,
               unicode(substr(text, CAST(i AS INTEGER) + 1, 1)) AS o
        FROM idx
    )
    SELECT doc_id AS media_id,
           CAST(count(*) AS BIGINT) AS byte_len,
           round(CAST(sum(o) AS DOUBLE) / count(*), 4) AS mean_byte,
           CAST(count(*) FILTER (o // 32 = 0) AS BIGINT) AS h0,
           CAST(count(*) FILTER (o // 32 = 1) AS BIGINT) AS h1,
           CAST(count(*) FILTER (o // 32 = 2) AS BIGINT) AS h2,
           CAST(count(*) FILTER (o // 32 = 3) AS BIGINT) AS h3,
           CAST(count(*) FILTER (o // 32 = 4) AS BIGINT) AS h4,
           CAST(count(*) FILTER (o // 32 = 5) AS BIGINT) AS h5,
           CAST(count(*) FILTER (o // 32 = 6) AS BIGINT) AS h6,
           CAST(count(*) FILTER (o // 32 = 7) AS BIGINT) AS h7
    FROM ords GROUP BY doc_id
    """,
)
def mm2_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads
    (byte histogram + exact mean byte), the decode-free fingerprint a
    multimodal pipeline computes before any codec work. Spark runs the
    real mapInPandas operator; the oracle recomputes per-character."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "byte_len",
        F.round("mean_byte", 4).alias("mean_byte"),
        *[f"h{i}" for i in range(8)],
    )


@query(
    "mm3_frame_sample",
    oracle="""
    WITH idx AS (
        SELECT doc_id, text,
               unnest(range(0, (length(text) + 31) // 32)) AS i
        FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS frame_idx,
           CAST(least(32, length(text) - CAST(i AS INTEGER) * 32) AS BIGINT)
               AS frame_len,
           md5(substr(text, CAST(i AS INTEGER) * 32 + 1, 32)) AS frame_md5
    FROM idx
    WHERE i % 4 = 0
    """,
)
def mm3_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: split each payload into 32-byte frames and keep
    every 4th (keyframe subsample). Exercises the one-row-in /
    many-rows-out mapInPandas shape a video pipeline needs."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, frame_bytes=32, stride=4)


@query(
    "mm4_media_resize",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id, text,
               16 + n_chars % 24 AS h, 16 + n_chars % 32 AS w,
               length(text) AS blen
        FROM documents
    )
    SELECT media_id,
           CAST(h AS BIGINT) AS src_h, CAST(w AS BIGINT) AS src_w,
           md5(list_aggregate(
               list_transform(generate_series(0, 255), k ->
                   chr(ascii(substr(text,
                       CAST(((((k // 16) * h) // 16) * w
                             + (((k % 16) * w) // 16)) % blen
                            AS INTEGER) + 1,
                       1)))),
               'string_agg', '')) AS resized_md5,
           list_aggregate(
               list_transform(generate_series(0, 255), k ->
                   ascii(substr(text,
                       CAST(((((k // 16) * h) // 16) * w
                             + (((k % 16) * w) // 16)) % blen
                            AS INTEGER) + 1,
                       1))),
               'avg') AS mean_px
    FROM m
    """,
)
def mm4_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media resize: decode (deterministic fake codec — the payload
    bytes tile into the meta's (height, width) grid), nearest-neighbor
    resample to 16x16 (pure integer gather, no interpolation), then
    summarize (md5 of resized bytes + mean pixel). The oracle restates
    the decode+gather in character arithmetic: resized[i,j] =
    payload[((i*h//16)*w + j*w//16) mod len], exact because the
    testdata payloads are ASCII. mean_px is a multiple of 1/256, so
    the float compares exactly.

    Scale design: one Arrow-batched mapInPandas pass over row-local
    payloads — the canonical image-normalization stage shape; with a
    real codec only the decode call changes
    (operators/multimodal.py:159-230)."""
    media = media_from_documents(load_table(spark, sf_dir, "documents"))
    out = resize_media(media, dst_h=16, dst_w=16, use_fake=True)
    return out.select(
        "media_id",
        F.element_at("src_shape", 1).cast("long").alias("src_h"),
        F.element_at("src_shape", 2).cast("long").alias("src_w"),
        "resized_md5",
        "mean_px",
    )
