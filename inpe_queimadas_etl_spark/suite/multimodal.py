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


# --- mm5: media near-dup via frame-level SimHash ---------------------------
# Decode-free perceptual dedup for binary payloads (re-encoded images,
# re-containered audio/video share most CONTENT frames even when the
# byte stream differs): a 64-bit SimHash over 32-byte frame hashes,
# banded 4 x 16 bits so candidates come from an equi self-join on
# 16-bit band values, then exact Hamming verification (<= 3, which by
# pigeonhole over 4 bands always leaves a shared band — the same
# declared-recall contract as dd5/dd6). Geometry math, not vibes:
# a RANDOM pair collides in one 16-bit band with probability 2^-16,
# so candidates ~ 4 n^2 / 2^17, and a random pair passes hamming <= 3
# of 64 bits at C(64,<=3)/2^64 ~ 2e-15 — false positives are
# practically zero (the first cut of this operator used 16-bit
# signatures with 4-bit bands, which admitted 25 % of ALL pairs as
# candidates and passed unrelated pairs at 0.2 % — the exact
# quadratic cliff SCALING.md documents for dd6's original 4x4
# geometry; review caught it, this is the fix). The signature is two
# 32-bit words (BIGINT-safe everywhere); votes fold map-side over the
# per-row frame array — no explode, no shuffle until the banded join.
# The majority tie rule (sum >= 0 -> bit set) matches dd5's
# 2*count >= n convention (llmdata.py dd5); the frame hash is the
# md5-hex-to-int convention every dedup oracle shares.
#
# UNREGISTERED (50-entry driver snapshot cap) — oracle-compared in
# tests/test_suite_oracle.py.

_MM5_FRAME = 32
_MM5_WORD_BITS = 32          # per signature word; 2 words = 64 bits
_MM5_BAND_BITS = 16          # 2 bands per word, 4 bands total
_MM5_MAX_HAMMING = 3


def _mm5_sql() -> str:
    # the oracle frames TEXT where Spark frames the payload BYTES —
    # exact because the testdata payloads are the UTF-8 bytes of
    # ASCII text (the same parity convention mm3/mm4 state)
    from .llmdata import _hex_to_int_sql

    frame = (
        f"substr(text, CAST(i AS INTEGER) * {_MM5_FRAME} + 1, {_MM5_FRAME})"
    )
    h1 = _hex_to_int_sql(f"substr(md5({frame}), 1, 8)")
    h2 = _hex_to_int_sql(f"substr(md5({frame}), 9, 8)")

    def word_sig(col: str, alias: str) -> str:
        return f"""
    SELECT media_id,
           CAST(sum(CASE WHEN s >= 0 THEN 1 << b ELSE 0 END) AS BIGINT)
               AS {alias}
    FROM (
        SELECT media_id, b, sum((({col} >> b) & 1) * 2 - 1) AS s
        FROM frames CROSS JOIN (
            SELECT unnest(range(0, {_MM5_WORD_BITS})) AS b
        )
        GROUP BY media_id, b
    ) GROUP BY media_id
"""

    return f"""
WITH frames AS (
    SELECT doc_id AS media_id, {h1} AS h1, {h2} AS h2
    FROM (
        SELECT doc_id, text,
               unnest(range(0, (length(text) + {_MM5_FRAME - 1})
                               // {_MM5_FRAME})) AS i
        FROM documents
    )
),
sig_hi AS ({word_sig("h1", "hi")}),
sig_lo AS ({word_sig("h2", "lo")}),
sig AS (
    SELECT sig_hi.media_id, hi, lo
    FROM sig_hi JOIN sig_lo ON sig_hi.media_id = sig_lo.media_id
),
bands AS (
    SELECT media_id, hi, lo, b AS band_idx,
           CASE WHEN b < 2
                THEN (hi >> (b * {_MM5_BAND_BITS}))
                     & {2 ** _MM5_BAND_BITS - 1}
                ELSE (lo >> ((b - 2) * {_MM5_BAND_BITS}))
                     & {2 ** _MM5_BAND_BITS - 1}
           END AS band_val
    FROM sig CROSS JOIN (SELECT unnest(range(0, 4)) AS b)
),
cand AS (
    SELECT DISTINCT a.media_id AS media_a, a.hi AS hi_a, a.lo AS lo_a,
                    c.media_id AS media_b, c.hi AS hi_b, c.lo AS lo_b
    FROM bands a JOIN bands c
      ON a.band_idx = c.band_idx AND a.band_val = c.band_val
     AND a.media_id < c.media_id
)
SELECT media_a, media_b,
       CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
            AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b))
      <= {_MM5_MAX_HAMMING}
"""


MM5_SQL = _mm5_sql()


def mm5_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate media pairs by frame-level SimHash: Hamming
    distance <= 3 over 64-bit signatures, candidates from a 4 x
    16-bit banded equi self-join.

    Scale design: frame hashing and the per-bit majority folds run as
    array higher-order functions over each row's frame array — the
    signature pass is scan-shaped; the signature table (three longs
    per item) is localCheckpointed before the self-join so the
    payload scan + hashing pipeline runs ONCE, not once per join side
    (the dd4 lesson). Candidate volume is ~4 n^2 / 2^17 on random
    signatures — at 1M items ~3e7 pairs, each verified by two
    bit_counts with no payload access; genuinely-correlated corpora
    (near-dup heavy) grow candidates with true pairs, which is the
    output size. Identical payloads agree on every band, so exact
    dups are always found; a pair at hamming <= 3 always shares a
    band (4 bands, 3 flipped bits), so recall within the declared
    threshold is exact."""
    media = media_from_documents(
        load_table(spark, sf_dir, "documents")
    ).filter(F.length("payload") > 0)
    frame = (
        f"substring(payload, i * {_MM5_FRAME} + 1, {_MM5_FRAME})"
    )
    frames = F.expr(
        f"""transform(
            sequence(0, cast(ceil(length(payload) / {_MM5_FRAME}.0) as int) - 1),
            i -> struct(
                cast(conv(substring(md5({frame}), 1, 8), 16, 10) as bigint)
                    as h1,
                cast(conv(substring(md5({frame}), 9, 8), 16, 10) as bigint)
                    as h2
            )
        )"""
    )

    def word_sig(field: str):
        votes = [
            F.expr(
                f"aggregate(hs, 0L, (acc, f) -> "
                f"acc + (shiftright(f.{field}, {b}) & 1L) * 2 - 1)"
            )
            for b in range(_MM5_WORD_BITS)
        ]
        return sum(
            (
                F.when(v >= 0, F.lit(1 << b)).otherwise(F.lit(0))
                for b, v in enumerate(votes)
            ),
            F.lit(0),
        ).cast("long")

    sigs = (
        media.select("media_id", frames.alias("hs"))
        .select(
            "media_id",
            word_sig("h1").alias("hi"),
            word_sig("h2").alias("lo"),
        )
        .localCheckpoint(eager=True)
    )
    band_arr = F.expr(
        f"""transform(sequence(0, 3), b -> CASE WHEN b < 2
            THEN shiftright(hi, b * {_MM5_BAND_BITS})
                 & {2 ** _MM5_BAND_BITS - 1}
            ELSE shiftright(lo, (b - 2) * {_MM5_BAND_BITS})
                 & {2 ** _MM5_BAND_BITS - 1} END)"""
    )
    bands = sigs.select(
        "media_id",
        "hi",
        "lo",
        F.posexplode(band_arr).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    c = bands.alias("c")
    cand = (
        a.join(
            c,
            (F.col("a.band_idx") == F.col("c.band_idx"))
            & (F.col("a.band_val") == F.col("c.band_val"))
            & (F.col("a.media_id") < F.col("c.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("a.hi").alias("hi_a"),
            F.col("a.lo").alias("lo_a"),
            F.col("c.media_id").alias("media_b"),
            F.col("c.hi").alias("hi_b"),
            F.col("c.lo").alias("lo_b"),
        )
        .distinct()
    )
    hamming = (
        F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
        + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
    ).cast("long")
    return cand.select(
        "media_a", "media_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= _MM5_MAX_HAMMING)
