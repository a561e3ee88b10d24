"""Incremental corpus dedup: flag a NEW batch against an EXISTING
corpus without rescanning the corpus.

At 100 TB the dominant dedup cost is not one batch's self-join — it is
re-deduplicating the whole corpus every time a crawl snapshot lands.
The scale-correct shape is a persistent INDEX, built once and appended
per accepted batch:

- exact index  — one narrow row per corpus doc: ``(corpus_doc_id,
  text_hash)``;
- near index   — MinHash-LSH band keys (the dd3/dd4 signature
  machinery, ``suite/llmdata.py``): ``(corpus_doc_id, band_idx,
  band_hash)``.

A new batch is then flagged in three joins, none of which touches
unmatched corpus rows:

1. exact dups: ``md5(new.text)`` against the exact index — the batch
   side is broadcast (a crawl snapshot is small next to the corpus),
   so the index is streamed map-side with zero shuffle;
2. near candidates: band keys computed for the BATCH ONLY, broadcast
   against the near index — candidate volume scales with genuinely
   similar pairs, never ``|batch| x |corpus|``;
3. exact verification: 3-gram shingle Jaccard, with corpus text
   fetched via a semi-join for the MATCHED doc_ids only.

On a cluster both indexes live as parquet tables (write them with
``export.write_sharded``); ``exact_hash_index`` / ``minhash_band_index``
over the accepted (non-duplicate) batch rows are the append increment.

Reference anchor: the reference dedups within one daily file via an
in-memory seen-set (transform/inpe_focos_diario.py:166-169); this
lifts the same first-seen-wins contract to corpus scale with a
persistent index and a near-dup tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .suite.llmdata import (
    _band_struct_cols,
    _minhash_sig_cols,
    _SHINGLE_INT_EXPR,
    _shingles_spark,
)

# Jaccard floor for the near-dup tier — same contract as
# dd2_ngram_jaccard_pairs; candidates below it are discarded after
# exact verification.
NEAR_DUP_THRESHOLD = 0.5


def exact_hash_index(docs: DataFrame) -> DataFrame:
    """``(corpus_doc_id, text_hash)`` — the exact tier of the dedup
    index. One narrow row per corpus doc; append the accepted rows of
    each new batch to keep it current."""
    return docs.select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.md5("text").alias("text_hash"),
    )


def _band_keys(docs: DataFrame, id_alias: str) -> DataFrame:
    """MinHash band keys for ``docs``: ``(id_alias, band_idx,
    band_hash)`` — byte-identical to dd4's banding (md5-based shingle
    ints, 4 bands x 2 rows) so index rows written by the batch path
    and by this module interoperate."""
    sh = _shingles_spark(docs)
    # dd3's exact shingle->int mapping and dd4's exact banding, via
    # the shared builders — factored so index rows written here and
    # dd4's in-batch banding can never drift apart
    ints = sh.withColumn(
        "xs", F.expr(_SHINGLE_INT_EXPR).cast("array<long>")
    )
    sig = ints.select(F.col("doc_id").alias(id_alias), *_minhash_sig_cols())
    return sig.select(
        id_alias, F.explode(F.array(*_band_struct_cols())).alias("band")
    ).select(id_alias, "band.band_idx", "band.band_hash")


def minhash_band_index(docs: DataFrame) -> DataFrame:
    """``(corpus_doc_id, band_idx, band_hash)`` — the near-dup tier of
    the dedup index (MinHash-LSH band keys, dd4 geometry). Uniform
    hash keys: the candidate join is skew-free by construction."""
    return _band_keys(docs, "corpus_doc_id")


def incremental_dedup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    *,
    exact_index: DataFrame | None = None,
    band_index: DataFrame | None = None,
    threshold: float = NEAR_DUP_THRESHOLD,
    broadcast_batch: bool = True,
) -> DataFrame:
    """Flag each row of ``new_docs`` against the corpus.

    Returns one row per new doc: ``(doc_id, dup_kind, dup_of,
    jaccard)`` where ``dup_kind`` is ``'exact'`` / ``'near'`` / NULL,
    ``dup_of`` is the lowest matching corpus doc_id (exact tier) or
    the best-verified match (near tier: highest jaccard, ties to the
    lowest corpus id), and ``jaccard`` is the verified similarity
    (NULL for exact dups — they are definitionally 1.0 and skip the
    near tier).

    ``exact_index`` / ``band_index`` default to building from
    ``corpus_docs`` inline; pass precomputed index DataFrames (e.g.
    read back from parquet) to skip the corpus scan entirely — the
    100-TB deployment shape. ``corpus_docs`` is still required for
    near-dup verification, but only the candidate doc_ids' rows are
    read (semi-join), so a parquet corpus with doc_id clustering
    prunes to the matched row groups.

    ``broadcast_batch`` (default True) pins the batch as the
    broadcast side of the index probes — correct for the recurring
    snapshot shape where a batch is orders of magnitude smaller than
    the corpus. Pass False for a batch too large to broadcast (e.g. a
    backfill merging two corpora): the probes become plain shuffle
    joins on uniform hash keys, still skew-free.
    """
    maybe_bc = F.broadcast if broadcast_batch else (lambda df: df)
    if exact_index is None:
        exact_index = exact_hash_index(corpus_docs)
    if band_index is None:
        band_index = minhash_band_index(corpus_docs)

    new_h = new_docs.select(
        "doc_id", F.md5("text").alias("text_hash")
    )
    # batch side broadcast: the index streams map-side, no shuffle
    exact = (
        exact_index.join(maybe_bc(new_h), "text_hash")
        .groupBy("doc_id")
        .agg(F.min("corpus_doc_id").alias("exact_dup_of"))
    )

    # near tier: band keys for the batch only, joined against the
    # corpus band index; exact dups are excluded up front so the
    # expensive tier only sees docs that can still change state
    survivors = new_docs.join(exact, "doc_id", "left_anti")
    new_bands = _band_keys(survivors, "new_doc_id")
    candidates = (
        band_index.join(
            maybe_bc(new_bands), ["band_idx", "band_hash"]
        )
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    # verification: fetch text for matched corpus docs ONLY
    cand_corpus_ids = candidates.select(
        F.col("corpus_doc_id").alias("doc_id")
    ).distinct()
    corpus_sh = _shingles_spark(
        corpus_docs.join(maybe_bc(cand_corpus_ids), "doc_id", "left_semi")
    ).select(
        F.col("doc_id").alias("corpus_doc_id"),
        F.col("shingles").alias("c_sh"),
    )
    new_sh = _shingles_spark(survivors).select(
        F.col("doc_id").alias("new_doc_id"),
        F.col("shingles").alias("n_sh"),
    )
    n_inter = F.size(F.array_intersect("n_sh", "c_sh"))
    jac = n_inter / (F.size("n_sh") + F.size("c_sh") - n_inter)
    best = Window.partitionBy("new_doc_id").orderBy(
        F.desc("j"), F.asc("corpus_doc_id")
    )
    near = (
        candidates.join(maybe_bc(new_sh), "new_doc_id")
        .join(corpus_sh, "corpus_doc_id")
        .withColumn("j", jac)
        .filter(F.col("j") >= threshold)
        .withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            F.col("new_doc_id").alias("doc_id"),
            F.col("corpus_doc_id").alias("near_dup_of"),
            F.round("j", 4).alias("jaccard"),
        )
    )

    return (
        new_docs.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("exact_dup_of").isNotNull(), F.lit("exact"))
            .when(F.col("near_dup_of").isNotNull(), F.lit("near"))
            .alias("dup_kind"),
            F.coalesce("exact_dup_of", "near_dup_of").alias("dup_of"),
            F.when(
                F.col("exact_dup_of").isNull(), F.col("jaccard")
            ).alias("jaccard"),
        )
    )


def incremental_dedup_oracle_sql(
    corpus: str = "corpus",
    batch: str = "batch",
    threshold: float = NEAR_DUP_THRESHOLD,
) -> str:
    """DuckDB twin of :func:`incremental_dedup` over views named
    ``corpus`` / ``batch`` — exercised by
    ``tests/test_incremental_dedup.py`` (the geo8 pattern: judge-grade
    oracle comparison inside pytest; the driver registry stays at its
    50-entry cap)."""
    from .suite.llmdata import (
        _bands_select_sql,
        _shingles_sql,
        _sig_select_sql,
    )

    jac = (
        "1.0 * len(list_intersect(n.shingles, c.shingles)) / "
        "(len(n.shingles) + len(c.shingles) "
        "- len(list_intersect(n.shingles, c.shingles)))"
    )
    return f"""
    WITH corpus_sh AS ({_shingles_sql(corpus)}),
    batch_sh AS ({_shingles_sql(batch)}),
    corpus_sig AS ({_sig_select_sql('corpus_sh')}),
    batch_sig AS ({_sig_select_sql('batch_sh')}),
    corpus_bands AS ({_bands_select_sql('corpus_sig')}),
    batch_bands AS ({_bands_select_sql('batch_sig')}),
    exact AS (
        SELECT b.doc_id, min(c.doc_id) AS exact_dup_of
        FROM {batch} b JOIN {corpus} c ON md5(b.text) = md5(c.text)
        GROUP BY b.doc_id
    ),
    cand AS (
        SELECT DISTINCT nb.doc_id AS new_doc_id, cb.doc_id AS corpus_doc_id
        FROM batch_bands nb
        JOIN corpus_bands cb
          ON nb.band_idx = cb.band_idx AND nb.band_hash = cb.band_hash
        WHERE nb.doc_id NOT IN (SELECT doc_id FROM exact)
    ),
    verified AS (
        SELECT cand.new_doc_id, cand.corpus_doc_id, {jac} AS j
        FROM cand
        JOIN batch_sh n ON n.doc_id = cand.new_doc_id
        JOIN corpus_sh c ON c.doc_id = cand.corpus_doc_id
        WHERE {jac} >= {threshold}
    ),
    near AS (
        SELECT new_doc_id AS doc_id, corpus_doc_id AS near_dup_of,
               round(j, 4) AS jaccard
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY new_doc_id ORDER BY j DESC, corpus_doc_id
            ) AS rn
            FROM verified
        ) WHERE rn = 1
    )
    SELECT b.doc_id,
           CASE WHEN e.exact_dup_of IS NOT NULL THEN 'exact'
                WHEN n.near_dup_of IS NOT NULL THEN 'near' END AS dup_kind,
           coalesce(e.exact_dup_of, n.near_dup_of) AS dup_of,
           CASE WHEN e.exact_dup_of IS NULL THEN n.jaccard END AS jaccard
    FROM {batch} b
    LEFT JOIN exact e ON e.doc_id = b.doc_id
    LEFT JOIN near n ON n.doc_id = b.doc_id
    """
