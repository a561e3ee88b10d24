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


def infer_embedding_dim(vecs: DataFrame) -> int | None:
    """Vector dimensionality of an (vec_id, embedding) frame: the
    single length shared by every non-empty embedding, or None when
    the frame is empty. Raises on a MIXED-dimensionality frame — the
    sign-LSH banding maps any wrong-length vector to one bucket, so a
    frame mixing embedding models would silently lose the mismatched
    rows' near-dups; checking only the first row would miss exactly
    that. One aggregate pass (collect_set over sizes merges map-side;
    the set is as small as the number of distinct models)."""
    dims = (
        vecs.agg(
            F.collect_set(F.size(F.col("embedding"))).alias("ds")
        ).first()["ds"]
        or []
    )
    return _single_dim(dims)


def _single_dim(dims) -> int | None:
    """The one positive dimensionality in a collect_set(size(...))
    result, None if empty — raising on a mixed-model frame."""
    dims = sorted(int(d) for d in dims if d > 0)
    if len(dims) > 1:
        raise ValueError(
            f"mixed embedding dimensionalities {dims}: sign-LSH "
            "hyperplanes are dim-specific, so one frame must carry one "
            "embedding model. Split the frame by dim (or fix the "
            "upstream embedder) before indexing/probing."
        )
    return dims[0] if dims else None


def index_geometry(index: DataFrame) -> tuple[int, int, int | None] | None:
    """``(n_bands, band_bits, dim)`` recorded in an embedding band
    index, or None for an empty index.

    Aggregated over EVERY row, not ``.first()`` (ADVICE r5): an index
    mixing pre-dim and post-dim partitions reads with null dim on the
    legacy rows (or a nondeterministic schema with mergeSchema off),
    and trusting whichever row ``.first()`` happened to return could
    silently hand a consumer the wrong geometry. Null dims coalesce to
    the pre-dim era's only valid value (_EMB_DIM); genuinely MIXED
    geometries raise — band buckets are only comparable under one
    (bands, bits, dim). The three columns are constant (parquet RLE),
    so the distinct-set scan merges map-side and stays one small job —
    the streaming drain calls this once per batch and passes the
    result down instead of letting every consumer re-probe."""
    from .suite.llmdata import _EMB_DIM

    dim_col = (
        F.coalesce(F.col("dim"), F.lit(_EMB_DIM))
        if "dim" in index.columns
        else F.lit(_EMB_DIM)
    )
    geoms = index.agg(
        F.collect_set(
            F.struct(
                F.col("n_bands"), F.col("band_bits"), dim_col.alias("dim")
            )
        ).alias("gs")
    ).first()["gs"]
    if not geoms:
        return None
    if len(geoms) > 1:
        listing = sorted(
            (g["n_bands"], g["band_bits"], g["dim"]) for g in geoms
        )
        raise ValueError(
            f"embedding band index mixes geometries {listing}: buckets "
            "are only comparable under one (n_bands, band_bits, dim). "
            "Rebuild the index with one geometry (reindex the legacy "
            "partitions) before probing."
        )
    g = geoms[0]
    return (g["n_bands"], g["band_bits"], g["dim"])


def embedding_band_index(
    vecs: DataFrame,
    geometry: tuple[int, int] | None = None,
    dim: int | None = None,
) -> DataFrame:
    """``(corpus_vec_id, band_idx, band_bucket, n_bands, band_bits,
    dim)`` — the embedding tier of the dedup index (dd6's banded
    sign-LSH geometry, auto-tuned from the corpus vector count unless
    pinned).

    The geometry columns — INCLUDING the vector dimensionality — are
    stored IN the index (constant columns, free under parquet RLE)
    because band buckets are only comparable under the same (bands,
    bits, dim): the hyperplanes are deterministic in (plane, dim), so
    a probe must bucket its batch with the index's recorded geometry,
    not whatever the current corpus would auto-tune to — otherwise
    growing past a tuning decade (or feeding a different embedding
    model) would silently unmatch or degenerate the whole index.
    ``dim`` is inferred from the corpus when not given (falling back
    to the testdata's 64 only for an EMPTY corpus, where the schema
    must still materialize)."""
    from .suite.llmdata import _dd6_geometry, _EMB_DIM, _emb_band_rows

    if geometry is None or dim is None:
        # ONE fused aggregate scan for whatever is missing (count for
        # the geometry auto-tune, dim set for the hyperplanes) — two
        # separate full passes over a huge embedding column would
        # contradict the module's no-corpus-rescan stance
        aggs = [F.count("*").alias("n")]
        if dim is None:
            aggs.append(
                F.collect_set(F.size(F.col("embedding"))).alias("ds")
            )
        row = vecs.agg(*aggs).first()
        if geometry is None:
            geometry = _dd6_geometry(row["n"])
        if dim is None:
            dim = _single_dim(row["ds"] or []) or _EMB_DIM
    n_bands, band_bits = geometry
    v = vecs.select(
        F.col("vec_id").alias("corpus_vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    return (
        _emb_band_rows(v, "corpus_vec_id", n_bands, band_bits, dim)
        .withColumn("n_bands", F.lit(n_bands))
        .withColumn("band_bits", F.lit(band_bits))
        .withColumn("dim", F.lit(dim))
    )


EMB_NEAR_DUP_THRESHOLD = 0.35  # dd6's verify floor


def incremental_embedding_neardup(
    new_vecs: DataFrame,
    corpus_vecs: DataFrame,
    *,
    index: DataFrame | None = None,
    threshold: float = EMB_NEAR_DUP_THRESHOLD,
    broadcast_batch: bool = True,
    geometry: tuple[int, int, int] | None = None,
) -> DataFrame:
    """Flag each new embedding against the corpus via the persistent
    band index — the vector-side twin of :func:`incremental_dedup`.

    Returns one row per new vector: ``(vec_id, dup_of, sim)`` with
    ``dup_of`` the best-matching corpus vec_id (highest cosine, ties
    to the lowest id) where cosine >= ``threshold``, else NULLs.
    Identical vectors share every band bucket, so exact copies are
    always candidates — no separate exact tier is needed.

    Scale shape mirrors the text path: batch band keys broadcast into
    the index probe, corpus vectors fetched only for candidate ids,
    geometry read from the index itself (see embedding_band_index) —
    or passed as ``geometry=(n_bands, band_bits, dim)`` by callers
    that already probed it (the streaming drain probes once per
    batch, not once per call). The batch's own dimensionality is
    validated against the index's recorded ``dim``: a mismatch maps
    every vector to one bucket, silently degrading the index probe to
    a |batch| x |corpus| cross product — so it raises instead.
    """
    from .operators.similarity import dot_product, vec_norm
    from .suite.llmdata import _dd6_geometry, _emb_band_rows

    maybe_bc = F.broadcast if broadcast_batch else (lambda df: df)
    if index is None:
        index = embedding_band_index(corpus_vecs)
    if geometry is None:
        geometry = index_geometry(index)
    batch_dim = infer_embedding_dim(new_vecs)  # raises on mixed dims
    if geometry is None:
        # empty corpus: no candidates possible; band the batch at its
        # own dim so the plan still materializes
        n_bands, band_bits = _dd6_geometry(0)
        dim = batch_dim
    else:
        # a caller-provided triple may carry dim=None ("index empty,
        # use the batch's own dim") — the streaming drain's first
        # batch passes this instead of making us re-probe the index
        n_bands, band_bits, dim = geometry
    if dim is None:
        dim = batch_dim
    if dim is None:
        from .suite.llmdata import _EMB_DIM

        dim = _EMB_DIM
    if batch_dim is not None and batch_dim != dim:
        raise ValueError(
            f"batch embeddings are {batch_dim}-dimensional but the "
            f"index was built at dim={dim}: sign-LSH hyperplanes are "
            "dim-specific, so probing would collapse every bucket. "
            "Rebuild the index with embedding_band_index over the "
            "new corpus, or fix the batch's embedding model."
        )

    newv = new_vecs.select(
        F.col("vec_id").alias("new_vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    new_bands = _emb_band_rows(newv, "new_vec_id", n_bands, band_bits, dim)
    candidates = (
        index.join(maybe_bc(new_bands), ["band_idx", "band_bucket"])
        .select("new_vec_id", "corpus_vec_id")
        .distinct()
    )
    cand_ids = candidates.select(
        F.col("corpus_vec_id").alias("vec_id")
    ).distinct()
    # norms once per vector (not per candidate pair) — bit-identical
    # to a per-pair cosine fold, a third of the verify cost
    cv = (
        corpus_vecs.join(maybe_bc(cand_ids), "vec_id", "left_semi")
        .select(
            F.col("vec_id").alias("corpus_vec_id"),
            F.col("embedding").cast("array<double>").alias("cv"),
        )
        .withColumn("cn", vec_norm("cv"))
    )
    nv = newv.select(
        "new_vec_id", F.col("v").alias("nv")
    ).withColumn("nn", vec_norm("nv"))
    best = Window.partitionBy("new_vec_id").orderBy(
        F.desc("s"), F.asc("corpus_vec_id")
    )
    flagged = (
        candidates.join(maybe_bc(nv), "new_vec_id")
        .join(cv, "corpus_vec_id")
        .withColumn(
            "s",
            F.try_divide(dot_product("nv", "cv"), F.col("nn") * F.col("cn")),
        )
        .filter(F.col("s") >= threshold)
        .withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            F.col("new_vec_id").alias("vec_id"),
            F.col("corpus_vec_id").alias("dup_of"),
            F.round("s", 4).alias("sim"),
        )
    )
    return new_vecs.select("vec_id").join(flagged, "vec_id", "left")


def incremental_embedding_oracle_sql(
    n_bands: int,
    band_bits: int,
    corpus: str = "corpus_vecs",
    batch: str = "batch_vecs",
    threshold: float = EMB_NEAR_DUP_THRESHOLD,
    dim: int | None = None,
) -> str:
    """DuckDB twin of :func:`incremental_embedding_neardup` over views
    ``corpus_vecs`` / ``batch_vecs`` (vec_id, embedding), at an
    explicit geometry (pass the (bands, bits, dim) the index
    records; dim defaults to the testdata's 64)."""
    from .operators.similarity import lsh_bucket_sql
    from .suite.llmdata import _EMB_DIM

    if dim is None:
        dim = _EMB_DIM

    def bands_sql(src: str) -> str:
        return "\n        UNION ALL\n".join(
            f"        SELECT vec_id, {b} AS band_idx,"
            f" {lsh_bucket_sql('v', dim, band_bits, plane_offset=b * band_bits)}"
            f" AS band_bucket FROM {src}"
            for b in range(n_bands)
        )

    return f"""
    WITH ce AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {corpus}
    ),
    be AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {batch}
    ),
    cbands AS (
{bands_sql('ce')}
    ),
    bbands AS (
{bands_sql('be')}
    ),
    cand AS (
        SELECT DISTINCT b.vec_id AS new_vec_id, c.vec_id AS corpus_vec_id
        FROM bbands b JOIN cbands c
          ON b.band_idx = c.band_idx AND b.band_bucket = c.band_bucket
    ),
    verified AS (
        SELECT cand.new_vec_id, cand.corpus_vec_id,
               list_cosine_similarity(bv.v, cv.v) AS s
        FROM cand
        JOIN be bv ON bv.vec_id = cand.new_vec_id
        JOIN ce cv ON cv.vec_id = cand.corpus_vec_id
        WHERE list_cosine_similarity(bv.v, cv.v) >= {threshold}
    ),
    best AS (
        SELECT new_vec_id AS vec_id, corpus_vec_id AS dup_of,
               round(s, 4) AS sim
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY new_vec_id ORDER BY s DESC, corpus_vec_id
            ) AS rn
            FROM verified
        ) WHERE rn = 1
    )
    SELECT b.vec_id, best.dup_of, best.sim
    FROM {batch} b
    LEFT JOIN best ON best.vec_id = b.vec_id
    """


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
