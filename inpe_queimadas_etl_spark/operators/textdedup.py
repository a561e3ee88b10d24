"""Passage-granular text dedup: remove spans duplicated verbatim
across documents (boilerplate, licence headers, templated sections)
and reassemble each doc's residual text in original order — the
"dedup inside documents" tier whole-document jaccard cannot see.

Two chunking modes:
- ``fixed``     — sliding-free fixed windows of ``chunk_words`` words
  (the dd8 suite entry; right for corpora without structural
  separators, and the mode the DuckDB oracle checks);
- ``paragraph`` — split on a literal separator (default a blank
  line), each paragraph one chunk; right for real crawl/markdown
  corpora where boilerplate aligns to paragraph boundaries.

Scale design (both modes): chunking is map-side; the duplicated-span
set is a hash-groupBy over 64-bit chunk hashes (uniform keys,
two-phase distinct-count partials — chunk STRINGS never shuffle for
detection); removal is a left-anti join on those hashes; reassembly
sorts each doc's surviving chunks inside one groupBy via a struct
array_sort — no window, no second shuffle. Per-doc chunk totals come
from the split length without an explode. The dup set is the only
broadcast-unsafe artifact and stays a fraction of corpus size (only
repeated spans survive the HAVING).

Reference anchor: the reference's dedup surface is whole-row
(transform/inpe_focos_diario.py:166-169); this operator is part of
the training-data extension family (SURVEY §2 stretch).
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def passage_dedup(
    docs: DataFrame,
    *,
    mode: str = "fixed",
    chunk_words: int = 8,
    min_docs: int = 2,
    sep: str = "\n\n",
    text_col: str = "text",
) -> DataFrame:
    """One row per doc: ``(doc_id, clean_text, n_chunks, n_removed)``
    with every chunk appearing verbatim in >= ``min_docs`` distinct
    docs removed from all of them and the survivors rejoined in order
    (space-joined for ``fixed``, ``sep``-joined for ``paragraph``)."""
    if mode == "fixed":
        split_pat, joiner = " ", " "
        docs_w = docs.select(
            "doc_id", F.split(text_col, split_pat).alias("w")
        )
        k = chunk_words
        chunk_arr: Column = F.expr(
            f"transform(sequence(0, cast(ceil(size(w) / {k}.0) as int) - 1),"
            f" c -> concat_ws(' ', slice(w, c * {k} + 1, {k})))"
        )
    elif mode == "paragraph":
        joiner = sep
        docs_w = docs.select(
            "doc_id", F.split(text_col, _re.escape(sep)).alias("w")
        )
        chunk_arr = F.col("w")
    else:
        raise ValueError(f"unknown passage_dedup mode {mode!r}")

    dup = (
        docs_w.select(
            "doc_id",
            F.explode(F.transform(chunk_arr, lambda x: F.xxhash64(x))).alias(
                "h"
            ),
        )
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    chunks = docs_w.select(
        "doc_id", F.posexplode(chunk_arr).alias("c", "chunk")
    ).withColumn("h", F.xxhash64("chunk"))
    kept = chunks.join(dup, "h", "left_anti")
    re = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "chunk"))),
                lambda x: x["chunk"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    n_chunks = (
        F.ceil(F.size("w") / chunk_words).cast("bigint")
        if mode == "fixed"
        else F.size("w").cast("bigint")
    )
    tot = docs_w.select("doc_id", n_chunks.alias("n_chunks"))
    return tot.join(re, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_chunks",
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias(
            "n_removed"
        ),
    )
