"""Incremental corpus dedup (incremental.py): a new batch flagged
against an existing corpus, judge-grade oracle comparison in DuckDB
(the geo8 pattern — unregistered, the driver registry stays at 50).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.incremental import (
    exact_hash_index,
    incremental_dedup,
    incremental_dedup_oracle_sql,
    minhash_band_index,
)

SF0001 = "/root/testdata/sf0.001"

# batch doc_id offsets for the synthesized positives
_EXACT_OFF = 200_000
_NEAR_OFF = 100_000


def _splits(spark):
    """corpus = 80% of sf0.001 documents; batch = the rest, plus
    guaranteed positives synthesized from corpus rows: exact copies
    (id + 200k) and near copies with the last two words dropped
    (id + 100k, jaccard >> 0.5 on 40+-word docs)."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    cut = int(docs.agg(F.max("doc_id")).first()[0] * 0.8)
    corpus = docs.filter(F.col("doc_id") <= cut)
    natural = docs.filter(F.col("doc_id") > cut)
    seeds = corpus.filter(F.col("doc_id") % 37 == 0)
    exact_copies = seeds.withColumn(
        "doc_id", F.col("doc_id") + F.lit(_EXACT_OFF)
    )
    near_copies = seeds.withColumn(
        "doc_id", F.col("doc_id") + F.lit(_NEAR_OFF)
    ).withColumn(
        "text",
        F.array_join(
            F.slice(
                F.split(F.col("text"), " "),
                1,
                F.greatest(F.size(F.split(F.col("text"), " ")) - 2, F.lit(3)),
            ),
            " ",
        ),
    )
    batch = natural.unionByName(exact_copies).unionByName(near_copies)
    return corpus, batch


@pytest.fixture(scope="module")
def split_dfs(spark):
    corpus, batch = _splits(spark)
    return corpus.toPandas(), batch.toPandas()


def _oracle(corpus_pd: pd.DataFrame, batch_pd: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("corpus", corpus_pd)
    con.register("batch", batch_pd)
    return con.execute(incremental_dedup_oracle_sql()).df()


def test_matches_duckdb_oracle(spark, split_dfs):
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    got = (
        incremental_dedup(batch, corpus)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = _oracle(corpus_pd, batch_pd).sort_values(
        "doc_id", ignore_index=True
    )
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(batch_pd) == len(want)
    for col in ("doc_id", "dup_kind", "dup_of"):
        g = got[col].astype(object).where(pd.notna(got[col]), None).tolist()
        w = want[col].astype(object).where(pd.notna(want[col]), None).tolist()
        assert g == w, f"{col}: {[(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b][:5]}"
    gj = got["jaccard"].astype(float)
    wj = want["jaccard"].astype(float)
    # null masks must agree exactly — fillna on the diff would let a
    # NULL-vs-value mismatch slip through as 0
    assert gj.isna().equals(wj.isna()), "jaccard nullability mismatch"
    assert ((gj - wj).abs().dropna() < 1e-9).all()


def test_synthesized_positives_flagged(spark, split_dfs):
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    res = incremental_dedup(batch, corpus).toPandas().set_index("doc_id")
    seeds = [
        d - _EXACT_OFF for d in batch_pd["doc_id"] if d >= _EXACT_OFF
    ]
    assert seeds, "fixture must synthesize exact copies"
    for s in seeds:
        row = res.loc[s + _EXACT_OFF]
        assert row["dup_kind"] == "exact"
        # dup_of is the LOWEST corpus doc with identical text — the
        # seed itself unless the corpus already contains an exact twin
        assert row["dup_of"] <= s
        row = res.loc[s + _NEAR_OFF]
        # a 2-word drop on a 40+-word doc keeps jaccard far above 0.5;
        # short seed docs may legitimately fall below — require the
        # long ones to be caught
        n_words = len(
            corpus_pd.set_index("doc_id").loc[s, "text"].split()
        )
        if n_words >= 40:
            assert row["dup_kind"] == "near", (s, n_words, dict(row))
            assert row["jaccard"] >= 0.5


def test_prebuilt_index_path_identical(spark, split_dfs):
    """Passing precomputed index DataFrames (the parquet round-trip
    deployment shape) yields the identical result."""
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    inline = (
        incremental_dedup(batch, corpus)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    ei = exact_hash_index(corpus).localCheckpoint(eager=True)
    bi = minhash_band_index(corpus).localCheckpoint(eager=True)
    prebuilt = (
        incremental_dedup(batch, corpus, exact_index=ei, band_index=bi)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(inline, prebuilt)


def _shingle_set(text: str) -> set:
    w = text.split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def test_soundness_and_exact_completeness(spark, split_dfs):
    """Independent pandas check, no SQL twin involved: every 'near'
    flag is genuinely >= threshold against its dup_of, and every batch
    doc whose text exists verbatim in the corpus is flagged 'exact'
    with the lowest matching corpus id."""
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    res = incremental_dedup(batch, corpus).toPandas().set_index("doc_id")
    ctext = corpus_pd.set_index("doc_id")["text"]
    btext = batch_pd.set_index("doc_id")["text"]
    by_text = corpus_pd.groupby("text")["doc_id"].min()

    for doc_id, row in res.iterrows():
        if row["dup_kind"] == "near":
            a = _shingle_set(btext.loc[doc_id])
            b = _shingle_set(ctext.loc[int(row["dup_of"])])
            j = len(a & b) / len(a | b)
            assert j >= 0.5 - 1e-9, (doc_id, j)
            assert abs(j - row["jaccard"]) < 1e-3, (doc_id, j, row["jaccard"])
    for doc_id, text in btext.items():
        if text in by_text.index:
            assert res.loc[doc_id, "dup_kind"] == "exact", doc_id
            assert res.loc[doc_id, "dup_of"] == by_text.loc[text], doc_id


def test_no_broadcast_mode_identical(spark, split_dfs):
    """broadcast_batch=False (the huge-batch/backfill shape) changes
    only the physical strategy, never the result."""
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    bc = (
        incremental_dedup(batch, corpus)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    no_bc = (
        incremental_dedup(batch, corpus, broadcast_batch=False)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(bc, no_bc)


def test_batch_side_broadcast_plan(spark, split_dfs):
    """The batch side must broadcast in both tiers: the corpus-sized
    index tables stream map-side, never shuffling on the corpus."""
    corpus_pd, batch_pd = split_dfs
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    plan = (
        incremental_dedup(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
