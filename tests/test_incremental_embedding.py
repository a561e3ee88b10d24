"""Embedding-side incremental near-dup (incremental.py): new vectors
flagged against a persistent sign-LSH band index, DuckDB oracle
parity (geo8 pattern — unregistered, registry stays at 50)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow

from inpe_queimadas_etl_spark.incremental import (
    embedding_band_index,
    incremental_embedding_neardup,
    incremental_embedding_oracle_sql,
)

SF0001 = "/root/testdata/sf0.001"

_EXACT_OFF = 200_000
_NEAR_OFF = 100_000


@pytest.fixture(scope="module")
def vec_splits(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet").toPandas()
    emb["embedding"] = emb["embedding"].map(np.asarray)
    cut = int(emb["vec_id"].max() * 0.8)
    corpus = emb[emb["vec_id"] <= cut].reset_index(drop=True)
    natural = emb[emb["vec_id"] > cut].reset_index(drop=True)
    rng = np.random.default_rng(7)
    seeds = corpus[corpus["vec_id"] % 23 == 0]
    exact = seeds.copy()
    exact["vec_id"] = exact["vec_id"] + _EXACT_OFF
    near = seeds.copy()
    near["vec_id"] = near["vec_id"] + _NEAR_OFF
    near["embedding"] = near["embedding"].map(
        lambda v: (v + rng.normal(0, 1e-3, size=len(v))).astype(np.float32)
    )
    batch = pd.concat([natural, exact, near], ignore_index=True)
    for df in (corpus, batch):
        df["embedding"] = df["embedding"].map(
            lambda v: np.asarray(v, dtype=np.float32).tolist()
        )
    return corpus[["vec_id", "embedding"]], batch[["vec_id", "embedding"]]


def test_matches_duckdb_oracle(spark, vec_splits):
    corpus_pd, batch_pd = vec_splits
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    idx = embedding_band_index(corpus)
    geom = idx.select("n_bands", "band_bits").first()
    got = (
        incremental_embedding_neardup(batch, corpus, index=idx)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("corpus_vecs", corpus_pd)
    con.register("batch_vecs", batch_pd)
    want = (
        con.execute(
            incremental_embedding_oracle_sql(
                geom["n_bands"], geom["band_bits"]
            )
        )
        .df()
        .sort_values("vec_id", ignore_index=True)
    )
    assert len(got) == len(batch_pd) == len(want)
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    gd, wd = got["dup_of"], want["dup_of"]
    assert gd.isna().equals(wd.isna()), "dup_of nullability mismatch"
    assert gd.dropna().astype(int).tolist() == wd.dropna().astype(int).tolist()
    gs, ws = got["sim"].astype(float), want["sim"].astype(float)
    assert gs.isna().equals(ws.isna())
    assert ((gs - ws).abs().dropna() < 1e-6).all()


def test_planted_copies_flagged(spark, vec_splits):
    corpus_pd, batch_pd = vec_splits
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    res = (
        incremental_embedding_neardup(batch, corpus)
        .toPandas()
        .set_index("vec_id")
    )
    seeds = [
        v - _EXACT_OFF for v in batch_pd["vec_id"] if v >= _EXACT_OFF
    ]
    assert seeds
    for s in seeds:
        ex = res.loc[s + _EXACT_OFF]
        assert ex["dup_of"] == s, (s, dict(ex))
        assert ex["sim"] >= 0.9999
        nr = res.loc[s + _NEAR_OFF]
        assert nr["dup_of"] == s, (s, dict(nr))
        assert nr["sim"] >= 0.99


def test_index_geometry_is_pinned(spark, vec_splits):
    """A probe must bucket with the geometry the index RECORDS, not
    the auto-tuned default — pinned by building at a non-default
    geometry and checking the result equals an inline run at that
    same geometry."""
    corpus_pd, batch_pd = vec_splits
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    idx = embedding_band_index(corpus, geometry=(4, 8)).localCheckpoint(
        eager=True
    )
    assert idx.select("n_bands").first()["n_bands"] == 4
    via_index = (
        incremental_embedding_neardup(batch, corpus, index=idx)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    inline_idx = embedding_band_index(corpus, geometry=(4, 8))
    inline = (
        incremental_embedding_neardup(batch, corpus, index=inline_idx)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(via_index, inline)
    # and exact copies are still caught at the coarser geometry
    flagged = set(via_index.dropna(subset=["dup_of"])["vec_id"])
    assert all(
        v in flagged for v in batch_pd["vec_id"] if v >= _EXACT_OFF
    )


def _rand_vecs(dim: int, n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [
                rng.normal(0, 1, size=dim).astype(np.float32).tolist()
                for _ in range(n)
            ],
        }
    )


def test_index_records_corpus_dim_and_bands_meaningfully(spark):
    """The sign-LSH hyperplanes are dim-specific: an index over a
    non-64-dim corpus must record that dim and produce NON-degenerate
    buckets (a wrong-dim banding maps every vector to one bucket,
    collapsing the index probe to a cross product — the pre-fix
    behavior for any real 384/768-dim embedding corpus)."""
    corpus_pd = _rand_vecs(16, 60, seed=3)
    corpus = spark.createDataFrame(corpus_pd)
    idx = embedding_band_index(corpus).toPandas()
    assert (idx["dim"] == 16).all()
    # random 16-dim vectors must spread over many buckets per band
    per_band = idx.groupby("band_idx")["band_bucket"].nunique()
    assert (per_band > 1).all(), per_band


def test_dim_mismatch_raises_instead_of_degenerating(spark):
    """Probing a 64-dim index with 16-dim batch vectors must raise —
    silently bucketing everything to one key would turn the index
    into a |batch| x |corpus| cross product."""
    corpus = spark.createDataFrame(_rand_vecs(64, 40, seed=5))
    batch = spark.createDataFrame(_rand_vecs(16, 10, seed=6))
    idx = embedding_band_index(corpus)
    with pytest.raises(ValueError, match="dim"):
        incremental_embedding_neardup(batch, corpus, index=idx)


def test_nondefault_dim_neardup_end_to_end(spark):
    """The full incremental flow at dim=16: planted exact and
    jittered copies are flagged, fresh vectors are not."""
    corpus_pd = _rand_vecs(16, 50, seed=11)
    rng = np.random.default_rng(12)
    batch_rows = []
    for i, src in enumerate((3, 17)):
        v = np.asarray(corpus_pd.loc[src, "embedding"])
        batch_rows.append((1000 + i, v.tolist()))  # exact copy
        batch_rows.append(
            (
                2000 + i,
                (v + rng.normal(0, 1e-3, size=16))
                .astype(np.float32)
                .tolist(),
            )
        )
    batch_rows.append((3000, rng.normal(0, 1, size=16).astype(np.float32).tolist()))
    batch_pd = pd.DataFrame(batch_rows, columns=["vec_id", "embedding"])
    corpus = spark.createDataFrame(corpus_pd)
    batch = spark.createDataFrame(batch_pd)
    res = (
        incremental_embedding_neardup(batch, corpus)
        .toPandas()
        .set_index("vec_id")
    )
    for i, src in enumerate((3, 17)):
        assert res.loc[1000 + i, "dup_of"] == src
        assert res.loc[1000 + i, "sim"] >= 0.9999
        assert res.loc[2000 + i, "dup_of"] == src
        assert res.loc[2000 + i, "sim"] >= 0.99


def test_index_geometry_legacy_and_mixed_partitions(spark):
    """index_geometry aggregates EVERY row (ADVICE r5), not .first():
    legacy pre-dim partitions (null dim after a schema-merge read)
    coalesce to the pre-dim era's only valid value; a genuinely mixed
    geometry raises instead of silently handing back whichever row
    happened to come first."""
    from inpe_queimadas_etl_spark.incremental import index_geometry
    from inpe_queimadas_etl_spark.suite.llmdata import _EMB_DIM

    schema = (
        "corpus_vec_id long, band_idx int, band_bucket long, "
        "n_bands int, band_bits int, dim int"
    )
    # legacy rows: null dim; modern rows: recorded default dim
    mixed_era = spark.createDataFrame(
        [
            (1, 0, 11, 8, 16, None),
            (2, 0, 12, 8, 16, _EMB_DIM),
        ],
        schema,
    )
    assert index_geometry(mixed_era) == (8, 16, _EMB_DIM)

    # mixed MODELS: legacy (-> _EMB_DIM) vs a 384-dim partition
    mixed_model = spark.createDataFrame(
        [
            (1, 0, 11, 8, 16, None),
            (2, 0, 12, 8, 16, 384),
        ],
        schema,
    )
    with pytest.raises(ValueError, match="mixes geometries"):
        index_geometry(mixed_model)

    # empty index -> None; dim column absent entirely -> default dim
    assert index_geometry(mixed_era.limit(0)) is None
    no_dim = spark.createDataFrame(
        [(1, 0, 11, 8, 16)],
        "corpus_vec_id long, band_idx int, band_bucket long, "
        "n_bands int, band_bits int",
    )
    assert index_geometry(no_dim) == (8, 16, _EMB_DIM)


def test_mixed_era_index_parquet_read_surfaces_dim(spark, tmp_path):
    """The drain's sink reads merge schemas (ADVICE r5 follow-up): a
    legacy pre-dim partition next to a modern one must read WITH the
    dim column (null on legacy rows) — without mergeSchema Spark can
    resolve the no-dim footer and index_geometry's mixed-model guard
    would never see the modern rows' dim to compare against."""
    from inpe_queimadas_etl_spark.incremental import index_geometry
    from inpe_queimadas_etl_spark.streaming import _read_or_empty

    legacy = spark.createDataFrame(
        [(1, 0, 11, 8, 16)],
        "corpus_vec_id long, band_idx int, band_bucket long, "
        "n_bands int, band_bits int",
    )
    modern = spark.createDataFrame(
        [(2, 0, 12, 8, 16, 384)],
        "corpus_vec_id long, band_idx int, band_bucket long, "
        "n_bands int, band_bits int, dim int",
    )
    root = str(tmp_path / "bands")
    legacy.write.parquet(f"{root}/batch_id=0")
    modern.write.parquet(f"{root}/batch_id=1")
    df = _read_or_empty(spark, root, modern)
    assert "dim" in df.columns
    # legacy rows coalesce to the pre-dim default (64) vs modern 384:
    # a genuinely mixed-model index, refused loudly
    with pytest.raises(ValueError, match="mixes geometries"):
        index_geometry(df.drop("batch_id") if "batch_id" in df.columns else df)
