"""dd6 band-geometry auto-tune (VERDICT r4 #4): (bands, bits) follow
corpus size so random-collision volume stays linear while recall at
cos 0.99 stays >= 99 %. The policy is quantized to decade-wide steps so
every oracle-checked corpus (<= 30k vectors) keeps the measured 8x12
geometry — the static DuckDB oracle's contract.

The sweep below measures BOTH properties empirically at 2k / 20k /
100k vectors: candidate collisions <= 0.5 % of all pairs, and >= 99 %
of 100 planted cos-0.99 near-dup pairs surfaced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from inpe_queimadas_etl_spark.suite.llmdata import (
    _DD6_THRESHOLD,
    _dd6_candidate_pairs,
    _dd6_geometry,
    dd6_embedding_neardup,
)

DIM = 64
N_PLANTED = 100
TARGET_COS = 0.99


def test_geometry_policy_steps():
    # the whole driver/oracle scale range keeps the measured 8x12
    for n in (100, 1_000, 10_000, 30_000):
        assert _dd6_geometry(n) == (8, 12)
    assert _dd6_geometry(100_000) == (12, 16)
    assert _dd6_geometry(1_000_000) == (16, 20)
    assert _dd6_geometry(50_000_000) == (20, 24)


def _corpus(n: int) -> pd.DataFrame:
    """n random unit vectors + N_PLANTED near-dups at EXACT cos 0.99
    (dup of vec j gets vec_id n + j)."""
    rng = np.random.default_rng(7)
    v = rng.standard_normal((n, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    base = v[:N_PLANTED]
    w = rng.standard_normal((N_PLANTED, DIM))
    w -= (w * base).sum(axis=1, keepdims=True) * base
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    dup = TARGET_COS * base + np.sqrt(1 - TARGET_COS**2) * w
    ids = list(range(n)) + [n + j for j in range(N_PLANTED)]
    vecs = np.vstack([v, dup])
    return pd.DataFrame(
        {"vec_id": ids, "embedding": [row.tolist() for row in vecs]}
    )


@pytest.mark.parametrize("n", [2_000, 20_000, 100_000])
def test_sweep_collisions_and_recall(spark, n):
    pdf = _corpus(n)
    emb = spark.createDataFrame(pdf).select(
        "vec_id", pdf_col_as_double("embedding")
    )
    n_total = n + N_PLANTED
    n_bands, band_bits = _dd6_geometry(n_total)
    cand = _dd6_candidate_pairs(emb, n_bands, band_bits).localCheckpoint(
        eager=True
    )
    n_cand = cand.count()
    all_pairs = n_total * (n_total - 1) / 2
    collision_rate = n_cand / all_pairs
    assert collision_rate <= 0.005, (n, n_bands, band_bits, collision_rate)

    planted_found = cand.filter(
        (cand.vec_b == cand.vec_a + n) & (cand.vec_a < N_PLANTED)
    ).count()
    assert planted_found >= 0.99 * N_PLANTED, (
        n,
        n_bands,
        band_bits,
        planted_found,
    )


def pdf_col_as_double(name):
    from pyspark.sql import functions as F

    return F.col(name).cast("array<double>").alias("v")


def test_dd6_end_to_end_tmp_corpus(spark, tmp_path):
    """Full dd6 over a written parquet corpus: the auto-tuned count ->
    geometry -> candidates -> exact-verify path surfaces the planted
    pairs with sim 0.99."""
    n = 5_000
    _corpus(n).to_parquet(tmp_path / "embeddings.parquet")
    out = dd6_embedding_neardup(spark, str(tmp_path))
    planted = (
        out.filter((out.vec_b == out.vec_a + n) & (out.vec_a < N_PLANTED))
        .select("sim")
        .collect()
    )
    assert len(planted) >= 0.99 * N_PLANTED
    assert all(abs(r["sim"] - TARGET_COS) < 0.001 for r in planted)
    # every reported pair respects the verify floor
    assert out.filter(out.sim < _DD6_THRESHOLD).count() == 0
