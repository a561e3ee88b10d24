"""Measured recall contracts for the ANN scale paths (r5).

sim3 (multi-band sign-LSH) and sim4 (IVF, nprobe=2) are approximate
by design — the oracles state the identical contract, so CORRECTNESS
checks can't see retrieval quality. These tests measure it against
exact brute force:

- the driver testdata's natural neighbor regime is HARD (true top-5
  at cos 0.3-0.5, where sign-LSH's s-curve is flat): r5 measured the
  old single-band sim3 at recall ~0.0 and nprobe=1 sim4 at 0.25 —
  the amplified versions must hold measured floors;
- the high-similarity regime (cos >= 0.95, near-dup retrieval — the
  primary 100-TB use case) must be near-perfect for sim3.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF001 = "/root/testdata/sf0.01"


def _exact_top5(V: np.ndarray, ids: np.ndarray, qidx: list[int]) -> dict:
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    out = {}
    for q in qidx:
        s = Vn[q] @ Vn.T
        s[q] = -2.0
        out[int(ids[q])] = set(
            int(i) for i in ids[np.argsort(-s, kind="stable")[:5]]
        )
    return out


def _load_testdata():
    pdf = pd.read_parquet(f"{SF001}/embeddings.parquet")
    V = np.vstack([np.asarray(v, dtype=float) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    order = np.argsort(ids)
    return V[order], ids[order]


def _recall_at_5(spark_fn, spark, sf_dir, exact: dict) -> float:
    got: dict[int, set[int]] = {}
    for r in spark_fn(spark, sf_dir).collect():
        got.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    return float(
        np.mean([len(got.get(q, set()) & nb) / 5 for q, nb in exact.items()])
    )


def test_sim3_and_sim4_natural_corpus_recall_floors(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim3_lsh_bucketed_ann,
        sim4_ivf_ann,
    )

    V, ids = _load_testdata()
    r3 = _recall_at_5(
        sim3_lsh_bucketed_ann, spark, SF001, _exact_top5(V, ids, list(range(8)))
    )
    # 16-band amplification on the hard regime: measured 0.25 via the
    # numpy mirror; floor leaves margin for tie-ordering differences
    assert r3 >= 0.2, r3

    qidx = [int(np.nonzero(ids == q)[0][0]) for q in range(8, 16)]
    r4 = _recall_at_5(sim4_ivf_ann, spark, SF001, _exact_top5(V, ids, qidx))
    # nprobe=2 measured 0.625 (nprobe=1 was 0.25)
    assert r4 >= 0.5, r4


def test_sim3_high_similarity_recall_near_perfect(spark, tmp_path):
    """Near-dup retrieval (cos 0.95): every planted duplicate must
    surface in its query's top-5 — banded miss probability at p =
    0.899 per plane is (1-0.899^8)^16 ~ 1e-4 — while the candidate
    set stays a small fraction of the corpus."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim3_lsh_bucketed_ann

    rng = np.random.default_rng(11)
    n = 2_000
    V = rng.standard_normal((n, 64))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    base = V[:8]
    w = rng.standard_normal((8, 64))
    w -= (w * base).sum(axis=1, keepdims=True) * base
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    V[n - 8 :] = 0.95 * base + np.sqrt(1 - 0.95**2) * w
    pd.DataFrame(
        {
            "vec_id": list(range(n)),
            "embedding": [row.tolist() for row in V],
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    rows = sim3_lsh_bucketed_ann(spark, str(tmp_path)).collect()
    by_q: dict[int, set[int]] = {}
    for r in rows:
        by_q.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    found = sum(1 for q in range(8) if (n - 8 + q) in by_q.get(q, set()))
    assert found == 8, (found, {q: sorted(by_q.get(q, set())) for q in range(8)})


def test_sim6_ivf_sq8_recall_matches_sim4_at_equal_candidates(spark):
    """The IVF x SQ8 composite must hold the float IVF path's recall
    at the same candidate budget (same K, same nprobe): int8
    reconstruction error is ~vscale/2 per component, far below the
    cos 0.3-0.5 neighbor gaps of this corpus. Measured: both 0.625 on
    the driver testdata."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim4_ivf_ann,
        sim6_ivf_sq8_ann,
    )

    V, ids = _load_testdata()
    qidx = [int(np.nonzero(ids == q)[0][0]) for q in range(8, 16)]
    exact = _exact_top5(V, ids, qidx)
    r4 = _recall_at_5(sim4_ivf_ann, spark, SF001, exact)
    r6 = _recall_at_5(sim6_ivf_sq8_ann, spark, SF001, exact)
    assert r6 >= r4, (r6, r4)
    assert r6 >= 0.5, r6
