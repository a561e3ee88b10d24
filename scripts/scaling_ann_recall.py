"""Recall regimes for the frozen-artifact ANN tier at 1M vectors.

The r10 sweep (`scaling_pq.py`) measured recall@5 ~= 0.07 at the
nprobe=2/K=64 budget on a RANDOM-gaussian corpus — the structureless
regime where true neighbors sit at cos ~0.2-0.3 and IVF clusters carry
no signal, so recall is bounded near the probed fraction (the r5
finding). This script adds the missing contrast: the SAME product
path (train_ann_model -> save/build -> api.ann_topk) over a corpus
WITH cluster structure (64 planted topics, vectors = topic center +
noise), where probing works — plus a same-run random-corpus control
and an `ann_topk_batch` Q=10k timing on the slimmed probe broadcast.

Ground truth is exact float64 cosine top-5 computed in chunked numpy
(ids tie-broken ascending — ties do not occur on continuous data at
float64); the ANN side is the real serving path, exact-rerank tail.

Usage: python scripts/scaling_ann_recall.py  [env: SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIM = 64
N = 1_000_000
K, NPROBE, CAND = 64, 2, 100
NQ = 32
QN_BATCH = 10_000


def gen(structured: bool, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if not structured:
        return rng.normal(0, 1, size=(N, DIM))
    centers = rng.normal(0, 1, size=(K, DIM))
    topics = rng.integers(0, K, size=N)
    return centers[topics] + 0.35 * rng.normal(0, 1, size=(N, DIM))


def exact_top5(X: np.ndarray, q_rows: np.ndarray) -> dict[int, set]:
    """Exact cosine top-5 per query over the full corpus (self
    excluded), chunked float64 numpy."""
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out: dict[int, set] = {}
    Q = Xn[q_rows]  # queries are in-store rows
    sims = np.empty((len(q_rows), N), dtype=np.float64)
    chunk = 200_000
    for lo in range(0, N, chunk):
        sims[:, lo : lo + chunk] = Q @ Xn[lo : lo + chunk].T
    for i, qid in enumerate(q_rows):
        s = sims[i].copy()
        s[qid] = -np.inf  # self-skip, matching the serving path
        top = np.argpartition(-s, 5)[:5]
        top = top[np.lexsort((top, -s[top]))]
        out[int(qid)] = {int(x) for x in top[:5]}
    return out


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.api import ann_topk, ann_topk_batch
    from inpe_queimadas_etl_spark.operators.pq import (
        build_ann_store,
        load_ann_model,
        save_ann_model,
        train_ann_model,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-ann-recall",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"n": N, "k": K, "nprobe": NPROBE, "nq": NQ}
    with tempfile.TemporaryDirectory() as tmp:
        for label, structured in (("random", False), ("structured", True)):
            X = gen(structured, seed=9)
            d = os.path.join(tmp, f"emb_{label}")
            os.makedirs(d)
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(range(N), type=pa.int64()),
                        "embedding": pa.array(
                            list(X.astype(np.float32)),
                            type=pa.list_(pa.float32()),
                        ),
                    }
                ),
                os.path.join(d, "embeddings.parquet"),
            )
            emb = (
                spark.read.parquet(os.path.join(d, "embeddings.parquet"))
                .select(
                    "vec_id",
                    F.col("embedding").cast("array<double>").alias("v"),
                )
                .withColumn("nrm", vec_norm("v"))
                .localCheckpoint(eager=True)
            )
            # ground truth on the float32-roundtripped values the
            # engine actually serves
            X64 = X.astype(np.float32).astype(np.float64)
            q_rows = np.arange(K, K + NQ)
            t0 = time.perf_counter()
            truth = exact_top5(X64, q_rows)
            exact_sec = round(time.perf_counter() - t0, 3)

            res = {"exact_sec": exact_sec}
            for tier, opq in (("sim10", False), ("sim11", True)):
                model = train_ann_model(
                    emb, k=K, m=8, ks=16, frac=NPROBE / K, cand=CAND,
                    opq=opq, coarse_sample_n=32_768,
                )
                mp = os.path.join(tmp, f"{label}_{tier}.json")
                save_ann_model(
                    mp, model["cents"], model["cb"], model["frac"],
                    model["cand"], rot=model["rot"],
                )
                sp = os.path.join(tmp, f"{label}_{tier}_store")
                t0 = time.perf_counter()
                build_ann_store(emb, load_ann_model(mp), sp)
                build_sec = round(time.perf_counter() - t0, 3)
                queries = [
                    (int(r["vec_id"]), list(r["v"]))
                    for r in emb.filter(
                        (F.col("vec_id") >= K)
                        & (F.col("vec_id") < K + NQ)
                    ).collect()
                ]
                t0 = time.perf_counter()
                rows = ann_topk(
                    spark, sp, mp, queries, k=5, rerank_with=emb
                ).collect()
                search_sec = round(time.perf_counter() - t0, 3)
                hits = sum(
                    1
                    for r in rows
                    if int(r["neighbor_id"]) in truth[int(r["query_id"])]
                )
                res[tier] = {
                    "recall_at5": round(hits / (5 * NQ), 4),
                    "build_sec": build_sec,
                    "search_sec": search_sec,
                }
                print(f"# {label}/{tier}: {res[tier]}", file=sys.stderr)

                if label == "structured" and tier == "sim10":
                    # the rerank-budget knob ("C buys recall"), served
                    # over the SAME store: retuned-cand models share
                    # the encoding sha (r10), so no re-encode — at
                    # this regime recall is quantization-bound within
                    # the probed cluster and C is the lever
                    for cand2 in (1000, 4000):
                        m2 = dict(model, cand=cand2)
                        mp2 = os.path.join(
                            tmp, f"{label}_{tier}_c{cand2}.json"
                        )
                        save_ann_model(
                            mp2, m2["cents"], m2["cb"], m2["frac"],
                            cand2, rot=m2["rot"],
                        )
                        t0 = time.perf_counter()
                        rows2 = ann_topk(
                            spark, sp, mp2, queries, k=5,
                            rerank_with=emb,
                        ).collect()
                        hits2 = sum(
                            1
                            for r in rows2
                            if int(r["neighbor_id"])
                            in truth[int(r["query_id"])]
                        )
                        res[f"sim10_cand{cand2}"] = {
                            "recall_at5": round(hits2 / (5 * NQ), 4),
                            "search_sec": round(
                                time.perf_counter() - t0, 3
                            ),
                        }
                        print(
                            f"# structured/sim10 cand={cand2}: "
                            f"{res[f'sim10_cand{cand2}']}",
                            file=sys.stderr,
                        )
                    # slimmed-broadcast batch timing on the same store
                    rngq = np.random.default_rng(17)
                    QM = rngq.normal(0, 1, size=(QN_BATCH, DIM))
                    qdf = spark.createDataFrame(
                        [
                            (10_000_000 + i, [float(x) for x in QM[i]])
                            for i in range(QN_BATCH)
                        ],
                        "query_id long, qv array<double>",
                    ).localCheckpoint(eager=True)
                    t0 = time.perf_counter()
                    nres = ann_topk_batch(
                        spark, sp, mp, qdf, k=5, rerank_with=emb
                    ).count()
                    res["ann_topk_batch_10k_sec"] = round(
                        time.perf_counter() - t0, 3
                    )
                    res["ann_topk_batch_10k_rows"] = int(nres)
                    print(
                        f"# structured batch Q={QN_BATCH}: "
                        f"{res['ann_topk_batch_10k_sec']}s",
                        file=sys.stderr,
                    )
            out[label] = res
            emb.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
