"""Price the ANN maintenance ladder at 1M vectors: plan (file
metadata only — must be ~ms), merge (delta-proportional), gc
(codes-only shuffle, no retrain), against the rebuild anchor the r10
sweep measured. One `run_ann_maintenance` round drives all of it —
the same code path `ann-maintain --apply` runs.

Usage: python scripts/scaling_ann_maint.py [n_vectors]
Prints one JSON line per measurement; paste the rows into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq

EMB_DIM = 64


def gen_embeddings(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    vecs = rng.normal(0, 1, size=(n, EMB_DIM)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        }
    )


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.api import ann_topk
    from inpe_queimadas_etl_spark.operators.annmaint import (
        ann_maintenance_plan,
        run_ann_maintenance,
    )
    from inpe_queimadas_etl_spark.operators.pq import (
        load_ann_model,
        pq_ivf_encode,
        rebuild_ann,
        resolve_ann_current,
        delete_from_ann_store,
        write_ann_store_meta,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-ann-maint",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="annmaint_")
    try:
        src = os.path.join(work, "emb.parquet")
        papq.write_table(gen_embeddings(n, seed=7), src)

        def emb_df(lo=0, hi=None):
            df = spark.read.parquet(src)
            if hi is not None:
                df = df.filter(
                    (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
                )
            return df.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ).withColumn("nrm", vec_norm("v"))

        base_n = int(n * 0.98)
        base = os.path.join(work, "dep")

        t0 = time.perf_counter()
        rebuild_ann(
            emb_df(0, base_n), base, k=64, m=8, ks=16, frac=0.05,
            cand=100, coarse_sample_n=32_768,
        )
        t_rebuild = time.perf_counter() - t0
        print(json.dumps({"row": "rebuild_1m_sampled", "n": base_n,
                          "sec": round(t_rebuild, 2)}))

        cur = resolve_ann_current(base)
        model = load_ann_model(
            cur["model_path"], expected_sha256=cur["model_sha256"]
        )

        # streaming-shaped drain: the 2% tail lands as two committed
        # batches under the frozen model
        drain = os.path.join(work, "drain")
        half = (n - base_n) // 2
        t0 = time.perf_counter()
        for b, (lo, hi) in enumerate(
            [(base_n, base_n + half), (base_n + half, n)]
        ):
            pq_ivf_encode(
                emb_df(lo, hi), model["cents3"], model["cb"],
                rot=model.get("rot"),
            ).write.mode("overwrite").parquet(
                os.path.join(drain, f"batch_id={b}")
            )
        write_ann_store_meta(
            drain, model["sha256"],
            encoding_sha256=model["encoding_sha256"],
        )
        t_drain = time.perf_counter() - t0
        print(json.dumps({"row": "drain_encode_2pct", "rows": n - base_n,
                          "sec": round(t_drain, 2)}))

        # a bounded takedown set (0.2% — the tombstone contract is
        # bounded sets, corpus-scale deletion is a rebuild)
        n_tomb = n // 500
        rng = np.random.default_rng(11)
        tombs = sorted(
            int(x) for x in rng.choice(base_n, size=n_tomb, replace=False)
        )
        delete_from_ann_store(cur["store_path"], tombs)

        # plan: file metadata only — price it
        t0 = time.perf_counter()
        plan = ann_maintenance_plan(
            base_dir=base, drain_dir=drain, tomb_gc_frac=0.001,
            keep_versions=2,
        )
        t_plan = time.perf_counter() - t0
        print(json.dumps({"row": "plan", "sec": round(t_plan, 4),
                          "actions": [a["action"] for a in plan["actions"]],
                          "signals": plan["signals"]}))

        # one applied round: merge then gc, timed inside
        t0 = time.perf_counter()
        res = run_ann_maintenance(
            lambda: spark, base_dir=base, drain_dir=drain, apply=True,
            tomb_gc_frac=0.001, keep_versions=2,
        )
        t_round = time.perf_counter() - t0
        print(json.dumps({
            "row": "maintain_round", "sec": round(t_round, 2),
            "applied": res["applied"],
            "merge_rows": res["results"].get("merge", {}).get("rows"),
            "gc_dropped": res["results"].get("gc", {}).get(
                "dropped_tombstones"
            ),
        }))

        # convergence: next round is plan-only (no backlog, no tombs)
        t0 = time.perf_counter()
        res2 = run_ann_maintenance(
            lambda: spark, base_dir=base, drain_dir=drain, apply=True,
            tomb_gc_frac=0.001, keep_versions=2,
        )
        t_idle = time.perf_counter() - t0
        print(json.dumps({"row": "idle_round", "sec": round(t_idle, 4),
                          "applied": res2["applied"]}))

        # the GC'd store still serves, and none of the tombstoned ids
        # come back
        cur2 = resolve_ann_current(base)
        q = [(i + 10_000_000, [float(x) for x in
              np.random.default_rng(5).normal(0, 1, EMB_DIM)])
             for i in range(8)]
        t0 = time.perf_counter()
        rows = ann_topk(
            spark, cur2["store_path"], cur2["model_path"], q, k=5,
            expected_sha256=cur2["model_sha256"],
        ).collect()
        t_serve = time.perf_counter() - t0
        served = {int(r["neighbor_id"]) for r in rows}
        assert len(rows) == 40, len(rows)
        assert not served & set(tombs), "tombstoned id served after GC"
        print(json.dumps({"row": "serve_post_gc", "sec": round(t_serve, 2),
                          "version": cur2["version"]}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
