"""Price the r11 lifecycle rung: `retune_ann_version` at 1M vectors —
the claim to verify is that a serving-knob change on a deployment is
DIRECTORY-WALK time (hard links + small-metadata copies + one pointer
flip), not a store copy and nowhere near a rebuild. Context prices on
the same corpus, same session: the full `rebuild_ann` (retrain +
re-encode) and a bare-artifact `retune_ann_model` (ms — the floor).

Usage: python scripts/scaling_retune.py [n_vectors]
Prints one JSON line per measurement; paste the rows into SCALING.md.
"""

from __future__ import annotations

import json
import os
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
    from inpe_queimadas_etl_spark.operators.pq import (
        rebuild_ann,
        resolve_ann_current,
        retune_ann_model,
        retune_ann_version,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-retune",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="retune_")
    src = os.path.join(work, "emb.parquet")
    papq.write_table(gen_embeddings(n, seed=7), src)
    emb = (
        spark.read.parquet(src)
        .select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", vec_norm("v"))
    )

    base = os.path.join(work, "dep")
    t0 = time.perf_counter()
    rebuild_ann(
        emb, base, k=64, m=8, ks=16, frac=0.02, cand=100,
        coarse_sample_n=65_536,
    )
    print(json.dumps({
        "measure": "rebuild_ann", "n": n,
        "seconds": round(time.perf_counter() - t0, 3),
    }), flush=True)

    n_files = sum(
        len(files)
        for _, _, files in os.walk(
            resolve_ann_current(base)["store_path"]
        )
    )
    for cand in (1000, 4000):
        t0 = time.perf_counter()
        res = retune_ann_version(base, cand=cand)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "measure": "retune_ann_version", "n": n, "cand": cand,
            "store_files": n_files, "version": res["version"],
            "seconds": round(dt, 3),
        }), flush=True)

    # the bare-artifact floor, same model
    cur = resolve_ann_current(base)
    t0 = time.perf_counter()
    retune_ann_model(
        cur["model_path"], os.path.join(work, "bare.json"), cand=2000
    )
    print(json.dumps({
        "measure": "retune_ann_model", "n": n,
        "seconds": round(time.perf_counter() - t0, 3),
    }), flush=True)

    # the retuned pair serves (one query, exact store row top-1)
    row = emb.filter(F.col("vec_id") == 123).first()
    cur = resolve_ann_current(base)
    got = ann_topk(
        spark, cur["store_path"], cur["model_path"],
        [(-1, list(row["v"]))], k=1,
        expected_sha256=cur["model_sha256"],
    ).collect()
    print(json.dumps({
        "measure": "serving_check",
        "top1": int(got[0]["neighbor_id"]),
        "expected": 123,
    }), flush=True)


if __name__ == "__main__":
    main()
