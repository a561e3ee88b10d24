"""Scaling validation for dd12 (SemDeDup semantic dedup).

Three measured claims, printed as one JSON line and recorded in
SCALING.md:

1. **Scaled-K sweep** (the paper's deployment shape): K grows with n
   so cluster cardinality stays ~250 — per-cluster pair volume is
   then constant and total work ~n. Expect exponent ~1.
2. **Fixed-K foil**: the demo K=4 held constant while n grows — pair
   volume n^2/(2K), the quadratic cliff the K knob exists to avoid.
   Expect exponent ~2. (Capped at 25k vectors; the foil at 250k would
   be ~8e9 pair folds.)
3. **Assignment fast path**: `_ivf_assign` (Arrow/numpy argmax over
   the collected codebook) vs `_ivf_assign_ref` (interpreted JVM HOF
   folds) at a realistic K=512 — the bit-identical-parity pair
   (tests/test_similarity_fastpath.py); this measures why the fast
   path is the production default.

Random gaussian vectors put every pairwise cosine far below tau, so
the removal list is empty — the measured cost is the full
assignment + within-cluster scoring sweep, which is the work that
scales. Usage: python scripts/scaling_semdedup.py  [env:
SPARK_GRAFT_CPUS]
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

EMB_DIM = 64
SCALED_SIZES = {"10k": 10_000, "50k": 50_000, "250k": 250_000}
FOIL_SIZES = {"10k": 10_000, "25k": 25_000}
CLUSTER_CARD = 250  # target vectors per cluster in the scaled sweep


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
    sys.path.insert(0, here)
    from scaling_common import fit_exponent

    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _ivf_assign,
        _ivf_assign_ref,
        semantic_dedup_removals,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-semdedup",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def load(tmp: str, n: int):
        d = os.path.join(tmp, f"emb_{n}")
        if not os.path.isdir(d):
            os.makedirs(d)
            pq.write_table(
                gen_embeddings(n, seed=17),
                os.path.join(d, "embeddings.parquet"),
            )
        return (
            spark.read.parquet(os.path.join(d, "embeddings.parquet"))
            .select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            )
            .withColumn("nrm", vec_norm("v"))
            .localCheckpoint(eager=True)  # time dd12, not the gen scan
        )

    def timed_count(df) -> tuple[float, int]:
        df.count()  # warm: codegen + the collect-codebook job
        t0 = time.perf_counter()
        n = df.count()
        return round(time.perf_counter() - t0, 3), n

    scaled: dict[str, dict] = {}
    foil: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as tmp:
        for label, n in SCALED_SIZES.items():
            emb = load(tmp, n)
            k = n // CLUSTER_CARD
            sec, removed = timed_count(
                semantic_dedup_removals(emb, k=k, tau=0.4)
            )
            # measured pair volume: sum over clusters of c*(c-1)/2
            pairs = (
                _ivf_assign(emb, k)
                .groupBy("centroid_id")
                .count()
                .agg(F.sum(F.expr("count * (count - 1) / 2")))
                .first()[0]
            )
            scaled[label] = {
                "k": k,
                "sec": sec,
                "pairs": int(pairs),
                "removed": removed,
            }
            print(f"# dd12 scaled {label}: {scaled[label]}", file=sys.stderr)

        for label, n in FOIL_SIZES.items():
            emb = load(tmp, n)
            sec, removed = timed_count(
                semantic_dedup_removals(emb, k=4, tau=0.4)
            )
            foil[label] = {"k": 4, "sec": sec, "removed": removed}
            print(f"# dd12 foil {label}: {foil[label]}", file=sys.stderr)

        # assignment fast path vs JVM reference at realistic K; the
        # checksum-style consume defeats column pruning (a bare count
        # would let Catalyst drop the csim/argmax computation)
        emb = load(tmp, 50_000)
        assign: dict[str, float] = {}
        for name, fn in (("fast", _ivf_assign), ("jvm_ref", _ivf_assign_ref)):
            consume = lambda: (  # noqa: E731
                fn(emb, 512)
                .agg(F.sum(F.col("centroid_id") + F.col("csim")))
                .collect()
            )
            consume()
            t0 = time.perf_counter()
            consume()
            assign[name] = round(time.perf_counter() - t0, 3)
            print(f"# assign K=512 {name}: {assign[name]}s", file=sys.stderr)

    sizes_sec = {s: scaled[s]["sec"] for s in scaled}
    foil_sec = {s: foil[s]["sec"] for s in foil}
    print(
        json.dumps(
            {
                "dd12_scaled_k": scaled,
                "dd12_scaled_exponent": fit_exponent(SCALED_SIZES, sizes_sec),
                "dd12_fixed_k4_foil": foil,
                "dd12_foil_exponent": fit_exponent(FOIL_SIZES, foil_sec),
                "assign_50k_k512_sec": assign,
                "cluster_cardinality": CLUSTER_CARD,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
