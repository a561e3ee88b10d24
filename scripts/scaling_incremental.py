"""Scaling validation for incremental corpus dedup (incremental.py).

The claim to verify: flagging a FIXED-size new batch against a growing
corpus through the persistent index costs far less than recomputing
dedup over corpus+batch, and grows only with the (narrow) index scan —
never with corpus text.

Protocol: synthetic corpora at 10k / 50k / 200k docs (same realistic
Zipfian generator as scaling_dedup.py), a fixed 1,000-doc batch with a
deterministic 5 % exact + 5 % near dup tail drawn from the corpus.
Per corpus size, measure:
- index_build: exact + band index materialized to parquet (paid once
  per corpus, amortized over every future batch);
- flag: incremental_dedup(batch, corpus, prebuilt indexes) — the
  recurring per-snapshot cost;
- foil: dd4-style LSH candidates over corpus UNION batch — what a
  pipeline without the index pays per snapshot (recomputes every
  corpus signature every time).

Exponent = log-log least-squares slope of wall time vs corpus rows.
Recorded in SCALING.md.

Usage: python scripts/scaling_incremental.py  [env: SPARK_GRAFT_CPUS]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scaling_dedup import gen_documents  # noqa: E402

SIZES = {"10k": 10_000, "50k": 50_000, "200k": 200_000}
BATCH_N = 1_000


def gen_batch(corpus: pa.Table, seed: int) -> pa.Table:
    """1,000-doc batch: 5 % exact copies of corpus docs, 5 % near
    copies (last two words dropped), 90 % fresh text."""
    rng = np.random.default_rng(seed)
    fresh = gen_documents(BATCH_N, seed=seed + 7)
    texts = fresh.column("text").to_pylist()
    corpus_texts = corpus.column("text").to_pylist()
    n = len(corpus_texts)
    n_exact = BATCH_N // 20
    n_near = BATCH_N // 20
    src = rng.integers(0, n, size=n_exact + n_near)
    for i in range(n_exact):
        texts[i] = corpus_texts[int(src[i])]
    for i in range(n_near):
        words = corpus_texts[int(src[n_exact + i])].split()
        texts[n_exact + i] = " ".join(words[: max(3, len(words) - 2)])
    base = 10_000_000
    return pa.table(
        {
            "doc_id": pa.array(range(base, base + BATCH_N), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": fresh.column("lang"),
            "source": fresh.column("source"),
            "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
        }
    )


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_common import fit_exponent  # noqa: E402


def _fit_exponent(times: dict[str, float]) -> float:
    return fit_exponent(SIZES, times)


EMB_SIZES = {"10k": 10_000, "50k": 50_000, "200k": 200_000}
# all three foils are feasible since the r5 Arrow-batched banding
# (lsh_band_buckets) removed dd6's interpreted-fold constant
EMB_FOIL_SIZES = ("10k", "50k", "200k")
EMB_BATCH_N = 1_000


def gen_vec_batch(corpus: pa.Table, seed: int) -> pa.Table:
    """1,000-vector batch: 5 % exact copies of corpus vectors, 5 %
    jittered near copies, 90 % fresh."""
    from scripts.scaling_dedup import EMB_DIM, gen_embeddings

    rng = np.random.default_rng(seed)
    fresh = gen_embeddings(EMB_BATCH_N, seed=seed + 13)
    vecs = [np.asarray(v) for v in fresh.column("embedding").to_pylist()]
    corpus_vecs = corpus.column("embedding").to_pylist()
    n = len(corpus_vecs)
    n_exact = EMB_BATCH_N // 20
    n_near = EMB_BATCH_N // 20
    src = rng.integers(0, n, size=n_exact + n_near)
    for i in range(n_exact):
        vecs[i] = np.asarray(corpus_vecs[int(src[i])])
    for i in range(n_near):
        vecs[n_exact + i] = np.asarray(
            corpus_vecs[int(src[n_exact + i])]
        ) + rng.normal(0, 1e-3, size=EMB_DIM)
    base = 10_000_000
    return pa.table(
        {
            "vec_id": pa.array(
                range(base, base + EMB_BATCH_N), type=pa.int64()
            ),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * EMB_BATCH_N, type=pa.int32()),
        }
    )


def embedding_sweep(spark, tmp: str) -> dict:
    from inpe_queimadas_etl_spark.incremental import (
        embedding_band_index,
        incremental_embedding_neardup,
    )
    from inpe_queimadas_etl_spark.suite.llmdata import dd6_embedding_neardup
    from scripts.scaling_dedup import gen_embeddings

    flag_t: dict[str, float] = {}
    build_t: dict[str, float] = {}
    foil_t: dict[str, float] = {}
    n_flagged: dict[str, int] = {}
    for label, n in EMB_SIZES.items():
        d = os.path.join(tmp, f"emb_{label}")
        os.makedirs(os.path.join(d, "union"), exist_ok=True)
        corpus_tbl = gen_embeddings(n, seed=4242)
        batch_tbl = gen_vec_batch(corpus_tbl, seed=777)
        pq.write_table(corpus_tbl, os.path.join(d, "embeddings.parquet"))
        pq.write_table(
            pa.concat_tables([corpus_tbl, batch_tbl]),
            os.path.join(d, "union", "embeddings.parquet"),
        )
        corpus = spark.read.parquet(os.path.join(d, "embeddings.parquet"))
        batch = spark.createDataFrame(batch_tbl.to_pandas())

        t0 = time.perf_counter()
        embedding_band_index(corpus).write.parquet(os.path.join(d, "bi"))
        build_t[label] = round(time.perf_counter() - t0, 3)
        bi = spark.read.parquet(os.path.join(d, "bi"))

        def run_flag():
            return incremental_embedding_neardup(batch, corpus, index=bi)

        run_flag().count()
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_flag()
            cnt = out.filter(out.dup_of.isNotNull()).count()
            samples.append(time.perf_counter() - t0)
        flag_t[label] = round(min(samples), 3)
        n_flagged[label] = cnt

        if label in EMB_FOIL_SIZES:
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                dd6_embedding_neardup(
                    spark, os.path.join(d, "union")
                ).count()
                samples.append(time.perf_counter() - t0)
            foil_t[label] = round(min(samples), 3)
        print(
            f"# emb {label}: build {build_t[label]}s, flag {flag_t[label]}s "
            f"({n_flagged[label]} flagged), foil {foil_t.get(label, '-')}s",
            file=sys.stderr,
        )
    return {
        "emb_corpus_sizes": EMB_SIZES,
        "emb_batch_size": EMB_BATCH_N,
        "emb_index_build_sec": build_t,
        "emb_flag_sec": flag_t,
        "emb_n_flagged": n_flagged,
        "emb_foil_dd6_recompute_sec": foil_t,
        "emb_flag_exponent": fit_exponent(EMB_SIZES, flag_t),
    }


def main() -> None:
    from inpe_queimadas_etl_spark.incremental import (
        exact_hash_index,
        incremental_dedup,
        minhash_band_index,
    )
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite.llmdata import (
        dd4_minhash_lsh_candidates,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-incremental",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    flag_t: dict[str, float] = {}
    build_t: dict[str, float] = {}
    foil_t: dict[str, float] = {}
    n_flagged: dict[str, int] = {}
    with tempfile.TemporaryDirectory() as tmp:
        for label, n in SIZES.items():
            d = os.path.join(tmp, label)
            os.makedirs(os.path.join(d, "union"), exist_ok=True)
            corpus_tbl = gen_documents(n, seed=42)
            batch_tbl = gen_batch(corpus_tbl, seed=1042)
            pq.write_table(
                corpus_tbl, os.path.join(d, "documents.parquet")
            )
            # the foil reads corpus+batch as one documents table
            pq.write_table(
                pa.concat_tables([corpus_tbl, batch_tbl]),
                os.path.join(d, "union", "documents.parquet"),
            )
            corpus = spark.read.parquet(os.path.join(d, "documents.parquet"))
            batch = spark.createDataFrame(batch_tbl.to_pandas())

            t0 = time.perf_counter()
            exact_hash_index(corpus).write.parquet(os.path.join(d, "ei"))
            minhash_band_index(corpus).write.parquet(os.path.join(d, "bi"))
            build_t[label] = round(time.perf_counter() - t0, 3)

            ei = spark.read.parquet(os.path.join(d, "ei"))
            bi = spark.read.parquet(os.path.join(d, "bi"))

            def run_flag():
                return incremental_dedup(
                    batch, corpus, exact_index=ei, band_index=bi
                )

            run_flag().count()  # warm-up
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run_flag()
                cnt = out.filter(out.dup_kind.isNotNull()).count()
                samples.append(time.perf_counter() - t0)
            flag_t[label] = round(min(samples), 3)
            n_flagged[label] = cnt

            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                dd4_minhash_lsh_candidates(
                    spark, os.path.join(d, "union")
                ).count()
                samples.append(time.perf_counter() - t0)
            foil_t[label] = round(min(samples), 3)
            print(
                f"# {label}: build {build_t[label]}s, flag {flag_t[label]}s "
                f"({n_flagged[label]} flagged), foil {foil_t[label]}s",
                file=sys.stderr,
            )

        emb = embedding_sweep(spark, tmp)

    print(
        json.dumps(
            {
                "corpus_sizes": SIZES,
                "batch_size": BATCH_N,
                "index_build_sec": build_t,
                "flag_sec": flag_t,
                "n_flagged": n_flagged,
                "foil_full_recompute_sec": foil_t,
                "flag_exponent": _fit_exponent(flag_t),
                "foil_exponent": _fit_exponent(foil_t),
                **emb,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
