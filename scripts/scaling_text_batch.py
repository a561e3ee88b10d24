"""Price the text-in BATCH path (r11): `ann_topk_batch(queries_text=)`
embeds a (query_id, text) frame in-plan with the drain's hashed
encoder before probe assignment. The question a 100-TB consumer asks:
what does in-plan embedding ADD over handing the searcher
pre-computed vectors — i.e. is the convenience free enough that a
TEXT benchmark decontamination or a text-shard dedup should always
take it?

Method: N synthetic docs (Zipf-ish vocab so the encoder's per-batch
word memo does real work) -> hashed embeddings -> a trained IVF-PQ
store; Q query texts drawn from the corpus (ids offset so the
self-skip never fires). Measure (min of R runs each):
  - embed-only: the hashed encode scan of the Q texts (collected);
  - vec-in: ann_topk_batch over pre-computed query vectors;
  - text-in: ann_topk_batch(queries_text=) end to end.
Results are asserted IDENTICAL (text-in == vec-in row sets) before
any timing is reported — a fast wrong path prices nothing.

Usage: python scripts/scaling_text_batch.py [n_docs] [q]
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

VOCAB = 20_000
WORDS_PER_DOC = 40


def gen_docs(n: int, seed: int) -> pa.Table:
    """Deterministic word-soup corpus over a Zipf-ish vocabulary —
    the distribution the encoder's word memo exists for."""
    rng = np.random.default_rng(seed)
    # Zipf via inverse-rank sampling, bounded to the vocab
    ranks = (rng.pareto(1.1, size=(n, WORDS_PER_DOC)) + 1).astype(int)
    ids = np.minimum(ranks, VOCAB) - 1
    texts = [" ".join(f"w{j}" for j in row) for row in ids]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))

    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.api import ann_topk_batch
    from inpe_queimadas_etl_spark.operators.pq import (
        build_ann_store,
        load_ann_model,
        save_ann_model,
        train_ann_model,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite.llmdata import hashed_doc_vectors

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    runs = 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-text-batch",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed(label, fn, extra=None):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        row = {"measure": label, "n_docs": n, "q": q,
               "seconds": round(best, 3)}
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)
        return out, best

    work = tempfile.mkdtemp(prefix="textbatch_")
    docs_path = os.path.join(work, "docs.parquet")
    papq.write_table(gen_docs(n, seed=11), docs_path)
    docs = spark.read.parquet(docs_path)

    emb = (
        hashed_doc_vectors(docs.select("doc_id", "text"), dim=64)
        .withColumn("nrm", vec_norm("v"))
        .select(F.col("doc_id").alias("vec_id"), "v", "nrm")
    )
    _, t_corpus = timed(
        "corpus_embed_scan", lambda: emb.count(),
        {"note": "one Arrow encode pass over the corpus"},
    )
    model = train_ann_model(
        emb, k=64, m=8, ks=16, frac=0.02, cand=200,
        coarse_sample_n=65_536,
    )
    model_path = os.path.join(work, "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"],
    )
    store_path = os.path.join(work, "store")
    t0 = time.perf_counter()
    build_ann_store(emb, load_ann_model(model_path), store_path)
    print(json.dumps({
        "measure": "store_build", "n_docs": n,
        "seconds": round(time.perf_counter() - t0, 3),
    }), flush=True)

    qtexts_path = os.path.join(work, "qtexts.parquet")
    docs.filter(F.col("doc_id") < q).select(
        (F.col("doc_id") + 10_000_000).alias("query_id"), "text"
    ).write.parquet(qtexts_path)
    qtexts = spark.read.parquet(qtexts_path)

    # pre-embedded form: price the query embed separately, then the
    # search over materialized vectors (what a by-hand consumer does)
    qvec_path = os.path.join(work, "qvecs.parquet")

    def embed_queries():
        hashed_doc_vectors(
            qtexts.select(
                F.col("query_id").alias("doc_id"), "text"
            ),
            dim=64,
        ).select(
            F.col("doc_id").alias("query_id"), F.col("v").alias("qv")
        ).write.mode("overwrite").parquet(qvec_path)

    _, t_embed = timed("query_embed_only", embed_queries)
    qvecs = spark.read.parquet(qvec_path)

    def search_vec():
        return ann_topk_batch(
            spark, store_path, model_path, qvecs, k=5
        ).groupBy().agg(
            F.count("*").alias("rows"),
            F.sum(F.col("neighbor_id") * F.col("rank")).alias("chk"),
        ).collect()[0]

    vec_row, t_vec = timed("search_vec_in", search_vec)

    def search_text():
        return ann_topk_batch(
            spark, store_path, model_path, k=5, queries_text=qtexts
        ).groupBy().agg(
            F.count("*").alias("rows"),
            F.sum(F.col("neighbor_id") * F.col("rank")).alias("chk"),
        ).collect()[0]

    text_row, t_text = timed("search_text_in", search_text)
    assert (vec_row["rows"], vec_row["chk"]) == (
        text_row["rows"], text_row["chk"],
    ), "text-in and vec-in diverged — pricing void"
    print(json.dumps({
        "measure": "summary", "n_docs": n, "q": q,
        "rows": int(text_row["rows"]),
        "text_in_s": round(t_text, 3),
        "vec_in_plus_embed_s": round(t_vec + t_embed, 3),
        "embed_share_of_text_in": round(t_embed / t_text, 3),
        "per_query_ms_text_in": round(1000.0 * t_text / q, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
