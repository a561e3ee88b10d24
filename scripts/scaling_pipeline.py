"""Scaling validation for the end-to-end corpus pipeline
(corpus_pipeline.run_corpus_pipeline).

The composed materialization (dd7 labels -> curation -> repetition ->
mixture -> split -> pack -> export) should scale like its dominant
stage — dd7's banded label propagation (measured exponent ~0.88 in
scaling_dedup.py) — because every other stage is scan-shaped or
K-row driver math and the labels are computed ONCE and shared. A
super-linear pipeline exponent would mean a stage recomputes or
joins something it should share.

Protocol: the same realistic Zipfian generator as scaling_dedup.py at
5k / 15.8k / 50k docs; one warm-up run at the smallest size, then the
min of 2 timed full-pipeline runs per size (each run includes the
parquet export and manifest aggregation — the real end-to-end cost).
Exponent = log-log least-squares slope. Recorded in SCALING.md.

Three variants are measured (VERDICT r6 #7, r7 #6):
- "base": the r5 default stack (curation -> repetition -> split ->
  pack -> export), refreshing the 0.79 exponent;
- "full": every selection gate ON in the one invocation —
  decontaminate-by both (20-doc eval set carved from corpus text so
  the broadcast joins have real work), scrub-pii, min-lm-logprob
  (permissive threshold: the cost is the corpus-wide scoring, not
  the drops), scrub-spans, DSIR toward an n/10-doc target slice with
  keep=0.4n, and mixture-temperature 0.7. Every gate's cost scales
  with the corpus, so the composed exponent should stay ~linear or
  below; a super-linear exponent means a stage recomputes shared
  lineage.
- "full_serve" (VERDICT r7 #6): "full" plus the post-export ANN
  SERVING stage, so the end-to-end exponent covers curation -> pack
  -> serve: embed the exported corpus (the emb1 hashed encoder, one
  Arrow scan), train a PQ codebook on a bounded sample, materialize
  the sim8 code store as parquet, and run the 8-query probed ADC
  top-5 search through the production Arrow path
  (pq_adc_search_scan) — every stage scan-shaped or sample-bounded,
  so the composed exponent should stay sub-linear.

Usage: python scripts/scaling_pipeline.py  [env: SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_common import fit_exponent  # noqa: E402
from scaling_dedup import gen_documents as _gen_documents  # noqa: E402

SIZES = {"5k": 5_000, "15k": 15_811, "50k": 50_000}

_STOPS = ["the", "a", "of", "and", "to", "in"]


def gen_documents(n: int, seed: int):
    """scaling_dedup's Zipfian corpus, made curation-compatible. Two
    deterministic rewrites (identical for exact-dup copies, so the
    dup tail the dedup stages chew on is preserved):

    - interleave English stopwords (every 4th word) — the w0..w9999
      vocabulary carries none, so cur1's language heuristic (>= 2
      stopwords) would otherwise drop EVERY doc;
    - suffix each remaining word with its position mod 5 — the a=1.3
      Zipf draw gives the top word a ~25 % share (real text: ~5 %),
      so cur3's top-word gate would otherwise flag ~97 % of docs and
      the sweep would time a near-empty materialization."""
    import pyarrow as pa

    tbl = _gen_documents(n, seed)
    texts = []
    for t in tbl.column("text").to_pylist():
        w = t.split(" ")
        for i in range(len(w)):
            if i % 4 == 0:
                w[i] = _STOPS[(i // 4) % len(_STOPS)]
            else:
                w[i] = f"{w[i]}{i % 5}"
        texts.append(" ".join(w))
    return tbl.set_column(
        tbl.schema.get_field_index("text"),
        "text",
        pa.array(texts, type=pa.string()),
    ).set_column(
        tbl.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(t) for t in texts], type=pa.int64()),
    )


def main() -> None:
    from inpe_queimadas_etl_spark.corpus_pipeline import run_corpus_pipeline
    from inpe_queimadas_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-pipeline",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label, n in SIZES.items():
            d = os.path.join(tmp, f"in_{label}")
            os.makedirs(d)
            pq.write_table(
                gen_documents(n, seed=42),
                os.path.join(d, "documents.parquet"),
            )
            dirs[label] = d

        # full-stack side inputs: an eval set carved from corpus text
        # (so the decontamination joins flag real rows) and a
        # same-distribution DSIR target slice per size
        import pyarrow as pa

        eval_dir = os.path.join(tmp, "eval")
        os.makedirs(eval_dir)
        small = gen_documents(200, seed=42)
        ev_texts = [
            " ".join(t.split(" ")[3:40])
            for t in small.column("text").to_pylist()[:20]
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(
                        range(10**9, 10**9 + len(ev_texts)), pa.int64()
                    ),
                    "text": pa.array(ev_texts, pa.string()),
                }
            ),
            os.path.join(eval_dir, "documents.parquet"),
        )
        tdirs = {}
        for label, n in SIZES.items():
            td = os.path.join(tmp, f"target_{label}")
            os.makedirs(td)
            pq.write_table(
                gen_documents(max(200, n // 10), seed=7),
                os.path.join(td, "documents.parquet"),
            )
            tdirs[label] = td

        def gates(label: str) -> dict:
            return dict(
                eval_dir=eval_dir,
                decontaminate_by="both",
                scrub_pii=True,
                min_lm_logprob=-20.0,
                scrub_spans=True,
                dsir_target_dir=tdirs[label],
                dsir_keep=max(1, int(0.4 * SIZES[label])),
                mixture_temperature=0.7,
            )

        def serve(out_dir: str) -> None:
            """Post-export ANN serving stage (VERDICT r7 #6): embed
            the exported corpus, build + materialize the sim8 PQ
            store, run the probed ADC top-5 through the production
            Arrow search path."""
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            from inpe_queimadas_etl_spark.operators.pq import (
                pq_adc_search_scan,
                pq_encode,
                train_pq_codebook,
            )
            from inpe_queimadas_etl_spark.operators.similarity import (
                vec_norm,
            )
            from inpe_queimadas_etl_spark.suite.llmdata import (
                _score_rank_top5,
                hashed_doc_vectors,
            )

            docs = spark.read.parquet(
                os.path.join(out_dir, "corpus")
            ).select("doc_id", "text")
            # checkpoint: the embedding scan feeds FOUR actions
            # (codebook sample, store write, query collect, rerank
            # join) — uncached it would re-run per action and bill
            # ~4x the embed cost into the timed serve stage
            emb = (
                hashed_doc_vectors(docs)  # dim 16 -> m=8, dsub=2
                .select(F.col("doc_id").alias("vec_id"), "v")
                .withColumn("nrm", vec_norm("v"))
                .localCheckpoint(eager=True)
            )
            cb = train_pq_codebook(emb, m=8, ks=16)
            store_path = os.path.join(out_dir, "pq_store")
            pq_encode(emb, cb).write.mode("overwrite").parquet(
                store_path
            )
            codes = spark.read.parquet(store_path)
            q = (
                emb.orderBy("vec_id")
                .limit(8)
                .select(
                    F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"),
                    F.col("nrm").alias("nq"),
                )
            )
            queries = [
                (r["query_id"], list(r["qv"]))
                for r in q.select("query_id", "qv").collect()
            ]
            scored = pq_adc_search_scan(codes, cb, queries, 100)
            w_g = Window.partitionBy("query_id").orderBy(
                F.desc_nulls_first("pq_score"), F.asc("vec_id")
            )
            cand = (
                scored.withColumn("rn", F.row_number().over(w_g))
                .filter(F.col("rn") <= 100)
                .select("query_id", "vec_id")
            )
            paired = cand.join(
                emb.select("vec_id", "v", F.col("nrm").alias("nv")),
                "vec_id",
            ).join(F.broadcast(q), "query_id")
            _score_rank_top5(paired).count()

        def run(label: str, tag: str, post=None, **kw) -> dict:
            out = os.path.join(tmp, f"out_{label}_{tag}")
            try:
                m = run_corpus_pipeline(spark, dirs[label], out, **kw)
                if post is not None:
                    post(out)
                return m
            finally:
                shutil.rmtree(out, ignore_errors=True)

        smallest = min(SIZES, key=SIZES.get)
        run(smallest, "warmup")  # JVM/codegen warm-up
        run(smallest, "warmup_full", post=serve, **gates(smallest))

        for variant in ("base", "full", "full_serve"):
            times: dict[str, float] = {}
            kept: dict[str, int] = {}
            for label in SIZES:
                kw = gates(label) if variant != "base" else {}
                post = serve if variant == "full_serve" else None
                samples = []
                for i in range(2):
                    t0 = time.perf_counter()
                    manifest = run(
                        label, f"{variant}_r{i}", post=post, **kw
                    )
                    samples.append(time.perf_counter() - t0)
                times[label] = round(min(samples), 3)
                kept[label] = sum(
                    s["docs"] for s in manifest["splits"].values()
                )
                print(
                    f"# pipeline[{variant}] {label}: {times[label]}s "
                    f"({kept[label]} docs written)",
                    file=sys.stderr,
                )
            results[variant] = {
                "times_sec": times,
                "docs_written": kept,
                "scaling_exponent": fit_exponent(SIZES, times),
            }

    print(json.dumps({"sizes": SIZES, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
