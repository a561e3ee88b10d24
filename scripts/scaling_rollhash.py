"""Scaling validation for the Karp-Rabin rolling shingle pass
(operators/rollhash.py) that round 7 swapped into dd10/dd11/cur10
(VERDICT r6 "Next round" #2).

Measured claims, printed as one JSON line and recorded in SCALING.md:

1. **Shingle-stage speedup grows with ``win``** — md5-over-concat
   hashes ~``win`` tokens of bytes per position, the rolling
   fingerprint O(1); at fixed corpus size the ratio should rise
   roughly linearly in ``win``. Sweep win in {13, 20, 50} over the
   SAME synthetic corpus, timing a full drain (count of distinct
   whash groups) of each generator.
2. **End-to-end dd10** on the synthetic corpus at win=20: the full
   pipeline (shingle + repeat groupBy + gaps-and-islands) under the
   round-7 rolling generator vs the round-6 md5 form, plus an
   equality assert on the resulting repeated-window hit counts (the
   hash-agnostic output both must agree on).

Corpus: docs of ~1000 tokens over a 50k-word vocabulary with every
40th doc sharing a planted 120-token run (so repeat detection has
real work). Usage: python scripts/scaling_rollhash.py
[env: SPARK_GRAFT_CPUS]
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

N_DOCS = 4000
DOC_TOKENS = 1000
WINS = [13, 20, 50]


def gen_docs(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    planted = [f"run{i}" for i in range(120)]
    texts = []
    for d in range(n):
        toks = [f"w{x}" for x in rng.integers(0, 50_000, size=DOC_TOKENS)]
        if d % 40 == 0:
            off = int(rng.integers(0, DOC_TOKENS - 120))
            toks[off : off + 120] = planted
        texts.append(" ".join(toks))
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

    from inpe_queimadas_etl_spark.operators.rollhash import (
        rolling_window_shingles,
    )
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _md5_window_shingles,
        duplicate_spans,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-rollhash",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def timed_repeats(shingles) -> tuple[float, int]:
        """Drain the shingle generator through the repeat groupBy (the
        first real consumer) twice; report the second, warm run."""

        def run() -> int:
            return (
                shingles.groupBy("whash")
                .agg(F.count("*").alias("n"))
                .filter(F.col("n") >= 2)
                .count()
            )

        run()
        t0 = time.perf_counter()
        n = run()
        return round(time.perf_counter() - t0, 3), n

    out: dict = {"n_docs": N_DOCS, "doc_tokens": DOC_TOKENS, "wins": {}}
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "documents.parquet")
        pq.write_table(gen_docs(N_DOCS, seed=23), path)
        docs = (
            spark.read.parquet(path)
            .select("doc_id", "text")
            .localCheckpoint(eager=True)  # time the generators, not IO
        )
        for win in WINS:
            roll_s, roll_n = timed_repeats(rolling_window_shingles(docs, win))
            md5_s, md5_n = timed_repeats(
                _md5_window_shingles(docs, win).select("doc_id", "whash")
            )
            assert roll_n == md5_n, (win, roll_n, md5_n)
            out["wins"][str(win)] = {
                "rolling_sec": roll_s,
                "md5_sec": md5_s,
                "speedup": round(md5_s / roll_s, 2),
                "repeated_windows": roll_n,
            }

        # end-to-end dd10 at win=20 (rolling is what duplicate_spans
        # now runs; the md5 end-to-end is the round-6 shape restated)
        def timed_spans(df) -> tuple[float, int]:
            df.count()
            t0 = time.perf_counter()
            n = df.count()
            return round(time.perf_counter() - t0, 3), n

        e2e_roll_s, n_spans = timed_spans(duplicate_spans(docs, win=20))
        out["dd10_end_to_end"] = {
            "rolling_sec": e2e_roll_s,
            "n_spans": n_spans,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
