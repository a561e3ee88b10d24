"""Scaling validation for the data-selection tier (tx8 / cur8 / tx9).

All three are scan-shaped by design — the model side is small by
construction (top-V bigram LM, B-bucket DSIR ratios, K-word BPE merge
table) and broadcasts, so corpus cost must grow ~linearly with
document count. This sweep MEASURES that (exponent ~1.0 expected;
anything above ~1.2 would mean a hidden corpus-sized join or shuffle
snuck into the model path), plus tx9's train/apply split: training
cost is dominated by the fixed-size merge loop, so it must grow far
SLOWER than the corpus (only its word-count pass scales).

Prints one JSON line; numbers recorded in SCALING.md. Usage:
python scripts/scaling_selection.py  [env: SPARK_GRAFT_CPUS]
Never run concurrently with pytest — timings contaminate.
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

SIZES = {"10k": 10_000, "50k": 50_000, "250k": 250_000}
DOC_WORDS = 60
VOCAB = 20_000


def gen_docs(n: int, seed: int) -> pa.Table:
    """Zipf-ish corpus: realistic repeated-head vocabulary so the LM /
    DSIR / BPE models all see the frequency structure they exploit."""
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, size=(n, DOC_WORDS)) % VOCAB
    texts = [" ".join(f"w{r}" for r in row) for row in ranks]
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def main() -> None:
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    from scaling_common import fit_exponent

    from inpe_queimadas_etl_spark.operators.bpe import (
        bpe_token_stats,
        corpus_word_counts,
        train_bpe,
    )
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite.llmdata import (
        dsir_logweights,
        ngram_lm_scores,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-selection",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def load(tmp: str, n: int):
        d = os.path.join(tmp, f"docs_{n}")
        if not os.path.isdir(d):
            os.makedirs(d)
            pq.write_table(
                gen_docs(n, seed=23), os.path.join(d, "docs.parquet")
            )
        return spark.read.parquet(
            os.path.join(d, "docs.parquet")
        ).localCheckpoint(eager=True)

    def timed_count(df) -> float:
        df.count()  # warm-up: codegen + model-build jobs
        t0 = time.perf_counter()
        df.count()
        return round(time.perf_counter() - t0, 3)

    out: dict[str, dict] = {"tx8": {}, "cur8": {}, "tx9_apply": {}, "tx9_train": {}}
    with tempfile.TemporaryDirectory() as tmp:
        for label, n in SIZES.items():
            docs = load(tmp, n)
            # target = a deterministic 10% slice (sample-sized by
            # definition; kept proportional so the sweep only varies
            # corpus size by one knob)
            target = docs.filter((docs.doc_id % 10) == 0)

            out["tx8"][label] = timed_count(ngram_lm_scores(docs))
            out["cur8"][label] = timed_count(dsir_logweights(docs, target))

            t0 = time.perf_counter()
            merges = train_bpe(corpus_word_counts(docs, 2000), 200)
            out["tx9_train"][label] = round(time.perf_counter() - t0, 3)
            out["tx9_apply"][label] = timed_count(
                bpe_token_stats(docs, merges)
            )
            print(
                f"# selection {label}: "
                + json.dumps({k: v[label] for k, v in out.items()}),
                file=sys.stderr,
            )

    result = {
        "sizes": SIZES,
        "timings": out,
        "exponents": {
            k: fit_exponent(SIZES, v) for k, v in out.items()
        },
        "cpus": cpus,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
