"""tx9 BPE trainer ceiling (VERDICT r6 'next round' #6): measure the
driver-side merge loop at REALISTIC merge counts on the 50k-cap
vocabulary, comparing the r7 incremental trainer (heap + inverted
index, `train_bpe`) against the r6 full-recount reference
(`train_bpe_ref`).

Corpus: 50k distinct synthetic words (lengths 3-12, seeded), Zipf
counts ~ 2e6/rank — the shape corpus_word_counts(top_k=50_000) hands
the trainer. The reference form is measured only at the small merge
counts (its cost is O(merges x vocab x len); extrapolation is linear
in merges and stated instead of waited for).

Run:  python scripts/scaling_bpe_train.py
"""

from __future__ import annotations

import json
import random
import time

from inpe_queimadas_etl_spark.operators.bpe import train_bpe, train_bpe_ref

VOCAB = 50_000
MERGES = (2_000, 8_000, 32_000)
REF_MERGES = (200, 400)


def build_counts(seed: int = 31) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    words: set[str] = set()
    while len(words) < VOCAB:
        words.add(
            "".join(
                rng.choice("abcdefghijklmnopqrstuvwxyz")
                for _ in range(rng.randrange(3, 13))
            )
        )
    ordered = sorted(words)
    rng.shuffle(ordered)
    return sorted(
        (w, max(2, int(2_000_000 / (rank + 1))))
        for rank, w in enumerate(ordered)
    )


def main() -> None:
    counts = build_counts()
    out: dict[str, dict] = {"incremental": {}, "reference": {}}
    for m in MERGES:
        t0 = time.time()
        merges = train_bpe(counts, m)
        dt = round(time.time() - t0, 2)
        out["incremental"][str(m)] = {"sec": dt, "n_merges": len(merges)}
        print(f"# incremental {m}: {dt}s ({len(merges)} merges)", flush=True)
    for m in REF_MERGES:
        t0 = time.time()
        ref = train_bpe_ref(counts, m)
        dt = round(time.time() - t0, 2)
        out["reference"][str(m)] = {"sec": dt, "n_merges": len(ref)}
        print(f"# reference {m}: {dt}s", flush=True)
        assert ref == train_bpe(counts, m), "parity broke at scale"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
