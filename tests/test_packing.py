"""Pack materialization + epoch ordering (operators/packing.py)."""

from __future__ import annotations

import pandas as pd

from inpe_queimadas_etl_spark.operators.packing import (
    materialize_packs,
    with_epoch_order,
)

from .conftest import SF0001


def _assigned(spark):
    rows = [
        # (doc_id, text, split, lang, shard, pack_id, tokens)
        (3, "c c", "train", "en", 0, 0, 2),
        (1, "a", "train", "en", 0, 0, 1),
        (2, "b b b", "train", "en", 0, 0, 3),
        (9, "z", "train", "en", 0, 1, 1),
        (4, "d", "train", "de", 0, 0, 1),
        (5, "e", "test", "en", 1, 0, 1),
    ]
    return spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "text",
                "split",
                "lang",
                "shard",
                "pack_id",
                "tokens",
            ],
        )
    )


def test_materialize_concatenates_in_doc_id_order(spark):
    out = (
        materialize_packs(_assigned(spark), sep=" | ")
        .toPandas()
        .set_index(["split", "lang", "shard", "pack_id"])
        .sort_index()
    )
    p = out.loc[("train", "en", 0, 0)]
    assert p["text"] == "a | b b b | c c"
    assert list(p["doc_ids"]) == [1, 2, 3]
    assert p["n_docs"] == 3 and p["total_tokens"] == 6
    # same-numbered packs of other (lang/shard/split) stay separate
    assert out.loc[("train", "de", 0, 0)]["text"] == "d"
    assert out.loc[("test", "en", 1, 0)]["text"] == "e"
    assert out.loc[("train", "en", 0, 1)]["text"] == "z"
    assert len(out) == 4


def test_epoch_order_is_deterministic_and_epoch_distinct(spark):
    packs = materialize_packs(_assigned(spark))

    def order(epoch):
        return [
            tuple(r)
            for r in with_epoch_order(packs, epoch)
            .orderBy("epoch_order")
            .select("split", "lang", "shard", "pack_id")
            .collect()
        ]

    e0a, e0b, e1 = order(0), order(0), order(1)
    assert e0a == e0b  # reproducible within an epoch
    assert sorted(e0a) == sorted(e1)  # same packs...
    assert e0a != e1  # ...different order across epochs


def test_pipeline_output_materializes(spark, tmp_path):
    """The corpus pipeline's written frame feeds materialize_packs
    directly: every written doc lands in exactly one pack and token
    accounting is preserved."""
    import os

    from inpe_queimadas_etl_spark.corpus_pipeline import run_corpus_pipeline

    out = str(tmp_path / "o")
    run_corpus_pipeline(spark, SF0001, out)
    written = spark.read.parquet(os.path.join(out, "corpus"))
    packs = materialize_packs(written)
    pdf = packs.toPandas()
    assert pdf["n_docs"].sum() == written.count()
    assert pdf["total_tokens"].sum() == (
        written.agg({"tokens": "sum"}).first()[0]
    )
    # no pack exceeds budget by more than one document's overshoot
    assert (pdf["total_tokens"] <= 512 + written.agg(
        {"tokens": "max"}
    ).first()[0]).all()


def test_null_text_member_kept_as_empty(spark):
    """A NULL-text member contributes an empty segment instead of
    vanishing from the sequence while still being counted."""
    pdf = pd.DataFrame(
        [
            (1, "a", "train", "en", 0, 0, 1),
            (2, None, "train", "en", 0, 0, 3),
            (3, "c", "train", "en", 0, 0, 1),
        ],
        columns=[
            "doc_id", "text", "split", "lang", "shard", "pack_id", "tokens",
        ],
    )
    out = materialize_packs(
        spark.createDataFrame(pdf), sep="|"
    ).toPandas()
    assert len(out) == 1
    assert out.loc[0, "text"] == "a||c"
    assert out.loc[0, "n_docs"] == 3
    assert out.loc[0, "total_tokens"] == 5


def test_token_offsets_are_exclusive_prefix_sums(spark):
    """token_offsets[j] = sum of member_tokens[:j] — the boundary
    list for per-document attention masks over packed sequences —
    and the last offset + last member's tokens == total_tokens."""
    packs = materialize_packs(_assigned(spark)).toPandas()
    for _, r in packs.iterrows():
        mt = list(r["member_tokens"])
        off = list(r["token_offsets"])
        assert len(mt) == len(off) == len(r["doc_ids"]) == r["n_docs"]
        run = 0
        for m, o in zip(mt, off):
            assert o == run
            run += m
        assert run == r["total_tokens"]
