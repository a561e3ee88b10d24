"""Streaming incremental corpus dedup (streaming.start_corpus_dedup_stream):
cross-batch exact + near flagging against the growing index, restart
idempotency from the streaming checkpoint."""

from __future__ import annotations

import os

import pandas as pd
import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow

from inpe_queimadas_etl_spark.streaming import start_corpus_dedup_stream

def _doc(seed: int, n: int = 45) -> str:
    import random

    rng = random.Random(seed)
    return " ".join(f"w{rng.randrange(1000)}" for _ in range(n))


def _drain(spark, dirs):
    q = start_corpus_dedup_stream(
        spark,
        docs_dir=dirs["docs"],
        index_dir=dirs["index"],
        out_dir=dirs["out"],
        checkpoint_dir=dirs["ckpt"],
        available_now=True,
    )
    q.awaitTermination(120)
    assert not q.isActive


def _write_batch(spark, docs_dir, rows, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        os.path.join(docs_dir, f"{name}.parquet"),
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "docs": str(tmp_path / "docs"),
        "index": str(tmp_path / "index"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["docs"])
    return d


def test_crash_replay_does_not_erase_batch(spark, dirs):
    """A batch replayed after a crash (sink partitions written, the
    streaming checkpoint NOT committed) must not read its own partial
    writes: doing so would flag every survivor as an exact dup of
    itself and overwrite the batch's accepted/index partitions with
    empty data. Simulated by pre-writing batch_id=0 sink partitions
    for the very docs the fresh stream's first batch (batch_id 0)
    will deliver."""
    from inpe_queimadas_etl_spark.incremental import (
        exact_hash_index,
        minhash_band_index,
    )

    from inpe_queimadas_etl_spark.streaming import _bind_drain_identity

    rows = [(0, _doc(1)), (1, _doc(2)), (2, _doc(3))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    batch_df = spark.read.parquet(dirs["docs"])
    # the crashed run stamped its identity at start (a genuine crash
    # leaves checkpoint + sink stamps in place; only the batch commit
    # is missing) — replicate that before writing its partial output
    _bind_drain_identity(
        dirs["ckpt"],
        (
            f"{dirs['out']}/flags",
            f"{dirs['out']}/accepted",
            f"{dirs['index']}/exact",
            f"{dirs['index']}/bands",
        ),
    )
    # the crashed attempt's partial writes
    batch_df.write.parquet(f"{dirs['out']}/accepted/batch_id=0")
    exact_hash_index(batch_df).write.parquet(
        f"{dirs['index']}/exact/batch_id=0"
    )
    minhash_band_index(batch_df).write.parquet(
        f"{dirs['index']}/bands/batch_id=0"
    )

    _drain(spark, dirs)  # fresh checkpoint -> first batch_id is 0

    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.doc_id for r in accepted.collect()) == [0, 1, 2]
    flags = (
        spark.read.parquet(f"{dirs['out']}/flags")
        .toPandas()
        .set_index("doc_id")
    )
    assert flags["dup_kind"].isna().all(), flags


def test_empty_docs_dir_requires_schema(spark, dirs):
    with pytest.raises(ValueError, match="pass schema="):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
        )


@pytest.fixture()
def _preserve_root_logging():
    """cli.main's _setup_logging(force=True) rebinds the root logger
    to pytest's per-test captured stream; restore the original
    handlers so later tests/teardown don't log to a closed file."""
    import logging

    root = logging.getLogger()
    saved = (root.handlers[:], root.level)
    yield
    root.handlers[:] = saved[0]
    root.setLevel(saved[1])


def _vec(seed: int, dim: int = 16) -> list:
    import random

    rng = random.Random(seed)
    return [rng.uniform(-1, 1) for _ in range(dim)]


def _write_vec_batch(docs_dir, rows, name):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.float32())
                ),
            }
        ),
        os.path.join(docs_dir, f"{name}.parquet"),
    )


def test_embedding_drain_cross_batch(spark, dirs):
    """Embedding drain: in-batch identical vectors dedup first;
    cross-batch exact and jittered copies are flagged against the
    index; geometry stays pinned across batches; re-drain is a
    no-op."""
    from inpe_queimadas_etl_spark.streaming import (
        start_embedding_dedup_stream,
    )

    def drain():
        q = start_embedding_dedup_stream(
            spark,
            vecs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
        )
        q.awaitTermination(120)
        assert not q.isActive

    v0, v1, v2 = _vec(1), _vec(2), _vec(3)
    _write_vec_batch(dirs["docs"], [(0, v0), (1, v1), (2, v2), (3, v0)], "b1")
    drain()
    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.vec_id for r in accepted.collect()) == [0, 1, 2]
    flags = (
        spark.read.parquet(f"{dirs['out']}/flags")
        .toPandas()
        .set_index("vec_id")
    )
    assert flags.loc[3, "dup_of"] == 0 and flags.loc[3, "sim"] == 1.0

    jitter = [x + 1e-4 for x in v1]
    _write_vec_batch(
        dirs["docs"], [(10, v2), (11, jitter), (12, _vec(9))], "b2"
    )
    drain()
    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.vec_id for r in accepted.collect()) == [0, 1, 2, 12]
    flags = (
        spark.read.parquet(f"{dirs['out']}/flags")
        .toPandas()
        .set_index("vec_id")
    )
    assert flags.loc[10, "dup_of"] == 2 and flags.loc[10, "sim"] >= 0.9999
    assert flags.loc[11, "dup_of"] == 1 and flags.loc[11, "sim"] >= 0.99
    import pandas as _pd

    assert _pd.isna(flags.loc[12, "dup_of"])
    # one geometry across the whole index
    bi = spark.read.parquet(f"{dirs['index']}/bands")
    geoms = bi.select("n_bands", "band_bits").distinct().collect()
    assert len(geoms) == 1

    drain()  # no new files -> no-op
    assert spark.read.parquet(f"{dirs['out']}/accepted").count() == 4


def test_cli_corpus_dedup_sweep(spark, dirs, _preserve_root_logging):
    """`python -m inpe_queimadas_etl_spark corpus-dedup` drains the
    landing dir once (availableNow) and exits 0, leaving accepted +
    flags parquet behind."""
    from inpe_queimadas_etl_spark import cli

    base = _doc(21)
    _write_batch(
        spark, dirs["docs"], [(0, base), (1, _doc(22)), (2, base)], "b1"
    )
    rc = cli.main(
        [
            "corpus-dedup",
            "--docs-dir", dirs["docs"],
            "--index-dir", dirs["index"],
            "--out-dir", dirs["out"],
            "--checkpoint-dir", dirs["ckpt"],
        ]
    )
    assert rc == 0
    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.doc_id for r in accepted.collect()) == [0, 1]
    flags = spark.read.parquet(f"{dirs['out']}/flags")
    assert flags.count() == 3


def test_cli_schema_from_empty_landing(spark, dirs, tmp_path, _preserve_root_logging):
    """--schema-from lets the cron-shaped sweep run on a still-empty
    landing dir: no crash, clean 'nothing landed' exit."""
    from inpe_queimadas_etl_spark import cli

    sample = str(tmp_path / "sample")
    _write_batch(spark, str(tmp_path), [(0, _doc(5))], "sample")
    import os

    os.rename(str(tmp_path / "sample.parquet"), sample)
    rc = cli.main(
        [
            "corpus-dedup",
            "--docs-dir", dirs["docs"],
            "--index-dir", dirs["index"],
            "--out-dir", dirs["out"],
            "--checkpoint-dir", dirs["ckpt"],
            "--schema-from", sample,
        ]
    )
    assert rc == 0


def test_checkpoint_reset_against_existing_sinks_refuses(spark, dirs):
    """A fresh checkpoint pointed at sink dirs holding existing drain
    output means the checkpoint was lost/reset — the drain must refuse
    (at start, before the stream touches anything) rather than skip
    dedup and overwrite historical partitions."""
    rows = [(0, _doc(31)), (1, _doc(32))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    batch_df = spark.read.parquet(dirs["docs"])
    # surviving sinks from a previous stream that got to batch 3
    batch_df.write.parquet(f"{dirs['out']}/accepted/batch_id=3")

    with pytest.raises(RuntimeError, match="existing drain output"):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
        )
    # the historical partition is untouched
    survived = spark.read.parquet(f"{dirs['out']}/accepted")
    assert survived.count() == 2


def test_checkpoint_reset_at_batch_zero_refuses(spark, dirs):
    """The hole the identity stamp closes: a history whose max
    batch_id is 0 used to slip past the runtime id check (a reset
    stream also starts at 0) and silently overwrite the historical
    batch-0 partitions. Now the unstamped fresh checkpoint is refused
    before the stream starts."""
    rows = [(0, _doc(61)), (1, _doc(62))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    batch_df = spark.read.parquet(dirs["docs"])
    # a previous drain's FULL history: exactly one batch, id 0
    batch_df.write.parquet(f"{dirs['out']}/accepted/batch_id=0")

    with pytest.raises(RuntimeError, match="existing drain output"):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
        )
    survived = spark.read.parquet(f"{dirs['out']}/accepted")
    assert survived.count() == 2


def test_sink_wiped_while_checkpoint_kept_refuses(spark, dirs):
    """The converse lineage break: the checkpoint survives (so landed
    files will never be re-delivered) but a sink dir was wiped — the
    drain would dedup new batches against a silently-empty corpus, so
    it must refuse at start."""
    import shutil

    rows = [(0, _doc(71)), (1, _doc(72))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    _drain(spark, dirs)
    shutil.rmtree(dirs["index"])

    with pytest.raises(RuntimeError, match="stamp missing"):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
        )


def test_runtime_batch_id_guard_still_covers_remote_sinks(spark):
    """URI-schemed sinks skip the marker-file stamp, so the per-batch
    id check remains the live defense there: ids beyond the stream's
    progress must raise."""
    from inpe_queimadas_etl_spark.streaming import _refuse_checkpoint_reset

    frame = spark.createDataFrame([(3, 1)], ["batch_id", "doc_id"])
    with pytest.raises(RuntimeError, match="checkpoint .*reset|was reset"):
        _refuse_checkpoint_reset((("s3://bucket/accepted", frame),), 1)
    # ids at or behind the stream are a legitimate replay
    _refuse_checkpoint_reset((("s3://bucket/accepted", frame),), 3)


def test_reserved_batch_id_column_rejected(spark, dirs):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    pq.write_table(
        pa.table({"doc_id": [1], "text": ["x y z"], "batch_id": [9]}),
        os.path.join(dirs["docs"], "bad.parquet"),
    )
    with pytest.raises(ValueError, match="reserved"):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
        )


def test_cli_embedding_dedup_sweep(spark, dirs, _preserve_root_logging):
    """`corpus-dedup --embeddings` drains vector snapshots through the
    embedding drain and exits 0."""
    from inpe_queimadas_etl_spark import cli

    v = _vec(41)
    _write_vec_batch(dirs["docs"], [(0, v), (1, _vec(42)), (2, v)], "b1")
    rc = cli.main(
        [
            "corpus-dedup",
            "--embeddings",
            "--docs-dir", dirs["docs"],
            "--index-dir", dirs["index"],
            "--out-dir", dirs["out"],
            "--checkpoint-dir", dirs["ckpt"],
        ]
    )
    assert rc == 0
    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.vec_id for r in accepted.collect()) == [0, 1]


def test_cross_batch_dedup_and_restart(spark, dirs):
    # batch 1: three unique docs + one in-batch exact dup of doc 0
    base = _doc(1)
    _write_batch(
        spark,
        dirs["docs"],
        [(0, base), (1, _doc(2)), (2, _doc(3)), (3, base)],
        "b1",
    )
    _drain(spark, dirs)

    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    flags = spark.read.parquet(f"{dirs['out']}/flags").toPandas()
    assert sorted(r.doc_id for r in accepted.collect()) == [0, 1, 2]
    f3 = flags.set_index("doc_id").loc[3]
    assert f3["dup_kind"] == "exact" and f3["dup_of"] == 0

    # batch 2: exact dup of accepted doc 1, near dup of accepted doc 2
    # (last two words dropped), and one genuinely new doc
    near = " ".join(_doc(3).split()[:-2])
    _write_batch(
        spark,
        dirs["docs"],
        [(10, _doc(2)), (11, near), (12, _doc(9))],
        "b2",
    )
    _drain(spark, dirs)

    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    flags = (
        spark.read.parquet(f"{dirs['out']}/flags")
        .toPandas()
        .set_index("doc_id")
    )
    assert sorted(r.doc_id for r in accepted.collect()) == [0, 1, 2, 12]
    assert flags.loc[10, "dup_kind"] == "exact"
    assert flags.loc[10, "dup_of"] == 1
    assert flags.loc[11, "dup_kind"] == "near"
    assert flags.loc[11, "dup_of"] == 2
    assert flags.loc[11, "jaccard"] >= 0.5
    assert pd.isna(flags.loc[12, "dup_kind"])

    # index grew with the accepted survivors only
    ei = spark.read.parquet(f"{dirs['index']}/exact")
    assert sorted(r.corpus_doc_id for r in ei.collect()) == [0, 1, 2, 12]

    # restart with the same checkpoint and no new files: a re-drain
    # must be a no-op (every landed file already committed)
    _drain(spark, dirs)
    accepted2 = spark.read.parquet(f"{dirs['out']}/accepted")
    assert accepted2.count() == 4
    assert spark.read.parquet(f"{dirs['out']}/flags").count() == 7


def test_legacy_checkpoint_cannot_adopt_foreign_stamped_sinks(spark, dirs):
    """A pre-stamp (legacy) checkpoint must not adopt sinks already
    stamped by ANOTHER drain: overwriting the owner's identity would
    mix two streams undetectably. Refused at start."""
    import os

    rows = [(0, _doc(91)), (1, _doc(92))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    _drain(spark, dirs)  # drain A: stamps checkpoint + sinks, batch 0
    # a different, legacy-era checkpoint: streaming offsets, no stamp
    legacy_ckpt = dirs["ckpt"] + "_legacy"
    os.makedirs(os.path.join(legacy_ckpt, "offsets"))
    with pytest.raises(RuntimeError, match="stamped by another drain"):
        start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=legacy_ckpt,
            available_now=True,
        )
    # drain A's own restart still works (stamp untouched)
    _drain(spark, dirs)


def test_legacy_checkpoint_adopts_unstamped_sinks(spark, dirs):
    """A legacy checkpoint over UNSTAMPED sinks (the pre-upgrade
    deployment shape) is adopted: stamped on start, drain proceeds."""
    import os

    from inpe_queimadas_etl_spark.streaming import _STREAM_ID_FILE

    rows = [(0, _doc(95)), (1, _doc(96))]
    _write_batch(spark, dirs["docs"], rows, "b1")
    _drain(spark, dirs)
    # simulate a pre-upgrade deployment: strip every stamp, keep the
    # checkpoint's streaming state and the sink data
    for d in (
        dirs["ckpt"],
        f"{dirs['out']}/flags",
        f"{dirs['out']}/accepted",
        f"{dirs['index']}/exact",
        f"{dirs['index']}/bands",
    ):
        m = os.path.join(d, _STREAM_ID_FILE)
        if os.path.exists(m):
            os.remove(m)
    _write_batch(spark, dirs["docs"], [(5, _doc(97))], "b2")
    _drain(spark, dirs)  # adopted, not refused
    accepted = spark.read.parquet(f"{dirs['out']}/accepted")
    assert sorted(r.doc_id for r in accepted.collect()) == [0, 1, 5]
    assert os.path.exists(os.path.join(dirs["ckpt"], _STREAM_ID_FILE))

def test_fresh_stamped_sink_not_hijacked_before_first_batch(dirs, tmp_path):
    """A sink stamped by another drain that has NOT yet written its
    first batch must still be refused by a second fresh checkpoint
    (ADVICE r5: the r5 guard only refused once batch_id= partitions
    existed, so a pre-first-batch sink got silently re-stamped and the
    OWNING drain refused on its own next restart)."""
    from inpe_queimadas_etl_spark.streaming import _bind_drain_identity

    sinks = (
        f"{dirs['out']}/flags",
        f"{dirs['out']}/accepted",
        f"{dirs['index']}/exact",
        f"{dirs['index']}/bands",
    )
    # drain A: completes identity binding, has not run a batch yet
    _bind_drain_identity(dirs["ckpt"], sinks)
    # drain B: different fresh checkpoint over the same sinks
    ckpt_b = str(tmp_path / "ckpt_b")
    with pytest.raises(RuntimeError, match="stamped by another drain"):
        _bind_drain_identity(ckpt_b, sinks)
    # drain A's own restart is unaffected (stamps untouched)
    _bind_drain_identity(dirs["ckpt"], sinks)


def test_crash_mid_stamping_recovers(dirs):
    """Sink stamps owned by THIS checkpoint with no checkpoint marker
    are the residue of a start that crashed between sink-stamping and
    the checkpoint-marker commit point — a restart re-stamps and
    proceeds instead of refusing its own residue."""
    from inpe_queimadas_etl_spark.streaming import (
        _STREAM_ID_FILE,
        _bind_drain_identity,
    )

    sinks = (
        f"{dirs['out']}/flags",
        f"{dirs['out']}/accepted",
        f"{dirs['index']}/exact",
        f"{dirs['index']}/bands",
    )
    for d in sinks:
        os.makedirs(d)
        with open(os.path.join(d, _STREAM_ID_FILE), "w") as f:
            f.write(f"deadbeef\n{os.path.realpath(dirs['ckpt'])}\n")
    _bind_drain_identity(dirs["ckpt"], sinks)  # no raise
    assert os.path.exists(os.path.join(dirs["ckpt"], _STREAM_ID_FILE))
    # every stamp now carries the SAME fresh id, owner unchanged
    with open(os.path.join(dirs["ckpt"], _STREAM_ID_FILE)) as f:
        new_id = f.read().strip()
    assert new_id != "deadbeef"
    for d in sinks:
        with open(os.path.join(d, _STREAM_ID_FILE)) as f:
            sid, owner = f.read().splitlines()
        assert sid == new_id
        assert os.path.realpath(owner) == os.path.realpath(dirs["ckpt"])


# --- quality-gate drain ------------------------------------------------------


def test_quality_gate_stream_routes_and_replays(spark, dirs):
    """The stateless drain: scores land per batch, accepted/rejected
    route on the logit threshold, a second landed file becomes a
    second batch, and restart with no new files is a no-op."""
    import numpy as np

    from inpe_queimadas_etl_spark.streaming import (
        start_quality_gate_stream,
    )
    from pyspark.sql import functions as F

    D = 64
    b_good, b_bad = (
        spark.createDataFrame(
            [("good",), ("bad",)], "word string"
        )
        .select(F.pmod(F.hash("word"), F.lit(D)).cast("int").alias("b"))
        .collect()
    )
    weights = [0.0] * D
    weights[b_good["b"]] += 1.0
    weights[b_bad["b"]] -= 1.0

    def drain():
        q = start_quality_gate_stream(
            spark,
            docs_dir=dirs["docs"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            weights=weights,
            intercept=0.0,
            available_now=True,
        )
        q.awaitTermination(120)
        assert not q.isActive

    _write_batch(
        spark,
        dirs["docs"],
        [
            (1, "good good content here"),
            (2, "bad bad bad content"),
            (3, "good and bad balanced neither"),  # logit == 0 -> accepted
        ],
        "b0",
    )
    drain()
    scores = spark.read.parquet(f"{dirs['out']}/scores").toPandas()
    assert len(scores) == 3
    byid = scores.set_index("doc_id")
    assert byid.loc[1, "accepted"] and byid.loc[1, "logit"] > 0
    assert not byid.loc[2, "accepted"]
    assert byid.loc[3, "accepted"] and byid.loc[3, "logit"] == 0.0
    acc = spark.read.parquet(f"{dirs['out']}/accepted").toPandas()
    rej = spark.read.parquet(f"{dirs['out']}/rejected").toPandas()
    assert sorted(acc["doc_id"]) == [1, 3]
    assert sorted(rej["doc_id"]) == [2]

    # second file -> second batch; earlier partitions untouched
    _write_batch(spark, dirs["docs"], [(4, "bad stuff")], "b1")
    drain()
    acc2 = spark.read.parquet(f"{dirs['out']}/accepted").toPandas()
    rej2 = spark.read.parquet(f"{dirs['out']}/rejected").toPandas()
    assert sorted(acc2["doc_id"]) == [1, 3]
    assert sorted(rej2["doc_id"]) == [2, 4]
    assert set(rej2["batch_id"].astype(int)) == {0, 1}

    # restart with nothing new: no-op, nothing rewritten
    drain()
    assert (
        spark.read.parquet(f"{dirs['out']}/scores").count()
        == len(scores) + 1
    )


def test_quality_gate_checkpoint_reset_refuses(spark, dirs, tmp_path):
    """A reset checkpoint against surviving sink dirs must refuse at
    start (identity stamp), exactly like the dedup drains."""
    from inpe_queimadas_etl_spark.streaming import (
        start_quality_gate_stream,
    )

    weights = [0.0] * 16
    _write_batch(spark, dirs["docs"], [(1, "alpha"), (2, "beta")], "b0")
    q = start_quality_gate_stream(
        spark,
        docs_dir=dirs["docs"],
        out_dir=dirs["out"],
        checkpoint_dir=dirs["ckpt"],
        weights=weights,
        intercept=0.0,
        available_now=True,
    )
    q.awaitTermination(120)
    with pytest.raises(RuntimeError, match="checkpoint"):
        start_quality_gate_stream(
            spark,
            docs_dir=dirs["docs"],
            out_dir=dirs["out"],
            checkpoint_dir=str(tmp_path / "fresh_ckpt"),
            weights=weights,
            intercept=0.0,
            available_now=True,
        )


def test_quality_gate_requires_doc_columns(spark, dirs):
    from pyspark.sql import types as T

    from inpe_queimadas_etl_spark.streaming import (
        start_quality_gate_stream,
    )

    with pytest.raises(ValueError, match="doc_id and text"):
        start_quality_gate_stream(
            spark,
            docs_dir=dirs["docs"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            weights=[0.0] * 8,
            intercept=0.0,
            schema=T.StructType(
                [T.StructField("body", T.StringType())]
            ),
        )


def test_drain_encodes_under_frozen_tokenizer(spark, dirs, tmp_path):
    """VERDICT r7 #4 load-path on the drain: with tokenizer_path set,
    each batch's accepted survivors are additionally encoded under
    the FROZEN artifact into out/tokens — identical ids to encoding
    under the loaded table in-session, cross-batch, and never a
    retrain (the artifact's vocab decides every id)."""
    from inpe_queimadas_etl_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_vocab,
        corpus_word_counts,
        load_tokenizer,
        save_tokenizer,
        train_bpe,
    )

    # train the tokenizer on a PRIOR corpus (the curate-run stand-in)
    train_docs = spark.createDataFrame(
        [(i, _doc(100 + i)) for i in range(6)],
        "doc_id long, text string",
    )
    counts = corpus_word_counts(train_docs)
    merges = train_bpe(counts, 40)
    art = save_tokenizer(
        str(tmp_path / "tok.json"), merges, bpe_vocab(counts, merges)
    )

    def drain():
        q = start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
            tokenizer_path=art["path"],
        )
        q.awaitTermination(120)
        assert not q.isActive

    # batch 1: three docs, one exact dup (dropped -> no token row)
    _write_batch(
        spark, dirs["docs"], [(0, _doc(1)), (1, _doc(2)), (2, _doc(1))],
        "b1",
    )
    drain()
    # batch 2: one new doc
    _write_batch(spark, dirs["docs"], [(3, _doc(4))], "b2")
    drain()

    accepted = spark.read.parquet(
        os.path.join(dirs["out"], "accepted")
    )
    tokens = spark.read.parquet(os.path.join(dirs["out"], "tokens"))
    acc_ids = {r["doc_id"] for r in accepted.select("doc_id").collect()}
    tok_rows = {
        r["doc_id"]: list(r["token_ids"]) for r in tokens.collect()
    }
    assert set(tok_rows) == acc_ids  # every survivor, only survivors
    # ids equal a fresh encode under the LOADED artifact (no retrain)
    m2, v2 = load_tokenizer(art["path"])
    expect = {
        r["doc_id"]: list(r["token_ids"])
        for r in bpe_encode_ids(
            accepted.select("doc_id", "text"), m2, v2
        ).collect()
    }
    assert tok_rows == expect
    # both batch partitions present (idempotent batch_id layout)
    parts = {
        r["batch_id"]
        for r in tokens.select("batch_id").distinct().collect()
    }
    assert parts == {0, 1}


def test_tokenizer_enabled_mid_lineage_adopts_tokens_sink(
    spark, dirs, tmp_path
):
    """Review r8: enabling --bpe-tokenizer on an EXISTING drain must
    not refuse startup — the data-less tokens sink is adopted into
    the lineage (stamped late) and carries only batches encoded from
    then on; earlier batches' docs stay un-encoded by design."""
    from inpe_queimadas_etl_spark.operators.bpe import (
        bpe_vocab,
        corpus_word_counts,
        save_tokenizer,
        train_bpe,
    )

    train_docs = spark.createDataFrame(
        [(i, _doc(300 + i)) for i in range(4)],
        "doc_id long, text string",
    )
    counts = corpus_word_counts(train_docs)
    merges = train_bpe(counts, 20)
    art = save_tokenizer(
        str(tmp_path / "tok.json"), merges, bpe_vocab(counts, merges)
    )

    def drain(tokenizer=None):
        q = start_corpus_dedup_stream(
            spark,
            docs_dir=dirs["docs"],
            index_dir=dirs["index"],
            out_dir=dirs["out"],
            checkpoint_dir=dirs["ckpt"],
            available_now=True,
            tokenizer_path=tokenizer,
        )
        q.awaitTermination(120)
        assert not q.isActive

    # batch 0 runs WITHOUT a tokenizer (stamps ckpt + 4 sinks)
    _write_batch(spark, dirs["docs"], [(0, _doc(1)), (1, _doc(2))], "b1")
    drain()
    assert not os.path.exists(os.path.join(dirs["out"], "tokens"))
    # batch 1 enables the tokenizer mid-lineage — must ADOPT, not
    # refuse, and encode only this batch's survivors
    _write_batch(spark, dirs["docs"], [(2, _doc(3))], "b2")
    drain(tokenizer=art["path"])
    tokens = spark.read.parquet(
        os.path.join(dirs["out"], "tokens")
    ).toPandas()
    assert set(tokens["doc_id"]) == {2}
    assert set(tokens["batch_id"]) == {1}
    # and a THIRD run with the tokenizer still on resumes cleanly
    _write_batch(spark, dirs["docs"], [(3, _doc(4))], "b3")
    drain(tokenizer=art["path"])
    tokens = spark.read.parquet(
        os.path.join(dirs["out"], "tokens")
    ).toPandas()
    assert set(tokens["doc_id"]) == {2, 3}
