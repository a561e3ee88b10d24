"""Incremental ANN store maintenance (`merge_ann_appends`): folding
NEW drain appends into a serving store at delta cost must leave a
store that serves IDENTICALLY to one built from scratch over the
union — same rows, same size stamp — while the journaled two-phase
publish survives crashes at every step (rollback before the atomic
meta commit, cleanup-only after it) and mid-merge states are refused
by serving, never served."""

from __future__ import annotations

import json
import os

import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.api import ann_topk
from inpe_queimadas_etl_spark.operators.pq import (
    ANN_MERGE_JOURNAL,
    build_ann_store,
    compact_ann_store,
    delete_from_ann_store,
    load_ann_model,
    merge_ann_appends,
    pq_ivf_encode,
    read_ann_store,
    read_ann_store_stamp,
    save_ann_model,
    train_ann_model,
    write_ann_store_meta,
)

SF0001 = "/root/testdata/sf0.001"


def _emb(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import _sim8_emb

    return _sim8_emb(spark, SF0001)


def _append_drain_batch(drain_dir, emb_slice, model, batch_id):
    """Simulate one streaming-drain append: encode under the frozen
    model into the drain's batch_id-partitioned layout (the
    `streaming._write_partition` shape, _SUCCESS marker included)."""
    pq_ivf_encode(
        emb_slice, model["cents3"], model["cb"], rot=model.get("rot")
    ).write.mode("overwrite").parquet(f"{drain_dir}/batch_id={batch_id}")


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    """One trained model + id-range splits shared by every test —
    each test copies/rebuilds its own stores from these."""
    tmp = tmp_path_factory.mktemp("ann_merge")
    emb = _emb(spark).cache()
    n = emb.count()
    cuts = (int(n * 0.6), int(n * 0.8), int(n * 0.9))
    base = emb.filter(F.col("vec_id") < cuts[0])
    b0 = emb.filter(
        (F.col("vec_id") >= cuts[0]) & (F.col("vec_id") < cuts[1])
    )
    b1 = emb.filter(
        (F.col("vec_id") >= cuts[1]) & (F.col("vec_id") < cuts[2])
    )
    b2 = emb.filter(F.col("vec_id") >= cuts[2])
    model = train_ann_model(emb, k=4, m=8, ks=16, frac=1.0, cand=100)
    model_path = str(tmp / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"], rot=model["rot"],
    )
    return {
        "emb": emb,
        "model": load_ann_model(model_path),
        "model_path": model_path,
        "splits": (base, b0, b1, b2),
    }


def _fresh_stores(spark, setup, tmp_path, drain_batches=(0, 1)):
    """A base store over the base split + a drain holding the given
    batch slices, both stamped under the shared model."""
    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    store = str(tmp_path / "store")
    build_ann_store(base, model, store)
    drain = str(tmp_path / "drain")
    slices = {0: b0, 1: b1}
    for b in drain_batches:
        _append_drain_batch(drain, slices[b], model, b)
    write_ann_store_meta(
        drain, model["sha256"], encoding_sha256=model["encoding_sha256"]
    )
    return store, drain


def _queries(setup):
    rows = setup["emb"].filter(F.col("vec_id") % 97 == 3).collect()
    return [
        (int(r["vec_id"]) + 100_000, [float(x) for x in r["v"]])
        for r in rows[:6]
    ]


def _pin_serving_equal(spark, setup, store_a, store_b, k=5):
    qv = _queries(setup)
    got = (
        ann_topk(
            spark, store_a, setup["model_path"], qv, k=k,
            rerank_with=setup["emb"],
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        ann_topk(
            spark, store_b, setup["model_path"], qv, k=k,
            rerank_with=setup["emb"],
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_merge_equals_full_build_and_is_incremental(
    spark, setup, tmp_path
):
    """THE done-bar pin: base + merged deltas serves identically to a
    from-scratch build over the union, sizes stamped exactly; a
    re-merge is a no-op; a later batch merges alone (delta cost)."""
    model = setup["model"]
    base, b0, b1, b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)

    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [0, 1]
    assert res["merged_through"] == 1
    assert res["rows"] == b0.count() + b1.count()
    assert not os.path.exists(os.path.join(store, ANN_MERGE_JOURNAL))

    full = str(tmp_path / "full")
    build_ann_store(base.union(b0).union(b1), model, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]
    _pin_serving_equal(spark, setup, store, full)

    # idempotent: nothing past the watermark
    again = merge_ann_appends(spark, store, drain, model)
    assert again["merged_batches"] == [] and again["rows"] == 0

    # a NEW batch merges alone — via the CLI veneer
    _append_drain_batch(drain, b2, model, 2)
    from inpe_queimadas_etl_spark import cli

    rc = cli.main(
        [
            "ann-merge", "--store", store, "--drain-dir", drain,
            "--model", setup["model_path"],
        ]
    )
    assert rc == 0
    stamp, sizes = read_ann_store_stamp(store)
    assert stamp["merged_through"] == 2
    full2 = str(tmp_path / "full2")
    build_ann_store(setup["emb"], model, full2)
    assert sizes == read_ann_store_stamp(full2)[1]
    _pin_serving_equal(spark, setup, store, full2)


def test_merge_refusals(spark, setup, tmp_path):
    """Non-serving stores, unstamped drains, and drift are refused;
    an in-flight batch (no _SUCCESS) is simply not merged yet."""
    model = setup["model"]
    store, drain = _fresh_stores(spark, setup, tmp_path)

    # a drain-stamped dir (no sizes) is not a merge target
    sizeless = str(tmp_path / "sizeless")
    os.makedirs(sizeless)
    write_ann_store_meta(
        sizeless, model["sha256"],
        encoding_sha256=model["encoding_sha256"],
    )
    with pytest.raises(ValueError, match="cluster-size stamp"):
        merge_ann_appends(spark, sizeless, drain, model)

    # an unstamped drain is refused
    bare = str(tmp_path / "bare_drain")
    os.makedirs(bare)
    with pytest.raises(ValueError, match="no model stamp"):
        merge_ann_appends(spark, store, bare, model)

    # drift: drain stamped under another encoding — refused by the
    # SAME shared predicate the planner reports (merge_refusal /
    # pairing_refusal, review r11: one check, no plan/executor drift)
    other = str(tmp_path / "other_drain")
    os.makedirs(other)
    write_ann_store_meta(
        other, "e" * 64, encoding_sha256="f" * 64
    )
    with pytest.raises(ValueError, match="DIFFERENT encoding"):
        merge_ann_appends(spark, store, other, model)

    # an in-flight batch (no _SUCCESS) stays unmerged, loudly absent
    os.unlink(os.path.join(drain, "batch_id=1", "_SUCCESS"))
    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [0]
    assert res["merged_through"] == 0


def test_merge_crash_midmove_rolls_back_then_recovers(
    spark, setup, tmp_path, monkeypatch
):
    """Injected crash in the move loop: the journal stays, serving
    REFUSES the store, a plain re-merge refuses too, and
    recover=True rolls the partial publish back and completes the
    merge — final state identical to a clean merge."""
    import inpe_queimadas_etl_spark.operators.pq as pq

    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)
    real_moves = pq._merge_apply_moves

    def boom(moves):
        real_moves(moves[:1])  # one file published, then crash
        raise RuntimeError("injected crash mid-move")

    monkeypatch.setattr(pq, "_merge_apply_moves", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_ann_appends(spark, store, drain, model)
    monkeypatch.undo()

    assert os.path.exists(os.path.join(store, ANN_MERGE_JOURNAL))
    with pytest.raises(ValueError, match="pending merge journal"):
        read_ann_store(spark, store, model)
    with pytest.raises(ValueError, match="pending merge journal"):
        ann_topk(
            spark, store, setup["model_path"], _queries(setup), k=3
        ).collect()
    with pytest.raises(ValueError, match="pending merge journal"):
        merge_ann_appends(spark, store, drain, model)

    res = merge_ann_appends(spark, store, drain, model, recover=True)
    assert res["recovered"] == "rolled_back"
    assert res["merged_batches"] == [0, 1]
    full = str(tmp_path / "full")
    build_ann_store(base.union(b0).union(b1), model, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]
    _pin_serving_equal(spark, setup, store, full)


def test_merge_crash_after_commit_recovers_as_committed(
    spark, setup, tmp_path, monkeypatch
):
    """Injected crash AFTER the atomic meta commit but before journal
    cleanup: recovery classifies it as committed — no rollback, the
    merged rows stay, only cleanup runs."""
    import inpe_queimadas_etl_spark.operators.pq as pq

    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)
    real_meta = pq.write_ann_store_meta

    def boom(*a, **kw):
        real_meta(*a, **kw)
        if kw.get("merged_through") is not None:
            raise RuntimeError("injected crash before journal cleanup")

    monkeypatch.setattr(pq, "write_ann_store_meta", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        merge_ann_appends(spark, store, drain, model)
    monkeypatch.undo()

    assert os.path.exists(os.path.join(store, ANN_MERGE_JOURNAL))
    res = merge_ann_appends(spark, store, drain, model, recover=True)
    assert res["recovered"] == "committed"
    assert res["merged_batches"] == []  # nothing left to merge
    full = str(tmp_path / "full")
    build_ann_store(base.union(b0).union(b1), model, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]
    _pin_serving_equal(spark, setup, store, full)


def test_merge_drops_tombstoned_delta_rows(spark, setup, tmp_path):
    """Ids tombstoned on the store (takedown arriving before the
    merge) never enter it: excluded from the published files AND the
    size stamp, and never served."""
    model = setup["model"]
    _base, b0, _b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path, drain_batches=(0,))
    victims = [int(r["vec_id"]) for r in b0.limit(2).collect()]
    delete_from_ann_store(store, victims)

    res = merge_ann_appends(spark, store, drain, model)
    assert res["rows"] == b0.count() - len(victims)
    served, _ = read_ann_store(spark, store, model)
    got_ids = {int(r["vec_id"]) for r in served.collect()}
    assert not (set(victims) & got_ids)
    _stamp, sizes = read_ann_store_stamp(store)
    assert sum(sizes.values()) == len(got_ids)


def test_compact_stamps_watermark_so_merge_is_noop(
    spark, setup, tmp_path
):
    """compact -> merge composes: a compaction consumes every drain
    batch and stamps merged_through, so merging the same drain right
    after folds nothing (no double-add)."""
    model = setup["model"]
    _store, drain = _fresh_stores(spark, setup, tmp_path)
    compacted = str(tmp_path / "compacted")
    compact_ann_store(spark, drain, compacted, model)
    stamp, _sizes = read_ann_store_stamp(compacted)
    assert stamp["merged_through"] == 1
    res = merge_ann_appends(spark, compacted, drain, model)
    assert res["merged_batches"] == [] and res["rows"] == 0


def test_merge_journal_is_single_writer_arbiter(spark, setup, tmp_path):
    """A live journal blocks a second merge (no interleaved moves)
    and a truncated journal — crash before any move ran — recovers
    as a clean rollback."""
    model = setup["model"]
    store, drain = _fresh_stores(spark, setup, tmp_path, drain_batches=(0,))
    jp = os.path.join(store, ANN_MERGE_JOURNAL)
    with open(jp, "w") as f:
        f.write('{"from": -1, "to":')  # truncated mid-write
    with pytest.raises(ValueError, match="pending merge journal"):
        merge_ann_appends(spark, store, drain, model)
    res = merge_ann_appends(spark, store, drain, model, recover=True)
    assert res["recovered"] == "rolled_back"
    assert res["merged_batches"] == [0]
    assert json.load(
        open(os.path.join(store, "_ann_model.json"))
    )["merged_through"] == 0


def test_merge_real_streaming_drain_into_base_store(spark, tmp_path):
    """Integration: the ACTUAL embedding drain's ANN sink (two
    micro-batches through `start_embedding_dedup_stream`, unified
    stamp, batch_id dirs with _SUCCESS) merges into a base store
    built before the stream existed — merged store == one-shot build
    over base + accepted, rows and sizes alike."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.streaming import (
        start_embedding_dedup_stream,
    )

    def vec(seed, dim=64):
        rng = random.Random(seed)
        return [rng.uniform(-1, 1) for _ in range(dim)]

    def snap(path, ids):
        pa_pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(
                        [vec(i) for i in ids],
                        type=pa.list_(pa.float32()),
                    ),
                }
            ),
            path,
        )

    def as_emb(ids):
        return (
            spark.createDataFrame(
                [(int(i), vec(i)) for i in ids],
                "vec_id long, v array<double>",
            )
            .withColumn("nrm", vec_norm("v"))
        )

    base_ids = list(range(20))
    base = as_emb(base_ids)
    model = train_ann_model(base, k=2, m=8, ks=4, frac=1.0, cand=100)
    model_path = str(tmp_path / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"],
    )
    loaded = load_ann_model(model_path)
    store = str(tmp_path / "base_store")
    build_ann_store(base, loaded, store)

    vecs_dir = str(tmp_path / "vecs")
    os.makedirs(vecs_dir)
    b1, b2 = list(range(100, 115)), list(range(200, 215))

    def drain():
        q = start_embedding_dedup_stream(
            spark,
            vecs_dir=vecs_dir,
            index_dir=str(tmp_path / "index"),
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
            ann_model_path=model_path,
        )
        q.awaitTermination(120)

    snap(os.path.join(vecs_dir, "snap1.parquet"), b1)
    drain()
    snap(os.path.join(vecs_dir, "snap2.parquet"), b2)
    drain()
    drain_dir = str(tmp_path / "out" / "ann_store")

    res = merge_ann_appends(spark, store, drain_dir, loaded)
    assert sorted(res["merged_batches"]) == res["merged_batches"]
    assert res["rows"] == len(b1) + len(b2)

    full = str(tmp_path / "full_store")
    build_ann_store(as_emb(base_ids + b1 + b2), loaded, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]
    merged_rows = sorted(
        (int(r["vec_id"]), int(r["centroid_id"]), bytes(r["codes"]))
        for r in read_ann_store(spark, store, loaded)[0].collect()
    )
    full_rows = sorted(
        (int(r["vec_id"]), int(r["centroid_id"]), bytes(r["codes"]))
        for r in read_ann_store(spark, full, loaded)[0].collect()
    )
    assert merged_rows == full_rows

    # a re-run of the stream with nothing new + a re-merge: no-op
    drain()
    res2 = merge_ann_appends(spark, store, drain_dir, loaded)
    assert res2["merged_batches"] == [] and res2["rows"] == 0


def test_ann_search_stream_matches_batch(spark, setup, tmp_path):
    """The streaming search face: two query snapshots through
    `start_ann_search_stream` over frozen artifacts — each batch's
    results land in their own partition and equal `ann_topk_batch`
    over that snapshot; a replayed start is idempotent; duplicate ids
    within a batch kill the stream loudly."""
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    from inpe_queimadas_etl_spark.api import ann_topk_batch
    from inpe_queimadas_etl_spark.streaming import (
        start_ann_search_stream,
    )

    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    store = str(tmp_path / "store")
    build_ann_store(setup["emb"], model, store)

    qdir = str(tmp_path / "queries")
    os.makedirs(qdir)

    def snap(name, rows):
        pa_pq.write_table(
            pa.table(
                {
                    "query_id": pa.array(
                        [q for q, _ in rows], type=pa.int64()
                    ),
                    "qv": pa.array(
                        [v for _, v in rows],
                        type=pa.list_(pa.float64()),
                    ),
                }
            ),
            os.path.join(qdir, name),
        )

    q1 = [
        (int(r["vec_id"]) + 100_000, [float(x) for x in r["v"]])
        for r in setup["emb"].filter(F.col("vec_id") < 4).collect()
    ]
    q2 = [
        (int(r["vec_id"]) + 200_000, [float(x) for x in r["v"]])
        for r in setup["emb"]
        .filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 8))
        .collect()
    ]

    def run():
        q = start_ann_search_stream(
            spark,
            queries_dir=qdir,
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            store_path=store,
            model_path=setup["model_path"],
            k=3,
            rerank_with=setup["emb"],
            available_now=True,
        )
        q.awaitTermination(120)

    snap("snap1.parquet", q1)
    run()
    snap("snap2.parquet", q2)
    run()
    res_dir = str(tmp_path / "out" / "results")
    got = spark.read.parquet(res_dir)
    assert sorted(
        int(r["batch_id"]) for r in got.select("batch_id").distinct().collect()
    ) == [0, 1]

    for snap_rows, bid in ((q1, 0), (q2, 1)):
        qdf = spark.createDataFrame(
            snap_rows, "query_id long, qv array<double>"
        )
        want = (
            ann_topk_batch(
                spark, store, setup["model_path"], qdf, k=3,
                rerank_with=setup["emb"],
            )
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        got_b = (
            got.filter(F.col("batch_id") == bid)
            .drop("batch_id")
            .toPandas()
            .sort_values(["query_id", "rank"], ignore_index=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(
            got_b[sorted(got_b.columns)], want[sorted(want.columns)]
        )

    # nothing new landed: a re-run processes nothing, results intact
    n_before = got.count()
    run()
    assert spark.read.parquet(res_dir).count() == n_before

    # duplicate ids within one snapshot kill that batch loudly
    snap("snap3.parquet", [q1[0], q1[0]])
    from pyspark.errors import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="unique"):
        q = start_ann_search_stream(
            spark,
            queries_dir=qdir,
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            store_path=store,
            model_path=setup["model_path"],
            k=3,
            available_now=True,
        )
        q.awaitTermination(120)


def test_merge_reads_watermark_under_the_journal(
    spark, setup, tmp_path, monkeypatch
):
    """The overlapping-merge race (review r10 round 3): the
    authoritative watermark read happens AFTER the O_EXCL journal
    acquisition. Simulated by a stamp reader that serves a STALE
    stamp (no watermark) on the store's first read — the pre-journal
    refusal pass — and the truth afterwards: a merge that trusted the
    first read would re-publish already-merged batches; the fixed
    path sees the committed watermark under the journal and no-ops."""
    import inpe_queimadas_etl_spark.operators.pq as pq

    model = setup["model"]
    store, drain = _fresh_stores(spark, setup, tmp_path)
    first = merge_ann_appends(spark, store, drain, model)
    assert first["merged_through"] == 1
    _stamp, sizes_after = read_ann_store_stamp(store)

    real = pq.read_ann_store_stamp
    state = {"stale_served": False}

    def stale_once(path):
        stamp, sizes = real(path)
        if path == store and not state["stale_served"]:
            state["stale_served"] = True
            stamp = dict(stamp)
            stamp.pop("merged_through", None)  # the pre-M1 view
        return stamp, sizes

    monkeypatch.setattr(pq, "read_ann_store_stamp", stale_once)
    res = merge_ann_appends(spark, store, drain, model)
    monkeypatch.undo()
    assert state["stale_served"]  # the stale read WAS consumed
    assert res["merged_batches"] == [] and res["rows"] == 0
    assert read_ann_store_stamp(store)[1] == sizes_after  # no dupes


def test_compact_ignores_uncommitted_batches(spark, setup, tmp_path):
    """compact's watermark may only name batches consumed WHOLE
    (review r10 round 3): a batch without _SUCCESS is excluded from
    the read AND the watermark, so its replay merges in full later
    instead of being half-read then skipped forever."""
    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    _store, drain = _fresh_stores(spark, setup, tmp_path)
    # batch 1 crashed mid-commit: data present, no _SUCCESS
    os.unlink(os.path.join(drain, "batch_id=1", "_SUCCESS"))

    compacted = str(tmp_path / "compacted")
    compact_ann_store(spark, drain, compacted, model)
    stamp, sizes = read_ann_store_stamp(compacted)
    assert stamp["merged_through"] == 0  # batch 1 NOT consumed
    assert sum(sizes.values()) == b0.count()  # none of its rows read

    # the stream replays batch 1 (full rewrite, _SUCCESS lands)
    _append_drain_batch(drain, b1, model, 1)
    res = merge_ann_appends(spark, compacted, drain, model)
    assert res["merged_batches"] == [1]
    assert res["rows"] == b1.count()
    # the compacted store covers the DRAIN's rows only (b0 + b1) —
    # base never flowed through this drain
    full = str(tmp_path / "full")
    build_ann_store(b0.union(b1), model, full)
    assert read_ann_store_stamp(compacted)[1] == read_ann_store_stamp(full)[1]
    _pin_serving_equal(spark, setup, compacted, full)


def test_merge_propagates_drain_tombstones_to_merged_rows(
    spark, setup, tmp_path
):
    """A takedown filed against the DRAIN after its batch was merged
    must retire the row in the serving store too (review r10 round 3
    — compact honors drain tombstones on rebuild, so merge must
    match): the next merge copies the drain's tombstones into the
    store's set even with no new batch to fold."""
    from inpe_queimadas_etl_spark.operators.pq import (
        read_ann_tombstones,
    )

    model = setup["model"]
    _base, b0, _b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path, drain_batches=(0,))
    merge_ann_appends(spark, store, drain, model)
    victim = int(b0.first()["vec_id"])

    delete_from_ann_store(drain, [victim])  # takedown on the drain
    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [] and res["tombstoned"] == 1
    assert victim in read_ann_tombstones(store)
    qv = _queries(setup)
    served = ann_topk(
        spark, store, setup["model_path"], qv, k=10,
        rerank_with=setup["emb"],
    ).collect()
    assert victim not in {int(r["neighbor_id"]) for r in served}


def test_merge_consumes_dataless_batches(spark, setup, tmp_path):
    """A zero-survivor streaming batch writes only _SUCCESS — merge
    must consume it (advance the watermark) without tripping schema
    inference over a data-less dir (review r10 round 3)."""
    model = setup["model"]
    base, b0, _b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path, drain_batches=(0,))
    # batch 1: every row deduped away — the real drain shape (an
    # empty encode), typically _SUCCESS with no data files
    _append_drain_batch(
        drain, setup["emb"].filter(F.lit(False)), model, 1
    )
    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [0, 1]
    assert res["merged_through"] == 1
    assert res["rows"] == b0.count()
    # and a drain holding ONLY data-less deltas still consumes them
    _append_drain_batch(
        drain, setup["emb"].filter(F.lit(False)), model, 2
    )
    res2 = merge_ann_appends(spark, store, drain, model)
    assert res2["merged_batches"] == [2] and res2["rows"] == 0
    assert read_ann_store_stamp(store)[0]["merged_through"] == 2


def test_watermark_never_jumps_an_uncommitted_gap(spark, setup, tmp_path):
    """A committed batch ABOVE an uncommitted gap must wait (review
    r10 round 4): the watermark advances only through the contiguous
    committed run, so when the gap batch finally commits (replay /
    late _SUCCESS) its rows merge instead of being buried below the
    watermark forever."""
    model = setup["model"]
    base, b0, b1, b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)
    _append_drain_batch(drain, b2, model, 2)
    # batch 1 lost its commit marker; batch 2 is committed above it
    os.unlink(os.path.join(drain, "batch_id=1", "_SUCCESS"))

    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [0]  # stops AT the gap
    assert res["merged_through"] == 0

    # compact over the same drain obeys the same rule
    compacted = str(tmp_path / "compacted")
    compact_ann_store(spark, drain, compacted, model)
    assert read_ann_store_stamp(compacted)[0]["merged_through"] == 0

    # the gap commits (stream replay): everything above merges now
    _append_drain_batch(drain, b1, model, 1)
    res2 = merge_ann_appends(spark, store, drain, model)
    assert res2["merged_batches"] == [1, 2]
    full = str(tmp_path / "full")
    build_ann_store(setup["emb"], model, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]


def test_phase0_journal_does_not_block_serving(spark, setup, tmp_path):
    """Serving availability during a staging merge (review r10 round
    4): a phase-0 journal (no moves listed — the store is untouched)
    must NOT refuse reads; a phase-1 journal (moves in flight) and a
    truncated one must."""
    model = setup["model"]
    store, _drain = _fresh_stores(spark, setup, tmp_path, drain_batches=(0,))
    jp = os.path.join(store, ANN_MERGE_JOURNAL)

    with open(jp, "w") as f:
        json.dump({"from": None, "to": None, "moves": []}, f)
    df, sizes = read_ann_store(spark, store, model)  # serves fine
    assert sizes is not None and df.count() > 0

    with open(jp, "w") as f:
        json.dump({"from": -1, "to": 0, "moves": [["a", "b"]]}, f)
    with pytest.raises(ValueError, match="moves in flight"):
        read_ann_store(spark, store, model)

    with open(jp, "w") as f:
        f.write('{"from": -1, "to"')  # rewrite caught mid-flight
    with pytest.raises(ValueError, match="moves in flight"):
        read_ann_store(spark, store, model)
    os.unlink(jp)


def test_merge_loser_gets_documented_refusal(spark, setup, tmp_path):
    """merge x merge: the loser of the journal acquire must surface
    the DOCUMENTED 'pending merge journal' refusal, not a naked
    FileExistsError (caught live by the concurrent-rounds soak under
    host load, r12). A phase-0 journal passes every pre-acquire check
    — read_ann_store serves through it — so the acquire itself is
    the only arbiter left, exactly the racing-rounds window."""
    model = setup["model"]
    store, drain = _fresh_stores(
        spark, setup, tmp_path, drain_batches=(0,)
    )
    jp = os.path.join(store, ANN_MERGE_JOURNAL)
    with open(jp, "w") as f:
        json.dump({"from": None, "to": None, "moves": []}, f)
    with pytest.raises(ValueError, match="pending merge journal"):
        merge_ann_appends(spark, store, drain, model)
    os.unlink(jp)


def test_compacted_store_does_not_regrow_historical_tombstones(
    spark, setup, tmp_path
):
    """Takedown history must not re-enter a freshly-compacted store's
    serve-time NOT-IN (review r10 round 4): compaction records the
    ids it dropped PHYSICALLY, and merges re-propagate only drain
    tombstones beyond that set."""
    from inpe_queimadas_etl_spark.operators.pq import (
        read_ann_applied_tombstones,
        read_ann_tombstones,
    )

    model = setup["model"]
    _base, b0, b1, _b2 = setup["splits"]
    _store, drain = _fresh_stores(spark, setup, tmp_path)
    old_takedown = int(b0.first()["vec_id"])
    delete_from_ann_store(drain, [old_takedown])

    compacted = str(tmp_path / "compacted")
    compact_ann_store(spark, drain, compacted, model)
    assert read_ann_tombstones(compacted) == []  # clean slate
    assert read_ann_applied_tombstones(compacted) == [old_takedown]

    # merge with no new batches: the historical takedown must NOT
    # come back as a row-less tombstone
    res = merge_ann_appends(spark, compacted, drain, model)
    assert res["tombstoned"] == 0
    assert read_ann_tombstones(compacted) == []

    # a NEW takedown propagates normally
    new_takedown = int(b1.first()["vec_id"])
    delete_from_ann_store(drain, [new_takedown])
    res2 = merge_ann_appends(spark, compacted, drain, model)
    assert res2["tombstoned"] == 1
    assert read_ann_tombstones(compacted) == [new_takedown]


def test_consumable_batches_property(tmp_path):
    """Property pin for the watermark walk (`_consumable_drain_batches`):
    over random present/committed batch layouts, the consumable run
    is always (a) a subset of committed ids above the watermark, (b)
    CONTIGUOUS, (c) anchored at watermark+1 lifted past any retention
    hole below the lowest present dir (batches commit in order, so
    in-flight work is always at the top and a low hole can never be a
    pending batch), and (d) maximal — the id after the run is absent
    or uncommitted. These four together are exactly the no-gap-burial
    guarantee."""
    import shutil

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inpe_queimadas_etl_spark.operators.pq import (
        _consumable_drain_batches,
    )

    root = tmp_path / "drains"

    @settings(max_examples=60, deadline=None)
    @given(
        present=st.sets(st.integers(0, 14), max_size=10),
        committed_mask=st.lists(st.booleans(), min_size=10, max_size=10),
        watermark=st.integers(-1, 14),
    )
    def check(present, committed_mask, watermark):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root)
        present = sorted(present)
        committed = {
            b
            for b, keep in zip(present, committed_mask)
            if keep
        }
        for b in present:
            d = root / f"batch_id={b}"
            os.makedirs(d)
            if b in committed:
                (d / "_SUCCESS").touch()
        out = _consumable_drain_batches(str(root), watermark)
        # (a) committed, above the watermark
        assert set(out) <= committed
        assert all(b > watermark for b in out)
        # (b) contiguous
        assert out == list(range(out[0], out[0] + len(out))) if out else True
        # (c) anchor: watermark+1, lifted past a retention hole
        # below the lowest present dir
        start = (
            max(watermark + 1, min(present)) if present else None
        )
        if start is not None and start in committed:
            assert out and out[0] == start
        else:
            assert out == []
        # (d) maximal: the next id is absent or uncommitted
        if out:
            assert (out[-1] + 1) not in committed or (
                out[-1] + 1 > max(present)
            )

    check()


def test_cli_ann_search_stream(spark, setup, tmp_path, capsys):
    """The ann-search-stream CLI veneer: sweeps landed query
    snapshots through the streaming search and prints the batch
    summary; the results parquet matches ann_topk_batch."""
    import logging

    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    from inpe_queimadas_etl_spark import cli
    from inpe_queimadas_etl_spark.api import ann_topk_batch

    model = setup["model"]
    store = str(tmp_path / "store")
    build_ann_store(setup["emb"], model, store)
    qdir = str(tmp_path / "queries")
    os.makedirs(qdir)
    q1 = [
        (int(r["vec_id"]) + 300_000, [float(x) for x in r["v"]])
        for r in setup["emb"].filter(F.col("vec_id") < 3).collect()
    ]
    pa_pq.write_table(
        pa.table(
            {
                "query_id": pa.array([q for q, _ in q1], type=pa.int64()),
                "qv": pa.array(
                    [v for _, v in q1], type=pa.list_(pa.float64())
                ),
            }
        ),
        os.path.join(qdir, "snap1.parquet"),
    )
    root = logging.getLogger()
    saved = (root.handlers[:], root.level)
    try:
        rc = cli.main(
            [
                "ann-search-stream",
                "--queries-dir", qdir,
                "--out-dir", str(tmp_path / "out"),
                "--checkpoint-dir", str(tmp_path / "ckpt"),
                "--store", store,
                "--model", setup["model_path"],
                "-k", "3",
            ]
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["batches"] == [0]
    finally:
        root.handlers[:] = saved[0]
        root.setLevel(saved[1])
    got = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]))
        for r in spark.read.parquet(summary["results"]).collect()
    )
    qdf = spark.createDataFrame(q1, "query_id long, qv array<double>")
    want = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]))
        for r in ann_topk_batch(
            spark, store, setup["model_path"], qdf, k=3
        ).collect()
    )
    assert got == want


def test_merge_survives_drain_retention_cleanup(spark, setup, tmp_path):
    """Drain retention: already-merged low batch dirs deleted from
    the drain must not wedge the merge — the walk lifts its anchor
    past the hole (only in-flight work can sit at the TOP of a
    sequentially-committing drain) and new batches keep folding."""
    import shutil

    model = setup["model"]
    base, b0, b1, b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)
    merge_ann_appends(spark, store, drain, model)  # through batch 1

    # retention prunes the consumed dirs; a new batch lands after
    shutil.rmtree(os.path.join(drain, "batch_id=0"))
    shutil.rmtree(os.path.join(drain, "batch_id=1"))
    _append_drain_batch(drain, b2, model, 2)
    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_batches"] == [2]
    full = str(tmp_path / "full")
    build_ann_store(setup["emb"], model, full)
    assert read_ann_store_stamp(store)[1] == read_ann_store_stamp(full)[1]


def test_store_gc_compact_preserves_watermark_and_applied_history(
    spark, setup, tmp_path
):
    """GC-compacting a SERVING store (store->store, the tombstone-GC
    shape) must carry the source's merge watermark and its applied-
    tombstone history into the output: losing the watermark would let
    the next `merge_ann_appends` re-add every batch the store already
    holds (silent row duplication), and losing the applied set would
    regrow the drain's takedown history as row-less serve-time
    tombstones on every GC cycle."""
    from inpe_queimadas_etl_spark.operators.pq import (
        read_ann_applied_tombstones,
        read_ann_tombstones,
    )

    model = setup["model"]
    base, b0, b1, _b2 = setup["splits"]
    store, drain = _fresh_stores(spark, setup, tmp_path)

    # drain carries a takedown BEFORE the first merge, so the merge
    # propagates it into the store's live tombstone set (T1)
    t1 = [int(r["vec_id"]) for r in b0.limit(2).collect()]
    delete_from_ann_store(drain, t1)
    res = merge_ann_appends(spark, store, drain, model)
    assert res["merged_through"] == 1 and res["tombstoned"] == len(t1)
    assert read_ann_tombstones(store) == sorted(t1)

    # a second takedown lands directly on the store (T2)
    t2 = [int(r["vec_id"]) for r in base.limit(2).collect()]
    delete_from_ann_store(store, t2)

    # GC-compact the serving store: physical drop of T1+T2
    gc1 = str(tmp_path / "gc1")
    compact_ann_store(spark, store, gc1, model)
    got = {int(r["vec_id"]) for r in read_ann_store(spark, gc1, model)[0]
           .select("vec_id").collect()}
    assert not (set(t1) | set(t2)) & got
    stamp, sizes = read_ann_store_stamp(gc1)
    # watermark carried over: the GC output still knows it holds
    # batches 0..1
    assert stamp.get("merged_through") == 1
    assert read_ann_applied_tombstones(gc1) == sorted(set(t1) | set(t2))
    assert read_ann_tombstones(gc1) == []

    # re-merging the same drain is a NO-OP (no duplicate rows) and
    # does not regrow T1 as live tombstones (its ids are applied)
    res2 = merge_ann_appends(spark, gc1, drain, model)
    assert res2["merged_batches"] == [] and res2["rows"] == 0
    assert res2["tombstoned"] == 0
    assert read_ann_tombstones(gc1) == []
    n_before = sum(sizes.values())
    _, sizes_after = read_ann_store_stamp(gc1)
    assert sum(sizes_after.values()) == n_before

    # a SECOND GC cycle keeps the union (history never shrinks until
    # a fresh rebuild)
    gc2 = str(tmp_path / "gc2")
    compact_ann_store(spark, gc1, gc2, model)
    assert read_ann_applied_tombstones(gc2) == sorted(set(t1) | set(t2))
    assert read_ann_store_stamp(gc2)[0].get("merged_through") == 1


def test_ann_search_stream_text_in_matches_batch(spark, tmp_path):
    """`queries_are_text=True` (r11): a continuous TEXT feed searches
    a hashed-encoder store with the embedding done in-plan per batch
    — pinned equal to `ann_topk_batch(queries_text=)` over the same
    snapshot, and schema validation names the text columns."""
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    from inpe_queimadas_etl_spark.api import ann_topk_batch
    from inpe_queimadas_etl_spark.operators.pq import (
        load_ann_model,
        save_ann_model,
        train_ann_model,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.streaming import (
        start_ann_search_stream,
    )
    from inpe_queimadas_etl_spark.suite.llmdata import (
        hashed_doc_vectors,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = (
        hashed_doc_vectors(docs, dim=64)
        .withColumn("nrm", vec_norm("v"))
        .select(F.col("doc_id").alias("vec_id"), "v", "nrm")
    )
    model = train_ann_model(emb, k=4, m=8, ks=16, frac=0.5, cand=100)
    model_path = str(tmp_path / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"],
    )
    store = str(tmp_path / "store")
    build_ann_store(emb, load_ann_model(model_path), store)

    texts = [
        (int(r["doc_id"]) + 100_000, r["text"])
        for r in docs.filter(F.col("doc_id") < 5).collect()
    ]
    qdir = str(tmp_path / "qtexts")
    os.makedirs(qdir)
    pa_pq.write_table(
        pa.table(
            {
                "query_id": pa.array(
                    [q for q, _ in texts], type=pa.int64()
                ),
                "text": pa.array(
                    [t for _, t in texts], type=pa.string()
                ),
            }
        ),
        os.path.join(qdir, "snap1.parquet"),
    )

    q = start_ann_search_stream(
        spark,
        queries_dir=qdir,
        out_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        store_path=store,
        model_path=model_path,
        k=3,
        available_now=True,
        queries_are_text=True,
    )
    q.awaitTermination(120)

    got = (
        spark.read.parquet(str(tmp_path / "out" / "results"))
        .drop("batch_id")
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    qdf = spark.createDataFrame(texts, "query_id long, text string")
    want = (
        ann_topk_batch(
            spark, store, model_path, k=3, queries_text=qdf
        )
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    # each query text is a stored doc — its own row wins rank 1
    top1 = got[got["rank"] == 1].set_index("query_id")["neighbor_id"]
    assert {int(k): int(v) for k, v in top1.items()} == {
        100_000 + i: i for i in range(5)
    }

    # vec-schema feed refused with the text columns named
    from pyspark.sql import types as T

    vec_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("qv", T.ArrayType(T.DoubleType())),
        ]
    )
    with pytest.raises(ValueError, match="query_id, text"):
        start_ann_search_stream(
            spark,
            queries_dir=str(tmp_path / "qvecs_missing"),
            out_dir=str(tmp_path / "out2"),
            checkpoint_dir=str(tmp_path / "ckpt2"),
            store_path=store,
            model_path=model_path,
            queries_are_text=True,
            schema=vec_schema,
        )
