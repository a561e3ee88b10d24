"""ANN lifecycle maintenance (`operators/annmaint.py`): the planner
must name the right actions from file metadata alone (no Spark, no
data read), `gc_ann_version` must drop tombstones physically behind an
atomic version swap that never breaks serving, and one applied round
must compose merge -> gc -> prune in order — with the GC'd store's
carried watermark keeping later merges duplicate-free."""

from __future__ import annotations

import json
import os

import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.api import ann_topk
from inpe_queimadas_etl_spark.operators.annmaint import (
    ann_maintenance_plan,
    gc_ann_version,
    run_ann_maintenance,
)
from inpe_queimadas_etl_spark.operators.pq import (
    ANN_MERGE_JOURNAL,
    build_ann_store,
    delete_from_ann_store,
    load_ann_model,
    merge_ann_appends,
    pq_ivf_encode,
    read_ann_store,
    read_ann_store_stamp,
    read_ann_tombstones,
    rebuild_ann,
    resolve_ann_current,
    save_ann_model,
    train_ann_model,
    write_ann_store_meta,
)

SF0001 = "/root/testdata/sf0.001"


def _emb(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import _sim8_emb

    return _sim8_emb(spark, SF0001)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ann_maint")
    emb = _emb(spark).cache()
    n = emb.count()
    cut = int(n * 0.8)
    base_split = emb.filter(F.col("vec_id") < cut)
    delta_split = emb.filter(F.col("vec_id") >= cut)
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
        "splits": (base_split, delta_split),
    }


def _drain(setup, tmp_path, batches):
    model = setup["model"]
    drain = str(tmp_path / "drain")
    for b, sl in batches:
        pq_ivf_encode(
            sl, model["cents3"], model["cb"], rot=model.get("rot")
        ).write.mode("overwrite").parquet(f"{drain}/batch_id={b}")
    write_ann_store_meta(
        drain, model["sha256"], encoding_sha256=model["encoding_sha256"]
    )
    return drain


def _deployment(spark, setup, tmp_path):
    """A rebuild_ann deployment whose v1 store is REPLACED by one
    built from the base split under the SAME shared model, so drains
    encoded with setup's model merge cleanly."""
    import shutil

    base_split, _ = setup["splits"]
    base = str(tmp_path / "dep")
    os.makedirs(os.path.join(base, "versions", "v1"))
    shutil.copyfile(
        setup["model_path"],
        os.path.join(base, "versions", "v1", "model.json"),
    )
    build_ann_store(
        base_split, setup["model"],
        os.path.join(base, "versions", "v1", "store"),
    )
    with open(os.path.join(base, "CURRENT"), "w") as f:
        json.dump(
            {
                "version": 1,
                "model": "versions/v1/model.json",
                "store": "versions/v1/store",
                "model_sha256": setup["model"]["sha256"],
            },
            f,
        )
    return base


def _served_ids(spark, setup, base_dir, k=10):
    cur = resolve_ann_current(base_dir)
    q = [
        (int(r["vec_id"]) + 50_000, list(r["v"]))
        for r in setup["emb"].limit(3).collect()
    ]
    rows = ann_topk(
        spark, cur["store_path"], cur["model_path"], q, k=k,
        rerank_with=setup["emb"],
        expected_sha256=cur["model_sha256"],
    ).collect()
    return {int(r["neighbor_id"]) for r in rows}


def test_gc_ann_version_drops_tombstones_atomically(
    spark, setup, tmp_path
):
    base = _deployment(spark, setup, tmp_path)
    base_split, _ = setup["splits"]

    # nothing to GC -> refusal names force
    with pytest.raises(ValueError, match="no live tombstones"):
        gc_ann_version(spark, base)

    victims = [int(r["vec_id"]) for r in base_split.limit(3).collect()]
    cur1 = resolve_ann_current(base)
    delete_from_ann_store(cur1["store_path"], victims)
    before = _served_ids(spark, setup, base)
    assert not set(victims) & before  # serve-time NOT-IN already hides

    res = gc_ann_version(spark, base)
    assert res["version"] == 2 and res["from_version"] == 1
    assert res["dropped_tombstones"] == len(victims)
    cur2 = resolve_ann_current(base)
    assert cur2["version"] == 2
    # the MODEL is byte-identical (same sha): serving pins keep holding
    assert cur2["model_sha256"] == cur1["model_sha256"]
    # physically gone, tombstone slate clean
    model = setup["model"]
    got = {
        int(r["vec_id"])
        for r in read_ann_store(spark, cur2["store_path"], model)[0]
        .select("vec_id")
        .collect()
    }
    assert not set(victims) & got
    assert read_ann_tombstones(cur2["store_path"]) == []
    # serving identical to the pre-GC masked view
    assert _served_ids(spark, setup, base) == before
    # v1 stays for rollback
    assert os.path.isdir(os.path.join(base, "versions", "v1", "store"))
    # force=True defragments even with nothing tombstoned
    res3 = gc_ann_version(spark, base, force=True)
    assert res3["version"] == 3 and res3["dropped_tombstones"] == 0


def test_gc_crash_mid_compact_keeps_old_pointer(
    spark, setup, tmp_path, monkeypatch
):
    base = _deployment(spark, setup, tmp_path)
    cur1 = resolve_ann_current(base)
    delete_from_ann_store(
        cur1["store_path"],
        [int(r["vec_id"]) for r in setup["splits"][0].limit(1).collect()],
    )

    import inpe_queimadas_etl_spark.operators.annmaint as am

    def boom(*a, **kw):
        raise RuntimeError("injected: compaction died")

    monkeypatch.setattr(am, "compact_ann_store", boom)
    with pytest.raises(RuntimeError, match="injected"):
        gc_ann_version(spark, base)
    # pointer untouched, old pair still serves; residue is staging-only
    assert resolve_ann_current(base)["version"] == 1
    assert _served_ids(spark, setup, base)
    vdir = os.path.join(base, "versions")
    assert sorted(
        e for e in os.listdir(vdir) if not e.startswith(".")
    ) == ["v1"]


def test_maintenance_plan_reads_signals_sparkfree(
    spark, setup, tmp_path
):
    base_split, delta_split = setup["splits"]
    base = _deployment(spark, setup, tmp_path)
    drain = _drain(setup, tmp_path, [(0, delta_split)])

    # healthy deployment, empty drain watermark -> merge only
    plan = ann_maintenance_plan(base_dir=base, drain_dir=drain)
    assert [a["action"] for a in plan["actions"]] == ["merge"]
    assert plan["signals"]["backlog_batches"] == 1
    assert plan["signals"]["tomb_frac"] == 0.0
    # the retune rung is visible at plan time (VERDICT r12 #7):
    # current serving knobs + the O(files) price, deployment shape
    # only (a bare store has no CURRENT artifact to retune from)
    rt = plan["signals"]["retune_available"]
    assert rt["frac"] == setup["model"]["frac"]
    assert rt["cand"] == setup["model"]["cand"]
    assert "retune_ann_version" in rt["note"]

    # tombstones above threshold + stale versions + pending journal:
    # full ladder, in execution order
    cur = resolve_ann_current(base)
    victims = [int(r["vec_id"]) for r in base_split.limit(2).collect()]
    delete_from_ann_store(cur["store_path"], victims)
    for v in ("v2", "v3"):
        os.makedirs(os.path.join(base, "versions", v))
        with open(os.path.join(base, "versions", v, "model.json"), "w"):
            pass
    with open(
        os.path.join(cur["store_path"], ANN_MERGE_JOURNAL), "w"
    ) as f:
        json.dump({"from": None, "to": None, "moves": []}, f)
    plan = ann_maintenance_plan(
        base_dir=base, drain_dir=drain, tomb_gc_frac=0.001,
        keep_versions=1,
    )
    assert [a["action"] for a in plan["actions"]] == [
        "recover-merge", "merge", "gc", "prune-versions",
    ]
    assert all(a["executable"] for a in plan["actions"])
    sig = plan["signals"]
    assert sig["pending_merge"] is True
    assert sig["live_tombstones"] == len(victims)
    assert sig["prunable_versions"] == 1  # v3 kept (recent), v1 is
    # CURRENT, v2 is beyond the bound

    # bare store: gc is reported but not executable (no version swap)
    store2 = str(tmp_path / "bare")
    build_ann_store(base_split, setup["model"], store2)
    delete_from_ann_store(store2, victims)
    plan2 = ann_maintenance_plan(store_path=store2, tomb_gc_frac=0.001)
    gc = [a for a in plan2["actions"] if a["action"] == "gc"]
    assert gc and gc[0]["executable"] is False
    assert plan2["signals"]["retune_available"] is None

    with pytest.raises(ValueError, match="exactly one"):
        ann_maintenance_plan(store_path=store2, base_dir=base)


def test_run_maintenance_composes_merge_gc_prune(spark, setup, tmp_path):
    base_split, delta_split = setup["splits"]
    base = _deployment(spark, setup, tmp_path)
    drain = _drain(setup, tmp_path, [(0, delta_split)])
    cur1 = resolve_ann_current(base)
    victims = [int(r["vec_id"]) for r in base_split.limit(2).collect()]
    delete_from_ann_store(cur1["store_path"], victims)

    calls = []

    def factory():
        calls.append(1)
        return spark

    # dry run: plan only, NO spark
    dry = run_ann_maintenance(
        factory, base_dir=base, drain_dir=drain, tomb_gc_frac=0.001,
        keep_versions=1,
    )
    assert [a["action"] for a in dry["plan"]["actions"]] == [
        "merge", "gc",
    ]
    assert dry["applied"] == [] and not calls

    res = run_ann_maintenance(
        factory, base_dir=base, drain_dir=drain, apply=True,
        tomb_gc_frac=0.001, keep_versions=1,
    )
    assert res["applied"] == ["merge", "gc"]
    assert len(calls) == 1  # one session for the whole round
    assert res["results"]["merge"]["merged_batches"] == [0]
    assert res["results"]["gc"]["version"] == 2

    # the GC'd store carried the advanced watermark: the next round
    # sees NO backlog and NO tombstones — only the version the GC
    # pushed past retention (plans are point-in-time; the cron's next
    # tick converges)
    res2 = run_ann_maintenance(
        factory, base_dir=base, drain_dir=drain, apply=True,
        tomb_gc_frac=0.001, keep_versions=1,
    )
    assert res2["applied"] == ["prune-versions"]
    assert res2["results"]["prune-versions"]["removed"] == [1]
    res3 = run_ann_maintenance(
        factory, base_dir=base, drain_dir=drain, apply=True,
        tomb_gc_frac=0.001, keep_versions=1,
    )
    assert res3["plan"]["actions"] == [] and res3["applied"] == []
    assert len(calls) == 1  # prune rounds never started Spark

    # final state: base + delta - victims, physically
    cur2 = resolve_ann_current(base)
    stamp, sizes = read_ann_store_stamp(cur2["store_path"])
    n = setup["emb"].count()
    assert sum(sizes.values()) == n - len(victims)
    assert stamp["merged_through"] == 0
    assert read_ann_tombstones(cur2["store_path"]) == []


def test_run_maintenance_blocks_on_journal_without_recover(
    spark, setup, tmp_path
):
    base_split, delta_split = setup["splits"]
    base = _deployment(spark, setup, tmp_path)
    drain = _drain(setup, tmp_path, [(0, delta_split)])
    cur = resolve_ann_current(base)
    with open(
        os.path.join(cur["store_path"], ANN_MERGE_JOURNAL), "w"
    ) as f:
        json.dump({"from": None, "to": None, "moves": []}, f)

    def factory():
        raise AssertionError("blocked round must not start Spark")

    res = run_ann_maintenance(
        factory, base_dir=base, drain_dir=drain, apply=True
    )
    assert res["applied"] == []
    assert "recover-merge" in res["blocked"]

    # with recover granted, the merge call resolves the stub journal
    # (phase-0 -> rollback) and folds the backlog in the same round
    res2 = run_ann_maintenance(
        lambda: spark, base_dir=base, drain_dir=drain, apply=True,
        recover=True,
    )
    assert "merge" in res2["applied"]
    assert res2["results"]["merge"]["recovered"] == "rolled_back"
    assert res2["results"]["merge"]["merged_batches"] == [0]
    assert not os.path.exists(
        os.path.join(cur["store_path"], ANN_MERGE_JOURNAL)
    )
    # merged result equals a full build over the union
    full = str(tmp_path / "full")
    build_ann_store(setup["emb"], setup["model"], full)
    assert (
        read_ann_store_stamp(cur["store_path"])[1]
        == read_ann_store_stamp(full)[1]
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


def test_ann_maintain_cli_dry_run_is_sparkfree(
    tmp_path, _preserve_root_logging, capsys
):
    """The shell planner reads ONLY file metadata: a hand-crafted
    store meta + drain dirs (no parquet anywhere, no Spark) must
    yield the full plan JSON on stdout."""
    from inpe_queimadas_etl_spark.cli import main as cli_main

    store = tmp_path / "store"
    store.mkdir()
    write_ann_store_meta(
        str(store), "a" * 64, sizes={0: 60, 1: 40},
        encoding_sha256="b" * 64, merged_through=0,
    )
    delete_from_ann_store(str(store), [1, 2, 3])
    drain = tmp_path / "drain"
    for b in (0, 1, 2):
        d = drain / f"batch_id={b}"
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
        (d / "part-0.parquet").touch()
    # a WELL-PAIRED drain carries the store's encoding stamp — an
    # unstamped drain now plans as non-executable by design (ADVICE
    # r10: merge/retention refuse it, so the plan must too)
    write_ann_store_meta(
        str(drain), "a" * 64, encoding_sha256="b" * 64
    )

    rc = cli_main(
        [
            "ann-maintain", "--store", str(store),
            "--drain", str(drain), "--tomb-gc-frac", "0.01",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    acts = {a["action"]: a for a in out["plan"]["actions"]}
    sig = out["plan"]["signals"]
    assert sig["backlog_batches"] == 2  # batches 1,2 past watermark 0
    assert sig["live_tombstones"] == 3 and sig["rows"] == 100
    assert acts["merge"]["executable"] is True
    assert acts["gc"]["executable"] is False  # bare store
    assert out["applied"] == []  # dry run


def test_prune_ann_drain_retention(spark, setup, tmp_path):
    """Drain retention: only batches the COMMITTED store watermark
    covers (minus the replay window) are removed; uncommitted/future
    batches are never touched; wrong store/drain pairings are
    refused; the planner grows the prune-drain rung and a round
    converges."""
    from inpe_queimadas_etl_spark.operators.pq import prune_ann_drain

    base_split, delta_split = setup["splits"]
    model = setup["model"]
    store = str(tmp_path / "store")
    build_ann_store(base_split, model, store)
    d0 = delta_split.filter(F.col("vec_id") % 2 == 0)
    d1 = delta_split.filter(F.col("vec_id") % 2 == 1)
    drain = _drain(setup, tmp_path, [(0, d0), (1, d1)])

    # nothing consumed yet: watermark -1, nothing ever prunable
    res = prune_ann_drain(drain, store, keep_batches=0)
    assert res["removed"] == [] and res["watermark"] == -1

    merge_ann_appends(spark, store, drain, model)  # watermark -> 1

    # replay window keeps recent consumed batches
    assert prune_ann_drain(drain, store, keep_batches=2)["removed"] == []

    # a FUTURE batch above the watermark is never touched
    d2 = delta_split.filter(F.col("vec_id") % 2 == 1).limit(0)
    pq_ivf_encode(
        d1, model["cents3"], model["cb"], rot=model.get("rot")
    ).limit(0).write.mode("overwrite").parquet(f"{drain}/batch_id=2")
    del d2

    plan = ann_maintenance_plan(
        store_path=store, drain_dir=drain, drain_keep_batches=0
    )
    assert plan["signals"]["prunable_drain_batches"] == 2
    assert "prune-drain" in [a["action"] for a in plan["actions"]]

    out = run_ann_maintenance(
        lambda: spark, store_path=store, drain_dir=drain,
        model_path=setup["model_path"], apply=True,
        drain_keep_batches=0,
    )
    # batch 2 is committed-with-no-data: the round's merge CONSUMES
    # it (watermark -> 2), so with a zero replay window the
    # same-round retention legitimately drops all three consumed dirs
    # — retention reads the post-merge watermark, never the plan-time
    # snapshot
    assert "prune-drain" in out["applied"]
    assert out["results"]["prune-drain"]["removed"] == [0, 1, 2]
    assert out["results"]["prune-drain"]["watermark"] == 2
    for b in (0, 1, 2):
        assert not os.path.isdir(os.path.join(drain, f"batch_id={b}"))

    # wrong pairing refused: a store stamped under another encoding
    other = tmp_path / "other_store"
    other.mkdir()
    write_ann_store_meta(
        str(other), "f" * 64, sizes={0: 1},
        encoding_sha256="e" * 64, merged_through=5,
    )
    with pytest.raises(ValueError, match="different encodings"):
        prune_ann_drain(drain, str(other))

    # converged: an empty drain plans nothing
    out3 = ann_maintenance_plan(
        store_path=store, drain_dir=drain, drain_keep_batches=0
    )
    assert out3["actions"] == []


def test_retention_never_changes_what_a_merge_would_fold(tmp_path):
    """Property pin for retention/merge composition over CONTRACT-
    VALID drain states (batch dirs appear in id order, _SUCCESS lands
    in id order, prior retention removed a prefix at or below the
    watermark): `prune_ann_drain` (a) removes only committed ids at
    or below watermark - keep, and (b) leaves
    `_consumable_drain_batches` EXACTLY as it was — retention can
    never change what the next merge folds, in any order."""
    import shutil

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from inpe_queimadas_etl_spark.operators.pq import (
        _consumable_drain_batches,
        prune_ann_drain,
    )

    root = tmp_path / "roots"

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 12),
        data=st.data(),
    )
    def check(n, data):
        # commit frontier: batches 0..c committed, (c..n) in flight
        c = data.draw(st.integers(-1, n - 1), label="frontier")
        # consumed watermark never passes the frontier
        w = data.draw(st.integers(-1, c), label="watermark")
        # prior retention removed a prefix of consumed batches
        p = data.draw(st.integers(0, w + 1), label="prior_prefix")
        keep = data.draw(st.integers(0, 4), label="keep")

        shutil.rmtree(root, ignore_errors=True)
        drain = root / "drain"
        store = root / "store"
        os.makedirs(drain)
        os.makedirs(store)
        write_ann_store_meta(
            str(drain), "a" * 64, encoding_sha256="b" * 64
        )
        write_ann_store_meta(
            str(store), "a" * 64, sizes={0: 1},
            encoding_sha256="b" * 64,
            merged_through=None if w < 0 else w,
        )
        present = list(range(p, n))
        for b in present:
            d = drain / f"batch_id={b}"
            os.makedirs(d)
            if b <= c:
                (d / "_SUCCESS").touch()

        before = _consumable_drain_batches(str(drain), w)
        res = prune_ann_drain(str(drain), str(store), keep_batches=keep)
        # (a) only committed, consumed, out-of-window ids go
        assert all(b <= w - keep and b <= c for b in res["removed"])
        assert res["watermark"] == w
        assert res["skipped_uncommitted"] == []  # valid states only
        # (b) the foldable run is untouched
        assert _consumable_drain_batches(str(drain), w) == before
        for b in res["removed"]:
            assert not os.path.isdir(drain / f"batch_id={b}")
        for b in res["kept"]:
            assert os.path.isdir(drain / f"batch_id={b}")
        assert sorted(res["removed"] + res["kept"]) == present

    check()


def test_retention_skips_uncommitted_dirs_in_corrupt_states(tmp_path):
    """An uncommitted dir at or below the watermark is a corrupt
    state (the watermark only advances over committed batches): its
    rows were never folded, so retention must skip it loudly instead
    of deleting never-consumed data."""
    from inpe_queimadas_etl_spark.operators.pq import prune_ann_drain

    drain = tmp_path / "drain"
    store = tmp_path / "store"
    os.makedirs(drain)
    os.makedirs(store)
    write_ann_store_meta(str(drain), "a" * 64, encoding_sha256="b" * 64)
    write_ann_store_meta(
        str(store), "a" * 64, sizes={0: 1},
        encoding_sha256="b" * 64, merged_through=1,
    )
    for b, ok in [(0, False), (1, True)]:  # 0 uncommitted yet "consumed"
        d = drain / f"batch_id={b}"
        os.makedirs(d)
        if ok:
            (d / "_SUCCESS").touch()
    res = prune_ann_drain(str(drain), str(store), keep_batches=0)
    assert res["removed"] == [1]
    assert res["skipped_uncommitted"] == [0]
    assert os.path.isdir(drain / "batch_id=0")


def test_maintenance_round_over_real_streaming_drain(spark, tmp_path):
    """End-to-end: a REAL embedding-drain deployment (Structured
    Streaming micro-batches, unified stamp, _SUCCESS markers) through
    full `ann-maintain` rounds — merge folds the landed batches, gc
    retires takedowns into a new version, drain retention removes the
    consumed dirs, and a post-retention stream append keeps folding
    (the retention-hole walk) with serving correct throughout."""
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

    def snap(name, ids):
        pa_pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array(
                        [vec(i) for i in ids], type=pa.list_(pa.float32())
                    ),
                }
            ),
            os.path.join(vecs_dir, name),
        )

    def as_emb(ids):
        return spark.createDataFrame(
            [(int(i), vec(i)) for i in ids],
            "vec_id long, v array<double>",
        ).withColumn("nrm", vec_norm("v"))

    base_ids = list(range(20))
    base_df = as_emb(base_ids)
    dep = str(tmp_path / "dep")
    rebuild_ann(base_df, dep, k=2, m=8, ks=4, frac=1.0, cand=100)
    cur = resolve_ann_current(dep)

    vecs_dir = str(tmp_path / "vecs")
    os.makedirs(vecs_dir)

    def drain_once():
        q = start_embedding_dedup_stream(
            spark,
            vecs_dir=vecs_dir,
            index_dir=str(tmp_path / "index"),
            out_dir=str(tmp_path / "out"),
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
            ann_model_path=cur["model_path"],
        )
        q.awaitTermination(120)

    b1, b2 = list(range(100, 115)), list(range(200, 215))
    snap("s1.parquet", b1)
    drain_once()
    snap("s2.parquet", b2)
    drain_once()
    drain_dir = str(tmp_path / "out" / "ann_store")

    victims = base_ids[:2]
    delete_from_ann_store(cur["store_path"], victims)

    res = run_ann_maintenance(
        lambda: spark, base_dir=dep, drain_dir=drain_dir, apply=True,
        tomb_gc_frac=0.001, keep_versions=2, drain_keep_batches=0,
    )
    # plan is point-in-time: retention becomes visible only after a
    # round's merge advanced the watermark (the cron's next tick)
    assert res["applied"] == ["merge", "gc"]
    assert res["results"]["merge"]["rows"] == len(b1) + len(b2)
    assert res["results"]["gc"]["dropped_tombstones"] == len(victims)

    cur2 = resolve_ann_current(dep)
    assert cur2["version"] == 2
    stamp, sizes = read_ann_store_stamp(cur2["store_path"])
    assert sum(sizes.values()) == len(base_ids) + len(b1) + len(b2) - len(
        victims
    )
    assert stamp["merged_through"] == 1

    # post-retention stream append: batch 2 lands above the hole and
    # the next round folds exactly it
    b3 = list(range(300, 310))
    snap("s3.parquet", b3)
    drain_once()
    res2 = run_ann_maintenance(
        lambda: spark, base_dir=dep, drain_dir=drain_dir, apply=True,
        tomb_gc_frac=0.001, keep_versions=2, drain_keep_batches=0,
    )
    assert "merge" in res2["applied"] and "prune-drain" in res2["applied"]
    assert res2["results"]["merge"]["merged_batches"] == [2]
    assert res2["results"]["merge"]["rows"] == len(b3)
    # retention runs after the merge, against the POST-merge
    # watermark: with a zero replay window every consumed dir goes
    assert res2["results"]["prune-drain"]["removed"] == [0, 1, 2]

    # serving over the final store: tombstoned ids gone, a b3 vector
    # findable
    cur3 = resolve_ann_current(dep)
    rows = ann_topk(
        spark, cur3["store_path"], cur3["model_path"],
        [(9_999, vec(300))], k=3,
        rerank_with=as_emb(base_ids + b1 + b2 + b3),
        expected_sha256=cur3["model_sha256"],
    ).collect()
    served = {int(r["neighbor_id"]) for r in rows}
    assert 300 in served
    assert not served & set(victims)


def test_ann_maintain_cli_apply(
    spark, setup, tmp_path, _preserve_root_logging, capsys
):
    """The shell --apply path end to end on a bare store: merge folds
    the backlog, the round's JSON lands on stdout, and a second
    invocation converges to an empty plan."""
    from inpe_queimadas_etl_spark.cli import main as cli_main

    base_split, delta_split = setup["splits"]
    store = str(tmp_path / "store")
    build_ann_store(base_split, setup["model"], store)
    drain = _drain(setup, tmp_path, [(0, delta_split)])

    rc = cli_main(
        [
            "ann-maintain", "--store", store, "--drain", drain,
            "--model", setup["model_path"], "--apply",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied"] == ["merge"]
    assert out["results"]["merge"]["merged_batches"] == [0]
    _stamp, sizes = read_ann_store_stamp(store)
    assert sum(sizes.values()) == setup["emb"].count()

    rc2 = cli_main(
        [
            "ann-maintain", "--store", store, "--drain", drain,
            "--model", setup["model_path"], "--apply",
        ]
    )
    assert rc2 == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["applied"] == [] and out2["plan"]["actions"] == []


def test_plan_flags_mispaired_drain_up_front(tmp_path):
    """A drain stamped under a different encoding than the store is
    flagged at PLAN time: merge/prune-drain come back non-executable
    with the pairing named, and an --apply round reports them blocked
    instead of dying halfway on the merge refusal."""
    store = tmp_path / "store"
    drain = tmp_path / "drain"
    store.mkdir()
    write_ann_store_meta(
        str(store), "a" * 64, sizes={0: 10},
        encoding_sha256="b" * 64, merged_through=0,
    )
    for b in (0, 1):
        d = drain / f"batch_id={b}"
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
        (d / "part-0.parquet").touch()
    write_ann_store_meta(
        str(drain), "c" * 64, encoding_sha256="d" * 64
    )
    plan = ann_maintenance_plan(
        store_path=str(store), drain_dir=str(drain),
        drain_keep_batches=0,
    )
    assert plan["signals"]["drain_encoding_match"] is False
    acts = {a["action"]: a for a in plan["actions"]}
    assert acts["merge"]["executable"] is False
    assert acts["prune-drain"]["executable"] is False
    assert "DIFFERENT encoding" in acts["merge"]["reason"]

    out = run_ann_maintenance(
        lambda: (_ for _ in ()).throw(AssertionError("no spark")),
        store_path=str(store), drain_dir=str(drain), apply=True,
        drain_keep_batches=0,
    )
    assert out["applied"] == []
    assert set(out["blocked"]) == {"merge", "prune-drain"}


def test_prune_drain_multi_consumer_min_watermark(tmp_path):
    """A drain feeding several consumers prunes against the MINIMUM
    watermark: the slowest consumer's unfolded batches survive, and a
    mispairing with ANY consumer refuses the whole prune."""
    from inpe_queimadas_etl_spark.operators.pq import prune_ann_drain

    drain = tmp_path / "drain"
    fast = tmp_path / "fast"
    slow = tmp_path / "slow"
    for d in (drain, fast, slow):
        d.mkdir()
    write_ann_store_meta(str(drain), "a" * 64, encoding_sha256="b" * 64)
    write_ann_store_meta(
        str(fast), "a" * 64, sizes={0: 1},
        encoding_sha256="b" * 64, merged_through=3,
    )
    write_ann_store_meta(
        str(slow), "a" * 64, sizes={0: 1},
        encoding_sha256="b" * 64, merged_through=1,
    )
    for b in range(4):
        d = drain / f"batch_id={b}"
        d.mkdir()
        (d / "_SUCCESS").touch()
        (d / "part-0.parquet").touch()

    res = prune_ann_drain(
        str(drain), [str(fast), str(slow)], keep_batches=0
    )
    # min(3, 1) = 1: batches 2,3 survive for the slow consumer
    assert res["watermark"] == 1
    assert res["removed"] == [0, 1]
    assert res["kept"] == [2, 3]

    # a mispaired consumer anywhere in the list refuses everything
    bad = tmp_path / "bad"
    bad.mkdir()
    write_ann_store_meta(
        str(bad), "e" * 64, sizes={0: 1},
        encoding_sha256="f" * 64, merged_through=9,
    )
    with pytest.raises(ValueError, match="different encodings"):
        prune_ann_drain(str(drain), [str(fast), str(bad)])
    assert os.path.isdir(drain / "batch_id=2")

    with pytest.raises(ValueError, match="at least one"):
        prune_ann_drain(str(drain), [])


def test_gc_refuses_midmove_journal_allows_phase0(
    spark, setup, tmp_path
):
    """gc racing a merge: a journal WITH moves in flight refuses the
    GC outright (the store may be mid-publish); a phase-0 stub
    (merge only staging) lets the GC proceed — the new version
    carries the PRE-merge watermark, so the staged merge's batches
    re-fold against it later (nothing lost, the drain is the source
    of truth)."""
    base = _deployment(spark, setup, tmp_path)
    cur = resolve_ann_current(base)
    victims = [
        int(r["vec_id"]) for r in setup["splits"][0].limit(1).collect()
    ]
    delete_from_ann_store(cur["store_path"], victims)
    jp = os.path.join(cur["store_path"], ANN_MERGE_JOURNAL)

    with open(jp, "w") as f:
        json.dump(
            {"from": -1, "to": 0, "moves": [["a", "b"]]}, f
        )
    with pytest.raises(ValueError, match="pending merge journal"):
        gc_ann_version(spark, base)
    assert resolve_ann_current(base)["version"] == 1

    with open(jp, "w") as f:
        json.dump({"from": None, "to": None, "moves": []}, f)
    res = gc_ann_version(spark, base)
    assert res["version"] == 2
    # the stub journal stays on the OLD store (the staging merge's
    # arbiter); the new version starts clean
    assert os.path.exists(jp)
    assert not os.path.exists(
        os.path.join(
            resolve_ann_current(base)["store_path"], ANN_MERGE_JOURNAL
        )
    )


def test_compact_refuses_watermark_moved_in_listing_window(
    spark, setup, tmp_path, monkeypatch
):
    """gc x merge, the commit-in-the-window case (ADVICE r10): a
    merge that FULLY commits (moves done, meta replaced, journal
    unlinked) between compact_ann_store's entry stamp read and its
    parquet file listing would leave the listing CONTAINING the
    merged rows while the carried watermark predates them — the next
    merge would re-fold those batches into the compacted output,
    silently duplicating vec_ids. The compactor must re-read the
    stamp after the listing freezes and refuse (retryably) when the
    watermark moved."""
    import inpe_queimadas_etl_spark.operators.pq as pq

    base_split, _ = setup["splits"]
    model = setup["model"]
    store = str(tmp_path / "store")
    build_ann_store(base_split, model, store)
    _, sizes = read_ann_store_stamp(store)
    write_ann_store_meta(
        store, model["sha256"], sizes=sizes,
        encoding_sha256=model["encoding_sha256"], merged_through=3,
    )

    real = pq.read_ann_store

    def racy(spark_, path, model_):
        out = real(spark_, path, model_)
        # simulate the concurrent merge's single atomic commit
        # landing in the entry-read -> listing window
        st2, sz2 = read_ann_store_stamp(path)
        write_ann_store_meta(
            path, model_["sha256"], sizes=sz2,
            encoding_sha256=model_["encoding_sha256"],
            merged_through=99,
        )
        return out

    monkeypatch.setattr(pq, "read_ann_store", racy)
    from inpe_queimadas_etl_spark.operators.pq import compact_ann_store

    with pytest.raises(ValueError, match="watermark moved"):
        compact_ann_store(
            spark, store, str(tmp_path / "out"), model
        )
    # the refusal is retryable: with the watermark stable, the SAME
    # compaction succeeds and carries the (now-current) watermark
    monkeypatch.setattr(pq, "read_ann_store", real)
    out = str(tmp_path / "out2")
    compact_ann_store(spark, store, out, model)
    st, _ = read_ann_store_stamp(out)
    assert int(st["merged_through"]) == 99


def test_compact_refuses_phase1_journal_in_listing_window(
    spark, setup, tmp_path, monkeypatch
):
    """gc x merge, the mid-move case (ADVICE r11): a merge that goes
    phase-1 and runs its MOVES inside the entry-read -> listing
    window but commits meta only after compact's stamp re-read passes
    BOTH of r10's checks (journal was absent/phase-0 at
    read_ann_store's check; watermark unmoved at the re-read) while
    the frozen listing contains merged rows under the pre-merge
    watermark. A mid-move merge still HOLDS its journal when the
    listing freezes (unlink comes only after the meta replace), so
    the compactor must re-check the journal post-listing and refuse a
    phase-1 one — the retune walk's documented journal-before-stamp
    order. A phase-0 stub planted in the same window stays allowed
    (its moves have not run, so the frozen listing cannot contain
    them)."""
    import inpe_queimadas_etl_spark.operators.pq as pq

    base_split, _ = setup["splits"]
    model = setup["model"]
    store = str(tmp_path / "store")
    build_ann_store(base_split, model, store)
    _, sizes = read_ann_store_stamp(store)
    write_ann_store_meta(
        store, model["sha256"], sizes=sizes,
        encoding_sha256=model["encoding_sha256"], merged_through=3,
    )
    jp = os.path.join(store, ANN_MERGE_JOURNAL)

    real = pq.read_ann_store

    def racy_phase1(spark_, path, model_):
        out = real(spark_, path, model_)
        # the concurrent merge is mid-move: phase-1 journal written,
        # moves running, meta NOT yet replaced (watermark unmoved)
        with open(jp, "w") as f:
            json.dump({"from": 3, "to": 99, "moves": [["a", "b"]]}, f)
        return out

    monkeypatch.setattr(pq, "read_ann_store", racy_phase1)
    from inpe_queimadas_etl_spark.operators.pq import compact_ann_store

    with pytest.raises(ValueError, match="phase-1 merge journal"):
        compact_ann_store(spark, store, str(tmp_path / "out"), model)
    os.unlink(jp)

    def racy_phase0(spark_, path, model_):
        out = real(spark_, path, model_)
        with open(jp, "w") as f:
            json.dump({"from": None, "to": None, "moves": []}, f)
        return out

    monkeypatch.setattr(pq, "read_ann_store", racy_phase0)
    out = str(tmp_path / "out2")
    compact_ann_store(spark, store, out, model)
    st, _ = read_ann_store_stamp(out)
    assert int(st["merged_through"]) == 3


def test_plan_unstamped_drain_not_executable(spark, setup, tmp_path):
    """An UNSTAMPED drain must plan like a mispaired one (ADVICE
    r10): merge_ann_appends and prune_ann_drain both raise on it, so
    marking the merge executable would let an --apply round die
    halfway instead of being flagged at plan time."""
    base_split, _ = setup["splits"]
    store = str(tmp_path / "store")
    build_ann_store(base_split, setup["model"], store)
    drain = tmp_path / "drain_unstamped"
    for b in (0, 1):
        d = drain / f"batch_id={b}"
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
        (d / "part-0.parquet").touch()

    plan = ann_maintenance_plan(
        store_path=store, drain_dir=str(drain)
    )
    assert plan["signals"]["drain_encoding_match"] is False
    assert plan["signals"]["backlog_batches"] == 2
    merge = next(
        a for a in plan["actions"] if a["action"] == "merge"
    )
    assert merge["executable"] is False
    assert "no model stamp" in merge["reason"]

    # an applied round reports it blocked instead of dying mid-round
    def no_spark():  # the blocked merge must never reach Spark
        raise AssertionError("blocked action must not start Spark")

    out = run_ann_maintenance(
        no_spark, store_path=store, drain_dir=str(drain),
        model_path=setup["model_path"], apply=True,
    )
    assert "merge" in out["blocked"]
    assert out["applied"] == []
    assert out["results"]["merge"].startswith("not executable")


def test_recovery_runs_even_when_merge_is_blocked(
    spark, setup, tmp_path
):
    """recover=True with a journal AND a non-executable merge (drain
    mismatch): the round used to delegate recovery to the merge call
    and then never run the merge — the journal stayed pending and
    'recover-merge' appeared nowhere (ADVICE r10). Recovery must run
    directly (Spark-free) whenever the merge cannot carry it."""
    base = _deployment(spark, setup, tmp_path)
    cur = resolve_ann_current(base)
    jp = os.path.join(cur["store_path"], ANN_MERGE_JOURNAL)
    with open(jp, "w") as f:
        json.dump({"from": None, "to": None, "moves": []}, f)

    # a drain with committed backlog but a FOREIGN encoding stamp
    drain = tmp_path / "drain_foreign"
    d = drain / "batch_id=0"
    d.mkdir(parents=True)
    (d / "_SUCCESS").touch()
    (d / "part-0.parquet").touch()
    write_ann_store_meta(
        str(drain), "e" * 64, encoding_sha256="f" * 64
    )

    plan = ann_maintenance_plan(base_dir=base, drain_dir=str(drain))
    names = [a["action"] for a in plan["actions"]]
    assert "recover-merge" in names and "merge" in names
    assert not next(
        a for a in plan["actions"] if a["action"] == "merge"
    )["executable"]

    def no_spark():  # recovery is file-metadata only
        raise AssertionError("recovery must stay Spark-free")

    out = run_ann_maintenance(
        no_spark, base_dir=base, drain_dir=str(drain),
        apply=True, recover=True,
    )
    assert "recover-merge" in out["applied"]
    assert out["results"]["recover-merge"] == "rolled_back"
    assert not os.path.exists(jp)
    assert "merge" in out["blocked"]


def test_pipeline_post_run_ann_maintenance_hook(
    spark, setup, tmp_path
):
    """VERDICT r10 #6 end-to-end: the orchestration's opt-in ANN rung.
    A drain holds appends -> a daily `run_range` with
    ann_maintenance config -> the run's metrics carry the plan (which
    names the merge), apply folds it, and serving sees the new rows —
    without a separate ann-maintain invocation. Plan-only runs attach
    the plan and move nothing."""
    import datetime as dtm

    from inpe_queimadas_etl_spark.pipeline import Warehouse, run_range
    from inpe_queimadas_etl_spark.schemas import UF_AREA
    from inpe_queimadas_etl_spark.sources.csv_ingest import (
        write_fixture_csv,
    )

    from . import fixtures_geo as G

    base = _deployment(spark, setup, tmp_path)
    drain = _drain(setup, tmp_path, [(0, setup["splits"][1])])
    n_total = setup["emb"].count()

    dims = {
        "municipios": G.municipios(),
        "biomas": G.biomas(),
        "ucs": G.ucs(),
        "tis": G.tis(),
        "uf_area": spark.createDataFrame(G.uf_area_rows(), UF_AREA),
    }
    csv_path = str(tmp_path / "focos.csv")
    write_fixture_csv(csv_path, G.FOCOS_HEADER, G.FOCOS_ROWS, sep=";")
    wh = Warehouse(str(tmp_path / "wh"))
    file_date = dtm.date(2024, 5, 2)

    # plan-only: the plan rides the metrics, nothing moves
    [r0] = run_range(
        spark, wh, [(file_date, csv_path)], dims, write_report=False,
        ann_maintenance={"base_dir": base, "drain_dir": drain},
    )
    plan_actions = [
        a["action"] for a in r0["ann_maintenance"]["plan"]["actions"]
    ]
    assert "merge" in plan_actions
    assert r0["ann_maintenance"]["applied"] == []
    st0, _ = read_ann_store_stamp(
        resolve_ann_current(base)["store_path"]
    )
    assert "merged_through" not in st0  # nothing folded yet

    # applied: the SAME daily run folds the backlog
    [r1] = run_range(
        spark, wh, [(file_date, csv_path)], dims, write_report=False,
        ann_maintenance={
            "base_dir": base, "drain_dir": drain, "apply": True,
        },
    )
    assert "merge" in r1["ann_maintenance"]["applied"]
    cur = resolve_ann_current(base)
    st1, sizes1 = read_ann_store_stamp(cur["store_path"])
    assert st1["merged_through"] == 0
    assert sum(sizes1.values()) == n_total
    # serving sees a drain row: its own vector is its top neighbor
    delta_row = setup["splits"][1].limit(1).collect()[0]
    got = ann_topk(
        spark, cur["store_path"], cur["model_path"],
        [(-1, list(delta_row["v"]))], k=1,
        rerank_with=setup["emb"],
    ).collect()
    assert int(got[0]["neighbor_id"]) == int(delta_row["vec_id"])


def test_multi_day_lifecycle_soak(spark, setup, tmp_path):
    """The property-test version of the module docstring's race
    analysis (VERDICT r10 #8): N simulated days of drain appends +
    takedowns + a nightly `run_ann_maintenance` (merge -> gc ->
    prune-drain -> prune-versions all exercised), asserting after
    EVERY night the invariants the lifecycle claims:

    - no vec_id is ever served twice (merge/gc/compaction chains
      never duplicate);
    - the merge watermark is monotone non-decreasing;
    - a retired id never reappears in served results on any later
      day (tombstone -> GC physical drop -> applied-history chain);
    - served ids == (base + every folded slice) - retired, exactly;
    - version history stays within the retention bound."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.operators.pq import pq_ivf_encode

    model = setup["model"]
    emb = setup["emb"]
    n_total = emb.count()
    base_cut = int(n_total * 0.5)
    days = 4
    slice_n = (n_total - base_cut) // days

    # deployment v1 from the base half
    import shutil

    base_dir = str(tmp_path / "soak")
    os.makedirs(os.path.join(base_dir, "versions", "v1"))
    shutil.copyfile(
        setup["model_path"],
        os.path.join(base_dir, "versions", "v1", "model.json"),
    )
    build_ann_store(
        emb.filter(F.col("vec_id") < base_cut), model,
        os.path.join(base_dir, "versions", "v1", "store"),
    )
    with open(os.path.join(base_dir, "CURRENT"), "w") as f:
        json.dump(
            {
                "version": 1,
                "model": "versions/v1/model.json",
                "store": "versions/v1/store",
                "model_sha256": model["sha256"],
            },
            f,
        )

    drain = str(tmp_path / "soak_drain")
    write_ann_store_meta(
        drain, model["sha256"],
        encoding_sha256=model["encoding_sha256"],
    )

    def served_ids():
        cur = resolve_ann_current(base_dir)
        rows = [
            int(r["vec_id"])
            for r in spark.read.parquet(cur["store_path"])
            .select("vec_id")
            .collect()
        ]
        tombs = set(read_ann_tombstones(cur["store_path"]))
        live = [v for v in rows if v not in tombs]
        return rows, live

    def spark_factory():
        return spark

    folded = set(range(base_cut))
    retired: set = set()
    last_watermark = -1
    for day in range(days):
        lo = base_cut + day * slice_n
        hi = n_total if day == days - 1 else lo + slice_n
        sl = emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        pq_ivf_encode(
            sl, model["cents3"], model["cb"], rot=model.get("rot")
        ).write.parquet(f"{drain}/batch_id={day}")
        # two takedowns per day against already-served ids (and one
        # against a never-stored id on day 2 — a NOT-IN of an absent
        # id must stay harmless)
        victims = sorted(folded - retired)[day * 7:day * 7 + 2]
        if day == 2:
            victims = [*victims, 999_983]
        cur = resolve_ann_current(base_dir)
        delete_from_ann_store(cur["store_path"], victims)
        retired |= set(victims)

        # day 1 simulates a merge that crashed before any move ran
        # (phase-0 journal left on the store): the nightly round with
        # recover granted must classify + resolve it AND still fold
        # the day's backlog in the same round
        crashed = day == 1
        if crashed:
            with open(
                os.path.join(cur["store_path"], ANN_MERGE_JOURNAL), "w"
            ) as f:
                json.dump({"from": None, "to": None, "moves": []}, f)

        out = run_ann_maintenance(
            spark_factory,
            base_dir=base_dir,
            drain_dir=drain,
            apply=True,
            recover=crashed,
            tomb_gc_frac=0.004,  # ~2 deletes/500 rows trips the GC
            keep_versions=2,
            drain_keep_batches=1,
        )
        assert out["blocked"] == [], out
        assert "merge" in out["applied"], (day, out)
        if crashed:
            assert "recover-merge" in out["applied"], out
            assert out["results"]["merge"]["recovered"] == "rolled_back"
        folded |= set(range(lo, hi))

        # --- invariants, every night ---
        cur = resolve_ann_current(base_dir)
        stamp, sizes = read_ann_store_stamp(cur["store_path"])
        wm = int(stamp["merged_through"])
        assert wm >= last_watermark, "watermark went backwards"
        assert wm == day  # the night folds everything appended
        last_watermark = wm
        rows, live = served_ids()
        assert len(rows) == len(set(rows)), (
            f"day {day}: duplicated vec_ids served"
        )
        assert set(live) == folded - retired, f"day {day}"
        assert not (set(live) & retired), (
            f"day {day}: retired ids reappeared"
        )
        assert sum(sizes.values()) == len(rows)
        # version history bounded: kept <= keep_versions + CURRENT
        vdir = os.path.join(base_dir, "versions")
        n_versions = len(
            [e for e in os.listdir(vdir) if e.startswith("v")]
        )
        assert n_versions <= 3, f"day {day}: retention leak"

    # the GC path really ran at least once (tombstones were dropped
    # physically into a new version)
    assert resolve_ann_current(base_dir)["version"] > 1
    # drain retention really pruned consumed batches
    present = [
        e
        for e in os.listdir(drain)
        if e.startswith("batch_id=")
    ]
    assert len(present) <= 2  # keep window, not the full history


def test_concurrent_maintenance_rounds_are_safe(
    spark, setup, tmp_path
):
    """The module docstring's two-crons-racing claim, exercised for
    real: two `run_ann_maintenance(apply=True)` rounds start on a
    barrier against ONE deployment with backlog + tombstones. Any
    interleaving must end with: failures drawn ONLY from the
    documented loud-refusal set (journal arbiter, version-rename
    arbiter, watermark-moved retry, tombstone lock), and after one
    convergence round the served state exactly right — every batch
    folded once, retired ids gone, no duplicates, consistent stamp."""
    import threading

    from pyspark.sql import functions as F

    base = _deployment(spark, setup, tmp_path)
    half = setup["splits"][1]
    mid = [int(r["vec_id"]) for r in half.select("vec_id").collect()]
    cut = sorted(mid)[len(mid) // 2]
    drain = _drain(
        setup, tmp_path,
        [(0, half.filter(F.col("vec_id") < cut)),
         (1, half.filter(F.col("vec_id") >= cut))],
    )
    victims = [
        int(r["vec_id"])
        for r in setup["splits"][0].limit(2).collect()
    ]
    delete_from_ann_store(
        resolve_ann_current(base)["store_path"], victims
    )

    barrier = threading.Barrier(2)
    results: dict = {}

    def worker(name):
        barrier.wait()
        try:
            results[name] = run_ann_maintenance(
                lambda: spark,
                base_dir=base,
                drain_dir=drain,
                apply=True,
                tomb_gc_frac=0.004,
                drain_keep_batches=2,
            )
        except Exception as exc:  # the documented refusals
            results[name] = exc

    ts = [threading.Thread(target=worker, args=(n,)) for n in "ab"]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert set(results) == {"a", "b"}

    allowed = (
        "pending merge journal",   # merge x merge O_EXCL arbiter
        "another rebuild published",  # gc x gc rename arbiter
        "watermark moved",         # gc x merge commit-window retry
        "lock",                    # tombstone lock contention
    )
    for name, v in results.items():
        if isinstance(v, Exception):
            assert any(s in str(v) for s in allowed), (name, v)

    # convergence: one quiet round (recover granted in case a loser
    # died holding the journal) finishes whatever the race left
    run_ann_maintenance(
        lambda: spark, base_dir=base, drain_dir=drain, apply=True,
        recover=True, tomb_gc_frac=0.004, drain_keep_batches=2,
    )

    cur = resolve_ann_current(base)
    stamp, sizes = read_ann_store_stamp(cur["store_path"])
    assert int(stamp["merged_through"]) == 1
    rows = [
        int(r["vec_id"])
        for r in spark.read.parquet(cur["store_path"])
        .select("vec_id")
        .collect()
    ]
    assert len(rows) == len(set(rows)), "race duplicated rows"
    tombs = set(read_ann_tombstones(cur["store_path"]))
    live = set(rows) - tombs
    n_total = setup["emb"].count()
    assert live == set(range(n_total)) - set(victims)
    assert sum(sizes.values()) == len(rows)


def test_maintenance_failure_does_not_unmark_the_day(
    spark, setup, tmp_path
):
    """The hook runs AFTER the resume-state write: a maintenance
    failure (here: a deployment dir with no published version) exits
    the run loudly but must NOT lose the day's completion marker —
    the warehouse already holds the data, and re-running would
    reprocess it just because a drain merge hiccuped."""
    import datetime as dtm

    from inpe_queimadas_etl_spark.pipeline import (
        Warehouse,
        read_resume_state,
        run_range,
    )
    from inpe_queimadas_etl_spark.schemas import UF_AREA
    from inpe_queimadas_etl_spark.sources.csv_ingest import (
        write_fixture_csv,
    )

    from . import fixtures_geo as G

    dims = {
        "municipios": G.municipios(),
        "biomas": G.biomas(),
        "ucs": G.ucs(),
        "tis": G.tis(),
        "uf_area": spark.createDataFrame(G.uf_area_rows(), UF_AREA),
    }
    csv_path = str(tmp_path / "focos.csv")
    write_fixture_csv(csv_path, G.FOCOS_HEADER, G.FOCOS_ROWS, sep=";")
    wh = Warehouse(str(tmp_path / "wh"))
    state = str(tmp_path / "state.json")
    file_date = dtm.date(2024, 5, 2)
    broken = str(tmp_path / "never_published")
    os.makedirs(broken)

    with pytest.raises(LookupError, match="no published ANN version"):
        run_range(
            spark, wh, [(file_date, csv_path)], dims,
            state_path=state, write_report=False,
            ann_maintenance={"base_dir": broken},
        )
    # the day IS marked done — the data plane committed before the
    # maintenance rung ran
    assert str(file_date) in read_resume_state(state)
    # and the warehouse holds the rows
    assert wh.read(spark, "curated_focos").count() > 0


def test_retune_ann_version_links_store_and_flips_pointer(
    spark, setup, tmp_path, capsys
):
    """Deployment-level retune (r11): new serving knobs publish as a
    NEW version whose store shares the old version's code file
    INODES (no bytes copied, no re-encode), CURRENT flips atomically,
    rollback stays, and the versions' tombstone sets are independent
    going forward. A pending merge journal refuses the retune."""
    from inpe_queimadas_etl_spark import cli
    from inpe_queimadas_etl_spark.operators.pq import (
        retune_ann_version,
    )

    base = _deployment(spark, setup, tmp_path)
    cur1 = resolve_ann_current(base)
    old_sha = cur1["model_sha256"]

    res = retune_ann_version(base, cand=400)
    assert res["version"] == 2 and res["from_version"] == 1
    assert res["cand"] == 400
    assert res["model_sha256"] != old_sha  # full sha re-pinned
    cur2 = resolve_ann_current(base)
    m2 = load_ann_model(
        cur2["model_path"], expected_sha256=cur2["model_sha256"]
    )
    assert m2["cand"] == 400
    assert m2["encoding_sha256"] == setup["model"]["encoding_sha256"]

    # code files are the SAME inodes; meta/tombstones are own bytes
    import glob

    old_files = sorted(
        glob.glob(os.path.join(cur1["store_path"], "centroid_id=*", "*"))
    )
    linked = 0
    for f in old_files:
        if os.path.basename(f).startswith(("_", ".")):
            continue
        twin = f.replace(cur1["store_path"], cur2["store_path"])
        assert os.path.exists(twin), twin
        assert os.path.samefile(f, twin)
        linked += 1
    assert linked > 0
    meta_old = os.path.join(cur1["store_path"], "_ann_model.json")
    meta_new = os.path.join(cur2["store_path"], "_ann_model.json")
    assert not os.path.samefile(meta_old, meta_new)
    # sizes stamp carried: serving budgets without a store scan
    _, sizes = read_ann_store_stamp(cur2["store_path"])
    assert sizes is not None and sum(sizes.values()) > 0

    # serving works under the retuned pair; rollback target intact
    assert _served_ids(spark, setup, base)
    assert os.path.isdir(os.path.join(base, "versions", "v1", "store"))

    # tombstone independence: a takedown against v2 must not leak
    # into v1's set (os.replace gives v2 its own inode)
    victim = [int(r["vec_id"]) for r in setup["splits"][0].limit(1).collect()]
    delete_from_ann_store(cur2["store_path"], victim)
    assert read_ann_tombstones(cur1["store_path"]) == []
    assert read_ann_tombstones(cur2["store_path"]) == victim

    # a pending merge journal refuses the retune outright
    jp = os.path.join(cur2["store_path"], ANN_MERGE_JOURNAL)
    with open(jp, "w") as f:
        json.dump({"from": None, "to": None, "moves": []}, f)
    with pytest.raises(ValueError, match="pending merge journal"):
        retune_ann_version(base, cand=500)
    os.unlink(jp)

    # CLI veneer: --base-dir mode
    capsys.readouterr()
    assert cli.main(
        ["ann-retune", "--base-dir", base, "--frac", "0.9"]
    ) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 3 and out["frac"] == 0.9
    # bare mode still validates its own required pair
    assert cli.main(["ann-retune", "--cand", "7"]) == 2


def test_retune_version_race_and_prune_survival(
    spark, setup, tmp_path, monkeypatch
):
    """Two edges of the hard-link retune: (1) a merge committing in
    the entry-check -> link-walk window is detected by the stamp
    re-read and refused retryably with the staging cleaned up (the
    compact_ann_store commit-window stance); (2) pruning the LINK
    SOURCE version afterwards must not break the retuned version's
    store — the inodes survive until the last name drops."""
    import inpe_queimadas_etl_spark.operators.pq as pq
    from inpe_queimadas_etl_spark.operators.pq import (
        prune_ann_versions,
        retune_ann_version,
    )

    base = _deployment(spark, setup, tmp_path)
    cur1 = resolve_ann_current(base)
    _, sizes = read_ann_store_stamp(cur1["store_path"])

    real = pq.retune_ann_model

    def racy(path, out, frac=None, cand=None, **kw):
        art = real(path, out, frac=frac, cand=cand, **kw)
        # a concurrent merge's single atomic commit lands while the
        # retune is between its entry stamp read and the link walk
        write_ann_store_meta(
            cur1["store_path"], setup["model"]["sha256"], sizes=sizes,
            encoding_sha256=setup["model"]["encoding_sha256"],
            merged_through=7,
        )
        return art

    monkeypatch.setattr(pq, "retune_ann_model", racy)
    with pytest.raises(ValueError, match="retry the retune"):
        retune_ann_version(base, cand=400)
    monkeypatch.setattr(pq, "retune_ann_model", real)
    # pointer untouched, no staging residue
    assert resolve_ann_current(base)["version"] == 1
    vdir = os.path.join(base, "versions")
    assert [e for e in os.listdir(vdir) if e.startswith(".")] == []

    # the retry (stable watermark now) succeeds and carries it
    res = retune_ann_version(base, cand=400)
    assert res["version"] == 2
    st2, _ = read_ann_store_stamp(
        resolve_ann_current(base)["store_path"]
    )
    assert int(st2["merged_through"]) == 7

    # prune the link source: v1's names drop, v2's inodes survive
    out = prune_ann_versions(base, keep=1)
    assert 1 in out["removed"]
    assert not os.path.isdir(os.path.join(vdir, "v1"))
    assert _served_ids(spark, setup, base)  # reads real bytes


def test_retune_refuses_drifted_source_artifact(
    spark, setup, tmp_path
):
    """A deployment retune pins the SOURCE model to CURRENT's sha: a
    hand-mangled artifact must refuse, never be republished as a
    legitimate-looking new version (sha laundering)."""
    from inpe_queimadas_etl_spark.operators.pq import (
        retune_ann_version,
    )

    base = _deployment(spark, setup, tmp_path)
    cur = resolve_ann_current(base)
    with open(cur["model_path"], "r+") as f:
        raw = f.read()
        f.seek(0)
        f.write(raw.replace('"frac"', '"frac" ', 1))  # sha-only drift
    with pytest.raises(ValueError, match="does not match"):
        retune_ann_version(base, cand=400)
    assert resolve_ann_current(base)["version"] == 1
    # ADVICE r11: a refused retune must clean up its .staging-* dir —
    # it used to leak silently (only the watermark-race branch
    # removed it). Same for an invalid-knob refusal.
    vdir = os.path.join(base, "versions")
    assert [e for e in os.listdir(vdir) if e.startswith(".")] == []
    with open(cur["model_path"], "w") as f:
        f.write(raw)  # restore the unmangled artifact
    with pytest.raises(ValueError):
        retune_ann_version(base, cand=0)
    assert [e for e in os.listdir(vdir) if e.startswith(".")] == []


def test_run_cli_refuses_orphaned_ann_flags(tmp_path, capsys):
    """`run --ann-drain-dir` (or apply/keep flags) without
    --ann-base-dir must refuse loudly — a silently-ignored
    maintenance flag is how a drain quietly grows forever."""
    from inpe_queimadas_etl_spark import cli

    rc = cli.main(
        [
            "run", "--date", "2024-05-02",
            "--landing-dir", str(tmp_path),
            "--warehouse", str(tmp_path / "wh"),
            "--dims-dir", str(tmp_path),
            "--ann-drain-dir", str(tmp_path / "drain"),
        ]
    )
    assert rc == 2


def test_gc_skips_when_a_racer_already_collected(
    spark, setup, tmp_path, monkeypatch
):
    """gc x gc where the loser arrives LATE: the plan names a gc but
    a concurrent round's gc publishes first, so by apply time the
    tombstones are gone. The round must converge (record the skip,
    keep running) instead of dying mid-apply after earlier actions
    ran. Simulated by making the PLANNER see tombstones the store no
    longer has — exactly the racer-cleared state."""
    import inpe_queimadas_etl_spark.operators.annmaint as am

    base = _deployment(spark, setup, tmp_path)

    real = am.read_ann_tombstones
    calls = []

    def stale(store_path):
        calls.append(1)
        out = real(store_path)
        if len(calls) == 1 and not out:
            return [1, 2, 3]  # the PLANNER sees the pre-race set...
        return out  # ...gc_ann_version sees the racer-cleared truth

    monkeypatch.setattr(am, "read_ann_tombstones", stale)
    res = run_ann_maintenance(
        lambda: spark, base_dir=base, apply=True, tomb_gc_frac=0.001
    )
    assert "gc" in [a["action"] for a in res["plan"]["actions"]]
    assert res["results"]["gc"].startswith("skipped")
    assert "gc" not in res["applied"]
    assert res["blocked"] == []
    # nothing published: the racer's (here: preexisting) version holds
    assert resolve_ann_current(base)["version"] == 1


def test_gc_convergence_catches_type_not_prose(
    spark, setup, tmp_path, monkeypatch
):
    """ADVICE r11: the late-loser convergence must catch
    gc_ann_version's dedicated AnnGcNothingToCollect TYPE, not match
    message prose — an unrelated ValueError that happens to contain
    the phrase must surface as a real failure, never be swallowed as
    'skipped'."""
    import inpe_queimadas_etl_spark.operators.annmaint as am
    from inpe_queimadas_etl_spark.operators.annmaint import (
        AnnGcNothingToCollect,
        gc_ann_version,
    )

    base = _deployment(spark, setup, tmp_path)
    # the refusal itself is the dedicated type (still a ValueError)
    with pytest.raises(AnnGcNothingToCollect, match="no live tombstones"):
        gc_ann_version(spark, base)

    def impostor(_spark, _base):
        raise ValueError(
            "disk full while copying (store has no live tombstones)"
        )

    monkeypatch.setattr(am, "gc_ann_version", impostor)
    monkeypatch.setattr(
        am, "read_ann_tombstones", lambda p: [1, 2, 3]
    )
    with pytest.raises(ValueError, match="disk full"):
        run_ann_maintenance(
            lambda: spark, base_dir=base, apply=True,
            tomb_gc_frac=0.001,
        )
