"""Atomic ANN model refresh (VERDICT r9 #4): `rebuild_ann` publishes
a (model, store) PAIR under a versioned base dir with a CURRENT
pointer — two atomic renames, no window where a store and a manifest
point at different shas. Crash injection around both renames proves
the old pair keeps serving and the next rebuild recovers."""

from __future__ import annotations

import json
import os

import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.api import ann_topk
from inpe_queimadas_etl_spark.operators import pq
from inpe_queimadas_etl_spark.operators.pq import (
    rebuild_ann,
    resolve_ann_current,
)

SF0001 = "/root/testdata/sf0.001"


def _emb(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import _sim8_emb

    return _sim8_emb(spark, SF0001)


def _serve(spark, emb, base_dir, k=3):
    cur = resolve_ann_current(base_dir)
    q = [
        (r["vec_id"], list(r["v"]))
        for r in emb.filter(
            (F.col("vec_id") >= 8) & (F.col("vec_id") < 12)
        ).collect()
    ]
    return cur, ann_topk(
        spark,
        cur["store_path"],
        cur["model_path"],
        q,
        k=k,
        rerank_with=emb,
        expected_sha256=cur["model_sha256"],
    ).collect()


def test_rebuild_publishes_servable_versioned_pair(spark, tmp_path):
    emb = _emb(spark)
    base = str(tmp_path / "ann")
    with pytest.raises(LookupError, match="no published ANN version"):
        resolve_ann_current(base)
    res = rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=100)
    assert res["version"] == 1
    assert os.path.isdir(os.path.join(base, "versions", "v1", "store"))
    cur, rows = _serve(spark, emb, base)
    assert cur == res
    assert rows and all(r["rank"] >= 1 for r in rows)
    # determinism: the published model equals a direct train of the
    # same geometry on the same table (sha match), so a rebuild is
    # reproducible, not a lottery
    direct = pq.train_ann_model(emb, k=4, m=8, ks=16, frac=0.5, cand=100)
    assert cur["model_sha256"] == direct["sha256"]

    # a second rebuild publishes v2 and flips the pointer; v1 stays
    # on disk for rollback
    res2 = rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    assert res2["version"] == 2
    assert resolve_ann_current(base)["version"] == 2
    assert os.path.isdir(os.path.join(base, "versions", "v1", "store"))
    # rollback = pointing CURRENT back (operator action): old pair
    # still serves under its own sha
    with open(os.path.join(base, "CURRENT"), "w") as f:
        json.dump(
            {
                "version": 1,
                "model": "versions/v1/model.json",
                "store": "versions/v1/store",
                "model_sha256": cur["model_sha256"],
            },
            f,
        )
    cur_rb, rows_rb = _serve(spark, emb, base)
    assert cur_rb["version"] == 1
    assert [str(r) for r in rows_rb] == [str(r) for r in rows]


def test_http_serves_from_rebuild_base_dir(spark, tmp_path):
    """The publish -> serve loop (r10): an ApiContext given only a
    rebuild_ann base dir resolves CURRENT at first use, pins the
    pointer's sha, and serves /api/ann/topk — 404 before any version
    is published, 200 after, and the resolved state is frozen to the
    version it saw (a later rebuild serves through a NEW context)."""
    from inpe_queimadas_etl_spark.api import ApiContext, handle_request

    emb = _emb(spark)
    base = str(tmp_path / "ann")
    qv = [float(x) for x in emb.filter("vec_id = 8").first()["v"]]
    vec = ",".join(repr(x) for x in qv)

    # nothing published yet -> 404 (LookupError from the resolver)
    ctx0 = ApiContext(
        spark=spark, fact=None, all_ufs=None, ann_base_dir=base,
        ann_rerank=emb,
    )
    status, body = handle_request(
        ctx0, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status == 404 and "no published ANN version" in body["detail"]

    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=100)
    ctx1 = ApiContext(
        spark=spark, fact=None, all_ufs=None, ann_base_dir=base,
        ann_rerank=emb, ann_follow_s=None,  # explicit frozen mode
    )
    status, body = handle_request(
        ctx1, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status == 200, body
    assert [i["rank"] for i in body["items"]] == [1, 2, 3]
    # equal to serving the resolved pair explicitly, sha pinned
    cur = resolve_ann_current(base)
    want = [
        int(r["neighbor_id"])
        for r in ann_topk(
            spark, cur["store_path"], cur["model_path"], [(-1, qv)],
            k=3, rerank_with=emb,
            expected_sha256=cur["model_sha256"],
        ).orderBy("rank").collect()
    ]
    assert [i["neighbor_id"] for i in body["items"]] == want
    # ann_follow_s=None: a second rebuild does not change the RUNNING
    # context's frozen state; a fresh context picks up v2 (following
    # contexts are exercised in test_http_follows_lifecycle_changes)
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    status2, body2 = handle_request(
        ctx1, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status2 == 200
    assert [i["neighbor_id"] for i in body2["items"]] == want
    ctx2 = ApiContext(
        spark=spark, fact=None, all_ufs=None, ann_base_dir=base,
        ann_rerank=emb,
    )
    status3, _body3 = handle_request(
        ctx2, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status3 == 200
    assert resolve_ann_current(base)["version"] == 2


def test_coarse_sample_bounds_training_deterministically(
    spark, tmp_path
):
    """The retrain-cadence lever (SCALING.md r10): coarse_sample_n
    bounds the MLlib KMeans fit to the first-N vectors. A sample
    covering the whole table yields the EXACT full-corpus model (same
    sha); a smaller sample yields a deterministic, servable model
    (same sha across two trains)."""
    from inpe_queimadas_etl_spark.operators.pq import (
        build_ann_store,
        save_ann_model,
        train_ann_model,
    )

    emb = _emb(spark)
    n = emb.count()
    full = train_ann_model(emb, k=4, m=8, ks=16, frac=0.5, cand=100)
    covering = train_ann_model(
        emb, k=4, m=8, ks=16, frac=0.5, cand=100, coarse_sample_n=n
    )
    assert covering["sha256"] == full["sha256"]
    s1 = train_ann_model(
        emb, k=4, m=8, ks=16, frac=0.5, cand=100, coarse_sample_n=64
    )
    s2 = train_ann_model(
        emb, k=4, m=8, ks=16, frac=0.5, cand=100, coarse_sample_n=64
    )
    assert s1["sha256"] == s2["sha256"]
    # the sampled model is a first-class servable artifact
    mp = str(tmp_path / "sampled.json")
    save_ann_model(mp, s1["cents"], s1["cb"], s1["frac"], s1["cand"])
    sp = str(tmp_path / "sampled_store")
    build_ann_store(emb, s1, sp)
    rows = ann_topk(
        spark, sp, mp, [(8, [0.5] * 64)], k=3, rerank_with=emb
    ).collect()
    assert len(rows) == 3


def test_rebuild_crash_before_publish_keeps_old_pair(
    spark, tmp_path, monkeypatch
):
    """Injected crash DURING the store build: only a staging dir is
    left, CURRENT still names the old complete pair, and the next
    rebuild wipes the stale staging and succeeds at the same N."""
    emb = _emb(spark)
    base = str(tmp_path / "ann")
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=100)
    cur1, rows1 = _serve(spark, emb, base)

    def boom(*a, **kw):
        raise RuntimeError("injected crash mid-encode")

    monkeypatch.setattr(pq, "build_ann_store", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    monkeypatch.undo()
    import glob

    residue = glob.glob(os.path.join(base, "versions", ".staging-v2-*"))
    assert len(residue) == 1  # the crash residue (inert, uniquely named)
    assert not os.path.exists(os.path.join(base, "versions", "v2"))
    # old pair untouched and still serving identically
    cur_mid, rows_mid = _serve(spark, emb, base)
    assert cur_mid == cur1
    assert [str(r) for r in rows_mid] == [str(r) for r in rows1]
    # recovery: same N through a FRESH staging dir (a concurrent
    # rebuild's live staging can never be clobbered — review r10);
    # the crash residue stays inert for operator cleanup
    res = rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    assert res["version"] == 2
    assert os.path.isdir(residue[0])
    assert resolve_ann_current(base)["version"] == 2
    # the concurrency arbiter: a racer publishes v3 BETWEEN this
    # run's version scan and its rename (injected as a side effect of
    # the store build) — the loser's rename must fail loudly instead
    # of publishing a half-pair over the racer's
    real_build = pq.build_ann_store

    def racing_build(*a, **kw):
        os.makedirs(os.path.join(base, "versions", "v3", "store"))
        return real_build(*a, **kw)

    monkeypatch.setattr(pq, "build_ann_store", racing_build)
    with pytest.raises(RuntimeError, match="published v3 first"):
        rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    monkeypatch.undo()
    # CURRENT untouched by the loser
    assert resolve_ann_current(base)["version"] == 2


def test_rebuild_crash_between_renames_keeps_old_pointer(
    spark, tmp_path, monkeypatch
):
    """Injected crash AFTER the version-dir rename but BEFORE the
    CURRENT flip: a complete-but-unreferenced v2 exists, CURRENT
    still resolves to v1 (consistent pair), and the next rebuild
    takes v3."""
    emb = _emb(spark)
    base = str(tmp_path / "ann")
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=100)
    cur1, rows1 = _serve(spark, emb, base)

    real_replace = os.replace

    def boom(src, dst, *a, **kw):
        if os.path.basename(str(dst)) == "CURRENT":
            raise RuntimeError("injected crash before pointer flip")
        return real_replace(src, dst, *a, **kw)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError, match="pointer flip"):
        rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    monkeypatch.undo()
    # v2 is complete on disk but unreferenced; the pointer is intact
    assert os.path.isdir(os.path.join(base, "versions", "v2", "store"))
    cur_mid, rows_mid = _serve(spark, emb, base)
    assert cur_mid == cur1
    assert [str(r) for r in rows_mid] == [str(r) for r in rows1]
    # next rebuild skips the orphan and publishes v3
    res = rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=50)
    assert res["version"] == 3
    assert resolve_ann_current(base)["version"] == 3


def test_prune_ann_versions_retention(spark, tmp_path):
    """Retention: keep CURRENT + the N most recent versions; CURRENT
    survives even when it is the OLDEST (rolled-back pointer);
    staging residue clears only on request; the kept pair still
    serves."""
    from inpe_queimadas_etl_spark import cli
    from inpe_queimadas_etl_spark.operators.pq import (
        prune_ann_versions,
    )

    emb = _emb(spark)
    base = str(tmp_path / "ann")
    with pytest.raises(LookupError, match="no published ANN version"):
        prune_ann_versions(base)
    for frac in (0.5, 0.25, 0.75):  # three published versions
        rebuild_ann(emb, base, k=4, m=8, ks=16, frac=frac, cand=100)
    vdir = os.path.join(base, "versions")
    os.makedirs(os.path.join(vdir, ".staging-v9-deadbeef"))

    with pytest.raises(ValueError, match="keep must be"):
        prune_ann_versions(base, keep=0)
    res = prune_ann_versions(base, keep=1)
    assert res == {"kept": [3], "removed": [1, 2], "staging_removed": 0}
    assert sorted(os.listdir(vdir)) == [".staging-v9-deadbeef", "v3"]
    _cur, rows = _serve(spark, emb, base)
    assert rows  # the kept pair serves

    # rebuild after prune continues the numbering past the max ever
    res4 = rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=100)
    assert res4["version"] == 4
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.25, cand=100)

    # CURRENT rolled back to the oldest kept version: prune keeps it
    # ALONGSIDE the most recent, never deletes the pointer's target.
    # (The operator rollback flow — pointing CURRENT at an older
    # published pair; its sha is the pair's own artifact sha.)
    from inpe_queimadas_etl_spark.operators.pq import load_ann_model

    cur_path = os.path.join(base, pq.ANN_CURRENT)
    with open(cur_path) as f:
        p = json.load(f)
    p.update(
        {
            "version": 3,
            "model": os.path.join("versions", "v3", "model.json"),
            "store": os.path.join("versions", "v3", "store"),
            "model_sha256": load_ann_model(
                os.path.join(vdir, "v3", "model.json")
            )["sha256"],
        }
    )
    with open(cur_path, "w") as f:
        json.dump(p, f)
    res = prune_ann_versions(base, keep=1, prune_staging=True)
    assert res["kept"] == [3, 5] and res["removed"] == [4]
    assert res["staging_removed"] == 1
    assert sorted(os.listdir(vdir)) == ["v3", "v5"]

    # the CLI veneer
    rc = cli.main(["ann-prune", "--base-dir", base, "--keep", "2"])
    assert rc == 0


def test_http_follows_lifecycle_changes(spark, tmp_path):
    """A long-lived server with ann_follow_s set follows the
    lifecycle WITHOUT a restart: a takedown stops being served at the
    next follow check, a gc/rebuild pointer flip swaps the whole
    state under the new version's sha, and the response cache never
    masks either (the state identity is part of the cache key)."""
    from inpe_queimadas_etl_spark.api import ApiContext, handle_request
    from inpe_queimadas_etl_spark.operators.annmaint import (
        gc_ann_version,
    )
    from inpe_queimadas_etl_spark.operators.pq import (
        delete_from_ann_store,
    )

    emb = _emb(spark)
    base = str(tmp_path / "ann")
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=1.0, cand=100)
    qv = [float(x) for x in emb.filter("vec_id = 8").first()["v"]]
    vec = ",".join(repr(x) for x in qv)

    ctx = ApiContext(
        spark=spark, fact=None, all_ufs=None, ann_base_dir=base,
        ann_rerank=emb, ann_follow_s=0.0,  # re-check every request
    )
    status, body = handle_request(
        ctx, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status == 200
    top = body["items"][0]["neighbor_id"]
    assert top == 8  # self-vector

    # takedown lands while the server is up: the very next request
    # (follow interval 0) must not serve it — response cache included
    delete_from_ann_store(
        resolve_ann_current(base)["store_path"], [top]
    )
    status, body2 = handle_request(
        ctx, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status == 200
    assert top not in [i["neighbor_id"] for i in body2["items"]]

    # gc flips the pointer to v2: the running context swaps states
    # (same sha — the model is byte-identical) and keeps serving the
    # takedown-free view
    res = gc_ann_version(spark, base)
    assert res["version"] == 2
    status, body3 = handle_request(
        ctx, "/api/ann/topk", {"vec": vec, "k": "3"}
    )
    assert status == 200
    assert [i["neighbor_id"] for i in body3["items"]] == [
        i["neighbor_id"] for i in body2["items"]
    ]
    assert ctx._ann_state["version"] == 2

    # a frozen context (follow None) re-reads nothing: its state is
    # pinned to the version it first resolved
    ctx_frozen = ApiContext(
        spark=spark, fact=None, all_ufs=None, ann_base_dir=base,
        ann_rerank=emb, ann_follow_s=None,
    )
    handle_request(ctx_frozen, "/api/ann/topk", {"vec": vec, "k": "3"})
    v_before = ctx_frozen._ann_state["version"]
    rebuild_ann(emb, base, k=4, m=8, ks=16, frac=0.5, cand=50)
    handle_request(ctx_frozen, "/api/ann/topk", {"vec": vec, "k": "3"})
    assert ctx_frozen._ann_state["version"] == v_before
