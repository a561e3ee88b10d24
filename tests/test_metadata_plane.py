"""The ANN lifecycle's METADATA-PLANE contract (VERDICT r10 #1):
every crash-safety and concurrency guarantee in the lifecycle tier
rests on POSIX primitives (atomic os.replace, O_EXCL single-writer
arbiters) that object stores do not provide — and the os.path-based
metadata READERS would silently see every stamp/tombstone/journal as
absent on a URI path (an empty-reading tombstone set serves retired
ids). So every lifecycle entry point refuses URI-schemed paths
loudly, through the one shared `require_local_metadata_path` check,
instead of degrading to best-effort. Spark-free: the refusals fire
before any data is touched."""

from __future__ import annotations

import pytest

from inpe_queimadas_etl_spark.operators.annmaint import (
    ann_maintenance_plan,
)
from inpe_queimadas_etl_spark.operators.pq import (
    compact_ann_store,
    delete_from_ann_store,
    load_ann_model,
    merge_ann_appends,
    publish_ann_version,
    read_ann_applied_tombstones,
    read_ann_store_stamp,
    read_ann_tombstones,
    rebuild_ann,
    require_local_metadata_path,
    resolve_ann_current,
    save_ann_model,
    write_ann_applied_tombstones,
    write_ann_store_meta,
)

S3 = "s3://bucket/ann/store"


def test_the_check_itself():
    # local shapes pass through unchanged (incl. Windows drive
    # letters, whose 1-char "scheme" must never false-positive)
    for ok in ("/data/ann/store", "rel/dir", "C://odd-but-local",
               "C:\\ann\\store", "./x"):
        assert require_local_metadata_path(ok, "t") == ok
    # URI schemes refuse, naming the op, the path, and the contract
    for bad in ("s3://b/k", "hdfs://nn/path", "gs://b/k",
                "s3a://b/k", "abfss://c@a/k", "file://host/p"):
        with pytest.raises(ValueError, match="metadata plane"):
            require_local_metadata_path(bad, "some-op")
    with pytest.raises(ValueError, match="some-op"):
        require_local_metadata_path("s3://b/k", "some-op")


def test_every_lifecycle_entry_point_refuses_uri_paths(tmp_path):
    cases = [
        lambda: write_ann_store_meta(S3, "a" * 64),
        lambda: read_ann_store_stamp(S3),
        lambda: delete_from_ann_store(S3, [1]),
        lambda: read_ann_tombstones(S3),
        lambda: read_ann_applied_tombstones(S3),
        lambda: write_ann_applied_tombstones(S3, [1]),
        lambda: resolve_ann_current("s3://bucket/ann"),
        lambda: load_ann_model("s3://bucket/ann/model.json"),
        lambda: save_ann_model(
            "s3://bucket/ann/model.json",
            [(0, [1.0, 0.0])],
            [[[0.0, 0.0], [1.0, 1.0]]],
            0.5,
        ),
        # spark/model args are never reached — the guard fires first
        lambda: merge_ann_appends(None, S3, str(tmp_path), None),
        lambda: merge_ann_appends(None, str(tmp_path), S3, None),
        lambda: compact_ann_store(None, str(tmp_path), S3, None),
        lambda: rebuild_ann(None, "s3://bucket/ann"),
        lambda: publish_ann_version(
            "s3://bucket/ann", str(tmp_path), 1, "a" * 64
        ),
        # the planner inherits through its stamp/pointer readers, so
        # a cron pointed at s3 fails at PLAN time, not mid-apply
        lambda: ann_maintenance_plan(store_path=S3),
        lambda: ann_maintenance_plan(base_dir="s3://bucket/ann"),
    ]
    for i, call in enumerate(cases):
        with pytest.raises(ValueError, match="metadata plane"):
            call()
            pytest.fail(f"case {i} did not refuse")


def test_plan_flags_unstamped_or_drain_layout_store(tmp_path):
    """Plan-time honesty for the STORE side of a merge: a stampless
    dir and a store without the serving-layout size stamp both make
    merge_ann_appends raise, so the plan must mark the merge
    non-executable instead of letting an --apply die mid-round
    (the ADVICE r10 unstamped-drain rule, applied symmetrically)."""
    from inpe_queimadas_etl_spark.operators.pq import (
        write_ann_store_meta,
    )

    drain = tmp_path / "drain"
    for b in (0, 1):
        d = drain / f"batch_id={b}"
        d.mkdir(parents=True)
        (d / "_SUCCESS").touch()
        (d / "part-0.parquet").touch()
    write_ann_store_meta(
        str(drain), "a" * 64, encoding_sha256="b" * 64
    )

    # stampless store dir
    bare = tmp_path / "bare"
    bare.mkdir()
    plan = ann_maintenance_plan(
        store_path=str(bare), drain_dir=str(drain)
    )
    merge = next(a for a in plan["actions"] if a["action"] == "merge")
    assert merge["executable"] is False
    assert "no model stamp" in merge["reason"]

    # stamped but drain-layout (no cluster-size stamp)
    nosizes = tmp_path / "nosizes"
    write_ann_store_meta(
        str(nosizes), "a" * 64, encoding_sha256="b" * 64
    )
    plan2 = ann_maintenance_plan(
        store_path=str(nosizes), drain_dir=str(drain)
    )
    merge2 = next(
        a for a in plan2["actions"] if a["action"] == "merge"
    )
    assert merge2["executable"] is False
    assert "cluster-size" in merge2["reason"]
