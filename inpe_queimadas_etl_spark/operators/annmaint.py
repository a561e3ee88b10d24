"""ANN store lifecycle maintenance: one planner that inspects a
deployment's on-disk state and names the right next action, plus the
jobs it schedules.

The reference runs its pipeline the same way — a state-inspecting
orchestrator that decides which stage to run from what's on disk
(``src/etl/app.py`` — stage skip/run decisions off state files;
``src/etl/backfill.py`` — gap-driven catch-up planning) — re-expressed
here for the ANN tier's moving parts: a streaming drain accumulating
appends, a tombstone set accumulating takedowns, a version history
accumulating rollback targets, and a crash journal that may need
recovery. Planning is file-metadata only (no Spark session, no data
read) so a cron can run it every minute; execution touches data only
for the actions the plan names.

Action order is load-bearing: recover before anything (a journal is
the single-writer arbiter), merge before GC (fold the backlog first so
the GC'd store's carried watermark covers it — `compact_ann_store`
preserves ``merged_through`` through store→store compaction), drain
retention after both (only batches the COMMITTED watermark covers are
ever deleted), version retention last (GC publishes a new version,
which may push history past the retention bound).

Two maintenance crons racing is SAFE without a global lock, action by
action: merge×merge — the O_EXCL journal arbiter (the loser refuses);
gc×gc / gc×rebuild — the version-dir rename arbiter (the loser's
rename fails loudly, its staging is inert residue); gc×merge — the
compactor re-reads the source store's stamp AFTER its parquet file
listing froze and refuses (retryable) if the merge watermark moved
in the window (a mid-move journal is refused outright by
`read_ann_store`), so a published GC version either carries the
PRE-merge watermark over a listing that provably excludes the
merged rows — the next merge against it re-folds exactly the
batches the snapshot missed from the drain, which remains the
source of truth — or was built from a fully post-commit snapshot;
the merge's own publish lands in the OLD version dir, where its
meta commit keeps that rollback target self-consistent;
retention×merge —
disjoint id ranges by construction (retention touches only ids at or
below the committed watermark, a merge reads only above it);
prune-versions×anything — CURRENT's target is never deleted and a
re-prune of an already-pruned version converges silently (the
arbiter's delete_prefix is idempotent, r12 — previously the later
run errored).
Retention racing a full `compact_ann_store` of the SAME drain is the
one loud combination: the compactor's read can lose a batch dir
mid-scan and fail the Spark job — rerun it; nothing is corrupted
(retention only removes batches the serving store already folded)."""

from __future__ import annotations

from typing import TYPE_CHECKING

from .pq import (
    ANN_MERGE_JOURNAL,
    _consumable_drain_batches,
    compact_ann_store,
    load_ann_model,
    merge_ann_appends,
    merge_refusal,
    pairing_refusal,
    prune_ann_drain,
    prune_ann_versions,
    publish_ann_version,
    read_ann_store_stamp,
    read_ann_tombstones,
    resolve_ann_current,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


class AnnGcNothingToCollect(ValueError):
    """gc_ann_version's no-live-tombstones refusal, as a TYPE: the
    apply loop's gc x gc late-loser convergence catches this class
    instead of matching the message prose (ADVICE r11 — a wording
    tweak must not turn the benign skip back into a mid-apply crash,
    and an unrelated ValueError containing the phrase must not be
    swallowed as 'skipped'). Subclasses ValueError so callers that
    treat it as a plain refusal keep working."""


def gc_ann_version(
    spark: "SparkSession", base_dir: str, force: bool = False
) -> dict:
    """Tombstone GC for a `rebuild_ann` deployment WITHOUT a retrain:
    compact the CURRENT pair's store (physically dropping its live
    tombstones) into a staging version dir under the SAME model
    artifact (byte-copied — same sha, so every serving pin keeps
    holding), then publish it as the next version with the shared
    atomic pair-rename + pointer flip. Serving against the old
    version keeps working throughout (immutable dirs); the pointer
    flip is the only switch, and rollback is pointing CURRENT back.

    Cost at scale: ONE codes-only shuffle (12-16 B/vector — ~3 TB per
    100 TB corpus), no retrain, no re-encode — the cheap end of the
    lifecycle ladder (merge < gc < rebuild). The carried
    ``merged_through`` watermark and applied-tombstone history mean
    merges against the same drain keep composing after the GC.

    Refuses when the store has no live tombstones (a GC would be a
    full rewrite that drops nothing) unless ``force=True`` — forcing
    is how an operator defragments a merge-heavy store's small files
    into compaction-sized ones.

    POSIX-only (r12b): the version swap is a staging rename. Checked
    FIRST — before any local dir is created from the path string —
    so a conditional-put deployment gets the rebuild-loop remedy
    refusal (`require_rename_capable`), never junk directories."""
    import os
    import shutil
    import uuid

    from .pq import require_rename_capable

    require_rename_capable(base_dir, "gc_ann_version")
    cur = resolve_ann_current(base_dir)
    model = load_ann_model(
        cur["model_path"], expected_sha256=cur["model_sha256"]
    )
    tombs = read_ann_tombstones(cur["store_path"])
    if not tombs and not force:
        raise AnnGcNothingToCollect(
            f"store {cur['store_path']!r} has no live tombstones — "
            "a GC would rewrite every row and drop none; pass "
            "force=True to defragment anyway"
        )
    versions = os.path.join(base_dir, "versions")
    n = cur["version"] + 1
    while os.path.isdir(os.path.join(versions, f"v{n}")):
        n += 1  # unreferenced crash leftovers occupy numbers
    staging = os.path.join(
        versions, f".staging-v{n}-{uuid.uuid4().hex[:8]}"
    )
    os.makedirs(staging)
    # byte-copy the artifact: same canonical JSON, same sha — the GC
    # changes the STORE's physical layout, never the model
    shutil.copyfile(
        cur["model_path"], os.path.join(staging, "model.json")
    )
    compact_ann_store(
        spark, cur["store_path"], os.path.join(staging, "store"), model
    )
    publish_ann_version(base_dir, staging, n, cur["model_sha256"])
    out = resolve_ann_current(base_dir)
    out["dropped_tombstones"] = len(tombs)
    out["from_version"] = cur["version"]
    return out


def ann_maintenance_plan(
    store_path: str | None = None,
    drain_dir: str | None = None,
    base_dir: str | None = None,
    tomb_gc_frac: float = 0.01,
    min_merge_batches: int = 1,
    keep_versions: int | None = None,
    drain_keep_batches: int = 2,
) -> dict:
    """Inspect an ANN deployment's on-disk state and return the
    ordered maintenance actions it needs — file metadata only (stamps,
    journals, tombstone sets, batch-dir listings), no Spark, no data
    read, so this is safe to run from a cron or a dashboard at any
    frequency.

    Pass ``base_dir`` for a `rebuild_ann` deployment (the CURRENT
    pointer names the store) or ``store_path`` for a bare store;
    ``drain_dir`` adds backlog inspection. Signals reported:

    - ``pending_merge``: a merge journal sits on the store (crashed or
      live merge) — everything else waits for its recovery.
    - ``backlog_batches``: committed drain batches past the store's
      watermark (what one `merge_ann_appends` would fold).
    - ``tomb_frac``: live tombstones / stamped rows — serve-time
      NOT-IN mass that only a GC compaction reclaims.
    - ``prunable_drain_batches``: consumed drain dirs at or below the
      watermark minus the ``drain_keep_batches`` replay window —
      disk the drain holds for no consumer.
    - ``versions`` / ``prunable_versions``: rollback history beyond
      the retention bound (``keep_versions``).

    Actions come back in EXECUTION order (recover → merge → gc →
    prune-drain → prune-versions); each carries ``executable`` —
    False when the fix needs an input this deployment shape lacks
    (e.g. GC of a bare store needs
    a deployment dir for the atomic version swap; the reason names
    the manual alternative)."""
    import os

    if (store_path is None) == (base_dir is None):
        raise ValueError(
            "pass exactly one of store_path (bare store) or base_dir "
            "(rebuild_ann deployment)"
        )
    from .metaplane import join as mjoin
    from .metaplane import resolve_metadata_arbiter

    version = None
    retune = None
    rename_capable = True
    if base_dir is not None:
        # object-store honesty (r12b): one arbiter resolve tells the
        # plan which rungs exist here — incremental actions (merge,
        # gc) are marked non-executable on a conditional-put
        # deployment with the rebuild remedy named, instead of
        # failing mid-apply (or worse, probing metadata with os.path
        # calls that silently read URI keys as absent)
        rename_capable = resolve_metadata_arbiter(
            base_dir, "ann_maintenance_plan"
        ).native_rename
        cur = resolve_ann_current(base_dir)
        store_path = cur["store_path"]
        version = cur["version"]
        # plan-time retune observability (VERDICT r12 #7): the ladder
        # the planner prices is merge < gc < rebuild, but the
        # cheapest rung — a serving-knob retune, O(files) hard-link
        # publish, no re-encode — was invisible at plan time. Surface
        # the CURRENT knobs and the price so an operator watching
        # recall knows the lever exists before reaching for a
        # rebuild. A knob read is one small JSON load (driver-side
        # artifact, K rows of floats) — still no Spark, no data read.
        import json as _json

        try:
            _raw = resolve_metadata_arbiter(
                cur["model_path"], "ann_maintenance_plan"
            ).read(cur["model_path"])
            if _raw is None:
                raise OSError(cur["model_path"])
            _art = _json.loads(_raw.decode("utf-8"))
            retune = {
                "frac": _art.get("frac"),
                "cand": _art.get("cand"),
                # the note must match THIS deployment's available
                # rungs (r12b): retune_ann_version is a hard-link
                # walk, POSIX-only — advertising it on a
                # conditional-put deployment would send the operator
                # into the require_rename_capable refusal
                "note": (
                    "retune_ann_version publishes new frac/cand "
                    "as a hard-linked version in O(files) (~30 ms "
                    "at 1M vectors vs a 77 s rebuild, scripts/"
                    "scaling_retune.py) — raising cand buys recall "
                    "at proportional rerank cost; see README "
                    "'Choosing cand'"
                    if rename_capable
                    else "serving knobs (frac/cand) are retunable "
                    "without a re-encode, but the hard-link retune "
                    "rung is POSIX-only — on this conditional-put "
                    "deployment publish new knobs via rebuild_ann, "
                    "or keep the metadata plane on a POSIX mount "
                    "for the O(files) path"
                ),
            }
        except (OSError, ValueError):
            retune = None  # missing/corrupt artifact: serving will
            # refuse on its own sha check; the plan stays readable

    signals: dict = {"store_path": store_path, "version": version}
    signals["retune_available"] = retune
    actions: list[dict] = []

    pending = resolve_metadata_arbiter(
        store_path, "ann_maintenance_plan"
    ).exists(mjoin(store_path, ANN_MERGE_JOURNAL))
    signals["pending_merge"] = pending

    stamp, sizes = read_ann_store_stamp(store_path)
    rows = None if sizes is None else sum(sizes.values())
    watermark = (
        -1
        if stamp is None or stamp.get("merged_through") is None
        else int(stamp["merged_through"])
    )
    tombs = read_ann_tombstones(store_path)
    signals["rows"] = rows
    signals["live_tombstones"] = len(tombs)
    signals["merged_through"] = None if watermark < 0 else watermark
    tomb_frac = None if not rows else len(tombs) / rows
    signals["tomb_frac"] = tomb_frac

    backlog: list[int] = []
    prunable_drain = 0
    drain_match = None
    drain_note = None
    dstamp = None
    if drain_dir is not None:
        # the drain tier (batch dirs + journal moves) is POSIX-only
        # end to end — a URI drain must refuse HERE, not fall
        # through os.path.isdir reading it as absent and reporting
        # 'no backlog' while committed batches sit unfolded (review
        # r12: the exact silent-absence hazard this function's other
        # probes were just cured of)
        from .pq import require_rename_capable

        require_rename_capable(drain_dir, "ann_maintenance_plan")
    if drain_dir is not None and os.path.isdir(drain_dir):
        from .pq import _complete_drain_batches

        backlog = _consumable_drain_batches(drain_dir, watermark)
        cutoff = watermark - max(0, int(drain_keep_batches))
        # committed-only, matching what prune_ann_drain would delete
        prunable_drain = sum(
            1 for b in _complete_drain_batches(drain_dir) if b <= cutoff
        )
        # surface a mispaired or unstamped drain at PLAN time through
        # the SAME predicate the executors raise (`pairing_refusal` —
        # review r11: the plan re-implementing these checks inline is
        # exactly how r10's and r11's executable-but-refused drifts
        # happened; one shared check cannot drift)
        dstamp, _ = read_ann_store_stamp(drain_dir)
        drain_note = pairing_refusal(
            store_path, stamp, drain_dir, dstamp
        )
        if dstamp is None:
            drain_match = False
        elif stamp is not None:
            drain_match = drain_note is None
    signals["backlog_batches"] = len(backlog)
    signals["prunable_drain_batches"] = prunable_drain
    signals["drain_encoding_match"] = drain_match

    n_versions = prunable = 0
    if base_dir is not None:
        from .pq import list_ann_versions

        # the SAME census prune_ann_versions uses (committed-only on
        # CAS schemes; claim residue never counts), so the plan's
        # prunable count cannot drift from what prune would remove
        vs, _residue = list_ann_versions(base_dir, version)
        n_versions = len(vs)
        if keep_versions is not None:
            keep = set(vs[-keep_versions:]) | {version}
            prunable = len([v for v in vs if v not in keep])
    signals["versions"] = n_versions
    signals["prunable_versions"] = prunable

    if pending:
        actions.append(
            {
                "action": "recover-merge",
                "executable": True,
                "reason": "a merge journal sits on the store — a "
                "crashed merge needs recovery (or one is live; "
                "apply only with recover after checking)",
            }
        )
    if len(backlog) >= max(1, min_merge_batches):
        # the exact refusal merge_ann_appends would raise mid-apply
        # (store stamp/sizes, drain stamp, encoding pairing) — one
        # shared predicate, so plan and executor cannot drift
        merge_note = merge_refusal(
            store_path, stamp, sizes, drain_dir, dstamp
        )
        if merge_note is None and not resolve_metadata_arbiter(
            store_path, "ann_maintenance_plan"
        ).native_rename:
            merge_note = (
                "store metadata is on a conditional-put scheme — "
                "merge's journal moves need POSIX rename; the "
                "object-store remedy is rebuild_ann over the full "
                "corpus (incl. the drain's rows)"
            )
        actions.append(
            {
                "action": "merge",
                "executable": merge_note is None,
                "reason": (
                    f"{len(backlog)} committed drain batch(es) past "
                    f"watermark {watermark} — fold at delta cost"
                    if merge_note is None
                    else merge_note
                ),
            }
        )
    if tomb_frac is not None and tomb_frac >= tomb_gc_frac:
        if base_dir is None:
            # name a remedy that WORKS for this store's plane: a
            # conditional-put bare store cannot compact (POSIX rung)
            # — pointing it at compact_ann_store would be a dead end
            # (review r12)
            gc_why = (
                "bare store: run compact_ann_store to a new "
                "dir and swap it yourself (or adopt rebuild_ann)"
                if resolve_metadata_arbiter(
                    store_path, "ann_maintenance_plan"
                ).native_rename
                else "bare conditional-put store: compact needs "
                "POSIX — adopt rebuild_ann (its claim/commit/"
                "pointer-CAS publish runs natively here)"
            )
        elif not rename_capable:
            gc_why = (
                "deployment metadata is on a conditional-put "
                "scheme — gc's staging rename needs POSIX; the "
                "object-store remedy is rebuild_ann (publishes "
                "tombstone-free codes natively there)"
            )
        else:
            gc_why = "GC-compact into a new version"
        actions.append(
            {
                "action": "gc",
                "executable": base_dir is not None and rename_capable,
                "reason": f"{len(tombs)} live tombstones over {rows} "
                f"rows ({tomb_frac:.2%}) >= {tomb_gc_frac:.2%} — "
                + gc_why,
            }
        )
    if prunable_drain:
        actions.append(
            {
                "action": "prune-drain",
                "executable": drain_match is not False,
                "reason": (
                    f"{prunable_drain} consumed drain batch(es) at or "
                    f"below watermark {watermark} minus the "
                    f"{drain_keep_batches}-batch replay window"
                    if drain_match is not False
                    else drain_note
                ),
            }
        )
    if prunable:
        actions.append(
            {
                "action": "prune-versions",
                "executable": True,
                "reason": f"{prunable} version(s) beyond the "
                f"keep={keep_versions} retention bound",
            }
        )
    return {"signals": signals, "actions": actions}


def run_ann_maintenance(
    spark_factory,
    store_path: str | None = None,
    drain_dir: str | None = None,
    base_dir: str | None = None,
    model_path: str | None = None,
    apply: bool = False,
    recover: bool = False,
    tomb_gc_frac: float = 0.01,
    min_merge_batches: int = 1,
    keep_versions: int | None = None,
    drain_keep_batches: int = 2,
) -> dict:
    """Plan, and with ``apply=True`` execute, one maintenance round.
    ``spark_factory`` is a zero-arg callable yielding a SparkSession —
    called at most once, and only when an executed action needs data
    movement (plan-only and prune-only rounds stay Spark-free).

    Execution policy: a pending journal BLOCKS the round unless
    ``recover=True`` (auto-recovering would roll back a live merge's
    published files — the operator must assert none is running); with
    recover granted, the recovery rides the merge call itself
    (`merge_ann_appends(recover=True)` classifies and resolves the
    journal before folding the backlog). Actions re-plan nothing:
    what runs is exactly what the returned plan names, in its order,
    and each result lands under ``results[action]``. A non-executable
    action (see `ann_maintenance_plan`) is reported, never attempted.

    Returns ``{"plan", "applied", "blocked", "results"}``."""
    plan = ann_maintenance_plan(
        store_path=store_path,
        drain_dir=drain_dir,
        base_dir=base_dir,
        tomb_gc_frac=tomb_gc_frac,
        min_merge_batches=min_merge_batches,
        keep_versions=keep_versions,
        drain_keep_batches=drain_keep_batches,
    )
    out = {"plan": plan, "applied": [], "blocked": [], "results": {}}
    if not apply:
        return out

    names = [a["action"] for a in plan["actions"]]
    pending = "recover-merge" in names
    if pending and not recover:
        out["blocked"] = names
        out["results"]["recover-merge"] = (
            "blocked: pass recover=True after checking no merge is "
            "running"
        )
        return out

    spark = None

    def _spark():
        nonlocal spark
        if spark is None:
            spark = spark_factory()
        return spark

    model = None

    def _model():
        nonlocal model
        if model is None:
            if base_dir is not None:
                cur = resolve_ann_current(base_dir)
                model = load_ann_model(
                    cur["model_path"],
                    expected_sha256=cur["model_sha256"],
                )
            elif model_path is not None:
                model = load_ann_model(model_path)
            else:
                raise ValueError(
                    "merge needs a model: pass model_path for a bare "
                    "store (deployments resolve it from CURRENT)"
                )
        return model

    def _store():
        return (
            resolve_ann_current(base_dir)["store_path"]
            if base_dir is not None
            else store_path
        )

    for a in plan["actions"]:
        name = a["action"]
        if not a["executable"]:
            out["blocked"].append(name)
            out["results"][name] = f"not executable here: {a['reason']}"
            continue
        if name == "recover-merge":
            merge_action = next(
                (x for x in plan["actions"] if x["action"] == "merge"),
                None,
            )
            if (
                merge_action is not None
                and merge_action["executable"]
                and drain_dir is not None
            ):
                continue  # resolved by the merge call (recover=True)
            # journal with no foldable backlog, no drain in hand, or
            # a BLOCKED merge (drain mismatch — merge_ann_appends
            # would refuse before touching the journal, silently
            # dropping the granted recovery, ADVICE r10): classify
            # and resolve it directly — Spark-free
            from .pq import _recover_pending_merge

            out["results"][name] = _recover_pending_merge(_store())
            out["applied"].append(name)
            continue
        if name == "merge":
            out["results"][name] = merge_ann_appends(
                _spark(), _store(), drain_dir, _model(), recover=pending
            )
            out["applied"].append(name)
            if pending:
                out["applied"].append("recover-merge")
                out["results"]["recover-merge"] = out["results"][name][
                    "recovered"
                ]
            continue
        if name == "gc":
            try:
                out["results"][name] = gc_ann_version(
                    _spark(), base_dir
                )
            except AnnGcNothingToCollect:
                # gc x gc where the loser arrives LATE: a concurrent
                # round's gc published between our plan and this
                # action, so the tombstones are already collected.
                # The work is done — converge and keep running the
                # rest of the round instead of dying mid-apply after
                # earlier actions ran (review r11; the early-arrival
                # loser is already handled by the rename arbiter)
                out["results"][name] = (
                    "skipped: no live tombstones left — a concurrent "
                    "round already collected them"
                )
                continue
            out["applied"].append(name)
            continue
        if name == "prune-drain":
            out["results"][name] = prune_ann_drain(
                drain_dir, _store(), keep_batches=drain_keep_batches
            )
            out["applied"].append(name)
            continue
        if name == "prune-versions":
            out["results"][name] = prune_ann_versions(
                base_dir, keep=keep_versions
            )
            out["applied"].append(name)
            continue
    return out
