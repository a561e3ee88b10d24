"""Pipeline orchestration: run_day / run_range (reference §3).

The reference loops per day because Postgres idempotency is
delete+insert per date (app.py:276-300, backfill.py:138-224). In Spark
the same guarantees come from:

- idempotent append: left anti-join on event_hash against the existing
  curated table before appending (K1);
- dynamic partition overwrite for enriched + daily marts (partitioned
  by event day) and monthly marts (partitioned by month) — re-running
  a day replaces exactly the affected partitions (K2/K3);
- event-day spillover handled by recomputing every event day present
  in the batch, not just the file date (SURVEY.md §7.6).

A whole date range is therefore ONE Spark job over all days — the
per-day loop disappears; `run_range` just iterates extraction and
feeds a single multi-day batch through the same `process_batch`.
"""

from __future__ import annotations

import datetime as dt
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import marts
from .enrich import enrich, new_rows_only
from .schemas import CURATED_FOCOS
from .sources.csv_ingest import read_csv_all_string
from .transform import curated_from_raw


class PublishAuditError(RuntimeError):
    """A staged write failed its pre-publish audit; the live table was
    not touched."""


class Warehouse:
    """Partitioned-parquet warehouse: the engine's table layer.

    Layout: <root>/<table>/ partitioned parquet. Daily tables are
    partitioned by day (partition pruning on every day-ranged query —
    the Spark analog of the reference's B-tree-on-day indexes,
    SURVEY.md §4), monthly tables by month.

    Overwrites follow write-audit-publish (VERDICT r3 "Next round" #3
    — the Spark analog of the reference's delete+insert inside one
    Postgres transaction, sql_runner.py:132-157): the job writes to
    ``<root>/_tmp/<table>__<uuid>``, the staged output is audited
    (_SUCCESS commit marker + every parquet footer readable, plus an
    optional expected-row-count match), and only then do partition
    directories swap into the live table via atomic renames. A failure
    at ANY point before publish — including a Spark job dying
    mid-write — leaves the live table byte-identical; readers never
    see a half-written partition because staging lives outside every
    table path. The publish itself is atomic ACROSS partitions: once
    the audit passes an ``_AUDITED`` marker commits the intent, and a
    crash anywhere in the swap loop (including between the two renames
    of one partition's swap) is rolled FORWARD by the next publish's
    _gc_stale, which completes the remaining swaps from the surviving
    staged dir — so a multi-partition publish lands all-old or
    all-new, mirroring the reference's delete+insert-in-one-
    transaction semantics at the table level, not just per-partition.
    """

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> str:
        return str(self.root / table)

    def exists(self, table: str) -> bool:
        p = self.root / table
        return p.exists() and any(p.rglob("*.parquet"))

    def read(self, spark: SparkSession, table: str) -> DataFrame | None:
        if not self.exists(table):
            return None
        return spark.read.parquet(self.path(table))

    # -- write-audit-publish internals ---------------------------------

    def _stage_dir(self, table: str) -> Path:
        import uuid

        d = self.root / "_tmp" / f"{table}__{uuid.uuid4().hex}"
        d.parent.mkdir(parents=True, exist_ok=True)
        return d

    @staticmethod
    def _staging_dirs(base: Path, table: str) -> list[Path]:
        """Staging/backup dirs belonging to THIS table: name must be
        exactly ``<table>__<32-hex-uuid>``. A bare ``{table}__*`` glob
        also matches dirs of any table whose own name starts with
        ``<table>__`` (e.g. table 't__archive' vs table 't'), and
        recovery renaming ANOTHER table's staged partitions into this
        table's live dir would be cross-table corruption (r5 review)."""
        out = []
        for d in sorted(base.glob(f"{table}__*")):
            suffix = d.name[len(table) + 2 :]
            if len(suffix) == 32 and all(
                c in "0123456789abcdef" for c in suffix
            ):
                out.append(d)
        return out

    def _gc_stale(self, table: str) -> None:
        """Recover from earlier interrupted publishes of this table,
        then clear the staging areas (single-writer pipeline, like the
        reference's per-day runner). Recovery is two-phase:

        1. Roll FORWARD any publish that crashed after its audit
           passed (the ``_AUDITED`` marker in the staged dir): the
           staged output is known-good, so the remaining partition
           swaps complete exactly as the interrupted publish loop
           would have — a multi-partition publish lands all-new
           instead of being finalized in a torn old/new mix
           (ADVICE r4 #1: cross-partition atomicity). Idempotent:
           a crash during roll-forward resumes from the same marker.
        2. Restore backups of publishes that never reached the
           publish phase. A crash BETWEEN the two renames of a
           partition swap leaves the only copy of the old data in
           _trash — trash contents are RESTORED to any live location
           that is missing before anything is deleted; a leftover
           whose live counterpart exists means that swap completed
           and the backup is safe to drop.
        """
        import shutil

        live = self.root / table
        trash_base = self.root / "_trash"
        tmp_base = self.root / "_tmp"
        if tmp_base.exists():
            for tmp in self._staging_dirs(tmp_base, table):
                if not (tmp.is_dir() and (tmp / "_AUDITED").exists()):
                    continue  # unaudited staging leftover: dropped below
                trash = trash_base / tmp.name
                staged = sorted(
                    d for d in tmp.iterdir() if d.is_dir() and "=" in d.name
                )
                live.mkdir(parents=True, exist_ok=True)
                for pdir in staged:
                    target = live / pdir.name
                    if target.exists():
                        # this partition's swap never started: back the
                        # old copy up first, like the publish loop does
                        trash.mkdir(parents=True, exist_ok=True)
                        target.rename(trash / pdir.name)
                    # else: crashed between the two renames (old copy
                    # already in trash) or a brand-new partition —
                    # either way the staged dir moves straight in
                    pdir.rename(target)
                shutil.rmtree(tmp, ignore_errors=True)
                shutil.rmtree(trash, ignore_errors=True)
        if trash_base.exists():
            for d in self._staging_dirs(trash_base, table):
                if d.is_dir() and any(d.iterdir()):
                    entries = sorted(p for p in d.iterdir())
                    if all(e.is_dir() and "=" in e.name for e in entries):
                        # partition-level backup: restore missing parts
                        live.mkdir(parents=True, exist_ok=True)
                        for part in entries:
                            target = live / part.name
                            if not target.exists():
                                part.rename(target)
                    elif not live.exists():
                        # whole-table backup from overwrite(): restore
                        d.rename(live)
                        continue
                shutil.rmtree(d, ignore_errors=True)
        if tmp_base.exists():
            for d in self._staging_dirs(tmp_base, table):
                shutil.rmtree(d, ignore_errors=True)

    @staticmethod
    def _audit_staged(
        tmp: Path, table: str, expected_rows: int | None = None
    ) -> list[Path]:
        """Audit a staged write before any live mutation: the Spark
        commit marker must exist (the job finished every task) and
        every staged file's parquet footer must be readable (pyarrow,
        metadata only — a truncated/corrupt task output fails here).
        When the caller knows the intended row count, ``expected_rows``
        additionally asserts the footers sum to it. Returns the staged
        partition directories (possibly empty for an empty input)."""
        if not (tmp / "_SUCCESS").exists():
            raise PublishAuditError(
                f"staged write for {table!r} has no _SUCCESS marker: "
                "the Spark job did not commit; live table untouched"
            )
        import pyarrow.parquet as pq

        total = 0
        for f in tmp.rglob("*.parquet"):
            try:
                total += pq.ParquetFile(str(f)).metadata.num_rows
            except Exception as ex:  # unreadable footer = failed write
                raise PublishAuditError(
                    f"staged file {f} unreadable for {table!r}: {ex}; "
                    "live table untouched"
                ) from ex
        if expected_rows is not None and total != expected_rows:
            raise PublishAuditError(
                f"staged row count {total} != expected {expected_rows} "
                f"for {table!r}; live table untouched"
            )
        return sorted(
            d for d in tmp.iterdir() if d.is_dir() and "=" in d.name
        )

    def overwrite_partitions(self, df: DataFrame, table: str, partition_col: str) -> None:
        """K2/K3: replace only the partitions present in df, via
        write-audit-publish. Each partition directory swaps in with
        two atomic renames (old -> _trash, staged -> live); a crash
        between swaps leaves every partition either fully-old or
        fully-new, never partial."""
        import shutil

        self._gc_stale(table)
        tmp = self._stage_dir(table)
        # staging dir is fresh, so static overwrite is correct — and
        # unlike the dynamic committer it writes the _SUCCESS marker
        # the audit requires as commit evidence
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(partition_col)
            .parquet(str(tmp))
        )
        staged_parts = self._audit_staged(tmp, table)
        # Publish-phase marker: from here the staged output is audited
        # good, so _gc_stale rolls an interrupted swap loop FORWARD
        # (completes the remaining swaps) instead of discarding it —
        # the publish is atomic across partitions: every partition
        # lands either all-old (crash before this marker) or all-new
        # (crash after it), never a finalized mix (ADVICE r4 #1).
        (tmp / "_AUDITED").touch()

        live = self.root / table
        live.mkdir(parents=True, exist_ok=True)
        trash = self.root / "_trash" / tmp.name
        trash.mkdir(parents=True, exist_ok=True)
        for pdir in staged_parts:
            target = live / pdir.name
            if target.exists():
                target.rename(trash / pdir.name)
            pdir.rename(target)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)

    def append(self, df: DataFrame, table: str, partition_col: str | None = None) -> None:
        w = df.write.mode("append")
        if partition_col:
            w = w.partitionBy(partition_col)
        w.parquet(self.path(table))

    def overwrite(self, df: DataFrame, table: str) -> None:
        """K5 truncate+reload, via write-audit-publish: the staged dir
        swaps in whole (old table -> _trash, staged -> live) so readers
        see the old table until the instant the new one is complete."""
        import shutil

        self._gc_stale(table)
        tmp = self._stage_dir(table)
        df.write.mode("overwrite").parquet(str(tmp))
        self._audit_staged(tmp, table)

        live = self.root / table
        trash = self.root / "_trash" / tmp.name
        trash.parent.mkdir(parents=True, exist_ok=True)
        if live.exists():
            live.rename(trash)
        tmp.rename(live)
        shutil.rmtree(trash, ignore_errors=True)


def process_batch(
    spark: SparkSession,
    warehouse: Warehouse,
    curated_batch: DataFrame,
    dims: dict,
) -> dict:
    """Core incremental step: curated batch -> curated/enriched tables
    -> marts, idempotently. ``dims`` carries PolyFeature lists
    ('municipios','biomas','ucs','tis') and the uf_area DataFrame.
    """
    t0 = time.perf_counter()
    existing = warehouse.read(spark, "curated_focos")
    # localCheckpoint truncates lineage BEFORE the append below —
    # otherwise any recomputation re-lists curated_focos, sees its own
    # freshly appended files, and the anti-join silently empties the
    # batch (the classic read-your-own-append hazard). On a cluster
    # this would be a staging-table write instead.
    fresh = new_rows_only(curated_batch, existing).localCheckpoint(eager=True)
    n_new = fresh.count()

    metrics = {"rows_in_batch": curated_batch.count(), "rows_new": n_new}
    if n_new == 0:
        metrics["seconds"] = round(time.perf_counter() - t0, 3)
        return metrics

    warehouse.append(fresh, "curated_focos", partition_col="file_date")

    enriched_new = enrich(
        fresh,
        dims["municipios"],
        dims["biomas"],
        dims["ucs"],
        dims["tis"],
    ).localCheckpoint(eager=True)

    # spillover: recompute every event day touched by this batch
    affected_days = [r["event_day"] for r in enriched_new.select("event_day").distinct().collect()]
    day_strs = [str(d) for d in affected_days]
    prior = warehouse.read(spark, "enriched_focos")
    if prior is not None:
        prior_affected = prior.filter(
            F.col("event_day").cast("string").isin(day_strs)
        )
        # materialize before overwriting the same partitions we read
        enriched_days = (
            prior_affected.unionByName(enriched_new.select(*prior.columns))
            .localCheckpoint(eager=True)
        )
    else:
        enriched_days = enriched_new
    warehouse.overwrite_partitions(enriched_days, "enriched_focos", "event_day")

    # marts over the affected days (reload from the table so re-runs
    # see the merged state)
    enriched_all = warehouse.read(spark, "enriched_focos")
    affected = enriched_all.filter(
        F.col("event_day").cast("string").isin(day_strs)
    )
    daily_mun = marts.focos_diario_municipio(affected)
    daily_uf = marts.focos_diario_uf(affected, dims["uf_area"])
    warehouse.overwrite_partitions(daily_mun, "focos_diario_municipio", "day")
    warehouse.overwrite_partitions(daily_uf, "focos_diario_uf", "day")
    warehouse.overwrite_partitions(
        marts.focos_diario_bioma(affected), "focos_diario_bioma", "day"
    )
    warehouse.overwrite_partitions(
        marts.focos_diario_uc(affected), "focos_diario_uc", "day"
    )
    warehouse.overwrite_partitions(
        marts.focos_diario_ti(affected), "focos_diario_ti", "day"
    )

    # monthly marts: recompute affected months from the enriched table
    affected_months = sorted({dt.date(d.year, d.month, 1) for d in affected_days})
    month_df = enriched_all.filter(
        F.trunc("event_day", "month").cast("string").isin(
            [str(m) for m in affected_months]
        )
    )
    warehouse.overwrite_partitions(
        marts.focos_mensal_municipio(month_df), "focos_mensal_municipio", "month"
    )
    warehouse.overwrite_partitions(
        marts.focos_mensal_uf(month_df, dims["uf_area"]), "focos_mensal_uf", "month"
    )

    # serving fact MV + trend view (full recompute — small aggregates)
    warehouse.overwrite_partitions(
        marts.mv_focos_day_dim(affected), "mv_focos_day_dim", "day"
    )
    full_daily_uf = warehouse.read(spark, "focos_diario_uf")
    warehouse.overwrite(marts.focos_diario_uf_trend(full_daily_uf), "focos_diario_uf_trend")

    metrics.update(
        {
            "affected_days": [str(d) for d in affected_days],
            "affected_months": [str(m) for m in affected_months],
            "seconds": round(time.perf_counter() - t0, 3),
        }
    )
    return metrics


def run_day(
    spark: SparkSession,
    warehouse: Warehouse,
    csv_path: str,
    file_date: dt.date,
    dims: dict,
) -> dict:
    """One daily file end-to-end: CSV -> transform -> batch."""
    raw = read_csv_all_string(spark, csv_path)
    curated = curated_from_raw(raw, file_date)
    return process_batch(spark, warehouse, curated, dims)


def run_day_auto(
    spark: SparkSession,
    warehouse: Warehouse,
    extractor,
    file_date: dt.date,
    dims: dict,
) -> dict:
    """The full reference daily run (§3.1): extract with retention
    routing + monthly fallback (S1/S2/S5, sources.csv_ingest
    .InpeExtractor), monthly->daily Spark filter when the archive won
    (S4), transform, and the idempotent batch step. Mirrors
    etl.cli.run -> extract -> transform -> load."""
    from .sources.csv_ingest import load_extracted_day

    result = extractor.extract_day(file_date)
    raw = load_extracted_day(spark, result)
    curated = curated_from_raw(raw, file_date)
    metrics = process_batch(spark, warehouse, curated, dims)
    metrics["extract_source"] = result.source
    metrics["extract_key"] = result.key
    return metrics


def write_validation_report(
    spark: SparkSession, warehouse: Warehouse
) -> tuple[str, str] | None:
    """Post-run check sweep + artifact write (reference
    validate_marts.py:81-122,283-301): runs the table-level checks over
    the warehouse and leaves docs/validation_last_run.md +
    logs/last_run.json under the warehouse root. Returns both paths, or
    None when no enriched table exists yet (nothing to validate)."""
    from . import checks as C

    enriched = warehouse.read(spark, "enriched_focos")
    daily_mun = warehouse.read(spark, "focos_diario_municipio")
    daily_uf = warehouse.read(spark, "focos_diario_uf")
    if enriched is None or daily_mun is None or daily_uf is None:
        return None

    results = [
        C.check_mart_consistency(daily_mun, daily_uf, enriched),
        C.check_enrichment_coverage(enriched),
        C.check_checked_flags(enriched),
    ]
    report = C.run_checks(results)

    # last-day counts section (validate_marts.py _fetch_counts analog)
    uf_day = daily_uf.agg(F.max("day")).collect()[0][0]
    mun_day = daily_mun.agg(F.max("day")).collect()[0][0]
    counts = {
        "uf_day": uf_day,
        "uf_rows": daily_uf.filter(F.col("day") == uf_day).count(),
        "mun_day": mun_day,
        "mun_rows": daily_mun.filter(F.col("day") == mun_day).count(),
    }
    return C.write_run_report(
        report,
        counts,
        docs_dir=warehouse.root / "docs",
        logs_dir=warehouse.root / "logs",
    )


def post_run_ann_maintenance(
    spark: SparkSession, config: dict
) -> dict:
    """The ANN tier's rung in the orchestration (VERDICT r10 #6): the
    reference's app.py decides which stage to run from on-disk state
    after each daily run; the Spark engine's equivalent moving part
    is the ANN store lifecycle (drain backlog, tombstones, versions,
    crash journals). This hook runs ONE `annmaint.run_ann_maintenance`
    round against the deployment named by ``config``:

    - the PLAN is always computed — file metadata only, ~1 ms, so it
      is free to attach to every run and surfaces backlog/pairing
      problems in the run's own metrics;
    - data-moving actions execute only under ``config["apply"]``
      (and journal recovery only under ``config["recover"]`` — the
      operator must assert no live merge, exactly as at the CLI);
    - the ALREADY-RUNNING session is reused (`run_ann_maintenance`'s
      spark_factory), so a plan-only or prune-only round stays free
      and an applied merge shares the run's executors.

    ``config`` passes through: one of ``base_dir``/``store_path``,
    plus ``drain_dir``, ``model_path``, ``apply``, ``recover``,
    ``tomb_gc_frac``, ``min_merge_batches``, ``keep_versions``,
    ``drain_keep_batches``. Returns run_ann_maintenance's
    ``{"plan", "applied", "blocked", "results"}``."""
    from .operators.annmaint import run_ann_maintenance

    cfg = dict(config)
    return run_ann_maintenance(
        lambda: spark,
        apply=bool(cfg.pop("apply", False)),
        recover=bool(cfg.pop("recover", False)),
        **cfg,
    )


def read_resume_state(state_path: str | None) -> set[str]:
    """S8 resume marker read-back (reference backfill.py:151-162): the
    set of ISO days already completed in a previous run."""
    if not state_path or not Path(state_path).exists():
        return set()
    try:
        data = json.loads(Path(state_path).read_text())
    except (OSError, json.JSONDecodeError):
        return set()
    return set(data.get("days", []))


def run_range(
    spark: SparkSession,
    warehouse: Warehouse,
    day_files: list[tuple[dt.date, str]],
    dims: dict,
    state_path: str | None = None,
    write_report: bool = True,
    ann_maintenance: dict | None = None,
) -> list[dict]:
    """Multi-day backfill as ONE batch per call, resuming from the S8
    state file: days recorded as done by a previous run are skipped
    before any read (reference backfill.py:47-66,151-162 keeps and
    re-reads the JSON marker; the anti-join append additionally makes
    accidental replays harmless)."""
    done = read_resume_state(state_path)
    skipped = [str(d) for d, _ in day_files if str(d) in done]
    todo = [(d, p) for d, p in day_files if str(d) not in done]
    if not todo:
        out = {"rows_in_batch": 0, "rows_new": 0, "days_skipped": skipped}
        if ann_maintenance is not None:
            # the drain accrues backlog whether or not new CSV days
            # landed — an all-skipped (resumed) run still maintains
            out["ann_maintenance"] = post_run_ann_maintenance(
                spark, ann_maintenance
            )
        return [out]
    batches = []
    for file_date, path in todo:
        raw = read_csv_all_string(spark, path)
        batches.append(curated_from_raw(raw, file_date))
    combined = batches[0]
    for b in batches[1:]:
        combined = combined.unionByName(b)
    combined = combined.select([f.name for f in CURATED_FOCOS.fields])
    result = process_batch(spark, warehouse, combined, dims)
    if skipped:
        result["days_skipped"] = skipped
    if write_report:
        report_paths = write_validation_report(spark, warehouse)
        if report_paths:
            result["report_md"], result["report_json"] = report_paths
    if state_path:
        all_done = sorted(done | {str(d) for d, _ in todo})
        Path(state_path).write_text(
            json.dumps(
                {
                    "last_done": all_done[-1],
                    "days": all_done,
                    "metrics": result,
                },
                default=str,
            )
        )
    if ann_maintenance is not None:
        # opt-in post-run ANN lifecycle rung, AFTER the resume-state
        # write: the data plane is committed by this point, so a
        # maintenance failure stays loud (propagates, run exits
        # nonzero) without un-marking the day — re-running would
        # reprocess days the warehouse already holds just because a
        # drain merge hiccuped. Plan rides every run's metrics (but
        # not the state file's snapshot of them); actions move data
        # only under the config's "apply".
        result["ann_maintenance"] = post_run_ann_maintenance(
            spark, ann_maintenance
        )
    return [result]
