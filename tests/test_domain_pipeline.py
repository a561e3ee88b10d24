"""End-to-end pipeline: run_day idempotency, spillover partitions,
incremental append (K1/K2/K3 semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.pipeline import Warehouse, run_day
from inpe_queimadas_etl_spark.schemas import UF_AREA
from inpe_queimadas_etl_spark.sources.csv_ingest import write_fixture_csv

from . import fixtures_geo as G

FILE_DATE = dt.date(2024, 5, 2)


@pytest.fixture(scope="module")
def dims(spark):
    return {
        "municipios": G.municipios(),
        "biomas": G.biomas(),
        "ucs": G.ucs(),
        "tis": G.tis(),
        "uf_area": spark.createDataFrame(G.uf_area_rows(), UF_AREA),
    }


@pytest.fixture(scope="module")
def wh_and_csv(spark, tmp_path_factory, dims):
    root = tmp_path_factory.mktemp("warehouse")
    csv_path = str(tmp_path_factory.mktemp("csv") / "focos_20240502.csv")
    write_fixture_csv(csv_path, G.FOCOS_HEADER, G.FOCOS_ROWS, sep=";")
    wh = Warehouse(str(root))
    metrics1 = run_day(spark, wh, csv_path, FILE_DATE, dims)
    return wh, csv_path, metrics1


def test_first_run_loads_all(wh_and_csv):
    _, _, metrics1 = wh_and_csv
    assert metrics1["rows_new"] == G.N_VALID_UNIQUE


def test_rerun_is_idempotent(spark, wh_and_csv, dims):
    wh, csv_path, _ = wh_and_csv
    before = wh.read(spark, "curated_focos").count()
    metrics2 = run_day(spark, wh, csv_path, FILE_DATE, dims)
    assert metrics2["rows_new"] == 0  # anti-join append: nothing new
    assert wh.read(spark, "curated_focos").count() == before
    # marts unchanged
    daily_uf = wh.read(spark, "focos_diario_uf")
    total = daily_uf.agg(F.sum("n_focos")).collect()[0][0]
    assert total == 12  # attributed rows across both event days


def test_spillover_day_partitioned(spark, wh_and_csv):
    wh, _, _ = wh_and_csv
    enriched = wh.read(spark, "enriched_focos")
    days = {str(r["event_day"]) for r in enriched.select("event_day").distinct().collect()}
    assert days == {"2024-05-01", "2024-05-02"}
    # physical partition dirs exist (partition pruning at scale)
    import os

    parts = os.listdir(wh.path("enriched_focos"))
    assert any("event_day=2024-05-01" in p for p in parts)


def test_incremental_second_file(spark, wh_and_csv, dims, tmp_path):
    """New day's file appends; prior days' marts remain."""
    wh, _, _ = wh_and_csv
    rows = [
        ["0.5", "0.5", "2024-05-03 10:00:00", "AQUA_M-T", "Mun m100", "AA", "Amazonia", "1.1"],
        ["1.5", "1.5", "2024-05-03 10:30:00", "NOAA-20", "Mun m201", "BB", "Amazonia", ""],
    ]
    csv2 = str(tmp_path / "focos_20240503.csv")
    write_fixture_csv(csv2, G.FOCOS_HEADER, rows, sep=";")
    metrics = run_day(spark, wh, csv2, dt.date(2024, 5, 3), dims)
    assert metrics["rows_new"] == 2
    daily_uf = wh.read(spark, "focos_diario_uf")
    by_day = {
        (str(r["day"]), r["uf"]): r["n_focos"]
        for r in daily_uf.collect()
    }
    assert by_day[("2024-05-03", "AA")] == 1
    assert by_day[("2024-05-02", "AA")] == 6  # untouched
    # monthly mart covers the whole month
    monthly = wh.read(spark, "focos_mensal_uf")
    m = {r["uf"]: r["n_focos"] for r in monthly.collect()}
    assert m["AA"] == 8
    # trend view exists over full history
    trend = wh.read(spark, "focos_diario_uf_trend")
    aa = {str(r["day"]): r for r in trend.filter("uf='AA'").collect()}
    assert aa["2024-05-03"]["ma7"] == round((1 + 6 + 1) / 3, 2)


class TestWriteAuditPublish:
    """VERDICT r3 #3: overwrites are write-audit-publish — a Spark job
    dying mid-write must leave the live partition byte-identical."""

    @staticmethod
    def _seed(spark, tmp_path, name="wap_wh"):
        wh = Warehouse(str(tmp_path / name))
        df = spark.createDataFrame(
            [("2024-05-01", i, f"v{i}") for i in range(10)]
            + [("2024-05-02", i, f"w{i}") for i in range(10)],
            "day string, n int, v string",
        )
        wh.overwrite_partitions(df, "t", "day")
        return wh

    def test_killed_write_leaves_old_partitions_intact(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        before = {
            (r["day"], r["n"], r["v"]) for r in wh.read(spark, "t").collect()
        }
        files_before = sorted(
            str(p.relative_to(wh.root)) for p in wh.root.rglob("*.parquet")
        )

        # a genuinely dying Spark job: one task raises after others
        # have already written their staged files
        @F.udf("string")
        def boom(day):
            if day == "2024-05-02":
                raise RuntimeError("mid-write kill")
            return day

        bad = (
            spark.createDataFrame(
                [("2024-05-01", 99, "NEW"), ("2024-05-02", 99, "NEW")],
                "day string, n int, v string",
            )
            .repartition(2, "day")
            .withColumn("day", boom(F.col("day")))
        )
        with pytest.raises(Exception):
            wh.overwrite_partitions(bad, "t", "day")

        after = {
            (r["day"], r["n"], r["v"]) for r in wh.read(spark, "t").collect()
        }
        files_after = sorted(
            str(p.relative_to(wh.root)) for p in wh.root.rglob("*.parquet")
        )
        assert after == before
        # no staged/partial file landed under the live table path
        assert [f for f in files_after if f.startswith("t/")] == [
            f for f in files_before if f.startswith("t/")
        ]

    def test_missing_success_marker_fails_audit(self, spark, tmp_path):
        from inpe_queimadas_etl_spark.pipeline import PublishAuditError

        wh = self._seed(spark, tmp_path)
        tmp = wh._stage_dir("t")
        tmp.mkdir(parents=True)
        (tmp / "day=2024-05-01").mkdir()
        with pytest.raises(PublishAuditError):
            wh._audit_staged(tmp, "t")

    def test_successful_overwrite_cleans_staging(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        df = spark.createDataFrame(
            [("2024-05-02", 7, "z7")], "day string, n int, v string"
        )
        wh.overwrite_partitions(df, "t", "day")
        rows = {
            (str(r["day"]), r["n"], r["v"]) for r in wh.read(spark, "t").collect()
        }
        # 05-01 untouched, 05-02 replaced
        assert ("2024-05-01", 0, "v0") in rows
        assert ("2024-05-02", 7, "z7") in rows
        assert all(r[0] != "2024-05-02" or r == ("2024-05-02", 7, "z7") for r in rows)
        assert not any((wh.root / "_tmp").glob("t__*"))
        assert not any((wh.root / "_trash").glob("t__*"))

    def test_crash_between_swap_renames_is_healed(self, spark, tmp_path):
        """A crash AFTER old->_trash but BEFORE staged->live leaves the
        only copy of a partition in _trash; the next publish must
        RESTORE it before clearing staging — never delete the backup
        (review finding: blind gc lost the partition permanently)."""
        wh = self._seed(spark, tmp_path)
        live = wh.root / "t"
        trash = wh.root / "_trash" / ("t__" + "c" * 32)
        trash.mkdir(parents=True)
        # simulate the mid-swap crash state for day=2024-05-01
        (live / "day=2024-05-01").rename(trash / "day=2024-05-01")
        assert not (live / "day=2024-05-01").exists()

        # next publish (for a DIFFERENT day) heals the lost partition
        df = spark.createDataFrame(
            [("2024-05-02", 7, "z7")], "day string, n int, v string"
        )
        wh.overwrite_partitions(df, "t", "day")
        rows = {
            (str(r["day"]), r["n"], r["v"]) for r in wh.read(spark, "t").collect()
        }
        assert ("2024-05-01", 0, "v0") in rows  # restored from _trash
        assert ("2024-05-02", 7, "z7") in rows
        assert not any((wh.root / "_trash").glob("t__*"))

    def test_crash_mid_full_overwrite_is_healed(self, spark, tmp_path):
        """Same for overwrite(): live renamed to _trash but the staged
        table never swapped in — the whole-table backup restores."""
        wh = self._seed(spark, tmp_path)
        df = spark.createDataFrame([("x", 1)], "a string, b int")
        wh.overwrite(df, "trend")
        live = wh.root / "trend"
        trash = wh.root / "_trash" / ("trend__" + "c" * 32)
        trash.parent.mkdir(parents=True, exist_ok=True)
        live.rename(trash)
        assert not live.exists()
        df2 = spark.createDataFrame([("y", 2)], "a string, b int")
        # _gc_stale runs first: restores the backup, then the new
        # overwrite replaces it normally
        wh.overwrite(df2, "trend")
        got = {(r["a"], r["b"]) for r in wh.read(spark, "trend").collect()}
        assert got == {("y", 2)}
        assert not any((wh.root / "_trash").glob("trend__*"))

    def test_audit_expected_rows_mismatch_refuses_publish(self, spark, tmp_path):
        from inpe_queimadas_etl_spark.pipeline import PublishAuditError

        wh = self._seed(spark, tmp_path)
        tmp = wh._stage_dir("t")
        df = spark.createDataFrame(
            [("2024-05-03", 1, "a")], "day string, n int, v string"
        )
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")  # _SUCCESS marker
            .partitionBy("day")
            .parquet(str(tmp))
        )
        assert wh._audit_staged(tmp, "t", expected_rows=1)
        with pytest.raises(PublishAuditError):
            wh._audit_staged(tmp, "t", expected_rows=2)

    def test_crash_at_every_rename_position_is_recoverable(
        self, spark, tmp_path
    ):
        """Exhaustive crash matrix: kill the publish at EVERY rename in
        the swap sequence (old->trash and staged->live, both
        partitions). Every loop rename happens after the audit marker,
        so the next publish must roll the interrupted publish FORWARD:
        BOTH partitions read fully-new — cross-partition atomicity,
        not just per-partition (ADVICE r4 #1; r4 allowed a finalized
        old/new mix here)."""
        import pathlib

        real_rename = pathlib.Path.rename
        new = {
            "2024-05-01": {("2024-05-01", 99, "N1")},
            "2024-05-02": {("2024-05-02", 99, "N2")},
        }
        # a two-partition replace issues 4 renames (old->trash,
        # staged->live per partition); cover every failure position
        for fail_at in range(1, 5):
            wh = self._seed(spark, tmp_path, name=f"wap_crash_{fail_at}")
            df_new = spark.createDataFrame(
                [("2024-05-01", 99, "N1"), ("2024-05-02", 99, "N2")],
                "day string, n int, v string",
            )
            calls = {"n": 0}

            def exploding(pself, target, _real=real_rename, _c=calls, _f=fail_at):
                _c["n"] += 1
                if _c["n"] == _f:
                    raise OSError(f"simulated crash at rename #{_f}")
                return _real(pself, target)

            pathlib.Path.rename = exploding
            try:
                with pytest.raises(OSError):
                    wh.overwrite_partitions(df_new, "t", "day")
            finally:
                pathlib.Path.rename = real_rename

            # next publish (unrelated day) triggers recovery first
            wh.overwrite_partitions(
                spark.createDataFrame(
                    [("2024-05-03", 1, "x")], "day string, n int, v string"
                ),
                "t",
                "day",
            )
            rows = {
                (str(r["day"]), r["n"], r["v"])
                for r in wh.read(spark, "t").collect()
            }
            for day in ("2024-05-01", "2024-05-02"):
                got = {r for r in rows if r[0] == day}
                assert got == new[day], (
                    f"fail_at={fail_at} day={day}: expected rolled-"
                    f"forward (all-new) partition, got: {got}"
                )
            assert ("2024-05-03", 1, "x") in rows
            assert not any((wh.root / "_trash").glob("t__*"))
            assert not any((wh.root / "_tmp").glob("t__*"))

    def test_crash_during_rollforward_is_idempotent(self, spark, tmp_path):
        """A crash DURING recovery's roll-forward must leave a state
        the NEXT recovery completes — the _AUDITED marker survives
        until every staged partition has swapped in."""
        import pathlib

        real_rename = pathlib.Path.rename
        wh = self._seed(spark, tmp_path)
        df_new = spark.createDataFrame(
            [("2024-05-01", 99, "N1"), ("2024-05-02", 99, "N2")],
            "day string, n int, v string",
        )
        # first publish dies at rename #1 (old->trash of partition 1)
        calls = {"n": 0}

        def explode_at(n_fail, _c=calls):
            def exploding(pself, target):
                _c["n"] += 1
                if _c["n"] == n_fail:
                    raise OSError(f"simulated crash at rename #{n_fail}")
                return real_rename(pself, target)

            return exploding

        pathlib.Path.rename = explode_at(1)
        try:
            with pytest.raises(OSError):
                wh.overwrite_partitions(df_new, "t", "day")
        finally:
            pathlib.Path.rename = real_rename

        # second publish crashes INSIDE the roll-forward (its first
        # recovery rename)
        calls["n"] = 0
        pathlib.Path.rename = explode_at(1)
        try:
            with pytest.raises(OSError):
                wh.overwrite_partitions(
                    spark.createDataFrame(
                        [("2024-05-03", 1, "x")],
                        "day string, n int, v string",
                    ),
                    "t",
                    "day",
                )
        finally:
            pathlib.Path.rename = real_rename

        # third publish completes recovery, then its own write
        wh.overwrite_partitions(
            spark.createDataFrame(
                [("2024-05-03", 1, "x")], "day string, n int, v string"
            ),
            "t",
            "day",
        )
        rows = {
            (str(r["day"]), r["n"], r["v"])
            for r in wh.read(spark, "t").collect()
        }
        assert {r for r in rows if r[0] == "2024-05-01"} == {
            ("2024-05-01", 99, "N1")
        }
        assert {r for r in rows if r[0] == "2024-05-02"} == {
            ("2024-05-02", 99, "N2")
        }
        assert ("2024-05-03", 1, "x") in rows
        assert not any((wh.root / "_trash").glob("t__*"))
        assert not any((wh.root / "_tmp").glob("t__*"))

    def test_recovery_never_touches_prefix_named_sibling_tables(
        self, spark, tmp_path
    ):
        """r5 review: table 't' recovery must not roll forward or
        delete staging that belongs to table 't__archive' (whose dir
        names also start with 't__') — staged names are matched as
        <table>__<32-hex> exactly."""
        wh = self._seed(spark, tmp_path)
        other = spark.createDataFrame(
            [("2024-05-01", 1, "ARCH")], "day string, n int, v string"
        )
        # an interrupted, audited publish of the SIBLING table
        tmp = wh.root / "_tmp" / ("t__archive__" + "a" * 32)
        part = tmp / "day=2024-05-01"
        part.mkdir(parents=True)
        (tmp / "_AUDITED").touch()
        (tmp / "_SUCCESS").touch()
        (part / "x.parquet").write_bytes(b"sibling staged bytes")

        before = {
            (str(r["day"]), r["n"], r["v"])
            for r in wh.read(spark, "t").collect()
        }
        wh.overwrite_partitions(other, "t", "day")  # runs _gc_stale("t")
        after = {
            (str(r["day"]), r["n"], r["v"])
            for r in wh.read(spark, "t").collect()
        }
        # t's own publish applied; the sibling's staging is untouched
        assert ("2024-05-01", 1, "ARCH") in after
        assert after - before == {("2024-05-01", 1, "ARCH")} or (
            "2024-05-01",
            1,
            "ARCH",
        ) in after
        assert tmp.exists() and (part / "x.parquet").read_bytes() == (
            b"sibling staged bytes"
        )
        # and t__archive's own recovery still rolls ITS publish forward
        wh._gc_stale("t__archive")
        assert not tmp.exists()
        arch = wh.root / "t__archive" / "day=2024-05-01" / "x.parquet"
        assert arch.read_bytes() == b"sibling staged bytes"

    def test_unaudited_staging_is_never_published(self, spark, tmp_path):
        """A staged dir WITHOUT the _AUDITED marker (crash before or
        during audit) must be discarded, never rolled forward — the
        data never passed audit."""
        wh = self._seed(spark, tmp_path)
        before = {
            (str(r["day"]), r["n"], r["v"])
            for r in wh.read(spark, "t").collect()
        }
        tmp = wh.root / "_tmp" / ("t__" + "d" * 32)
        (tmp / "day=2024-05-01").mkdir(parents=True)
        (tmp / "day=2024-05-01" / "junk.parquet").write_bytes(b"not parquet")
        wh._gc_stale("t")
        after = {
            (str(r["day"]), r["n"], r["v"])
            for r in wh.read(spark, "t").collect()
        }
        assert after == before
        assert not (tmp.exists())

    def test_full_overwrite_swaps_whole_table(self, spark, tmp_path):
        wh = self._seed(spark, tmp_path)
        df = spark.createDataFrame([("x", 1)], "a string, b int")
        wh.overwrite(df, "trend")
        assert wh.read(spark, "trend").count() == 1
        df2 = spark.createDataFrame([("y", 2), ("z", 3)], "a string, b int")
        wh.overwrite(df2, "trend")
        got = {(r["a"], r["b"]) for r in wh.read(spark, "trend").collect()}
        assert got == {("y", 2), ("z", 3)}


def test_run_range_writes_validation_artifacts(spark, tmp_path, dims):
    """run_range leaves docs/validation_last_run.md + logs/last_run.json
    under the warehouse root (reference validate_marts.py:81-122,
    283-301), with the check results and last-day counts."""
    import json

    from inpe_queimadas_etl_spark.pipeline import run_range

    root = tmp_path / "wh_report"
    csv_path = str(tmp_path / "focos.csv")
    write_fixture_csv(csv_path, G.FOCOS_HEADER, G.FOCOS_ROWS, sep=";")
    wh = Warehouse(str(root))
    [result] = run_range(spark, wh, [(FILE_DATE, csv_path)], dims)

    md_path = root / "docs" / "validation_last_run.md"
    json_path = root / "logs" / "last_run.json"
    assert result["report_md"] == str(md_path)
    assert result["report_json"] == str(json_path)
    assert md_path.exists() and json_path.exists()

    md = md_path.read_text()
    assert "# validation last run" in md
    assert "mart_sums_consistent: ok" in md
    # the fixture intentionally carries one unattributable point
    # (12/13 = 92.3% < the reference's 99% floor), so the coverage
    # check — and therefore the overall status — reports fail
    assert "enrichment_coverage: fail" in md
    assert "- ok: false" in md
    assert "uf_day:" in md

    payload = json.loads(json_path.read_text())
    assert payload["ok"] is False
    names = {c["name"] for c in payload["check_results"]}
    assert names == {
        "mart_sums_consistent", "enrichment_coverage", "checked_flags",
    }
    assert "uf_rows" in payload["counts"]


def test_run_range_report_opt_out(spark, tmp_path, dims):
    from inpe_queimadas_etl_spark.pipeline import run_range

    root = tmp_path / "wh_noreport"
    csv_path = str(tmp_path / "focos2.csv")
    write_fixture_csv(csv_path, G.FOCOS_HEADER, G.FOCOS_ROWS, sep=";")
    wh = Warehouse(str(root))
    [result] = run_range(
        spark, wh, [(FILE_DATE, csv_path)], dims, write_report=False
    )
    assert "report_md" not in result
    assert not (root / "docs").exists()
