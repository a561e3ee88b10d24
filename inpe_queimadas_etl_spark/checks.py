"""Assertion check suites over DataFrames (reference §5).

Mirrors the reference's layered runtime validation: SQL assertion
checks (sql/checks/*.sql), per-day pipeline invariants
(src/etl/backfill.py:69-135), and the operational check report
(src/etl/checks.py:41-127). Each check returns a dict with
``ok`` plus measured values, and ``run_checks`` aggregates them.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_counts_match(raw_n: int, curated_n: int) -> dict:
    """backfill.py:97-101: raw count == curated count per day."""
    return {
        "name": "raw_equals_curated",
        "ok": raw_n == curated_n,
        "raw": raw_n,
        "curated": curated_n,
    }


def check_mart_consistency(
    daily_mun: DataFrame, daily_uf: DataFrame, enriched: DataFrame
) -> dict:
    """backfill.py:111-123: sum(marts_mun) == sum(marts_uf) ==
    enriched rows with municipality."""
    s_mun = daily_mun.agg(F.coalesce(F.sum("n_focos"), F.lit(0))).collect()[0][0]
    s_uf = daily_uf.agg(F.coalesce(F.sum("n_focos"), F.lit(0))).collect()[0][0]
    with_mun = enriched.filter(F.col("mun_cd_mun").isNotNull()).count()
    return {
        "name": "mart_sums_consistent",
        "ok": int(s_mun) == int(s_uf) == int(with_mun),
        "sum_mun": int(s_mun),
        "sum_uf": int(s_uf),
        "enriched_with_mun": int(with_mun),
    }


def check_enrichment_coverage(
    enriched: DataFrame,
    min_mun_ratio: float = 0.99,
    min_bioma_ratio: float = 0.90,
) -> dict:
    """sql/checks/040_enriched_full_coverage.sql:23-43: >=99% rows
    attributed to a municipality, >=90% to a biome."""
    row = enriched.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("mun_cd_mun").isNotNull(), 1).otherwise(0)).alias("n_mun"),
        F.sum(F.when(F.col("cd_bioma").isNotNull(), 1).otherwise(0)).alias("n_bio"),
    ).collect()[0]
    n = row["n"] or 0
    mun_ratio = (row["n_mun"] or 0) / n if n else 1.0
    bio_ratio = (row["n_bio"] or 0) / n if n else 1.0
    return {
        "name": "enrichment_coverage",
        "ok": mun_ratio >= min_mun_ratio and bio_ratio >= min_bioma_ratio,
        "mun_ratio": round(mun_ratio, 4),
        "bioma_ratio": round(bio_ratio, 4),
    }


def check_choropleth_complete(
    dense_choro: DataFrame, expected_ufs: int
) -> dict:
    """sql/checks/010_superset_uf_choropleth.sql: exactly N UFs
    present, no null values after zero-fill."""
    n = dense_choro.count()
    nulls = dense_choro.filter(F.col("n_focos").isNull()).count()
    return {
        "name": "choropleth_complete",
        "ok": n == expected_ufs and nulls == 0,
        "rows": n,
        "nulls": nulls,
        "expected": expected_ufs,
    }


def check_checked_flags(enriched: DataFrame) -> dict:
    """sql/enrich/21:54-59 outcome: after an enrich pass every row is
    marked checked for every dimension, hit or miss."""
    row = enriched.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.when(F.col(c), 0).otherwise(1)).alias(c)
            for c in ("mun_checked", "bioma_checked", "uc_checked", "ti_checked")
        ],
    ).collect()[0]
    bad = sum(row[c] or 0 for c in ("mun_checked", "bioma_checked", "uc_checked", "ti_checked"))
    return {"name": "checked_flags", "ok": bad == 0, "unchecked_rows": int(bad)}


def check_uf_polycoords_superset(polycoords: DataFrame, expected_ufs: int) -> dict:
    """sql/checks/010 check A: exactly N UFs in the polycoords MV (27
    in production; the fixture count here), none with a null ring."""
    n = polycoords.count()
    nulls = polycoords.filter(F.col("poly_coords").isNull()).count()
    return {
        "name": "uf_polycoords_superset",
        "ok": n == expected_ufs and nulls == 0,
        "rows": n,
        "nulls": nulls,
        "expected": expected_ufs,
    }


def check_chart_uf_days(
    chart_uf: DataFrame, daily_uf: DataFrame, expected_ufs: int
) -> dict:
    """sql/checks/010 checks B-D over the UF choropleth chart view:
    every day carries exactly N UF rows (B), poly_coords never null
    (C), and the view's latest-day total equals the mart table's (D)."""
    bad_days = (
        chart_uf.groupBy("day")
        .count()
        .filter(F.col("count") != expected_ufs)
        .count()
    )
    nulls = chart_uf.filter(F.col("poly_coords").isNull()).count()
    last_day = daily_uf.agg(F.max("day")).collect()[0][0]
    sum_tbl = (
        daily_uf.filter(F.col("day") == last_day)
        .agg(F.coalesce(F.sum("n_focos"), F.lit(0)))
        .collect()[0][0]
    )
    sum_view = (
        chart_uf.filter(F.col("day") == last_day)
        .agg(F.coalesce(F.sum("n_focos"), F.lit(0)))
        .collect()[0][0]
    )
    return {
        "name": "chart_uf_days",
        "ok": bad_days == 0 and nulls == 0 and int(sum_tbl) == int(sum_view),
        "bad_days": int(bad_days),
        "null_polycoords": int(nulls),
        "last_day": str(last_day),
        "sum_table": int(sum_tbl),
        "sum_view": int(sum_view),
    }


def check_mun_polycoords(chart_mun: DataFrame) -> dict:
    """sql/checks/020 + 060 over the municipality choropleth chart
    view: the latest day has >= 1 municipality, zero null poly_coords,
    and the viz column populated."""
    last_day = chart_mun.agg(F.max("day")).collect()[0][0]
    last = chart_mun.filter(F.col("day") == last_day)
    n_mun = last.select("cd_mun").distinct().count()
    nulls = last.filter(F.col("poly_coords").isNull()).count()
    n_viz = last.filter(F.col("n_focos_viz").isNotNull()).count()
    return {
        "name": "mun_polycoords",
        "ok": n_mun >= 1 and nulls == 0 and n_viz >= 1,
        "last_day": str(last_day),
        "distinct_mun": int(n_mun),
        "null_polycoords": int(nulls),
        "viz_rows": int(n_viz),
    }


# Tables a fully-run warehouse must carry — the Spark analog of the
# reference's REQUIRED_SQL_FILES manifest (validate_repo.py:25-53: its
# SQL files ARE its executable surface; here the surface is the
# registered query suite plus these materialized tables).
REQUIRED_TABLES = (
    "curated_focos",
    "enriched_focos",
    "focos_diario_municipio",
    "focos_diario_uf",
    "focos_diario_bioma",
    "focos_diario_uc",
    "focos_diario_ti",
    "focos_mensal_municipio",
    "focos_mensal_uf",
    "mv_focos_day_dim",
    "focos_diario_uf_trend",
)


def validate_repo_structure() -> dict:
    """Structural self-validation of the ENGINE (reference
    validate_repo.py:25-53 + scripts/smoke.ps1 preflight): the suite
    registry holds exactly the 50 declared queries, every query has an
    oracle, and the driver entry module exposes the full contract.
    Driver-side only; no SparkSession needed."""
    failures: list[str] = []
    n_queries = n_oracles = 0
    q: dict = {}
    try:
        from .suite import all_oracles, all_queries

        q, o = all_queries(), all_oracles()
        n_queries, n_oracles = len(q), len(o)
        if n_queries != 50:
            failures.append(f"registry size {n_queries} != 50")
        missing = sorted(set(q) - set(o))
        if missing:
            failures.append(f"queries without oracle: {missing}")
    except Exception as ex:  # pragma: no cover - import-time breakage
        failures.append(f"suite import failed: {ex}")
    try:
        import importlib

        entry = importlib.import_module("__spark_entry__")
        for fn in ("entry", "queries", "oracle_sql"):
            if not callable(getattr(entry, fn, None)):
                failures.append(f"__spark_entry__.{fn} missing")
    except ImportError as ex:
        if getattr(ex, "name", None) == "__spark_entry__":
            # module absent: running outside the repo root is fine for
            # library users
            pass
        else:
            # the entry module EXISTS but failed importing something —
            # exactly the breakage this check reports (ADVICE r4 #2)
            failures.append(f"__spark_entry__ import failed: {ex!r}")
    except Exception as ex:
        # SyntaxError / AttributeError / anything else at import time
        # is a structural failure, not a crash of validate-repo
        failures.append(f"__spark_entry__ import failed: {ex!r}")
    if q:
        # bench integrity: a renamed/removed registry query must not
        # silently vanish from the headline benchmark (bench.py also
        # raises at runtime; this catches it without a Spark session)
        try:
            import bench as bench_mod

            from pathlib import Path as _Path

            repo_root = _Path(__file__).resolve().parent.parent
            mod_file = getattr(bench_mod, "__file__", None)
            if (
                mod_file is None
                or _Path(mod_file).resolve().parent != repo_root
            ):
                # an unrelated installed package named 'bench' (e.g.
                # the frappe CLI) — not our harness; the check would
                # be vacuously green, so skip it like module-absent
                raise ModuleNotFoundError("foreign bench", name="bench")
            extra = set(getattr(bench_mod, "UNREGISTERED", ()))
            missing_bench = [
                h
                for h in getattr(bench_mod, "HEADLINE", ())
                if h not in q and h not in extra
            ]
            if missing_bench:
                failures.append(
                    "bench HEADLINE entries missing from registry: "
                    f"{missing_bench}"
                )
        except ImportError as ex:
            if getattr(ex, "name", None) != "bench":
                failures.append(f"bench import failed: {ex!r}")
            # bench.py absent: running outside the repo root is fine
        except Exception as ex:
            failures.append(f"bench import failed: {ex!r}")
    return {
        "name": "repo_structure",
        "ok": not failures,
        "n_queries": n_queries,
        "n_oracles": n_oracles,
        "failures": failures,
    }


def validate_warehouse_layout(spark, warehouse) -> dict:
    """Warehouse-side structural validation (the analog of the
    reference's required-SQL-files walk, run against the data layer):
    every REQUIRED_TABLE exists, reads, and has a non-empty schema,
    and no staged write was left behind in _tmp/_trash (a leftover
    means an interrupted publish — the WAP invariant)."""
    missing, unreadable = [], []
    for table in REQUIRED_TABLES:
        if not warehouse.exists(table):
            missing.append(table)
            continue
        try:
            df = warehouse.read(spark, table)
            if not df.schema.fields:
                unreadable.append(table)
        except Exception:
            unreadable.append(table)
    leftovers = []
    for area in ("_tmp", "_trash"):
        base = warehouse.root / area
        if base.exists():
            leftovers.extend(str(p.name) for p in base.iterdir())
    return {
        "name": "warehouse_layout",
        "ok": not missing and not unreadable and not leftovers,
        "tables_checked": len(REQUIRED_TABLES),
        "missing": missing,
        "unreadable": unreadable,
        "staged_leftovers": leftovers,
    }


def run_checks(checks: list[dict]) -> dict:
    """Aggregate check results into a report (validate_marts.py:81-122
    analog)."""
    return {
        "ok": all(c["ok"] for c in checks),
        "generated_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "checks": checks,
    }


def render_report_md(report: dict, counts: dict) -> str:
    """The docs/validation_last_run.md body (validate_marts.py:81-122):
    timestamp, one line per check with its measured values, the
    last-day counts, and the overall status."""
    lines = [
        "# validation last run",
        "",
        f"timestamp_utc: {report['generated_at']}",
        "",
        "check_results:",
    ]
    for c in report["checks"]:
        status = "ok" if c["ok"] else "fail"
        detail = ", ".join(
            f"{k}={v}" for k, v in c.items() if k not in ("name", "ok")
        )
        suffix = f" | {detail}" if detail else ""
        lines.append(f"- {c['name']}: {status}{suffix}")
    lines += ["", "last_day_counts:"]
    for k, v in counts.items():
        lines.append(f"- {k}: {v}")
    lines += [
        "",
        "status:",
        "- ok: " + ("true" if report["ok"] else "false"),
        "",
    ]
    return "\n".join(lines)


def write_run_report(
    report: dict, counts: dict, docs_dir, logs_dir
) -> tuple[str, str]:
    """Write the two run artifacts the reference leaves behind
    (validate_marts.py:81-122 writes docs/validation_last_run.md;
    :283-301 writes logs/last_run.json). Returns both paths."""
    import json
    from pathlib import Path

    docs = Path(docs_dir)
    logs = Path(logs_dir)
    docs.mkdir(parents=True, exist_ok=True)
    logs.mkdir(parents=True, exist_ok=True)

    md_path = docs / "validation_last_run.md"
    md_path.write_text(render_report_md(report, counts), encoding="utf-8")

    payload = {
        "timestamp_utc": report["generated_at"],
        "ok": report["ok"],
        "check_results": report["checks"],
        "counts": {k: str(v) for k, v in counts.items()},
    }
    json_path = logs / "last_run.json"
    json_path.write_text(json.dumps(payload, indent=2), encoding="utf-8")
    return str(md_path), str(json_path)
