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


def run_checks(checks: list[dict]) -> dict:
    """Aggregate check results into a report (validate_marts.py:81-122
    analog)."""
    return {
        "ok": all(c["ok"] for c in checks),
        "generated_at": dt.datetime.now(dt.timezone.utc).isoformat(),
        "checks": checks,
    }
