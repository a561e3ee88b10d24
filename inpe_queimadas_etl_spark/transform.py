"""CSV -> curated transform (reference P1-P9).

Re-expresses src/etl/transform/inpe_focos_diario.py:81-186 as a Spark
pipeline:

- column normalization + fuzzy resolution happen driver-side over
  ``df.columns`` (P1/P2);
- decimal-comma casts and coordinate filters are JVM expressions
  (P3-P5), so predicate pushdown and codegen apply;
- row canonicalization — value cleansing (P6), the MD5 event hash over
  the canonical JSON payload (P7), and the props JSON serialization
  (P9) — runs in ONE Arrow-batched mapInPandas pass using the same
  json.dumps/hashlib calls as the reference, so hashes and props are
  byte-identical to the reference implementation;
- first-row-per-hash dedup (P8) uses the CSV row order captured
  before any shuffle, so the kept row matches the reference's
  seen-set semantics deterministically (SURVEY.md §7.2).

At scale: one linear scan, no shuffle except the final per-hash
window; the pandas stage is Arrow-batched (not per-row Python).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import json
import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.core import decimal_comma_to_double, find_col, normalize_columns
from .schemas import CURATED_FOCOS

_ROW_ID = "__row_id"


def resolve_focos_columns(columns: list[str]) -> dict[str, str | None]:
    """Fuzzy column resolution for the INPE daily CSV (P2,
    transform/inpe_focos_diario.py:93-103)."""
    lat = find_col(columns, ["lat", "latitude"], ["lat"])
    lon = find_col(columns, ["lon", "long", "longitude"], ["lon", "long"])
    if not lat or not lon:
        raise ValueError(f"lat/lon columns not found in: {columns[:80]}")
    return {
        "lat": lat,
        "lon": lon,
        "ts": find_col(
            columns, ["datahora", "data_hora_gmt", "data_hora"], ["datahora", "hora", "gmt"]
        ),
        "sat": find_col(columns, ["satelite"], ["satel"]),
        "mun": find_col(columns, ["municipio"], ["municip"]),
        "uf": find_col(columns, ["estado", "uf"], ["estado", "uf"]),
        "bio": find_col(columns, ["bioma"], ["bioma"]),
    }


def _clean_value(v):
    """P6 (transform/inpe_focos_diario.py:43-59)."""
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    if isinstance(v, str) and v.strip().lower() in ("nan", "na", "null", "none", ""):
        return None
    return v


def _json_safe(d: dict) -> str:
    """P9 (transform/inpe_focos_diario.py:62-64): json.dumps with
    ensure_ascii=False, default=str, allow_nan=False — the reference's
    exact serialization, so props/payload bytes match."""
    return json.dumps(d, ensure_ascii=False, default=str, allow_nan=False)


def curated_from_raw(raw: DataFrame, file_date: dt.date) -> DataFrame:
    """All-string raw CSV DataFrame -> curated focos records.

    ``raw`` must be read with header=True and string-typed columns
    (sources/csv_ingest.py). Returns the CURATED_FOCOS schema.
    """
    df = normalize_columns(raw)
    cols = resolve_focos_columns(df.columns)
    prop_cols = list(df.columns)

    # P3-P5: numeric cast + coordinate validation, JVM-side
    df = (
        df.withColumn("__lat", decimal_comma_to_double(cols["lat"]))
        .withColumn("__lon", decimal_comma_to_double(cols["lon"]))
        .filter(F.col("__lat").isNotNull() & F.col("__lon").isNotNull())
        .filter(F.col("__lat").between(-90, 90) & F.col("__lon").between(-180, 180))
        .withColumn(_ROW_ID, F.monotonically_increasing_id())
    )

    out_schema = (
        "event_hash string, view_ts string, satelite string, municipio string,"
        " estado string, bioma string, lat double, lon double, props string,"
        f" {_ROW_ID} long"
    )
    file_date_str = str(file_date)
    lat_col, lon_col = cols["lat"], cols["lon"]
    ts_col, sat_col = cols["ts"], cols["sat"]
    mun_col, uf_col, bio_col = cols["mun"], cols["uf"], cols["bio"]

    def canonicalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict(orient="records"):
                props = {k: _clean_value(rec[k]) for k in prop_cols}
                lat = float(rec["__lat"])
                lon = float(rec["__lon"])
                props[lat_col] = lat
                props[lon_col] = lon
                view_ts = props.get(ts_col) if ts_col else None
                sat = props.get(sat_col) if sat_col else None
                # P7 payload: key order and 6-dp rounding are part of
                # the hash contract (transform/inpe_focos_diario.py:156-164)
                payload = {
                    "file_date": file_date_str,
                    "lat": round(lat, 6),
                    "lon": round(lon, 6),
                    "view_ts": view_ts,
                    "satelite": sat,
                }
                event_hash = hashlib.md5(
                    _json_safe(payload).encode("utf-8")
                ).hexdigest()
                rows.append(
                    {
                        "event_hash": event_hash,
                        "view_ts": view_ts,
                        "satelite": sat,
                        "municipio": props.get(mun_col) if mun_col else None,
                        "estado": props.get(uf_col) if uf_col else None,
                        "bioma": props.get(bio_col) if bio_col else None,
                        "lat": lat,
                        "lon": lon,
                        "props": _json_safe(props),
                        _ROW_ID: rec[_ROW_ID],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_hash",
                    "view_ts",
                    "satelite",
                    "municipio",
                    "estado",
                    "bioma",
                    "lat",
                    "lon",
                    "props",
                    _ROW_ID,
                ],
            )

    canonical = df.mapInPandas(canonicalize, schema=out_schema)

    # P8: keep the first file row per hash
    w = Window.partitionBy("event_hash").orderBy(F.asc(_ROW_ID))
    deduped = (
        canonical.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", _ROW_ID)
    )
    return deduped.withColumn(
        "file_date", F.lit(file_date_str).cast("date")
    ).select([f.name for f in CURATED_FOCOS.fields])
