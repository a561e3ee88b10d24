"""Explicit StructTypes for every layer table (SURVEY.md §1).

The reference fixes DDL per layer (src/etl/load/postgis.py:26-67,
sql/ref/01_ref_schema.sql, sql/marts/*.sql); inference happens only at
CSV ingest. Mirrored here: every persisted table has an explicit
schema; the CSV reader loads all-string and the transform casts.
"""

from __future__ import annotations

from pyspark.sql import types as T

# curated.inpe_focos (load/postgis.py:51-66) — typed subset of raw,
# keyed by event_hash; props preserves the full original row as JSON.
CURATED_FOCOS = T.StructType(
    [
        T.StructField("event_hash", T.StringType(), False),
        T.StructField("file_date", T.DateType(), False),
        T.StructField("view_ts", T.StringType(), True),
        T.StructField("satelite", T.StringType(), True),
        T.StructField("municipio", T.StringType(), True),
        T.StructField("estado", T.StringType(), True),
        T.StructField("bioma", T.StringType(), True),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

# curated.inpe_focos_enriched (sql/enrich/20:4-29 + 21:8-19)
ENRICHED_FOCOS = T.StructType(
    CURATED_FOCOS.fields
    + [
        T.StructField("event_day", T.DateType(), True),
        T.StructField("mun_cd_mun", T.StringType(), True),
        T.StructField("mun_nm_mun", T.StringType(), True),
        T.StructField("mun_uf", T.StringType(), True),
        T.StructField("mun_area_km2", T.DoubleType(), True),
        T.StructField("mun_checked", T.BooleanType(), True),
        T.StructField("cd_bioma", T.StringType(), True),
        T.StructField("bioma_enr", T.StringType(), True),
        T.StructField("bioma_checked", T.BooleanType(), True),
        T.StructField("cd_cnuc", T.StringType(), True),
        T.StructField("uc_nome", T.StringType(), True),
        T.StructField("uc_checked", T.BooleanType(), True),
        T.StructField("terrai_cod", T.StringType(), True),
        T.StructField("ti_nome", T.StringType(), True),
        T.StructField("ti_checked", T.BooleanType(), True),
    ]
)

# ref.ibge_municipios (sql/ref/01_ref_schema.sql:7-30) — geometry kept
# as a WKT-ish ring array string; see operators/geo.py
MUNICIPIOS = T.StructType(
    [
        T.StructField("cd_mun", T.StringType(), False),
        T.StructField("nm_mun", T.StringType(), True),
        T.StructField("uf", T.StringType(), True),
        T.StructField("area_km2", T.DoubleType(), True),
        T.StructField("geom_wkt", T.StringType(), True),
    ]
)

UF_AREA = T.StructType(
    [
        T.StructField("uf", T.StringType(), False),
        T.StructField("area_km2", T.DoubleType(), True),
    ]
)

BIOMA_DIM = T.StructType(
    [
        T.StructField("cd_bioma", T.StringType(), False),
        T.StructField("bioma", T.StringType(), True),
        T.StructField("geom_wkt", T.StringType(), True),
    ]
)

UC_DIM = T.StructType(
    [
        T.StructField("cd_cnuc", T.StringType(), False),
        T.StructField("nome_uc", T.StringType(), True),
        T.StructField("geom_wkt", T.StringType(), True),
    ]
)

TI_DIM = T.StructType(
    [
        T.StructField("terrai_cod", T.StringType(), False),
        T.StructField("terrai_nom", T.StringType(), True),
        T.StructField("geom_wkt", T.StringType(), True),
    ]
)
