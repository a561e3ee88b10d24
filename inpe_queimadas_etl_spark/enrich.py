"""Spatial enrichment: curated focos -> enriched fact (J1-J4, J8).

The reference mutates `curated.inpe_focos_enriched` in place with SQL
UPDATEs and `*_checked` bookkeeping flags (sql/enrich/20,21). Spark
DataFrames are immutable, so the engine re-derives the enriched table
as a pure function of (curated, dims) per affected day and writes it
with dynamic partition overwrite — same outcome (first-match
attribution, stable under re-runs, checked flags all true after a
pass), no mutable state (SURVEY.md §7.1).

Attribution semantics preserved:
- municipality: point-in-polygon first (st_intersects,
  20_enrich_municipio.sql:43-54), then nearest-within-2km fallback
  (20:56-74);
- biome/UC/TI: first-match by dimension id — the reference's
  `distinct on (event_hash) ... order by event_hash, b.id`
  (21_enrich_biomas_ucs_tis.sql:22-119) — which is exactly the
  lowest-id-wins rule of operators.geo.point_in_polygon_join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.core import event_day
from .session import local_df
from .operators.geo import PolyFeature, knn_nearest_within, point_in_polygon_join


def _dim_lookup(spark, feats: list[PolyFeature], id_name: str, attr_map: dict[str, str]):
    """Small broadcastable DataFrame of polygon attributes."""
    rows = []
    seen = set()
    for f in feats:
        if f.poly_id in seen:
            continue
        seen.add(f.poly_id)
        vals = [f.props.get(src) for src in attr_map.values()]
        # the schema below declares every attr as string; prop values
        # may be numeric (e.g. area_km2 double from wkt.features_from_dim)
        rows.append(
            tuple([f.poly_id] + [None if v is None else str(v) for v in vals])
        )
    schema = ", ".join(
        [f"{id_name} string"] + [f"{dst} string" for dst in attr_map]
    )
    return local_df(spark, rows, T.StructType.fromDDL(schema))


def attribute_municipality(
    curated: DataFrame,
    municipios: list[PolyFeature],
    knn_radius_m: float = 2000.0,
) -> DataFrame:
    """J2 + J3: point-in-polygon municipality attribution with
    nearest-within-radius fallback for coastal/edge points."""
    spark = curated.sparkSession
    pip = point_in_polygon_join(
        curated, municipios, x_col="lon", y_col="lat", id_alias="mun_cd_mun"
    )
    matched = pip.filter(F.col("mun_cd_mun").isNotNull())
    unmatched = pip.filter(F.col("mun_cd_mun").isNull()).drop("mun_cd_mun")
    fallback = knn_nearest_within(
        unmatched,
        municipios,
        max_dist_m=knn_radius_m,
        x_col="lon",
        y_col="lat",
        id_alias="mun_cd_mun",
        dist_alias="__dist_m",
    ).drop("__dist_m")
    both = matched.unionByName(fallback)

    attrs = F.broadcast(
        _dim_lookup(
            spark,
            municipios,
            "mun_cd_mun",
            {"mun_nm_mun": "nm_mun", "mun_uf": "uf", "__area": "area_km2"},
        ).withColumn("mun_area_km2", F.col("__area").cast("double"))
        .drop("__area")
    )
    return both.join(attrs, "mun_cd_mun", "left").withColumn(
        "mun_checked", F.lit(True)
    )


def attribute_dim(
    df: DataFrame,
    feats: list[PolyFeature],
    id_alias: str,
    name_alias: str,
    name_prop: str,
    checked_alias: str,
) -> DataFrame:
    """J4/J8: first-match (lowest dim id) point-in-polygon attribution
    for biome/UC/TI; rows are marked checked even on miss
    (21_enrich_biomas_ucs_tis.sql:45-59)."""
    spark = df.sparkSession
    out = point_in_polygon_join(df, feats, x_col="lon", y_col="lat", id_alias=id_alias)
    attrs = F.broadcast(
        _dim_lookup(spark, feats, id_alias, {name_alias: name_prop})
    )
    return out.join(attrs, id_alias, "left").withColumn(checked_alias, F.lit(True))


def enrich(
    curated: DataFrame,
    municipios: list[PolyFeature],
    biomas: list[PolyFeature],
    ucs: list[PolyFeature],
    tis: list[PolyFeature],
    knn_radius_m: float = 2000.0,
) -> DataFrame:
    """Full enrichment pass: event day + municipality (PIP + KNN) +
    biome/UC/TI first-match attribution."""
    df = curated.withColumn("event_day", event_day("view_ts", "file_date"))
    df = attribute_municipality(df, municipios, knn_radius_m)
    df = attribute_dim(df, biomas, "cd_bioma", "bioma_enr", "bioma", "bioma_checked")
    df = attribute_dim(df, ucs, "cd_cnuc", "uc_nome", "nome_uc", "uc_checked")
    df = attribute_dim(df, tis, "terrai_cod", "ti_nome", "terrai_nom", "ti_checked")
    return df


def new_rows_only(curated_batch: DataFrame, existing: DataFrame | None) -> DataFrame:
    """J1/K1: idempotent append — keep only hashes not already loaded
    (left anti-join on event_hash; reference
    sql/enrich/20_enrich_municipio.sql:31-41, load/postgis.py:69-94)."""
    if existing is None:
        return curated_batch
    return curated_batch.join(
        existing.select("event_hash"), "event_hash", "left_anti"
    )
