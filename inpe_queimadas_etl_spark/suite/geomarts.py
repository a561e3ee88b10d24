"""Geometry prep + geometry-bearing mart suite: the dissolve ->
mainland -> no-holes -> poly_coords chain (A7, W2-on-geometry,
sqlm/marts/prereq/010-030), the choropleth chart views with geometry
(J6/J7, sqlm/marts/canonical/040,050), st_extent bounds, and the
/api/geo QA metrics pipeline (api/app/main.py:665-800) — all checked
against closed-form DuckDB oracles.

Fixture: 1-degree grid-cell "municipalities" (x in [0,6), y in [0,2))
tiled into three "UFs" by x band (U0/U1/U2, 2x2 cells each). Because
the cells tile each UF exactly, the dissolved UF boundary is the band
rectangle's perimeter lattice ring, and every geometry output
(poly_coords string, bbox, area, vertex counts) is statable in closed
form. The Spark/driver side runs the REAL operators
(operators/geometry.py dissolve/simplify/canonicalize, geoprep chain);
the oracle never touches them.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geo import make_polygon
from ..operators.geometry import _DEG_M
from ..session import load_table, local_df
from . import query

# --- fixture ---------------------------------------------------------------

_NX, _NY = 6, 2  # 1-degree cells
_UF_W = 2  # cells per UF band


def _cells():
    cells = []
    for ix in range(_NX):
        for iy in range(_NY):
            ring = [
                (ix, iy),
                (ix + 1, iy),
                (ix + 1, iy + 1),
                (ix, iy + 1),
                (ix, iy),
            ]
            cells.append(
                make_polygon(
                    f"m_{ix}_{iy}",
                    ring,
                    uf=f"U{ix // _UF_W}",
                    nm_mun=f"Cell {ix}-{iy}",
                    area_km2=1.0,
                )
            )
    return cells


def _rect_perimeter_json(x0: int, y0: int, x1: int, y1: int) -> str:
    """Closed-form lattice-perimeter ring of an integer rect, CCW from
    (x0, y0), 1-degree steps — exactly what edge-cancellation dissolve
    of the unit-cell tiling leaves (no interior simplification). This
    helper is the ORACLE's statement of the expected ring; it shares
    no code with operators/geometry.py."""
    pts = []
    pts += [(x, y0) for x in range(x0, x1)]
    pts += [(x1, y) for y in range(y0, y1)]
    pts += [(x, y1) for x in range(x1, x0, -1)]
    pts += [(x0, y) for y in range(y1, y0, -1)]
    pts.append((x0, y0))
    body = ",".join(f"[{float(x):.1f},{float(y):.1f}]" for x, y in pts)
    return f"[[{body}]]"


def _cell_json(ix: int, iy: int) -> str:
    return _rect_perimeter_json(ix, iy, ix + 1, iy + 1)


_UF_POLY = {
    f"U{k}": _rect_perimeter_json(k * _UF_W, 0, (k + 1) * _UF_W, _NY)
    for k in range(_NX // _UF_W)
}

# day + uf derived from events arithmetically (both engines):
# x = (value % 60) / 10.0 in [0, 6); uf = 'U' || floor(x / 2)
_PTS_SQL = """
    SELECT CAST(ts AS DATE) AS day,
           'U' || CAST(CAST(floor(((value % 60) / 10.0) / 2.0) AS INTEGER) AS VARCHAR) AS uf
    FROM events
"""


def _daily_uf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = (F.col("value") % 60) / 10.0
    return (
        ev.select(
            F.to_date("ts").alias("day"),
            F.concat(F.lit("U"), F.floor(x / 2.0).cast("int").cast("string")).alias(
                "uf"
            ),
        )
        .groupBy("day", "uf")
        .agg(F.count("*").alias("n_focos"))
    )


def _uf_values_sql() -> str:
    vals = ", ".join(
        f"('{uf}', '{poly}')" for uf, poly in sorted(_UF_POLY.items())
    )
    return f"(VALUES {vals}) AS u(uf, poly_coords)"


@query(
    "geo4_uf_choropleth_day",
    oracle=f"""
    WITH pts AS ({_PTS_SQL}),
    agg AS (
        SELECT day, uf, CAST(count(*) AS BIGINT) AS n FROM pts GROUP BY 1, 2
    ),
    days AS (SELECT DISTINCT day FROM pts)
    SELECT d.day, u.uf,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_focos,
           CASE WHEN coalesce(a.n, 0) = 0 THEN 0.000001
                ELSE CAST(a.n AS DOUBLE) END AS n_focos_viz,
           u.poly_coords
    FROM days d
    CROSS JOIN {_uf_values_sql()}
    LEFT JOIN agg a ON a.day = d.day AND a.uf = u.uf
    """,
)
def geo4_uf_choropleth_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full UF geometry chain (simplify -> dissolve -> mainland ->
    no-holes -> canonical poly_coords; geoprep.build_uf_geo_chain) +
    the days x UFs zero-filled choropleth chart view (J7 + geometry,
    sqlm/marts/canonical/040). The oracle states the dissolved band
    perimeters as literal lattice rings."""
    from ..geoprep import (
        build_uf_geo_chain,
        uf_polycoords_df,
        v_chart_uf_choropleth_day,
    )

    coords = build_uf_geo_chain(_cells())
    pc = uf_polycoords_df(spark, coords)
    # the chart view consumes daily_uf twice (distinct days + the left
    # join); in the real pipeline that input is a materialized mart, so
    # materialize the 90-row agg here too instead of re-scanning events
    daily = _daily_uf(spark, sf_dir).localCheckpoint(eager=True)
    return v_chart_uf_choropleth_day(daily, pc)


@query(
    "geo5_uf_bounds",
    oracle=f"""
    SELECT uf,
           CAST(x0 AS DOUBLE) AS minx, CAST(0 AS DOUBLE) AS miny,
           CAST(x0 + {_UF_W} AS DOUBLE) AS maxx, CAST({_NY} AS DOUBLE) AS maxy,
           CAST({_NY} / 2.0 AS DOUBLE) AS center_lat,
           CAST(x0 + {_UF_W} / 2.0 AS DOUBLE) AS center_lon
    FROM (VALUES ('U0', 0), ('U1', 2), ('U2', 4)) AS t(uf, x0)
    """,
)
def geo5_uf_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/api/bounds' st_extent as a Spark plan (main.py:897-922): parse
    the emitted poly_coords JSON, explode rings to vertices, min/max
    per UF, center = bbox midpoint ([lat, lon] order)."""
    from ..geoprep import build_uf_geo_chain, uf_polycoords_df

    pc = uf_polycoords_df(spark, build_uf_geo_chain(_cells()))
    pts = (
        pc.select(
            "uf",
            F.explode(
                F.from_json("poly_coords", "array<array<array<double>>>")
            ).alias("ring"),
        )
        .select("uf", F.explode("ring").alias("pt"))
        .select(
            "uf",
            F.col("pt").getItem(0).alias("x"),
            F.col("pt").getItem(1).alias("y"),
        )
    )
    agg = pts.groupBy("uf").agg(
        F.min("x").alias("minx"),
        F.min("y").alias("miny"),
        F.max("x").alias("maxx"),
        F.max("y").alias("maxy"),
    )
    return agg.select(
        "uf",
        "minx",
        "miny",
        "maxx",
        "maxy",
        ((F.col("miny") + F.col("maxy")) / 2.0).alias("center_lat"),
        ((F.col("minx") + F.col("maxx")) / 2.0).alias("center_lon"),
    )


# --- geo6: /api/geo QA metrics on a multi-part + holed fixture -------------
#
# Key 'A': 3x3 unit cells at [0,3)x[0,3) minus the center cell (so the
# union is a 3x3 ring-with-hole), plus an island cell at [10,0). 9
# parts before union, 2 after; union boundary: 12-edge exterior ring
# (13 pts), 4-edge hole (5 pts), 4-edge island (5 pts) = 23 points.
# Key 'B': one unit cell at [20,0): 1 part, 5 points.
# Simplify (tol 300 m) drops the collinear lattice vertices: A -> 5+5+5
# = 15 points, B -> 5. Areas are exact shoelace * equirect scaling at
# each ring's bbox mid-lat; all stated arithmetically in the oracle.


def _geo6_feats():
    feats = []
    for ix in range(3):
        for iy in range(3):
            if (ix, iy) == (1, 1):
                continue
            ring = [(ix, iy), (ix + 1, iy), (ix + 1, iy + 1), (ix, iy + 1), (ix, iy)]
            feats.append(make_polygon("A", ring, label="São Geral"))
    feats.append(
        make_polygon("A", [(10, 0), (11, 0), (11, 1), (10, 1), (10, 0)],
                     label="São Geral")
    )
    feats.append(
        make_polygon("B", [(20, 0), (21, 0), (21, 1), (20, 1), (20, 0)])
    )
    # Key 'C': an INVALID bowtie (self-intersecting at (31, 1)).
    # st_makevalid splits it into two unit triangles (mid-lat 1 deg):
    # 1 part before, 2 after, 4+4 = 8 points, area 2*deg_m^2*cos(1deg),
    # bbox (30,0,32,2) -> bbox_ratio = 4cos(1)/2cos(1) = 2.
    feats.append(
        make_polygon("C", [(30, 0), (32, 2), (32, 0), (30, 2), (30, 0)])
    )
    return feats


_GEO6_SCHEMA = (
    "key string, n_parts long, npoints_before long, npoints_out long, "
    "area_km2_before double, area_km2_after double, minx double, miny double, "
    "maxx double, maxy double, bbox_ratio double, warning boolean, "
    "valid_before boolean, valid_after boolean"
)


@query(
    "geo6_geo_qa_metrics",
    oracle=f"""
    WITH m AS (SELECT pi() / 180 * 6371008.8 AS deg_m)
    SELECT 'A' AS key,
           CAST(9 AS BIGINT) AS n_parts,
           CAST(23 AS BIGINT) AS npoints_before,
           CAST(15 AS BIGINT) AS npoints_out,
           round((9.0 * cos(radians(1.5)) - 1.0 * cos(radians(1.5))
                  + 1.0 * cos(radians(0.5))) * deg_m * deg_m / 1000000.0, 3)
               AS area_km2_before,
           round((9.0 * cos(radians(1.5)) - 1.0 * cos(radians(1.5))
                  + 1.0 * cos(radians(0.5))) * deg_m * deg_m / 1000000.0, 3)
               AS area_km2_after,
           CAST(0 AS DOUBLE) AS minx, CAST(0 AS DOUBLE) AS miny,
           CAST(11 AS DOUBLE) AS maxx, CAST(3 AS DOUBLE) AS maxy,
           round((11.0 * deg_m * cos(radians(1.5))) * (3.0 * deg_m)
                 / ((9.0 * cos(radians(1.5)) - 1.0 * cos(radians(1.5))
                     + 1.0 * cos(radians(0.5))) * deg_m * deg_m), 4)
               AS bbox_ratio,
           FALSE AS warning,
           TRUE AS valid_before, TRUE AS valid_after
    FROM m
    UNION ALL
    SELECT 'B',
           CAST(1 AS BIGINT), CAST(5 AS BIGINT), CAST(5 AS BIGINT),
           round(1.0 * cos(radians(0.5)) * deg_m * deg_m / 1000000.0, 3),
           round(1.0 * cos(radians(0.5)) * deg_m * deg_m / 1000000.0, 3),
           CAST(20 AS DOUBLE), CAST(0 AS DOUBLE),
           CAST(21 AS DOUBLE), CAST(1 AS DOUBLE),
           round((1.0 * deg_m * cos(radians(0.5))) * (1.0 * deg_m)
                 / (1.0 * cos(radians(0.5)) * deg_m * deg_m), 4),
           FALSE, TRUE, TRUE
    FROM m
    UNION ALL
    -- 'C' is an input BOWTIE: st_makevalid runs before the before-
    -- metrics (main.py:700-710), so both validity flags read TRUE and
    -- every number describes the repaired two-triangle multipolygon.
    SELECT 'C',
           CAST(1 AS BIGINT), CAST(8 AS BIGINT), CAST(8 AS BIGINT),
           round(2.0 * cos(radians(1.0)) * deg_m * deg_m / 1000000.0, 3),
           round(2.0 * cos(radians(1.0)) * deg_m * deg_m / 1000000.0, 3),
           CAST(30 AS DOUBLE), CAST(0 AS DOUBLE),
           CAST(32 AS DOUBLE), CAST(2 AS DOUBLE),
           round((2.0 * deg_m * cos(radians(1.0))) * (2.0 * deg_m)
                 / (2.0 * cos(radians(1.0)) * deg_m * deg_m), 4),
           FALSE, TRUE, TRUE
    FROM m
    """,
)
def geo6_geo_qa_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """/api/geo QA pipeline (union -> simplify -> metrics,
    geoqueries.geo_shape_metrics; main.py:665-800) on a multi-part,
    holed fixture. The real dissolve/simplify operators produce the
    metrics; the oracle re-derives every number arithmetically from
    the fixture rectangles."""
    from ..geoqueries import geo_shape_metrics

    feats = _geo6_feats()
    rows = []
    for key in ("A", "B", "C"):
        q = geo_shape_metrics(feats, key, simplify=True, tol_m=300.0)
        rows.append(
            (
                key,
                q["n_parts_before_union"],
                q["npoints_before_union"],
                q["npoints_out"],
                round(q["area_m2_union_before"] / 1e6, 3),
                round(q["area_m2_union_after"] / 1e6, 3),
                q["bbox"][0],
                q["bbox"][1],
                q["bbox"][2],
                q["bbox"][3],
                round(q["bbox_ratio"], 4),
                q["warning_bbox_ratio"],
                q["is_valid_before"],
                q["is_valid_after"],
            )
        )
    return local_df(spark, rows, _GEO6_SCHEMA)


# --- geo7: municipality choropleth chart view (J6 + geometry) --------------
#
# Municipality = unit cell; events map to cells arithmetically, so the
# oracle states each cell's membership (geo1-style floor arithmetic)
# and its poly_coords literal.


def _mun_values_sql() -> str:
    vals = []
    for ix in range(_NX):
        for iy in range(_NY):
            vals.append(
                f"('m_{ix}_{iy}', 'Cell {ix}-{iy}', '{_cell_json(ix, iy)}')"
            )
    return "(VALUES " + ", ".join(vals) + ") AS g(cd_mun, mun_nm_mun, poly_coords)"


@query(
    "geo7_mun_choropleth_day",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(floor((value % 60) / 10.0) AS INTEGER) AS ix,
               CAST(user_id % {_NY} AS INTEGER) AS iy
        FROM events
    ),
    agg AS (
        SELECT day, 'm_' || CAST(ix AS VARCHAR) || '_' || CAST(iy AS VARCHAR)
                   AS cd_mun,
               CAST(count(*) AS BIGINT) AS n_focos
        FROM pts GROUP BY 1, 2
    )
    SELECT a.day, a.cd_mun, g.mun_nm_mun, g.poly_coords, a.n_focos,
           CAST(a.n_focos AS DOUBLE) AS n_focos_viz
    FROM agg a JOIN {_mun_values_sql()} ON g.cd_mun = a.cd_mun
    WHERE a.n_focos > 0
    """,
)
def geo7_mun_choropleth_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v_chart_mun_choropleth_day (J6 + geometry,
    sqlm/marts/canonical/050): daily municipality counts broadcast-
    joined to the web-geometry dim built by the real mun_web_df
    (largest-part no-holes canonical poly_coords)."""
    from ..geoprep import mun_web_df, v_chart_mun_choropleth_day

    ev = load_table(spark, sf_dir, "events")
    ix = F.floor((F.col("value") % 60) / 10.0).cast("int")
    iy = (F.col("user_id") % _NY).cast("int")
    daily_mun = (
        ev.select(
            F.to_date("ts").alias("day"),
            F.concat(
                F.lit("m_"), ix.cast("string"), F.lit("_"), iy.cast("string")
            ).alias("mun_cd_mun"),
        )
        .groupBy("day", "mun_cd_mun")
        .agg(F.count("*").alias("n_focos"))
    )
    web = mun_web_df(spark, _cells())
    return v_chart_mun_choropleth_day(daily_mun, web)


# keep module-level constants referenced (area scale parity with oracle)
assert math.isclose(_DEG_M, math.pi / 180 * 6371008.8)
