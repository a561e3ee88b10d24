"""Spatial suite: the point-in-polygon attribution operator checked
against an arithmetic oracle.

Synthetic coordinates are derived from `events` (value -> x, user_id
-> y, offset by +0.0005 so no point ever sits on a cell boundary) and
attributed to a 5-degree grid of square "municipalities" by the real
broadcast ray-casting operator (operators/geo.py). Because the cells
are axis-aligned squares, DuckDB can state the expected attribution in
closed form with floor() arithmetic — an exact, independent oracle for
the spatial join (reference J2, sql/enrich/20_enrich_municipio.sql:43-54).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.geo import grid_cells, point_in_polygon_join
from ..session import load_table
from . import query

_X0, _Y0, _X1, _Y1, _STEP = -10.0, -10.0, 20.0, 10.0, 5.0
_NX = int((_X1 - _X0) / _STEP)
_NY = int((_Y1 - _Y0) / _STEP)


@query(
    "geo1_point_in_polygon_grid",
    oracle=f"""
    WITH pts AS (
        SELECT event_id,
               value / 10.0 - 10.0 + 0.0005 AS x,
               (user_id % 20) - 10.0 + 0.0005 AS y
        FROM events
    )
    SELECT event_id, x, y,
           CASE WHEN floor((x - ({_X0})) / {_STEP}) BETWEEN 0 AND {_NX - 1}
                 AND floor((y - ({_Y0})) / {_STEP}) BETWEEN 0 AND {_NY - 1}
                THEN 'mun_' || CAST(CAST(floor((x - ({_X0})) / {_STEP}) AS INTEGER) AS VARCHAR)
                     || '_' || CAST(CAST(floor((y - ({_Y0})) / {_STEP}) AS INTEGER) AS VARCHAR)
                ELSE NULL END AS mun_id
    FROM pts
    """,
)
def geo1_point_in_polygon_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast point-in-polygon attribution (J2) on synthetic points;
    the Spark side runs the actual ray-cast operator, the oracle states
    grid membership arithmetically."""
    cells = grid_cells(_X0, _Y0, _X1, _Y1, _STEP, prefix="mun")
    pts = load_table(spark, sf_dir, "events").select(
        "event_id",
        (F.col("value") / 10.0 - 10.0 + 0.0005).alias("x"),
        ((F.col("user_id") % 20) - 10.0 + 0.0005).alias("y"),
    )
    attributed = point_in_polygon_join(pts, cells, x_col="x", y_col="y", id_alias="mun_id")
    return attributed.select("event_id", "x", "y", "mun_id")
