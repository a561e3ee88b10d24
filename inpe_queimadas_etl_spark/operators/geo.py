"""Spatial operators: point-in-polygon join + bounded-radius KNN.

The reference attributes each fire point to municipality / biome / UC /
TI polygons with PostGIS `st_intersects` (bbox `&&` prefilter + GiST
index, sql/enrich/20_enrich_municipio.sql:43-54 and
21_enrich_biomas_ucs_tis.sql:22-119), with a nearest-within-2km
fallback (`<->` KNN + st_distance(geography) <= 2000,
20_enrich_municipio.sql:56-74).

Spark has no spatial index, and this container has no GEOS/shapely, so
the engine implements the same filter-refine strategy directly:

- polygon dims are tiny (5,570 municipalities; BASELINE.md) ->
  broadcast the full polygon set to every task;
- per Arrow batch, a numpy bbox prefilter selects candidate points per
  polygon, then a vectorized even-odd ray cast refines;
- first-match semantics follow the reference's `distinct on (hash)
  ... order by b.id` (lowest polygon id wins) so results are stable
  under re-runs;
- the KNN fallback computes point-to-ring distance on a local
  equirectangular projection (exact haversine for vertices would
  differ negligibly at 2 km scale) and keeps the nearest polygon
  within the radius.

At 100 TB the point side stays partitioned and never shuffles: both
operators are mapInPandas over the fact table with the dims shipped in
the closure (a broadcast in cluster terms). That is the same plan
Sedona would pick for a small dim side (broadcast spatial join).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARTH_RADIUS_M = 6_371_008.8


@dataclass(frozen=True)
class PolyFeature:
    """A polygon dim row: id, exterior ring(s), optional holes, attrs.

    ``rings`` is a list of (n, 2) float arrays of (x, y) vertices —
    first ring is the exterior, the rest are holes. Multi-part
    geometries are represented as several PolyFeatures sharing an id
    (even-odd ray casting handles holes within one feature).
    """

    poly_id: str
    rings: tuple
    props: dict = field(default_factory=dict)

    @property
    def bbox(self) -> tuple[float, float, float, float]:
        ext = self.rings[0]
        return (
            float(ext[:, 0].min()),
            float(ext[:, 1].min()),
            float(ext[:, 0].max()),
            float(ext[:, 1].max()),
        )


def make_polygon(poly_id: str, exterior, holes=(), **props) -> PolyFeature:
    rings = [np.asarray(exterior, dtype="float64")]
    for h in holes:
        rings.append(np.asarray(h, dtype="float64"))
    return PolyFeature(poly_id=poly_id, rings=tuple(rings), props=dict(props))


def grid_cells(
    x0: float, y0: float, x1: float, y1: float, step: float, prefix: str = "cell"
) -> list[PolyFeature]:
    """Axis-aligned grid-cell polygons covering [x0,x1) x [y0,y1)."""
    cells = []
    nx = int(round((x1 - x0) / step))
    ny = int(round((y1 - y0) / step))
    for ix in range(nx):
        for iy in range(ny):
            cx0, cy0 = x0 + ix * step, y0 + iy * step
            cx1, cy1 = cx0 + step, cy0 + step
            ring = [(cx0, cy0), (cx1, cy0), (cx1, cy1), (cx0, cy1), (cx0, cy0)]
            cells.append(make_polygon(f"{prefix}_{ix}_{iy}", ring))
    return cells


def _ray_cast(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing test for points vs one ring."""
    inside = np.zeros(px.shape[0], dtype=bool)
    x0, y0 = ring[:-1, 0], ring[:-1, 1]
    x1, y1 = ring[1:, 0], ring[1:, 1]
    for i in range(x0.shape[0]):
        ax, ay, bx, by = x0[i], y0[i], x1[i], y1[i]
        cond = (ay > py) != (by > py)
        if not cond.any():
            continue
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = ax + (py - ay) * (bx - ax) / (by - ay)
        inside ^= cond & (px < xint)
    return inside


def _contains(poly: PolyFeature, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    res = np.zeros(px.shape[0], dtype=bool)
    for ring in poly.rings:
        res ^= _ray_cast(px, py, ring)
    return res


def point_in_polygon_join(
    points: DataFrame,
    polygons: list[PolyFeature],
    x_col: str = "lon",
    y_col: str = "lat",
    id_alias: str = "poly_id",
) -> DataFrame:
    """Attribute each point to the first containing polygon (lowest
    poly_id), appending ``id_alias`` (null when no polygon contains the
    point). Broadcast-style: polygon set ships in the task closure;
    the point side is never shuffled."""
    polys = sorted(polygons, key=lambda p: p.poly_id)
    bboxes = np.array([p.bbox for p in polys], dtype="float64")
    out_schema = T.StructType(
        points.schema.fields + [T.StructField(id_alias, T.StringType())]
    )

    def attribute(batches):
        for pdf in batches:
            px = pdf[x_col].to_numpy(dtype="float64")
            py = pdf[y_col].to_numpy(dtype="float64")
            assigned = np.full(px.shape[0], None, dtype=object)
            open_mask = np.isfinite(px) & np.isfinite(py)
            for k, poly in enumerate(polys):
                if not open_mask.any():
                    break
                bx0, by0, bx1, by1 = bboxes[k]
                cand = (
                    open_mask
                    & (px >= bx0)
                    & (px <= bx1)
                    & (py >= by0)
                    & (py <= by1)
                )
                if not cand.any():
                    continue
                idx = np.nonzero(cand)[0]
                hit = _contains(poly, px[idx], py[idx])
                hit_idx = idx[hit]
                assigned[hit_idx] = poly.poly_id
                open_mask[hit_idx] = False
            pdf = pdf.copy()
            pdf[id_alias] = assigned
            yield pdf

    return points.mapInPandas(attribute, schema=out_schema)


def _ring_distance_m(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray
) -> np.ndarray:
    """Min distance (meters) from lon/lat points to a ring's segments,
    on a local equirectangular projection (adequate at few-km scale)."""
    coslat = np.cos(np.radians(py))
    deg_m = np.pi / 180.0 * EARTH_RADIUS_M
    best = np.full(px.shape[0], np.inf)
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    for i in range(ax.shape[0]):
        sx = (bx[i] - ax[i]) * coslat
        sy = np.full_like(sx, by[i] - ay[i])
        wx = (px - ax[i]) * coslat
        wy = py - ay[i]
        seg_len2 = sx * sx + sy * sy
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(seg_len2 > 0, (wx * sx + wy * sy) / seg_len2, 0.0)
        t = np.clip(t, 0.0, 1.0)
        dx = wx - t * sx
        dy = wy - t * sy
        d = np.sqrt(dx * dx + dy * dy) * deg_m
        best = np.minimum(best, d)
    return best


def knn_nearest_within(
    points: DataFrame,
    polygons: list[PolyFeature],
    max_dist_m: float = 2000.0,
    x_col: str = "lon",
    y_col: str = "lat",
    id_alias: str = "poly_id",
    dist_alias: str = "dist_m",
) -> DataFrame:
    """Nearest-polygon-within-radius fallback (reference J3,
    sql/enrich/20_enrich_municipio.sql:56-74): for each point, the
    closest polygon boundary within ``max_dist_m`` (containment =
    distance 0); null when nothing is within the radius. Ties break on
    lowest poly_id, matching the deterministic `limit 1` intent."""
    polys = sorted(polygons, key=lambda p: p.poly_id)
    pad_deg = max_dist_m / 111_000.0 * 1.5
    bboxes = np.array([p.bbox for p in polys], dtype="float64")
    out_schema = T.StructType(
        points.schema.fields
        + [
            T.StructField(id_alias, T.StringType()),
            T.StructField(dist_alias, T.DoubleType()),
        ]
    )

    def nearest(batches):
        for pdf in batches:
            px = pdf[x_col].to_numpy(dtype="float64")
            py = pdf[y_col].to_numpy(dtype="float64")
            best_d = np.full(px.shape[0], np.inf)
            best_id = np.full(px.shape[0], None, dtype=object)
            for k, poly in enumerate(polys):
                bx0, by0, bx1, by1 = bboxes[k]
                cand = (
                    (px >= bx0 - pad_deg)
                    & (px <= bx1 + pad_deg)
                    & (py >= by0 - pad_deg)
                    & (py <= by1 + pad_deg)
                )
                if not cand.any():
                    continue
                idx = np.nonzero(cand)[0]
                cx, cy = px[idx], py[idx]
                d = _ring_distance_m(cx, cy, poly.rings[0])
                inside = _contains(poly, cx, cy)
                d = np.where(inside, 0.0, d)
                better = d < best_d[idx]
                upd = idx[better]
                best_d[upd] = d[better]
                best_id[upd] = poly.poly_id
            ok = best_d <= max_dist_m
            pdf = pdf.copy()
            pdf[id_alias] = np.where(ok, best_id, None)
            pdf[dist_alias] = np.where(ok, best_d, np.nan)
            yield pdf

    return points.mapInPandas(nearest, schema=out_schema)


def haversine_m(lat1, lon1, lat2, lon2):
    """Great-circle distance in meters as a Spark Column (JVM-side)."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))
