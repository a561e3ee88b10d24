"""P13 — GeoJSON coordinate sanitizer (reference api/app/geo.py:12-106).

Every choropleth / lookup / overlay response in the reference passes
its raw `poly_coords` jsonb through `normalize_poly_coords` before
emitting a GeoJSON Feature. The sanitizer is depth-sniffing: nesting
depth 2 is a bare ring, 3 a Polygon, 4 a MultiPolygon; anything else
degrades to a best-effort Polygon or empty coords. Rings are cleaned
point-by-point (only [num, num, ...] survive), closed (first == last),
and dropped entirely when fewer than 4 closed points remain.

This is serve-layer, driver-side logic: the geometry payloads it
touches are per-response dim-sized (27 UFs / <=5,570 municipalities),
never the fact table, so there is nothing to distribute.
"""

from __future__ import annotations

from typing import Any

Coord = tuple[float, float]
Ring = list[Coord]
PolygonCoords = list[Ring]
MultiPolygonCoords = list[PolygonCoords]


def _nesting_depth(x: Any) -> int:
    """How many list levels until the first non-list (list-first probe:
    only element [0] is inspected at each level, as the reference)."""
    d = 0
    while isinstance(x, list) and x:
        d += 1
        x = x[0]
    return d


def _close_ring(ring: Ring) -> Ring:
    if len(ring) >= 3 and ring[0] != ring[-1]:
        return ring + [ring[0]]
    return ring


def sanitize_ring(ring: Any) -> Ring:
    """Keep only well-formed 2+-number points, close the ring, and
    require >= 4 points (a closed triangle) — else drop to []."""
    if not isinstance(ring, list):
        return []
    out: Ring = []
    for pt in ring:
        if (
            isinstance(pt, list)
            and len(pt) >= 2
            and isinstance(pt[0], (int, float))
            and isinstance(pt[1], (int, float))
        ):
            out.append((float(pt[0]), float(pt[1])))
    out = _close_ring(out)
    return out if len(out) >= 4 else []


def normalize_poly_coords(
    poly_coords: Any,
) -> tuple[str, PolygonCoords | MultiPolygonCoords]:
    """Depth-sniffing sanitizer -> (geometry type, coordinates)."""
    d = _nesting_depth(poly_coords)

    if d == 2:  # bare ring
        ring = sanitize_ring(poly_coords)
        return "Polygon", ([ring] if ring else [])

    if d == 3:  # Polygon: list of rings
        rings = [sr for r in (poly_coords or []) if (sr := sanitize_ring(r))]
        return "Polygon", rings

    if d == 4:  # MultiPolygon: list of polygons
        polys: MultiPolygonCoords = []
        for poly in poly_coords or []:
            if not isinstance(poly, list):
                continue
            rings = [sr for r in poly if (sr := sanitize_ring(r))]
            if rings:
                polys.append(rings)
        return "MultiPolygon", polys

    if isinstance(poly_coords, list):  # ragged: salvage what looks ring-like
        rings = [sr for r in poly_coords if (sr := sanitize_ring(r))]
        if rings:
            return "Polygon", rings

    return "Polygon", []


def to_feature(
    uf: str, n_focos: int, mean_per_day: float, poly_coords: Any
) -> dict:
    """GeoJSON Feature for the UF choropleth (api/app/geo.py:93-106)."""
    gtype, coords = normalize_poly_coords(poly_coords)
    return {
        "type": "Feature",
        "properties": {
            "uf": uf,
            "n_focos": int(n_focos),
            "mean_per_day": float(mean_per_day),
        },
        "geometry": {"type": gtype, "coordinates": coords},
    }
