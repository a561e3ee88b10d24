"""Minimal WKT polygon codec (no GEOS in this container).

Supports POLYGON and MULTIPOLYGON with holes — the only geometry
types the reference's dimension tables hold (sql/ref/01_ref_schema.sql:12).
Round-trips to/from operators.geo.PolyFeature.
"""

from __future__ import annotations

import re

import numpy as np

from .geo import PolyFeature

_NUM = r"[-+]?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?"


def _parse_ring(text: str) -> np.ndarray:
    pts = []
    for pair in text.split(","):
        xy = pair.strip().split()
        pts.append((float(xy[0]), float(xy[1])))
    return np.asarray(pts, dtype="float64")


def _split_top_level(text: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(text):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts]


def _strip_parens(text: str) -> str:
    text = text.strip()
    assert text.startswith("(") and text.endswith(")"), text
    return text[1:-1]


def polygons_from_wkt(poly_id: str, wkt: str, **props) -> list[PolyFeature]:
    """Parse POLYGON/MULTIPOLYGON WKT into PolyFeatures (one per part;
    multi-part features share the poly_id — even-odd casting handles
    holes inside each part)."""
    wkt = wkt.strip()
    m = re.match(r"^(POLYGON|MULTIPOLYGON)\s*\((.*)\)$", wkt, re.S | re.I)
    if not m:
        raise ValueError(f"unsupported WKT: {wkt[:60]}")
    kind, body = m.group(1).upper(), m.group(2)
    feats = []
    if kind == "POLYGON":
        rings = [_parse_ring(_strip_parens(r)) for r in _split_top_level(body)]
        feats.append(PolyFeature(poly_id=poly_id, rings=tuple(rings), props=dict(props)))
    else:
        for part in _split_top_level(body):
            rings = [
                _parse_ring(_strip_parens(r))
                for r in _split_top_level(_strip_parens(part))
            ]
            feats.append(
                PolyFeature(poly_id=poly_id, rings=tuple(rings), props=dict(props))
            )
    return feats


def wkt_from_feature(feat: PolyFeature) -> str:
    rings = ", ".join(
        "(" + ", ".join(f"{x:g} {y:g}" for x, y in ring) + ")" for ring in feat.rings
    )
    return f"POLYGON ({rings})"


def features_from_dim(rows, id_col: str, wkt_col: str, prop_cols=()) -> list[PolyFeature]:
    """Build PolyFeatures from collected dim rows (e.g. a small parquet
    dimension collected to the driver for broadcast)."""
    feats: list[PolyFeature] = []
    for row in rows:
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        props = {c: d.get(c) for c in prop_cols}
        feats.extend(polygons_from_wkt(str(d[id_col]), d[wkt_col], **props))
    return feats
