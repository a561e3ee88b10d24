"""P12/P13 serve-layer sanitizers — parity with the reference edge
cases (api/app/geo.py:12-106, api/app/main.py:624-657). Pure driver
functions, no Spark session needed."""

from __future__ import annotations

from inpe_queimadas_etl_spark.functions.geojson import (
    normalize_poly_coords,
    sanitize_ring,
    to_feature,
)
from inpe_queimadas_etl_spark.functions.labels import ascii_label, clean_display_label

SQ = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
SQ_T = [tuple(p) for p in SQ]


class TestNormalizePolyCoords:
    def test_depth2_bare_ring_becomes_polygon(self):
        gtype, coords = normalize_poly_coords(SQ)
        assert gtype == "Polygon"
        assert coords == [SQ_T]

    def test_depth2_open_ring_is_closed(self):
        gtype, coords = normalize_poly_coords(SQ[:-1])
        assert gtype == "Polygon"
        assert coords == [SQ_T]  # first point appended

    def test_depth3_polygon_with_hole(self):
        hole = [[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8], [0.2, 0.2]]
        gtype, coords = normalize_poly_coords([SQ, hole])
        assert gtype == "Polygon"
        assert len(coords) == 2

    def test_depth3_invalid_points_filtered(self):
        dirty = [[0, 0], ["x", 1], [1, 0], None, [1, 1], [0, 1], [0, 0]]
        gtype, coords = normalize_poly_coords([dirty])
        assert gtype == "Polygon"
        assert coords == [SQ_T]

    def test_depth4_multipolygon(self):
        sq2 = [[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 3.0], [2.0, 2.0]]
        gtype, coords = normalize_poly_coords([[SQ], [sq2]])
        assert gtype == "MultiPolygon"
        assert len(coords) == 2

    def test_depth4_empty_polygons_dropped(self):
        gtype, coords = normalize_poly_coords([[SQ], [[[0, 0], [1, 1]]]])
        assert gtype == "MultiPolygon"
        assert len(coords) == 1

    def test_degenerate_ring_dropped(self):
        # closed triangle needs >= 4 points; 2-point "ring" dies
        gtype, coords = normalize_poly_coords([[0, 0], [1, 1]])
        assert (gtype, coords) == ("Polygon", [])

    def test_non_list_inputs(self):
        assert normalize_poly_coords(None) == ("Polygon", [])
        assert normalize_poly_coords("junk") == ("Polygon", [])
        assert normalize_poly_coords(42) == ("Polygon", [])
        assert normalize_poly_coords([]) == ("Polygon", [])

    def test_ragged_salvage(self):
        # depth sniffing follows element [0]; a scalar first element
        # makes depth 1, but ring-like siblings are still salvaged
        gtype, coords = normalize_poly_coords(["junk", SQ])
        assert gtype == "Polygon"
        assert coords == [SQ_T]

    def test_sanitize_ring_non_list(self):
        assert sanitize_ring("no") == []
        assert sanitize_ring({"a": 1}) == []

    def test_to_feature_shape(self):
        feat = to_feature("MT", 41, 2.05, [SQ])
        assert feat["type"] == "Feature"
        assert feat["properties"] == {
            "uf": "MT",
            "n_focos": 41,
            "mean_per_day": 2.05,
        }
        assert feat["geometry"]["type"] == "Polygon"
        assert feat["geometry"]["coordinates"] == [SQ_T]


class TestCleanDisplayLabel:
    def test_plain_ascii_untouched(self):
        assert clean_display_label("Cuiaba") == "Cuiaba"

    def test_strip_and_empty(self):
        assert clean_display_label("  x  ") == "x"
        assert clean_display_label("") == ""
        assert clean_display_label(None) == ""

    def test_latin1_double_encoding_recovered(self):
        # "São Paulo" UTF-8 bytes mis-decoded as latin1
        broken = "São Paulo".encode("utf-8").decode("latin1")
        assert broken == "SÃ£o Paulo"
        assert clean_display_label(broken) == "São Paulo"

    def test_replacement_char_sao_patched(self):
        assert clean_display_label("S�o Felix") == "São Felix"
        assert clean_display_label("s�o miguel") == "são miguel"

    def test_stray_replacement_degrades_to_a(self):
        assert clean_display_label("Taboc�l") == "Tabocal"

    def test_bad_triplet_patched(self):
        # U+FFFD's UTF-8 bytes decoded as latin1 ("ï¿½")
        bad = "Sï¿½o Jorge"
        assert clean_display_label(bad) == "São Jorge"

    def test_proper_accents_kept(self):
        assert clean_display_label("Brasília") == "Brasília"

    def test_ascii_label(self):
        assert ascii_label("São João") == "Sao Joao"
