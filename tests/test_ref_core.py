"""Schema-adaptive ref_core dim build (sources/ref_core.py vs
reference sqlm/ref_core/00_build_ref_core.sql)."""

from __future__ import annotations

import pytest

from inpe_queimadas_etl_spark.sources.ref_core import (
    build_ref_core,
    build_ref_core_dim,
    pick_ref_core_source,
)


def test_uc_renamed_columns_resolve(spark):
    """A UC vintage with id_uc/nm_uc/geometry resolves to the same
    canonical (cd_cnuc, nome_uc, geom) schema."""
    df = spark.createDataFrame(
        [("u1", "Parque A", "[[0,0]]"), ("u2", "Parque B", "[[1,1]]")],
        "id_uc string, nm_uc string, geometry string",
    )
    out = build_ref_core_dim(df, "uc")
    assert out.columns == ["cd_cnuc", "nome_uc", "geom"]
    rows = {r["cd_cnuc"]: r["nome_uc"] for r in out.collect()}
    assert rows == {"u1": "Parque A", "u2": "Parque B"}


def test_code_candidates_coalesce_per_row(spark):
    """Both cd_cnuc and id_uc present: cd_cnuc wins when non-blank,
    blank/whitespace values fall through to id_uc PER ROW."""
    df = spark.createDataFrame(
        [
            ("c1", "i1", "n1", "g"),
            ("", "i2", "n2", "g"),
            ("   ", "i3", "n3", "g"),
            (None, None, "n4", "g"),  # no code at all -> dropped
        ],
        "cd_cnuc string, id_uc string, nome_uc string, geom string",
    )
    out = build_ref_core_dim(df, "uc").collect()
    assert [r["cd_cnuc"] for r in out] == ["c1", "i2", "i3"]


def test_name_falls_back_to_code_expr(spark):
    df = spark.createDataFrame(
        [("t9", "[[2,2]]")], "terrai_cod string, wkt string"
    )
    out = build_ref_core_dim(df, "ti").collect()
    assert out[0]["ti_cod"] == "t9" and out[0]["ti_nome"] == "t9"


def test_null_geometry_rows_dropped(spark):
    df = spark.createDataFrame(
        [("b1", "Amazonia", "g"), ("b2", "Cerrado", None)],
        "cd_bioma string, bioma string, geom string",
    )
    out = build_ref_core_dim(df, "bioma").collect()
    assert [r["cd_bioma"] for r in out] == ["b1"]


def test_numeric_code_cast_and_trim(spark):
    """Integer codes cast to text and trim, like ::text in the SQL."""
    df = spark.createDataFrame(
        [(12345, " Mata Atlantica ", "g")],
        "cod_bioma int, nome string, poly_coords string",
    )
    row = build_ref_core_dim(df, "bioma").collect()[0]
    assert row["cd_bioma"] == "12345"
    assert row["bioma"] == "Mata Atlantica"


def test_missing_code_column_raises(spark):
    df = spark.createDataFrame([("x", "g")], "foo string, geom string")
    with pytest.raises(ValueError, match="no uc code column"):
        build_ref_core_dim(df, "uc")


def test_missing_geometry_column_raises(spark):
    df = spark.createDataFrame([("u1",)], "cd_cnuc string")
    with pytest.raises(ValueError, match="no geometry column"):
        build_ref_core_dim(df, "uc")


def test_source_precedence_fixed_order(spark):
    """ref_core.* beats ref.*; within a schema the list order rules
    (00_build_ref_core.sql:33-41)."""
    a = spark.createDataFrame([("u1", "n", "g")],
                              "cd_cnuc string, nome_uc string, geom string")
    tables = {"ref.ucs_4326": a, "ref_core.cnuc_uc": a, "ref_core.ucs_4326": a}
    name, _ = pick_ref_core_source("uc", tables)
    assert name == "ref_core.ucs_4326"
    name2, _ = pick_ref_core_source("uc", {"ref.cnuc_2025_08": a, "ref.ucs_4326": a})
    assert name2 == "ref.ucs_4326"


def test_source_missing_raises(spark):
    with pytest.raises(LookupError, match="TI"):
        pick_ref_core_source("ti", {})


def test_full_build(spark):
    uc = spark.createDataFrame([("u1", "Parque", "g")],
                               "uc_cd_cnuc string, uc_nome string, geom string")
    ti = spark.createDataFrame([("t1", "TI X", "g")],
                               "terrai_cod string, terrai_nom string, geojson string")
    bio = spark.createDataFrame([("b1", "Pampa", "g")],
                                "bioma_cd string, bioma_nm string, geometry string")
    out = build_ref_core(
        {"ref.ucs_4326": uc, "ref.tis_4326": ti, "ref.biomas_4326": bio}
    )
    assert out["uc"][0] == "ref.ucs_4326"
    assert out["uc"][1].columns == ["cd_cnuc", "nome_uc", "geom"]
    assert out["ti"][1].collect()[0]["ti_nome"] == "TI X"
    assert out["bioma"][1].collect()[0]["bioma"] == "Pampa"
