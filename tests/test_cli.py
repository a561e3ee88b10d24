"""CLI entrypoint (cli.py vs reference src/etl/cli.py + app.py run/
backfill/checks subcommands): landing-dir day discovery, shapefile dim
loading, resumable range run, validation-report write."""

from __future__ import annotations

import datetime as dt
import json

import pytest

from inpe_queimadas_etl_spark import cli
from inpe_queimadas_etl_spark.pipeline import Warehouse
from inpe_queimadas_etl_spark.sources import shapefile as shp
from inpe_queimadas_etl_spark.sources.csv_ingest import write_fixture_csv

from . import fixtures_geo as G


def _write_dim(d, name, feats, fields, row_fn):
    shp.write_shp(str(d / f"{name}.shp"), [[list(f.rings)] for f in feats])
    shp.write_dbf(str(d / f"{name}.dbf"), fields, [row_fn(f) for f in feats])


@pytest.fixture(scope="module")
def dims_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dims")
    _write_dim(
        d,
        "municipios",
        G.municipios(),
        [
            ("CD_MUN", "C", 10, 0),
            ("NM_MUN", "C", 20, 0),
            ("UF", "C", 2, 0),
            ("AREA_KM2", "N", 12, 3),
        ],
        lambda f: {
            "cd_mun": f.poly_id,
            "nm_mun": f.props["nm_mun"],
            "uf": f.props["uf"],
            "area_km2": float(f.props["area_km2"]),
        },
    )
    _write_dim(
        d,
        "biomas",
        G.biomas(),
        [("CD_BIOMA", "C", 10, 0), ("BIOMA", "C", 20, 0)],
        lambda f: {"cd_bioma": f.poly_id, "bioma": f.props["bioma"]},
    )
    _write_dim(
        d,
        "ucs",
        G.ucs(),
        [("CD_CNUC", "C", 10, 0), ("NOME_UC", "C", 20, 0)],
        lambda f: {"cd_cnuc": f.poly_id, "nome_uc": f.props["nome_uc"]},
    )
    _write_dim(
        d,
        "tis",
        G.tis(),
        [("TERRAI_COD", "C", 10, 0), ("TERRAI_NOM", "C", 20, 0)],
        lambda f: {"terrai_cod": f.poly_id, "terrai_nom": f.props["terrai_nom"]},
    )
    return str(d)


def test_load_dims_roundtrip(spark, dims_dir):
    dims = cli.load_dims(spark, dims_dir)
    assert {f.poly_id for f in dims["municipios"]} == {
        f.poly_id for f in G.municipios()
    }
    assert dims["biomas"][0].props["bioma"] in ("Amazonia", "Cerrado")
    uf_area = {r["uf"]: r["area_km2"] for r in dims["uf_area"].collect()}
    expected = dict(G.uf_area_rows())
    assert set(uf_area) == set(expected)
    for uf, area in expected.items():
        assert uf_area[uf] == pytest.approx(area, rel=1e-6)


def test_run_single_day_then_resume_and_checks(spark, dims_dir, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_csv(
        str(landing / "focos_diario_br_20240501.csv"),
        G.FOCOS_HEADER,
        G.FOCOS_ROWS[:3],
        sep=";",
    )
    write_fixture_csv(
        str(landing / "focos_diario_br_20240502.csv"),
        G.FOCOS_HEADER,
        G.FOCOS_ROWS[3:6],
        sep=";",
    )
    wh_dir = str(tmp_path / "wh")
    state = str(tmp_path / "state.json")

    rc = cli.main(
        [
            "run",
            "--date",
            "2024-05-01",
            "--landing-dir",
            str(landing),
            "--warehouse",
            wh_dir,
            "--dims-dir",
            dims_dir,
            "--state-file",
            state,
        ]
    )
    assert rc == 0
    wh = Warehouse(wh_dir)
    assert wh.read(spark, "curated_focos").count() == 3
    assert json.loads(open(state).read())["days"] == ["2024-05-01"]

    # range rerun covering both days: day 1 resumes (skipped), day 2 runs;
    # --checks writes the validation report artifacts
    rc = cli.main(
        [
            "run",
            "--start",
            "2024-05-01",
            "--end",
            "2024-05-02",
            "--landing-dir",
            str(landing),
            "--warehouse",
            wh_dir,
            "--dims-dir",
            dims_dir,
            "--state-file",
            state,
            "--checks",
        ]
    )
    assert rc == 0
    assert wh.read(spark, "curated_focos").count() == 6
    st = json.loads(open(state).read())
    assert st["days"] == ["2024-05-01", "2024-05-02"]
    assert (wh.root / "docs" / "validation_last_run.md").exists()
    assert (wh.root / "logs" / "last_run.json").exists()

    # standalone checks subcommand over the populated warehouse
    assert cli.main(["checks", "--warehouse", wh_dir]) == 0


def test_run_errors_without_files_or_range(tmp_path, dims_dir):
    empty = tmp_path / "empty"
    empty.mkdir()
    rc = cli.main(
        [
            "run",
            "--date",
            "2030-01-01",
            "--landing-dir",
            str(empty),
            "--warehouse",
            str(tmp_path / "w"),
            "--dims-dir",
            dims_dir,
        ]
    )
    assert rc == 1
    rc = cli.main(
        [
            "run",
            "--landing-dir",
            str(empty),
            "--warehouse",
            str(tmp_path / "w"),
            "--dims-dir",
            dims_dir,
        ]
    )
    assert rc == 2


def test_validate_repo_structure_and_warehouse(spark, dims_dir, tmp_path):
    """validate-repo (reference validate_repo.py analog): structural
    engine invariants always pass on this repo; the warehouse check
    fails on an empty warehouse, passes after a full run, and flags
    staged leftovers (the WAP invariant)."""
    from inpe_queimadas_etl_spark.checks import (
        validate_repo_structure,
        validate_warehouse_layout,
    )

    s = validate_repo_structure()
    assert s["ok"], s
    assert s["n_queries"] == 50 and s["n_oracles"] == 50

    landing = tmp_path / "landing"
    landing.mkdir()
    write_fixture_csv(
        str(landing / "focos_diario_br_20240502.csv"),
        G.FOCOS_HEADER,
        G.FOCOS_ROWS,
        sep=";",
    )
    wh_dir = str(tmp_path / "wh")

    # empty warehouse -> missing tables, exit 1
    rc = cli.main(["validate-repo", "--warehouse", wh_dir])
    assert rc == 1

    rc = cli.main(
        [
            "run", "--date", "2024-05-02",
            "--landing-dir", str(landing),
            "--warehouse", wh_dir,
            "--dims-dir", dims_dir,
        ]
    )
    assert rc == 0
    rc = cli.main(["validate-repo", "--warehouse", wh_dir])
    assert rc == 0

    # a staged leftover (interrupted publish) flips the layout check
    wh = Warehouse(wh_dir)
    stale = wh.root / "_tmp" / "t__deadbeef"
    stale.mkdir(parents=True)
    layout = validate_warehouse_layout(spark, wh)
    assert not layout["ok"] and layout["staged_leftovers"]


def test_discover_landing_files_filters_and_orders(tmp_path):
    for name in (
        "focos_diario_br_20240503.csv",
        "focos_diario_br_20240501.csv",
        "notes.csv",
        "focos_diario_br_20240601.csv",
    ):
        (tmp_path / name).write_text("x\n")
    got = cli.discover_landing_files(
        str(tmp_path), dt.date(2024, 5, 1), dt.date(2024, 5, 31)
    )
    assert [d for d, _ in got] == [dt.date(2024, 5, 1), dt.date(2024, 5, 3)]


def test_load_dims_alternate_ibge_vintage(spark, dims_dir, tmp_path):
    """An alternate-vintage municipality file (CD_GEOCMU / NM_MUNICIP /
    SIGLA_UF instead of CD_MUN / NM_MUN / UF) must load through
    load_dims identically to the typed dim builders, for both formats
    (ADVICE r3 #2: _DIM_SPECS now carries the fallback candidates)."""
    import shutil

    from inpe_queimadas_etl_spark.sources.geojson_source import write_geojson

    vintage = tmp_path / "vintage_dims"
    vintage.mkdir()
    for name in ("biomas", "ucs", "tis"):
        for ext in (".shp", ".dbf"):
            shutil.copy(f"{dims_dir}/{name}{ext}", vintage / f"{name}{ext}")
    feats = G.municipios()
    _write_dim(
        vintage,
        "municipios",
        feats,
        [
            ("CD_GEOCMU", "C", 10, 0),
            ("NM_MUNICIP", "C", 20, 0),
            ("SIGLA_UF", "C", 2, 0),
            ("AREA_KM2", "N", 12, 3),
        ],
        lambda f: {
            "cd_geocmu": f.poly_id,
            "nm_municip": f.props["nm_mun"],
            "sigla_uf": f.props["uf"],
            "area_km2": float(f.props["area_km2"]),
        },
    )
    ref = cli.load_dims(spark, dims_dir)
    got = cli.load_dims(spark, str(vintage))
    assert {f.poly_id for f in got["municipios"]} == {
        f.poly_id for f in ref["municipios"]
    }
    # props resolve through the aliases, not to None
    by_id = {f.poly_id: f.props for f in got["municipios"]}
    ref_by_id = {f.poly_id: f.props for f in ref["municipios"]}
    for pid, props in ref_by_id.items():
        assert by_id[pid]["nm_mun"] == props["nm_mun"]
        assert by_id[pid]["uf"] == props["uf"]
    got_area = {r["uf"]: r["area_km2"] for r in got["uf_area"].collect()}
    ref_area = {r["uf"]: r["area_km2"] for r in ref["uf_area"].collect()}
    assert got_area == pytest.approx(ref_area)

    # same vintage via GeoJSON: rewrite properties under the old names
    gj_dir = tmp_path / "vintage_gj"
    gj_dir.mkdir()
    for name in ("biomas", "ucs", "tis"):
        for ext in (".shp", ".dbf"):
            shutil.copy(f"{dims_dir}/{name}{ext}", gj_dir / f"{name}{ext}")
    renamed = [
        type(f)(
            poly_id=f.poly_id,
            rings=f.rings,
            props={
                "cd_geocmu": f.poly_id,
                "nm_municip": f.props["nm_mun"],
                "sigla_uf": f.props["uf"],
                "area_km2": f.props["area_km2"],
            },
        )
        for f in feats
    ]
    write_geojson(
        str(gj_dir / "municipios.geojson"), renamed, id_field="cd_geocmu"
    )
    got_gj = cli.load_dims(spark, str(gj_dir))
    assert {f.poly_id for f in got_gj["municipios"]} == {
        f.poly_id for f in ref["municipios"]
    }


def test_load_dims_mixed_formats(spark, dims_dir, tmp_path):
    """A dims dir may mix formats: municipios + ucs as GeoJSON,
    biomas + tis as shapefiles — load_dims resolves each by
    extension and the result matches the all-shapefile load."""
    import shutil

    from inpe_queimadas_etl_spark.sources.geojson_source import write_geojson

    mixed = tmp_path / "mixed_dims"
    mixed.mkdir()
    for name in ("biomas", "tis"):
        for ext in (".shp", ".dbf"):
            shutil.copy(f"{dims_dir}/{name}{ext}", mixed / f"{name}{ext}")
    write_geojson(
        str(mixed / "municipios.geojson"), G.municipios(), id_field="cd_mun"
    )
    write_geojson(str(mixed / "ucs.geojson"), G.ucs(), id_field="cd_cnuc")

    ref = cli.load_dims(spark, dims_dir)
    got = cli.load_dims(spark, str(mixed))
    for name in ("municipios", "biomas", "ucs", "tis"):
        assert {f.poly_id for f in got[name]} == {
            f.poly_id for f in ref[name]
        }, name
    ref_area = {r["uf"]: r["area_km2"] for r in ref["uf_area"].collect()}
    got_area = {r["uf"]: r["area_km2"] for r in got["uf_area"].collect()}
    assert got_area == pytest.approx(ref_area)


def test_validate_repo_structure_broken_entry_module(monkeypatch):
    """ADVICE r4 #2: a broken __spark_entry__ (SyntaxError, or a failed
    import INSIDE the module) must be recorded as a structural failure,
    not crash validate-repo; only module-absent (running outside the
    repo root) stays benign."""
    import importlib

    from inpe_queimadas_etl_spark.checks import validate_repo_structure

    real_import = importlib.import_module

    def raising(kind):
        def _imp(name, *a, **kw):
            if name == "__spark_entry__":
                raise kind
            return real_import(name, *a, **kw)
        return _imp

    # broken module body -> recorded failure
    monkeypatch.setattr(
        importlib, "import_module", raising(SyntaxError("bad entry"))
    )
    s = validate_repo_structure()
    assert not s["ok"]
    assert any("__spark_entry__ import failed" in f for f in s["failures"])

    # a dependency missing inside the module -> recorded failure
    monkeypatch.setattr(
        importlib,
        "import_module",
        raising(ImportError("no mod", name="some_missing_dep")),
    )
    s = validate_repo_structure()
    assert not s["ok"]
    assert any("__spark_entry__ import failed" in f for f in s["failures"])

    # module absent entirely (library user outside repo root) -> benign
    monkeypatch.setattr(
        importlib,
        "import_module",
        raising(ModuleNotFoundError("absent", name="__spark_entry__")),
    )
    s = validate_repo_structure()
    assert s["ok"], s


def test_validate_repo_structure_catches_bench_registry_drift(monkeypatch):
    """A registry rename must not silently drop a bench HEADLINE entry
    (bench's silent skip would read as a perf win)."""
    import bench as bench_mod

    from inpe_queimadas_etl_spark.checks import validate_repo_structure

    s = validate_repo_structure()
    assert s["ok"], s  # current HEADLINE fully resolvable

    monkeypatch.setattr(
        bench_mod, "HEADLINE", list(bench_mod.HEADLINE) + ["q99_renamed_away"]
    )
    s = validate_repo_structure()
    assert not s["ok"]
    assert any("q99_renamed_away" in f for f in s["failures"])
