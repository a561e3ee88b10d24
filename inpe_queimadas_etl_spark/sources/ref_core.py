"""Schema-adaptive ref_core dim build (reference
sqlm/ref_core/00_build_ref_core.sql:5-273).

The reference ingests third-party geo reference tables (UC / TI /
bioma) whose column names vary by vintage, and builds canonical dims
by (1) picking the source table from a FIXED precedence list, (2)
building the code/name expressions as a row-level
``coalesce(nullif(trim(col::text), ''), ...)`` over whichever
candidate columns exist, in candidate order, (3) taking the first
geometry-typed column, and (4) keeping rows where both geometry and
code are non-null.

Spark re-expression: the column discovery runs driver-side over
``df.columns`` (the information_schema probe equivalent) and the
canonical projection is pure JVM expressions (trim/nullif/coalesce),
so the build stays in whole-stage codegen at any scale. Geometry
repair (the reference's st_makevalid wrap) lives in
operators.geometry.make_valid and runs where geometries are parsed,
not here — this module only routes columns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the reference discovers the geometry column by udt_name='geometry';
# Spark dims carry geometry as a coords/WKT string column, so the
# probe is by conventional name instead, first match wins
GEOM_CANDIDATES = ["geom", "geometry", "poly_coords", "wkt", "geojson"]


@dataclass(frozen=True)
class RefCoreSpec:
    entity: str
    code_out: str
    name_out: str
    code_candidates: tuple[str, ...]
    name_candidates: tuple[str, ...]
    source_precedence: tuple[str, ...]


# candidate lists and source orders: 00_build_ref_core.sql:15-30,33-62
SPECS: dict[str, RefCoreSpec] = {
    "uc": RefCoreSpec(
        entity="uc",
        code_out="cd_cnuc",
        name_out="nome_uc",
        code_candidates=(
            "cd_cnuc", "uc_cd_cnuc", "id_uc", "uc_id", "cd_uc", "cod_uc",
        ),
        name_candidates=("nome_uc", "uc_nome", "nm_uc", "nome", "name"),
        source_precedence=(
            "ref_core.ucs_4326_sub", "ref_core.ucs_4326",
            "ref_core.cnuc_uc", "ref_core.cnuc_2025_08",
            "ref.ucs_4326_sub", "ref.ucs_4326",
            "ref.cnuc_uc", "ref.cnuc_2025_08",
        ),
    ),
    "ti": RefCoreSpec(
        entity="ti",
        code_out="ti_cod",
        name_out="ti_nome",
        code_candidates=("ti_cod", "terrai_cod", "cod_ti", "ti_codigo"),
        name_candidates=("ti_nome", "terrai_nom", "nm_ti", "nome", "name"),
        source_precedence=(
            "ref_core.tis_4326_sub", "ref_core.tis_4326",
            "ref_core.tis_poligonaisPolygon",
            "ref.tis_4326_sub", "ref.tis_4326",
            "ref.tis_poligonaisPolygon",
        ),
    ),
    "bioma": RefCoreSpec(
        entity="bioma",
        code_out="cd_bioma",
        name_out="bioma",
        code_candidates=("cd_bioma", "bioma_cd", "cod_bioma"),
        name_candidates=("bioma", "bioma_nm", "nm_bioma", "nome", "name"),
        source_precedence=(
            "ref_core.biomas_4326_sub", "ref_core.biomas_4326",
            "ref.biomas_4326_sub", "ref.biomas_4326",
        ),
    ),
}


def pick_ref_core_source(
    entity: str, tables: dict[str, DataFrame]
) -> tuple[str, DataFrame]:
    """First available table in the entity's fixed precedence order
    (00_build_ref_core.sql:33-62). ``tables`` is keyed by qualified
    name ('ref_core.ucs_4326', 'ref.biomas_4326', ...); lookup is
    case-insensitive, matching to_regclass."""
    spec = SPECS[entity]
    low = {k.lower(): k for k in tables}
    for cand in spec.source_precedence:
        key = low.get(cand.lower())
        if key is not None:
            return key, tables[key]
    raise LookupError(f"nenhuma fonte {entity.upper()} encontrada em schema ref")


def _present(columns: list[str], candidates: tuple[str, ...]) -> list[str]:
    """Candidate columns that exist, in CANDIDATE order (the foreach
    loop preserves candidate order, not table order)."""
    low = {c.lower(): c for c in columns}
    return [low[c] for c in candidates if c in low]


def _coalesce_expr(cols: list[str]):
    """coalesce(nullif(trim(col::text), ''), ...) over the present
    candidates (00_build_ref_core.sql:87-101): blank and whitespace
    values fall through to the next candidate per ROW."""
    parts = [
        F.nullif(F.trim(F.col(c).cast("string")), F.lit("")) for c in cols
    ]
    return parts[0] if len(parts) == 1 else F.coalesce(*parts)


def build_ref_core_dim(df: DataFrame, entity: str) -> DataFrame:
    """Canonicalize one reference dim table: discover code/name/geom
    columns from the candidate lists over ``df.columns``, project to
    (code, name, geom), and keep rows with non-null geometry AND code
    (00_build_ref_core.sql:124-135 where-clause)."""
    spec = SPECS[entity]
    code_cols = _present(df.columns, spec.code_candidates)
    if not code_cols:
        raise ValueError(f"no {entity} code column in {df.columns[:40]}")
    name_cols = _present(df.columns, spec.name_candidates)
    geom_cols = _present(df.columns, tuple(GEOM_CANDIDATES))
    if not geom_cols:
        raise ValueError(f"no geometry column in {df.columns[:40]}")

    code_expr = _coalesce_expr(code_cols)
    # name falls back to the CODE expression when no name candidate
    # exists (00_build_ref_core.sql:118-122)
    name_expr = _coalesce_expr(name_cols) if name_cols else code_expr
    geom_col = geom_cols[0]

    return (
        df.filter(F.col(geom_col).isNotNull() & code_expr.isNotNull())
        .select(
            code_expr.alias(spec.code_out),
            name_expr.alias(spec.name_out),
            F.col(geom_col).alias("geom"),
        )
    )


def build_ref_core(
    tables: dict[str, DataFrame]
) -> dict[str, tuple[str, DataFrame]]:
    """The full ref_core build: route each entity to its precedence
    source and canonicalize. Returns {entity: (source_name, dim_df)}."""
    out: dict[str, tuple[str, DataFrame]] = {}
    for entity in SPECS:
        src_name, src_df = pick_ref_core_source(entity, tables)
        out[entity] = (src_name, build_ref_core_dim(src_df, entity))
    return out
