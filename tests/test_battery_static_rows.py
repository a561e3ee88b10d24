"""Pins for the baked static-ANN oracle rows (VERDICT r11 #1).

The llm_ops_battery's five static ANN branches (sim7/8/9/10/11) ship
BAKED expected rows in suite/sim_static_rows.py instead of inlining
1.18 MB of codebook-arithmetic SQL that OOMed DuckDB at the driver's
memory cap. Three properties keep that honest:

1. Re-derivation: the baked rows equal what the FULL static SQLs
   (suite/sim*_model.py — the previous inlined oracle text, still the
   authority) compute over each driver corpus, bit-exact.
2. Fingerprint dispatch: each corpus resolves to exactly its own row
   set; an unknown corpus yields ZERO sim rows so the driver's
   row-count gate fails loudly rather than passing silently.
3. Memory: the full battery oracle completes under a deliberately low
   DuckDB memory_limit, so the r11 fragility cannot silently return.
"""

from __future__ import annotations

import duckdb
import pytest

from inpe_queimadas_etl_spark.session import TABLE_NAMES
from inpe_queimadas_etl_spark.suite.sim_static_rows import (
    SIM_STATIC_EXPECTED,
    SIM_STATIC_FP_SQL,
    sim_static_expected_sql,
)

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

EXPECTED_N_BATTERY = {SF0001: 4498, SF001: 4496}


def _con(sf_dir: str, memory_limit: str | None = None):
    con = duckdb.connect()
    if memory_limit is not None:
        con.execute(f"SET memory_limit='{memory_limit}'")
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _full_static_branches() -> list[tuple[str, str]]:
    from inpe_queimadas_etl_spark.suite.llmdata import SIM8_STATIC_SQL
    from inpe_queimadas_etl_spark.suite.sim7_model import SIM7_STATIC_SQL
    from inpe_queimadas_etl_spark.suite.sim9_model import SIM9_STATIC_SQL
    from inpe_queimadas_etl_spark.suite.sim10_model import SIM10_STATIC_SQL
    from inpe_queimadas_etl_spark.suite.sim11_model import SIM11_STATIC_SQL

    return [
        ("sim7", SIM7_STATIC_SQL),
        ("sim8", SIM8_STATIC_SQL),
        ("sim9", SIM9_STATIC_SQL),
        ("sim10", SIM10_STATIC_SQL),
        ("sim11", SIM11_STATIC_SQL),
    ]


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_baked_rows_rederive_from_full_static_sql(sf):
    """Property 1: run the 1.18 MB authority SQL live and demand the
    baked rows match it bit-exact (keys, ranks, and the sim doubles —
    repr() round-trips, so == is exact float equality)."""
    con = _con(sf)
    fp = con.execute(SIM_STATIC_FP_SQL).fetchone()[0]
    assert fp in SIM_STATIC_EXPECTED, (
        f"corpus fingerprint {fp} not baked for {sf}"
    )
    rederived = []
    for chk, sql in _full_static_branches():
        for qid, nid, rank, sim in con.execute(sql).fetchall():
            rederived.append((chk, f"{qid}:{nid}", int(rank), sim))
    # baked rows are stored canonically sorted (generator contract)
    assert sorted(rederived) == SIM_STATIC_EXPECTED[fp]


def test_fingerprints_distinct_and_dispatch_exact():
    """Property 2a: the two baked corpora carry distinct fingerprints
    and the dispatch SQL yields exactly each corpus's own row set."""
    fps = {}
    for sf in (SF0001, SF001):
        con = _con(sf)
        fps[sf] = con.execute(SIM_STATIC_FP_SQL).fetchone()[0]
        got = con.execute(sim_static_expected_sql()).fetchall()
        assert sorted(got) == SIM_STATIC_EXPECTED[fps[sf]]
    assert fps[SF0001] != fps[SF001]
    assert len(SIM_STATIC_EXPECTED) == 2


def test_unknown_corpus_fails_loud_not_silent():
    """Property 2b: a corpus outside the baked set (sf0.1 here) yields
    ZERO sim rows — the battery row-count gate then fails loudly."""
    con = _con("/root/testdata/sf0.1")
    got = con.execute(sim_static_expected_sql()).fetchall()
    assert got == []


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_battery_oracle_runs_under_low_memory_limit(sf):
    """Property 3 (VERDICT r12 task #1): the FULL battery oracle —
    the exact string the driver executes — completes under a 500 MB
    DuckDB memory_limit at both driver corpora and returns the
    documented row count, with all five static branches present at 40
    rows each. r11's inlined form OOMed at this limit."""
    from inpe_queimadas_etl_spark.suite import all_oracles

    sql = all_oracles()["llm_ops_battery"]
    assert len(sql) < 100_000, "battery oracle ballooned again"
    con = _con(sf, memory_limit="500MB")
    df = con.execute(sql).df()
    assert len(df) == EXPECTED_N_BATTERY[sf]
    counts = df[df.chk.isin(["sim7", "sim8", "sim9", "sim10", "sim11"])][
        "chk"
    ].value_counts()
    assert sorted(counts.index) == ["sim10", "sim11", "sim7", "sim8", "sim9"]
    assert (counts == 40).all()
