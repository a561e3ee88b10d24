"""Paragraph-mode passage dedup (operators/textdedup.py): blank-line
separated corpora with shared boilerplate paragraphs, DuckDB oracle
parity. The fixed mode is oracle-checked as dd8 in
tests/test_suite_oracle.py."""

from __future__ import annotations

import duckdb
import pandas as pd

from inpe_queimadas_etl_spark.operators.textdedup import passage_dedup

BOILER = "this software is provided as is without warranty"
SEP = "\n\n"

DOCS = [
    (0, SEP.join(["alpha beta gamma", BOILER, "delta epsilon"])),
    (1, SEP.join([BOILER, "zeta eta theta iota"])),
    (2, SEP.join(["kappa lambda", "mu nu xi omicron"])),
    (3, BOILER),  # entire doc is the boilerplate
]

PARAGRAPH_ORACLE = f"""
    WITH w AS (
        SELECT doc_id, string_split(text, '{SEP}') AS w FROM docs
    ),
    ch AS (
        SELECT doc_id, c - 1 AS c, w[c] AS chunk
        FROM w, LATERAL (
            SELECT unnest(generate_series(1, len(w))) AS c
        )
    ),
    dup AS (
        SELECT chunk FROM ch GROUP BY chunk
        HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (SELECT * FROM ch WHERE chunk NOT IN (SELECT chunk FROM dup)),
    re AS (
        SELECT doc_id,
               string_agg(chunk, '{SEP}' ORDER BY c) AS clean_text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    tot AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_chunks FROM w
    )
    SELECT d.doc_id,
           coalesce(re.clean_text, '') AS clean_text,
           tot.n_chunks,
           tot.n_chunks - coalesce(re.n_kept, 0) AS n_removed
    FROM docs d
    JOIN tot ON tot.doc_id = d.doc_id
    LEFT JOIN re ON re.doc_id = d.doc_id
"""


def _run(spark):
    pdf = pd.DataFrame(DOCS, columns=["doc_id", "text"])
    out = (
        passage_dedup(spark.createDataFrame(pdf), mode="paragraph", sep=SEP)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("docs", pdf)
    want = (
        con.execute(PARAGRAPH_ORACLE)
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    return out, want


def test_paragraph_mode_matches_oracle(spark):
    out, want = _run(spark)
    assert out.columns.tolist() == want.columns.tolist()
    for col in out.columns:
        assert out[col].tolist() == want[col].tolist(), (
            col,
            out[col].tolist(),
            want[col].tolist(),
        )


def test_paragraph_mode_semantics(spark):
    out, _ = _run(spark)
    out = out.set_index("doc_id")
    # the shared boilerplate paragraph vanishes everywhere it appears
    for d in (0, 1, 3):
        assert BOILER not in out.loc[d, "clean_text"]
        assert out.loc[d, "n_removed"] == 1
    # doc 0 keeps its other paragraphs, in order, sep-joined
    assert out.loc[0, "clean_text"] == f"alpha beta gamma{SEP}delta epsilon"
    # a fully-boilerplate doc empties out
    assert out.loc[3, "clean_text"] == "" and out.loc[3, "n_chunks"] == 1
    # an untouched doc round-trips byte-identically
    assert out.loc[2, "clean_text"] == DOCS[2][1]
    assert out.loc[2, "n_removed"] == 0
