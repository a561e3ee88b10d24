"""Product-quantization ANN building blocks (sim8): train / encode /
ADC lookup tables.

PQ (Jégou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public method) splits the embedding dimension
into ``m`` subspaces, k-means-quantizes each subspace independently to
``ks`` centroids, and stores each vector as ``m`` small codes. At the
demo geometry (dim 64, m=8, ks=16) a vector is 8 codes ≈ 8 bytes vs
256 bytes of float32 — 32x compression, 4x beyond sim5's SQ8 — and
search never decodes the corpus: a query builds an m x ks table of
sub-inner-products once (the Asymmetric Distance Computation trick)
and each corpus row's approximate score is m table lookups. 100 TB of
float32 embeddings become ~3 TB of codes; the serving scan reads ONLY
(vec_id, codes).

Cross-engine exactness strategy (the emb1/cur8 bit-parity convention,
pushed further): every numeric expression downstream of the trained
codebook — sub-distances for encoding, the query LUTs, the ADC score —
is emitted by ONE Python generator as fully UNROLLED, LEFT-ASSOCIATED
arithmetic over literal centroid components, in two dialects that
differ only in array-index base (Spark ``v[i]`` is 0-based, DuckDB
``v[i+1]``) and float-literal suffix (Spark needs ``D`` or the literal
silently parses as DECIMAL — the r6 trap). Identical literals +
identical operation order = bit-identical IEEE doubles in Spark SQL,
DuckDB, and the numpy fast path (which replays the same left-to-right
accumulation), so the encoded codes and the candidate SET under the
ADC order match exactly across engines — no tie-margin arguments
needed anywhere upstream of the final exact rerank.

Scale notes: training is sample-sized by design (the tx10 convention —
a PQ codebook is fit on a bounded sample, never the corpus); encoding
is one zero-shuffle scan (Arrow-batched numpy in production,
``pq_encode``; the JVM unrolled-expression form ``pq_encode_ref`` is
the parity anchor, exact-equality-pinned in tests/test_pq.py); the
ADC scan is pure unrolled JVM arithmetic over the codes column —
whole-stage-codegen friendly, no UDF, no HOF lambda interpretation.

Reference parity: the reference engine has no ANN surface; sim8 is
part of the brief's similarity-search tier (brute-force sim1 baseline
-> LSH sim3 -> IVF sim4 -> SQ8 sim5 -> IVF x SQ8 sim6/sim7 -> PQ/ADC
sim8 as the memory-floor scale path).
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Codebook = Sequence[Sequence[Sequence[float]]]  # [m][ks][dsub]


# --------------------------------------------------------------------------
# training (driver-side, sample-sized by design)
# --------------------------------------------------------------------------


def train_pq_codebook(
    emb: DataFrame,
    m: int = 8,
    ks: int = 16,
    sample_n: int = 4096,
    iters: int = 8,
    vec_col: str = "v",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means on a bounded, deterministic sample
    (first ``sample_n`` rows in ``id_col`` order — the sim6 first-K
    seeding convention, applied to training data selection).

    Driver-side numpy on sample_n x dim doubles: a PQ codebook is a
    train-once artifact fit on a sample, never the corpus (the tx10
    scale argument); at sample_n=4096, dim=64 that is 2 MB. Init per
    subspace = first ``ks`` DISTINCT subvectors in id order, then
    ``iters`` fixed Lloyd rounds (argmin ties to the lowest centroid
    index; an emptied centroid keeps its previous position), so the
    result is deterministic for a given table."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_n)
        .collect()
    )
    X = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    cb: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        seen: set[tuple] = set()
        init: list = []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                init.append(row.copy())
            if len(init) == ks:
                break
        C = np.array(init, dtype=np.float64)
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(C.shape[0]):
                mask = assign == k
                if mask.any():
                    C[k] = S[mask].mean(axis=0)
        cb.append([[float(x) for x in c] for c in C])
    return cb


# --------------------------------------------------------------------------
# the two-dialect expression generator
# --------------------------------------------------------------------------


def _flit(x: float, dialect: str) -> str:
    """A float literal that parses to the exact same double in both
    engines. Spark REQUIRES the D suffix (a bare decimal literal is
    DECIMAL and silently rounds — the r6 emb1 trap); DuckDB parses
    17-significant-digit decimals exactly (DECIMAL(38) -> correctly
    rounded DOUBLE == direct parse) and scientific notation directly
    as DOUBLE."""
    r = repr(float(x))
    return f"{r}D" if dialect == "spark" else r


def _el(arr: str, i: int, dialect: str) -> str:
    """Static array element: Spark brackets are 0-based, DuckDB's
    1-based."""
    return f"{arr}[{i}]" if dialect == "spark" else f"{arr}[{i + 1}]"


def _el_dyn(arr: str, idx_expr: str, dialect: str) -> str:
    """Array element at a runtime 0-based index expression."""
    if dialect == "spark":
        return f"{arr}[{idx_expr}]"
    return f"{arr}[({idx_expr}) + 1]"


def _arr(items: Sequence[str], dialect: str) -> str:
    body = ", ".join(items)
    return f"array({body})" if dialect == "spark" else f"[{body}]"


def _chain_add(terms: Sequence[str]) -> str:
    """Left-associated sum — the ONE accumulation order every engine
    and the numpy replay share."""
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def pq_dist_arrays(
    cb: Codebook, dialect: str, vec_col: str = "v"
) -> list[str]:
    """Per-subspace array expressions of squared L2 distances to each
    centroid: ``[d(sub_j, c_j0), ..., d(sub_j, c_j{ks-1})]`` with every
    ``(c_i - v[...]) * (c_i - v[...])`` term unrolled from codebook
    literals and summed left-associated."""
    dsub = len(cb[0][0])
    out = []
    for j, cents in enumerate(cb):
        dists = []
        for c in cents:
            terms = []
            for i, ci in enumerate(c):
                lit = _flit(ci, dialect)
                el = _el(vec_col, j * dsub + i, dialect)
                terms.append(f"({lit} - {el}) * ({lit} - {el})")
            dists.append(_chain_add(terms))
        out.append(_arr(dists, dialect))
    return out


def pq_argmin_expr(dist_col: str, dialect: str) -> str:
    """0-based index of the minimum distance; both engines' position
    functions return the FIRST match, so exact ties break identically
    (lowest centroid index)."""
    if dialect == "spark":
        pos = f"array_position({dist_col}, array_min({dist_col}))"
    else:
        pos = f"list_position({dist_col}, list_min({dist_col}))"
    return f"CAST({pos} - 1 AS INT)"


def pq_lut_arrays(
    cb: Codebook, dialect: str, query_col: str = "qv"
) -> list[str]:
    """Per-subspace ADC lookup tables for a query row: ``lut_j[k] =
    <c_jk, q_j>`` unrolled left-associated from codebook literals."""
    dsub = len(cb[0][0])
    out = []
    for j, cents in enumerate(cb):
        ips = []
        for c in cents:
            terms = []
            for i, ci in enumerate(c):
                lit = _flit(ci, dialect)
                el = _el(query_col, j * dsub + i, dialect)
                terms.append(f"{lit} * {el}")
            ips.append(_chain_add(terms))
        out.append(_arr(ips, dialect))
    return out


def pq_centroid_sqnorms(cb: Codebook) -> list[list[float]]:
    """``nsq[j][k] = ||c_jk||^2`` accumulated left-associated in
    Python floats — constants baked as literals, so no engine ever
    recomputes them (identical by construction)."""
    out = []
    for cents in cb:
        row = []
        for c in cents:
            acc = c[0] * c[0]
            for x in c[1:]:
                acc = acc + x * x
            row.append(acc)
        out.append(row)
    return out


def pq_adc_score_expr(
    cb: Codebook,
    dialect: str,
    codes_col: str = "codes",
    lut_prefix: str = "lut_",
) -> str:
    """Approximate cosine numerator/denominator from codes + LUT
    columns: ``sum_j lut_j[code_j] / sqrt(sum_j nsq[j][code_j])``.
    The query norm is a per-query constant, so dividing by it cannot
    change any per-query ordering — the exact rerank restores true
    cosine values for the final k."""
    nsq = pq_centroid_sqnorms(cb)
    ip_terms = []
    n2_terms = []
    for j in range(len(cb)):
        code_j = _el(codes_col, j, dialect)
        ip_terms.append(_el_dyn(f"{lut_prefix}{j}", code_j, dialect))
        nsq_arr = _arr([_flit(x, dialect) for x in nsq[j]], dialect)
        n2_terms.append(_el_dyn(nsq_arr, code_j, dialect))
    return (
        f"({_chain_add(ip_terms)}) / sqrt({_chain_add(n2_terms)})"
    )


# --------------------------------------------------------------------------
# encoding
# --------------------------------------------------------------------------


def pq_encode_ref(
    df: DataFrame, cb: Codebook, vec_col: str = "v", id_col: str = "vec_id"
) -> DataFrame:
    """JVM-expression reference encoder: ``(id, codes)`` via the
    unrolled literal distance arrays — zero shuffle, zero Python, the
    parity anchor for the Arrow fast path (the _ivf_assign_ref
    convention). At the demo geometry the m*ks unrolled distance
    expressions exceed janino's 64KB generated-method limit, so
    whole-stage codegen falls back to interpreted evaluation (a WARN,
    correctness unaffected) — one more reason ``pq_encode`` is the
    production path."""
    dists = pq_dist_arrays(cb, "spark", vec_col)
    staged = df.select(
        id_col,
        *[F.expr(d).alias(f"_d{j}") for j, d in enumerate(dists)],
    )
    return staged.select(
        id_col,
        F.array(
            *[
                F.expr(pq_argmin_expr(f"_d{j}", "spark"))
                for j in range(len(cb))
            ]
        ).alias("codes"),
    )


def pq_encode(
    df: DataFrame, cb: Codebook, vec_col: str = "v", id_col: str = "vec_id"
) -> DataFrame:
    """Production encoder: one Arrow-batched mapInPandas scan, numpy
    replaying the EXACT left-to-right accumulation order of the
    unrolled JVM form (term i added in subspace order, ``(c - v)^2``
    == ``(v - c)^2`` bit-for-bit since IEEE negation is exact), so
    codes are bit-identical to ``pq_encode_ref`` — pinned in
    tests/test_pq.py. Zero shuffle; the per-batch cost is m matrix
    ops at memory bandwidth (the nearest_centroid argument)."""
    import numpy as np
    import pandas as pd

    m, ks, dsub = len(cb), len(cb[0]), len(cb[0][0])
    C = np.array(cb, dtype=np.float64)  # (m, ks, dsub)

    def encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            n = X.shape[0]
            codes = np.empty((n, m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                acc = (C[j][None, :, 0] - S[:, 0:1]) ** 2
                for i in range(1, dsub):
                    t = (C[j][None, :, i] - S[:, i : i + 1]) ** 2
                    acc = acc + t
                codes[:, j] = acc.argmin(axis=1)  # ties -> lowest k
            yield pd.DataFrame(
                {id_col: pdf[id_col].values, "codes": list(codes)}
            )

    out_schema = f"{id_col} long, codes array<int>"
    return df.select(id_col, vec_col).mapInPandas(encode, out_schema)


# --------------------------------------------------------------------------
# the DuckDB search mirror
# --------------------------------------------------------------------------


def pq_search_oracle_sql(cb: Codebook, cand: int) -> str:
    """The DuckDB mirror of the full PQ/ADC search (encode -> LUT ->
    ADC score -> top-``cand`` cut -> exact rerank -> top-5), generated
    from a codebook through the same two-dialect expression generator
    the Spark side uses — identical literal text, left-associated
    order — so the candidate set matches bit for bit; only the final
    rerank cosine uses DuckDB's list_cosine_similarity (the SIM5_SQL
    convention, compared at round(sim, 4))."""
    m = len(cb)
    dist_cols = ", ".join(
        f"{e} AS d{j}" for j, e in enumerate(pq_dist_arrays(cb, "duckdb"))
    )
    codes = ", ".join(pq_argmin_expr(f"d{j}", "duckdb") for j in range(m))
    lut_cols = ", ".join(
        f"{e} AS lut_{j}"
        for j, e in enumerate(pq_lut_arrays(cb, "duckdb", "qv"))
    )
    score = pq_adc_score_expr(cb, "duckdb")
    return f"""
WITH base AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
dists AS (
    SELECT vec_id, {dist_cols} FROM base
),
enc AS (
    SELECT vec_id, [{codes}] AS codes FROM dists
),
q AS (
    SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 8
),
lut AS (
    SELECT query_id, {lut_cols} FROM q
),
scored AS (
    SELECT l.query_id, e.vec_id, {score} AS pq_score
    FROM enc e CROSS JOIN lut l
    WHERE e.vec_id <> l.query_id
),
cand AS (
    SELECT query_id, vec_id FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY pq_score DESC, vec_id ASC
        ) AS rn FROM scored
    ) WHERE rn <= {cand}
),
rerank AS (
    SELECT c.query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.qv, b.v) AS sim
    FROM cand c
    JOIN base b ON b.vec_id = c.vec_id
    JOIN q ON q.query_id = c.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       round(sim, 4) AS sim
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
    ) AS rank FROM rerank
) WHERE rank <= 5
"""
