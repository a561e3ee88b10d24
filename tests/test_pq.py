"""sim8 product-quantization ANN: cross-engine oracle parity, encode
fast-path parity, recall vs exact, and plan shape.

sim8 is unregistered (50-entry driver snapshot cap) but carries the
full oracle comparison here — and a stronger one than the rounded
projections most entries get: the two-dialect expression generator
(operators/pq.py) makes the codes and the ADC candidate set
bit-identical between Spark and DuckDB by construction, so the
comparison pins the entire pipeline."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from inpe_queimadas_etl_spark.session import TABLE_NAMES
from inpe_queimadas_etl_spark.suite.llmdata import (
    _sim8_codebook,
    _sim8_emb,
    sim8_oracle_sql,
    sim8_pq_adc,
)

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        ["query_id", "rank"], ignore_index=True
    )


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim8_matches_oracle(spark, sf):
    sdf = _norm(sim8_pq_adc(spark, sf).toPandas())
    odf = _norm(_duck(sf, sim8_oracle_sql(spark, sf)))
    assert len(sdf) == len(odf)
    assert list(sdf.columns) == list(odf.columns)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_pq_encode_fastpath_matches_ref_exactly(spark, sf):
    """The Arrow/numpy encoder must reproduce the unrolled-JVM
    reference codes BIT-IDENTICALLY (IEEE replay of the same
    left-associated accumulation), not approximately — same argmin,
    same tie winners."""
    from inpe_queimadas_etl_spark.operators.pq import (
        pq_encode,
        pq_encode_ref,
    )

    emb = _sim8_emb(spark, sf)
    cb = _sim8_codebook(emb, sf)
    fast = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cb).collect()
    }
    ref = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode_ref(emb, cb).collect()
    }
    assert fast == ref


def test_sim8_recall_vs_exact(spark):
    """Measured quality of the 32x-compressed path: top-5 recall vs
    sim1's exact float results at sf0.01 (500 vectors, so C=100
    candidates = 20% of the corpus per query — a real cut, unlike
    sf0.001 where C covers most of the table). PQ at m=8/ks=16 is a
    much coarser quantizer than SQ8 and the synthetic embeddings are
    near-random (tiny neighbor margins — the hard case for any
    approximate ranking), so the measured sweep (ks 16/32 x C
    40/64/100) picked C=100: recall 0.90, top-1 surviving for every
    query. Gate at >= 0.85 + top-1 survival."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim1_knn_cosine_topk,
    )

    exact = sim1_knn_cosine_topk(spark, SF001).toPandas()
    got_df = sim8_pq_adc(spark, SF001).toPandas()
    hits = total = 0
    for qid, grp in exact.groupby("query_id"):
        want = set(grp["neighbor_id"])
        got = set(got_df[got_df["query_id"] == qid]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
        top1 = grp.sort_values("rank").iloc[0]["neighbor_id"]
        assert top1 in got, (qid, top1, got)
    assert hits / total >= 0.85, f"pq recall {hits}/{total}"


def test_pq_trainer_is_deterministic(spark):
    emb = _sim8_emb(spark, SF0001)
    from inpe_queimadas_etl_spark.operators.pq import train_pq_codebook

    a = train_pq_codebook(emb, m=8, ks=16)
    b = train_pq_codebook(emb, m=8, ks=16)
    assert a == b
    assert len(a) == 8 and all(len(j) == 16 for j in a)
    assert all(len(c) == 8 for j in a for c in j)


def test_pq_plan_shapes(spark):
    """Scale pins: (1) encoding is one zero-Exchange Arrow scan;
    (2) the ADC scoring scan carries no row-at-a-time Python
    (BatchEvalPython) — its only Python boundary is the Arrow encode;
    (3) the candidate rerank attaches queries via broadcast."""
    from inpe_queimadas_etl_spark.operators.pq import pq_encode

    emb = _sim8_emb(spark, SF0001)
    cb = _sim8_codebook(emb, SF0001)
    enc_plan = pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in enc_plan, enc_plan
    full_plan = (
        sim8_pq_adc(spark, SF0001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in full_plan
    assert "BroadcastExchange" in full_plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim9_matches_oracle(spark, sf):
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim9_ivfpq_ann,
        sim9_oracle_sql,
    )

    sdf = _norm(sim9_ivfpq_ann(spark, sf).toPandas())
    odf = _norm(_duck(sf, sim9_oracle_sql(spark, sf)))
    assert len(sdf) == len(odf)
    assert list(sdf.columns) == list(odf.columns)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


def test_sim9_recall_vs_exact_within_probes(spark):
    """IVF-PQ quality at sf0.01, measured two ways against the
    sim6-convention queries (vec_id 8..16):

    - vs the PROBE-SCOPED exact top-5 (what sim6 itself is graded
      against — the coarse probe loss is sim6's, not PQ's): the
      residual-PQ ADC ranking must recover nearly everything, since
      C=100 candidates out of ~n/2 probed rows leave little room for
      quantization error to hide the true neighbors;
    - vs the GLOBAL exact top-5: bounded by the probed candidate
      fraction. Under r8's budgeted multi-probe (VERDICT r7 #3) the
      measured global recall rose 0.5 -> 0.65 at the SAME nominal
      nprobe/K = 0.5 budget (most queries buy a third, smaller
      cluster), so the floor is raised above the old probe-fraction
      bound (the sim6/sim7 honesty convention: floor, not tight)."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _cosine_top5,
        _ivf_assign,
        _sim8_emb,
        sim9_ivfpq_ann,
    )
    from pyspark.sql import functions as F

    emb = _sim8_emb(spark, SF001)
    got_df = sim9_ivfpq_ann(spark, SF001).toPandas()
    queries = (
        emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("nq"),
        )
    )
    # probe-scoped exact: brute force restricted to each query's two
    # probed clusters (recomputed from the shared assignment)
    asg = _ivf_assign(emb).select("vec_id", "centroid_id").toPandas()
    exact_all = _cosine_top5(
        emb.select("vec_id", "v", F.col("nrm").alias("nv")), queries
    ).toPandas()
    probed = {
        r["query_id"]: set(r["cids"])
        for r in sim9_probe_map(spark).collect()
    }
    cid = dict(zip(asg["vec_id"], asg["centroid_id"]))
    hits = total = ghits = 0
    for qid, grp in exact_all.groupby("query_id"):
        got = set(got_df[got_df["query_id"] == qid]["neighbor_id"])
        want_all = list(grp.sort_values("rank")["neighbor_id"])
        want_probed = [
            n for n in want_all if cid[n] in probed[qid]
        ][:5]
        hits += len(set(want_probed) & got)
        total += len(want_probed)
        ghits += len(set(want_all) & got)
    assert hits / total >= 0.9, f"probe-scoped recall {hits}/{total}"
    # global recall floor — RAISED above the fixed-probe bound (0.5)
    # by the budgeted multi-probe (measured 0.65 at sf0.01)
    assert ghits / (5 * len(probed)) >= 0.6, ghits


def sim9_probe_map(spark):
    """Each query's probed centroid ids — the operator's OWN probe
    rule (budgeted multi-probe since r8), recomputed through the
    shared `_sim9_probe`."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.suite.llmdata import (
        _SIM9_FRAC,
        _cluster_sizes,
        _ivf_assign,
        _ivf_centroids,
        _sim8_emb,
        _sim9_probe,
    )

    emb = _sim8_emb(spark, SF001)
    cent = _ivf_centroids(emb)
    return (
        _sim9_probe(
            emb,
            cent,
            sizes=_cluster_sizes(_ivf_assign(emb, centroids=cent)),
            candidate_frac=_SIM9_FRAC,
        )
        .groupBy(F.col("vec_id").alias("query_id"))
        .agg(F.collect_set("centroid_id").alias("cids"))
    )


def test_sim9_plan_shapes(spark):
    """Scale pins: the store build is window-free with zero
    non-broadcast Exchange (assignment is the Arrow argmax, aux
    attaches via broadcast), the ADC scan has no row-at-a-time
    Python, and the probe/rerank joins broadcast the small side."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim9_ivfpq_ann

    plan = (
        sim9_ivfpq_ann(spark, SF0001)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "BroadcastExchange" in plan


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim8_arrow_search_matches_jvm_ref_exactly(spark, sf):
    """VERDICT r7 #1: the Arrow ADC search path (production) must
    return IDENTICAL rows to the unrolled-JVM reference form — same
    neighbors, same ranks, bit-equal sims (the candidate sets are
    bit-identical by IEEE replay, and the shared rerank tail maps
    identical sets to identical rows)."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _sim8_topk,
        _sim8_topk_ref,
    )

    emb = _sim8_emb(spark, sf)
    cb = _sim8_codebook(emb, sf)
    fast = _norm(_sim8_topk(emb, cb).toPandas())
    ref = _norm(_sim8_topk_ref(emb, cb).toPandas())
    assert fast.equals(ref), (fast, ref)


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim8_arrow_scores_match_jvm_exactly(spark, sf):
    """Score-level pin (stronger than the row pin): every per-batch
    surviving ADC score from pq_adc_search_scan equals the JVM
    unrolled pq_adc_score_expr bit for bit for the same
    (query, vec) pair."""
    from inpe_queimadas_etl_spark.operators.pq import (
        pq_adc_score_expr,
        pq_adc_search_scan,
        pq_encode,
        pq_lut_arrays,
    )
    from pyspark.sql import functions as F

    emb = _sim8_emb(spark, sf)
    cb = _sim8_codebook(emb, sf)
    codes = pq_encode(emb, cb)
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    queries = [(r["query_id"], list(r["qv"])) for r in q.collect()]
    got = {
        (r["query_id"], r["vec_id"]): r["pq_score"]
        for r in pq_adc_search_scan(codes, cb, queries, 10**9).collect()
    }
    qlut = q.select(
        "query_id",
        *[
            F.expr(e).alias(f"lut_{j}")
            for j, e in enumerate(pq_lut_arrays(cb, "spark", "qv"))
        ],
    )
    want = {
        (r["query_id"], r["vec_id"]): r["pq_score"]
        for r in codes.crossJoin(F.broadcast(qlut))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("pq_score", F.expr(pq_adc_score_expr(cb, "spark")))
        .select("query_id", "vec_id", "pq_score")
        .collect()
    }
    assert got == want


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim9_arrow_search_matches_jvm_ref_exactly(spark, sf):
    """VERDICT r7 #1 for the IVF-PQ tier: Arrow production path ==
    unrolled-JVM reference, row for row."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim9_ivfpq_ann,
        sim9_ivfpq_ann_ref,
    )

    fast = _norm(sim9_ivfpq_ann(spark, sf).toPandas())
    ref = _norm(sim9_ivfpq_ann_ref(spark, sf).toPandas())
    assert fast.equals(ref), (fast, ref)


def test_pq_search_plan_shapes(spark):
    """The production search plans carry the Arrow scan (MapInPandas)
    and no row-at-a-time Python; the rerank still broadcasts the
    query side; the giant unrolled literal expressions are GONE from
    the plan text (no janino 64 KB fallback, no per-run analysis of
    ~1k-term chains)."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim9_ivfpq_ann

    for df in (
        sim8_pq_adc(spark, SF0001),
        sim9_ivfpq_ann(spark, SF0001),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" in plan
        assert "BroadcastExchange" in plan
        assert "lut_0" not in plan  # the unrolled LUT columns


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim7_static_matches_static_oracle(spark, sf):
    """VERDICT r7 #2: the baked-KMeans sim7 battery branch vs the
    static DuckDB oracle generated from the same frozen centroids
    (budgeted multi-probe on both sides)."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim7_static_trained_ivf,
    )
    from inpe_queimadas_etl_spark.suite.sim7_model import SIM7_STATIC_SQL

    sdf = _norm(sim7_static_trained_ivf(spark, sf).toPandas())
    odf = _norm(_duck(sf, SIM7_STATIC_SQL))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim9_static_matches_static_oracle(spark, sf):
    """VERDICT r7 #2: the baked-model sim9 battery branch (frozen
    coarse centroids + residual codebook) vs the static DuckDB oracle
    from the same constants."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim9_static_ivfpq
    from inpe_queimadas_etl_spark.suite.sim9_model import SIM9_STATIC_SQL

    sdf = _norm(sim9_static_ivfpq(spark, sf).toPandas())
    odf = _norm(_duck(sf, SIM9_STATIC_SQL))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


def test_sim9_store_partition_pruning(spark, tmp_path):
    """The probed-cluster IN filter sits below the ADC scan, so a
    store MATERIALIZED partitioned by centroid_id (the deployment
    shape sim9's docstring claims) prunes at the source: the filter
    must surface as a PartitionFilter on the parquet scan, and the
    read must touch only probed clusters' partitions."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.operators.pq import pq_encode
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _sim9_codebook,
        _sim9_residuals,
    )

    emb = _sim8_emb(spark, SF0001)
    cb = _sim9_codebook(emb, SF0001)
    codes = pq_encode(
        _sim9_residuals(emb), cb, vec_col="r", carry_cols=("centroid_id",)
    )
    path = str(tmp_path / "store9")
    codes.write.partitionBy("centroid_id").parquet(path)
    disk = spark.read.parquet(path)
    pruned = disk.filter(F.col("centroid_id").isin([0, 2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    assert "centroid_id" in plan.split("PartitionFilters")[1].split(
        "]"
    )[0], plan
    got = {
        r["centroid_id"]
        for r in pruned.select("centroid_id").distinct().collect()
    }
    assert got <= {0, 2} and got


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim10_matches_oracle(spark, sf):
    """sim10 (trained-coarse IVF-PQ — the full Faiss-canonical
    composition) vs the DuckDB mirror generated from the SAME trained
    models (coarse centroids as literal VALUES, residual codebook
    through the two-dialect generator, budgeted multi-probe)."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim10_oracle_sql,
        sim10_trained_ivfpq,
    )

    sdf = _norm(sim10_trained_ivfpq(spark, sf).toPandas())
    odf = _norm(_duck(sf, sim10_oracle_sql(spark, sf)))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


def test_sim10_recall_beats_sim9(spark):
    """The trained coarse codebook is sim10's ONLY delta vs sim9
    (shared _sim9_topk tail), so its value must be measured, not
    assumed: at the same candidate budget, global exact recall@5 at
    sf0.01 measured sim9 0.65 -> sim10 0.80 (balanced KMeans clusters
    make the budgeted probes cover the right regions). Gate: sim10
    strictly above sim9's fixed 0.65 and above 0.75 absolute."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.suite.llmdata import (
        _cosine_top5,
        _sim8_emb,
        sim10_trained_ivfpq,
        sim9_ivfpq_ann,
    )

    emb = _sim8_emb(spark, SF001)
    queries = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("nq"),
    )
    exact = _cosine_top5(
        emb.select("vec_id", "v", F.col("nrm").alias("nv")), queries
    ).toPandas()

    def recall(fn):
        got = fn(spark, SF001).toPandas()
        h = 0
        for qid, grp in exact.groupby("query_id"):
            h += len(
                set(grp["neighbor_id"])
                & set(got[got["query_id"] == qid]["neighbor_id"])
            )
        return h / len(exact)

    r9, r10 = recall(sim9_ivfpq_ann), recall(sim10_trained_ivfpq)
    assert r10 >= 0.75, (r9, r10)
    assert r10 > r9 - 1e-9, (r9, r10)


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim10_static_matches_static_oracle(spark, sf):
    """The baked-model sim10 battery branch (sim7's frozen coarse
    codebook + the residual codebook fit on its residuals) vs the
    static DuckDB oracle from the same constants."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim10_static_ivfpq
    from inpe_queimadas_etl_spark.suite.sim10_model import (
        SIM10_STATIC_SQL,
    )

    sdf = _norm(sim10_static_ivfpq(spark, sf).toPandas())
    odf = _norm(_duck(sf, SIM10_STATIC_SQL))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


def test_prune_topk_nan_matches_spark_desc_semantics(spark):
    """Per-batch prune vs Spark NaN order (review r8): an all-zero PQ
    centroid gives n2=0 and an ADC score of 0/0 = NaN. The JVM form
    under F.desc treats NaN as the LARGEST double (NaN rows rank
    FIRST), so the Arrow per-batch prune must keep them too — a naive
    lexsort on -score drops them and breaks the
    superset-of-global-top-C invariant. Arrow transfer surfaces those
    NaN scores as NULL on the Spark side, which is why the production
    global windows order by desc_nulls_first: null (née NaN) ranks
    exactly where the JVM's NaN does."""
    from inpe_queimadas_etl_spark.operators.pq import pq_adc_search_scan

    cb = [[[0.0], [1.0]]]  # m=1, ks=2, dsub=1; centroid 0 is zero
    codes = spark.createDataFrame(
        [(10, [0]), (11, [0]), (12, [0]), (13, [1]), (14, [1])],
        "vec_id long, codes array<int>",
    ).coalesce(1)  # one Arrow batch, so the per-batch prune IS the cut
    rows = pq_adc_search_scan(codes, cb, [(99, [2.0])], cand=2).collect()
    assert {r["vec_id"] for r in rows} == {10, 11}  # NaN first, id asc
    assert all(r["pq_score"] is None for r in rows)  # Arrow NaN->null


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_fused_ivfpq_encode_matches_compositional_exactly(spark, sf):
    """VERDICT r8 #3: the fused Arrow store build (assign + residual +
    encode in one numpy scan, pq_ivf_encode) must be BIT-EQUAL to the
    compositional path (_ivf_assign -> broadcast-join residual via the
    unrolled arr_sub expression -> separate pq_encode scan) — same
    assignment, same codes, every row."""
    from inpe_queimadas_etl_spark.operators.pq import (
        pq_encode,
        pq_ivf_encode,
    )
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _ivf_centroids,
        _sim9_codebook,
        _sim9_residuals,
    )

    emb = _sim8_emb(spark, sf)
    cb = _sim9_codebook(emb, sf)
    cent = _ivf_centroids(emb)
    cents3 = sorted(
        (r["centroid_id"], list(r["cv"]), r["cn"])
        for r in cent.select("centroid_id", "cv", "cn").collect()
    )
    fused = {
        r["vec_id"]: (r["centroid_id"], tuple(r["codes"]))
        for r in pq_ivf_encode(emb, cents3, cb).collect()
    }
    comp = {
        r["vec_id"]: (r["centroid_id"], tuple(r["codes"]))
        for r in pq_encode(
            _sim9_residuals(emb, cent),
            cb,
            vec_col="r",
            carry_cols=("centroid_id",),
        ).collect()
    }
    assert fused == comp


def test_fused_ivfpq_encode_rejects_sparse_codebook(spark):
    """best_id indexes the centroid matrix positionally, so ids must
    be 0..K-1 — a gapped codebook is a contract violation, refused
    loudly instead of silently mis-assigning."""
    from inpe_queimadas_etl_spark.operators.pq import pq_ivf_encode

    emb = _sim8_emb(spark, SF0001)
    cb = _sim8_codebook(emb, SF0001)
    with pytest.raises(ValueError, match="0..K-1"):
        pq_ivf_encode(emb, [(0, [0.0] * 64, 0.0), (2, [0.0] * 64, 0.0)], cb)


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim11_matches_oracle(spark, sf):
    """sim11 (OPQ-rotated IVF-PQ, Ge et al. 2013) vs the DuckDB
    mirror from the SAME trained models — the rotation rides the
    two-dialect generator (rot_vec_expr chains), so rotated codes and
    ADC candidate sets stay bit-identical cross-engine."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim11_opq_ivfpq,
        sim11_oracle_sql,
    )

    sdf = _norm(sim11_opq_ivfpq(spark, sf).toPandas())
    odf = _norm(_duck(sf, sim11_oracle_sql(spark, sf)))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )


def test_sim11_opq_error_and_recall(spark):
    """The OPQ value claim, measured not assumed: on the SAME
    training sample sim10's codebook fits on, the learned rotation
    must cut quantization error MATERIALLY (>= 5 %; the identity
    candidate is in the kept set, so <= holds by construction —
    measured ~15 % at sf0.001 and sf0.01). Recall@5 at equal budget
    is reported and floored, NOT gated above sim10's: at demo scale
    recall is step-quantized at 0.025/hit (sf0.01 measured sim10 0.80
    -> sim11 0.75 — two of forty neighbors traded out of the
    candidate set), so the trained objective (error) is the stable
    signal and the honest gate."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.suite.llmdata import (
        _SIM11_CACHE,
        _cosine_top5,
        _sim11_models,
        sim11_opq_ivfpq,
    )

    _sim11_models(spark, SF001)
    _rot, _cb, err_opq, err_id = _SIM11_CACHE[(SF001, 4)]
    assert err_opq <= err_id  # by construction (identity candidate)
    assert err_opq < 0.95 * err_id, (err_opq, err_id)  # material win

    emb = _sim8_emb(spark, SF001)
    queries = emb.filter(
        (F.col("vec_id") >= 8) & (F.col("vec_id") < 16)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("nq"),
    )
    exact = _cosine_top5(
        emb.select("vec_id", "v", F.col("nrm").alias("nv")), queries
    ).toPandas()
    got = sim11_opq_ivfpq(spark, SF001).toPandas()
    hits = 0
    for qid, grp in exact.groupby("query_id"):
        hits += len(
            set(grp["neighbor_id"])
            & set(got[got["query_id"] == qid]["neighbor_id"])
        )
    assert hits / len(exact) >= 0.70, hits / len(exact)


def test_opq_rotation_is_orthogonal_and_kept_best(spark):
    """The trainer's contract: R orthogonal (codes preserve norms, so
    the ADC reconstruction algebra stays exact), err_opq <= the
    identity candidate's error, determinism across calls on the same
    sample."""
    import numpy as np

    from inpe_queimadas_etl_spark.operators.pq import train_opq_rotation

    rng = np.random.RandomState(7)
    X = rng.randn(512, 16)
    r1 = train_opq_rotation(X, m=4, ks=8, opq_iters=4, pq_iters=4)
    r2 = train_opq_rotation(X, m=4, ks=8, opq_iters=4, pq_iters=4)
    rot, _cb, err_opq, err_id = r1
    R = np.array(rot)
    assert np.abs(R @ R.T - np.eye(16)).max() < 1e-9
    assert err_opq <= err_id
    assert r1 == r2  # deterministic


@pytest.mark.parametrize("sf", [SF0001, SF001])
def test_sim11_static_matches_static_oracle(spark, sf):
    """The baked-model sim11 battery branch (sim7's frozen coarse
    codebook + the frozen OPQ rotation and rotated-residual codebook,
    suite/sim11_model.py) vs the static DuckDB oracle from the same
    constants — rotation chains included in the generated SQL."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        sim11_static_opq_ivfpq,
    )
    from inpe_queimadas_etl_spark.suite.sim11_model import (
        SIM11_STATIC_SQL,
    )

    sdf = _norm(sim11_static_opq_ivfpq(spark, sf).toPandas())
    odf = _norm(_duck(sf, SIM11_STATIC_SQL))
    assert len(sdf) == len(odf)
    for col in ("query_id", "neighbor_id", "rank"):
        assert sdf[col].astype("int64").tolist() == odf[col].astype(
            "int64"
        ).tolist(), col
    assert sdf["sim"].tolist() == pytest.approx(
        odf["sim"].tolist(), abs=1e-9
    )
