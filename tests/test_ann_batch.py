"""Batch-scale ANN search (VERDICT r9 #1): `api.ann_topk_batch` over
a (query_id, qv) DataFrame must return rows IDENTICAL to looping
`api.ann_topk` over the same vectors — same probe rule, scoring
chains, tie orders, tombstone filter, ranking tail — while carrying
NO per-query state in the scan closure (LUTs are computed
executor-side from the broadcast probe table). Plus the grouped
scan's low-level pin against `pq_ivf_adc_search_scan`, including the
degenerate den==0 -> NaN path and self-match displacement."""

from __future__ import annotations

import pandas as pd
import pytest

# internal-consistency soak: excluded from the driver-visible fast
# gate (pytest.ini); run with -m "slow or not slow"
pytestmark = pytest.mark.slow
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.api import ann_topk, ann_topk_batch
from inpe_queimadas_etl_spark.operators.pq import (
    build_ann_store,
    delete_from_ann_store,
    load_ann_model,
    save_ann_model,
    train_ann_model,
)

SF0001 = "/root/testdata/sf0.001"


def _emb(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import _sim8_emb

    return _sim8_emb(spark, SF0001)


def _artifacts(spark, tmp_path, opq=False, frac=0.5):
    emb = _emb(spark)
    model = train_ann_model(
        emb, k=4, m=8, ks=16, frac=frac, cand=100, opq=opq
    )
    model_path = str(tmp_path / ("opq.json" if opq else "model.json"))
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"], rot=model["rot"],
    )
    store_path = str(tmp_path / ("store_opq" if opq else "store"))
    build_ann_store(emb, load_ann_model(model_path), store_path)
    return emb, model_path, store_path


def _queries(spark, emb, lo=8, hi=40):
    """Store vectors (self-skip fires) PLUS synthetic out-of-store
    vectors under ids far above the store's (self-skip never fires)."""
    qv = [
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).collect()
    ]
    qv += [
        (10_000, [0.5] * 64),
        (10_001, [1.0] + [0.0] * 63),
        (10_002, [(-1.0) ** i * (i + 1) / 64.0 for i in range(64)]),
    ]
    qdf = spark.createDataFrame(qv, "query_id long, qv array<double>")
    return qv, qdf


def _pin_equal(got_df, want_df):
    got = (
        got_df.toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        want_df.toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


@pytest.mark.parametrize("opq", [False, True], ids=["plain", "opq"])
def test_batch_matches_looped_both_tails(spark, tmp_path, opq):
    """THE done-bar pin: batch == looped, ADC-only AND exact-rerank
    tails, plain and OPQ models, with mixed in-store/out-of-store
    queries (self-skip both firing and not)."""
    emb, model_path, store_path = _artifacts(spark, tmp_path, opq=opq)
    qv, qdf = _queries(spark, emb)
    for rerank in (None, emb):
        got = ann_topk_batch(
            spark, store_path, model_path, qdf, k=5, rerank_with=rerank
        )
        want = ann_topk(
            spark, store_path, model_path, qv, k=5, rerank_with=rerank
        )
        _pin_equal(got, want)


def test_batch_honors_tombstones_and_k(spark, tmp_path):
    emb, model_path, store_path = _artifacts(spark, tmp_path)
    qv, qdf = _queries(spark, emb, lo=8, hi=16)
    base = ann_topk_batch(
        spark, store_path, model_path, qdf, k=5, rerank_with=emb
    ).collect()
    victim = int(base[0]["neighbor_id"])
    delete_from_ann_store(store_path, [victim])
    got = ann_topk_batch(
        spark, store_path, model_path, qdf, k=3, rerank_with=emb
    )
    rows = got.collect()
    assert victim not in {int(r["neighbor_id"]) for r in rows}
    for _, grp in pd.DataFrame([r.asDict() for r in rows]).groupby(
        "query_id"
    ):
        assert list(grp.sort_values("rank")["rank"]) == [1, 2, 3]
    # still equal to the looped path under the same tombstones
    _pin_equal(
        got,
        ann_topk(
            spark, store_path, model_path, qv, k=3, rerank_with=emb
        ),
    )


def test_batch_validation_and_empty(spark, tmp_path):
    emb, model_path, store_path = _artifacts(spark, tmp_path)
    _, qdf = _queries(spark, emb, lo=8, hi=12)
    with pytest.raises(ValueError, match="k must be positive"):
        ann_topk_batch(spark, store_path, model_path, qdf, k=0)
    with pytest.raises(ValueError, match="query_id, qv"):
        ann_topk_batch(
            spark, store_path, model_path,
            qdf.select(F.col("query_id").alias("id"), "qv"), k=1,
        )
    dup = qdf.union(qdf.limit(1))
    with pytest.raises(ValueError, match="unique"):
        ann_topk_batch(spark, store_path, model_path, dup, k=1)
    # ids colliding only AFTER the long cast (review r10): everything
    # downstream keys on query_id-as-long, so 1.2 and 1.7 in a double
    # column are the same silent double-score — refused too
    dup_cast = spark.createDataFrame(
        [(1.2, [0.5] * 64), (1.7, [0.25] * 64)],
        "query_id double, qv array<double>",
    )
    with pytest.raises(ValueError, match="unique"):
        ann_topk_batch(spark, store_path, model_path, dup_cast, k=1)
    # k=None: exhaustive mode — every candidate the probe budget
    # reaches comes back ranked (the decontamination consumers' shape)
    full = ann_topk_batch(
        spark, store_path, model_path, qdf.limit(1), k=None,
        rerank_with=emb,
    ).toPandas()
    assert len(full) > 100  # far beyond any serving k
    ranks = sorted(full["rank"])
    assert ranks == list(range(1, len(full) + 1))
    # per-row dim/finiteness violations surface from the executors
    bad_dim = spark.createDataFrame(
        [(1, [1.0, 2.0])], "query_id long, qv array<double>"
    )
    with pytest.raises(Exception, match="model dim"):
        ann_topk_batch(
            spark, store_path, model_path, bad_dim, k=1
        ).collect()
    bad_fin = spark.createDataFrame(
        [(1, [float("nan")] + [0.0] * 63)],
        "query_id long, qv array<double>",
    )
    with pytest.raises(Exception, match="non-finite"):
        ann_topk_batch(
            spark, store_path, model_path, bad_fin, k=1
        ).collect()
    # empty frame: empty result, right schema, both tails
    empty = spark.createDataFrame(
        [], "query_id long, qv array<double>"
    )
    out = ann_topk_batch(spark, store_path, model_path, empty, k=5)
    assert out.count() == 0
    assert sorted(out.columns) == [
        "neighbor_id", "query_id", "rank", "score",
    ]
    out2 = ann_topk_batch(
        spark, store_path, model_path, empty, k=5, rerank_with=emb
    )
    assert out2.count() == 0


def test_batch_plan_partition_prunes_no_python_rows(spark, tmp_path):
    """Scale pins on the batch plan: the store scan still partition-
    prunes to probed clusters, and there is no row-at-a-time Python
    anywhere (Arrow mapInPandas only)."""
    emb, model_path, store_path = _artifacts(
        spark, tmp_path, frac=0.25
    )
    qdf = spark.createDataFrame(
        [(10_000, [0.5] * 64)], "query_id long, qv array<double>"
    )
    df = ann_topk_batch(spark, store_path, model_path, qdf, k=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "centroid_id" in seg, plan
    assert "BatchEvalPython" not in plan


def test_semantic_decontamination_store_equals_cur7(spark, tmp_path):
    """The serving tier composing with the curation tier (VERDICT r9
    #8): cur7 semantic decontamination against a PERSISTED benchmark
    ANN store (frac=1.0, cand >= |eval|, k=|eval| — the exactness
    dial) must flag exactly the rows the in-session all-pairs form
    flags, with identical hit counts and max sims."""
    from inpe_queimadas_etl_spark.api import (
        semantic_decontamination_store,
    )
    from inpe_queimadas_etl_spark.suite.llmdata import (
        cur7_semantic_decontamination,
        load_table,
    )
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    emb = (
        load_table(spark, SF0001, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", vec_norm("v"))
    )
    eval_set = emb.filter(F.col("label") == 0).select(
        "vec_id", "v", "nrm"
    )
    corpus = emb.filter(F.col("label") != 0).select(
        "vec_id", "v", "nrm"
    )
    n_eval = eval_set.count()
    model = train_ann_model(
        eval_set, k=2, m=8, ks=16, frac=1.0, cand=max(500, n_eval)
    )
    model_path = str(tmp_path / "bench_model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"], rot=model["rot"],
    )
    store_path = str(tmp_path / "bench_store")
    build_ann_store(eval_set, load_ann_model(model_path), store_path)

    got = (
        semantic_decontamination_store(
            spark, corpus, store_path, model_path, eval_set, tau=0.35
        )
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    want = (
        cur7_semantic_decontamination(spark, SF0001)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert len(want) > 0  # the demo split does flag rows
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )


@pytest.mark.parametrize("opq", [False, True], ids=["plain", "opq"])
def test_assign_probes_replays_budget_rule_bitexactly(spark, opq):
    """`ann_assign_probes`' vectorized chains must reproduce the
    serving path's `_ann_budget_probes` + `rot_apply` EXACTLY — probe
    sets, order-defining cosines, and rotated coordinates bit for bit
    — including degenerate zero-norm queries (every csim None ->
    clusters ranked by id)."""
    import struct

    import numpy as np

    from inpe_queimadas_etl_spark.api import (
        _ann_budget_probes,
        ann_assign_probes,
    )
    from inpe_queimadas_etl_spark.operators.pq import (
        pq_ivf_encode,
        rot_apply,
    )
    from inpe_queimadas_etl_spark.suite.llmdata import _cluster_sizes

    emb = _emb(spark)
    model = train_ann_model(
        emb, k=4, m=8, ks=16, frac=0.5, cand=100, opq=opq
    )
    sizes = _cluster_sizes(
        pq_ivf_encode(emb, model["cents3"], model["cb"])
    )
    rng = np.random.default_rng(23)
    qv = [
        (i, [float(x) for x in rng.normal(0, 1, 64)]) for i in range(40)
    ]
    qv.append((100, [0.0] * 64))  # zero norm: den==0 for every cluster
    qv.append((101, [1e-160] * 64))  # den underflow candidates
    qdf = spark.createDataFrame(qv, "query_id long, qv array<double>")

    got = sorted(
        (int(r["query_id"]), int(cid), tuple(r["qvr"]))
        for r in ann_assign_probes(qdf, model, sizes).collect()
        for cid in r["qclusters"]
    )
    rot = model.get("rot")
    want = sorted(
        (
            qid,
            cid,
            tuple(v if rot is None else rot_apply(rot, v)),
        )
        for qid, cid, v in _ann_budget_probes(
            model["cents3"], qv, sizes, model["frac"]
        )
    )
    assert len(got) == len(want) > 0
    for (gq, gc, gv), (wq, wc, wv) in zip(got, want):
        assert (gq, gc) == (wq, wc)
        assert [struct.pack("<d", x) for x in gv] == [
            struct.pack("<d", x) for x in wv
        ]


def test_cli_ann_search_batch_parquet(spark, tmp_path, capsys):
    """ann-search --queries-parquet routes through ann_topk_batch and
    prints the same rows the API returns (the CLI is a veneer)."""
    import json
    import logging

    from inpe_queimadas_etl_spark import cli

    root = logging.getLogger()
    saved = (root.handlers[:], root.level)
    try:
        emb, model_path, store_path = _artifacts(spark, tmp_path)
        qv, qdf = _queries(spark, emb, lo=8, hi=12)
        qpq = str(tmp_path / "queries_parquet")
        qdf.write.parquet(qpq)
        rc = cli.main(
            [
                "ann-search",
                "--store", store_path,
                "--model", model_path,
                "--queries-parquet", qpq,
                "-k", "3",
            ]
        )
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        want = sorted(
            [
                r.asDict()
                for r in ann_topk_batch(
                    spark, store_path, model_path, qdf, k=3
                ).collect()
            ],
            key=lambda d: (d["query_id"], d["rank"]),
        )
        got = sorted(out, key=lambda d: (d["query_id"], d["rank"]))
        assert got == want
        # --out: results written as parquet, never collected (review
        # r10 — the Q=10^6 deployment shape); stdout carries only a
        # summary
        outp = str(tmp_path / "results_parquet")
        rc = cli.main(
            [
                "ann-search",
                "--store", store_path,
                "--model", model_path,
                "--queries-parquet", qpq,
                "-k", "3",
                "--out", outp,
            ]
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["rows"] == len(want) and summary["out"] == outp
        from_disk = sorted(
            [r.asDict() for r in spark.read.parquet(outp).collect()],
            key=lambda d: (d["query_id"], d["rank"]),
        )
        assert from_disk == want
        # exactly one of the two query shapes must be given
        with pytest.raises(SystemExit, match="exactly one"):
            cli.main(
                [
                    "ann-search", "--store", store_path,
                    "--model", model_path, "-k", "1",
                ]
            )
    finally:
        root.handlers[:] = saved[0]
        root.setLevel(saved[1])


def test_grouped_scan_equals_looped_scan_with_nan_and_self(spark):
    """Low-level pin of `pq_ivf_adc_search_scan_grouped` against
    `pq_ivf_adc_search_scan` on a synthetic store holding a
    degenerate zero-reconstruction cluster (den==0 -> NaN scores,
    which must rank FIRST in the candidate superset, id-ASC) and
    self-match rows that must be displaced without eating a slot."""
    import numpy as np

    from inpe_queimadas_etl_spark.operators.pq import (
        pq_ivf_adc_search_scan,
        pq_ivf_adc_search_scan_grouped,
    )

    # m=2, ks=2, dsub=2 (dim 4); subspace centroid 0 is the zero
    # vector, so codes [0,0] under the zero coarse centroid give
    # cvn2 = cross = rn2 = 0 -> den 0 -> NaN
    cb = [
        [[0.0, 0.0], [1.0, 2.0]],
        [[0.0, 0.0], [3.0, -1.0]],
    ]
    cents = [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 1.0, 1.0, 1.0])]
    rows = []
    rng = np.random.default_rng(7)
    # cluster 0: 3 degenerate rows + 20 normal; cluster 1: 25 normal
    for vid in range(3):
        rows.append((vid, 0, [0, 0]))
    for vid in range(3, 23):
        rows.append((vid, 0, [int(rng.integers(0, 2)) for _ in range(2)]))
    for vid in range(23, 48):
        rows.append((vid, 1, [int(rng.integers(0, 2)) for _ in range(2)]))
    codes = spark.createDataFrame(
        rows, "vec_id long, centroid_id long, codes array<int>"
    ).repartition(4)  # multiple batches/partitions exercise the prune
    queries = [
        (5, [0.3, -0.2, 0.9, 0.1]),    # in cluster-0's id range: self
        (30, [1.1, 0.9, 1.2, 0.8]),    # in cluster-1's range: self
        (999, [0.5, 0.5, 0.5, 0.5]),   # never a self match
    ]
    probes = [
        (5, 0, queries[0][1]),
        (5, 1, queries[0][1]),
        (30, 1, queries[1][1]),
        (999, 0, queries[2][1]),
        (999, 1, queries[2][1]),
    ]
    for cand in (4, 10, 100):
        want = (
            pq_ivf_adc_search_scan(codes, cb, cents, probes, cand)
            .toPandas()
            .sort_values(
                ["query_id", "vec_id", "pq_score"], ignore_index=True
            )
        )
        qids_arr = np.array([q for q, _ in queries], dtype=np.int64)
        qv_mat = np.array([v for _, v in queries], dtype=np.float64)
        by_cluster = {}
        for qid, cid, _ in probes:
            row = int(np.nonzero(qids_arr == qid)[0][0])
            by_cluster.setdefault(cid, []).append(row)
        bc = spark.sparkContext.broadcast(
            {
                "qids": qids_arr,
                "qv": qv_mat,
                "by_cluster": {
                    cid: np.array(idx, dtype=np.int64)
                    for cid, idx in by_cluster.items()
                },
            }
        )
        got = (
            pq_ivf_adc_search_scan_grouped(codes, cb, cents, bc, cand)
            .toPandas()
            .sort_values(
                ["query_id", "vec_id", "pq_score"], ignore_index=True
            )
        )
        # candidate SUPERSETS may differ in size across prune
        # boundaries (grouped prunes per cluster-batch, looped per
        # batch) — the pinned contract is that both carry the global
        # top-cand; compare after the same global cut
        def topcand(df, cand=cand):
            out = []
            for qid, grp in df.groupby("query_id"):
                nan = grp[grp["pq_score"].isna()].sort_values("vec_id")
                fin = grp[~grp["pq_score"].isna()].sort_values(
                    ["pq_score", "vec_id"], ascending=[False, True]
                )
                out.append(pd.concat([nan, fin]).head(cand))
            return pd.concat(out, ignore_index=True)

        pd.testing.assert_frame_equal(topcand(want), topcand(got))


def test_decontamination_flags_verbatim_copy_with_colliding_id(
    spark, tmp_path
):
    """A corpus document that is a VERBATIM copy of an eval item and
    happens to share its store vec_id — independently numbered tables
    both starting at 0, the exact case decontamination exists for —
    must be flagged (review r10 round 2: the serving tail's self-match
    skip used to treat it as a self row and silently drop the hit).
    The query-id remap into the negative namespace makes the skip
    structurally impossible; negative corpus ids are refused because
    the remap reserves that range."""
    from inpe_queimadas_etl_spark.api import (
        semantic_decontamination_store,
    )

    emb, model_path, store_path = _artifacts(spark, tmp_path, frac=1.0)
    # corpus = the first 6 STORE rows verbatim, ids unchanged — every
    # one collides with its own eval twin at sim exactly 1.0
    corpus = emb.filter(F.col("vec_id") < 6)
    got = (
        semantic_decontamination_store(
            spark, corpus, store_path, model_path, emb, tau=0.99
        )
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(got["vec_id"]) == [0, 1, 2, 3, 4, 5]
    assert (got["max_sim"] == 1.0).all()
    assert (got["n_eval_hits"] >= 1).all()

    # the refusal rides the probe-assignment scan (VERDICT r10 #3 —
    # no separate full-corpus driver action), so it surfaces as an
    # executor-raised error, message intact with the ORIGINAL id
    neg = corpus.withColumn("vec_id", -F.col("vec_id") - 1)
    with pytest.raises(Exception, match="non-negative"):
        semantic_decontamination_store(
            spark, neg, store_path, model_path, emb, tau=0.99
        )


def test_decontamination_validates_ids_inside_the_scan(
    spark, tmp_path, monkeypatch
):
    """The non-negative-id refusal must NOT cost a separate Spark
    action (VERDICT r10 #3): the old `corpus.filter(vec_id < 0)
    .first()` scanned every partition per run just to return None on
    valid input. With the check riding `ann_assign_probes`' executor
    batch loop, no driver-side `first()` runs anywhere in a
    decontamination call — pinned by making any first() call fail."""
    from pyspark.sql import DataFrame

    from inpe_queimadas_etl_spark.api import (
        semantic_decontamination_store,
    )

    emb, model_path, store_path = _artifacts(spark, tmp_path, frac=1.0)
    corpus = emb.filter(F.col("vec_id") < 6)

    def boom(self):
        raise AssertionError(
            "id validation must ride the probe scan, not a separate "
            "driver action"
        )

    monkeypatch.setattr(DataFrame, "first", boom)
    got = (
        semantic_decontamination_store(
            spark, corpus, store_path, model_path, emb, tau=0.99
        )
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    assert list(got["vec_id"]) == [0, 1, 2, 3, 4, 5]
    assert (got["max_sim"] == 1.0).all()


def test_tombstone_delete_is_locked_against_lost_updates(tmp_path):
    """`delete_from_ann_store` serializes its read-merge-write under
    an O_EXCL lock (review r10 round 2): a held lock makes a racing
    delete FAIL LOUDLY after the timeout instead of silently
    resurrecting the other writer's retired ids; the lock is released
    on success and on refusal alike."""
    import os

    from inpe_queimadas_etl_spark.operators.pq import (
        ANN_TOMBSTONES,
        delete_from_ann_store,
        read_ann_tombstones,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    assert delete_from_ann_store(store, [2, 1]) == {
        "added": 2, "total": 2,
    }
    lock = os.path.join(store, f"{ANN_TOMBSTONES}.lock")
    assert not os.path.exists(lock)  # released after success

    with open(lock, "w"):
        pass  # a concurrent delete (or a crashed one) holds the lock
    with pytest.raises(TimeoutError, match="lock"):
        delete_from_ann_store(store, [3], lock_timeout_s=0.2)
    assert read_ann_tombstones(store) == [1, 2]  # nothing lost

    os.unlink(lock)  # operator clears the stale lock
    assert delete_from_ann_store(store, [3]) == {
        "added": 1, "total": 3,
    }
    assert read_ann_tombstones(store) == [1, 2, 3]
    assert not os.path.exists(lock)


def test_cli_ann_search_json_honors_out(spark, tmp_path, capsys):
    """--out on the --queries (JSON serving shape) path writes the
    result parquet instead of being silently ignored (review r10
    round 2)."""
    import json
    import logging

    from inpe_queimadas_etl_spark import cli

    root = logging.getLogger()
    saved = (root.handlers[:], root.level)
    try:
        emb, model_path, store_path = _artifacts(spark, tmp_path)
        qv, _ = _queries(spark, emb, lo=8, hi=10)
        qjson = str(tmp_path / "queries.json")
        with open(qjson, "w") as f:
            json.dump([[qid, v] for qid, v in qv], f)
        outp = str(tmp_path / "json_results")
        rc = cli.main(
            [
                "ann-search", "--store", store_path,
                "--model", model_path, "--queries", qjson,
                "-k", "3", "--out", outp,
            ]
        )
        assert rc == 0
        summary = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )
        assert summary["out"] == outp
        want = sorted(
            [
                r.asDict()
                for r in ann_topk(
                    spark, store_path, model_path, qv, k=3
                ).collect()
            ],
            key=lambda d: (d["query_id"], d["rank"]),
        )
        got = sorted(
            [r.asDict() for r in spark.read.parquet(outp).collect()],
            key=lambda d: (d["query_id"], d["rank"]),
        )
        assert got == want and summary["rows"] == len(want)
    finally:
        root.handlers[:] = saved[0]
        root.setLevel(saved[1])


@pytest.mark.parametrize("opq", [False, True], ids=["plain", "opq"])
def test_chunked_batch_matches_unchunked_and_looped(
    spark, tmp_path, opq
):
    """chunk_queries partitions the QUERY set only — results must be
    IDENTICAL to the one-broadcast form and the looped serving form,
    both tails, with a chunk size that forces several chunks and one
    that exceeds Q (degenerate single chunk)."""
    emb, model_path, store_path = _artifacts(spark, tmp_path, opq=opq)
    qv, qdf = _queries(spark, emb)
    for rerank in (None, emb):
        want = ann_topk(
            spark, store_path, model_path, qv, k=5, rerank_with=rerank
        )
        for chunk in (3, 10_000):
            got = ann_topk_batch(
                spark, store_path, model_path, qdf, k=5,
                rerank_with=rerank, chunk_queries=chunk,
            )
            _pin_equal(got, want)


def test_chunked_batch_validation_and_tombstones(spark, tmp_path):
    """Duplicate ids split ACROSS chunks are still refused (the check
    runs on the concatenated id set before any scoring action);
    chunk_queries must be positive; tombstones hold per chunk."""
    emb, model_path, store_path = _artifacts(spark, tmp_path)
    qv, qdf = _queries(spark, emb, lo=8, hi=16)
    with pytest.raises(ValueError, match="chunk_queries must be"):
        ann_topk_batch(
            spark, store_path, model_path, qdf, k=1, chunk_queries=0
        )
    # duplicate ids land in DIFFERENT chunks (sorted assignment makes
    # the dup's two rows 8 apart; chunk=2 separates them)
    dup = qdf.union(qdf.limit(1))
    with pytest.raises(ValueError, match="unique"):
        ann_topk_batch(
            spark, store_path, model_path, dup, k=1, chunk_queries=2
        )
    base = ann_topk_batch(
        spark, store_path, model_path, qdf, k=5, rerank_with=emb,
        chunk_queries=3,
    ).collect()
    victim = int(base[0]["neighbor_id"])
    delete_from_ann_store(store_path, [victim])
    got = ann_topk_batch(
        spark, store_path, model_path, qdf, k=3, rerank_with=emb,
        chunk_queries=3,
    )
    assert victim not in {
        int(r["neighbor_id"]) for r in got.collect()
    }
    _pin_equal(
        got,
        ann_topk(
            spark, store_path, model_path, qv, k=3, rerank_with=emb
        ),
    )


def test_scoped_search_among_filters_prefilter_semantics(
    spark, tmp_path
):
    """`among` scopes the search to the named vec_ids with PRE-filter
    semantics: every served neighbor is in the allowed set, the
    results equal exact brute-force cosine top-k WITHIN that subset
    at the exactness dial, and batch == looped under the same
    scope."""
    import numpy as np

    # exactness needs the FULL dial: frac=1.0 probes every cluster
    # and cand >= |corpus| lets every allowed row reach the exact
    # rerank (the _artifacts default cand=100 would cut a 250-row
    # subset at its ADC top-100 — correct approximate behavior, but
    # this test pins the exact regime)
    emb = _emb(spark)
    model = train_ann_model(
        emb, k=4, m=8, ks=16, frac=1.0, cand=1000
    )
    model_path = str(tmp_path / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"], rot=model["rot"],
    )
    store_path = str(tmp_path / "store")
    build_ann_store(emb, load_ann_model(model_path), store_path)
    rows = emb.collect()
    allowed = [int(r["vec_id"]) for r in rows if r["vec_id"] % 2 == 0]
    among = spark.createDataFrame(
        [(i,) for i in allowed], "vec_id long"
    )
    qv, qdf = _queries(spark, emb, lo=9, hi=13)  # odd+even mixed ids

    got = ann_topk(
        spark, store_path, model_path, qv, k=4, rerank_with=emb,
        among=among,
    )
    got_rows = got.collect()
    assert got_rows and all(
        int(r["neighbor_id"]) % 2 == 0 for r in got_rows
    )

    # exactness within the subset: frac=1.0 probes everything, the
    # rerank is exact cosine — compare to numpy brute force over the
    # allowed ids only (self-matches skipped like the serving path)
    V = {int(r["vec_id"]): np.array(r["v"], dtype=np.float64) for r in rows}
    for qid, vec in qv:
        want = sorted(
            (
                (
                    float(
                        np.dot(V[i], np.array(vec))
                        / (np.linalg.norm(V[i]) * np.linalg.norm(vec))
                    ),
                    -i,
                )
                for i in allowed
                if i != qid
            ),
            reverse=True,
        )[:4]
        want_ids = [-t[1] for t in want]
        got_ids = [
            int(r["neighbor_id"])
            for r in sorted(
                (r for r in got_rows if int(r["query_id"]) == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert got_ids == want_ids, (qid, got_ids, want_ids)

    # batch form under the same scope — identical rows
    _pin_equal(
        ann_topk_batch(
            spark, store_path, model_path, qdf, k=4, rerank_with=emb,
            among=among,
        ),
        got,
    )
    # and chunked too
    _pin_equal(
        ann_topk_batch(
            spark, store_path, model_path, qdf, k=4, rerank_with=emb,
            among=among, chunk_queries=2,
        ),
        got,
    )


def test_batch_text_in_equals_vec_in_and_serving_encoder(
    spark, tmp_path
):
    """`ann_topk_batch(queries_text=...)` (VERDICT r10 #5): a
    (query_id, text) frame embedded IN-PLAN by `hashed_doc_vectors`
    must return rows identical to the vec-frame form fed the same
    texts' embeddings — and identical to what the ?text= serving
    path's `hashed_text_vector` would produce, because the two
    encoders are pinned bit-identical. Exactly-one-input and
    missing-column contracts refuse loudly."""
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.suite.llmdata import (
        hashed_doc_vectors,
        hashed_text_vector,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = (
        hashed_doc_vectors(docs, dim=64)
        .withColumn("nrm", vec_norm("v"))
        .select(F.col("doc_id").alias("vec_id"), "v", "nrm")
    )
    model = train_ann_model(emb, k=4, m=8, ks=16, frac=0.5, cand=100)
    model_path = str(tmp_path / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"],
    )
    store_path = str(tmp_path / "store")
    build_ann_store(emb, load_ann_model(model_path), store_path)

    # offset ids so the non-negative self-match skip never fires
    # (query_id == store id would hide the planted exact hit)
    qtexts = docs.filter(F.col("doc_id") < 6).select(
        (F.col("doc_id") + 10_000).alias("query_id"), "text"
    )
    got_text = (
        ann_topk_batch(
            spark, store_path, model_path, k=3, queries_text=qtexts
        )
        .orderBy("query_id", "rank")
        .collect()
    )
    # vec form: the SAME texts through the serving-path encoder
    # (bit-identical to the corpus scan by the emb1 parity pin)
    qvecs = [
        (int(r["query_id"]), hashed_text_vector(r["text"], dim=64))
        for r in qtexts.collect()
    ]
    qdf = spark.createDataFrame(
        qvecs, "query_id long, qv array<double>"
    )
    got_vec = (
        ann_topk_batch(spark, store_path, model_path, qdf, k=3)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [r.asDict() for r in got_text] == [
        r.asDict() for r in got_vec
    ]
    # each query text IS a stored doc: its own row wins rank 1
    by_q = {
        int(r["query_id"]): int(r["neighbor_id"])
        for r in got_text
        if int(r["rank"]) == 1
    }
    assert by_q == {10_000 + i: i for i in range(6)}

    with pytest.raises(ValueError, match="exactly one"):
        ann_topk_batch(
            spark, store_path, model_path, qdf, k=3,
            queries_text=qtexts,
        )
    with pytest.raises(ValueError, match="exactly one"):
        ann_topk_batch(spark, store_path, model_path, k=3)
    with pytest.raises(ValueError, match="query_id, "):
        ann_topk_batch(
            spark, store_path, model_path, k=3,
            queries_text=qtexts.select("query_id"),
        )

    # the CLI veneer: --queries-text-parquet routes the same frame
    # through the same code path, distributed --out (never collected)
    from inpe_queimadas_etl_spark import cli

    qt_path = str(tmp_path / "qtexts")
    qtexts.write.parquet(qt_path)
    out_path = str(tmp_path / "cli_out")
    assert cli.main(
        ["ann-search", "--store", store_path, "--model", model_path,
         "--queries-text-parquet", qt_path, "-k", "3",
         "--out", out_path]
    ) == 0
    cli_rows = (
        spark.read.parquet(out_path)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [
        (int(r["query_id"]), int(r["neighbor_id"]), int(r["rank"]))
        for r in cli_rows
    ] == [
        (int(r["query_id"]), int(r["neighbor_id"]), int(r["rank"]))
        for r in got_text
    ]


def test_ann_decontaminate_and_semdedup_cli(spark, tmp_path, capsys):
    """The shell faces of the store-backed curation pair (r11):
    ann-decontaminate == api.semantic_decontamination_store row for
    row; ann-semdedup == api.semdedup_store, with --apply-to-store
    feeding the removals into the serving store's tombstones under
    the bounded-takedown contract (and refusing past --apply-bound
    with the rebuild remedy named)."""
    import json

    from inpe_queimadas_etl_spark import cli
    from inpe_queimadas_etl_spark.api import (
        semantic_decontamination_store,
        semdedup_store,
    )
    from inpe_queimadas_etl_spark.operators.pq import (
        read_ann_tombstones,
    )

    emb, model_path, store_path = _artifacts(spark, tmp_path, frac=1.0)

    out = str(tmp_path / "flags")
    capsys.readouterr()
    assert cli.main(
        ["ann-decontaminate",
         "--corpus-embeddings-dir", SF0001,
         "--store", store_path, "--model", model_path,
         "--eval-embeddings-dir", SF0001,
         "--tau", "0.99", "--out", out]
    ) == 0
    summary = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    want = (
        semantic_decontamination_store(
            spark, emb, store_path, model_path, emb, tau=0.99
        )
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("vec_id", ignore_index=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)]
    )
    assert summary["flagged"] == len(want)
    # every corpus item IS a store item verbatim — all flagged
    assert summary["flagged"] == emb.count()

    # semdedup: removal list + bounded tombstone application
    removals = semdedup_store(
        spark, emb, model_path, tau=0.40
    ).toPandas()
    assert len(removals) > 0
    capsys.readouterr()
    assert cli.main(
        ["ann-semdedup", "--embeddings-dir", SF0001,
         "--model", model_path, "--tau", "0.40",
         "--apply-to-store", store_path]
    ) == 0
    summary2 = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    )
    assert summary2["removed_ids"] == len(removals)
    tombs = set(read_ann_tombstones(store_path))
    assert tombs == set(int(x) for x in removals["vec_id"])

    # the bounded contract: a tiny --apply-bound refuses with the
    # rebuild remedy, and the tombstone set is untouched
    with pytest.raises(SystemExit, match="rebuild"):
        cli.main(
            ["ann-semdedup", "--embeddings-dir", SF0001,
             "--model", model_path, "--tau", "0.40",
             "--apply-to-store", store_path, "--apply-bound", "1"]
        )
    assert set(read_ann_tombstones(store_path)) == tombs


def test_ann_decontaminate_print_path_bounded(spark, tmp_path, capsys):
    """VERDICT r12 #4: without --out the flagged rows are collected
    to the driver for JSON printing — the collect must be bounded
    (limit(N+1)) and refuse past --print-bound naming --out, matching
    the refuse-loudly convention; under the bound it prints the full
    row set."""
    import json

    from inpe_queimadas_etl_spark import cli

    _, model_path, store_path = _artifacts(spark, tmp_path, frac=1.0)

    base = ["ann-decontaminate",
            "--corpus-embeddings-dir", SF0001,
            "--store", store_path, "--model", model_path,
            "--eval-embeddings-dir", SF0001,
            "--tau", "0.99"]
    # every corpus item is a store item verbatim at tau 0.99 -> 500
    # flagged rows; a bound below that refuses and names --out
    with pytest.raises(SystemExit, match="--out"):
        cli.main(base + ["--print-bound", "10"])
    # at/over the row count, the print path works and is complete
    capsys.readouterr()
    assert cli.main(base + ["--print-bound", "500"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["flagged"]) == 500


def test_null_text_and_null_query_id_refuse_with_contract(
    spark, tmp_path
):
    """Null inputs on the new text/batch surfaces must refuse with
    the contract named, not die rows later in an opaque executor
    stack (review r11): a null text names the doc and the encoder
    contract; a null query_id names the id contract at the
    probe-assignment scan."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        hashed_doc_vectors,
    )

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, None)], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="not a string"):
        hashed_doc_vectors(docs, dim=64).collect()

    emb, model_path, store_path = _artifacts(spark, tmp_path)
    qdf = spark.createDataFrame(
        [(None, [0.5] * 64)], "query_id long, qv array<double>"
    )
    with pytest.raises(Exception, match="non-null"):
        ann_topk_batch(spark, store_path, model_path, qdf, k=1)


def test_text_in_composes_with_chunking_and_scoping(
    spark, tmp_path
):
    """queries_text= is orthogonal to the other batch levers —
    pinned: chunked text-in == unchunked text-in (chunking partitions
    queries, embedding rides the probe scan either way), and among=
    scopes a text search with pre-filter semantics exactly as it does
    a vec search."""
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.suite.llmdata import (
        hashed_doc_vectors,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    emb = (
        hashed_doc_vectors(docs, dim=64)
        .withColumn("nrm", vec_norm("v"))
        .select(F.col("doc_id").alias("vec_id"), "v", "nrm")
    )
    model = train_ann_model(emb, k=4, m=8, ks=16, frac=0.5, cand=100)
    model_path = str(tmp_path / "model.json")
    save_ann_model(
        model_path, model["cents"], model["cb"], model["frac"],
        model["cand"],
    )
    store_path = str(tmp_path / "store")
    build_ann_store(emb, load_ann_model(model_path), store_path)
    qtexts = docs.filter(F.col("doc_id") < 8).select(
        (F.col("doc_id") + 10_000).alias("query_id"), "text"
    )

    def rows(**kw):
        return [
            (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]))
            for r in ann_topk_batch(
                spark, store_path, model_path, k=3,
                queries_text=qtexts, **kw,
            ).orderBy("query_id", "rank").collect()
        ]

    plain = rows()
    assert rows(chunk_queries=3) == plain

    # among= pre-filter: only even doc ids are searchable, so every
    # neighbor is even and each query still fills k within the subset
    among = emb.filter(F.col("vec_id") % 2 == 0).select("vec_id")
    scoped = rows(among=among)
    assert all(n % 2 == 0 for _, _, n in scoped)
    assert {q for q, _, _ in scoped} == {10_000 + i for i in range(8)}
    # the even QUERY texts still find their own store row at rank 1
    top1 = {q: n for q, r, n in scoped if r == 1}
    for i in range(0, 8, 2):
        assert top1[10_000 + i] == i
