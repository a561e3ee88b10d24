"""Parity pins for the Arrow-batched sign-LSH fast path.

`lsh_band_buckets` (numpy over Arrow batches) replaces the per-plane
JVM HOF folds in the dd6 / embedding-index banding. The DuckDB oracle
states the JVM expression (`lsh_bucket_sql`), so the fast path is only
admissible if it is BIT-IDENTICAL — same IEEE multiply/add sequence,
same sign decisions. These tests pin that equivalence on the real
embeddings table and on adversarial vectors (exact-zero dots, signed
zeros, denormals, a NULL vector).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.operators.similarity import (
    hyperplane,
    lsh_band_buckets,
)
from inpe_queimadas_etl_spark.session import load_table
from inpe_queimadas_etl_spark.suite.llmdata import (
    _EMB_DIM,
    _emb_band_rows,
    _emb_band_structs,
)

from .conftest import SF001


def _jvm_band_rows(vecs, id_col, n_bands, band_bits):
    return vecs.select(
        id_col,
        F.explode(F.array(*_emb_band_structs(n_bands, band_bits))).alias(
            "band"
        ),
    ).select(id_col, "band.band_idx", "band.band_bucket")


def _assert_band_parity(vecs, id_col, n_bands, band_bits):
    jvm = {
        (r[0], r[1]): r[2]
        for r in _jvm_band_rows(vecs, id_col, n_bands, band_bits).collect()
    }
    fast = {
        (r[0], r[1]): r[2]
        for r in _emb_band_rows(vecs, id_col, n_bands, band_bits).collect()
    }
    assert fast == jvm  # bucket-for-bucket, including band_idx pairing


def test_fastpath_matches_jvm_on_real_embeddings(spark):
    vecs = load_table(spark, SF001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    _assert_band_parity(vecs, "vec_id", 8, 12)


def test_fastpath_matches_jvm_on_adversarial_vectors(spark):
    # Exact-zero dot products (the >= 0.0 boundary): v orthogonal to
    # plane j by construction — w[0]*w[1] + w[1]*(-w[0]) cancels
    # EXACTLY in IEEE left-to-right order, so the fold hits +0.0/-0.0
    # and both paths must agree the bit is set.
    rows = []
    for j in range(8):
        w = hyperplane(j, _EMB_DIM)
        v = [0.0] * _EMB_DIM
        v[0], v[1] = float(w[1]), float(-w[0])
        rows.append((j, v))
    # signed zeros / denormals / huge components
    rows.append((100, [0.0] * _EMB_DIM))
    rows.append((101, [-0.0] * _EMB_DIM))
    rows.append((102, [5e-324, -5e-324] * (_EMB_DIM // 2)))
    rows.append((103, [1e300, -1e300] * (_EMB_DIM // 2)))
    rows.append((104, [1e16, 1.0, -1e16] + [0.0] * (_EMB_DIM - 3)))
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    _assert_band_parity(df, "vec_id", 4, 8)


def test_fastpath_null_vector_gets_bucket_zero(spark):
    # JVM: when(NULL >= 0).otherwise(0) -> every band bucket 0; the
    # fast path must collapse a NULL vector identically.
    df = spark.createDataFrame(
        [(1, [1.0] * _EMB_DIM), (2, None)], "vec_id int, v array<double>"
    )
    fast = {
        (r[0], r[1]): r[2]
        for r in _emb_band_rows(df, "vec_id", 4, 8).collect()
    }
    assert all(fast[(2, b)] == 0 for b in range(4))
    _assert_band_parity(df, "vec_id", 4, 8)


def test_fastpath_dim_mismatch_gets_bucket_zero(spark):
    # JVM: zip_with pads the shorter side with NULLs -> fold NULL ->
    # bucket 0 in every band, for vectors both shorter and longer
    # than the declared dim. The fast path mirrors the collapse.
    df = spark.createDataFrame(
        [
            (1, [1.0] * _EMB_DIM),
            (2, [1.0] * 16),
            (3, [1.0] * (_EMB_DIM + 8)),
        ],
        "vec_id int, v array<double>",
    )
    fast = {
        (r[0], r[1]): r[2]
        for r in _emb_band_rows(df, "vec_id", 4, 8).collect()
    }
    assert all(fast[(2, b)] == 0 and fast[(3, b)] == 0 for b in range(4))
    _assert_band_parity(df, "vec_id", 4, 8)


def test_fastpath_empty_input(spark):
    df = spark.createDataFrame([], "vec_id int, v array<double>")
    assert _emb_band_rows(df, "vec_id", 4, 8).count() == 0


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        rows, "pid int, a array<double>, b array<double>"
    )


def test_precomputed_norm_verify_matches_cosine(spark):
    # The dd6/sim verify form — dot_product / (vec_norm_a *
    # vec_norm_b) with norms computed once per vector — must be
    # bit-identical to cosine()'s per-pair folds (the norm is the
    # same double either way).
    from inpe_queimadas_etl_spark.operators.similarity import (
        cosine,
        dot_product,
        vec_norm,
    )

    emb = load_table(spark, SF001, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    emb_n = emb.withColumn("nrm", vec_norm("v"))
    a = emb_n.select(
        F.col("vec_id").alias("pid"),
        F.col("v").alias("a"),
        F.col("nrm").alias("na"),
    )
    b = emb_n.select(
        (F.col("vec_id") - 1).alias("pid"),
        F.col("v").alias("b"),
        F.col("nrm").alias("nb"),
    )
    pairs = a.join(b, "pid")
    ref = {r[0]: r[1] for r in pairs.select("pid", cosine("a", "b")).collect()}
    split = {
        r[0]: r[1]
        for r in pairs.select(
            "pid",
            F.try_divide(dot_product("a", "b"), F.col("na") * F.col("nb")),
        ).collect()
    }
    assert split == ref  # bit-for-bit, no tolerance


def test_cosine_zero_norm_yields_null_not_ansi_crash(spark):
    # Spark 4 defaults ANSI mode, where a plain double division by
    # zero raises DIVIDE_BY_ZERO — so a single all-zero embedding (an
    # empty document) would crash a whole dedup job. cosine() uses
    # try_divide: the degenerate pair scores NULL and is dropped by
    # any threshold filter instead of failing the job.
    from inpe_queimadas_etl_spark.operators.similarity import cosine

    pairs = _pairs_df(
        spark,
        [
            (1, [0.0, 0.0], [1.0, 2.0]),  # zero-norm left side
            (2, [], []),                  # zero-length pair
            (3, [1.0, 0.0], [1.0, 0.0]),  # healthy pair
        ],
    )
    got = {r[0]: r[1] for r in pairs.select("pid", cosine("a", "b")).collect()}
    assert got[1] is None
    assert got[2] is None
    assert got[3] == 1.0


def test_fastpath_matches_bucket_slices(spark):
    # lsh_band_buckets(b*bits offset slicing) must equal per-band
    # lsh_bucket calls at the same plane offsets — i.e. array element
    # b IS band b, not merely some permutation.
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [
        (i, [float(x) for x in rng.randn(_EMB_DIM)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    got = {
        r[0]: list(r[1])
        for r in df.select(
            "vec_id", lsh_band_buckets("v", _EMB_DIM, 3, 5).alias("bk")
        ).collect()
    }
    from inpe_queimadas_etl_spark.operators.similarity import lsh_bucket

    for b in range(3):
        ref = {
            r[0]: r[1]
            for r in df.select(
                "vec_id",
                lsh_bucket("v", _EMB_DIM, 5, plane_offset=b * 5).alias("x"),
            ).collect()
        }
        assert {k: v[b] for k, v in got.items()} == ref


def _assign_parity(emb, k):
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _ivf_assign,
        _ivf_assign_ref,
    )

    ref = {
        r["vec_id"]: (r["csim"], r["centroid_id"])
        for r in _ivf_assign_ref(emb, k).collect()
    }
    fast = {
        r["vec_id"]: (r["csim"], r["centroid_id"])
        for r in _ivf_assign(emb, k).collect()
    }
    assert set(ref) == set(fast)
    for vid in ref:
        rs, ri = ref[vid]
        fs, fi = fast[vid]
        assert ri == fi, (vid, ref[vid], fast[vid])
        # bit-identical csim, not approximately equal
        assert rs == fs or (rs is None and fs is None), (
            vid,
            ref[vid],
            fast[vid],
        )


def test_centroid_assign_fastpath_matches_jvm_on_real_embeddings(spark):
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    emb = (
        load_table(spark, SF001, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("nrm", vec_norm("v"))
    )
    _assign_parity(emb, 4)
    _assign_parity(emb, 64)  # past the fast path's block-internal argmax


def test_centroid_assign_fastpath_tie_goes_to_lowest_id(spark):
    """Adversarial codebook: centroids 1 and 2 are IDENTICAL vectors,
    so every row's csim ties exactly between them — both paths must
    resolve to centroid 1. Rows 0..3 double as the codebook (the
    first-K convention), rows 10+ are member-only."""
    import pandas as pd

    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    vecs = {
        0: [1.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.25],
        2: [0.0, 1.0, 0.25],  # == centroid 1
        3: [0.0, 0.0, 1.0],
        10: [0.0, 0.9, 0.3],  # nearest the duplicated direction
        11: [0.0, 2.0, 0.5],  # exact scalar multiple: csim == 1.0 twice
    }
    pdf = pd.DataFrame(
        {"vec_id": list(vecs), "v": [list(v) for v in vecs.values()]}
    )
    emb = (
        spark.createDataFrame(pdf)
        .select("vec_id", F.col("v").cast("array<double>").alias("v"))
        .withColumn("nrm", vec_norm("v"))
    )
    _assign_parity(emb, 4)
    from inpe_queimadas_etl_spark.suite.llmdata import _ivf_assign

    got = {
        r["vec_id"]: r["centroid_id"]
        for r in _ivf_assign(emb, 4).collect()
    }
    assert got[10] == 1 and got[11] == 1  # never the duplicate id 2


def _norm_emb(spark, vecs):
    import pandas as pd

    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    pdf = pd.DataFrame(
        {"vec_id": list(vecs), "v": [list(map(float, v)) for v in vecs.values()]}
    )
    return (
        spark.createDataFrame(pdf)
        .select("vec_id", F.col("v").cast("array<double>").alias("v"))
        .withColumn("nrm", vec_norm("v"))
    )


def _dd12_parity(emb, k, tau):
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _semantic_dedup_removals_ref,
        semantic_dedup_removals,
    )

    ref = {
        r["vec_id"]: (r["centroid_id"], r["n_dups"], r["max_sim"])
        for r in _semantic_dedup_removals_ref(emb, k, tau).collect()
    }
    fast = {
        r["vec_id"]: (r["centroid_id"], r["n_dups"], r["max_sim"])
        for r in semantic_dedup_removals(emb, k, tau).collect()
    }
    assert fast == ref  # bit-for-bit incl. max_sim doubles


def test_semantic_dedup_fastpath_matches_jvm_on_real_embeddings(spark):
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    emb = (
        load_table(spark, SF001, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("nrm", vec_norm("v"))
    )
    _dd12_parity(emb, 4, 0.40)
    # low tau makes MANY pairs qualify -> exercises counts and maxima
    _dd12_parity(emb, 4, 0.05)


def test_semantic_dedup_fastpath_matches_jvm_adversarial(spark):
    """Exact-duplicate vectors (csim ties -> vec_id tie-break), a
    zero-norm vector (NULL csim: neither precedes nor is removed),
    exact scalar multiples (pair cosine exactly 1.0), and a cluster
    of size 1 — all bit-identical between the Arrow sweep and the
    JVM join, across blocking boundaries (block=2 forces multi-block
    row AND column sweeps)."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _semantic_dedup_removals_ref,
        semantic_dedup_removals,
    )

    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        10: [1.0, 0.05, 0.0, 0.0],
        11: [1.0, 0.05, 0.0, 0.0],  # == 10: csim tie, cosine 1.0
        12: [2.0, 0.10, 0.0, 0.0],  # scalar multiple of 10
        13: [0.0, 0.0, 0.0, 0.0],  # zero norm: NULL csim
        14: [1.0, 0.20, 0.0, 0.0],
        15: [1.0, 0.30, 0.0, 0.0],
        16: [1.0, 0.40, 0.0, 0.0],
        20: [0.0, 1.0, 0.05, 0.0],  # cluster 1: just one member pair
        21: [0.0, 1.0, 0.06, 0.0],
    }
    emb = _norm_emb(spark, vecs)
    ref = {
        r["vec_id"]: (r["centroid_id"], r["n_dups"], r["max_sim"])
        for r in _semantic_dedup_removals_ref(emb, 2, 0.9).collect()
    }
    fast = {
        r["vec_id"]: (r["centroid_id"], r["n_dups"], r["max_sim"])
        for r in semantic_dedup_removals(emb, 2, 0.9, block=2).collect()
    }
    assert fast == ref
    assert 13 not in fast  # the zero-norm vector is untouchable
    # the order-first member of each cluster never appears
    assert ref  # the plant actually produced removals


def test_cur7_fastpath_matches_jvm(spark):
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _semantic_decontamination_ref,
        semantic_decontamination,
    )

    emb = (
        load_table(spark, SF001, "embeddings")
        .select(
            "vec_id",
            "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
        .withColumn("nrm", vec_norm("v"))
    )
    corpus = emb.filter(F.col("label") != 0)
    ev = emb.filter(F.col("label") == 0)
    for tau in (0.35, 0.05):  # sparse and dense hit regimes
        ref = {
            r["vec_id"]: (r["n_eval_hits"], r["max_sim"])
            for r in _semantic_decontamination_ref(corpus, ev, tau).collect()
        }
        fast = {
            r["vec_id"]: (r["n_eval_hits"], r["max_sim"])
            for r in semantic_decontamination(
                corpus, ev, tau, block=3
            ).collect()
        }
        assert fast == ref, tau


def test_cur7_fastpath_empty_eval_set(spark):
    from inpe_queimadas_etl_spark.suite.llmdata import (
        semantic_decontamination,
    )

    corpus = _norm_emb(spark, {1: [1.0, 0.0], 2: [0.0, 1.0]})
    out = semantic_decontamination(corpus, corpus.filter("vec_id < 0"))
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id",
        "n_eval_hits",
        "max_sim",
    ]


def test_cur7_fastpath_zero_norm_rows(spark):
    """A zero-norm corpus vector scores NULL against every eval item
    in the JVM form (never flagged); a zero-norm EVAL vector is a
    dead column (hits nothing). Both replayed."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _semantic_decontamination_ref,
        semantic_decontamination,
    )

    corpus = _norm_emb(
        spark, {1: [1.0, 0.0], 2: [0.0, 0.0], 3: [0.9, 0.1]}
    )
    ev = _norm_emb(spark, {100: [1.0, 0.0], 101: [0.0, 0.0]})
    ref = {
        r["vec_id"]: (r["n_eval_hits"], r["max_sim"])
        for r in _semantic_decontamination_ref(corpus, ev, 0.5).collect()
    }
    fast = {
        r["vec_id"]: (r["n_eval_hits"], r["max_sim"])
        for r in semantic_decontamination(corpus, ev, 0.5).collect()
    }
    assert fast == ref
    assert 2 not in fast
