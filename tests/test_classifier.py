"""MLlib-trained quality classifier (operators/classifier.py, tx10):
the documented no-SQL-oracle exception — pinned by train/serve
featurization identity, serving parity vs MLlib's own rawPrediction
margin, and discrimination gates.

HashingTF note: MLlib's HashingTF was measured and rejected for the
featurization slot — its murmur3 (hashUnsafeBytes2) diverges from SQL
hash() (hashUnsafeBytes) on any word whose UTF-8 length is not a
multiple of 4, so a model trained on it could not be served through
pure JVM expressions. Both halves here share the single expression
pmod(hash(word), D) instead.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.operators.classifier import (
    dense_counts,
    hashed_linear_logits,
    train_hashed_linear,
)

SF0001 = "/root/testdata/sf0.001"


def test_featurization_train_serve_identity(spark):
    """The dense training vector and the serving-side exploded stream
    are the same featurization: for ANY weight vector, dot(w, arr) + b
    equals the served logit (checked with deterministic pseudo-random
    weights, tolerance = summation order only)."""
    D = 1 << 8
    texts = {
        0: "the cat sat on the mat",
        1: "ünïcode tails of löngth thrèe",
        2: "a",
        3: "w123 w123 w123 repeated exact",
    }
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    docs = spark.createDataFrame(pdf)
    weights = [((i * 2654435761) % 1000 - 500) / 1024 for i in range(D)]
    bias = 0.25
    arrs = {
        r["doc_id"]: r["arr"] for r in dense_counts(docs, D).collect()
    }
    served = {
        r["doc_id"]: r["logit"]
        for r in hashed_linear_logits(docs, weights, bias).collect()
    }
    assert set(arrs) == set(served) == set(texts)
    for d, arr in arrs.items():
        expect = sum(w * c for w, c in zip(weights, arr)) + bias
        assert served[d] == pytest.approx(expect, abs=1e-9), d
        assert sum(arr) == len(texts[d].split(" "))


def _labeled_corpus():
    """Two separable vocabularies with a little overlap."""
    rows = []
    for i in range(40):
        rows.append((i, f"alpha bravo charlie delta w{i % 7}", 1.0))
    for i in range(40, 80):
        rows.append((i, f"zulu yankee xray whiskey w{i % 7}", 0.0))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_serving_parity_with_mllib(spark):
    """hashed_linear_logits == MLlib's own rawPrediction margin on
    every document (summation-order tolerance only)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector, vector_to_array

    D = 1 << 10
    pdf = _labeled_corpus()
    docs = spark.createDataFrame(pdf)
    feat = dense_counts(docs.select("doc_id", "text"), D).join(
        docs.select("doc_id", F.col("label").cast("double").alias("label")),
        "doc_id",
    )
    vecs = feat.select(
        "doc_id", array_to_vector("arr").alias("features"), "label"
    )
    model = LogisticRegression(maxIter=25, regParam=0.01).fit(
        vecs.select("features", "label")
    )
    mllib = {
        r["doc_id"]: r["margin"]
        for r in model.transform(vecs)
        .select(
            "doc_id", vector_to_array("rawPrediction")[1].alias("margin")
        )
        .collect()
    }
    ours = {
        r["doc_id"]: r["logit"]
        for r in hashed_linear_logits(
            docs.select("doc_id", "text"),
            model.coefficients.toArray().tolist(),
            float(model.intercept),
        ).collect()
    }
    assert set(ours) == set(mllib)
    for d in ours:
        assert ours[d] == pytest.approx(mllib[d], abs=1e-9), d


def test_train_then_serve_discriminates(spark):
    """train_hashed_linear's exported artifact separates the planted
    classes through the serving path."""
    pdf = _labeled_corpus()
    docs = spark.createDataFrame(pdf)
    weights, intercept = train_hashed_linear(docs, buckets=1 << 10)
    got = (
        hashed_linear_logits(docs.select("doc_id", "text"), weights, intercept)
        .toPandas()
        .merge(pdf[["doc_id", "label"]], on="doc_id")
    )
    acc = ((got["logit"] > 0) == (got["label"] > 0.5)).mean()
    assert acc == 1.0, acc


def test_tx10_distills_heuristic_gate(spark):
    """The demo geometry: the classifier distills cur1's stopword
    gate (a threshold on stopword counts — provably linear in the
    hashed BoW) and must recover it on the corpus it trained on."""
    from inpe_queimadas_etl_spark.session import load_table
    from inpe_queimadas_etl_spark.suite.llmdata import (
        tx10_labels,
        tx10_trained_quality_score,
    )

    scored = tx10_trained_quality_score(spark, SF0001).toPandas()
    docs = load_table(spark, SF0001, "documents")
    labels = tx10_labels(docs).select("doc_id", "label").toPandas()
    m = scored.merge(labels, on="doc_id")
    assert len(m) == 500
    # both label classes are populated at this sf
    assert 0 < m["label"].sum() < len(m)
    acc = (m["gate_pred"] == (m["label"] > 0.5)).mean()
    assert acc >= 0.98, acc


def test_tx10_serving_plan_is_broadcast_only(spark):
    """tx7_broadcast's measured shape carries over: D-row model
    broadcasts, the only non-broadcast exchange is the per-doc
    partial-sum rollup, no SortMergeJoin, no UDF in the serving
    path."""
    import contextlib
    import io

    from inpe_queimadas_etl_spark.suite.llmdata import (
        tx10_trained_quality_score,
    )

    df = tx10_trained_quality_score(spark, SF0001)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, plan
    assert "partial" in plan.lower(), plan
