"""Quality-classifier TRAINING on Spark MLlib, exported into the
zero-shuffle broadcast scorer (tx7's serving shape).

tx7 scores documents under a FIXED hashed-linear model — the serving
half of the fasttext-style quality classifier every production corpus
pipeline runs (GPT-3's WebText-vs-CommonCrawl filter, CCNet's LM
tier's sibling). This module supplies the training half Spark-first:

- **Featurize**: hashed bag-of-words where the bucket is the SQL
  expression ``pmod(hash(word), D)`` — the SAME expression serving
  uses, so training/serving featurization is identical BY
  CONSTRUCTION. MLlib's ``HashingTF`` was MEASURED AND REJECTED for
  this slot: its murmur3 variant (``hashUnsafeBytes2``) treats tail
  bytes differently from SQL ``hash()`` (``hashUnsafeBytes``), so
  buckets diverge for any word whose UTF-8 length is not a multiple
  of 4 ("the" → 1681 vs 1438 at D=2^12) — a model trained on it
  cannot be served without a per-word Python hash. The dense count
  vector is built JVM-side (map_from_entries + a D-slot transform)
  and handed to MLlib via ``array_to_vector``.
- **Train**: ``LogisticRegression`` (L-BFGS) on a labeled sample.
  Training data is sample-sized BY DESIGN (a quality classifier
  trains on ~1M labeled docs, not the 100-TB corpus); the expensive
  side is scoring, which is tx7's measured broadcast shape.
- **Export**: coefficients + intercept become a D-row (bucket,
  weight) local relation — the same artifact ``_tx7_weight_table``
  stands in for — consumed by :func:`hashed_linear_logits`:
  explode → broadcast hash join → per-doc re-agg, one corpus-sized
  exchange carrying one partial-sum row per document.

No SQL oracle: L-BFGS optimization is not ANSI-SQL-expressible (the
tx9 exception class) — pinned instead by serving parity vs MLlib's
own ``rawPrediction`` margin and discrimination gates
(tests/test_classifier.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucketed_words(docs: DataFrame, buckets: int) -> DataFrame:
    """``(doc_id, bucket)`` — one row per word OCCURRENCE. The single
    featurization expression both halves share."""
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).select(
        "doc_id",
        F.pmod(F.hash("word"), F.lit(buckets)).cast("int").alias("bucket"),
    )


def dense_counts(docs: DataFrame, buckets: int) -> DataFrame:
    """``(doc_id, arr)`` with arr = the D-slot dense count vector —
    the training-side feature frame (training samples are bounded, so
    a dense D-vector per row is the simple correct shape; serving
    never materializes it)."""
    return (
        _bucketed_words(docs, buckets)
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "c"))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {buckets - 1}),"
                " i -> cast(coalesce(m[i], 0) as double))"
            ).alias("arr"),
        )
    )


def train_hashed_linear(
    labeled: DataFrame,
    buckets: int,
    max_iter: int = 25,
    reg_param: float = 0.01,
) -> tuple[list[float], float]:
    """Fit a logistic-regression quality classifier over hashed
    bag-of-words features: ``labeled`` is ``(doc_id, text, label)``
    with a 0/1 label; returns ``(weights[buckets], intercept)`` — the
    model artifact :func:`hashed_linear_logits` serves."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feat = dense_counts(labeled.select("doc_id", "text"), buckets).join(
        labeled.select(
            "doc_id", F.col("label").cast("double").alias("label")
        ),
        "doc_id",
    )
    vecs = feat.select(
        array_to_vector("arr").alias("features"), "label"
    )
    model = LogisticRegression(
        maxIter=max_iter, regParam=reg_param
    ).fit(vecs)
    return model.coefficients.toArray().tolist(), float(model.intercept)


def hashed_linear_logits(
    docs: DataFrame, weights: list[float], intercept: float
) -> DataFrame:
    """Score ``(doc_id, text)`` under a trained hashed-linear model:
    ``(doc_id, logit)`` with logit = Σ w[pmod(hash(word), D)] + b —
    the training featurization replayed occurrence-wise.

    Scale design (tx7_broadcast_quality_score's measured shape): the
    D-row weight table is a LOCAL relation broadcast into the scan;
    the only corpus-sized exchange carries one map-side-combined
    partial-sum row per document. Zero UDFs, zero SortMergeJoin
    (plan-pinned)."""
    wdf = docs.sparkSession.createDataFrame(
        list(enumerate(weights)), "bucket int, weight double"
    )
    return (
        _bucketed_words(docs, len(weights))
        .join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id")
        .agg((F.sum("weight") + F.lit(intercept)).alias("logit"))
    )
