"""Salting: result parity with the unsalted plan, determinism, and
the salt actually spreading a hot key over multiple shuffle keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.operators.skew import (
    salted_join,
    two_phase_agg,
    with_salt,
)


@pytest.fixture()
def skewed(spark):
    # 9000 rows of hot key 'h', 1000 spread over 100 cold keys
    return spark.range(10000).select(
        F.when(F.col("id") < 9000, F.lit("h"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 100).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("h", "hot"), ("k1", "cold1"), ("k2", "cold2")], "k string, name string"
    )
    plain = {
        (r["k"], r["v"], r["name"])
        for r in skewed.join(dim, ["k"]).collect()
    }
    salted = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(skewed, dim, ["k"], 8, salt_src_cols=["v"]).collect()
    }
    assert salted == plain and len(plain) == 9020


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("h", 1)], "k string, flag int")
    out = salted_join(skewed, dim, ["k"], 4, salt_src_cols=["v"], how="left")
    assert out.count() == 10000
    assert out.filter(F.col("flag").isNull()).count() == 1000


def test_salt_is_deterministic_and_spreads(spark, skewed):
    a = with_salt(skewed, ["v"], 8).groupBy("__salt").count()
    b = with_salt(skewed, ["v"], 8).groupBy("__salt").count()
    da = {r["__salt"]: r["count"] for r in a.collect()}
    db = {r["__salt"]: r["count"] for r in b.collect()}
    assert da == db  # replay-safe
    assert len(da) == 8  # hot key's rows spread over all salts
    assert max(da.values()) < 10000 * 0.3


def test_two_phase_agg_sum_and_distinct(spark, skewed):
    out = two_phase_agg(
        skewed,
        keys=["k"],
        partial_aggs=[
            F.sum("v").alias("s"),
            F.collect_set((F.col("v") % 10)).alias("ds"),
        ],
        final_aggs=[
            F.sum("s").alias("total"),
            F.size(F.array_distinct(F.flatten(F.collect_list("ds")))).alias(
                "n_distinct_mod10"
            ),
        ],
        n_salts=8,
        salt_src_cols=["v"],
    )
    expect = {
        (r["k"], r["total"], r["n"])
        for r in skewed.groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.countDistinct((F.col("v") % 10)).alias("n"),
        )
        .collect()
    }
    got = {
        (r["k"], r["total"], r["n_distinct_mod10"]) for r in out.collect()
    }
    assert got == expect


def test_with_salt_rejects_bad_n(spark, skewed):
    with pytest.raises(ValueError):
        with_salt(skewed, ["v"], 0)


def test_salted_join_rejects_outer_and_key_only_salt(spark, skewed):
    dim = spark.createDataFrame([("h", 1)], "k string, flag int")
    with pytest.raises(ValueError, match="right/full"):
        salted_join(skewed, dim, ["k"], 4, salt_src_cols=["v"], how="full")
    with pytest.raises(ValueError, match="varies within"):
        salted_join(skewed, dim, ["k"], 4, salt_src_cols=["k"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(
            with_salt(skewed, ["v"], 2), dim, ["k"], 4, salt_src_cols=["v"]
        )
