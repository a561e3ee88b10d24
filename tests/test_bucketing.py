"""Bucketed-table guardrails: the co-location contract must show up
in the physical plan — a bucketed join with no Exchange on either
side — not just produce correct rows."""

from __future__ import annotations

import contextlib
import io

import pytest

from inpe_queimadas_etl_spark.bucketing import cobucketed_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 1000).selectExpr(
        "id AS k", "id * 2 AS lv"
    ).repartition(1)
    right = spark.range(0, 1000, 3).selectExpr(
        "id AS k", "id + 7 AS rv"
    ).repartition(1)
    write_bucketed(left, "t_bleft", ["k"], 4, path=str(tmp_path / "l"))
    write_bucketed(right, "t_bright", ["k"], 4, path=str(tmp_path / "r"))
    yield "t_bleft", "t_bright"
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, lt, rt, ["k"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, (
            f"bucketed join still shuffles:\n{plan}"
        )
        rows = joined.count()
        assert rows == 334  # ceil(1000/3)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    agg = spark.table(lt).groupBy("k").count()
    plan = _plan(agg)
    assert "Exchange" not in plan, (
        f"groupBy on the bucket key still shuffles:\n{plan}"
    )
    assert agg.count() == 1000


def test_bucketed_join_values_match_unbucketed(spark, bucketed_pair):
    lt, rt = bucketed_pair
    bucketed = {
        (r["k"], r["lv"], r["rv"])
        for r in cobucketed_join(spark, lt, rt, ["k"]).collect()
    }
    plain = {
        (r["k"], r["lv"], r["rv"])
        for r in spark.table(lt).join(spark.table(rt), ["k"]).collect()
    }
    assert bucketed == plain


def test_write_bucketed_rejects_bad_bucket_count(spark, tmp_path):
    df = spark.range(3).selectExpr("id AS k")
    with pytest.raises(ValueError):
        write_bucketed(df, "t_bad", ["k"], 0, path=str(tmp_path / "b"))


def test_write_bucketed_rejects_empty_bucket_cols(spark, tmp_path):
    df = spark.range(3).selectExpr("id AS k")
    with pytest.raises(ValueError, match="bucket_cols"):
        write_bucketed(df, "t_bad2", [], 4, path=str(tmp_path / "b2"))
