"""Skew demonstration queries: a Zipfian hot key through the naive
plan vs the two-phase salted plan (VERDICT r3 "Next round" #2 — the
skew operators demonstrated on actually-skewed data, not just unit
tests).

The workload is exact per-key distinct counting via ``collect_set`` —
the aggregation shape AQE cannot rescue: AQE's skew handling splits
oversized SORT-MERGE-JOIN partitions, but a hash aggregate's state for
one key is indivisible, so a 90 %-hot key funnels every row through a
single reducer no matter how the planner re-plans. The two-phase form
(operators/skew.two_phase_agg) salts on the DISTINCT column, which
slices each key's VALUE SPACE disjointly across ``N_SALTS`` reducers;
per-slice exact distinct counts then SUM to the exact global count, so
the final phase is algebraic and trivially cheap.

Both variants are benched in bench.py (skew_hot_distinct_naive vs
skew_hot_distinct_two_phase) and oracle-checked against DuckDB in
tests/test_suite_oracle.py. They are deliberately NOT @query-registered:
the suite registry is capped at 50 entries to fit the driver's
correctness snapshot.

Measured at sf0.1, local[32], 1.8 M rows (REPLICATION=3), 90 % hot:
naive median 1.92 s vs two-phase 1.61 s. The gap is the reduce side:
~0.6 s single-reducer set-merge vs ~0.3 s spread over 32. At
REPLICATION=8 (4.8 M rows, 4.3 M distinct under the hot key) the naive
plan OOMs a 1 GiB executor heap outright — one reducer must
materialize the whole hot key's set — while the two-phase plan's
largest per-task state stays 1/32 of that. That cliff, not the local
speedup, is the 100-TB argument; SCALING.md records both numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import two_phase_agg
from ..session import load_table

# Replication factor: sizes the demo so the hot reducer does real work
# at sf0.1 without OOMing the default 1 GiB local heap (8x does).
REPLICATION = 3
N_SALTS = 32

# 90 % of orders land on one hot key; the rest spread over 10 cold
# keys — the Zipfian head-vs-tail shape of a dominant municipality
# (reference: one Amazonia UF carries most fire foci) or a dominant
# language in a training corpus.
_HOT_PCT = 90


def _skewed_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(k, uid) rows with a 90 %-hot key. The input scan is rebalanced
    to the session parallelism first so BOTH variants start from the
    same well-spread map stage and the measured difference is the
    reduce-side skew, not scan parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    par = spark.sparkContext.defaultParallelism
    k = (
        F.when(F.col("l_orderkey") % 100 < _HOT_PCT, F.lit("HOT"))
        .otherwise((F.col("l_orderkey") % 100).cast("string"))
    )
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(REPLICATION - 1))
    ).alias("rep")
    uid = F.concat_ws("-", "l_orderkey", "l_linenumber", "rep")
    return (
        li.repartition(par)
        .select(k.alias("k"), "l_orderkey", "l_linenumber", rep)
        .select("k", uid.alias("uid"))
    )


def skew_hot_distinct_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct uids per key, naive formulation: one hash
    aggregate keyed on k. The hot key's ENTIRE value set builds on one
    reducer — the plan that stops scaling (and OOMs) first."""
    return (
        _skewed_items(spark, sf_dir)
        .groupBy("k")
        .agg(F.size(F.collect_set("uid")).cast("long").alias("n_items"))
    )


def skew_hot_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result via two_phase_agg: salt on the DISTINCT column
    (uid), so each (k, salt) slice holds a disjoint part of the key's
    value space; per-slice collect_set sizes sum to the exact distinct
    count and no task ever materializes more than ~1/N_SALTS of the
    hot key's state."""
    return two_phase_agg(
        _skewed_items(spark, sf_dir),
        keys=["k"],
        partial_aggs=[F.collect_set("uid").alias("s")],
        final_aggs=[F.sum(F.size("s")).cast("long").alias("n_items")],
        n_salts=N_SALTS,
        salt_src_cols=["uid"],
    )


# DuckDB oracle shared by both variants (identical output contract).
SKEW_DEMO_SQL = f"""
    WITH r AS (SELECT unnest(range({REPLICATION})) AS rep),
    d AS (
        SELECT CASE WHEN l_orderkey % 100 < {_HOT_PCT} THEN 'HOT'
                    ELSE CAST(l_orderkey % 100 AS VARCHAR) END AS k,
               concat_ws('-', l_orderkey, l_linenumber, rep) AS uid
        FROM lineitem CROSS JOIN r
    )
    SELECT k, CAST(count(DISTINCT uid) AS BIGINT) AS n_items
    FROM d GROUP BY k
"""
