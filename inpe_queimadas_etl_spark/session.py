"""SparkSession factory with scale-ready defaults.

The reference delegates physical execution to PostgreSQL and tunes it
per-session (work_mem, jit=off — see BASELINE.md). The Spark analog is
a session configured so Catalyst/AQE make the same class of decisions
automatically: adaptive query execution for runtime re-planning and
skew handling, dynamic partition overwrite for the reference's
delete+insert-by-day idempotency (reference sql/marts/*.sql), Arrow for
any pandas-UDF path, and a shuffle-partition count sized to the local
parallelism (on a real cluster this should be ~2-3x total cores or
left to AQE coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "inpe-queimadas-etl-spark"

_WARNED_DRIVER_MEM = False


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are chosen to be correct on ``local[N]`` and to carry the
    right semantics to a large cluster:

    - AQE on (coalesce post-shuffle partitions, skew-join splitting) —
      the runtime analog of the reference's manual session tuning.
    - ``partitionOverwriteMode=dynamic`` so writing a day's mart only
      replaces that day's partition (reference's delete+insert by day).
    - UTC session timezone so date/timestamp semantics are stable and
      match the DuckDB oracle.
    - Arrow enabled for the pandas-UDF operators (geo, multimodal).
    """
    cpus = _cpus()
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    # Driver heap sized to the role it plays: in local[N] mode the
    # driver JVM IS every executor, and Spark's unconfigured default
    # (1g) leaves ~420 MB of unified memory for N concurrent tasks
    # plus every localCheckpoint block — measured at N=32/sf0.1 as GC
    # thrash that doubled suite-tail query times (r12, guide §5).
    # Env-overridable; on a real cluster submit sets driver/executor
    # memory explicitly and this default is irrelevant (a driver that
    # only plans and collects bounded results needs far less).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    # Throughput collector for the batch role (r13, guide §5/§9): in
    # local[N] the driver JVM is every executor, and G1 (the JDK
    # default) develops an aged-heap pathology on allocation-burst
    # reducers — measured on the 25-query bench prefix: the hot-key
    # collect_set query read 5.1 s under aged G1 vs 2.0 s in a fresh
    # JVM vs 1.5 s under ParallelGC, and 24 of 27 prefix queries ran
    # at or below their G1 times under ParallelGC (geomean -11 %,
    # full table in OPTIMIZATION_r13.md). Env-overridable (set
    # SPARK_GRAFT_DRIVER_GC="" to keep the JVM default); on a real
    # cluster submit-time executor JVM options override this, same as
    # driver memory. Like spark.driver.memory, only effective when
    # THIS process launches the JVM.
    driver_gc = os.environ.get("SPARK_GRAFT_DRIVER_GC", "-XX:+UseParallelGC")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.maxResultSize", "2g")
    )
    if driver_gc:
        builder = builder.config("spark.driver.extraJavaOptions", driver_gc)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    # spark.driver.memory only takes effect when THIS call launches
    # the JVM gateway; a pre-existing in-process session (second
    # get_spark call, pyspark shell, spark-submit with its own sizing)
    # silently keeps its original heap (ADVICE r12). Warn once so a
    # caller cannot believe the heap is sized when it is not.
    global _WARNED_DRIVER_MEM
    try:
        effective = spark.conf.get("spark.driver.memory", "")
    except Exception:
        effective = ""
    if effective != driver_mem and not _WARNED_DRIVER_MEM:
        _WARNED_DRIVER_MEM = True
        import warnings

        warnings.warn(
            f"requested spark.driver.memory={driver_mem} but the "
            f"already-running JVM reports {effective or 'unset'}; "
            "driver memory is fixed at first JVM launch",
            RuntimeWarning,
            stacklevel=2,
        )
    return spark


TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Testdata columns written with parquet TIMESTAMP(NANOS), which Spark
# only reads as raw longs (spark.sql.legacy.parquet.nanosAsLong).
_NANO_TS_COLS = {"ts", "o_orderdate", "l_shipdate"}


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one driver-provided parquet table (TESTDATA.md).

    Nanosecond-precision timestamp columns are read as nano-longs and
    normalized to TIMESTAMP (microsecond truncation — matching how
    DuckDB reads the same files for the oracle)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name in _NANO_TS_COLS and isinstance(field.dataType, T.LongType):
            # Keep the raw int64 column (renamed __{col}_ns): a filter
            # on the reconstructed timestamp is a post-scan expression
            # Catalyst cannot push into parquet, but day_filter()
            # rewrites date bounds onto the raw long, which DOES reach
            # the scan (PushedFilters -> row-group min/max pruning).
            raw = f"__{field.name}_ns"
            df = df.withColumnRenamed(field.name, raw).withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{raw}` div 1000")),
            )
    return df


_NS_PER_DAY = 86_400 * 1_000_000_000


def _date_ns(day: str) -> int:
    """UTC midnight of YYYY-MM-DD as nanoseconds since the epoch."""
    import datetime as dt

    d = dt.datetime.strptime(day, "%Y-%m-%d").replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp()) * 1_000_000_000


def day_filter(df, col: str, op: str, day: str):
    """Date-granularity predicate on a timestamp fact column that
    reaches the parquet scan as a pushed filter (row-group min/max
    pruning on a date-clustered fact table, vs the full scan a
    `to_date(col) <= lit` wrapper forces — Catalyst cannot push a
    filter through the cast). `to_date(ts) <= D` is exactly
    `ts < midnight(D+1)` under the UTC session timezone. For nano
    columns the bound is expressed on the raw int64 sibling kept by
    load_table; typed timestamp columns compare directly against a
    timestamp literal. Ops: < <= > >= on to_date(col)."""
    import datetime as dt

    from pyspark.sql import functions as F

    raw = f"__{col}_ns"
    if raw in df.columns:
        c = F.col(raw)
        lo = _date_ns(day)
        return {
            "<": c < lo,
            "<=": c < lo + _NS_PER_DAY,
            ">": c >= lo + _NS_PER_DAY,
            ">=": c >= lo,
        }[op]
    nxt = (
        dt.datetime.strptime(day, "%Y-%m-%d") + dt.timedelta(days=1)
    ).strftime("%Y-%m-%d")
    dtype = {f.name: f.dataType.simpleString() for f in df.schema.fields}[col]
    c = F.col(col)
    bound = lambda d: F.lit(d).cast(dtype)  # noqa: E731
    return {
        "<": c < bound(day),
        "<=": c < bound(nxt),
        ">": c >= bound(nxt),
        ">=": c >= bound(day),
    }[op]


def local_df(spark: SparkSession, rows, schema: T.StructType):
    """Small driver-built dims (geometry tables, lookup rows) as JVM
    LocalRelations: routing createDataFrame through pandas + Arrow
    turns the plan's `Scan ExistingRDD` (a Python RDD that must spin
    Python workers every time the dim is scanned or broadcast) into a
    `LocalTableScan` that lives entirely JVM-side. Falls back to the
    plain list path if the Arrow conversion is unavailable."""
    rows = list(rows)
    try:
        import pandas as pd

        names = [f.name for f in schema.fields]
        pdf = pd.DataFrame(rows or None, columns=names, dtype=object)
        return spark.createDataFrame(pdf, schema)
    except Exception:
        return spark.createDataFrame(rows, schema)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use.

    The internal ``__{col}_ns`` raw-long siblings load_table keeps for
    pushdown-friendly date bounds are dropped here: SQL view consumers
    (SELECT *, positional unions) must see only the public schema."""
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        internal = [c for c in df.columns if c.startswith("__") and c.endswith("_ns")]
        if internal:
            df = df.drop(*internal)
        df.createOrReplaceTempView(name)
