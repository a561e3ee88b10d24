"""Bucketed warehouse tables: pay the shuffle once at write time.

The reference co-locates by primary key inside Postgres (event_hash
PK, load/postgis.py:69-94) and lets the planner use the index; the
Spark-native analog is hash bucketing. ``bucketBy(n, key)`` at write
time hash-partitions files on the key and records the layout in the
catalog, so every later join or aggregation on that key reads the
buckets as pre-shuffled input — SortMergeJoin without an Exchange on
either side, groupBy without a shuffle. At 100 TB this converts the
fact table's per-query shuffle (the dominant cost of repeated
fact-fact and fact-dim-key joins) into a one-time write cost.

Rules that make co-location actually fire (and that the tests pin):
- both sides bucketed on the join key with the SAME bucket count
  (Spark 3+ can coalesce mismatched counts when one divides the
  other, but same-count is the predictable contract);
- ``sortBy`` the same key so the SortMergeJoin reads presorted
  buckets and skips its Sort;
- bucket count sized so one bucket of the big table fits an executor
  core's working set (buckets = parallelism ceiling for the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) parquet table.

    ``path`` makes the table external (tests point it at a tmp dir);
    without it the session's warehouse dir is used. Sorting defaults
    to the bucket key — the layout SortMergeJoin wants.
    """
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must name at least one column")
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    sort_cols = sort_cols if sort_cols is not None else bucket_cols
    if sort_cols:
        writer = writer.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key: with matching bucket
    counts the plan is a shuffle-free (and, with sortBy, sort-free)
    SortMergeJoin over co-located buckets."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
