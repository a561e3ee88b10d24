"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized shuffle partitions, but it only works
for sort-merge joins AFTER a shuffle materializes the skew. Salting
removes the hot key from the shuffle key itself, which is the move
that still works when AQE can't see the skew (aggregation state, or
a join AQE planned as a single hash partition per key):

- ``salted_join``: big side gets a deterministic salt in [0, n);
  the small side is replicated n times (one row per salt). The
  shuffle key becomes (key, salt) — a hot key spreads over n
  reducers. Use when the small side is too big to broadcast but
  small enough to replicate n-fold.
- ``two_phase_agg``: pre-aggregate on (key, salt), then finish on
  key. For algebraic aggregates Spark's map-side partials already do
  this implicitly; the explicit form matters for the non-algebraic
  cases (collect_list / exact distinct counting) where one hot key
  otherwise funnels every row into a single reducer.

The salt must be DETERMINISTIC (hash of stable columns, not rand())
so retried tasks and AQE re-plans see the same assignment — a
nondeterministic salt breaks shuffle replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    salt_src_cols: list[str],
    n_salts: int,
    salt_col: str = "__salt",
) -> DataFrame:
    """Deterministic salt in [0, n_salts) from stable row columns
    (xxhash64, map-side, replay-safe)."""
    if n_salts <= 0:
        raise ValueError(f"n_salts must be positive, got {n_salts}")
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*salt_src_cols), F.lit(n_salts)).cast("int"),
    )


# join types where replicating the small side is sound: every big row
# joins/filters against the replica carrying its own salt, and no
# small-side row can null-extend on its own
_SALTED_JOIN_HOW = {"inner", "left", "left_outer", "leftouter",
                    "left_semi", "leftsemi", "left_anti", "leftanti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int,
    salt_src_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    reducers: big gets a deterministic salt, small is replicated once
    per salt value (explode of a literal range — n_salts x |small|
    rows), and the join runs on (on + salt). Result columns match the
    plain ``big.join(small, on, how)``.

    ``salt_src_cols`` must be stable columns that VARY WITHIN a join
    key (an id, a payload hash) — salting on the join key itself
    would assign every row of a hot key the same salt and spread
    nothing, so ``on``-only sources are rejected. Right/full joins
    are rejected too: an unmatched small-side row exists once per
    replica and would null-extend n_salts times.

    Cost model: replication multiplies the small side's shuffle
    volume by n_salts; pick the smallest n that flattens the hot
    key's reducer. For a small side that fits in memory, broadcast
    beats salting — this is for the middle regime."""
    if how.lower() not in _SALTED_JOIN_HOW:
        raise ValueError(
            f"salted_join supports {sorted(_SALTED_JOIN_HOW)}, got {how!r}: "
            "right/full joins would duplicate unmatched small-side rows "
            "once per salt replica"
        )
    if set(salt_src_cols) <= set(on):
        raise ValueError(
            "salt_src_cols must include a column that varies within a "
            f"join key; salting on the join key itself ({salt_src_cols}) "
            "leaves every hot-key row on one reducer"
        )
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError(
            "inputs already carry a __salt column; rename it before "
            "salted_join"
        )
    bigs = with_salt(big, salt_src_cols, n_salts)
    smalls = small.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(n_salts - 1).cast("int"))
        ),
    )
    return bigs.join(smalls, [*on, "__salt"], how).drop("__salt")


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int,
    salt_src_cols: list[str],
) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates on
    (keys, salt) — a hot key's rows land on n_salts reducers — and
    phase 2 merges the per-salt partials on keys alone (n_salts rows
    per key, trivially cheap). ``partial_aggs`` / ``final_aggs`` must
    be a decomposition of the target aggregate (e.g. partial
    ``sum(x) AS s`` + final ``sum(s)``, or partial ``collect_set`` +
    final ``array_distinct(flatten(collect_list(...)))``)."""
    salted = with_salt(df, salt_src_cols, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
