"""Scaling validation for the geo family (VERDICT r4 #5, the twin of
scaling_dedup.py).

Generates synthetic `events` tables at 10k / 100k / 1M rows (the
driver sf0.1 table is 100k — this sweeps a decade either side), runs
geo1 (broadcast ray-cast PIP on the 12-cell grid), geo2 (bounded-
radius KNN fallback) and geo8 (PIP against ~2,000-vertex dense rings
— realistic IBGE municipality density) at each size, and fits the
wall-time-vs-rows exponent (log-log least squares). Results are
consumed through an unprunable checksum over every output column
(bit_xor of xxhash64(struct(*)) — same protocol as bench.py r5), so
the timings include the full attribution, not a pruned scan.

The polygon side is FIXED while points scale — the operative regime
at 100 TB, where the dim tables (5,570 municipalities) are broadcast
and the fact stream grows. Sub-linear-to-linear exponents mean the
mapInPandas kernel + grid index hold; a super-linear exponent would
flag a per-row blow-up in the kernel.

Usage: python scripts/scaling_geo.py  [env: SPARK_GRAFT_CPUS]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SIZES = {"10k": 10_000, "100k": 100_000, "1M": 1_000_000}
GEO_QUERIES = ["geo1_point_in_polygon_grid", "geo2_knn_fallback", "geo8_dense_pip"]


def gen_events(n: int, seed: int) -> pa.Table:
    """events-shaped table: geo1/geo2/geo8 read event_id, user_id and
    value only; value in [0, 300) spans the whole synthetic grid via
    the suite's value/10 - 10 mapping (plus points outside it)."""
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "event_id": pa.array(range(n), type=pa.int64()),
            "user_id": pa.array(
                rng.integers(0, 1_000_000, size=n), type=pa.int64()
            ),
            "value": pa.array(
                rng.uniform(0.0, 300.0, size=n), type=pa.float64()
            ),
        }
    )


def _consume(df) -> None:
    # the one canonical consume protocol lives in bench.py (repo root
    # is on sys.path before any _consume call) — a local copy would
    # silently diverge the next time the protocol changes
    from bench import _consume_checksum

    _consume_checksum(df)


def main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite import all_queries
    from inpe_queimadas_etl_spark.suite.geo import geo8_dense_pip

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        app_name="scaling-geo",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries.setdefault("geo8_dense_pip", geo8_dense_pip)

    results: dict[str, dict[str, float]] = {q: {} for q in GEO_QUERIES}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label, n in SIZES.items():
            d = os.path.join(tmp, label)
            os.makedirs(d)
            pq.write_table(
                gen_events(n, seed=42), os.path.join(d, "events.parquet")
            )
            dirs[label] = d

        # JVM/codegen warm-up at the smallest size
        for q in GEO_QUERIES:
            _consume(queries[q](spark, dirs["10k"]))

        for label in SIZES:
            for q in GEO_QUERIES:
                samples = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    _consume(queries[q](spark, dirs[label]))
                    samples.append(time.perf_counter() - t0)
                results[q][label] = round(min(samples), 3)
                print(f"# {q} {label}: {results[q][label]}s", file=sys.stderr)

    from scaling_common import fit_exponent

    exponents = {q: fit_exponent(SIZES, times) for q, times in results.items()}

    print(json.dumps({"times_sec": results, "scaling_exponent": exponents}))
    spark.stop()


if __name__ == "__main__":
    main()
