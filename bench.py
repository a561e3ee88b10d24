"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...}. The driver records this as
BENCH_r{N}.json; compare against BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "a8_fact_cube",
    "j7_crossjoin_zerofill",
    "w1_trend_moving_avg",
    "p7_stable_event_hash",
    "dd1_exact_dedup",
    "dd2_ngram_jaccard_pairs",
    "dd3_minhash_signatures",
    "dd4_minhash_lsh_candidates",
    "dd7_dedup_clusters",
    "sim1_knn_cosine_topk",
    "tx2_token_counts",
    "geo1_point_in_polygon_grid",
    "geo8_dense_pip",
    "geo4_uf_choropleth_day",
]


def main() -> None:
    from inpe_queimadas_etl_spark.session import get_spark
    from inpe_queimadas_etl_spark.suite import all_queries

    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm the JVM / session (codegen, parquet footer reads) so the
    # first timed query measures the plan, not session startup; keeps
    # round-over-round numbers comparable (VERDICT r1 #10).
    from inpe_queimadas_etl_spark.session import load_table

    for warm_tbl in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, SF_DIR, warm_tbl).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    sf_label = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf = float(sf_label)
    except ValueError:
        sf = sf_label
    result = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
