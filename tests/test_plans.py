"""Physical-plan guardrails: the properties that carry the 100 TB
design must survive refactors, not just the small-SF results.

- date bounds reach the parquet scan as PushedFilters (row-group
  min/max pruning on a date-clustered fact table);
- small dims join as BroadcastHashJoin (no fact-side shuffle);
- no suite query silently degrades to CartesianProduct, and nested-
  loop joins appear only where a bounded cross product is the plan
  (zero-fill dim x dim, the labeled brute-force ANN baseline).
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from inpe_queimadas_etl_spark.suite import all_queries

SF0001 = "/root/testdata/sf0.001"

QUERIES = all_queries()

# Bounded, intentional cross products only:
#   j7/geo4/geo7 zero-fill a small day x dim grid; sim1 is the labeled
#   brute-force baseline next to its bucketed scale variants (sim3/4);
#   sim4 scores every vector against the K-row broadcast codebook;
#   a11 joins two single-row aggregates; a13 spans legend breaks over
#   a handful of driver-built rows.
NESTED_LOOP_OK = {
    "j7_crossjoin_zerofill",
    # the battery unions cur7's plan, whose K-row eval-matrix broadcast
    # crossJoin is the intentional BNLJ pinned by
    # test_cur7_plan_single_exchange_no_join below
    "llm_ops_battery",
    "geo4_uf_choropleth_day",
    "geo7_mun_choropleth_day",
    "sim1_knn_cosine_topk",
    "sim4_ivf_ann",
    "a11_summary_totals",
    "a13_legend_breaks",
}


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_shipdate_filter_pushed_to_scan(spark):
    plan = _plan(QUERIES["q1_pricing_summary"](spark, SF0001))
    scans = [p for p in plan.split("PushedFilters: ") if "l_shipdate" in p.split("\n")[0]]
    assert scans, f"no pushed l_shipdate filter in scan:\n{plan}"


def test_q5_orderdate_filter_pushed_and_dims_broadcast(spark):
    plan = _plan(QUERIES["q5_local_supplier_volume"](spark, SF0001))
    pushed = [p.split("\n")[0] for p in plan.split("PushedFilters: ")[1:]]
    assert any("o_orderdate" in p for p in pushed), (
        f"o_orderdate bound not pushed: {pushed}"
    )
    assert plan.count("BroadcastHashJoin") >= 4, plan


def test_events_ts_filter_pushed_to_scan(spark):
    """day_filter's date bounds on events.ts must reach the parquet
    scan as PushedFilters (row-group min/max pruning) — a to_date(ts)
    wrapper would defeat pushdown. The testdata generator has shipped
    ts as both TIMESTAMP(NANOS) (read as int64, bounds rewritten onto
    the raw __ts_ns sibling) and TIMESTAMP(MICROS) (typed column,
    bounds pushed as timestamp literals); both pushed forms prune."""
    from inpe_queimadas_etl_spark.session import day_filter, load_table

    ev = load_table(spark, SF0001, "events")
    windowed = ev.filter(
        day_filter(ev, "ts", ">=", "2024-01-05")
        & day_filter(ev, "ts", "<", "2024-01-25")
    )
    plan = _plan(windowed)
    pushed = [p.split("\n")[0] for p in plan.split("PushedFilters: ")[1:]]
    nano_form = any(
        re.search(r"GreaterThanOrEqual\(ts,\d{18,19}\)", p) for p in pushed
    )
    micros_form = any(
        re.search(r"GreaterThanOrEqual\(ts,2024-01-05", p) for p in pushed
    )
    assert nano_form or micros_form, f"ts bound not pushed to scan: {pushed}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unintended_cross_products(spark, name):
    plan = _plan(QUERIES[name](spark, SF0001), "simple")
    assert "CartesianProduct" not in plan, f"{name} degraded to CartesianProduct"
    if name not in NESTED_LOOP_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name} has an unlisted nested-loop join:\n{plan}"
        )


def test_skew_two_phase_plan_spreads_hot_key(spark):
    """The two-phase skew plan must shuffle on (k, __salt) first — the
    hot key spread over N_SALTS reducers — and only then on k; the
    naive plan's single aggregate exchange partitions on k alone, the
    shape that funnels a hot key through one reducer (and OOMs at
    REPLICATION=8, see suite/skewdemo.py)."""
    from inpe_queimadas_etl_spark.suite.skewdemo import (
        skew_hot_distinct_naive,
        skew_hot_distinct_two_phase,
    )

    plan2 = _plan(skew_hot_distinct_two_phase(spark, SF0001))
    salted = [
        seg.split("\n")[0]
        for seg in plan2.split("hashpartitioning(")[1:]
        if seg.split("\n")[0].startswith("k#") and "__salt" in seg.split("\n")[0]
    ]
    assert salted, f"no (k, __salt) exchange in two-phase plan:\n{plan2}"

    plan1 = _plan(skew_hot_distinct_naive(spark, SF0001))
    assert "__salt" not in plan1
    agg_parts = [
        seg.split("\n")[0]
        for seg in plan1.split("hashpartitioning(")[1:]
        if seg.split("\n")[0].startswith("k#")
    ]
    assert agg_parts and all("__salt" not in p for p in agg_parts), plan1


def test_map_side_curation_ops_shuffle_free(spark):
    """cur3/cur4/tx5 are scan-shaped passes: any Exchange appearing in
    their plans means a refactor broke the zero-shuffle property that
    makes them free at 100 TB."""
    for name in (
        "cur3_repetition_filter",
        "cur4_stratified_sample",
        "tx5_pii_scrub",
    ):
        plan = _plan(QUERIES[name](spark, SF0001), "simple")
        assert "Exchange" not in plan, f"{name} gained a shuffle:\n{plan}"


def test_pack1_single_exchange_shared_partitioning(spark):
    """pack1's rollup groups on the window's partition keys, so the
    groupBy must reuse the window exchange (exactly one shuffle)."""
    plan = _plan(QUERIES["pack1_token_packing"](spark, SF0001), "simple")
    assert plan.count("Exchange") == 1, (
        f"pack1 expected exactly 1 exchange:\n{plan}"
    )


def test_tx6_topk_is_take_ordered(spark):
    """The corpus top-50 must plan as TakeOrderedAndProject (heap +
    driver merge), never a global Sort of the distinct-gram space."""
    plan = _plan(QUERIES["tx6_ngram_topk"](spark, SF0001), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan, f"tx6 planned a global sort:\n{plan}"


def test_bench_checksum_consume_defeats_pruning(spark):
    """VERDICT r4 #1: under ``.count()`` Catalyst prunes unreferenced
    expressions out of pure-projection plans (p7's timed 0.124 s was a
    parquet count with the md5 eliminated). The bench's checksum
    consume references every output column via xxhash64(struct(*)), so
    the md5 must be present in the consumed plan — and absent from the
    count plan, which is what made the old numbers hollow."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from bench import _consume_checksum  # noqa: E402

    from inpe_queimadas_etl_spark.suite.relational import p7_stable_event_hash

    df = p7_stable_event_hash(spark, SF0001)

    from pyspark.sql import functions as F

    consumed = df.select(
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("checksum")
    )
    assert "md5" in _plan(consumed, "simple"), (
        "checksum consume no longer forces the hash computation"
    )
    counted = df.groupBy().count()
    assert "md5" not in _plan(counted, "simple"), (
        "count() unexpectedly retains md5 — transition note in bench.py "
        "is stale"
    )
    # the runner really executes and returns one aggregated row
    assert len(_consume_checksum(df)) == 1


def test_dd2_lsh_route_is_equi_join_only(spark):
    """The saturated-vocab fallback (dd2 prefix_order='lsh') must stay
    an equi bucket join — the whole point of routing away from the
    prefix path is bounded candidate volume, which a silent
    cartesian/nested-loop degradation would void."""
    from inpe_queimadas_etl_spark.suite.llmdata import dd2_ngram_jaccard_pairs

    plan = _plan(
        dd2_ngram_jaccard_pairs(spark, SF0001, prefix_order="lsh"), "simple"
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cur6_split_shuffle_free(spark):
    """cur6 is a pure scan-shaped projection (two md5s + CASE): any
    Exchange means the leak-free split stopped being free at 100 TB."""
    from inpe_queimadas_etl_spark.suite.llmdata import cur6_leakfree_split

    plan = _plan(cur6_leakfree_split(spark, SF0001), "simple")
    assert "Exchange" not in plan, f"cur6 gained a shuffle:\n{plan}"


def test_cur5_rates_broadcast_corpus_never_shuffled(spark):
    """cur5's keep decision must join the K-row rate table via
    broadcast; a SortMergeJoin here would shuffle the whole corpus on
    `source` (few, skewed keys) — the exact 100-TB anti-plan."""
    from inpe_queimadas_etl_spark.suite.llmdata import cur5_mixture_resample

    plan = _plan(cur5_mixture_resample(spark, SF0001), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, (
        f"cur5 corpus-side shuffle join:\n{plan}"
    )


def test_tx7_model_eval_shuffle_free(spark):
    """tx7's whole model evaluation is an array transform + fold per
    row: any Exchange means the classifier stopped being a free gate
    in the curation scan."""
    from inpe_queimadas_etl_spark.suite.llmdata import tx7_model_quality_score

    plan = _plan(tx7_model_quality_score(spark, SF0001), "simple")
    assert "Exchange" not in plan, f"tx7 gained a shuffle:\n{plan}"


def test_sim5_broadcasts_queries_like_sim1(spark):
    """sim5 must keep sim1's scale shape: the query side broadcast
    (BroadcastNestedLoopJoin from the crossJoin), never a shuffled
    join or unbroadcast cartesian of corpus x queries."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim5_sq8_ann

    plan = _plan(sim5_sq8_ann(spark, SF0001), "simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sim6_dequantizes_only_probed_candidates(spark):
    """sim6's 100-TB contract: the scoring-time reconstruction
    (zip_with(qv, transform(codes, ...))) must sit ABOVE the cluster
    probe join — only probed candidates are dequantized — and the
    probe join must broadcast the query table, never shuffle the code
    store. Below the join, the corpus side carries only build-time
    encode work (quantize + stored norm), which a deployment pays
    once at index build, not per query."""
    from inpe_queimadas_etl_spark.suite.llmdata import sim6_ivf_sq8_ann

    df = sim6_ivf_sq8_ann(spark, SF0001)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.split("\n")
    probe_join = next(
        i for i, l in enumerate(lines) if "Join" in l and "qcluster" in l
    )
    assert "strategy=broadcast" in lines[probe_join], lines[probe_join]
    score_deq = next(
        i
        for i, l in enumerate(lines)
        if "zip_with" in l and "transform(codes" in l
    )
    # smaller index = closer to the plan root = above the join
    assert score_deq < probe_join, (
        f"scoring dequantize at line {score_deq} is NOT above the probe "
        f"join at {probe_join}:\n{plan}"
    )
    # and the physical plan keeps the store side shuffle-free into the
    # probe join (queries broadcast; no SortMergeJoin anywhere)
    phys = _plan(df, "simple")
    assert "SortMergeJoin" not in phys, phys
    assert "CartesianProduct" not in phys, phys


def test_tx7_broadcast_lookup_plan_shape(spark):
    """tx7's 2^18-bucket variant: the model table joins as a
    BroadcastHashJoin (O(1) bucket probe per word — never a shuffled
    join of the exploded corpus against the model), and the only
    shuffle is the per-document re-aggregation, whose rows are
    map-side-combined (doc_id, n_words, partial) triples — one per
    document, independent of model size. The rejected shapes are
    documented in the operator: the single-row array attach memcpys
    the whole model per row; a SortMergeJoin would shuffle every
    exploded word."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        tx7_broadcast_quality_score,
    )

    plan = _plan(tx7_broadcast_quality_score(spark, SF0001), "simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # exactly one shuffle: the doc_id re-agg (plus the model table's
    # BroadcastExchange, which is the point)
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, f"expected exactly the re-agg shuffle:\n{plan}"
    # and it is preceded by a partial aggregate (map-side combine)
    assert "partial_sum" in plan or "HashAggregate" in plan, plan


def test_sim6_code_store_build_is_window_free(spark):
    """sim6's index BUILD must not rank the K-times-expanded corpus
    through a window (that shuffles ~K x the corpus at build time):
    the nearest-centroid argmax is a per-row array_max over the
    collected codebook, so the only shuffle exchange left is the
    K-row centroid fold itself."""
    from pyspark.sql import functions as F

    from inpe_queimadas_etl_spark.session import load_table
    from inpe_queimadas_etl_spark.suite.llmdata import sim6_code_store

    from inpe_queimadas_etl_spark.operators.similarity import vec_norm

    emb = (
        load_table(spark, SF0001, "embeddings")
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .withColumn("nrm", vec_norm("v"))
    )
    plan = _plan(sim6_code_store(emb), "simple")
    assert "Window" not in plan, f"build ranks via window:\n{plan}"
    assert "SortMergeJoin" not in plan, plan
    # one exchange pair for the K-row centroid fold (partial + final
    # single-partition agg), nothing corpus-sized
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles <= 1, f"corpus-sized exchange in build:\n{plan}"


def test_dd10_shuffles_on_uniform_hash_and_doc(spark):
    """dd10's two shuffles must be the designed ones: repeat
    detection partitions on the 60-bit window hash (uniform — no hot
    key can exist) and the span merge partitions on doc_id (per-doc
    row count bounded by doc length). No cartesian anywhere."""
    from inpe_queimadas_etl_spark.suite.llmdata import dd10_duplicate_spans

    plan = _plan(dd10_duplicate_spans(spark, SF0001))
    assert "CartesianProduct" not in plan, plan
    assert "hashpartitioning(whash" in plan, plan
    assert "hashpartitioning(doc_id" in plan, plan


def test_dd12_one_exchange_no_join(spark):
    """dd12's 100-TB contract: assignment is map-side (collected
    codebook, Arrow argmax — no join, no Window), and the ONLY
    corpus-sized exchange is the hash on centroid_id that forms the
    cluster groups for the Arrow sweep (FlatMapGroupsInPandas). The
    (n_c)^2 pair volume never materializes as rows — it lives inside
    the per-cluster numpy block."""
    from inpe_queimadas_etl_spark.suite.llmdata import dd12_semantic_dedup

    plan = _plan(dd12_semantic_dedup(spark, SF0001), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "hashpartitioning(centroid_id" in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 1, f"expected only the grouping exchange:\n{plan}"


def test_dd12_ref_pairs_only_within_clusters(spark):
    """The JVM parity anchor keeps ITS contract too: the only
    corpus-sized join is the within-cluster self-join — an equi hash
    on centroid_id, never a global cartesian."""
    from inpe_queimadas_etl_spark.operators.similarity import vec_norm
    from inpe_queimadas_etl_spark.session import load_table
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _semantic_dedup_removals_ref,
    )

    emb = (
        load_table(spark, SF0001, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nrm", vec_norm("v"))
    )
    plan = _plan(_semantic_dedup_removals_ref(emb), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "Window" not in plan, plan
    assert "centroid_id" in plan, plan


def test_cur7_zero_exchange_scan_side_scorer(spark):
    """cur7's 100-TB contract: the eval matrix is collected (small by
    definition) and the whole scorer — every n x |eval| cosine AND the
    per-document rollup — runs inside the corpus scan as one Arrow
    pass (MapInPandas). ZERO exchanges, zero joins: nothing needs
    grouping because each row's rollup completes in the batch that
    scanned it."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        cur7_semantic_decontamination,
    )

    plan = _plan(cur7_semantic_decontamination(spark, SF0001), "simple")
    assert "Join" not in plan, plan
    assert "MapInPandas" in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_shuffles == 0, f"expected a pure scan-side plan:\n{plan}"


def test_tx8_model_joins_broadcast_corpus_never_token_shuffled(spark):
    """tx8's 100-TB contract: the model is small by construction
    (top-V vocab via TakeOrdered, <= (V+1)^2 bigram rows), so every
    model-side join BROADCASTS — the corpus is never hashed on a
    token key. The only exchanges carry map-side-combined partials
    over distinct keys (vocab, C1, C2) and final per-doc score rows."""
    from inpe_queimadas_etl_spark.suite.llmdata import tx8_lm_perplexity

    plan = _plan(tx8_lm_perplexity(spark, SF0001), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    # r12: C1 is read off the driver-side token-count collect (no
    # corpus pass, no exchange) and the corpus bigram stream folds
    # into ONE checkpointed per-doc histogram whose build exchange
    # lives behind the Scan ExistingRDD below — the visible plan
    # keeps only the C2 rollup (<= (V+1)^2 keys off the histogram)
    # and the per-doc score rollup
    assert n_shuffles == 2, f"C2 + per-doc rollup:\n{plan}"
    # the vocab is a materialized local relation, never re-derived
    # inside broadcast build sides (each re-derivation would be a
    # full corpus token scan at 100 TB)
    assert "LocalTableScan" in plan or "Scan ExistingRDD" in plan, plan
    assert "partial" in plan.lower(), plan


def test_cur8_model_broadcasts_corpus_never_feature_shuffled(spark):
    """cur8's 100-TB contract: the model is B rows by construction, so
    the B-row log-ratio table BROADCASTS into the scoring pass and the
    corpus feature stream is never hashed on a bucket key for a join.
    The only exchanges carry map-side-combined partials over <= B
    distinct keys (tc, rc), single-row totals (nt, nr), or final
    per-document score rows (the doc_id rollup)."""
    from inpe_queimadas_etl_spark.suite.llmdata import cur8_dsir_selection

    plan = _plan(cur8_dsir_selection(spark, SF0001), "simple")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial" in plan.lower(), plan


def test_cur9_takeordered_no_global_sort(spark):
    """cur9's selection is TakeOrdered — per-partition k-row heaps
    merged on the driver — never a full corpus sort, and it inherits
    cur8's broadcast-only model joins."""
    from inpe_queimadas_etl_spark.suite.llmdata import cur9_dsir_resample

    plan = _plan(cur9_dsir_resample(spark, SF0001), "simple")
    assert "TakeOrderedAndProject" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_emb1_encoder_is_zero_exchange_scan(spark):
    """emb1's 100-TB contract, both forms: the Arrow production path
    is ONE mapInPandas scan and the JVM reference form is pure
    expressions — zero exchanges and no explode-induced row blowup
    in either."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _hashed_doc_vectors_ref,
        hashed_doc_vectors,
    )
    from inpe_queimadas_etl_spark.session import load_table

    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    plan = _plan(hashed_doc_vectors(docs), "simple")
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
    ref_plan = _plan(_hashed_doc_vectors_ref(docs), "simple")
    assert "Exchange" not in ref_plan, ref_plan
    assert "MapInPandas" not in ref_plan, ref_plan


def test_cur10_eval_broadcasts_corpus_rolls_up_once(spark):
    """cur10's 100-TB contract: the eval window set broadcasts into
    the corpus window stream (strings never shuffle — both sides are
    60-bit fingerprints before any exchange), no SortMergeJoin for
    the hit join, and the per-doc rollup carries map-side partials.
    The final zero-fill left join keys on doc_id."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        cur10_substring_decontamination,
    )

    plan = _plan(cur10_substring_decontamination(spark, SF0001), "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "partial" in plan.lower(), plan
