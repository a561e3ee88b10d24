"""dd2 adaptive PPJoin prefix ordering: the df-ordering shuffles are
paid only on Zipfian shingle histograms; prefix filtering is lossless
under either order, so results are identical."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest

from inpe_queimadas_etl_spark.suite.llmdata import (
    _dd2_prefix_order_choice,
    dd2_ngram_jaccard_pairs,
)


def test_order_choice_flat_vs_zipfian():
    # measured synthetic-corpus histograms -> hash (flat)
    assert _dd2_prefix_order_choice(25, 9) == "hash"
    assert _dd2_prefix_order_choice(7, 1) == "hash"
    # hot-tailed (Zipfian) histograms -> df ordering
    assert _dd2_prefix_order_choice(500, 2) == "df"
    assert _dd2_prefix_order_choice(40, 1) == "df"
    # degenerate/empty stats default to hash (no ordering to pay for)
    assert _dd2_prefix_order_choice(None, None) == "hash"


def _brute_force_pairs(texts: dict[int, str], threshold=0.5):
    sets = {
        i: {tuple(ws[k : k + 3]) for k in range(len(ws) - 2)}
        for i, t in texts.items()
        if len(ws := t.split(" ")) >= 3
    }
    out = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / (len(sets[a]) + len(sets[b]) - inter) >= threshold:
            out.add((a, b))
    return out


@pytest.fixture(scope="module")
def zipf_dir(tmp_path_factory):
    """Small Zipfian corpus: every doc shares one hot phrase (df = n),
    plus a few true near-dup pairs; the df histogram is hot-tailed so
    the adaptive path must pick df ordering."""
    hot = "the quick brown"
    texts = {}
    for i in range(40):
        texts[i] = f"{hot} doc{i} alpha beta gamma delta{i} epsilon zeta{i}"
    # two true near-dup pairs (differ in one trailing word)
    texts[100] = "one two three four five six seven eight nine ten"
    texts[101] = "one two three four five six seven eight nine eleven"
    texts[102] = "red green blue cyan magenta yellow black white gray pink"
    texts[103] = "red green blue cyan magenta yellow black white gray teal"
    d = tmp_path_factory.mktemp("zipf")
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "fixture",
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d), texts


def test_zipfian_fixture_selects_df_ordering(zipf_dir):
    import duckdb

    d, texts = zipf_dir
    mx, md = duckdb.sql(
        f"""
        WITH docs AS (SELECT string_split(text,' ') AS w
                      FROM read_parquet('{d}/documents.parquet')
                      WHERE len(string_split(text,' ')) >= 3),
        sh AS (SELECT list_distinct(list_transform(range(len(w)-2),
                   i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS s,
                   row_number() OVER () AS doc FROM docs),
        df AS (SELECT s2, count(*) AS df FROM (SELECT unnest(s) AS s2, doc FROM sh) GROUP BY 1)
        SELECT max(df), median(df) FROM df
        """
    ).fetchone()
    assert _dd2_prefix_order_choice(mx, md) == "df"


@pytest.mark.parametrize("order", [None, "hash", "df"])
def test_dd2_identical_under_all_orders(spark, zipf_dir, order):
    d, texts = zipf_dir
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd2_ngram_jaccard_pairs(spark, d, prefix_order=order).collect()
    }
    assert got == _brute_force_pairs(texts)


def test_order_choice_routes_saturated_vocab_to_lsh():
    """VERDICT r4 #3 / SCALING.md adversarial regime #1: a flat df
    histogram with per-doc candidate degree past the budget routes to
    banded LSH; the measured testdata stats stay on the exact path."""
    # measured driver-testdata stats (31-word vocab, still sparse)
    assert (
        _dd2_prefix_order_choice(7, 1, n_docs=500, sum_df2=54_106) == "hash"
    )
    assert (
        _dd2_prefix_order_choice(25, 9, n_docs=5000, sum_df2=2_791_946)
        == "hash"
    )
    # same corpus shape at sf0.3+: df tripled => sum(df^2) ~9x
    assert (
        _dd2_prefix_order_choice(75, 27, n_docs=15_000, sum_df2=25_127_514)
        == "lsh"
    )
    # hot-tailed histograms keep df ordering no matter the volume
    assert (
        _dd2_prefix_order_choice(5000, 2, n_docs=15_000, sum_df2=25_127_514)
        == "df"
    )
    # missing stats (explicit prefix_order callers) default to hash
    assert _dd2_prefix_order_choice(25, 9) == "hash"


@pytest.fixture(scope="module")
def saturated_dir(tmp_path_factory):
    """Saturated-shingle-space corpus: 2,020 docs over a 12-word
    vocabulary (1,728 possible trigrams), the regime where every
    frequent shingle is in many docs and prefix filtering cannot
    prune (SCALING.md measured ~n^1.9 on this shape). 20 planted
    near-dup pairs (one trailing word changed, jaccard ~0.85)."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    texts = {}
    for i in range(2000):
        texts[i] = " ".join(rng.choice(vocab) for _ in range(40))
    for j in range(20):
        ws = texts[j].split(" ")
        ws[-1] = f"tail{j}"
        texts[10_000 + j] = " ".join(ws)
    d = tmp_path_factory.mktemp("saturated")
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": "en",
            "source": "fixture",
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(d / "documents.parquet")
    return str(d), texts


def test_saturated_corpus_detected_and_routed(spark, saturated_dir):
    """The adaptive stats computed on the saturated corpus itself must
    cross the LSH budget."""
    import duckdb

    d, _ = saturated_dir
    n, mx, md, df2 = duckdb.sql(
        f"""
        WITH docs AS (SELECT doc_id, string_split(text,' ') AS w
                      FROM read_parquet('{d}/documents.parquet')
                      WHERE len(string_split(text,' ')) >= 3),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                   range(len(w)-2),
                   i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))) AS s
               FROM docs),
        df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT (SELECT count(*) FROM docs), max(df), median(df),
               sum(df*df) FROM df
        """
    ).fetchone()
    assert (
        _dd2_prefix_order_choice(mx, md, n_docs=n, sum_df2=df2) == "lsh"
    ), (mx, md, n, df2)


def test_saturated_corpus_lsh_pairs_exact_and_bounded(spark, saturated_dir):
    """On the adversarial corpus the routed (adaptive) dd2 must return
    exactly the brute-force pairs — the planted near-dups sit at
    jaccard ~0.85 where banded recall is ~1-5e-14 — while the LSH
    candidate set stays a small fraction of the n^2 all-pairs volume
    the exact prefix join would be forced to verify."""
    from inpe_queimadas_etl_spark.suite.llmdata import (
        _dd2_lsh_candidate_pairs,
        _dd2_shingle_hash_sets,
    )

    d, texts = saturated_dir
    expected = _brute_force_pairs(texts)
    assert len(expected) == 20  # exactly the planted pairs

    got = {
        (r["doc_a"], r["doc_b"])
        for r in dd2_ngram_jaccard_pairs(spark, d).collect()
    }
    assert got == expected

    docs = spark.read.parquet(f"{d}/documents.parquet")
    sets = _dd2_shingle_hash_sets(docs).localCheckpoint(eager=True)
    n_docs = sets.count()
    n_cand = _dd2_lsh_candidate_pairs(sets, 0.5).count()
    all_pairs = n_docs * (n_docs - 1) / 2
    assert n_cand < 0.02 * all_pairs, (n_cand, all_pairs)
