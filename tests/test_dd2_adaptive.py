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
