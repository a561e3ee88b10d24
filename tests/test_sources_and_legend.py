"""Sources (S3/S4/S6) + legend-breaks (A13) unit tests."""

from __future__ import annotations

import datetime as dt
import zipfile

from inpe_queimadas_etl_spark.functions.legend import compute_breaks
from inpe_queimadas_etl_spark.sources.csv_ingest import (
    LandingCache,
    extract_zip_csv,
    filter_monthly_to_day,
    read_csv_all_string,
    sniff_delimiter,
    write_fixture_csv,
)


def test_sniff_delimiter(tmp_path):
    p1 = write_fixture_csv(str(tmp_path / "a.csv"), ["a", "b"], [["1", "2"]], sep=";")
    p2 = write_fixture_csv(str(tmp_path / "b.csv"), ["a", "b"], [["1", "2"]], sep=",")
    assert sniff_delimiter(p1) == ";"
    assert sniff_delimiter(p2) == ","


def test_monthly_to_daily_filter(spark, tmp_path):
    header = ["DataHora", "valor"]
    rows = [
        ["2024-05-02 10:00:00", "1"],
        ["02/05/2024 11:00", "2"],  # Brazilian format, same day
        ["2024-05-03 10:00:00", "3"],
    ]
    path = write_fixture_csv(str(tmp_path / "monthly.csv"), header, rows, sep=";")
    df = read_csv_all_string(spark, path)
    out = filter_monthly_to_day(df, dt.date(2024, 5, 2)).collect()
    assert sorted(r["valor"] for r in out) == ["1", "2"]


def test_zip_extraction(tmp_path):
    csv_inner = "a;b\n1;2\n"
    zpath = tmp_path / "m.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("readme.txt", "x")
        zf.writestr("focos_mensal.csv", csv_inner)
    out = extract_zip_csv(str(zpath), str(tmp_path / "landing"))
    assert out.endswith("focos_mensal.csv")
    assert open(out).read() == csv_inner


def test_landing_cache(tmp_path):
    calls = []

    def fetch():
        calls.append(1)
        return b"data"

    cache = LandingCache(str(tmp_path / "cache"))
    p1 = cache.get_or_fetch("k1.csv", fetch)
    p2 = cache.get_or_fetch("k1.csv", fetch)
    assert p1 == p2 and len(calls) == 1
    assert cache.get_or_fetch("missing.csv", lambda: None) is None


# --- legend breaks (reference api/app/main.py:218-314 parity) ---


def test_breaks_empty():
    res = compute_breaks([])
    assert res["breaks"] == [0.0, 1.0] and res["method"] == "equal"


def test_breaks_single_value():
    res = compute_breaks([7, 7, 7])
    assert res["breaks"] == [7.0, 8.0] and res["method"] == "equal"


def test_breaks_zero_class_split():
    res = compute_breaks([0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    assert res["zero_class"] is True
    # quantiles computed on positives only
    assert res["breaks"][0] == 1.0 and res["breaks"][-1] == 10.0
    assert res["method"] == "quantile"
    assert len(res["palette"]) == len(res["breaks"])  # zero color prepended


def test_breaks_strictly_increasing_fallback():
    # heavy ties collapse quantiles -> equal-interval fallback
    res = compute_breaks([1] * 50 + [2])
    assert res["method"] == "equal"
    b = res["breaks"]
    assert all(b[i] > b[i - 1] for i in range(1, len(b)))


def test_breaks_nearest_rank_parity():
    """idx = int(round((n-1)*q)) with banker's rounding."""
    values = list(range(1, 12))  # n=11, (n-1)*0.2 = 2.0 -> idx 2 -> 3
    res = compute_breaks(values, zero_class=False)
    assert res["breaks"] == [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
