"""CSV ingestion (reference S1-S6).

The reference downloads INPE daily CSVs with a file cache and
monthly-archive fallback (extract/inpe_focos_diario.py). The Spark
engine keeps the same shape: a driver-side fetch-to-landing-dir step
(HTTP stays in the driver; Spark never fetches), then a schema-sniffed
`spark.read.csv` over the landing file(s).

- Dialect sniffing reads the first 4 KiB and tries csv.Sniffer with
  ';'/',' candidates (extract:85-89), falling back to ';' (INPE's
  default) — the sniff is driver-side; the distributed read uses the
  resolved delimiter.
- All columns load as strings (transform casts), matching
  `pd.read_csv(dtype=str)` (transform:87).
- Monthly->daily extraction (S4, extract:116-156) finds the date
  column by name heuristics and filters rows whose ISO or dd/mm/yyyy
  date equals the target day — expressed as JVM regexp/filter so it
  pushes into the scan.
"""

from __future__ import annotations

import csv
import datetime as dt
import io
import zipfile
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.core import find_col, norm_name


def sniff_delimiter(path: str, default: str = ";") -> str:
    """S6 dialect sniff (extract/inpe_focos_diario.py:85-89)."""
    try:
        with open(path, encoding="utf-8", errors="replace") as fh:
            sample = fh.read(4096)
        return csv.Sniffer().sniff(sample, delimiters=";,").delimiter
    except (csv.Error, OSError):
        return default


def read_csv_all_string(spark: SparkSession, path: str, sep: str | None = None) -> DataFrame:
    """Header CSV -> all-string DataFrame (S6)."""
    sep = sep or sniff_delimiter(path)
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("inferSchema", False)
        .csv(path)
    )


def extract_zip_csv(zip_path: str, out_dir: str) -> str:
    """S3 (extract:71-82): stream the first CSV member out of a zip."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        member = next(n for n in zf.namelist() if n.lower().endswith(".csv"))
        target = out / Path(member).name
        with zf.open(member) as src, open(target, "wb") as dst:
            while True:
                chunk = src.read(1 << 20)
                if not chunk:
                    break
                dst.write(chunk)
    return str(target)


def filter_monthly_to_day(df: DataFrame, day: dt.date) -> DataFrame:
    """S4 (extract:116-156): locate the date column, extract an ISO
    (yyyy-mm-dd) or Brazilian (dd/mm/yyyy) date, keep rows == day."""
    cols = [norm_name(c) for c in df.columns]
    df = df.toDF(*cols)
    date_col = find_col(
        cols, ["data", "datahora", "data_hora_gmt", "data_pas"], ["data", "hora", "gmt"]
    )
    if date_col is None:
        raise ValueError(f"no date column found in {cols[:40]}")
    iso = F.regexp_extract(F.col(date_col), r"(\d{4}-\d{2}-\d{2})", 1)
    br = F.regexp_extract(F.col(date_col), r"(\d{2}/\d{2}/\d{4})", 1)
    parsed = F.coalesce(
        F.when(iso != "", F.to_date(iso, "yyyy-MM-dd")),
        F.when(br != "", F.to_date(br, "dd/MM/yyyy")),
    )
    return df.filter(parsed == F.lit(str(day)).cast("date"))


class LandingCache:
    """S1/S2 file cache (extract:212-255): fetch-once landing dir keyed
    by logical name; ``fetch`` is any callable writing bytes (HTTP in
    production, fixture copy in tests)."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path_for(self, key: str) -> Path:
        return self.root / key

    def get_or_fetch(self, key: str, fetch) -> str | None:
        target = self.path_for(key)
        if target.exists():
            return str(target)
        data = fetch()
        if data is None:
            return None
        if isinstance(data, str):
            data = data.encode("utf-8")
        target.write_bytes(data)
        return str(target)


# --- extract control flow (S1/S2/S5) ---------------------------------------

# candidate monthly archive names, tried in order
# (extract/inpe_focos_diario.py:29-34)
MONTHLY_CANDIDATES = (
    "focos_mensal_br_{ym}.csv",
    "focos_mensal_br_{ym}.zip",
    "focos_mensal_{ym}.csv",
    "focos_mensal_{ym}.zip",
)
DEFAULT_RETENTION_DAYS = 45  # settings.inpe_retention_days (config.py:16)


@dataclass(frozen=True)
class ExtractResult:
    """What the extract step resolved for a date: the landed file and
    whether it is the daily CSV or the monthly archive (the caller
    applies the monthly->daily Spark filter for 'monthly')."""

    file_date: dt.date
    source: str  # 'daily' | 'monthly'
    key: str  # logical name fetched (URL tail in production)
    path: str


class InpeExtractor:
    """S5 retention routing + S2 monthly candidate loop over an
    injected fetcher (extract/inpe_focos_diario.py:159-311).

    ``fetcher(name)`` returns the file bytes or None for a 404 — HTTP
    stays a driver-side concern and tests inject fixtures. Routing:
    dates older than ``retention_days`` (fallen off INPE's daily
    endpoint) try the monthly archive first, then daily; fresh dates
    try daily first, then monthly (:259-311). Every landed file goes
    through the write-once LandingCache, so retried days are free.
    """

    def __init__(
        self,
        cache: LandingCache,
        fetcher,
        retention_days: int = DEFAULT_RETENTION_DAYS,
        today: dt.date | None = None,
    ):
        self.cache = cache
        self.fetcher = fetcher
        self.retention_days = retention_days
        self.today = today or dt.date.today()

    @staticmethod
    def daily_key(d: dt.date) -> str:
        """URL tail of the daily CSV (extract:38-43)."""
        return f"focos_diario_br_{d.strftime('%Y%m%d')}.csv"

    def fetch_daily(self, d: dt.date) -> str | None:
        return self.cache.get_or_fetch(
            self.daily_key(d), lambda: self.fetcher(self.daily_key(d))
        )

    def fetch_monthly(self, d: dt.date) -> tuple[str, str] | None:
        """Try the monthly candidates in order; zip hits are extracted
        to the canonical monthly CSV cache key (S2+S3,
        extract:159-209). Returns (csv_path, winning key) or None."""
        ym = d.strftime("%Y%m")
        canonical = f"focos_mensal_{ym}.csv"
        cached = self.cache.path_for(canonical)
        if cached.exists():
            return str(cached), canonical
        for pattern in MONTHLY_CANDIDATES:
            key = pattern.format(ym=ym)
            data = self.fetcher(key)
            if data is None:
                continue
            if isinstance(data, str):
                data = data.encode("utf-8")
            if key.endswith(".zip"):
                zip_path = self.cache.path_for(f"focos_mensal_{ym}.zip")
                zip_path.write_bytes(data)
                extracted = extract_zip_csv(str(zip_path), str(self.cache.root))
                Path(extracted).replace(cached)
            else:
                cached.write_bytes(data)
            return str(cached), key
        return None

    def extract_day(self, d: dt.date) -> ExtractResult:
        """S5: route by retention cutoff, falling back to the other
        source; FileNotFoundError when neither exists."""
        cutoff = self.today - dt.timedelta(days=self.retention_days)
        order = ("monthly", "daily") if d <= cutoff else ("daily", "monthly")
        for source in order:
            if source == "daily":
                path = self.fetch_daily(d)
                if path is not None:
                    return ExtractResult(d, "daily", self.daily_key(d), path)
            else:
                hit = self.fetch_monthly(d)
                if hit is not None:
                    path, key = hit
                    return ExtractResult(d, "monthly", key, path)
        raise FileNotFoundError(f"no daily or monthly source for {d.isoformat()}")



# public INPE endpoints (reference config.py:14-15)
INPE_DAILY_BASE_URL = (
    "https://dataserver-coids.inpe.br/queimadas/queimadas/focos/csv/diario/Brasil"
)
INPE_MONTHLY_BASE_URL = (
    "https://dataserver-coids.inpe.br/queimadas/queimadas/focos/csv/mensal/Brasil"
)


def http_fetcher(
    daily_base_url: str = INPE_DAILY_BASE_URL,
    monthly_base_url: str = INPE_MONTHLY_BASE_URL,
    timeout: float = 30.0,
    retries: int = 2,
    backoff_s: float = 0.5,
    opener=None,
):
    """S1's driver-side HTTP GET as an ``InpeExtractor`` fetcher
    (extract/inpe_focos_diario.py:212-255): 404 -> None (the routing
    signal), transient 5xx / connection errors retried with
    exponential backoff, anything else raised. Daily keys resolve
    against the daily base URL, monthly keys against the monthly one
    (config.py:14-15). ``opener`` is injectable for tests; default is
    ``urllib.request.urlopen``.

    HTTP stays on the driver by design: one small file per day lands
    in the LandingCache and only then does Spark read it — executors
    never see a URL.
    """
    import http.client as _hclient
    import time as _time
    from urllib import error as _uerror
    from urllib import request as _urequest

    open_fn = opener or _urequest.urlopen

    def fetch(name: str) -> bytes | None:
        base = daily_base_url if name.startswith("focos_diario") else monthly_base_url
        url = base.rstrip("/") + "/" + name
        for attempt in range(retries + 1):
            try:
                req = _urequest.Request(
                    url, headers={"User-Agent": "inpe-queimadas-etl-spark/1.0"}
                )
                with open_fn(req, timeout=timeout) as resp:
                    return resp.read()
            except _uerror.HTTPError as exc:
                if exc.code == 404:
                    return None
                if exc.code >= 500 and attempt < retries:
                    _time.sleep(backoff_s * (2**attempt))
                    continue
                raise
            except (OSError, _hclient.HTTPException):
                # URLError (connect), socket timeout DURING resp.read()
                # (TimeoutError/OSError), and truncated bodies
                # (IncompleteRead, an HTTPException) are all transient:
                # retry them uniformly
                if attempt < retries:
                    _time.sleep(backoff_s * (2**attempt))
                    continue
                raise
        return None

    return fetch


def load_extracted_day(
    spark: SparkSession, result: ExtractResult
) -> DataFrame:
    """Landed file -> all-string DataFrame for the day: daily files
    read directly; monthly archives go through the Spark-side
    monthly->daily filter (S4)."""
    df = read_csv_all_string(spark, result.path)
    if result.source == "monthly":
        df = filter_monthly_to_day(df, result.file_date)
    return df


def write_fixture_csv(path: str, header: list[str], rows: list[list], sep: str = ";") -> str:
    """Test helper: write a CSV with the given dialect."""
    buf = io.StringIO()
    writer = csv.writer(buf, delimiter=sep, lineterminator="\n")
    writer.writerow(header)
    writer.writerows(rows)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(buf.getvalue(), encoding="utf-8")
    return path
