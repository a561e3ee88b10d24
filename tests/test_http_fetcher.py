"""S1 HTTP fetcher: 404-as-None routing signal, retry on 5xx, base-URL
selection, and end-to-end extract through a real localhost HTTP server
(no external network)."""

from __future__ import annotations

import datetime as dt
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib import error as uerror

import pytest

from inpe_queimadas_etl_spark.sources.csv_ingest import (
    InpeExtractor,
    LandingCache,
    http_fetcher,
)


@pytest.fixture()
def local_server():
    """Serves /diario/focos_diario_br_20240502.csv; everything else 404."""
    hits = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            hits.append(self.path)
            if self.path == "/diario/focos_diario_br_20240502.csv":
                body = b"lat;lon\n-10,5;-55,1\n"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", hits
    srv.shutdown()


def test_fetch_200_and_404(local_server):
    base, hits = local_server
    fetch = http_fetcher(
        daily_base_url=f"{base}/diario", monthly_base_url=f"{base}/mensal"
    )
    assert fetch("focos_diario_br_20240502.csv") == b"lat;lon\n-10,5;-55,1\n"
    assert fetch("focos_diario_br_19990101.csv") is None
    assert fetch("focos_mensal_br_200001.csv") is None
    # monthly keys hit the monthly base
    assert "/mensal/focos_mensal_br_200001.csv" in hits


def test_extractor_through_http(local_server, tmp_path):
    base, _ = local_server
    ex = InpeExtractor(
        cache=LandingCache(str(tmp_path)),
        fetcher=http_fetcher(
            daily_base_url=f"{base}/diario", monthly_base_url=f"{base}/mensal"
        ),
        today=dt.date(2024, 5, 3),
    )
    res = ex.extract_day(dt.date(2024, 5, 2))
    assert res.source == "daily"
    with open(res.path, "rb") as fh:
        assert fh.read().startswith(b"lat;lon")
    # older-than-retention day with no monthly archive either
    with pytest.raises(FileNotFoundError):
        ex.extract_day(dt.date(1999, 1, 1))


def test_retry_on_5xx_then_success():
    calls = []

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b"ok"

    def opener(req, timeout):
        calls.append(req.full_url)
        if len(calls) < 3:
            raise uerror.HTTPError(req.full_url, 503, "boom", {}, None)
        return FakeResp()

    fetch = http_fetcher(opener=opener, retries=2, backoff_s=0.0)
    assert fetch("focos_diario_br_20240502.csv") == b"ok"
    assert len(calls) == 3


def test_non_transient_http_error_raises():
    def opener(req, timeout):
        raise uerror.HTTPError(req.full_url, 403, "forbidden", {}, None)

    fetch = http_fetcher(opener=opener, retries=1, backoff_s=0.0)
    with pytest.raises(uerror.HTTPError):
        fetch("focos_diario_br_20240502.csv")


def test_connection_error_exhausts_retries():
    calls = []

    def opener(req, timeout):
        calls.append(1)
        raise uerror.URLError("refused")

    fetch = http_fetcher(opener=opener, retries=2, backoff_s=0.0)
    with pytest.raises(uerror.URLError):
        fetch("focos_diario_br_20240502.csv")
    assert len(calls) == 3


def test_retry_on_read_timeout_and_truncated_body():
    """A timeout DURING resp.read() (after connect) and a truncated
    body (IncompleteRead) both retry like connection errors."""
    import http.client as hclient

    calls = []

    class GoodResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b"ok"

    class TimeoutResp(GoodResp):
        def read(self):
            raise TimeoutError("read timed out")

    class TruncatedResp(GoodResp):
        def read(self):
            raise hclient.IncompleteRead(b"par")

    def opener(req, timeout):
        calls.append(1)
        if len(calls) == 1:
            return TimeoutResp()
        if len(calls) == 2:
            return TruncatedResp()
        return GoodResp()

    fetch = http_fetcher(opener=opener, retries=2, backoff_s=0.0)
    assert fetch("focos_diario_br_20240502.csv") == b"ok"
    assert len(calls) == 3
