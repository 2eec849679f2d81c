"""C4 end-to-end: the real REST page_fn against a recorded-response HTTP
fixture — canned Binance-style JSON plus scripted 429/418 ban responses —
so the retry/ban/backoff path runs for real instead of by inspection.

Driver-side pure-Python tests (no Spark session needed): the same page_fn
object is what mapInPandas tasks call inside fetch partitions.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from binance_etl_clickhouse_spark.sources.fetcher import (
    FetchConfig,
    binance_rest_page_fn,
    margin_rate_benign_error,
    paginate_symbol,
)

H = 3_600_000
T0 = 1704067200000


def _kline_row(bar_i: int) -> list:
    ts = T0 + bar_i * H
    return [ts, "100.0", "101.0", "99.0", "100.5", "10.0", ts + H - 1,
            "1000.0", 5, "4.0", "400.0", "0"]


@pytest.fixture()
def scripted_server():
    """HTTP server that replays a script of (status, body) responses."""
    script: list[tuple[int, str]] = []
    seen: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            seen.append(self.path)
            status, body = script.pop(0) if script else (200, "[]")
            payload = body.encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}/klines", script, seen
    finally:
        srv.shutdown()


@pytest.fixture()
def recorded_sleeps(monkeypatch):
    """Capture every sleep (ban waits + retry backoff) without waiting.

    Only THIS thread's sleeps are captured: a live Spark session in the
    pytest process runs daemon threads that loop on ``time.sleep(1)``, and
    a global no-op patch both floods the recording with their 1s ticks and
    turns their loops into busy-spins. Other threads get the real sleep.
    """
    calls: list[float] = []
    real_sleep = time.sleep
    me = threading.current_thread()

    def fake_sleep(s):
        if threading.current_thread() is me:
            calls.append(s)
        else:
            real_sleep(s)

    monkeypatch.setattr(time, "sleep", fake_sleep)
    return calls


def test_rest_fetch_parses_pages_and_paginates(scripted_server, recorded_sleeps):
    url, script, seen = scripted_server
    # two full pages then a short page -> pagination stops itself
    script += [
        (200, json.dumps([_kline_row(i) for i in range(3)])),
        (200, json.dumps([_kline_row(i) for i in range(3, 5)])),
    ]
    page_fn = binance_rest_page_fn(base_url=url, interval="1h")
    cfg = FetchConfig(interval="1h", page_limit=3, backoff_base_s=0.0)
    pages = list(paginate_symbol("BTCUSDT", T0, T0 + 10 * H, page_fn, cfg))
    assert [len(p) for p in pages] == [3, 2]
    assert list(pages[0]["src_order"].unique()) == [0]
    assert list(pages[1]["src_order"].unique()) == [1]
    # watermark resume: second request starts at last bar's open ts + 1
    assert f"startTime={T0 + 2 * H + 1}" in seen[1]
    assert "symbol=BTCUSDT" in seen[0] and "interval=1h" in seen[0]


def test_rest_429_ban_parse_sleeps_until_ban_end(scripted_server, recorded_sleeps):
    url, script, seen = scripted_server
    ban_until_ms = int(time.time() * 1000) + 30_000  # 30s from now
    script += [
        (429, json.dumps({"code": -1003, "msg": f"Way too much request weight used; IP banned until {ban_until_ms}."})),
        (200, json.dumps([_kline_row(0)])),
    ]
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, backoff_base_s=0.25)
    pages = list(paginate_symbol("ETHUSDT", T0, T0 + H, page_fn, cfg))
    assert len(pages) == 1 and len(pages[0]) == 1  # recovered after the ban
    assert len(seen) == 2  # one banned attempt + one retry
    # first sleep is the parsed ban wait (~30s), second the retry backoff
    assert 25.0 <= recorded_sleeps[0] <= 30.0
    assert recorded_sleeps[1] == 0.25


def test_rest_418_without_ban_body_uses_default_backoff(scripted_server, recorded_sleeps):
    url, script, seen = scripted_server
    script += [
        (418, json.dumps({"code": -1003, "msg": "teapot"})),
        (200, json.dumps([_kline_row(0)])),
    ]
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, backoff_base_s=0.5)
    pages = list(paginate_symbol("BNBUSDT", T0, T0 + H, page_fn, cfg))
    assert len(pages) == 1
    assert recorded_sleeps[0] == 60.0  # unparseable ban -> default wait
    assert recorded_sleeps[1] == 0.5


def test_rest_persistent_failure_raises_after_retries(scripted_server, recorded_sleeps):
    url, script, seen = scripted_server
    script += [(500, "{}")] * 3
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, max_retries=3, backoff_base_s=0.1)
    with pytest.raises(RuntimeError, match="after 3 tries"):
        list(paginate_symbol("XRPUSDT", T0, T0 + H, page_fn, cfg))
    assert len(seen) == 3
    # exponential backoff BETWEEN attempts only: no dead sleep after the
    # final failure (3 attempts -> 2 sleeps)
    assert recorded_sleeps == [0.1, 0.2]


def test_rest_1102_unsupported_asset_is_benign_empty(scripted_server, recorded_sleeps):
    """r9 item, r10 scoping (reference additional_data.py:164-165): on the
    MARGIN-RATE source — the only endpoint that opts in via
    ``benign_empty=margin_rate_benign_error`` — a -1102 'asset not
    supported' error is END-OF-DATA for the symbol: empty result, no
    retries, no fetch_error sentinel."""
    url, script, seen = scripted_server
    script += [
        (400, json.dumps({"code": -1102, "msg": "Mandatory parameter asset "
                          "was not sent, was empty/null, or malformed."})),
    ]
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, max_retries=3, backoff_base_s=0.1,
                      benign_empty=margin_rate_benign_error)
    pages = list(paginate_symbol("NOPEUSDT", T0, T0 + H, page_fn, cfg))
    assert pages == []          # benign empty, not an exception
    assert len(seen) == 1       # and NOT retried three times
    assert recorded_sleeps == []  # no backoff sleeps for the benign path


def test_rest_1102_on_unscoped_source_still_fails(scripted_server, recorded_sleeps):
    """r10 (r9 advice): -1102 is Binance's generic 'mandatory parameter
    empty/malformed' client error. A source that did NOT opt into the
    margin-rate benign mapping must surface it as a real failure — NOT
    silently truncate to end-of-data."""
    url, script, seen = scripted_server
    script += [(400, json.dumps({"code": -1102, "msg": "Mandatory parameter "
                                 "'symbol' was not sent."}))] * 3
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, max_retries=3, backoff_base_s=0.1)  # default: no benign map
    with pytest.raises(RuntimeError, match="after 3 tries"):
        list(paginate_symbol("KLINEUSDT", T0, T0 + H, page_fn, cfg))
    assert len(seen) == 3


def test_rest_1102_match_is_structural_not_substring(scripted_server, recorded_sleeps):
    """r10 (r9 advice): the benign predicate reads the parsed JSON ``code``
    field, so an unrelated error whose free-text merely mentions '-1102'
    must NOT be swallowed — even on the margin-rate source."""
    url, script, seen = scripted_server
    script += [(400, json.dumps({"code": -1121,
                                 "msg": "Invalid symbol (see docs re -1102)."}))] * 3
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, max_retries=3, backoff_base_s=0.1,
                      benign_empty=margin_rate_benign_error)
    with pytest.raises(RuntimeError, match="after 3 tries"):
        list(paginate_symbol("BADUSDT", T0, T0 + H, page_fn, cfg))
    assert len(seen) == 3


def test_rest_other_400_errors_still_fail(scripted_server, recorded_sleeps):
    """Only margin-scoped -1102 maps to benign-empty; any other client
    error keeps the per-symbol failure semantics (retry then sentinel
    upstream)."""
    url, script, seen = scripted_server
    script += [(400, json.dumps({"code": -1121, "msg": "Invalid symbol."}))] * 3
    page_fn = binance_rest_page_fn(base_url=url)
    cfg = FetchConfig(page_limit=5, max_retries=3, backoff_base_s=0.1,
                      benign_empty=margin_rate_benign_error)
    with pytest.raises(RuntimeError, match="after 3 tries"):
        list(paginate_symbol("BADUSDT", T0, T0 + H, page_fn, cfg))
    assert len(seen) == 3
