"""Fetch-layer tests on the fixture transport (SURVEY §7.3 M5): probe
retry chain (C4), candidate generation (S4), pagination + early stop
(S5-S11/W1), blob Try-struct (C5)."""

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from kommunedata_data_pipeline_spark.sources.fetch import (
    FixtureTransport,
    HttpTransport,
    candidate_urls,
    fetch_blobs,
    harvest_listings,
    probe_one,
    probe_urls,
)


def test_candidate_urls_cartesian(spark):
    stems = spark.createDataFrame([("aarhus",), ("odense",)], "stem string")
    got = candidate_urls(stems)
    assert got.count() == 12  # 2 stems × 3 prefixes × 2 suffixes
    urls = [r.candidate_url for r in got.collect()]
    assert "https://dagsordener.aarhus.dk" in urls
    assert "https://dagsorden.odense.kommune.dk" in urls


def test_probe_retry_and_redirect(spark):
    t = FixtureTransport(
        status={"https://a.dk": 200, "https://b.dk": 404, "https://c.dk": 500, "https://d.dk": 200},
        redirects={"https://a.dk": "https://www.a.dk"},
        get_only=frozenset({"https://d.dk"}),  # HEAD → 405, GET → 200
    )
    cands = spark.createDataFrame(
        [("https://a.dk",), ("https://b.dk",), ("https://c.dk",), ("https://d.dk",)],
        "candidate_url string",
    )
    got = {r.candidate_url: r for r in probe_urls(cands, t).collect()}
    assert got["https://a.dk"].resolved_url == "https://www.a.dk"
    assert got["https://b.dk"].resolved_url is None  # still 404 after GET retry
    assert got["https://c.dk"].resolved_url is None
    # C4: d.dk succeeds ONLY via the GET fallback — proves the retry ran
    assert got["https://d.dk"].status == 200
    assert got["https://d.dk"].resolved_url == "https://d.dk"


def test_harvest_pagination_and_order_reification(spark):
    pages = {
        "https://s/start": [
            [("https://s/m1", "18-08-2025", "Referat"), ("https://s/m2", "19-08-2025", "Dagsorden")],
            [("https://s/m3", "20-08-2025", "Referat")],
        ]
    }
    t = FixtureTransport(pages=pages)
    config = spark.createDataFrame(
        [("aarhus", "Oekonomi", "https://s/start")],
        "municipality string, committee string, start_url string",
    )
    got = harvest_listings(config, t).orderBy("page_no", "pos").collect()
    assert [(r.page_no, r.pos, r.url) for r in got] == [
        (0, 0, "https://s/m1"),
        (0, 1, "https://s/m2"),
        (1, 0, "https://s/m3"),
    ]


def test_harvest_early_stop_under_limit(spark):
    pages = {
        "https://s/start": [
            [(f"https://s/m{i}", "18-08-2025", "Referat") for i in range(5)],
            [(f"https://s/n{i}", "19-08-2025", "Referat") for i in range(5)],
        ]
    }
    t = FixtureTransport(pages=pages)
    config = spark.createDataFrame(
        [("aarhus", "Oekonomi", "https://s/start")],
        "municipality string, committee string, start_url string",
    )
    got = harvest_listings(config, t, per_source_limit=3).collect()
    assert len(got) == 3  # early stop: page 2 never materialized rows past limit


# ---------------------------------------------------------------------------
# HttpTransport conformance — a loopback http.server stands in for the
# portal (tests never touch the open internet); the REAL urllib transport
# must behave exactly like FixtureTransport through the same fetch UDFs.

_PAGES = [
    [("m1", "2025-08-18", "Referat"), ("m2", "2025-08-19", "Dagsorden")],
    [("m3", "2025-08-20", "Referat")],
]


class _PortalHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _route(self, method):
        u = urlparse(self.path)
        if u.path == "/ok":
            return 200, b"ok"
        if u.path == "/slow":
            time.sleep(1.5)  # longer than the battery's transport timeout
            return 200, b"late"
        if u.path == "/redir":
            self.send_response(302)
            self.send_header("Location", "/ok")
            self.end_headers()
            return None, None
        if u.path == "/getonly":
            return (405, b"") if method == "HEAD" else (200, b"ok")
        if u.path == "/listing":
            q = parse_qs(u.query)
            page = int(q.get("page", ["0"])[0])
            min_date = q.get("min_date", [None])[0]
            rows = _PAGES[page] if page < len(_PAGES) else []
            if min_date:  # P4: the bound is honored server-side
                rows = [r for r in rows if r[1] >= min_date]
            return 200, json.dumps(rows).encode()
        if u.path == "/blob.pdf":
            return 200, b"%PDF-ok"
        return 404, b"not found"

    def do_GET(self):
        st, body = self._route("GET")
        if st is None:
            return
        self.send_response(st)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_HEAD(self):
        st, body = self._route("HEAD")
        if st is None:
            return
        self.send_response(st)
        self.end_headers()


@pytest.fixture(scope="module")
def portal():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _PortalHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_transport_probe_conformance(spark, portal):
    """Same URLs, same fetch UDF, both transports → same probe outcomes
    (HEAD→GET retry chain included)."""
    http_t = HttpTransport(timeout_s=5.0)
    fix_t = FixtureTransport(
        status={f"{portal}/ok": 200, f"{portal}/missing": 404},
        redirects={f"{portal}/redir": f"{portal}/ok"},
        pages={f"{portal}/ok": [], f"{portal}/redir": [], f"{portal}/getonly": []},
        get_only=frozenset({f"{portal}/getonly"}),
    )
    cands = spark.createDataFrame(
        [(f"{portal}/ok",), (f"{portal}/redir",), (f"{portal}/getonly",), (f"{portal}/missing",)],
        "candidate_url string",
    )
    got_http = {r.candidate_url: r for r in probe_urls(cands, http_t).collect()}
    got_fix = {r.candidate_url: r for r in probe_urls(cands, fix_t).collect()}
    for url in got_http:
        assert got_http[url].status == got_fix[url].status, url
        assert (got_http[url].resolved_url is None) == (got_fix[url].resolved_url is None), url
    # redirect resolves to the final URL through the real stack too
    assert got_http[f"{portal}/redir"].resolved_url == f"{portal}/ok"
    # C4 chain: /getonly succeeded only via the GET fallback
    assert got_http[f"{portal}/getonly"].status == 200


def test_http_transport_listing_pushdown_and_pagination(spark, portal):
    config = spark.createDataFrame(
        [("aarhus", "Oekonomi", f"{portal}/listing")],
        "municipality string, committee string, start_url string",
    )
    got = harvest_listings(config, HttpTransport(timeout_s=5.0)).orderBy(
        "page_no", "pos"
    ).collect()
    assert [(r.page_no, r.pos, r.url, r.raw_date) for r in got] == [
        (0, 0, "m1", "2025-08-18"),
        (0, 1, "m2", "2025-08-19"),
        (1, 0, "m3", "2025-08-20"),
    ]
    # P4: min_date travels to the portal as a query param and prunes rows
    bounded = harvest_listings(
        config, HttpTransport(timeout_s=5.0), min_date="2025-08-19"
    ).collect()
    assert sorted(r.url for r in bounded) == ["m2", "m3"]


def test_http_transport_blob_try_struct(spark, portal):
    wl = spark.createDataFrame(
        [(f"{portal}/blob.pdf",), (f"{portal}/missing.pdf",)], "url string"
    )
    got = {r.url: r for r in fetch_blobs(wl, HttpTransport(timeout_s=5.0)).collect()}
    assert got[f"{portal}/blob.pdf"].ok
    assert bytes(got[f"{portal}/blob.pdf"].content) == b"%PDF-ok"
    assert not got[f"{portal}/missing.pdf"].ok  # contained, not raised


# --------------------------------------------------------------------------
# Transport conformance battery: ONE parameterized contract, both
# transports. FixtureTransport and HttpTransport must be observably
# identical through probe_one (the C4 chain): same statuses, same
# resolved-url nullability, same exception containment, same EXACT
# number of transport invocations. HttpTransport runs against the
# loopback portal (never the open internet); its timeout case uses a
# route that sleeps past the configured timeout, the fixture's a raised
# TimeoutError — both must surface as the contained 599.


class _CountingTransport:
    """Wraps any Transport; counts (method, path-suffix) invocations."""

    def __init__(self, inner, hang_suffix=None):
        self.inner = inner
        self.calls = {}
        self.hang_suffix = hang_suffix

    def __call__(self, url, options):
        method = options.get("method", "HEAD") if options.get("kind", "probe") == "probe" else "GET"
        key = (method, url.rsplit("/", 1)[-1])
        self.calls[key] = self.calls.get(key, 0) + 1
        if self.hang_suffix and url.endswith(self.hang_suffix):
            raise TimeoutError("simulated hang")
        return self.inner(url, options)


def _fixture_pair(base):
    inner = FixtureTransport(
        status={f"{base}/ok": 200, f"{base}/missing": 404},
        redirects={f"{base}/redir": f"{base}/ok"},
        pages={f"{base}/ok": [], f"{base}/redir": [], f"{base}/getonly": []},
        get_only=frozenset({f"{base}/getonly"}),
    )
    return _CountingTransport(inner, hang_suffix="/slow")


def _http_pair(base):
    # timeout far below /slow's 1.5 s sleep: urllib must raise, the
    # chain must contain it — the REAL socket-level timeout path
    return _CountingTransport(HttpTransport(timeout_s=0.4))


@pytest.mark.parametrize("make_transport", [_fixture_pair, _http_pair], ids=["fixture", "http"])
def test_transport_conformance_contract(portal, make_transport):
    t = make_transport(portal)
    # (url-suffix, expected status, resolved non-null, expected calls
    #  [(method, suffix, n), ...])
    cases = [
        ("ok", 200, True, [("HEAD", "ok", 1)]),
        # 404 triggers the GET retry (C4), still 404 → exactly 2 calls
        ("missing", 404, False, [("HEAD", "missing", 1), ("GET", "missing", 1)]),
        # HEAD-rejecting endpoint: 405 → GET retry succeeds → 2 calls
        ("getonly", 200, True, [("HEAD", "getonly", 1), ("GET", "getonly", 1)]),
        # hang/timeout: contained as 599, never raised
        ("slow", 599, False, None),
    ]
    for suffix, want_st, want_resolved, want_calls in cases:
        st, resolved = probe_one(t, f"{portal}/{suffix}")
        assert st == want_st, suffix
        assert (resolved is not None) == want_resolved, suffix
        if want_calls is not None:
            for method, csuf, n in want_calls:
                assert t.calls.get((method, csuf), 0) == n, (suffix, method)
    # redirect: both transports resolve to the canonical target
    st, resolved = probe_one(t, f"{portal}/redir")
    assert st == 200 and resolved == f"{portal}/ok"
    # listing contract: pagination in-range, empty past the end
    lt = t.inner
    if isinstance(lt, FixtureTransport):
        lt.pages[f"{portal}/listing"] = _PAGES
    st, rows = lt(f"{portal}/listing", {"kind": "listing", "page_no": 0})
    assert st == 200 and [tuple(r) for r in rows] == _PAGES[0]
    st, rows = lt(f"{portal}/listing", {"kind": "listing", "page_no": 99})
    assert rows == []


def test_fetch_blobs_try_struct(spark):
    t = FixtureTransport(blobs={"https://s/ok.pdf": b"%PDF-ok"})
    wl = spark.createDataFrame(
        [("https://s/ok.pdf",), ("https://s/missing.pdf",)], "url string"
    )
    got = {r.url: r for r in fetch_blobs(wl, t).collect()}
    assert got["https://s/ok.pdf"].ok and bytes(got["https://s/ok.pdf"].content) == b"%PDF-ok"
    assert not got["https://s/missing.pdf"].ok
    assert got["https://s/missing.pdf"].error  # contained, not raised


def test_html_table_listing_parser():
    from kommunedata_data_pipeline_spark.sources.fetch import (
        html_table_listing_parser,
    )

    html = b"""
    <table>
      <tr><th>Dato</th><th>Type</th><th>Link</th></tr>
      <tr><td>18.08.2025</td><td>Referat</td>
          <td><a href="/doc/1.pdf">hent</a></td></tr>
      <tr><td><span>19-08-2025</span></td><td>Dagsorden</td>
          <td><a href="/doc/2.pdf">hent</a></td></tr>
      <tr><td>ingen link her</td><td>Referat</td><td>-</td></tr>
    </table>"""
    rows = html_table_listing_parser(html)
    assert rows == [
        ("/doc/1.pdf", "18.08.2025", "Referat"),
        ("/doc/2.pdf", "19-08-2025", "Dagsorden"),
    ]
