"""Tiered fetch layer (SURVEY §2.1 S3-S13, §2.12 C2-C5).

The reference's Selenium/requests machinery (scroll loops, paginated
tables, offset stepping, accordion expansion) is a *fetch-layer* concern,
not a query concern: the engine models every listing source as

    config rows --mapInPandas(harvest)--> (url, raw_date, raw_type,
                                           page_no, pos) rows

with **bounds pushed down into the fetch** (min/max date, committee,
limit — the reference pushes these into the portal's search form,
scraper_glostrup.py:139-148, SURVEY §4.1) and per-partition politeness
(rate limit C3, HEAD→GET retry chains C4, row-level error containment
C5).

Transport is injected so tests run on fixtures, never the network
(SURVEY §7.3 M5). All fetch UDFs are marked nondeterministic so Catalyst
never reorders filters *after* them, and the engine disables speculation
for fetch stages (session.py) — re-execution of a side-effecting fetch
is the №1 scale hazard (SURVEY §7.4).

Scale: `repartition(n_sources)` before the fetch so each source is one
task (the reference runs one OS process per scraper, run_scrapers.py:63);
AQE coalesces afterwards.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# transport: (url, options) -> (status_code, payload)
Transport = Callable[[str, dict], tuple[int, object]]

LISTING_SCHEMA = (
    "municipality string, committee string, start_url string, page_no int, "
    "pos int, url string, raw_date string, raw_type string"
)
PROBE_SCHEMA = "candidate_url string, status int, resolved_url string"
BLOB_SCHEMA = "url string, ok boolean, status int, content binary, error string"


@dataclass
class FixtureTransport:
    """Deterministic in-memory transport for tests: maps url → response.

    listing pages: ``pages[url]`` is a list of pages, each a list of
    (url, raw_date, raw_type) tuples — models pagination (S6-S8).
    """

    status: dict[str, int] = field(default_factory=dict)
    redirects: dict[str, str] = field(default_factory=dict)
    pages: dict[str, list[list[tuple[str, str, str]]]] = field(default_factory=dict)
    blobs: dict[str, bytes] = field(default_factory=dict)
    # urls that reject HEAD (405) but accept GET — exercises the C4 chain
    get_only: frozenset[str] = frozenset()

    def __call__(self, url: str, options: dict) -> tuple[int, object]:
        kind = options.get("kind", "probe")
        if kind == "probe" and url in self.get_only and options.get("method") != "GET":
            return 405, None
        st = self.status.get(url, 200 if kind != "probe" or url in self.pages or url in self.blobs or url in self.redirects else 404)
        if kind == "probe":
            return st, self.redirects.get(url, url if st < 400 else None)
        if kind == "listing":
            page_no = options.get("page_no", 0)
            pages = self.pages.get(url, [])
            return st, pages[page_no] if page_no < len(pages) else []
        if kind == "blob":
            blob = self.blobs.get(url)
            return (200, blob) if blob is not None else (404, None)
        raise ValueError(f"unknown kind {kind}")


def html_table_listing_parser(body: bytes) -> list[tuple[str, str, str]]:
    """Listing rows from a portal HTML table — the stdlib-regex twin of
    the reference's BeautifulSoup row walk (scraper.py:116-132): each
    ``<tr>`` holding an ``<a href>`` yields (url, raw_date, raw_type);
    raw_date is the first cell that looks like a date (the reference's 4
    accepted formats all start with digits), raw_type the first cell
    naming a known document type. Inject as ``HttpTransport(
    listing_parser=html_table_listing_parser)`` for HTML portals; the
    JSON default covers API-style ones."""
    import re as _re

    html = body.decode("utf-8", "replace")
    rows: list[tuple[str, str, str]] = []
    for tr in _re.findall(r"(?is)<tr[^>]*>(.*?)</tr>", html):
        m = _re.search(r'(?is)<a[^>]*href="([^"]+)"', tr)
        if not m:
            continue  # header/filler rows carry no link
        cells = [
            _re.sub(r"\s+", " ", _re.sub(r"<[^>]+>", " ", c)).strip()
            for c in _re.findall(r"(?is)<t[dh][^>]*>(.*?)</t[dh]>", tr)
        ]
        raw_date = next(
            (c for c in cells if _re.match(r"^\d{1,2}[.\-/ ]|^\d{4}-", c)), ""
        )
        raw_type = next(
            (c for c in cells if _re.search(r"(?i)referat|dagsorden|tillæg", c)), ""
        )
        rows.append((m.group(1), raw_date, raw_type))
    return rows


@dataclass
class HttpTransport:
    """Real network transport with the same shape as FixtureTransport —
    the production implementation of the injected `Transport` seam.

    Mirrors the reference's HEAD→GET probe semantics
    (get_base_url.py:36-59): `probe` issues the requested method (HEAD
    by default; `probe_urls` retries with GET on 403/404/405), follows
    redirects, and reports the final resolved URL. `listing` GETs the
    page with the pushed-down bounds as query parameters
    (page/min_date/max_date — P4) and parses the body with
    `listing_parser` (default: a JSON array of [url, raw_date, raw_type]
    rows; inject an HTML scraper per portal family the way the reference
    subclasses its scraper). `blob` GETs raw bytes.

    stdlib-only (urllib) so it exists in any container; tests exercise it
    against a loopback http.server fixture — never the open internet.
    Politeness/retry/containment stay in the fetch UDFs, which treat any
    raised exception as a contained row-level failure (C5)."""

    timeout_s: float = 10.0
    user_agent: str = "kommunedata-pipeline-spark/1.0"
    listing_parser: Callable[[bytes], list] | None = None

    def _open(self, url: str, method: str):
        import urllib.request

        req = urllib.request.Request(
            url, method=method, headers={"User-Agent": self.user_agent}
        )
        return urllib.request.urlopen(req, timeout=self.timeout_s)

    def __call__(self, url: str, options: dict) -> tuple[int, object]:
        import json
        import urllib.error
        import urllib.parse

        kind = options.get("kind", "probe")
        if kind == "probe":
            method = options.get("method", "HEAD")
            try:
                with self._open(url, method) as resp:
                    return resp.status, resp.geturl()
            except urllib.error.HTTPError as e:
                return e.code, None
        if kind == "listing":
            params = {"page": options.get("page_no", 0)}
            if options.get("min_date"):
                params["min_date"] = options["min_date"]
            if options.get("max_date"):
                params["max_date"] = options["max_date"]
            sep = "&" if "?" in url else "?"
            full = url + sep + urllib.parse.urlencode(params)
            try:
                with self._open(full, "GET") as resp:
                    body = resp.read()
            except urllib.error.HTTPError as e:
                return e.code, []
            parse = self.listing_parser or (lambda b: json.loads(b or b"[]"))
            rows = [tuple(r)[:3] for r in parse(body)]
            return 200, rows
        if kind == "blob":
            try:
                with self._open(url, "GET") as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as e:
                return e.code, None
        raise ValueError(f"unknown kind {kind}")


def candidate_urls(stems: DataFrame, stem_col: str = "stem") -> DataFrame:
    """S4 — candidate generation (get_base_url.py:62-81): stems ×
    {dagsordener,dagsordner,dagsorden} × {.dk, kommune.dk} as a
    posexplode over a literal array (no UDF, no shuffle). `priority`
    reifies the reference's try-in-order semantics (the first candidate
    that probes OK wins — order must be data, not incidental; O3)."""
    prefixes = ["dagsordener", "dagsordner", "dagsorden"]
    suffixes = ["dk", "kommunedk"]
    variants = F.array(
        *[
            F.concat(
                F.lit(f"https://{p}."),
                F.col(stem_col),
                F.lit("." if s == "dk" else ".kommune."),
                F.lit("dk"),
            )
            for p in prefixes
            for s in suffixes
        ]
    )
    return stems.select(
        stem_col, F.posexplode(variants).alias("priority", "candidate_url")
    )


def probe_one(transport: Transport, url: str) -> tuple[int, object]:
    """The C4 probe chain for ONE url — HEAD first, GET retry on
    403/404/405 (get_base_url.py:36-59), any raised error contained as
    status 599. Factored out of the UDF so the transport-conformance
    battery can assert the chain (statuses, resolved url, exact call
    count) against any Transport without a Spark worker in between."""
    try:
        st, resolved = transport(url, {"kind": "probe"})
        if st in (403, 404, 405):  # C4 retry with GET semantics
            st, resolved = transport(url, {"kind": "probe", "method": "GET"})
        return int(st), (resolved if st < 400 else None)
    except Exception:
        return 599, None


def probe_urls(
    candidates: DataFrame,
    transport: Transport,
    url_col: str = "candidate_url",
    rate_limit_s: float = 0.0,
) -> DataFrame:
    """S3/P8/C4 — HEAD-with-GET-fallback probe (get_base_url.py:36-59):
    returns (candidate_url, status, resolved_url). Keep `status < 400`
    downstream; canonical redirect target in resolved_url."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url in pdf[url_col]:
                if rate_limit_s:
                    time.sleep(rate_limit_s)  # C3 politeness
                st, resolved = probe_one(transport, url)
                rows.append((url, st, resolved))
            yield pd.DataFrame(rows, columns=["candidate_url", "status", "resolved_url"])

    out = candidates.select(F.col(url_col)).mapInPandas(batches, PROBE_SCHEMA)
    return out.asNondeterministic() if hasattr(out, "asNondeterministic") else out


def harvest_listings(
    config: DataFrame,
    transport: Transport,
    min_date: str | None = None,
    max_date: str | None = None,
    per_source_limit: int | None = None,
    max_pages: int = 100,
) -> DataFrame:
    """S5-S11 — listing harvest with pushdown + early stop.

    One task per config row (the fetch fan-out J1): paginate until an
    empty page, `max_pages`, or `per_source_limit` harvested rows —
    the reference's early-termination-under-LIMIT (scraper.py:135-137,
    SURVEY §4.1). `min_date`/`max_date` are passed to the source
    (predicate pushdown P4) — the fixture transport ignores them the way
    a dumb portal would, and the engine re-applies the predicate
    post-fetch (filters are never *only* pushed down).

    Order is reified as (page_no, pos) — Spark preserves no incidental
    order (O3, SURVEY §7.4)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for muni, committee, start_url in zip(
                pdf["municipality"], pdf["committee"], pdf["start_url"]
            ):
                harvested = 0
                for page_no in range(max_pages):
                    st, page = transport(
                        start_url,
                        {
                            "kind": "listing",
                            "page_no": page_no,
                            "min_date": min_date,
                            "max_date": max_date,
                        },
                    )
                    if st >= 400 or not page:
                        break
                    for pos, (url, raw_date, raw_type) in enumerate(page):
                        rows.append(
                            (muni, committee, start_url, page_no, pos, url, raw_date, raw_type)
                        )
                        harvested += 1
                        if per_source_limit and harvested >= per_source_limit:
                            break
                    if per_source_limit and harvested >= per_source_limit:
                        break
            yield pd.DataFrame(
                rows,
                columns=[
                    "municipality", "committee", "start_url", "page_no", "pos",
                    "url", "raw_date", "raw_type",
                ],
            )

    n = max(config.count(), 1)
    return (
        config.select("municipality", "committee", "start_url")
        .repartition(n)  # one source per task (C1/C2)
        .mapInPandas(batches, LISTING_SCHEMA)
    )


def fetch_blobs(
    worklist: DataFrame,
    transport: Transport,
    url_col: str = "url",
    retries: int = 2,
) -> DataFrame:
    """S12 — blob download with bounded retry (C4) and Try-struct error
    containment (C5): one bad URL never fails the stage. At 100 TB the
    UDF lands bytes straight to object storage and returns only
    (path, size) — here it returns the bytes for the test sink."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url in pdf[url_col]:
                last_exc: str | None = None
                ok = False
                st, blob = 599, None
                for _ in range(retries + 1):
                    try:
                        st, blob = transport(url, {"kind": "blob"})
                        if st < 400 and blob is not None:
                            ok = True
                            break
                        last_exc = f"status={st}"
                    except Exception as exc:  # noqa: BLE001
                        last_exc = str(exc)[:200]
                rows.append((url, ok, int(st), blob if ok else None, None if ok else last_exc))
            yield pd.DataFrame(
                rows, columns=["url", "ok", "status", "content", "error"]
            )

    return worklist.select(F.col(url_col)).mapInPandas(batches, BLOB_SCHEMA)
