"""Fetch-layer tests on the fixture transport (SURVEY §7.3 M5): probe
retry chain (C4), candidate generation (S4), pagination + early stop
(S5-S11/W1), blob Try-struct (C5)."""

from kommunedata_data_pipeline_spark.sources.fetch import (
    FixtureTransport,
    candidate_urls,
    fetch_blobs,
    harvest_listings,
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


def test_fetch_blobs_try_struct(spark):
    t = FixtureTransport(blobs={"https://s/ok.pdf": b"%PDF-ok"})
    wl = spark.createDataFrame(
        [("https://s/ok.pdf",), ("https://s/missing.pdf",)], "url string"
    )
    got = {r.url: r for r in fetch_blobs(wl, t).collect()}
    assert got["https://s/ok.pdf"].ok and bytes(got["https://s/ok.pdf"].content) == b"%PDF-ok"
    assert not got["https://s/missing.pdf"].ok
    assert got["https://s/missing.pdf"].error  # contained, not raised
