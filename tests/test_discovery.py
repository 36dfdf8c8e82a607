"""Committee-page hunt (get_start_url.py:79-127) — all three fallback
strategies, priority order, parent-data-value nesting, and the miss case."""

from kommunedata_data_pipeline_spark.operators.discovery import committee_hunt


def _hunt(spark, html, base="https://dagsordener.aarhus.dk"):
    df = spark.createDataFrame([(base, html)], "base_url string, html string")
    return committee_hunt(df).select("start_url", "strategy").first()


def test_strategy1_data_value_on_element(spark):
    r = _hunt(spark, '<div><span data-value="77">Økonomiudvalget</span></div>')
    assert r.start_url == "https://dagsordener.aarhus.dk/?request.kriterie.udvalgId=77"
    assert r.strategy == "data-value"


def test_strategy1_data_value_on_parent(spark):
    # text sits in a child span; data-value on the parent li (the
    # reference's "check parent hierarchy" branch)
    r = _hunt(spark, '<li data-value="42"><span>Økonomiudvalget</span></li>')
    assert r.start_url == "https://dagsordener.aarhus.dk/?request.kriterie.udvalgId=42"
    assert r.strategy == "data-value"


def test_strategy2_committee_href(spark):
    r = _hunt(spark, '<a href="/meetings?committeeId=9">Økonomi</a>')
    assert r.start_url == "https://dagsordener.aarhus.dk/meetings?committeeId=9"
    assert r.strategy == "committee-href"


def test_strategy2_absolute_href_passes_through(spark):
    r = _hunt(spark, '<a href="https://other.dk/x?udvalgId=3">ØU</a>')
    assert r.start_url == "https://other.dk/x?udvalgId=3"
    assert r.strategy == "committee-href"


def test_strategy3_direct_link_fallback(spark):
    r = _hunt(spark, '<ul><a href="/udvalg/12/moeder">ØU</a></ul>')
    assert r.start_url == "https://dagsordener.aarhus.dk/udvalg/12/moeder"
    assert r.strategy == "direct-link"


def test_strategy_priority_data_value_wins(spark):
    html = (
        '<a href="/udvalg/99/x">ØU</a>'
        '<span data-value="5">Økonomi</span>'
    )
    r = _hunt(spark, html)
    assert r.strategy == "data-value"
    assert r.start_url.endswith("udvalgId=5")


def test_hunt_miss_is_null(spark):
    r = _hunt(spark, "<div>Teknik og Miljøudvalget</div>")
    assert r.start_url is None and r.strategy is None


def test_keyword_order_breaks_ties(spark):
    # two data-value widgets; the Økonomiudvalg one outranks the bare-Ø one
    html = (
        '<span data-value="1">ØU</span>'
        '<span data-value="2">Økonomiudvalget</span>'
    )
    r = _hunt(spark, html)
    assert r.start_url.endswith("udvalgId=2")


def test_discover_start_urls_end_to_end(spark):
    """Full discovery plan on fixtures: candidate priority order decides
    the base URL, the hunt ladder finds the start URL, unresolvable
    stems survive as NULL rows."""
    from kommunedata_data_pipeline_spark.plans.discovery import discover_start_urls
    from kommunedata_data_pipeline_spark.sources.fetch import FixtureTransport

    # aarhus: first candidate (dagsordener.aarhus.dk) 404s, second works
    # and serves a data-value page; odense: first candidate works, page
    # only has a direct link; nowhere: no candidate probes OK.
    t = FixtureTransport(
        status={
            "https://dagsordener.aarhus.dk": 404,
            "https://dagsordener.aarhus.kommune.dk": 200,
            "https://dagsordener.odense.dk": 200,
        },
        blobs={
            "https://dagsordener.aarhus.kommune.dk": (
                b'<span data-value="77">\xc3\x98konomiudvalget</span>'
            ),
            "https://dagsordener.odense.dk": (
                b'<a href="/udvalg/5/moeder">\xc3\x98U</a>'
            ),
        },
    )
    stems = spark.createDataFrame([("aarhus",), ("odense",), ("nowhere",)], "stem string")
    got = {r.stem: r for r in discover_start_urls(stems, t).collect()}
    assert got["aarhus"].base_url == "https://dagsordener.aarhus.kommune.dk"
    assert got["aarhus"].start_url == (
        "https://dagsordener.aarhus.kommune.dk/?request.kriterie.udvalgId=77"
    )
    assert got["aarhus"].strategy == "data-value"
    assert got["odense"].start_url == "https://dagsordener.odense.dk/udvalg/5/moeder"
    assert got["odense"].strategy == "direct-link"
    assert got["nowhere"].base_url is None and got["nowhere"].start_url is None
