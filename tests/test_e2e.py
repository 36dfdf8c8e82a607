"""End-to-end ELT integration (SURVEY §3.2 as one dataflow):

config → harvest (fixture transport, pushdown bounds) → PipelineSpec
compile (parse/filter/dedup/anti-join/limit) → blob fetch (Try-struct)
→ dead-letter split → idempotent partitioned landing → FULL RE-RUN
lands zero new rows (ST2). The whole reference pipeline, one test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.fixtures import municipalities_fixture
from kommunedata_data_pipeline_spark.plans.pipeline import PipelineSpec
from kommunedata_data_pipeline_spark.sources.fetch import (
    FixtureTransport,
    fetch_blobs,
    harvest_listings,
)
from kommunedata_data_pipeline_spark.sources.sinks import (
    load_catalog,
    upsert_partitioned,
    write_dead_letter,
)


def _transport(config_rows):
    pages = {}
    blobs = {}
    for i, r in enumerate(config_rows):
        urls = [
            (f"{r.base_url}/doc/{i}_{p}_{j}.pdf", f"0{j+1}-0{p+1}-202{4+i%2}", "Referat")
            for p in range(2)
            for j in range(3)
        ]
        pages[r.start_url] = [urls[:3], urls[3:]]
        for u, _, _ in urls:
            blobs[u] = b"%PDF-1.4 " + u.encode()
    # one url that 404s -> dead letter
    first = config_rows[0]
    pages[first.start_url][0].append(
        (f"{first.base_url}/doc/broken.pdf", "30-12-2027", "Referat")
    )
    return FixtureTransport(pages=pages, blobs=blobs)


def _run_once(spark, transport, catalog, out):
    config = municipalities_fixture(spark)
    listings = harvest_listings(config, transport)
    # no download_limit: the limit is a PER-RUN budget (a re-run fetches
    # the next not-yet-landed batch, reference DOWNLOAD_LIMIT semantics);
    # exactly-once is asserted on the exhaustive run
    spec = PipelineSpec(scrape_mode="ALL", download_limit=None)
    worklist = spec.compile(listings, catalog)
    fetched = fetch_blobs(worklist, transport)
    enriched = worklist.join(fetched, "url", "left")
    ok = enriched.where(F.col("ok")).select(
        "doc_key", "municipality", "committee", "url", "content"
    )
    bad = enriched.where(~F.col("ok")).select("doc_key", "url", "error")
    write_dead_letter(
        ok.limit(0).select("doc_key"), bad.select("doc_key", "url", "error"), out + "_dl"
    )
    return upsert_partitioned(ok, out, ["doc_key"])


def test_full_pipeline_lands_once(spark, tmp_path):
    out = str(tmp_path / "landed")
    config_rows = municipalities_fixture(spark).collect()
    transport = _transport(config_rows)
    empty_catalog = spark.createDataFrame([], "doc_key string")

    n1 = _run_once(spark, transport, empty_catalog, out)
    assert n1 > 0

    landed = spark.read.parquet(out)
    assert landed.count() == n1
    # blobs landed intact, partition layout by municipality/committee
    assert landed.where(F.col("content").isNull()).count() == 0
    parts = {(r.municipality, r.committee) for r in landed.select("municipality", "committee").distinct().collect()}
    assert len(parts) > 1

    # dead letter holds the broken url with its error
    dl = spark.read.parquet(out + "_dl_quarantine")
    assert dl.where(F.col("url").contains("broken")).count() == 1

    # FULL re-run against the landed catalog: zero new rows (ST2)
    catalog2 = load_catalog(spark, out, ["doc_key"])
    n2 = _run_once(spark, transport, catalog2, out)
    assert n2 == 0
    assert spark.read.parquet(out).count() == n1
