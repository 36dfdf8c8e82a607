"""Property tests for the pipeline semantics (SURVEY §5 item 4):
dedup idempotence, anti-join re-run ⇒ 0 new rows (ST2), limit-after-
filter ordering (W2), first-seen-wins order (O3)."""

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.fixtures import (
    catalog_fixture,
    listings_fixture,
    municipalities_fixture,
)
from kommunedata_data_pipeline_spark.operators.joins import anti_join_catalog
from kommunedata_data_pipeline_spark.operators.relational import (
    dedup_keep_first,
    filter_doc_type,
    per_group_limit,
)
from kommunedata_data_pipeline_spark.plans.pipeline import PipelineSpec


def test_dedup_idempotent(spark):
    df = listings_fixture(spark)
    once = dedup_keep_first(df, ["url"], [F.col("page_no"), F.col("pos")])
    twice = dedup_keep_first(once, ["url"], [F.col("page_no"), F.col("pos")])
    assert once.count() == twice.count()
    assert once.exceptAll(twice).count() == 0


def test_dedup_first_seen_wins(spark):
    df = listings_fixture(spark)
    got = dedup_keep_first(df, ["url"], [F.col("page_no"), F.col("pos")])
    # every kept row must be the minimum (page_no, pos) for its url
    mins = df.groupBy("url").agg(
        F.min(F.struct("page_no", "pos")).alias("first_seen")
    )
    joined = got.join(mins, "url")
    bad = joined.where(
        (F.col("page_no") != F.col("first_seen.page_no"))
        | (F.col("pos") != F.col("first_seen.pos"))
    )
    assert bad.count() == 0


def test_pipeline_rerun_yields_zero_new_rows(spark):
    """ST2 — running the pipeline, landing its output, and re-running
    against catalog ∪ output must produce 0 rows."""
    listings = listings_fixture(spark)
    catalog = catalog_fixture(spark)
    spec = PipelineSpec(scrape_mode="ALL", download_limit=None)
    first = spec.compile(listings, catalog)
    assert first.count() > 0
    new_catalog = catalog.select("doc_key").union(first.select("doc_key")).distinct()
    second = spec.compile(listings, new_catalog)
    assert second.count() == 0


def test_limit_counts_post_filter_rows(spark):
    """W2 — the limit applies AFTER the doc-type filter: with limit=2 we
    get ≤2 referats per municipality, never 2-minus-filtered."""
    listings = listings_fixture(spark)
    filtered = filter_doc_type(listings.withColumn("doc_type", F.col("raw_type")))
    limited = per_group_limit(
        filtered, ["municipality"], [F.col("page_no"), F.col("pos")], 2
    )
    per_muni = {r.municipality: r.n for r in limited.groupBy("municipality").agg(F.count("*").alias("n")).collect()}
    assert per_muni and all(n == 2 for n in per_muni.values())
    # every surviving row is a referat (filter ran before the limit)
    assert limited.where(~F.lower("doc_type").contains("referat")).count() == 0


def test_anti_join_excludes_landed(spark):
    listings = listings_fixture(spark).withColumn(
        "doc_key", F.lit("2025-08-18_aabenraa_oekonomi.pdf")
    )
    catalog = catalog_fixture(spark)
    fresh = anti_join_catalog(listings, catalog.select("doc_key"), ["doc_key"])
    assert fresh.count() == 0


def test_fanout_config_shape(spark):
    m = municipalities_fixture(spark)
    assert m.count() == 12  # 6 munis × 2 committees
    assert m.select("base_url").distinct().count() == 6
