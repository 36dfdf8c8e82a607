"""Python DataSource: declarative listing source with source-level
partition pruning (SURVEY §4.1/§4.2)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from kommunedata_data_pipeline_spark.sources.datasource import (
    ListingReader,
    register,
)


def _portal_dir(tmp_path):
    portals = {
        "aarhus__oek": [[{"url": "a1", "raw_date": "01-02-2025", "raw_type": "Referat"}],
                        [{"url": "a2", "raw_date": "02-02-2025", "raw_type": "Referat"}]],
        "aarhus__plan": [[{"url": "p1", "raw_date": "03-02-2025", "raw_type": "Dagsorden"}]],
        "odense__oek": [[{"url": "o1", "raw_date": "04-02-2025", "raw_type": "Referat"}]],
    }
    for name, pages in portals.items():
        (tmp_path / f"{name}.json").write_text(json.dumps(pages))
    return str(tmp_path)


def test_read_all_portals(spark, tmp_path):
    register(spark)
    df = spark.read.format("kommunedata_listings").option("path", _portal_dir(tmp_path)).load()
    rows = df.collect()
    assert len(rows) == 4
    # order reified as (page_no, pos)
    a = {(r.url): (r.page_no, r.pos) for r in rows}
    assert a["a1"] == (0, 0) and a["a2"] == (1, 0)


def test_equality_filter_prunes_portals_before_read(spark, tmp_path):
    # unit-level: the reader drops partitions for pushed equality filters
    r = ListingReader({"path": _portal_dir(tmp_path)})
    leftover = list(r.pushFilters([EqualTo(("municipality",), "aarhus"),
                                   GreaterThan(("page_no",), 0)]))
    # non-equality filter stays with Spark
    assert leftover == [GreaterThan(("page_no",), 0)]
    parts = r.partitions()
    assert {p.municipality for p in parts} == {"aarhus"}
    assert len(parts) == 2


def test_end_to_end_filtered_read(spark, tmp_path):
    register(spark)
    df = (
        spark.read.format("kommunedata_listings")
        .option("path", _portal_dir(tmp_path))
        .load()
        .where((F.col("municipality") == "odense") & (F.col("committee") == "oek"))
    )
    assert [r.url for r in df.collect()] == ["o1"]


def test_streaming_source_emits_only_new_pages(spark, tmp_path):
    """ST4/ST1 as a real stream: batch 1 emits the existing portal, a new
    page + a new portal appear, batch 2 emits ONLY the delta."""
    import json as _json

    register(spark)
    (tmp_path / "aarhus__oek.json").write_text(_json.dumps(
        [[{"url": "a1", "raw_date": "01-02-2025", "raw_type": "Referat"}]]
    ))
    stream = (
        spark.readStream.format("kommunedata_listings")
        .option("path", str(tmp_path))
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("listing_stream")
        .option("checkpointLocation", str(tmp_path / "_chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {r.url for r in spark.sql("SELECT * FROM listing_stream").collect()}
        assert got1 == {"a1"}

        # page appended to the existing portal + a brand-new portal
        (tmp_path / "aarhus__oek.json").write_text(_json.dumps(
            [[{"url": "a1", "raw_date": "01-02-2025", "raw_type": "Referat"}],
             [{"url": "a2", "raw_date": "02-02-2025", "raw_type": "Referat"}]]
        ))
        (tmp_path / "odense__plan.json").write_text(_json.dumps(
            [[{"url": "o1", "raw_date": "03-02-2025", "raw_type": "Dagsorden"}]]
        ))
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM listing_stream").collect()
        assert {r.url for r in rows} == {"a1", "a2", "o1"}
        assert len(rows) == 3  # a1 NOT re-emitted
    finally:
        q.stop()
