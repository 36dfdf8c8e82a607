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
