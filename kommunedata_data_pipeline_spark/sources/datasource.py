"""Custom Python DataSource for meeting listings (SURVEY §4.2's "custom
extension" candidate, realized with Spark 4's Python DataSource API).

The reference selects WHOLE sources before fetching anything
(COMMITTEE_SOURCE / MUNICIPALITY_FILTER, scraper.py:316-326,346-351 —
§4.1 "partition pruning"). Here that is literal source-level pruning:

- one InputPartition per portal (the reference's process-per-scraper
  C1 fan-out becomes Spark's task-per-partition);
- `pushFilters` accepts equality predicates on municipality/committee
  and DROPS the non-matching portals before any read happens — the
  filter never ships to an executor, the portal is never opened.

The "portal" is a directory of JSON files (one per municipality ×
committee) so tests exercise the full declarative path with zero
network: `spark.read.format(...).option("path", dir)`. A production
transport would fetch in `read()` with the same partition/pushdown
shape.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

LISTING_DDL = (
    "municipality string, committee string, page_no int, pos int, "
    "url string, raw_date string, raw_type string"
)


class PortalPartition(InputPartition):
    def __init__(self, path: str, municipality: str, committee: str):
        self.path = path
        self.municipality = municipality
        self.committee = committee


class ListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.eq: dict[str, str] = {}

    def pushFilters(self, filters: Sequence[Filter]) -> Iterator[Filter]:
        """Accept equality filters on the partition columns; everything
        else stays with Spark (filters are pruned, never dropped)."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute in (
                ("municipality",),
                ("committee",),
            ):
                self.eq[f.attribute[0]] = f.value
            else:
                yield f

    def partitions(self) -> Sequence[PortalPartition]:
        parts = []
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".json"):
                continue
            muni, committee = fname[:-5].split("__", 1)
            if self.eq.get("municipality", muni) != muni:
                continue  # source-level pruning: portal never opened
            if self.eq.get("committee", committee) != committee:
                continue
            parts.append(
                PortalPartition(os.path.join(self.path, fname), muni, committee)
            )
        return parts

    def read(self, partition: PortalPartition) -> Iterator[tuple]:
        with open(partition.path) as fh:
            pages = json.load(fh)
        for page_no, page in enumerate(pages):
            for pos, row in enumerate(page):
                yield (
                    partition.municipality,
                    partition.committee,
                    page_no,
                    pos,
                    row["url"],
                    row.get("raw_date"),
                    row.get("raw_type"),
                )


class ListingStreamReader(SimpleDataSourceStreamReader):
    """Incremental portal polling as a Structured Streaming source
    (ST4's periodic re-scan turned into a real stream): the offset is
    {portal filename → pages already emitted}, so each micro-batch
    emits only NEW pages/portals — the reference's SCRAPE_MODE=NEW
    without re-reading anything already seen. `readBetweenOffsets`
    replays a committed range deterministically for recovery
    (exactly-once on top of the checkpoint log)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"pages": {}}

    def _load(self, fname: str):
        with open(os.path.join(self.path, fname)) as fh:
            return json.load(fh)

    def _rows(self, fname: str, first_page: int, last_page: int):
        muni, committee = fname[:-5].split("__", 1)
        pages = self._load(fname)
        for page_no in range(first_page, min(last_page, len(pages))):
            for pos, row in enumerate(pages[page_no]):
                yield (
                    muni, committee, page_no, pos,
                    row["url"], row.get("raw_date"), row.get("raw_type"),
                )

    def read(self, start: dict):
        seen = dict(start.get("pages", {}))
        end = {"pages": dict(seen)}
        rows = []
        for fname in sorted(os.listdir(self.path)):
            if not fname.endswith(".json"):
                continue
            n = len(self._load(fname))
            done = seen.get(fname, 0)
            if n > done:
                rows.extend(self._rows(fname, done, n))
                end["pages"][fname] = n
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        s, e = start.get("pages", {}), end.get("pages", {})
        rows = []
        for fname, n in sorted(e.items()):
            done = s.get(fname, 0)
            if n > done:
                rows.extend(self._rows(fname, done, n))
        return iter(rows)


class ListingDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kommunedata_listings"

    def schema(self) -> str:
        return LISTING_DDL

    def reader(self, schema) -> ListingReader:
        return ListingReader(self.options)

    def simpleStreamReader(self, schema) -> ListingStreamReader:
        return ListingStreamReader(self.options)


def register(spark) -> None:
    # runtime-settable in Spark 4.1; required for pushFilters to be called
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ListingDataSource)
