"""Python UDTFs (SURVEY §2.11 "UDTF-ish" surface).

The reference's per-scraper row extraction emits a VARIABLE number of
records per input (one meeting row per harvested link,
scraper_glostrup.py:164-227). Grouped-map applyInPandas covers the
per-key case; the table-function shape — one input row → N output rows
with no grouping — is a Python UDTF, usable from SQL via LATERAL."""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, url string, raw_date string")
class ExtractMeetingLinks:
    """Parse an embedded listing payload ('url|date;url|date;...') into
    one row per link, order reified as `pos` (O3). The fetch layer's
    mapInPandas does this at scale; the UDTF form exposes the same
    extraction to SQL (`LATERAL extract_meeting_links(payload)`)."""

    def eval(self, payload: str):  # noqa: D102
        if not payload:
            return
        for pos, part in enumerate(p for p in payload.split(";") if p.strip()):
            m = re.match(r"\s*([^|]+)\|(.+)$", part)
            if m:
                yield pos, m.group(1).strip(), m.group(2).strip()


def register_udtfs(spark) -> None:
    spark.udtf.register("extract_meeting_links", ExtractMeetingLinks)
