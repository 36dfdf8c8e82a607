"""Canonical schemas (SURVEY.md §1.3) + star-schema test tables (TESTDATA.md).

The reference keeps dynamic per-scraper dict schemas (e.g. the same record
uses key ``date_str`` in scraper_glostrup.py:197 but ``date`` in
scraper_copenhagen.py:89); the engine promotes everything to fixed
StructTypes so Catalyst can prune/push down.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- canonical pipeline tables (SURVEY §1.3) -------------------------------

# mirrors found_start_urls*.csv (header `Base URL,Start URL`,
# scraper.py:278-298) + derived columns (scraper.py:301-308, 35-40)
MUNICIPALITIES = T.StructType(
    [
        T.StructField("base_url", T.StringType(), False),
        T.StructField("start_url", T.StringType(), False),
        T.StructField("municipality", T.StringType(), True),
        T.StructField("committee", T.StringType(), True),
    ]
)

# the central fact: one meeting row (dict shapes at scraper_glostrup.py:196-200,
# scraper_copenhagen.py:86-91, tuple form scraper_roedovre.py:135)
MEETINGS = T.StructType(
    [
        T.StructField("municipality", T.StringType(), False),
        T.StructField("committee", T.StringType(), False),
        T.StructField("meeting_date", T.DateType(), True),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("source_system", T.StringType(), True),
    ]
)

# raw harvest rows before typing (FIXTURES.md B2): order reified as
# (page_no, pos) because Spark does not preserve incidental list order
# (SURVEY §2.6 O3).
LISTINGS_RAW = T.StructType(
    [
        T.StructField("source_system", T.StringType(), True),
        T.StructField("municipality", T.StringType(), False),
        T.StructField("committee", T.StringType(), False),
        T.StructField("page_no", T.IntegerType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("url", T.StringType(), False),
        T.StructField("raw_date", T.StringType(), True),
        T.StructField("raw_type", T.StringType(), True),
        T.StructField("extra", T.StringType(), True),
    ]
)

# landed-document state — the anti-join right side (scraper.py:210-222;
# key format `YYYY-MM-DD_{muni}_{committee}.pdf` scraper.py:172)
CATALOG = T.StructType(
    [
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("bucket", T.StringType(), True),
        T.StructField("landed_at", T.TimestampType(), True),
    ]
)

# parent-child: agenda items nested under a meeting
# (scraper_copenhagen.py:147-151, scraper_ringkoebing_skjern.py:146-183)
AGENDA_ITEMS = T.StructType(
    [
        T.StructField("meeting_key", T.StringType(), False),
        T.StructField("item_no", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("content_html", T.StringType(), True),
    ]
)

# document blobs (scraper.py:228-258; sample raw_files_glostrup/*.docx)
DOCUMENT_BLOBS = T.StructType(
    [
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("provenance_url", T.StringType(), True),
    ]
)

# --- star-schema test tables (TESTDATA.md / FIXTURES.md A) -----------------

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
