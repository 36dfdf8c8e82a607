"""Deterministic domain fixtures mirroring the reference's data model
(FIXTURES.md §B, SURVEY §1). No RNG — content is enumerated so every
test run and engine sees identical rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from .schemas import AGENDA_ITEMS, CATALOG, LISTINGS_RAW, MUNICIPALITIES

_MUNIS = [
    ("https://dagsordener.aabenraa.dk", "aabenraa"),
    ("https://dagsorden.glostrup.dk", "glostrup"),
    ("https://www.svendborg.kommune.dk", "svendborg"),
    ("https://dagsordner.billund.dk", "billund"),
    ("https://dagsordener.aalborgkommune.dk", "aalborg"),
    ("https://middelfart.kommune.dk", "middelfart"),
]
_COMMITTEES = ["Oekonomi", "Teknik"]


def municipalities_fixture(spark: SparkSession) -> DataFrame:
    """B1 — config table; includes each URL-munging rule and one base_url
    duplicated across committees (scraper.py:35-40, 301-308)."""
    rows = []
    for base, name in _MUNIS:
        for committee in _COMMITTEES:
            rows.append(
                (base, f"{base}/vis?request.kriterie.udvalgId=00000000-0000-0000-0000-0000000000{len(rows):02d}", name, committee)
            )
    return spark.createDataFrame(rows, MUNICIPALITIES)


# all four date formats (F6) + garbage/NULL (ST5)
_RAW_DATES = [
    "18-08-2025",
    "2025-11-04",
    "11.03.2024",
    "25. november 2025 - 15:30",
    "1. maj 2024",
    "07-01-2026",
    "garbage",
    None,
]


def listings_fixture(spark: SparkSession) -> DataFrame:
    """B2 — raw harvest rows: 4 source systems, dup urls across pages
    (D1), mixed-case types (P2), all 4 date formats + garbage (F6/ST5),
    extractables in `extra` (F1)."""
    rows = []
    systems = ["firstagenda", "meetingsplus", "kk", "rksk"]
    i = 0
    for base, name in _MUNIS[:4]:
        system = systems[i % 4]
        for page in range(3):
            for pos in range(5):
                n = i % len(_RAW_DATES)
                url = f"{base}/vis?Referat-id=aaaaaaaa-bbbb-cccc-dddd-{i % 10:012d}"
                rows.append(
                    (
                        system,
                        name,
                        "Oekonomi",
                        page,
                        pos,
                        url,  # i%10 keys → duplicates across pages
                        _RAW_DATES[n],
                        ["Referat", "referat", "Dagsorden", "REFERAT", "Tillægsreferat"][i % 5],
                        f"id=aaaaaaaa-bbbb-cccc-dddd-{i % 10:012d}&pdfnavn=2024-04-08 10.30.pdf",
                    )
                )
                i += 1
    return spark.createDataFrame(rows, LISTINGS_RAW)


def catalog_fixture(spark: SparkSession) -> DataFrame:
    """B3 — landed-doc state overlapping ~50% with listings-derived keys
    so the J2 anti-join is non-trivial."""
    rows = [
        ("2025-08-18_aabenraa_oekonomi.pdf", "raw-files-aabenraa", dt.datetime(2025, 8, 19)),
        ("2025-11-04_glostrup_oekonomi.pdf", "raw-files-glostrup", dt.datetime(2025, 11, 5)),
        ("2024-03-11_svendborg_oekonomi.pdf", "raw-files-svendborg", dt.datetime(2024, 3, 12)),
        ("2099-01-01_nowhere_oekonomi.pdf", "raw-files-nowhere", dt.datetime(2099, 1, 2)),
    ]
    return spark.createDataFrame(rows, CATALOG)


def agenda_items_fixture(spark: SparkSession) -> DataFrame:
    """B4 — parent-child items, deliberately out of order (forces
    sort_array), with excluded link texts (P7)."""
    rows = [
        ("m1", 3, "Budget 2026", "https://x/3", "<div class='node__content'>tre</div><script>x</script>"),
        ("m1", 1, "Godkendelse af dagsorden", "https://x/hent-hele-referat", "<div class='node__content'>en</div>"),
        ("m1", 2, "Lokalplan", "https://x/2", "<div class='node__content'>to</div><style>s</style>"),
        ("m2", 1, "Punkt et", "https://y/1", "<div class='node__content'>alpha &amp; beta</div>"),
    ]
    return spark.createDataFrame(rows, AGENDA_ITEMS)
