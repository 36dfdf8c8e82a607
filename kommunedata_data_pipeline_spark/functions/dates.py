"""Date expression library (SURVEY §2.8 F6/F7).

The reference parses meeting dates from FOUR distinct formats:
- ``dd-mm-yyyy``           scraper.py:168-176
- ``yyyy-mm-dd``           scraper_aalborg.py:161-167, scraper_billund.py:105-126
- ``dd.mm.yyyy``           scraper_copenhagen.py:74-78
- Danish month names, e.g. ``"25. november 2025"``
                           scraper_svendborg.py:138-152,
                           scraper_middelfart.py:130-146,
                           scraper_ringkoebing_skjern.py:107-121

``to_date`` has no Danish-locale guarantee across Spark builds
(SURVEY §7.4), so the Danish path is composed from regexp_extract + a
literal month map + make_date — pure Catalyst expressions, fully
codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scraper_svendborg.py:140-146 builds exactly this mapping
DANISH_MONTHS: dict[str, int] = {
    "januar": 1,
    "februar": 2,
    "marts": 3,
    "april": 4,
    "maj": 5,
    "juni": 6,
    "juli": 7,
    "august": 8,
    "september": 9,
    "oktober": 10,
    "november": 11,
    "december": 12,
}


def danish_month_number(month_name: Column) -> Column:
    """Literal CASE map danish-month-name → int (constant-folded by Catalyst)."""
    out = F.lit(None).cast("int")
    result = None
    for name, num in DANISH_MONTHS.items():
        cond = F.lower(month_name) == name
        result = F.when(cond, num) if result is None else result.when(cond, num)
    return result.otherwise(out)


def parse_danish_date(col: Column) -> Column:
    """``'25. november 2025'`` (optionally with trailing ``- 15:30``) → DATE.

    Mirrors scraper_svendborg.py:138-152 semantics (day '.' month-name year)
    as a single expression tree.
    """
    day = F.regexp_extract(col, r"(\d{1,2})\.\s*[a-zA-ZæøåÆØÅ]+\s+\d{4}", 1)
    mon = F.regexp_extract(col, r"\d{1,2}\.\s*([a-zA-ZæøåÆØÅ]+)\s+\d{4}", 1)
    year = F.regexp_extract(col, r"\d{1,2}\.\s*[a-zA-ZæøåÆØÅ]+\s+(\d{4})", 1)
    ok = (day != "") & (year != "") & danish_month_number(mon).isNotNull()
    return F.when(
        ok,
        F.make_date(year.cast("int"), danish_month_number(mon), day.cast("int")),
    )


def parse_meeting_date(col: Column) -> Column:
    """All four reference formats via coalesce of format-specific attempts —
    the retry/fallback-chain pattern (SURVEY §2.12 C4) as one expression.

    Null-in → null-out (ST5: unparseable dates survive as NULL and take the
    fallback-filename path, scraper.py:181)."""
    s = F.trim(col)
    iso = F.when(
        s.rlike(r"^\d{4}-\d{2}-\d{2}"), F.to_date(F.substring(s, 1, 10), "yyyy-MM-dd")
    )
    dmy_dash = F.when(
        s.rlike(r"^\d{2}-\d{2}-\d{4}"), F.to_date(F.substring(s, 1, 10), "dd-MM-yyyy")
    )
    dmy_dot = F.when(
        s.rlike(r"^\d{2}\.\d{2}\.\d{4}"),
        F.to_date(F.substring(s, 1, 10), "dd.MM.yyyy"),
    )
    return F.coalesce(iso, dmy_dash, dmy_dot, parse_danish_date(s))


def should_scrape(meeting_date: Column, mode: str = "ALL") -> Column:
    """P1 — incremental-mode predicate, reference scraper_utils.py:72-87:
    ``ALL`` → keep everything; ``NEW`` → today-or-future only. NULL dates
    pass (ST5 short-circuit at scraper.py:181)."""
    if mode.upper() != "NEW":
        return F.lit(True)
    return meeting_date.isNull() | (meeting_date >= F.current_date())
