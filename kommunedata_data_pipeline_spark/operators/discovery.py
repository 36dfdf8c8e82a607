"""Committee-page discovery — the reference's 3-strategy start-URL hunt
(get_start_url.py:79-127) as a coalesce-of-extractors Catalyst expression.

The reference drives a browser and probes the live DOM; the engine's
equivalent consumes the *fetched page* (an html column from the fetch
layer) and extracts the committee start URL with pure codegen'd regexp
expressions — no UDF, no shuffle, trivially parallel over millions of
pages:

  strategy 1 ("data-value deep search", get_start_url.py:80-105):
      an element whose text mentions the committee and that carries a
      ``data-value`` attribute (itself or its parent) → build
      ``{base}/?request.kriterie.udvalgId={value}``;
  strategy 2 ("committee href", get_start_url.py:107-110):
      a keyword-bearing anchor whose href already contains
      ``udvalgId``/``committeeId`` → resolve against the base URL;
  strategy 3 ("direct link fallback", get_start_url.py:117-127):
      a keyword-bearing anchor whose href looks like a committee page
      (``/udvalg/`` or ``id=``) → resolve against the base URL.

Priority is reified exactly as the reference's control flow: strategies
dominate, keyword order breaks ties within a strategy, and the first hit
wins via ``coalesce``. Approximation note: the reference walks DOM
elements in document order within a strategy; the regexp form takes the
first match per (strategy, keyword) pattern — identical whenever a page
has one committee widget, which is the shape these portals have.

Patterns are RE2-compatible (no lookaround) so the DuckDB oracle can run
the same extraction verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the reference's keyword ladder, get_start_url.py:77
KEYWORDS = ("Økonomiudvalg", "Økonomiudvalget", "Økonomi", "ØU")

# data-value on the keyword element or its parent: attr, then '>', then
# AT MOST one nested open tag (the reference checks self or immediate
# parent only — a closing tag must NOT be crossable, or a far-away
# keyword would be attributed to an earlier element's data-value)
_P_DATA_VALUE = r'data-value="([^"]*)"[^>]*>\s*(?:<[^/][^>]*>\s*)?[^<]*{kw}'
# keyword anchor whose href already names the committee id
_P_COMMITTEE_HREF = r'<a[^>]*href="([^"]*(?:udvalgId|committeeId)[^"]*)"[^>]*>[^<]*{kw}'
# fallback: keyword anchor whose href merely looks committee-shaped
_P_DIRECT_LINK = r'<a[^>]*href="([^"]*(?:/udvalg/|id=)[^"]*)"[^>]*>[^<]*{kw}'


def _extract(html: Column, pattern: str) -> Column:
    # regexp_extract yields '' on no match in Spark; normalize to NULL so
    # coalesce falls through (the oracle wraps NULLIF identically)
    return F.nullif(F.regexp_extract(html, pattern, 1), F.lit(""))


def _resolve(base: Column, href: Column) -> Column:
    """urljoin for the two shapes portals emit: absolute http(s) hrefs
    pass through; path hrefs attach to the base (reference urljoin call,
    get_start_url.py:104,125)."""
    return F.when(href.startswith("http"), href).otherwise(
        F.concat(
            F.regexp_replace(base, "/+$", ""),
            F.lit("/"),
            F.regexp_replace(href, "^/+", ""),
        )
    )


def committee_hunt(
    pages: DataFrame,
    base_url_col: str = "base_url",
    html_col: str = "html",
    keywords: tuple[str, ...] = KEYWORDS,
) -> DataFrame:
    """Append ``start_url`` (first strategy hit, NULL when the hunt comes
    up empty — the reference returns None, get_start_url.py:130) and
    ``strategy`` (which rung matched: 'data-value' | 'committee-href' |
    'direct-link') to ``pages``."""
    base, html = F.col(base_url_col), F.col(html_col)

    dv = F.coalesce(
        *[_extract(html, _P_DATA_VALUE.format(kw=kw)) for kw in keywords]
    )
    ch = F.coalesce(
        *[_extract(html, _P_COMMITTEE_HREF.format(kw=kw)) for kw in keywords]
    )
    dl = F.coalesce(
        *[_extract(html, _P_DIRECT_LINK.format(kw=kw)) for kw in keywords]
    )

    start_url = F.coalesce(
        F.when(
            dv.isNotNull(),
            F.concat(
                F.regexp_replace(base, "/+$", ""),
                F.lit("/?request.kriterie.udvalgId="),
                dv,
            ),
        ),
        _resolve(base, ch),
        _resolve(base, dl),
    )
    strategy = F.when(dv.isNotNull(), F.lit("data-value")).otherwise(
        F.when(ch.isNotNull(), F.lit("committee-href")).otherwise(
            F.when(dl.isNotNull(), F.lit("direct-link"))
        )
    )
    return pages.withColumn("start_url", start_url).withColumn("strategy", strategy)
