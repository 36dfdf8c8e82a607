"""String / URL expression library (SURVEY §2.8 F1-F5, F8, F10, F11).

All pure Catalyst expressions (whole-stage-codegen'd): the reference's
row-at-a-time Python string munging becomes columnar JVM-side work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

UUID_RE = r"id=([a-f0-9\-]{36})"  # scraper.py:161-165


def extract_uuid(url: Column) -> Column:
    """F1/P10 — meeting UUID out of a listing URL (scraper.py:161-165)."""
    return F.nullif(F.regexp_extract(url, UUID_RE, 1), F.lit(""))


def municipality_from_url(base_url: Column) -> Column:
    """F3/F5 — domain → municipality name munging, scraper.py:301-308:
    parse host, strip `dagsordener.`/`dagsorden.` prefixes, `.kommune`/.tld
    suffixes."""
    # regexp host extraction rather than parse_url: parse_url returns NULL
    # for RFC-invalid hosts (e.g. underscores), which real-world municipal
    # portals and the synthetic test names both contain.
    host = F.regexp_extract(base_url, r"^[a-zA-Z]+://([^/:?#]+)", 1)
    name = F.regexp_replace(host, r"^(www\.|dagsordener\.|dagsordner\.|dagsorden\.)", "")
    name = F.regexp_replace(name, r"\.(dk|kommune\.dk)$", "")
    name = F.regexp_replace(name, r"(kommune)$", "")
    return F.lower(name)


def sanitize_filename(col: Column) -> Column:
    """F2 — filesystem-unsafe chars → `_` (scraper_aalborg.py:174)."""
    return F.regexp_replace(col, r"[<>:\"/\\|?*]", "_")


def committee_bucket_suffix(committee: Column) -> Column:
    """F8 — committee → bucket-suffix literal map (scraper.py:188-196)."""
    return (
        F.when(F.lower(committee).contains("teknik"), "-teknikmiljoe")
        .when(F.lower(committee).contains("byraad"), "-byraad")
        .when(F.lower(committee).contains("plan"), "-plan")
        .otherwise("")
    )


def doc_key(meeting_date: Column, municipality: Column, committee: Column) -> Column:
    """F11 — canonical sink key ``YYYY-MM-DD_{muni}_{committee}.pdf``
    (scraper.py:168-178). NULL dates get the fallback sequence-name path
    upstream (W3), so this may assume a date or a pre-built fallback token."""
    return F.concat_ws(
        "_",
        F.date_format(meeting_date, "yyyy-MM-dd"),
        F.lower(municipality),
        F.lower(committee),
    )


def bucket_name(municipality: Column, committee: Column) -> Column:
    """Sink bucket ``raw-files-{muni}{-committee-suffix}`` (scraper.py:188-197)."""
    return F.concat(F.lit("raw-files-"), F.lower(municipality), committee_bucket_suffix(committee))


def md5_bigint(col: Column, offset: int = 0) -> Column:
    """Cross-engine stable 32-bit-ish hash: BIGINT from 8 hex chars of md5.

    Used (instead of Spark's murmur `hash()`) wherever a hash value must be
    reproducible in the DuckDB oracle: MinHash signatures, LSH band keys,
    fingerprints. DuckDB equivalent:
    ``('0x' || substr(md5(x), off+1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), offset + 1, 8), 16, 10).cast("bigint")


def luhn_checksum(digits: Column) -> Column:
    """Luhn mod-10 checksum of a digit string (ISO/IEC 7812 — the
    check standard behind credit-card / IMEI / national-id numbers):
    from the RIGHTMOST digit, double every second digit, subtract 9
    from any doubled value above 9, sum everything; a valid identifier
    sums to 0 mod 10. Pure integer expression over the reversed char
    sequence (aggregate over sequence — no UDF), exact in both
    engines. DuckDB twin:
    ``list_sum(list_transform(range(1, length(s)+1), i -> CASE WHEN
    i % 2 = 0 THEN CASE WHEN substr(reverse(s),i,1)::INT * 2 > 9 THEN
    substr(reverse(s),i,1)::INT * 2 - 9 ELSE
    substr(reverse(s),i,1)::INT * 2 END ELSE
    substr(reverse(s),i,1)::INT END)) % 10``."""
    rev = F.reverse(digits)
    # guard the empty string: sequence(1, 0) would auto-step DOWN (the
    # same descending-sequence trap the r7 advice flagged on the
    # sorted-neighborhood probe) — no digits means no checksum (NULL)
    return F.when(F.length(digits) > 0, (
        F.aggregate(
            F.sequence(F.lit(1), F.length(digits)),
            F.lit(0),
            lambda acc, i: acc
            + F.when(
                i % 2 == 0,
                F.when(
                    rev.substr(i, F.lit(1)).cast("int") * 2 > 9,
                    rev.substr(i, F.lit(1)).cast("int") * 2 - 9,
                ).otherwise(rev.substr(i, F.lit(1)).cast("int") * 2),
            ).otherwise(rev.substr(i, F.lit(1)).cast("int")),
        )
        % 10
    ))


def cpr_mod11_valid(digits: Column) -> Column:
    """Danish CPR modulus-11 check (the reference's home-domain PII
    validator, next to `luhn_checksum`'s mod-10): a 10-digit CPR is
    valid iff Σ digit_i · w_i ≡ 0 (mod 11) with the official weights
    (4,3,2,7,6,5,4,3,2,1). Pure integer expression over substring
    digits — no UDF; NULL for non-10-digit inputs.
    DuckDB twin: list_sum over the same weights, % 11 = 0."""
    weights = [4, 3, 2, 7, 6, 5, 4, 3, 2, 1]
    warr = F.array(*[F.lit(w) for w in weights])
    total = F.aggregate(
        F.sequence(F.lit(1), F.lit(10)),
        F.lit(0),
        lambda acc, i: acc
        + F.substring(digits, i, F.lit(1)).cast("int")
        * F.element_at(warr, i),
    )
    return F.when(
        digits.rlike("^[0-9]{10}$"), (total % 11 == 0).cast("int")
    )
