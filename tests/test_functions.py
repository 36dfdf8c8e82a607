"""Unit/property tests for the expression library (dates F6, strings
F1-F5/F11, text) — SURVEY §5 strategy item 4."""

import datetime as dt

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.functions.dates import (
    parse_danish_date,
    parse_meeting_date,
    should_scrape,
)
from kommunedata_data_pipeline_spark.functions.strings import (
    bucket_name,
    doc_key,
    extract_uuid,
    municipality_from_url,
    sanitize_filename,
)
from kommunedata_data_pipeline_spark.functions.text import (
    fingerprint,
    lang_guess,
    token_count,
    word_shingles,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_parse_all_four_formats(spark):
    cases = {
        "18-08-2025": dt.date(2025, 8, 18),
        "2025-11-04": dt.date(2025, 11, 4),
        "11.03.2024": dt.date(2024, 3, 11),
        "25. november 2025 - 15:30": dt.date(2025, 11, 25),
        "1. maj 2024": dt.date(2024, 5, 1),
        "7. JANUAR 2023": dt.date(2023, 1, 7),
        "garbage": None,
        "": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "raw string")
    got = {
        r.raw: r.parsed
        for r in df.select("raw", parse_meeting_date(F.col("raw")).alias("parsed")).collect()
    }
    assert got == cases


def test_parse_null_in_null_out(spark):
    df = spark.createDataFrame([(None,)], "raw string")
    assert df.select(parse_meeting_date(F.col("raw")).alias("p")).collect()[0].p is None


def test_danish_date_rejects_unknown_month(spark):
    assert _one(spark, parse_danish_date(F.lit("25. blurg 2025"))) is None


def test_should_scrape_modes(spark):
    df = spark.createDataFrame(
        [(dt.date(1990, 1, 1),), (dt.date(2990, 1, 1),), (None,)], "d date"
    )
    all_rows = df.where(should_scrape(F.col("d"), "ALL")).count()
    new_rows = df.where(should_scrape(F.col("d"), "NEW")).count()
    assert all_rows == 3
    assert new_rows == 2  # future date + NULL both pass NEW mode (ST5)


def test_municipality_from_url(spark):
    cases = {
        "https://dagsordener.aabenraa.dk": "aabenraa",
        "https://dagsorden.glostrup.dk": "glostrup",
        "https://www.svendborg.kommune.dk": "svendborg",
        "https://dagsordner.billund.dk": "billund",
        "https://dagsordener.aalborgkommune.dk": "aalborg",
        "https://middelfart.kommune.dk": "middelfart",
    }
    df = spark.createDataFrame([(k,) for k in cases], "u string")
    got = {r.u: r.m for r in df.select("u", municipality_from_url(F.col("u")).alias("m")).collect()}
    assert got == cases


def test_extract_uuid(spark):
    u = "https://x/vis?Referat-id=aaaaaaaa-bbbb-cccc-dddd-000000000001&x=2"
    assert _one(spark, extract_uuid(F.lit(u))) == "aaaaaaaa-bbbb-cccc-dddd-000000000001"
    assert _one(spark, extract_uuid(F.lit("https://x/none"))) is None


def test_doc_key_and_bucket(spark):
    k = _one(
        spark,
        doc_key(F.lit("2025-11-19").cast("date"), F.lit("Glostrup"), F.lit("Oekonomiudvalget")),
    )
    assert k == "2025-11-19_glostrup_oekonomiudvalget"
    assert _one(spark, bucket_name(F.lit("glostrup"), F.lit("Teknik og Miljø"))) == (
        "raw-files-glostrup-teknikmiljoe"
    )
    assert _one(spark, bucket_name(F.lit("aarhus"), F.lit("Oekonomi"))) == "raw-files-aarhus"


def test_sanitize_filename(spark):
    assert _one(spark, sanitize_filename(F.lit('a<b>:c"/d\\e|f?g*h'))) == "a_b__c__d_e_f_g_h"


def test_word_shingles_short_text(spark):
    assert _one(spark, word_shingles(F.lit("one two"), 3)) == ["one two"]
    assert _one(spark, word_shingles(F.lit("a b c d"), 3)) == ["a b c", "b c d"]


def test_fingerprint_normalization_invariance(spark):
    a = _one(spark, fingerprint(F.lit("Hello,   World!")))
    b = _one(spark, fingerprint(F.lit("hello world")))
    assert a == b


def test_token_count_and_lang(spark):
    assert _one(spark, token_count(F.lit("  a b   c "))) == 3
    assert _one(spark, lang_guess(F.lit("the cat is on the mat"))) == "en"
    assert _one(spark, lang_guess(F.lit("det er en god dag og vi er glade"))) == "da"
    assert _one(spark, lang_guess(F.lit("xyz qqq"))) == "unknown"


def test_let_evaluates_value_exactly_once(spark):
    """functions.expr.let — the binding must evaluate its value once per
    row regardless of how many times the body references it. Measured
    via a plan-size proxy: the bound expression appears ONCE in the
    analyzed plan, vs N times when referenced directly."""
    from pyspark.sql import functions as F

    from kommunedata_data_pipeline_spark.functions.expr import let

    df = spark.createDataFrame([("a b c d e",)], "t string")
    heavy = F.split(F.regexp_replace(F.col("t"), r"\s+", " "), " ")

    bound = let(heavy, lambda arr: F.size(arr) + F.size(arr) + F.size(arr))
    inline = F.size(heavy) + F.size(heavy) + F.size(heavy)

    assert df.select(bound.alias("n")).first().n == df.select(inline.alias("n")).first().n == 15
    plan_bound = df.select(bound.alias("n"))._jdf.queryExecution().analyzed().toString()
    plan_inline = df.select(inline.alias("n"))._jdf.queryExecution().analyzed().toString()
    assert plan_bound.count("regexp_replace") == 1
    assert plan_inline.count("regexp_replace") == 3


def test_let_nests_inside_lambdas(spark):
    from pyspark.sql import functions as F

    from kommunedata_data_pipeline_spark.functions.expr import let

    df = spark.createDataFrame([(4,)], "x int")
    expr = let(
        F.sequence(F.lit(1), F.col("x")),
        lambda seq: F.aggregate(seq, F.lit(0), lambda a, v: a + v),
    )
    assert df.select(expr.alias("s")).first().s == 10


def test_dup_clusters_both_paths_agree(spark):
    """The adaptive small-graph union-find and the iterative min-label
    propagation implement the same contract: cluster_id = min(component)."""
    from kommunedata_data_pipeline_spark.operators.dedup import dup_clusters

    # two chains and one clique: {1-2-3-4}, {10,11}, {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    expected = {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }
    fast = {(r.doc_id, r.cluster_id) for r in dup_clusters(pairs).collect()}
    slow = {
        (r.doc_id, r.cluster_id)
        for r in dup_clusters(pairs, small_graph_edges=0).collect()
    }
    assert fast == expected and slow == expected
