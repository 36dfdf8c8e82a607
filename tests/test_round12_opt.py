"""Round-12 optimization internals.

Pins the mechanisms the optimization round introduced:

- `pin_columns` (functions/expr.py): projection-identical semantics
  (nulls included) AND the optimizer-barrier property — a predicate on
  a pinned column must not re-state the pinned expression in a filter
  pushed below the plan's exchanges.
- exchange sharing through `localCheckpoint` (the substring-ingest
  r12 rewrite relies on it): a repartition(cols) + lazy localCheckpoint
  feeds a same-key groupBy with ZERO further exchanges.
- `_estimated_splits` (sources/readers.py): the driver-side split
  estimate that replaced the per-load RDD-conversion probe.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.functions.expr import pin_columns


@pytest.fixture(scope="module")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("test-round12-opt")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pin_columns_matches_projection_semantics(spark):
    # null expression values, empty strings, and plain rows must all
    # come through exactly as a withColumn projection would emit them
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "")], "id long, s string"
    )
    pinned = pin_columns(
        df, {"n": F.length("s"), "u": F.upper("s")}, keep=["id"]
    )
    plain = df.select(
        "id", F.length("s").alias("n"), F.upper("s").alias("u")
    )
    assert sorted(map(tuple, pinned.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_pin_columns_blocks_filter_inlining(spark):
    # a filter on the pinned column must NOT re-state the expression in
    # any Filter condition (the pushdown-double-eval shape the pin
    # exists to stop); an unpinned projection DOES get inlined
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("x"), F.col("id").cast("string")).alias("s")
    ).repartition(4)
    expr = F.regexp_replace("s", "x", "y")

    unpinned = df.select("id", expr.alias("r")).where(F.col("r") != "zz")
    assert any(
        "regexp_replace" in c
        for c in re.findall(r"Condition : (.*)", _formatted(unpinned))
    ), "baseline: the optimizer inlines projected exprs into filters"

    pinned = pin_columns(df, {"r": expr}, keep=["id"]).where(
        F.col("r") != "zz"
    )
    p = _formatted(pinned)
    assert not any(
        "regexp_replace" in c for c in re.findall(r"Condition : (.*)", p)
    ), "pinned expression leaked into a Filter condition"
    # results identical
    assert sorted(r.r for r in pinned.collect()) == sorted(
        r.r for r in unpinned.collect()
    )


def test_pin_columns_passthrough_filters_still_push(spark):
    # predicates on pass-through (non-pinned) columns must still cross
    # the Generate toward the scan — the barrier is scoped to the
    # pinned columns only
    df = spark.range(100).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    pinned = pin_columns(df, {"r": F.upper("s")}, keep=["id", "s"]).where(
        F.col("id") > 50
    )
    p = _formatted(pinned)
    gen_pos = p.find("Generate")
    filt = re.search(r"\(\d+\) Filter", p)
    assert filt is not None and gen_pos >= 0
    # in formatted explain the tree is printed root-first, so a filter
    # BELOW the generate prints AFTER it
    assert p.find("(id", filt.start()) != -1
    assert filt.start() > gen_pos


def test_repartition_localcheckpoint_shares_exchange(spark):
    # the substring-ingest r12 STATIC-plan shape: repartition(cols) +
    # lazy localCheckpoint -> a same-key groupBy plans zero exchanges.
    # Only true with AQE off — through AdaptiveSparkPlan the
    # checkpointed RDD reports UnknownPartitioning, which is exactly
    # why substring_dedup_ingest gates the pre-partition on the
    # session's adaptive.enabled (both facts pinned here).
    df = spark.range(1000).select(
        (F.col("id") % 37).alias("h1"), (F.col("id") % 31).alias("h2"),
        F.col("id").alias("doc_id"),
    )
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        part = df.repartition("h1", "h2").localCheckpoint(eager=False)
        agg = part.groupBy("h1", "h2").agg(F.min("doc_id").alias("m"))
        assert "Exchange" not in _formatted(agg)
        assert agg.count() > 0
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        part2 = df.repartition("h1", "h2").localCheckpoint(eager=False)
        agg2 = part2.groupBy("h1", "h2").agg(F.min("doc_id").alias("m"))
        assert "UnknownPartitioning" in _formatted(agg2)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_estimated_splits_matches_file_math(spark, tmp_path):
    from kommunedata_data_pipeline_spark.sources.readers import (
        _estimated_splits,
    )

    p = tmp_path / "t.parquet"
    spark.range(1000).coalesce(1).write.mode("overwrite").parquet(str(p))
    # directory of small files -> 1 estimated split (under 128 MB)
    assert _estimated_splits(spark, str(p)) == 1
    # missing path is conservative, never raises
    assert _estimated_splits(spark, str(tmp_path / "nope")) == 1
