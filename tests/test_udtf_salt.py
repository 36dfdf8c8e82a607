"""UDTF surface + salted-join equivalence (SURVEY §2.11, §4 skew)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.functions.udtfs import register_udtfs
from kommunedata_data_pipeline_spark.operators.joins import salted_join


def test_udtf_lateral_extracts_rows(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a.pdf|01-02-2025; b.pdf|2025-03-04"), (2, ""), (3, None)],
        "id int, payload string",
    ).createOrReplaceTempView("raw_listings")
    got = spark.sql(
        """
        SELECT id, t.pos, t.url, t.raw_date
        FROM raw_listings, LATERAL extract_meeting_links(payload) t
        ORDER BY id, t.pos
        """
    ).collect()
    assert [(r.id, r.pos, r.url, r.raw_date) for r in got] == [
        (1, 0, "a.pdf", "01-02-2025"),
        (1, 1, "b.pdf", "2025-03-04"),
    ]


def test_salted_join_equals_plain_join(spark):
    # one pathologically hot key (90% of facts) + uniform tail
    facts = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, 1).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("d")
    )
    plain = facts.join(dim, "k").select("k", "v", "d")
    salted = salted_join(facts, dim, "k", salt=8).select("k", "v", "d")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
