"""SCD-2 apply operator semantics (operators/scd.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.operators.scd import scd2_apply


def _dim(spark):
    return spark.createDataFrame(
        [(1, "a", "2024-01-01", None), (2, "b", "2024-01-01", None)],
        "k int, attr string, valid_from string, valid_to string",
    )


def test_scd2_closes_and_opens(spark):
    upd = spark.createDataFrame([(1, "a2")], "k int, attr string")
    out = scd2_apply(_dim(spark), upd, "k", ["attr"], "2024-06-01")
    rows = {(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "a", "2024-01-01", "2024-06-01"),
        (1, "a2", "2024-06-01", None),
        (2, "b", "2024-01-01", None),
    }


def test_scd2_null_attr_update_still_closes(spark):
    # an update that sets the attribute to NULL must close the old version
    upd = spark.createDataFrame([(1,)], "k int").withColumn(
        "attr", F.lit(None).cast("string")
    )
    out = scd2_apply(_dim(spark), upd, "k", ["attr"], "2024-06-01")
    rows = {(r.k, r.attr, r.valid_from, r.valid_to) for r in out.collect()}
    assert rows == {
        (1, "a", "2024-01-01", "2024-06-01"),
        (1, None, "2024-06-01", None),
        (2, "b", "2024-01-01", None),
    }
