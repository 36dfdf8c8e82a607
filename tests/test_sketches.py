"""Sketch operator properties (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.operators.sketches import (
    HLL_M,
    bloom_bits,
    bloom_contains,
    hll_estimate,
    hll_registers,
    kmv_estimate,
)


def test_hll_registers_bounded(spark):
    df = spark.range(5000).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k").collect()
    assert 0 < len(regs) <= HLL_M
    assert all(0 <= r.bucket < HLL_M and 1 <= r.max_rho <= 27 for r in regs)


def test_estimates_near_truth(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").alias("k"))
    hll = hll_estimate(df, "k").collect()[0].est_hll
    kmv = kmv_estimate(df, "k", 64).collect()[0].est_kmv
    # m=64 HLL has ~13% relative error, KMV(64) ~12.5%; allow 3 sigma
    assert abs(hll - n) / n < 0.4, hll
    assert abs(kmv - n) / n < 0.4, kmv


def test_bloom_no_false_negatives(spark):
    members = spark.range(0, 200).select(F.col("id").alias("k"))
    probe = spark.range(0, 1000).select(F.col("id").alias("k"))
    bits = bloom_bits(members, "k", 2048, 3)
    out = bloom_contains(probe, "k", bits, 2048, 3)
    missed = out.where((F.col("k") < 200) & ~F.col("maybe_member")).count()
    assert missed == 0
    # false-positive rate stays sane at this fill factor
    fp = out.where((F.col("k") >= 200) & F.col("maybe_member")).count()
    assert fp < 200


def test_kmv_set_algebra_estimates_track_exact(spark):
    from kommunedata_data_pipeline_spark.operators.sketches import kmv_set_algebra
    from kommunedata_data_pipeline_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    row = kmv_set_algebra(a, b, "user_id", k=32).collect()[0]
    assert 0.0 <= row["est_jaccard"] <= 1.0
    # KMV with k=32 is coarse; estimates must land within 3x of exact
    assert row["exact_union"] / 3 <= row["est_union"] <= row["exact_union"] * 3
    if row["exact_intersection"] > 0:
        assert (
            row["exact_intersection"] / 4
            <= row["est_intersection"]
            <= row["exact_intersection"] * 4
        )
    # subset sanity: A∩B <= A∪B in both exact and estimated space
    assert row["exact_intersection"] <= row["exact_union"]
    assert row["est_intersection"] <= row["est_union"] + 1e-9
