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
