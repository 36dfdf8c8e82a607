#!/usr/bin/env python
"""Committed-table data-skipping study (round 12, N227/N229): measure
what the per-commit footer statistics actually buy a
`read_committed(prune=)` scan as the table grows, and what Z-order
clustering buys a second-column probe over lexicographic range
clustering.

Two claims to price:

1. **Fixed-selectivity probe, growing table** (the 100 TB read shape):
   on a `cluster_by=["k"]` layout, a range probe covering s% of the
   key space should open ~s% of the files + O(1) boundary files at
   EVERY table size — opened files track the PROBE, not the table.
   The study builds the same clustered table at 4x-growing sizes and
   reports opened/total files and opened fraction for a fixed 2%
   probe.

2. **Z-order vs range clustering, second-column probe**: a
   lexicographic (k1, k2) sort leaves k2 unclustered — a k2 probe
   opens ~every file; the Morton interleave gives every clustered
   column ~sqrt-of-file-count locality. The study builds both layouts
   over the same two-uniform-column data and reports the opened
   fraction for the same 1/16 k2 probe, plus the returned-row
   equivalence against the unpruned read (soundness is
   pytest-pinned; here it is re-asserted on the measured tables).

Usage: python scripts/stats_prune_study.py   (prints markdown rows;
paste into SCALING.md)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kommunedata_data_pipeline_spark.sources import sinks  # noqa: E402


def _spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("stats-prune-study")
        .getOrCreate()
    )


def _mk_rows(spark, n: int, two_cols: bool = False):
    """n rows with uniform key(s) and an incompressible 64-byte pad so
    file sizes track row counts (constant pads RLE to nothing and the
    layout collapses into too few files to measure)."""
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % n).alias("k"),
        *(
            [(F.col("id") * 0x9E3779B9 % n).alias("k2")]
            if two_cols
            else []
        ),
        F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
        ).alias("pad"),
    )
    return df


def growth_study(spark, base: str) -> None:
    print("### fixed 2% probe as the clustered table grows\n")
    print(
        "| rows | files | opened | fraction | rows match post-filter |"
    )
    print("|---|---|---|---|---|")
    for n in (100_000, 400_000, 1_600_000):
        path = os.path.join(base, f"g{n}")
        sinks.merge_upsert(_mk_rows(spark, n), path, ["k"])
        sinks.optimize_table(
            spark,
            path,
            target_file_bytes=1 << 19,
            cluster_by=["k"],
        )
        lo, hi = int(n * 0.49), int(n * 0.51)
        probe = {"k": ("range", lo, hi)}
        full = sinks.read_committed(spark, path)
        pruned = sinks.read_committed(spark, path, prune=probe)
        nf, np_ = len(full.inputFiles()), len(pruned.inputFiles())
        want = full.where(F.col("k").between(lo, hi)).count()
        got = pruned.where(F.col("k").between(lo, hi)).count()
        print(
            f"| {n:,} | {nf} | {np_} | {np_ / nf:.3f} | "
            f"{'YES' if want == got else 'NO'} ({got:,}) |"
        )


def zorder_study(spark, base: str) -> None:
    n = 400_000
    print("\n### 1/16 second-column probe: range vs Z-order layout\n")
    print("| layout | files | opened | fraction | rows match |")
    print("|---|---|---|---|---|")
    lo, hi = 0, n // 16 - 1
    probe = {"k2": ("range", lo, hi)}
    for method in ("range", "zorder"):
        path = os.path.join(base, f"z{method}")
        sinks.merge_upsert(
            _mk_rows(spark, n, two_cols=True), path, ["k"]
        )
        sinks.optimize_table(
            spark,
            path,
            target_file_bytes=1 << 19,
            cluster_by=["k", "k2"],
            cluster_method=method,
        )
        full = sinks.read_committed(spark, path)
        pruned = sinks.read_committed(spark, path, prune=probe)
        nf, np_ = len(full.inputFiles()), len(pruned.inputFiles())
        want = full.where(F.col("k2").between(lo, hi)).count()
        got = pruned.where(F.col("k2").between(lo, hi)).count()
        print(
            f"| {method} | {nf} | {np_} | {np_ / nf:.3f} | "
            f"{'YES' if want == got else 'NO'} ({got:,}) |"
        )


def main() -> None:
    spark = _spark()
    base = tempfile.mkdtemp(
        prefix="kdp-prune-study-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        growth_study(spark, base)
        zorder_study(spark, base)
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
