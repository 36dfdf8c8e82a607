#!/usr/bin/env python
"""Measure per-batch store WRITE volume for the incremental-ingest
family (VERDICT r9 #1 'done' criterion): ingest 3 consecutive
equal-size batches on top of a SMALL and a LARGE pre-loaded store and
record the bytes each batch's delta writes. Linear-cumulative-I/O
claim holds iff bytes-per-batch is ~constant across batches AND
~equal between the two store sizes (the old overwrite-per-batch shape
wrote the whole store: bytes ∝ store, growing every batch).

Usage: python scripts/ingest_volume.py  (sf0.1 documents; prints a
markdown table for SCALING.md)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BATCH = 250  # docs per measured batch


def du_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def stage(df, id_col, ranges, stage_dir):
    os.makedirs(stage_dir, exist_ok=True)
    for i, (lo, hi) in enumerate(ranges):
        part = f"{stage_dir}__p{i}"
        df.where((F.col(id_col) >= lo) & (F.col(id_col) < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        src = glob.glob(f"{part}/part-*.parquet")[0]
        dst = f"{stage_dir}/b{i}.parquet"
        os.rename(src, dst)
        shutil.rmtree(part, ignore_errors=True)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))


def run_family(spark, docs, family, prefix_docs, label):
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        run_writer_available_now,
        substring_dedup_ingest,
    )
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        minhash_dedup_ingest,
    )

    base = tempfile.mkdtemp(
        prefix=f"kdp-vol-{family}-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        ranges = [(0, prefix_docs)] + [
            (prefix_docs + i * BATCH, prefix_docs + (i + 1) * BATCH)
            for i in range(3)
        ]
        stage(docs, "doc_id", ranges, f"{base}/stage")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{base}/stage")
        )
        if family == "minhash":
            writer = minhash_dedup_ingest(
                stream, f"{base}/index", f"{base}/landed",
                k=3, num_hashes=16, bands=4, threshold=0.5,
            )
        else:
            writer = substring_dedup_ingest(
                stream, f"{base}/index", f"{base}/landed",
                min_len=25, max_dup_ratio=0.5,
            )
        run_writer_available_now(writer, f"{base}/ckpt")
        store_total = du_bytes(f"{base}/index")
        batch_bytes = [
            du_bytes(f"{base}/index/ver={i}") for i in range(1, 4)
        ]
        print(
            f"| {family} | {label} ({prefix_docs} docs) | "
            + " / ".join(f"{b:,}" for b in batch_bytes)
            + f" | {store_total:,} |"
        )
        return batch_bytes, store_total
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ingest-volume")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )
    print(
        "| family | store preload | bytes written per batch "
        "(3×250 docs) | store total bytes |"
    )
    print("|---|---|---|---|")
    results = {}
    for family in ("minhash", "substring"):
        small = run_family(spark, docs, family, 500, "small")
        large = run_family(spark, docs, family, 4000, "large")
        results[family] = (small, large)
    for family, ((sb, st), (lb, lt)) in results.items():
        ratio = (sum(lb) / 3) / (sum(sb) / 3)
        store_ratio = lt / st
        print(
            f"{family}: mean per-batch bytes large/small = {ratio:.2f}x "
            f"(store sizes differ {store_ratio:.2f}x) — "
            f"{'LINEAR (∝ batch)' if ratio < 1.5 else 'NOT linear'}"
        )


if __name__ == "__main__":
    main()
