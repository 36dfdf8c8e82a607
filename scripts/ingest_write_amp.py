#!/usr/bin/env python
"""Measure CUMULATIVE write amplification of the ingest stores with
auto-compaction ON over many consecutive batches (VERDICT r10 #6: the
<= 2x-total-bytes LSM claim was argued from the doubling rule but only
per-batch bytes were measured).

Drives >= 16 equal micro-batches through minhash_dedup_ingest with
auto_compact=True, tallying every byte written (delta appends +
compaction rewrites, via `streaming.ingest.WRITE_LOG`) and comparing
against the final store size. The size-tiered ratio=1 trigger predicts
total-bytes-written / final-store-bytes <= ~2-3x (each byte is written
once as a delta and re-written at most O(1) amortized times by
doublings); an unbounded ratio would mean the compactions re-introduced
the quadratic shape the delta appends removed.

Usage: python scripts/ingest_write_amp.py  (sf0.1 documents; prints a
markdown row for SCALING.md)
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
BATCHES = 16
BATCH_DOCS = 200


def du(path):
    t = 0
    for root, _d, fs in os.walk(path):
        for f in fs:
            t += os.path.getsize(os.path.join(root, f))
    return t


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("ingest-write-amp")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kommunedata_data_pipeline_spark.streaming import ingest as ing

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(
        prefix="kdp-wamp-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        stage = f"{base}/stage"
        os.makedirs(stage)
        for i in range(BATCHES):
            lo, hi = i * BATCH_DOCS, (i + 1) * BATCH_DOCS
            part = f"{base}/p{i}"
            docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).coalesce(1).write.mode("overwrite").parquet(part)
            src = glob.glob(f"{part}/part-*.parquet")[0]
            dst = f"{stage}/b{i:02d}.parquet"
            os.rename(src, dst)
            shutil.rmtree(part, ignore_errors=True)
            os.utime(dst, (1_700_000_000 + i,) * 2)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        ing.WRITE_LOG = []
        try:
            ing.run_writer_available_now(
                ing.minhash_dedup_ingest(
                    stream, f"{base}/idx", f"{base}/landed",
                    auto_compact=True,
                ),
                f"{base}/ckpt",
            )
            idx_events = [
                e for e in ing.WRITE_LOG if e["path"] == f"{base}/idx"
            ]
        finally:
            ing.WRITE_LOG = None
        delta_bytes = sum(
            e["bytes"] for e in idx_events if e["kind"] == "delta"
        )
        compact_bytes = sum(
            e["bytes"] for e in idx_events if e["kind"] == "compact"
        )
        n_compactions = sum(
            1 for e in idx_events if e["kind"] == "compact"
        )
        final = du(f"{base}/idx")
        amp = (delta_bytes + compact_bytes) / max(final, 1)
        print(
            f"| minhash band store | {BATCHES} batches x {BATCH_DOCS} "
            f"docs, auto_compact ratio=1 | deltas {delta_bytes:,} + "
            f"compactions {compact_bytes:,} ({n_compactions} folds) | "
            f"final store {final:,} | amplification {amp:.2f}x |"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
