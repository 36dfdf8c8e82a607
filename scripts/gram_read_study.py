#!/usr/bin/env python
"""Gram-store read-bound study (VERDICT r11 next #2): does file
skipping bite on the ExactSubstr gram store, and is a per-file Bloom
sidecar worth adding?

Background: uniform 64-bit gram keys mean min/max zones can only skip a
file when NO probe key lands in its key range. With B distinct probe
grams and N base files, the expected opened-file count is
N * (1 - (1 - 1/N)^B) <= min(B, N): at the sandbox bench's operating
point (B in the thousands, N ~ 10-20) every file is hit and pruning
"cannot bite" (the r11 SCALING non-result, 0.6-2.2 %). But the 100 TB
regime is the OPPOSITE corner: N grows with the store (800k files at
128 MB target) while B stays batch-sized, so zones alone open <= B
files — the same flat-read contract the MinHash store shows. This
script measures that regime directly by compacting the store into many
small files (N >> B) and probing with a small fresh batch.

It also measures the MEMBERSHIP FLOOR — the number of opened files that
truly contain a probe gram (what a perfect per-file key-membership
structure, e.g. an exact Bloom, could reach) — and prints the Bloom FP
math: a file is bloom-skipped only if ALL B_in in-range probes miss, so
P(skip|clean) = (1-p)^B_in. Zones already cut B_in to ~B/N per file,
which is what makes the hybrid plausible at all; the raw per-store
bloom (no zones) needs ~20+ bits/key to survive B=5000 probes.

Usage: python scripts/gram_read_study.py  (prints markdown rows)
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
PRELOAD_DOCS = 12000
BATCH_DOCS = 1
BATCH_CHARS = 320  # ~300 grams at min_len=25: B << N below
TARGET_FILE_BYTES = 24 * 1024  # fine layout: N ~ few hundred files


def expand(docs, n_rows):
    k = -(-n_rows // 5000)
    out = None
    for i in range(k):
        part = docs.select(
            (F.col("doc_id") + i * 5000).alias("doc_id"),
            F.concat(F.lit(f"c{i} v"), F.col("text")).alias("text"),
        )
        out = part if out is None else out.union(part)
    return out.where(F.col("doc_id") < n_rows)


def stage_slice(df, dest):
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    part = dest + "__p"
    df.coalesce(1).write.mode("overwrite").parquet(part)
    src = glob.glob(f"{part}/part-*.parquet")[0]
    os.rename(src, dest)
    shutil.rmtree(part, ignore_errors=True)


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("gram-read-study")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kommunedata_data_pipeline_spark.operators.corpus import (
        char_gram_hashes,
    )
    from kommunedata_data_pipeline_spark.sources import zones as Z
    from kommunedata_data_pipeline_spark.streaming import ingest as ing

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    base = tempfile.mkdtemp(
        prefix="kdp-gramstudy-",
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    try:
        grown = expand(docs, PRELOAD_DOCS + BATCH_DOCS)
        stage_slice(
            grown.where(F.col("doc_id") < PRELOAD_DOCS),
            f"{base}/stage/b0.parquet",
        )

        def drive():
            stream = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{base}/stage")
            )
            ing.run_writer_available_now(
                ing.substring_dedup_ingest(
                    stream, f"{base}/idx", f"{base}/landed"
                ),
                f"{base}/ckpt",
            )

        print("preloading gram store ...", flush=True)
        drive()
        ing.compact_index(
            spark,
            f"{base}/idx",
            "h1 bigint, h2 bigint, min_doc bigint",
            lambda df: df.groupBy("h1", "h2").agg(
                F.min("min_doc").alias("min_doc")
            ),
            range_col="h1",
            zone_cols=["h1"],
            target_file_bytes=TARGET_FILE_BYTES,
        )
        n_files = len(Z.list_parquet_files(f"{base}/idx") or [])
        # the fresh probe batch: one truncated doc => B ~ 300 grams
        batch = grown.where(F.col("doc_id") >= PRELOAD_DOCS).select(
            "doc_id", F.substring("text", 1, BATCH_CHARS).alias("text")
        )
        stage_slice(batch, f"{base}/stage/b1.parquet")
        b_grams = (
            char_gram_hashes(batch, 25)
            .select("h1")
            .distinct()
        )
        B = b_grams.count()
        Z.READ_LOG = []
        try:
            drive()
            idx_reads = [
                e
                for e in Z.READ_LOG
                if os.path.basename(e["label"]) == "idx"
            ]
        finally:
            Z.READ_LOG = None
        opened_f = sum(e["selected_files"] for e in idx_reads)
        total_f = max(e["total_files"] for e in idx_reads)
        opened_b = sum(e["selected_bytes"] for e in idx_reads)
        total_b = max(e["total_bytes"] for e in idx_reads)
        # membership floor: of the zone-opened base files, how many
        # truly contain a probe gram (what a perfect per-file key
        # structure could reach)
        probe_set = {r["h1"] for r in b_grams.collect()}
        store = spark.read.schema(
            "h1 bigint, h2 bigint, min_doc bigint, ver int"
        ).option("basePath", f"{base}/idx").parquet(f"{base}/idx")
        hits = (
            store.withColumn("__f", F.input_file_name())
            .where(F.col("h1").isin(*list(probe_set)))
            .select("__f")
            .distinct()
            .count()
        )
        exp_opened = total_f * (1 - (1 - 1 / max(total_f, 1)) ** B)
        print()
        print(
            "| store files N | batch grams B | zone-opened files "
            "(bytes) | expected N(1-(1-1/N)^B) | membership floor "
            "(true-hit files) |"
        )
        print("|---|---|---|---|---|")
        print(
            f"| {total_f} | {B} | {opened_f} "
            f"({opened_b:,} of {total_b:,} = "
            f"{opened_b / max(total_b, 1):.3f}) | {exp_opened:.0f} | "
            f"{hits} |",
            flush=True,
        )
        # bloom math at this B (raw store-wide bloom, no zones)
        print()
        print("Bloom FP math (P(file skipped | truly clean) = (1-p)^B):")
        for bits, p in ((10, 0.00819), (16, 0.000458), (20, 0.0000671)):
            print(
                f"  {bits:2d} bits/key (p={p:.2e}): "
                f"(1-p)^{B} = {(1 - p) ** B:.3f}"
            )
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
