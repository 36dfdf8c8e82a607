#!/usr/bin/env python
"""Phase-timed replica of substring_dedup_ingest.process_batch: stages
the documents table into 3 id-ordered batches, then runs the batch body
with a perf_counter around every statement group, printing seconds per
phase per batch. Ground truth for the per-batch fixed-cost decomposition
(VERDICT r12 next #4/#6).

Usage: python scripts/profile_substring_batch.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import prepare_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = prepare_session(sf_dir)
    import tempfile

    import __spark_entry__ as m
    from kommunedata_data_pipeline_spark.operators.corpus import (
        char_gram_hashes,
        merged_span_lengths,
    )
    from kommunedata_data_pipeline_spark.sources.zones import (
        list_parquet_files,
        new_files_since,
        record_zone_ranges,
    )
    from kommunedata_data_pipeline_spark.streaming import ingest as ing

    base = tempfile.mkdtemp(prefix="kdp-profsub-", dir="/dev/shm")
    d = m._t(spark, sf_dir, "documents").select("doc_id", "text")
    stage = m._stage_id_batches(d, "doc_id", base)
    index_path = f"{base}/index"
    out_path = f"{base}/landed"
    min_len, max_dup_ratio = 25, 0.5
    schema = "h1 bigint, h2 bigint, min_doc bigint"
    files = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    # run-scoped shuffle partitions, like run_writer_available_now
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    for bi, fpath in enumerate(files):
        print(f"--- batch {bi} ({os.path.basename(fpath)})")
        t_all = time.perf_counter()
        marks: list[tuple[str, float]] = []

        def mark(label: str, t0: float) -> None:
            marks.append((label, time.perf_counter() - t0))

        t0 = time.perf_counter()
        batch_df = spark.read.schema("doc_id bigint, text string").parquet(
            fpath
        )
        batch = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
        lo, hi = ing._batch_id_range(batch, "doc_id")
        mark("id_range", t0)

        t0 = time.perf_counter()
        static_plan = (
            str(spark.conf.get("spark.sql.adaptive.enabled", "true")).lower()
            != "true"
        )
        grams = char_gram_hashes(batch, min_len)
        if static_plan:
            grams = grams.repartition("h1", "h2")
        grams = grams.localCheckpoint(eager=False)
        firsts = grams.groupBy("h1", "h2").agg(
            F.min("doc_id").alias("min_doc")
        )
        worth = ing._worth_pruning(index_path)
        if worth:
            firsts = firsts.localCheckpoint(eager=False)
        mark("plan_grams(build)", t0)

        t0 = time.perf_counter()
        h_probe = ing._key_set_probe(firsts, "h1", index_path)
        mark(f"key_probe(worth={worth})", t0)

        t0 = time.perf_counter()
        store = ing._load_index(
            spark, index_path, schema, prune=h_probe, log_label=index_path
        )
        if getattr(store, "_kdp_provably_empty", False):
            joined = firsts.withColumn(
                "stored_min", F.lit(None).cast("bigint")
            ).localCheckpoint(eager=False)
        else:
            stored = store.groupBy("h1", "h2").agg(
                F.min("min_doc").alias("stored_min")
            )
            joined = firsts.join(stored, ["h1", "h2"], "left").localCheckpoint(
                eager=False
            )
        lookup = joined.select(
            "h1",
            "h2",
            F.least(
                F.col("min_doc"), F.coalesce("stored_min", F.col("min_doc"))
            ).alias("min_doc"),
        )
        lk = lookup.hint("shuffle_hash") if static_plan else lookup
        covered = (
            grams.join(lk, ["h1", "h2"])
            .where(F.col("min_doc") < F.col("doc_id"))
            .select("doc_id", "p")
        )
        dup = merged_span_lengths(covered, min_len)
        stats = (
            batch.select("doc_id", F.length("text").alias("n_chars"))
            .join(dup, "doc_id", "left")
            .select(
                "doc_id",
                "n_chars",
                F.coalesce("dup_chars", F.lit(0).cast("bigint")).alias(
                    "dup_chars"
                ),
            )
        )
        kept = stats.where(
            F.col("dup_chars").cast("double")
            < F.lit(max_dup_ratio) * F.col("n_chars")
        )
        landed = ing._load_catalog_pruned(spark, out_path, "doc_id", lo, hi)
        if landed is not None:
            kept = kept.join(landed, ["doc_id"], "left_anti")
        mark("plan_rest(build)", t0)

        t0 = time.perf_counter()
        before = list_parquet_files(out_path)
        kept.write.mode("append").parquet(out_path)
        mark("landing_write", t0)

        t0 = time.perf_counter()
        record_zone_ranges(
            out_path, {"doc_id": (lo, hi)}, new_files_since(out_path, before)
        )
        mark("zone_tag", t0)

        t0 = time.perf_counter()
        delta = joined.where(
            F.col("stored_min").isNull()
            | (F.col("min_doc") < F.col("stored_min"))
        ).select("h1", "h2", "min_doc")
        gram_ranges = (
            {"h1": (h_probe["h1"][1][0], h_probe["h1"][1][-1])}
            if h_probe
            else {}
        )
        ing._append_delta(delta, index_path, zone_ranges=gram_ranges)
        mark("delta_append", t0)

        total = time.perf_counter() - t_all
        for label, sec in marks:
            print(f"  {label:26s} {sec:7.3f}s")
        print(f"  {'TOTAL':26s} {total:7.3f}s")

    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
