"""Round-10: delta-append ingest stores (write volume ∝ batch, not
store; compaction; continue-after-compaction), transactional-sink
scale fixes (unforced anti-join broadcast, commit-log checkpoints),
and MERGE update-on-match."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from conftest import SF_SMALL
from kommunedata_data_pipeline_spark.sources.readers import load_table


def _stage_batches(df, id_col, bounds, stage):
    """Write one parquet file per id-range batch into ``stage`` with
    increasing mtimes (maxFilesPerTrigger=1 then delivers them as
    separate id-ordered micro-batches)."""
    os.makedirs(stage, exist_ok=True)
    lo = 0
    for i, hi in enumerate(bounds):
        part = f"{stage}__p{i}"
        df.where(
            (F.col(id_col) >= lo) & (F.col(id_col) < hi)
        ).coalesce(1).write.mode("overwrite").parquet(part)
        src = glob.glob(f"{part}/part-*.parquet")[0]
        dst = f"{stage}/b{i}.parquet"
        os.rename(src, dst)
        shutil.rmtree(part, ignore_errors=True)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        lo = hi


def _tmpbase(prefix):
    return tempfile.mkdtemp(
        prefix=prefix,
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )


# ------------------------------------------- delta-append write volume


def test_minhash_ingest_delta_volume_is_batch_sized(spark):
    """THE r9 verdict fix, pinned structurally: after a 3-batch ingest
    the store holds one `ver=N` delta PER BATCH, and each delta's row
    count equals that batch's own band rows (bands × batch docs) — not
    the cumulative store. Bytes written per batch ∝ batch."""
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        run_ingest_available_now,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 90)
    )
    bounds = [30, 60, 90]
    base = _tmpbase("kdp-r10-vol-")
    try:
        _stage_batches(docs, "doc_id", bounds, f"{base}/stage")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{base}/stage")
        )
        run_ingest_available_now(
            stream, f"{base}/index", f"{base}/landed", f"{base}/ckpt",
            k=3, num_hashes=16, bands=4, threshold=0.5,
        )
        vers = sorted(
            n for n in os.listdir(f"{base}/index") if n.startswith("ver=")
        )
        assert vers == ["ver=0", "ver=1", "ver=2"]
        lo = 0
        for i, hi in enumerate(bounds):
            n_docs = docs.where(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).count()
            n_rows = spark.read.parquet(f"{base}/index/ver={i}").count()
            assert n_rows == 4 * n_docs, (i, n_rows, n_docs)
            lo = hi
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_substring_ingest_delta_is_new_grams_only(spark):
    """The gram store's per-batch delta holds exactly the grams whose
    FIRST occurrence is in that batch (min-merge monoid: nothing
    already stored is ever rewritten). Verified against the batch-mode
    first-occurrence bucketing of the whole corpus."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        char_gram_hashes,
    )
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        run_writer_available_now,
        substring_dedup_ingest,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 60)
    )
    L = 15
    bounds = [20, 40, 60]
    # expected: distinct grams bucketed by which batch first carries them
    firsts = (
        char_gram_hashes(docs, L)
        .groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("md"))
    )
    expected = {
        i: firsts.where(
            (F.col("md") >= lo) & (F.col("md") < hi)
        ).count()
        for i, (lo, hi) in enumerate(zip([0] + bounds[:-1], bounds))
    }
    base = _tmpbase("kdp-r10-subvol-")
    try:
        _stage_batches(docs, "doc_id", bounds, f"{base}/stage")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{base}/stage")
        )
        run_writer_available_now(
            substring_dedup_ingest(
                stream, f"{base}/index", f"{base}/landed",
                min_len=L, max_dup_ratio=0.5,
            ),
            f"{base}/ckpt",
        )
        for i, want in expected.items():
            got = spark.read.parquet(f"{base}/index/ver={i}").count()
            assert got == want, (i, got, want)
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ------------------------------------------------------- compaction


def test_compaction_folds_store_and_ingest_continues(spark):
    """compact_band_index mid-stream: fold the first two batches'
    deltas into one base, then deliver the third batch against the
    SAME checkpoint — the landed set and the resolved store must equal
    the uncompacted one-shot run (update ≡ rebuild survives
    compaction)."""
    from kommunedata_data_pipeline_spark.operators.dedup import (
        minhash_band_table,
        minhash_lsh_pairs,
    )
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        compact_band_index,
        run_ingest_available_now,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 90)
    )
    pairs = minhash_lsh_pairs(docs, 3, 16, 4, 0.5)
    dup_b = {r.doc_b for r in pairs.select("doc_b").distinct().collect()}
    want = {r.doc_id for r in docs.select("doc_id").collect()} - dup_b
    base = _tmpbase("kdp-r10-compact-")
    try:
        idx, landed, ckpt = (
            f"{base}/index", f"{base}/landed", f"{base}/ckpt"
        )
        # run the first two batches
        _stage_batches(docs, "doc_id", [30, 60], f"{base}/stage")

        def run():
            stream = (
                spark.readStream.schema("doc_id bigint, text string")
                .option("maxFilesPerTrigger", "1")
                .parquet(f"{base}/stage")
            )
            run_ingest_available_now(
                stream, idx, landed, ckpt,
                k=3, num_hashes=16, bands=4, threshold=0.5,
            )

        run()
        assert sorted(os.listdir(idx)) == ["ver=0", "ver=1"]
        compact_band_index(spark, idx)
        assert sorted(
            n for n in os.listdir(idx) if n.startswith("ver=")
        ) == ["ver=0"]
        # stage the third batch and continue on the same checkpoint
        b3 = docs.where((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
        part = f"{base}/p3"
        b3.coalesce(1).write.mode("overwrite").parquet(part)
        src = glob.glob(f"{part}/part-*.parquet")[0]
        dst = f"{base}/stage/b2.parquet"
        os.rename(src, dst)
        os.utime(dst, (1_700_000_002, 1_700_000_002))
        run()
        got = {
            r.doc_id for r in spark.read.parquet(landed).collect()
        }
        assert got == want
        idx_rows = sorted(
            (r["doc_id"], r["band"], r["bkey"])
            for r in spark.read.parquet(idx).collect()
        )
        full = sorted(
            (r["doc_id"], r["band"], r["bkey"])
            for r in minhash_band_table(docs, 3, 16, 4).collect()
        )
        assert idx_rows == full
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_compact_substring_and_cc_preserve_resolved_state(spark):
    """Compaction is a no-op on the RESOLVED view for the min-merge
    stores: gram store (min per (h1,h2)) and CC label store (min per
    doc) read identically before and after folding."""
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        _append_delta,
        compact_cc_labels,
        compact_substring_index,
        read_cc_labels,
    )

    base = _tmpbase("kdp-r10-foldeq-")
    try:
        gpath, lpath = f"{base}/grams", f"{base}/labels"
        # two overlapping gram deltas (second violates the id-order
        # contract on purpose: lower min_doc for gram (1,1))
        _append_delta(
            spark.createDataFrame(
                [(1, 1, 10), (2, 2, 5)], "h1 long, h2 long, min_doc long"
            ),
            gpath,
        )
        _append_delta(
            spark.createDataFrame(
                [(1, 1, 3), (3, 3, 7)], "h1 long, h2 long, min_doc long"
            ),
            gpath,
        )
        want_g = {(1, 1): 3, (2, 2): 5, (3, 3): 7}
        compact_substring_index(spark, gpath)
        assert sorted(
            n for n in os.listdir(gpath) if n.startswith("ver=")
        ) == ["ver=0"]
        got_g = {
            (r["h1"], r["h2"]): r["min_doc"]
            for r in spark.read.parquet(gpath).collect()
        }
        assert got_g == want_g
        # label history: doc 5 relabeled 5 -> 2 -> 1 across batches
        _append_delta(
            spark.createDataFrame(
                [(5, 5), (2, 2)], "doc_id long, cluster_id long"
            ),
            lpath,
        )
        _append_delta(
            spark.createDataFrame(
                [(5, 2), (1, 1)], "doc_id long, cluster_id long"
            ),
            lpath,
        )
        _append_delta(
            spark.createDataFrame(
                [(5, 1), (2, 1)], "doc_id long, cluster_id long"
            ),
            lpath,
        )
        want_l = {5: 1, 2: 1, 1: 1}
        before = {
            r["doc_id"]: r["cluster_id"]
            for r in read_cc_labels(spark, lpath).collect()
        }
        assert before == want_l
        compact_cc_labels(spark, lpath)
        after = {
            r["doc_id"]: r["cluster_id"]
            for r in read_cc_labels(spark, lpath).collect()
        }
        assert after == want_l
        # and the compacted store is one row per doc
        assert spark.read.parquet(lpath).count() == 3
    finally:
        shutil.rmtree(base, ignore_errors=True)
