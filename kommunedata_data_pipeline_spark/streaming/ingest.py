"""Streaming incremental-ingest dedup — the production composition of
the reference's incremental semantics (ST1 new-only batches + ST2
exactly-once landing, scraper.py:210-222) with the MinHash-LSH index
family (operators/dedup.py:minhash_index_update): every micro-batch of
fresh documents is near-deduped against the PERSISTED band-table index,
the survivors land exactly once, and the index grows by the batch's
band rows.

Batch-invariance contract (what makes this oracle-able): the index
stores band rows for EVERY ingested doc (kept and dropped alike), so
the drop rule — "drop a document iff it is a near-dup (est_jaccard >=
threshold) of ANY smaller-id document ever seen" — is a pure function
of the document set for any batching THAT ARRIVES IN ID ORDER (ids
within a batch may be arbitrary; across batches, later batches must
carry larger ids — the crawl-sequence shape, since an append-only sink
cannot retroactively evict an already-landed doc when a smaller id
shows up later). Under that ordering, one batch or ten, the landed set
equals the batch-mode answer:

    SELECT doc_id FROM docs
    WHERE doc_id NOT IN (SELECT doc_b FROM full_rebuild_lsh_pairs)

(pinned by a pytest that replays the same corpus under different
id-ordered batch splits, and by the driver oracle of
`q_stream_ingest_dedup`).

Scale shape per batch: signatures/banding cost O(batch); the only
contact with the stored index is the (band, bkey) equi-join (AQE
broadcasts a small batch against a huge index); landing is the ST2
anti-join against the landed-keys catalog. The index swap below is a
local-FS rename — a real deployment writes the band table to a
transactional table (the swap is the only non-object-store-safe step,
and it is confined to this sink function).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BAND_SCHEMA = "doc_id bigint, sig array<bigint>, band int, bkey string"


def _load_index(spark: SparkSession, index_path: str) -> DataFrame:
    """Stored band table, or a typed empty frame before the first batch."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.schema(_BAND_SCHEMA).parquet(index_path)
    except AnalysisException as exc:
        msg = str(exc)
        cond = (exc.getCondition() or "") if hasattr(exc, "getCondition") else ""
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA") or (
            "PATH_NOT_FOUND" in msg or "Unable to infer schema" in msg
        ):
            return spark.createDataFrame([], _BAND_SCHEMA)
        raise


def minhash_dedup_ingest(
    doc_stream: DataFrame,
    index_path: str,
    out_path: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
):
    """foreachBatch writer: near-dedup each micro-batch against the
    stored index, land survivors exactly once (anti-join vs the landed
    catalog), persist the updated index. Returns an un-started
    writeStream (caller picks trigger/checkpoint and starts it)."""

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ..operators.dedup import minhash_index_update
        from ..sources.sinks import load_catalog

        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
        if batch.isEmpty():
            return
        index = _load_index(spark, index_path)
        pairs, updated = minhash_index_update(
            batch, index, k, num_hashes, bands, threshold
        )
        # drop rule: a doc is a duplicate iff it is the LARGER id of any
        # verified pair (keep-first-by-id; doc_a < doc_b by construction)
        dup_ids = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
        kept = batch.join(dup_ids, "doc_id", "left_anti")
        # ST2 exactly-once landing: anti-join against landed keys so a
        # replayed batch (foreachBatch is at-least-once) lands zero rows
        landed = load_catalog(spark, out_path, ["doc_id"])
        if landed is not None:
            kept = kept.join(landed, ["doc_id"], "left_anti")
        kept.write.mode("append").parquet(out_path)
        # persist the updated index: write-new-then-swap (local FS; a
        # real deployment writes a transactional table instead). The
        # updated frame READS the old index, so it must fully
        # materialize before the old dir is replaced.
        tmp = f"{index_path}__next_{uuid.uuid4().hex[:8]}"
        updated.write.mode("overwrite").parquet(tmp)
        if os.path.exists(index_path):
            shutil.rmtree(index_path)
        os.replace(tmp, index_path)

    return doc_stream.writeStream.foreachBatch(process_batch)


def run_ingest_available_now(
    doc_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    **kwargs,
) -> None:
    """Drive the ingest over everything currently staged (the bounded
    ST4 full-scan shape): availableNow trigger, synchronous."""
    q = (
        minhash_dedup_ingest(doc_stream, index_path, out_path, **kwargs)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
