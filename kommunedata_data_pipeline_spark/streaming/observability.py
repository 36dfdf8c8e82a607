"""Streaming state-store observability (SURVEY §2.13 N216).

At 100 TB the question that kills streaming deployments is not "is the
answer right" but "how big is the state, and is it growing" — a
watermark that never advances, a key-cardinality explosion, or a TTL
that silently stopped evicting all look IDENTICAL in the sink until the
executors OOM. The engine already measures this every micro-batch
(``StreamingQueryProgress.stateOperators``: rows in state, rows
updated/removed, store memory); this module surfaces that feed as a
queryable DataFrame so the health check is one more query in the same
registry, not a side-channel dashboard.

Scale shape: the metrics frame is O(batches x operators) — driver-sized
by construction (it is the engine's own progress telemetry, not data) —
so ``spark.createDataFrame`` over it is exact, not a collect smell.

Determinism contract: row/update counts are exact engine state
(oracle-able against the batch-SQL distinct-key counts); store byte
sizes and eviction timing are provider-dependent (HDFSBackedStateStore
vs RocksDB report different layouts), so bytes appear ONLY in the
``*_full`` frame and are pytest-asserted positive, never oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .windows import (
    LAST_RUN_STATE,
    read_events_stream,
    run_to_memory,
    streaming_dedup,
    tumbling_counts,
)

_FULL_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("num_input_rows", T.LongType(), False),
        T.StructField("operator", T.StringType(), False),
        T.StructField("state_rows", T.LongType(), False),
        T.StructField("rows_updated", T.LongType(), False),
        T.StructField("rows_removed", T.LongType(), False),
        T.StructField("memory_used_bytes", T.LongType(), False),
    ]
)


def state_metrics_frame(
    spark: SparkSession, runs: dict[str, str]
) -> DataFrame:
    """Per-batch per-operator state metrics for already-driven streams.

    ``runs`` maps display name -> ``run_to_memory`` sink name; each
    sink's stashed ``LAST_RUN_STATE`` entries become rows. Raises if a
    named sink has no stash (the stream was never driven) — a metrics
    frame that silently drops a stream is worse than no frame.
    """
    rows = []
    for stream, sink in sorted(runs.items()):
        batches = LAST_RUN_STATE.get(sink)
        # an EMPTY stash ([] — the stream ran but reported no
        # stateOperators) is the same silent-drop as no stash at all:
        # the frame would simply have zero rows for that stream
        if not batches:
            raise ValueError(
                f"no state-metrics stash for sink {sink!r}; drive the "
                "stream with run_to_memory before reading its metrics"
            )
        for b in batches:
            for op in b["operators"]:
                rows.append(
                    (
                        stream,
                        b["batch_id"],
                        b["num_input_rows"],
                        str(op.get("operatorName", "")),
                        int(op.get("numRowsTotal", 0)),
                        int(op.get("numRowsUpdated", 0)),
                        int(op.get("numRowsRemoved", 0)),
                        int(
                            op.get("memoryUsedBytes")
                            or op.get("stateMemory")
                            or 0
                        ),
                    )
                )
    return spark.createDataFrame(rows, _FULL_SCHEMA)


def state_store_metrics_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive the two canonical stateful shapes over the events file
    source and return EVERY reported state metric per batch:

    - ``dedup``: watermarked ``dropDuplicates`` on event_id (the ST2
      exactly-once state) — state rows == distinct keys retained;
    - ``tumbling``: watermarked tumbling-window aggregation in UPDATE
      mode — state rows == open (window, event_type) groups.

    The watermark horizon is wider than the test corpus's time span, so
    nothing evicts and the final-batch state equals the batch-SQL
    distinct counts exactly — which is what makes the deterministic
    projection (``state_store_metrics``) oracle-able. A production
    health check uses the same frame with the real watermark and
    watches ``state_rows`` across batches instead.
    """
    ded = streaming_dedup(
        read_events_stream(spark, sf_dir), watermark="10000 hours"
    ).select("event_id")
    run_to_memory(ded, "state_metrics_dedup_sink", shuffle_partitions=2)
    # over-wide watermark EXPLICITLY (not the 2h default): the oracle
    # contract is "nothing evicts, final state == batch distinct
    # counts", which the default only satisfies while the drive happens
    # to be one micro-batch — multi-batch splits or config drift would
    # evict mid-run (eviction uses the previous batch's watermark).
    # Mirrors the dedup drive above.
    agg = tumbling_counts(
        read_events_stream(spark, sf_dir), watermark="10000 hours"
    )
    run_to_memory(
        agg,
        "state_metrics_tumbling_sink",
        output_mode="update",
        shuffle_partitions=2,
    )
    # merge the two drives' phase durations under the registry query's
    # canonical sink key so the bench floor decomposition sees the
    # combined addBatch instead of falling back to wall time
    from .windows import LAST_RUN_DURATIONS

    merged: dict[str, int] = {}
    for snk in ("state_metrics_dedup_sink", "state_metrics_tumbling_sink"):
        for k, v in (LAST_RUN_DURATIONS.get(snk) or {}).items():
            merged[k] = merged.get(k, 0) + v
    LAST_RUN_DURATIONS["q_stream_state_metrics_sink"] = merged
    return state_metrics_frame(
        spark,
        {
            "dedup": "state_metrics_dedup_sink",
            "tumbling": "state_metrics_tumbling_sink",
        },
    )


def state_store_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic projection of ``state_store_metrics_full``: the
    final data batch's (stream, operator, state_rows, rows_updated) —
    exact engine state, oracle-able as batch-SQL distinct-key counts
    (see q_stream_state_metrics). Byte sizes stay in the full frame."""
    full = state_store_metrics_full(spark, sf_dir)
    # data batches only FIRST, then last-per-stream: if a trailing
    # no-data batch ever slips in (config drift), we fall back to the
    # last real batch instead of returning an empty frame
    w = F.max("batch_id").over(Window.partitionBy("stream"))
    return (
        full.where(F.col("num_input_rows") > 0)
        .withColumn("last_b", w)
        .where(F.col("batch_id") == F.col("last_b"))
        .select("stream", "operator", "state_rows", "rows_updated")
        .orderBy("stream", "operator")
    )
