"""Structured Streaming operators over the events table (SURVEY §2.10).

The reference's incremental semantics — high-watermark NEW mode (ST1,
scraper_utils.py:72-87), exactly-once landing via anti-join + idempotent
put (ST2, scraper.py:210-222), periodic full re-scan (ST4) — map to:

- ``withWatermark`` + windowed aggregation (tumbling/sliding/session);
- ``dropDuplicates`` under a watermark (streaming dedup);
- ``foreachBatch`` sink that anti-joins each micro-batch against the
  landed keys before appending (the exactly-once upsert);
- ``Trigger.AvailableNow`` ≈ the reference's cron full re-scan.

Tests drive these with the parquet file source + a memory sink and
``processAllAvailable()`` — a real streaming execution, synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (path, mtime)-keyed cache of the one-off schema probe below: the
# probe is a driver-side file listing + parquet footer read (~0.1 s),
# and every streaming query pays it on EVERY construction — 26 times
# per bench run over the same immutable file. The mtime key invalidates
# on testdata regeneration; the cache holds schemas only (no DataFrames,
# nothing session-pinned).
_EVENTS_SCHEMA_CACHE: dict[tuple[str, float], object] = {}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    A file stream needs an explicit schema, but the testdata's physical
    ts type has shipped both as TIMESTAMP(NANOS) (readable only as
    nanos-as-long) and TIMESTAMP(MICROS) without timezone (reads as
    TIMESTAMP_NTZ) — so probe the file with a one-off batch read and
    mirror whatever it reports, then normalize ts to session-zone
    TIMESTAMP exactly like readers.load_table does for the batch path.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = f"{sf_dir}/events.parquet"
    key = (path, os.path.getmtime(path))
    probe = _EVENTS_SCHEMA_CACHE.get(key)
    if probe is None:
        _EVENTS_SCHEMA_CACHE.clear()
        probe = spark.read.parquet(path).schema
        _EVENTS_SCHEMA_CACHE[key] = probe
    raw = (
        spark.readStream.schema(probe)
        .format("parquet")
        .option("path", f"{sf_dir}")
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    ts_type = {f.name: f.dataType.simpleString() for f in probe.fields}.get("ts")
    if ts_type == "bigint":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts with late-data watermark (the streaming twin
    of q_tumbling_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_agg(
    events: DataFrame, gap: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-merged) — the streaming-native
    sessionization (batch twin: q_sessionize's lag+cumsum)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked exactly-once dedup on event_id (ST2 semantics in
    stream form: state for one watermark horizon)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def streaming_dedup_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the TTL'd sibling of
    ``dropDuplicates``: a key's state is dropped once the watermark
    passes its FIRST-SEEN event time + delay, so duplicates are only
    suppressed within the delay window. The difference that matters at
    100 TB: plain streaming dropDuplicates on a non-event-time key set
    keeps state forever (unbounded growth); this variant bounds state
    to one watermark horizon by CONTRACT, accepting re-emission of
    duplicates that arrive later than the delay — the right trade for
    at-least-once upstreams whose redeliveries cluster in time."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_enrich(
    events: DataFrame, dim: DataFrame, on_left: str, on_right: str
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (re-read-per-batch) static dim. The dim is broadcast — at 100 TB the
    stream side never shuffles for the join; only the downstream agg
    keys do."""
    return events.join(F.broadcast(dim), events[on_left] == dim[on_right])


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on key where the right event lands in
    [left_ts, left_ts + max_lag]. Both sides carry watermarks and the
    join has a time-range bound, so Spark can expire join state — the
    requirement for unbounded streams: state per key is limited to the
    watermark horizon instead of growing forever. Key/ts column names
    must be distinct across the two sides.

    ``how='left_outer'`` adds the watermark-driven null emission: an
    unmatched left row is held in state until the watermark proves no
    right row can still match (left_ts + max_lag passes the global
    watermark), THEN emits once with nulls — the hardest stream-join
    semantics (matches emit immediately; non-matches need stream time
    to advance, so a bounded run needs the finalizing no-data batch)."""
    l = left.withWatermark(left_ts, watermark)
    r = right.withWatermark(right_ts, watermark)
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_ts] >= l[left_ts])
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond, how)


def _analyzed_plan(stream_df: DataFrame) -> str:
    try:
        return stream_df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return ""


def _has_watermark(stream_df: DataFrame) -> bool:
    """True if the streaming plan declares an event-time watermark."""
    return "EventTimeWatermark" in _analyzed_plan(stream_df)


def _needs_nodata_finalize(stream_df: DataFrame, output_mode: str) -> bool:
    """True only when the final no-data micro-batch changes WHAT the sink
    receives: an append-mode watermarked AGGREGATION emits a window only
    once a later batch advances the watermark past the window end, so a
    bounded run needs the no-data batch to flush finalized windows.

    Everything else emits its full result in the data batch itself —
    streaming dedup and stream-stream INNER joins output rows as they
    arrive/match (their watermark only bounds state eviction), and
    update/complete modes emit per batch — so for a bounded run the
    no-data batch is pure overhead (~0.3-0.5 s of trigger + WAL + state
    commit) with no semantic effect, and the runner disables it."""
    if output_mode != "append":
        return False
    plan = _analyzed_plan(stream_df)
    # Watermark-finalized append shapes beyond aggregations:
    # TransformWithState event-time timers fire, and outer stream-stream
    # joins emit their null rows, only when a later (possibly no-data)
    # batch advances the watermark past the state's horizon.
    return "EventTimeWatermark" in plan and (
        "Aggregate" in plan
        or "TransformWithState" in plan
        or "Join LeftOuter" in plan
        or "Join RightOuter" in plan
        or "Join FullOuter" in plan
    )


# Per-phase durationMs sums of the most recent bounded run per sink name
# (see the stash in run_to_memory) — consumed by bench.py to split each
# streaming query's wall time into engine execution (addBatch) vs the
# per-query streaming floor (planning, WAL/offset commits, drain waits).
LAST_RUN_DURATIONS: dict[str, dict[str, int]] = {}

# Per-sink state-store metrics from the last run_to_memory drive: for
# each micro-batch that reported stateOperators, one entry of
# (batch_id, num_input_rows, [per-operator metric dicts]). This is the
# engine's own observability feed (StreamingQueryProgress.stateOperators)
# surfaced where library code can reach it after the query stops —
# consumed by streaming.observability.state_store_metrics.
LAST_RUN_STATE: dict[str, list[dict]] = {}


def start_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = 8,
):
    """START a memory-sink streaming query under the run_to_memory
    conf discipline and return ``(query, finalize, ckpt)`` WITHOUT
    draining it — the overlap half of `run_to_memory` (guide §2.6:
    independent jobs in one application run concurrently; a parity
    check that drives two independent streams serially leaves the
    cluster idle for the whole second lifecycle). The session confs
    (shuffle partitions, no-data micro-batches) are set only around
    `.start()`: a streaming query CLONES the session at start, so the
    restore cannot leak into a query that is already running, and two
    starts with different partition counts each keep their own.
    Callers must pass the returned triple to `finish_to_memory`."""
    import os
    import shutil
    import uuid

    spark = stream_df.sparkSession
    part_key = "spark.sql.shuffle.partitions"
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_parts = spark.conf.get(part_key)
    prev_nodata = spark.conf.get(nodata_key, "true")
    finalize = _needs_nodata_finalize(stream_df, output_mode)
    # drop any PREVIOUS run's stash for this sink up front: the stash
    # write below sits in a best-effort try/except, and a failed stash
    # must surface downstream as the "no state-metrics stash" error,
    # never as a silently-served stale run (ADVICE r10)
    LAST_RUN_STATE.pop(name, None)
    LAST_RUN_DURATIONS.pop(name, None)
    if shuffle_partitions is not None:
        spark.conf.set(part_key, str(shuffle_partitions))
    # Only append-mode watermarked aggregations need the trailing
    # no-data micro-batch (it advances the watermark and flushes the
    # finalized windows); for every other shape it is a second full
    # trigger+WAL+state-commit cycle that changes nothing in the sink,
    # so a bounded run turns it off. Unbounded deployments keep the
    # default: there the no-data batch is what bounds state size.
    spark.conf.set(nodata_key, "true" if finalize else "false")
    # Checkpoint (offset log + state store files) on tmpfs when the box
    # has one: a bounded run fsyncs the checkpoint every micro-batch, and
    # that disk latency is pure per-query floor. Real deployments point
    # this at durable storage; the memory-sink runner is test/bench-only.
    ckpt = None
    if os.path.isdir("/dev/shm"):
        ckpt = f"/dev/shm/kommunedata-ckpt-{name}-{uuid.uuid4().hex[:8]}"
    try:
        writer = stream_df.writeStream.outputMode(output_mode).format("memory")
        if ckpt:
            writer = writer.option("checkpointLocation", ckpt)
        q = writer.queryName(name).start()
    except Exception:
        if ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
        raise
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(part_key, prev_parts)
        spark.conf.set(nodata_key, prev_nodata)
    return q, finalize, ckpt


def finish_to_memory(q, name: str, finalize: bool, ckpt: str | None):
    """Drain, stash and stop a query started by `start_to_memory` —
    the second half of `run_to_memory`'s body, verbatim."""
    import shutil

    try:
        q.processAllAvailable()
        # The watermark-advancing no-data batch commits asynchronously
        # and can race with stop(). Wait for a zero-input batch that
        # lands AFTER at least one data batch — an initial empty trigger
        # (fired before the source listed the file) also has
        # numInputRows == 0 and must not satisfy the wait.
        if finalize:
            import json as _json
            import time

            def _saw_final_no_data_batch() -> bool:
                seen_data = False
                for p in q.recentProgress:
                    d = _json.loads(p.json) if hasattr(p, "json") else p
                    rows = d.get("numInputRows", -1)
                    if rows > 0:
                        seen_data = True
                    elif rows == 0 and seen_data:
                        return True
                return False

            deadline = time.time() + 30
            while not _saw_final_no_data_batch() and time.time() < deadline:
                time.sleep(0.05)
                q.processAllAvailable()
        # stash per-phase durations for the bench's floor decomposition
        # (streaming jobs run on their own thread, so the bench's
        # job-group tagging can't see them): sum each durationMs phase
        # across micro-batches, keyed by sink name, BEFORE stop() drops
        # the progress buffer.
        try:
            import json as _json2

            phases: dict[str, int] = {}
            state_batches: list[dict] = []
            for p in q.recentProgress:
                d = _json2.loads(p.json) if hasattr(p, "json") else p
                for k, v in (d.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0) + int(v)
                if d.get("stateOperators"):
                    state_batches.append(
                        {
                            "batch_id": int(d.get("batchId", -1)),
                            "num_input_rows": int(d.get("numInputRows", 0)),
                            "operators": d["stateOperators"],
                        }
                    )
            LAST_RUN_DURATIONS[name] = phases
            LAST_RUN_STATE[name] = state_batches
        except Exception:
            pass
        q.stop()
    finally:
        if ckpt:
            shutil.rmtree(ckpt, ignore_errors=True)
    return q


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    output_mode: str = "append",
    shuffle_partitions: int | None = 8,
):
    """Drive a streaming query to completion against the available data
    (real streaming execution, synchronous): memory sink +
    processAllAvailable; returns the stopped query. Results:
    ``spark.sql(f"SELECT * FROM {name}")``.

    ``shuffle_partitions`` is scoped to the query start: a stateful
    streaming op creates ONE state store instance per shuffle partition,
    and that count is fixed at the first checkpoint forever — under the
    driver's shuffle.partitions=200 session every micro-batch would pay
    200 state-store tasks for a 15-key stream. Measured on the test
    corpus (tmpfs checkpoints): per-partition state-store task overhead
    dominates down to 2 partitions for JVM-stateful ops (window aggs,
    stream-stream join; 4→2 saved ~0.35 s/query, 2→1 noise), while
    Arrow/Pandas-stateful ops want 8+ (the Python worker pool is the
    scarce resource, not store commits). A real deployment sizes it to
    key cardinality × executor count once, up front. None = inherit
    the session conf.

    Composed from `start_to_memory` + `finish_to_memory` so that
    callers with several INDEPENDENT streams can start them all and
    drain them together instead of paying serial lifecycles."""
    q, finalize, ckpt = start_to_memory(
        stream_df, name, output_mode, shuffle_partitions
    )
    return finish_to_memory(q, name, finalize, ckpt)


def foreach_batch_idempotent_sink(
    stream_df: DataFrame, out_path: str, keys: list[str]
):
    """ST2 — exactly-once landing: every micro-batch is anti-joined
    against the already-landed keys before an append-mode write (the
    reference's head_object-then-put, scraper_utils.py:56-70, as one
    batch-level set operation). Re-delivered rows land zero times."""

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from ..sources.sinks import load_catalog

        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(keys)
        # load_catalog narrows to path-not-found only; a transient read
        # error propagates instead of silently re-appending landed rows
        existing = load_catalog(spark, out_path, keys)
        if existing is not None:
            fresh = fresh.join(existing, keys, "left_anti")
        fresh.write.mode("append").parquet(out_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", out_path + "_chk")
        .trigger(availableNow=True)
    )
