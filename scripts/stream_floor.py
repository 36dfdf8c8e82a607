#!/usr/bin/env python
"""Phase decomposition of the streaming bench floor (VERDICT r6 #7):
time each component of one bounded stream run — DataFrame build,
query.start(), processAllAvailable(), the append-mode finalize wait,
and stop() — for a representative streaming shape at each knob setting,
so the remaining per-query wall can be attributed (and either shaved or
rebutted with numbers).

Usage: python scripts/stream_floor.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def timed_run(spark, stream_df, name, output_mode, finalize, parts):
    """run_to_memory's exact sequence, with per-phase timers."""
    import json as _json
    import shutil
    import uuid

    part_key = "spark.sql.shuffle.partitions"
    nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev_parts = spark.conf.get(part_key)
    prev_nodata = spark.conf.get(nodata_key, "true")
    spark.conf.set(part_key, str(parts))
    spark.conf.set(nodata_key, "true" if finalize else "false")
    ckpt = f"/dev/shm/kdp-floor-{name}-{uuid.uuid4().hex[:8]}"
    phases = {}
    try:
        t0 = time.perf_counter()
        writer = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .option("checkpointLocation", ckpt)
            .queryName(name)
        )
        q = writer.start()
        phases["start"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        q.processAllAvailable()
        phases["process"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        if finalize:
            def _saw_final() -> bool:
                seen = False
                for p in q.recentProgress:
                    d = _json.loads(p.json) if hasattr(p, "json") else p
                    rows = d.get("numInputRows", -1)
                    if rows > 0:
                        seen = True
                    elif rows == 0 and seen:
                        return True
                return False

            deadline = time.time() + 30
            while not _saw_final() and time.time() < deadline:
                time.sleep(0.05)
                q.processAllAvailable()
        phases["finalize_wait"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        q.stop()
        phases["stop"] = time.perf_counter() - t0
    finally:
        spark.conf.set(part_key, prev_parts)
        spark.conf.set(nodata_key, prev_nodata)
        shutil.rmtree(ckpt, ignore_errors=True)
    return phases


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from kommunedata_data_pipeline_spark.streaming.windows import (
        read_events_stream,
        streaming_dedup,
        tumbling_counts,
    )

    shapes = [
        # (label, df builder, output_mode, finalize)
        ("tumbling_append", lambda: tumbling_counts(read_events_stream(spark, sf_dir)), "append", True),
        ("dedup_append", lambda: streaming_dedup(read_events_stream(spark, sf_dir)), "append", False),
    ]
    for label, build, mode, finalize in shapes:
        for attempt in range(3):
            t0 = time.perf_counter()
            df = build()
            t_build = time.perf_counter() - t0
            ph = timed_run(
                spark, df, f"floor_{label}_{attempt}", mode, finalize, 2
            )
            total = t_build + sum(ph.values())
            parts = " ".join(f"{k}={v:.3f}" for k, v in ph.items())
            print(
                f"{label:18s} a{attempt} build={t_build:.3f} {parts} "
                f"total={total:.3f}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
