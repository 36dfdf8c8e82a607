#!/usr/bin/env python
"""Interleaved A/B tuner for the transformWithState bench floor.

Runs q_stream_tws / q_stream_tws_topk through the REAL bench path
(build + run_to_memory + noop write) under candidate conf variants,
alternating variants round-robin so box noise hits all variants
equally. Usage:

    python scripts/tws_tune.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m
    from kommunedata_data_pipeline_spark.streaming import stateful as st

    # bench-style warm-up (class loading off the clock)
    from kommunedata_data_pipeline_spark.streaming.stateful import (
        enable_tws_workers,
        rocksdb_state_store,
        user_value_stats_tws,
    )
    from kommunedata_data_pipeline_spark.streaming.windows import run_to_memory
    import shutil
    import tempfile

    enable_tws_workers(spark)
    warm = tempfile.mkdtemp(prefix="tws-tune-", dir="/dev/shm")
    try:
        spark.createDataFrame(
            [(1, 1.0)], "user_id long, value double"
        ).coalesce(1).write.mode("overwrite").parquet(warm)
        with rocksdb_state_store(spark):
            s = user_value_stats_tws(
                spark.readStream.schema("user_id long, value double").parquet(warm)
            )
            run_to_memory(s, "tws_tune_warm", output_mode="update", shuffle_partitions=1)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    qs = m.queries()
    variants = {
        "base": {},
        "parts16": {"KDP_TWS_PARTS": "16"},
        "parts32": {"KDP_TWS_PARTS": "32"},
        "changelog": {
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true"
        },
        "parts16+cl": {
            "KDP_TWS_PARTS": "16",
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        },
    }
    results: dict[str, dict[str, list[float]]] = {
        v: {"q_stream_tws": [], "q_stream_tws_topk": []} for v in variants
    }
    for r in range(rounds):
        for vname, confs in variants.items():
            env_parts = confs.get("KDP_TWS_PARTS")
            sparkconfs = {k: v for k, v in confs.items() if k.startswith("spark.")}
            for k, v in sparkconfs.items():
                spark.conf.set(k, v)
            if env_parts:
                os.environ["KDP_TWS_PARTS"] = env_parts
            else:
                os.environ.pop("KDP_TWS_PARTS", None)
            try:
                for q in ("q_stream_tws", "q_stream_tws_topk"):
                    t0 = time.perf_counter()
                    df = qs[q](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    results[vname][q].append(time.perf_counter() - t0)
            finally:
                for k in sparkconfs:
                    spark.conf.unset(k)
        print(f"-- round {r} done", file=sys.stderr)
    for vname, qres in results.items():
        for q, ts in qres.items():
            ts_s = " ".join(f"{t:.2f}" for t in ts)
            print(f"{vname:12s} {q:18s} min={min(ts):5.2f}s  [{ts_s}]")


if __name__ == "__main__":
    main()
