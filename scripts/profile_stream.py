#!/usr/bin/env python
"""One-off profiler for the streaming bench floor: bench-style timing
(build + execute + count) per streaming query through the REAL
run_to_memory path. Usage:

    python scripts/profile_stream.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "q_stream_tumbling",
        "q_stream_sliding",
        "q_stream_session",
        "q_stream_dedup",
        "q_stream_join",
        "q_stream_stateful",
        "q_stream_enrich",
    ]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as m

    qs = m.queries()
    for name in names:
        times = []
        n = -1
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()
            times.append(time.perf_counter() - t0)
        print(
            f"{name:22s} min={min(times):6.3f}s rows={n:6d} "
            f"runs={[round(t, 3) for t in times]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
