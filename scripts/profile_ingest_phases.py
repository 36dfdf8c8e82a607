#!/usr/bin/env python
"""Per-phase profiler for the ingest family's foreachBatch body: wraps
the module-level helpers of streaming.ingest (late-bound from module
globals, so monkeypatching works) with cumulative timers and runs one
ingest query end-to-end. Prints seconds per phase — the ground truth
for deciding which fixed per-batch cost to cut (VERDICT r11 next #1).

Usage: python scripts/profile_ingest_phases.py [sf_dir] [query]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qname = sys.argv[2] if len(sys.argv) > 2 else "q_stream_ingest_dedup"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from kommunedata_data_pipeline_spark.sources import zones
    from kommunedata_data_pipeline_spark.streaming import ingest

    acc: dict[str, list] = {}

    def timed(mod, name):
        fn = getattr(mod, name)
        slot = acc.setdefault(name, [0.0, 0])

        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                slot[0] += time.perf_counter() - t0
                slot[1] += 1

        setattr(mod, name, wrap)

    for nm in (
        "_key_set_probe",
        "_append_delta",
        "_batch_id_range",
        "_load_catalog_pruned",
        "_load_band_index",
        "_load_index",
        "_worth_pruning",
        "maybe_compact",
        "record_zone_ranges",
        "new_files_since",
        "list_parquet_files",
    ):
        if hasattr(ingest, nm):
            timed(ingest, nm)
    for nm in ("select_pruned_files", "update_zones"):
        timed(zones, nm)

    import __spark_entry__ as m

    q = m.queries()[qname]
    t0 = time.perf_counter()
    rows = q(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    print(f"{qname}: {wall:.2f}s wall, {rows} rows")
    # note: phases nest (_load_band_index calls _load_index etc.) —
    # read children as parts of parents, not additive
    for nm, (sec, n) in sorted(acc.items(), key=lambda kv: -kv[1][0]):
        print(f"  {nm:24s} {sec:7.3f}s  x{n}")


if __name__ == "__main__":
    main()
