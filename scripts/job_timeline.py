#!/usr/bin/env python
"""Job-timeline dump for ONE registered query: run it under the bench
session shape, then print every Spark job (submit time, duration,
description/first-stage name) in order plus the GAPS between jobs —
the driver-side time (plan building, py4j, file listings) that per-job
metrics never show. The ground truth for 'which per-batch fixed cost
dominates' questions on the foreachBatch ingest family.

Usage: python scripts/job_timeline.py q_name [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import prepare_session  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = prepare_session(sf_dir)
    fn = entrymod.queries()[qname]
    # warm attempt (mirrors bench best-of-2), then the measured one
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    store = spark.sparkContext._jsc.sc().statusStore()
    jobs0 = store.jobsList(None)
    seen = {jobs0.apply(i).jobId() for i in range(jobs0.size())}
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(0.3)  # listener bus drain
    jobs = store.jobsList(None)
    rows = []
    for i in range(jobs.size()):
        j = jobs.apply(i)
        if j.jobId() in seen:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        s = sub.get().getTime()
        e = comp.get().getTime()
        desc = j.name() or ""
        rows.append((s, e, j.jobId(), desc[:110]))
    rows.sort()
    print(f"{qname}: {wall:.2f}s wall, {len(rows)} jobs")
    prev_e = None
    gap_total = 0.0
    job_total = 0.0
    for s, e, jid, desc in rows:
        gap = (s - prev_e) / 1000.0 if prev_e is not None else 0.0
        if prev_e is not None:
            gap_total += max(gap, 0.0)
        job_total += (e - s) / 1000.0
        mark = f"  GAP {gap:6.3f}s" if gap > 0.05 else ""
        print(f"  job {jid:4d} {(e - s) / 1000.0:7.3f}s{mark}  {desc}")
        prev_e = max(prev_e, e) if prev_e is not None else e
    print(
        f"  jobs total {job_total:.2f}s, inter-job gaps {gap_total:.2f}s, "
        f"wall {wall:.2f}s"
    )


if __name__ == "__main__":
    main()
