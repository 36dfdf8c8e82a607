#!/usr/bin/env python
"""Stage-level metric dump for ONE registered query under the bench
session: per stage — duration, task count, input/shuffle bytes, and the
first line of its name. Finds where a multi-stage job's time actually
goes (the job-level timeline can't).

Usage: python scripts/stage_metrics.py q_name [sf_dir]
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
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    store = spark.sparkContext._jsc.sc().statusStore()
    seen = {s.stageId() for s in _stages(store)}
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    time.sleep(0.3)
    rows = []
    for s in _stages(store):
        if s.stageId() in seen:
            continue
        sub = s.submissionTime()
        comp = s.completionTime()
        if not (sub.isDefined() and comp.isDefined()):
            continue
        dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        rows.append(
            (
                sub.get().getTime(),
                s.stageId(),
                dur,
                s.numCompleteTasks(),
                s.inputBytes(),
                s.shuffleReadBytes(),
                s.shuffleWriteBytes(),
                (s.name() or "").split("\n")[0][:80],
            )
        )
    rows.sort()
    print(f"{qname}: {wall:.2f}s wall, {len(rows)} stages")
    for _t, sid, dur, nt, ib, srb, swb, name in rows:
        print(
            f"  stage {sid:4d} {dur:7.3f}s tasks={nt:3d} "
            f"in={ib/1e6:7.1f}MB sr={srb/1e6:6.1f}MB sw={swb/1e6:6.1f}MB  "
            f"{name}"
        )


def _stages(store):
    from pyspark import SparkContext

    jvm = SparkContext._jvm
    gw = SparkContext._gateway
    lst = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    return [lst.apply(i) for i in range(lst.size())]


if __name__ == "__main__":
    main()
