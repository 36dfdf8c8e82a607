#!/usr/bin/env python
"""Dump `.explain("formatted")` for named registered queries to
plans/<tag>/<query>_<suffix>.txt — the optimization round's before/after
plan evidence. Batch queries dump the actual computed plan; streaming
queries (which execute inside their builder) dump the plan of the
returned result frame plus, where the builder exposes one, the stashed
per-run phase durations.

Usage: python scripts/capture_plans.py <suffix> <query> [query ...]
       (suffix: "before" | "after"; plans land in plans/r12/)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "plans", os.environ.get("KDP_PLANS_TAG", "r13"))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    import __spark_entry__ as entrymod
    from kommunedata_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-plans")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
