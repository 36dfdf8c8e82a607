#!/usr/bin/env python
"""Time a SUBSET of registered queries under bench.py's exact session +
timing discipline (prepare_session + time_one) — the fast inner loop for
optimization A/Bs. Prints one line per query and a subtotal; writes
nothing to the repo.

Usage: python scripts/bench_subset.py q_name [q_name ...]
       python scripts/bench_subset.py --prefix q_stream
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from bench import prepare_session, time_one  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    qs = entrymod.queries()
    if args and args[0] == "--prefix":
        names = sorted(n for n in qs if n.startswith(args[1]))
    else:
        names = [n for n in args if n in qs]
        unknown = [n for n in args if n not in qs]
        if unknown:
            print(f"unknown: {unknown}", file=sys.stderr)
    spark = prepare_session(sf_dir)
    total = total_exec = 0.0
    for name in names:
        w, e = time_one(spark, name, qs[name], sf_dir)
        total += max(w, 0)
        total_exec += max(e, 0)
        print(f"{name:42s} {w:8.3f}  exec={e:.3f}", flush=True)
    print(f"{'SUBTOTAL':42s} {total:8.3f}  exec={total_exec:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
