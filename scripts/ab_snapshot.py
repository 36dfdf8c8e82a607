#!/usr/bin/env python
"""Same-box snapshot A/B: run the CURRENT bench and a PINNED past
snapshot's bench back-to-back on this machine, and compare per-query.

Why this exists: bench totals recorded in different rounds ran on
different host conditions (this box shows 30%+ CPU-steal swings between
whole-suite runs hours apart, and it slows a 32-thread barrier engine
far more than a single-threaded DuckDB process). The only honest
code-regression signal is both code versions measured back-to-back on
the same box — which is exactly what this script produces.

Usage: python scripts/ab_snapshot.py [ref]   (default: the r3 snapshot)
Writes nothing to the repo; prints the comparison.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REF = "9d39bf5"  # round-3 driver snapshot


def run_bench(cwd: str) -> dict:
    subprocess.run(
        [sys.executable, "bench.py"],
        cwd=cwd,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(os.path.join(cwd, "BENCH_QUERIES.json")) as f:
        return json.load(f)


def main() -> None:
    ref = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_REF
    snap = tempfile.mkdtemp(prefix="ab-snap-")
    subprocess.run(
        ["git", "worktree", "add", "--detach", snap, ref],
        cwd=REPO,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        print(f"running snapshot {ref} bench ...", flush=True)
        old = run_bench(snap)
        print("running current bench ...", flush=True)
        new = run_bench(REPO)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", snap],
            cwd=REPO,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    osum = sum(oq[k] for k in common)
    nsum = sum(nq[k] for k in common)
    print(f"\nsnapshot {ref}: total {old['value']}s over {len(oq)} queries")
    print(f"current:        total {new['value']}s over {len(nq)} queries")
    print(
        f"common {len(common)} queries: snapshot {osum:.1f}s vs current "
        f"{nsum:.1f}s ({'-' if nsum < osum else '+'}{abs(nsum - osum):.1f}s)"
    )
    moved = sorted(
        ((k, oq[k], nq[k]) for k in common),
        key=lambda t: -abs(t[2] - t[1]),
    )
    print("largest per-query deltas (snapshot -> current):")
    for k, o, n in moved[:12]:
        print(f"  {k:30s} {o:6.2f} -> {n:6.2f}")


if __name__ == "__main__":
    main()
