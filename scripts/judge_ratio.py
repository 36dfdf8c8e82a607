#!/usr/bin/env python
"""Judge-style bench comparison: time every oracle_sql() in DuckDB at
the bench sf (best-of-2, like bench.py) and compare with the Spark
timings in BENCH_QUERIES.json. Prints per-query ratios (worst first)
and the aggregate ratio the judge reports.

`--interleaved` (VERDICT r11 next #8): instead of comparing TODAY's
DuckDB against a RECORDED Spark run (which inherits whatever box
drift separates the two sessions — this box swings 30%+ between
whole-suite runs hours apart), run BOTH engines per query
back-to-back in one process: Spark best-of-2 under the exact bench
session discipline (bench.prepare_session/time_one), then the DuckDB
oracle best-of-2 immediately after. The printed aggregate is the
drift-free ratio; the naive (recorded-Spark) aggregate prints next to
it when BENCH_QUERIES.json is present, so the drift itself is
visible. Optional query names as positional args restrict the set
(full interleaved suite ~ one bench + one duck pass).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from kommunedata_data_pipeline_spark.schemas import STAR_TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _duck_best2(con, sql: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def _recorded() -> dict:
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "BENCH_QUERIES.json",
            )
        ) as f:
            return json.load(f)["queries"]
    except (OSError, KeyError, json.JSONDecodeError):
        return {}


def interleaved(names: list[str]) -> None:
    import bench

    spark = bench.prepare_session(SF_DIR)
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    queries = entrymod.queries()
    recorded = _recorded()
    pick = names or sorted(n for n in queries if n in oracles)
    rows = []
    for name in pick:
        if name not in oracles or name not in queries:
            print(f"skip {name}: no oracle/query", file=sys.stderr)
            continue
        s_wall, _s_exec = bench.time_one(spark, name, queries[name], SF_DIR)
        d = _duck_best2(con, oracles[name])
        rows.append((name, s_wall, d, recorded.get(name)))
    ok = [r for r in rows if r[1] >= 0]
    tot_s = sum(r[1] for r in ok)
    tot_d = sum(r[2] for r in ok)
    naive = sum(r[3] for r in ok if r[3] is not None and r[3] >= 0)
    ok.sort(key=lambda r: -(r[1] / max(r[2], 1e-9)))
    print(f"{'query':34s} {'spark':>7s} {'duck':>7s} {'ratio':>7s} {'rec.spark':>9s}")
    for name, s_, d, rec in ok:
        rec_s = f"{rec:9.3f}" if rec is not None else "        -"
        print(f"{name:34s} {s_:7.3f} {d:7.3f} {s_ / max(d, 1e-9):7.1f} {rec_s}")
    print(
        f"\nINTERLEAVED aggregate: spark {tot_s:.1f}s vs duckdb "
        f"{tot_d:.1f}s = {tot_s / max(tot_d, 1e-9):.2f}x over "
        f"{len(ok)} queries"
    )
    if naive:
        print(
            f"naive (recorded Spark vs this duck run): {naive:.1f}s / "
            f"{tot_d:.1f}s = {naive / max(tot_d, 1e-9):.2f}x — the "
            "difference is box drift between the recorded session and now"
        )
    spark.stop()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    if "--interleaved" in args:
        args.remove("--interleaved")
        interleaved(args)
        return
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_QUERIES.json")) as f:
        spark_t = json.load(f)["queries"]
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    rows = []
    for name, sql in oracles.items():
        if name not in spark_t or spark_t[name] < 0:
            continue
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows.append((name, spark_t[name], best))
    tot_s = sum(r[1] for r in rows)
    tot_d = sum(r[2] for r in rows)
    rows.sort(key=lambda r: -(r[1] / max(r[2], 1e-9)))
    print(f"{'query':34s} {'spark':>7s} {'duck':>7s} {'ratio':>7s}")
    for name, s, d in rows:
        print(f"{name:34s} {s:7.3f} {d:7.3f} {s / max(d, 1e-9):7.1f}")
    n_out = sum(1 for _, s, d in rows if s > 2 * d)
    print(
        f"\nAGGREGATE spark {tot_s:.1f}s vs duckdb {tot_d:.1f}s = "
        f"{tot_s / tot_d:.2f}x ; outside 2x gate: {n_out}/{len(rows)}"
    )


if __name__ == "__main__":
    main()
