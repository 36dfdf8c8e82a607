#!/usr/bin/env python
"""Driver-rehearsal: run queries() vs oracle_sql() the way the driver does
(vanilla session, shuffle.partitions=200, sf0.01 by default, dtype-tagged
value comparison), so driver-only failures reproduce before submission.

Usage: python scripts/rehearse.py [name_substring ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from kommunedata_data_pipeline_spark.schemas import STAR_TABLES  # noqa: E402
from test_oracle import _canon  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Non-vacuousness gate (tfidf_knn lesson, r8): a 0-row green is a
# silent semantic miss — an operator whose candidate generation quietly
# empties out (an over-tight df-cap, a wrong band key) hashes equal to
# its equally-empty oracle. Every registered query must return >0 rows
# at sf0.01 unless DELIBERATELY empty and allowlisted here with the
# reason stated.
EMPTY_OK = {
    # (none today — every registered query returns rows at sf0.01)
}


def main() -> None:
    filters = sys.argv[1:]
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("rehearse")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # deliberately NOT setting shuffle.partitions: the driver session
        # runs the Spark default (200) — rehearse under the same plans
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    oracles = entrymod.oracle_sql()
    n_fail = 0
    t_all = time.perf_counter()
    for name, fn in entrymod.queries().items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.perf_counter()
        try:
            spark_pd = fn(spark, SF_DIR).toPandas()
            if name not in oracles:
                vac = "" if (len(spark_pd) > 0 or name in EMPTY_OK) \
                    else " VACUOUS(0 rows)"
                if vac:
                    n_fail += 1
                print(f"  {name}: rows-only ({len(spark_pd)} rows){vac} "
                      f"[{time.perf_counter()-t0:.1f}s]")
                continue
            duck_pd = con.execute(oracles[name]).df()
            ok_rows = len(spark_pd) == len(duck_pd)
            ok_cols = sorted(spark_pd.columns) == sorted(duck_pd.columns)
            ok_vals = ok_rows and ok_cols and _canon(spark_pd) == _canon(duck_pd)
            ok_nonvac = len(spark_pd) > 0 or name in EMPTY_OK
            status = "OK" if (
                ok_rows and ok_cols and ok_vals and ok_nonvac
            ) else (
                f"FAIL rows={ok_rows} cols={ok_cols} vals={ok_vals}"
                + ("" if ok_nonvac else " VACUOUS(0 rows)")
            )
        except Exception as exc:  # surface, keep going
            status = f"ERROR {type(exc).__name__}: {exc}"[:200]
        dt_q = time.perf_counter() - t0
        if status != "OK":
            n_fail += 1
        print(f"  {name}: {status} [{dt_q:.1f}s]")
    print(f"total {time.perf_counter()-t_all:.0f}s, failures: {n_fail}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
