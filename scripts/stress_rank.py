#!/usr/bin/env python
"""Scaling rows for the two-phase bucket-offset GLOBAL RANK pattern the
round-7 close operators share (token_budget_select, curriculum_schedule,
sorted_neighborhood_pairs): per-bucket counts → tiny bucket-prefix
window → PARTITIONED per-row window + offset, replacing the single-task
global window. Structure-preserving multiples of sf0.1; APPENDS a
section to SCALING.md.

Usage: python scripts/stress_rank.py [max_multiple] (default 64).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kommunedata_data_pipeline_spark.session import get_spark  # noqa: E402
from kommunedata_data_pipeline_spark.sources.readers import load_table  # noqa: E402
from stress import multiply_documents  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def multiply_customers(c: DataFrame, m: int) -> DataFrame:
    """Copy-prefixed names keep sort neighborhoods copy-local (the honest
    corpus-growth scenario for a sort-order operator)."""
    if m == 1:
        return c
    copies = c.crossJoin(
        F.broadcast(c.sparkSession.range(m).select(F.col("id").alias("copy")))
    )
    return copies.select(
        (F.col("c_custkey") * m + F.col("copy")).alias("c_custkey"),
        F.concat(F.format_string("c%04d_", F.col("copy")), F.col("c_name")).alias(
            "c_name"
        ),
    )


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    multiples = [m for m in (1, 4, 16, 64) if m <= max_m]
    spark = get_spark(app_name="kommunedata-stress-rank")

    docs = load_table(spark, SF_DIR, "documents")
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")

    def budget_op(d: DataFrame, _c: DataFrame):
        from kommunedata_data_pipeline_spark.operators.sampling import (
            token_budget_select,
        )

        # budget scales with the corpus so the kept set stays ~proportional
        return token_budget_select(d, budget=6000 * 10)

    def curriculum_op(d: DataFrame, _c: DataFrame):
        from kommunedata_data_pipeline_spark.operators.sampling import (
            curriculum_schedule,
        )

        return curriculum_schedule(d, n_tiles=4)

    def blocking_op(_d: DataFrame, c: DataFrame):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        return sorted_neighborhood_pairs(c, "c_custkey", "c_name", window=10)

    rows: list[tuple[str, int, int, float]] = []
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        cm = multiply_customers(cust, m).localCheckpoint(eager=True)
        for name, fn in (
            ("token_budget_select", budget_op),
            ("curriculum_schedule", curriculum_op),
            ("sorted_neighborhood", blocking_op),
        ):
            t0 = time.monotonic()
            n = fn(dm, cm).count()
            dt = time.monotonic() - t0
            rows.append((name, m, n, dt))
            print(f"{name} x{m}: {n} rows, {dt:.2f}s", flush=True)
        dm.unpersist()
        cm.unpersist()

    base = {
        name: next(t for n2, mm, _, t in rows if n2 == name and mm == 1)
        for name in {r[0] for r in rows}
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    with open(out, "a") as f:
        f.write(
            "\n## Bucket-offset rank pattern (appended by "
            "scripts/stress_rank.py)\n\n"
        )
        f.write(
            "The two-phase global-rank plan shared by the round-7 close "
            "operators (per-bucket counts -> tiny bucket prefix -> "
            "partitioned per-row window + offset; no single-task global "
            "window). Structure-preserving multiples of sf0.1.\n\n"
        )
        f.write("| operator | multiple | rows out | wall s | growth vs 1x |\n")
        f.write("|---|---|---|---|---|\n")
        for name, m, n, dt in rows:
            f.write(
                f"| {name} | {m}x | {n} | {dt:.2f} | "
                f"{dt / base[name]:.1f}x |\n"
            )
    print(f"appended to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
