#!/usr/bin/env python
"""Scaling rows for the round-7 close additions: CDC chunk dedup (the
chunk-stream explode + content-keyed aggregate), directed shingle
containment (the df-capped pair join — the quadratic-risk shape), and
the dedup-tier Venn (three composed LSH families). Same
structure-preserving multiplication discipline as scripts/stress.py;
APPENDS a section to SCALING.md — run AFTER the main battery.

Usage: python scripts/stress_close.py [max_multiple] (default 64).
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
from stress_semdedup import multiply_embeddings  # noqa: E402

# NOTE: embeddings multiply with the STRUCTURE-PRESERVING scheme
# (copy-keyed sign patterns: within-copy cosines exact, cross-copy ~0)
# — identical-copy multiplication makes the TRUE semantic pair count
# quadratic in m (every vector gains m-1 exact duplicates), so any
# exact pair-listing operator must do quadratic work on it; that
# measures the test data, not the plan. First run of this script did
# exactly that (dedup_tier_venn 246x at 64x) — kept in SCALING.md as
# the worked example of the distinction.

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = set(sys.argv[2:])  # optional operator-name filter
    multiples = [m for m in (1, 4, 16, 64) if m <= max_m]
    spark = get_spark(app_name="kommunedata-stress-close")

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    def cdc_op(d: DataFrame, _e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            cdc_dedup_stats,
        )

        return cdc_dedup_stats(d)

    def containment_op(d: DataFrame, _e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            shingle_containment_pairs,
        )

        return shingle_containment_pairs(d, k=3, threshold=0.8, df_cap=50)

    def venn_op(d: DataFrame, e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            dedup_tier_venn,
        )

        return dedup_tier_venn(d, e)

    def winnowing_op(d: DataFrame, _e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            winnowing_overlap_pairs,
        )

        return winnowing_overlap_pairs(d, w=4, window=5, min_shared=3)

    def surprisal_gate_op(d: DataFrame, _e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            surprisal_gate,
        )

        return surprisal_gate(d)

    rows: list[tuple[str, int, int, float]] = []
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        em = multiply_embeddings(emb, m).localCheckpoint(eager=True)
        for name, fn in (
            ("cdc_dedup", cdc_op),
            ("containment_pairs", containment_op),
            ("dedup_tier_venn", venn_op),
            ("winnowing_overlap", winnowing_op),
            ("surprisal_gate", surprisal_gate_op),
        ):
            if only and name not in only:
                continue
            t0 = time.monotonic()
            n = fn(dm, em).count()
            dt = time.monotonic() - t0
            rows.append((name, m, n, dt))
            print(f"{name} x{m}: {n} rows, {dt:.2f}s", flush=True)
        dm.unpersist()
        em.unpersist()

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
            "\n## Round-7 close additions (appended by "
            "scripts/stress_close.py)\n\n"
        )
        f.write(
            "| operator | multiple | rows out | wall s | growth vs 1x |\n"
        )
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
