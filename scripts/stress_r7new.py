#!/usr/bin/env python
"""Scaling rows for the round-7 operator additions: PQ ADC top-k (the
new embedding-side family), DSIR selection and bigram surprisal (the
new token-stream families). Same structure-preserving multiplication
discipline as scripts/stress.py (token-prefix per copy for documents;
id-offset copies for embeddings — ADC/selection cost is linear in rows
by design, so identical vector copies are the honest scenario), same
per-multiple wall-time table. APPENDS a "## Round-7 additions" section
to SCALING.md — run AFTER scripts/stress.py, never instead of it.

Usage: python scripts/stress_r7new.py [max_multiple] (default 64).
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


def multiply_embeddings(e: DataFrame, m: int) -> DataFrame:
    if m == 1:
        return e
    copies = e.crossJoin(
        F.broadcast(e.sparkSession.range(m).select(F.col("id").alias("copy")))
    )
    return copies.select(
        (F.col("vec_id") * m + F.col("copy")).alias("vec_id"),
        "embedding",
        "label",
    )


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    multiples = [m for m in (1, 4, 16, 64) if m <= max_m]
    spark = get_spark(app_name="kommunedata-stress-r7")

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    def pq_op(e: DataFrame):
        from kommunedata_data_pipeline_spark.operators.similarity import (
            pq_adc_topk,
        )

        qs = e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        return pq_adc_topk(e, qs, m=4, k_codes=16, d_sub=16, k=5)

    def dsir_op(d: DataFrame):
        from kommunedata_data_pipeline_spark.operators.corpus import dsir_select

        return dsir_select(
            d, target_pred=(F.col("lang") == "en"), n_buckets=64, top_n=100
        )

    def bigram_op(d: DataFrame):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            bigram_surprisal,
        )

        return bigram_surprisal(d)

    rows: list[tuple[str, int, int, float]] = []
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        em = multiply_embeddings(emb, m).localCheckpoint(eager=True)
        for name, fn, src in (
            ("pq_adc_topk", pq_op, em),
            ("dsir_select", dsir_op, dm),
            ("bigram_surprisal", bigram_op, dm),
        ):
            t0 = time.monotonic()
            n = fn(src).count()
            dt = time.monotonic() - t0
            rows.append((name, m, n, dt))
            print(f"{name} x{m}: {n} rows, {dt:.2f}s", flush=True)
        dm.unpersist()
        em.unpersist()

    base = {name: next(t for n2, mm, _, t in rows if n2 == name and mm == 1) for name in {r[0] for r in rows}}
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out, "a") as f:
        f.write("\n## Round-7 additions (appended by scripts/stress_r7new.py)\n\n")
        f.write(
            "Same discipline as the main table: structure-preserving "
            "multiples of sf0.1, wall seconds, growth = time vs 1x "
            "(sub-linear per unit = the plan holds).\n\n"
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
