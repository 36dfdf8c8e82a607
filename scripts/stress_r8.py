#!/usr/bin/env python
"""Scaling rows for the round-8 operators: applied entity resolution
(deletion join + CC), leakage-safe splits and label propagation (LSH
pairs + CC / vote rounds), k-center and matryoshka retrieval
(embedding scans), snake shard packing (ranged rank), and binary media
dedup (blob synth + digest aggregate). Structure-preserving
multiplication discipline of scripts/stress.py; APPENDS a section to
SCALING.md.

Customer rows multiply with a DOUBLED copy key prefix (c{K}{K}_...):
any two copies' names differ in >=2 positions, so no cross-copy lev<=1
pairs exist and the true ER pair count stays linear in the multiple —
the same structure-preservation lesson as the embedding sign patterns
(identical-copy multiplication would make every exact pair-lister go
quadratic and measure the data, not the plan).

Usage: python scripts/stress_r8.py [max_multiple] [op ...] (default 64).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ),
)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kommunedata_data_pipeline_spark.session import get_spark  # noqa: E402
from kommunedata_data_pipeline_spark.sources.readers import load_table  # noqa: E402
from stress import multiply_documents  # noqa: E402
from stress_semdedup import multiply_embeddings  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def multiply_customers(c: DataFrame, m: int) -> DataFrame:
    """m copies with pairwise-lev>=2 name prefixes (doubled copy key)."""
    if m == 1:
        return c
    copies = c.crossJoin(
        F.broadcast(c.sparkSession.range(m).select(F.col("id").alias("copy")))
    )
    k = F.col("copy").cast("string")
    return copies.select(
        (F.col("c_custkey") * m + F.col("copy")).alias("c_custkey"),
        F.concat(F.lit("c"), k, k, F.lit("_"), F.col("c_name")).alias(
            "c_name"
        ),
        "c_nationkey",
        "c_acctbal",
        "c_mktsegment",
    )


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = set(sys.argv[2:])
    multiples = [m for m in (1, 4, 16, 64) if m <= max_m]
    spark = get_spark(app_name="kommunedata-stress-r8")

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    cust = load_table(spark, SF_DIR, "customer")

    def er_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.dedup import er_clusters

        return er_clusters(
            c, "c_custkey", "c_name",
            agree_cols=("c_mktsegment", "c_nationkey"),
        )

    def leakproof_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )
        from kommunedata_data_pipeline_spark.operators.sampling import (
            leakproof_split,
        )

        return leakproof_split(d, minhash_lsh_pairs(d, 3, 16, 4, 0.5))

    def labelprop_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
        )
        from kommunedata_data_pipeline_spark.operators.graph import (
            label_propagation,
        )

        nodes = d.select(
            "doc_id",
            F.when(F.col("doc_id") % 3 == 0, F.col("lang")).alias(
                "seed_label"
            ),
        )
        return label_propagation(nodes, minhash_lsh_pairs(d, 3, 16, 4, 0.5), 2)

    def kcenter_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.similarity import (
            kcenter_coreset,
        )

        return kcenter_coreset(e, k=5)

    def matryoshka_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.similarity import (
            matryoshka_rerank,
        )

        qs = e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        return matryoshka_rerank(e, qs, prefix_dims=16, shortlist=20, k=5)

    def shard_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.sampling import (
            shard_balance,
        )

        return shard_balance(d, n_shards=8)

    def media_op(d, e, c):
        from kommunedata_data_pipeline_spark.transforms.multimodal import (
            media_dedup_stats,
        )

        return media_dedup_stats(d)


    def mmr_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.similarity import (
            mmr_rerank,
        )

        qs = e.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        return mmr_rerank(e, qs, lam=0.7, shortlist=20, k=5)

    def langid_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            ngram_lang_id,
        )

        return ngram_lang_id(d, F.col("doc_id") % 3 == 0)

    def ccupd_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            cc_index_update,
            dup_clusters,
            minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(d, 3, 16, 4, 0.5).select(
            "doc_a", "doc_b"
        ).localCheckpoint(eager=False)
        old = (F.col("doc_a") % 10 < 8) & (F.col("doc_b") % 10 < 8)
        stored = dup_clusters(pairs.where(old))
        return cc_index_update(stored, pairs.where(~old))

    def tfidfknn_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.retrieval import (
            tfidf_knn,
        )

        return tfidf_knn(d, F.col("doc_id") < 8, k=5, df_cap=None)

    def golden_op(d, e, c):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            golden_records,
        )

        return golden_records(
            c, "c_custkey", "c_name",
            agree_cols=("c_mktsegment", "c_nationkey"),
            value_cols=("c_acctbal",),
        )

    ops = (
        ("er_clusters", er_op),
        ("leakproof_split", leakproof_op),
        ("label_propagation", labelprop_op),
        ("kcenter_coreset", kcenter_op),
        ("matryoshka_rerank", matryoshka_op),
        ("shard_balance", shard_op),
        ("media_dedup", media_op),
        ("mmr_rerank", mmr_op),
        ("ngram_lang_id", langid_op),
        ("cc_index_update", ccupd_op),
        ("tfidf_knn", tfidfknn_op),
        ("golden_record", golden_op),
    )

    rows: list[tuple[str, int, int, float]] = []
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        em = multiply_embeddings(emb, m).localCheckpoint(eager=True)
        cm = multiply_customers(cust, m).localCheckpoint(eager=True)
        for name, fn in ops:
            if only and name not in only:
                continue
            t0 = time.monotonic()
            n = fn(dm, em, cm).count()
            dt = time.monotonic() - t0
            rows.append((name, m, n, dt))
            print(f"{name} x{m}: {n} rows, {dt:.2f}s", flush=True)
        dm.unpersist()
        em.unpersist()
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
            "\n## Round-8 operators (appended by scripts/stress_r8.py)\n\n"
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
