#!/usr/bin/env python
"""Empirical scaling validation: run the scale-critical operators at
1x / 4x / 16x synthetic multiples of the sf0.1 corpus and record wall
time, verifying the plans behave sub-quadratically in practice — the
measured counterpart to the plan audits in tests/test_plans.py.

Corpus multiplication preserves structure instead of duplicating it:
each copy's tokens are prefixed with the copy index (disjoint shingle
universes), so near-dup clusters stay copy-local and candidate-pair
counts scale linearly with corpus size — the honest scaling scenario.
Events are shifted in time per copy, keeping event density constant.

Writes SCALING.md at the repo root. Usage: python scripts/stress.py
[max_multiple] (default 16).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kommunedata_data_pipeline_spark.session import get_spark  # noqa: E402
from kommunedata_data_pipeline_spark.sources.readers import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def multiply_documents(d: DataFrame, m: int) -> DataFrame:
    """m structure-preserving copies: token-prefix per copy keeps each
    copy's shingle universe disjoint (no cross-copy near-dups)."""
    if m == 1:
        return d
    copies = d.crossJoin(
        F.broadcast(
            d.sparkSession.range(m).select(F.col("id").alias("copy"))
        )
    )
    return copies.select(
        (F.col("doc_id") * m + F.col("copy")).alias("doc_id"),
        F.regexp_replace(
            F.col("text"),
            r"(\S+)",
            F.concat(F.lit("c"), F.col("copy").cast("string"), F.lit("_$1")),
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )


def multiply_events(e: DataFrame, m: int) -> DataFrame:
    """m copies shifted by 90 days each — density constant, span grows."""
    if m == 1:
        return e
    copies = e.crossJoin(
        F.broadcast(
            e.sparkSession.range(m).select(F.col("id").alias("copy"))
        )
    )
    return copies.select(
        (F.col("event_id") * m + F.col("copy")).alias("event_id"),
        (
            F.col("ts")
            + F.col("copy") * F.expr("INTERVAL 90 DAYS")
        ).alias("ts"),
        (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def main() -> None:
    max_m = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    multiples = [m for m in (1, 4, 16, 64) if m <= max_m]
    spark = get_spark(app_name="kommunedata-stress")

    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")

    def dedup_exact_rows(d):
        from kommunedata_data_pipeline_spark.operators.dedup import dedup_exact
        return dedup_exact(d)

    def lsh_pairs(d):
        from kommunedata_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
        return minhash_lsh_pairs(d)

    def jaccard_capped(d):
        from kommunedata_data_pipeline_spark.operators.dedup import ngram_jaccard_pairs
        return ngram_jaccard_pairs(d, threshold=0.8, df_cap=200)

    def surprisal(d):
        from kommunedata_data_pipeline_spark.operators.corpus import unigram_surprisal
        return unigram_surprisal(d)

    def prefix_jaccard(d):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            prefix_filter_jaccard_pairs,
        )
        return prefix_filter_jaccard_pairs(d, 3, 0.5)

    def bm25(d):
        from kommunedata_data_pipeline_spark.operators.retrieval import bm25_topk
        return bm25_topk(d, ["spark", "vector", "merge"])

    def chunk_dedup(d):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            chunk_dedup_keep_first,
        )
        return chunk_dedup_keep_first(d, chunk=8)

    def rollup(e):
        from kommunedata_data_pipeline_spark.operators.aggregates import time_rollup
        return time_rollup(e)

    def concurrency(e):
        from kommunedata_data_pipeline_spark.operators.timeseries import peak_concurrency
        return peak_concurrency(e, "ts")

    def hll(e):
        from kommunedata_data_pipeline_spark.operators.sketches import hll_registers
        return hll_registers(e, "user_id")

    doc_ops = {
        "dedup_exact": dedup_exact_rows,
        "minhash_lsh_pairs": lsh_pairs,
        "ngram_jaccard_capped": jaccard_capped,
        "prefix_filter_jaccard": prefix_jaccard,
        "bm25_topk": bm25,
        "unigram_surprisal": surprisal,
        "chunk_dedup_keepfirst": chunk_dedup,
    }
    event_ops = {
        "time_rollup": rollup,
        "peak_concurrency": concurrency,
        "hll_registers": hll,
    }

    # --- graph: disjoint-copy multiplication. Each copy's node ids are
    # offset into its own range, so copies are separate components —
    # ranks and triangles are copy-local and total work scales linearly
    # with edge count (the honest graph-growth scenario: more
    # communities, not a denser clique).
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    pr_pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("l_suppkey") + 1_000_000).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .distinct()
    )
    pr_edges = pr_pairs.unionAll(
        pr_pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    cust = load_table(spark, SF_DIR, "customer").select(F.col("c_custkey").alias("u"))
    mxu = cust.agg(F.max("u").alias("mxu"))
    hashexp = F.conv(
        F.substring(F.md5(F.concat_ws("#", F.col("u"), F.col("k"))), 1, 8), 16, 10
    ).cast("bigint")
    tri_edges = (
        cust.select("u", F.explode(F.sequence(F.lit(1), F.lit(6))).alias("k"))
        .select("u", (F.col("u") + 1 + F.pmod(hashexp, F.lit(211))).alias("v"))
        .crossJoin(F.broadcast(mxu))
        .where(F.col("v") <= F.col("mxu"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def multiply_edges(e: DataFrame, m: int, a: str, b: str) -> DataFrame:
        if m == 1:
            return e
        off = 100_000_000
        copies = e.crossJoin(
            F.broadcast(e.sparkSession.range(m).select(F.col("id").alias("copy")))
        )
        return copies.select(
            (F.col(a) + F.col("copy") * off).alias(a),
            (F.col(b) + F.col("copy") * off).alias(b),
        )

    def pagerank_op(e):
        from kommunedata_data_pipeline_spark.operators.graph import pagerank_integer

        return pagerank_integer(e, 5)

    def triangle_op(e):
        from kommunedata_data_pipeline_spark.operators.graph import triangle_count

        return triangle_count(e)

    # --- fuzzy string join: multiplied customers keep the name FORMAT
    # (zero-padded serials), so per-name neighbor counts — and hence
    # true matches AND deletion-signature candidates — stay O(digits)
    # regardless of the multiple: linear growth is the honest outcome.
    cust_names = load_table(spark, SF_DIR, "customer").select("c_custkey")

    def multiply_names(c: DataFrame, m: int) -> DataFrame:
        off = 10_000_000
        base = c
        if m > 1:
            base = c.crossJoin(
                F.broadcast(
                    c.sparkSession.range(m).select(F.col("id").alias("copy"))
                )
            ).select(
                (F.col("c_custkey") + F.col("copy") * off).alias("c_custkey")
            )
        return base.select(
            "c_custkey",
            F.format_string("Customer#%09d", F.col("c_custkey")).alias("c_name"),
        )

    def fuzzy_del_op(c):
        from kommunedata_data_pipeline_spark.operators.dedup import (
            deletion_neighborhood_join,
        )

        return deletion_neighborhood_join(c, "c_custkey", "c_name")

    # --- frontier BFS: disjoint graph copies with 3 sources PER COPY
    # (u % copy-offset < 3), so the traversed region scales with the
    # input instead of staying pinned to copy 0.
    def bfs_op(e):
        from kommunedata_data_pipeline_spark.operators.graph import bfs_levels

        srcs = (
            e.select(F.col("u").alias("node"))
            .where(F.col("node") % 100_000_000 < 3)
            .distinct()
        )
        return bfs_levels(
            e.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            srcs,
            5,
            early_exit=False,
        )

    def assoc_op(e):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            association_rules,
        )

        with_item = e.select(
            F.col("user_id").alias("b"),
            F.pmod(
                F.get_json_object("props", "$.k").cast("bigint"), F.lit(50)
            ).alias("item"),
        )
        return association_rules(with_item, "b", "item", 5, 5)

    results: dict[str, dict[int, float]] = {}
    rows_at: dict[str, dict[int, int]] = {
        "documents": {},
        "events": {},
        "pr_edges": {},
        "tri_edges": {},
    }
    import shutil
    import tempfile

    from kommunedata_data_pipeline_spark.streaming.windows import (
        run_to_memory,
        tumbling_counts,
    )

    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        em = multiply_events(events, m).localCheckpoint(eager=True)
        prm = multiply_edges(pr_edges, m, "src", "dst").localCheckpoint(eager=True)
        trm = multiply_edges(tri_edges, m, "u", "v").localCheckpoint(eager=True)
        nm = multiply_names(cust_names, m).localCheckpoint(eager=True)
        rows_at["documents"][m] = dm.count()
        rows_at["events"][m] = em.count()
        rows_at["pr_edges"][m] = prm.count()
        rows_at["tri_edges"][m] = trm.count()
        graph_ops = {
            "pagerank_5iter": (pagerank_op, prm),
            "triangle_count": (triangle_op, trm),
            "bfs_frontier_5": (bfs_op, trm),
            "fuzzy_join_deletion": (fuzzy_del_op, nm),
            "assoc_rules": (assoc_op, em),
        }
        for name, op in list(doc_ops.items()) + list(event_ops.items()):
            src = dm if name in doc_ops else em
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                op(src).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[m] = round(best, 2)
            print(f"m={m:3d} {name:22s} {best:7.2f}s", flush=True)
        for name, (op, src) in graph_ops.items():
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                op(src).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[m] = round(best, 2)
            print(f"m={m:3d} {name:22s} {best:7.2f}s", flush=True)
        # streaming: the multiplied events written once per multiple, then
        # a real watermarked tumbling-window stream driven to completion
        # (query start + micro-batch + finalizing no-data batch + stop) —
        # measures whether the stream floor amortizes as data grows
        sdir = tempfile.mkdtemp(prefix=f"stress-ev-{m}-", dir=shm)
        epath = os.path.join(sdir, "events.parquet")
        em.write.mode("overwrite").parquet(epath)
        probe = spark.read.parquet(epath).schema
        best = None
        for i in range(2):
            t0 = time.perf_counter()
            s = tumbling_counts(spark.readStream.schema(probe).parquet(epath))
            run_to_memory(s, f"stress_tumb_{m}_{i}", shuffle_partitions=1)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.dropTempView(f"stress_tumb_{m}_{i}")
        results.setdefault("stream_tumbling", {})[m] = round(best, 2)
        print(f"m={m:3d} {'stream_tumbling':22s} {best:7.2f}s", flush=True)
        shutil.rmtree(sdir, ignore_errors=True)
        dm.unpersist()
        em.unpersist()
        prm.unpersist()
        trm.unpersist()
        nm.unpersist()

    lines = [
        "# SCALING — measured operator scaling (structure-preserving synthetic multiples of sf0.1)",
        "",
        f"Input: documents {rows_at['documents']} rows, events {rows_at['events']} rows,",
        f"pagerank edges {rows_at['pr_edges']}, triangle edges {rows_at['tri_edges']}",
        "(graphs multiply as disjoint copies — more components, constant density;",
        "stream_tumbling is a real watermarked streaming query driven to completion,",
        "so its 1x time is mostly the fixed micro-batch floor and the ratio shows",
        "that floor amortizing).",
        "(token-prefix multiplication keeps shingle universes disjoint per copy —",
        "near-dup candidate counts scale linearly, the honest corpus-growth scenario;",
        "events shift 90 days per copy so density stays constant). Times are",
        "best-of-2 on local[32]; the interesting number is the GROWTH RATE, not the",
        f"absolute (a {multiples[-1]}x input on 32 fixed cores should cost "
        f"~{multiples[-1]}x for a linear plan).",
        "",
        "| operator | "
        + " | ".join(f"{m}x" for m in multiples)
        + f" | t({multiples[-1]}x)/t({multiples[0]}x) |",
        "|---|" + "---|" * (len(multiples) + 1),
    ]
    for name, per_m in results.items():
        ratio = (
            round(per_m[multiples[-1]] / per_m[multiples[0]], 1)
            if per_m[multiples[0]] > 0
            else float("inf")
        )
        lines.append(
            f"| {name} | "
            + " | ".join(f"{per_m[m]}s" for m in multiples)
            + f" | {ratio}x |"
        )
    lines += [
        "",
        "A sub-quadratic plan on fixed cores grows at most ~linearly in input",
        f"size; {multiples[-1]}x input should cost ≲{multiples[-1]}x time (plus",
        "fixed overhead amortizing AWAY, so ratios under the input multiple are",
        "expected). A quadratic candidate explosion would show up as a ratio far",
        f"ABOVE {multiples[-1]}x on the pair-generation operators.",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
