#!/usr/bin/env python
"""SCALING evidence for semantic_dedup (SemDeDup): the operator has TWO
scale terms — flat nearest-centroid assignment O(N*K) and within-cluster
pairs O(N^2/K) — so the K knob trades them: fixed K lets pairs explode
quadratically; K ~ N makes pairs linear but assignment quadratic;
K ~ sqrt(N) balances both at O(N^1.5) (the classic IVF balance; real
systems push further with hierarchical quantizers for the assignment
term, which is out of scope here). This script MEASURES the trade
instead of asserting it:

- balanced rows: K = 16*sqrt(m) at m in {1,4,16} — expected per-unit
  cost ~sqrt(m) (4x input -> ~2x per-unit);
- scaled rows: K = 16*m — pairs linear, assignment takes over ~m^2;
- a fixed-K contrast at m = 4 only (K = 16) — the blow-up the knob
  exists to prevent, quantified on the same input.

Corpus multiplication is structure-preserving: each copy's vectors get a
copy-keyed deterministic elementwise SIGN pattern (md5-derived). Cosine
is invariant under a shared sign flip (cos(s*a, s*b) = cos(a, b)), so
WITHIN-copy similarity structure is exactly preserved while cross-copy
cosines have random per-dimension sign agreement (expected ~0) —
near-dup structure stays copy-local, the honest scaling scenario (same
contract as stress.py's token-prefix trick for shingles).

Appends a "## Semantic dedup" section to SCALING.md — run AFTER
scripts/stress.py so the base table and this section describe the same
code. Best-of-2 timing, same as the base battery.

Usage: python scripts/stress_semdedup.py [multiples...]  (default 1 4 16 64)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from kommunedata_data_pipeline_spark.session import get_spark  # noqa: E402
from kommunedata_data_pipeline_spark.sources.readers import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FIXED_K_AT = 16  # the contrast multiple for the fixed-K anti-pattern row


def multiply_embeddings(e: DataFrame, m: int) -> DataFrame:
    """m structure-preserving copies: copy-keyed deterministic sign
    pattern per dimension (within-copy cosines exactly preserved,
    cross-copy expected ~0)."""
    if m == 1:
        return e.select("vec_id", "embedding")
    copies = e.select("vec_id", "embedding").crossJoin(
        F.broadcast(e.sparkSession.range(m).select(F.col("id").alias("copy")))
    )

    def sign(i):
        return F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("_", F.col("copy"), i.cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    return copies.select(
        (F.col("vec_id") * m + F.col("copy")).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.sequence(F.lit(0), F.size("embedding") - 1),
            lambda x, i: (x.cast("double") * sign(i)).cast("float"),
        ).alias("embedding"),
    )


def _time_best2(em: DataFrame, k: int) -> float:
    from kommunedata_data_pipeline_spark.operators.similarity import semantic_dedup

    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        semantic_dedup(em, n_centroids=k, threshold=0.3).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 2)


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 4, 16, 64]
    spark = get_spark(app_name="kommunedata-stress-semdedup")
    embs = load_table(spark, SF_DIR, "embeddings")

    balanced: dict[int, float] = {}
    scaled: dict[int, float] = {}
    fixed_k: float | None = None
    rows_at: dict[int, int] = {}
    for m in multiples:
        em = multiply_embeddings(embs, m).localCheckpoint(eager=True)
        rows_at[m] = em.count()
        kb = 16 * int(math.isqrt(m))
        balanced[m] = _time_best2(em, kb)
        print(f"m={m:3d} semantic_dedup K={kb:4d} (16*sqrt) {balanced[m]:7.2f}s", flush=True)
        scaled[m] = _time_best2(em, 16 * m)
        print(f"m={m:3d} semantic_dedup K={16 * m:4d} (16*m)    {scaled[m]:7.2f}s", flush=True)
        if m == FIXED_K_AT:
            fixed_k = _time_best2(em, 16)
            print(f"m={m:3d} semantic_dedup K=  16 (fixed)   {fixed_k:7.2f}s", flush=True)
        em.unpersist()

    lines = [
        "",
        "## Semantic dedup — the K knob, measured",
        "",
        f"semantic_dedup over {rows_at[multiples[-1]]:,} vectors at "
        f"{multiples[-1]}x (sign-pattern structure-preserving copies:",
        "within-copy cosines exact, cross-copy ~0). Cost = flat",
        "assignment O(N*K) + within-cluster pairs O(N^2/K); K = 16*sqrt(m)",
        "balances both at O(N^1.5) (expected per-unit ~sqrt(m): 4x input",
        "-> ~2x per-unit), K = 16*m makes pairs linear but assignment",
        "~m^2, fixed K = 16 lets pairs explode ~m^2 — the anti-pattern",
        f"row quantifies it on the {FIXED_K_AT}x input. At extreme scale the",
        "assignment term moves to a hierarchical quantizer (coarse-then-",
        "refine), which changes the constant, not the within-cluster",
        "pair discipline measured here.",
        "",
        "| variant | " + " | ".join(f"{m}x" for m in multiples) + " |",
        "|---|" + "---|" * len(multiples),
        "| balanced K = 16·sqrt(m) | "
        + " | ".join(f"{balanced[m]:.2f}s" for m in multiples)
        + " |",
        "| scaled K = 16m | "
        + " | ".join(f"{scaled[m]:.2f}s" for m in multiples)
        + " |",
    ]
    if fixed_k is not None:
        cells = [f"{fixed_k:.2f}s" if m == FIXED_K_AT else "—" for m in multiples]
        lines.append("| fixed K = 16 | " + " | ".join(cells) + " |")
        lines.append("")
        lines.append(
            f"Fixed-K at {FIXED_K_AT}x costs "
            f"{fixed_k / balanced[FIXED_K_AT]:.1f}x the balanced run on the "
            "same input — the quadratic cluster blow-up, quantified."
        )
    per_unit = [balanced[m] / m for m in multiples]
    lines.append("")
    lines.append(
        "Per-unit cost (t/m) along the balanced rows: "
        + " -> ".join(f"{v:.2f}s" for v in per_unit)
        + " — the O(N^1.5) prediction is per-unit ~sqrt(m); anything at or"
    )
    lines.append(
        "below that slope means the plan holds; a pair explosion would"
        " blow past it."
    )
    lines.append("")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    with open(path, "a") as f:
        f.write("\n".join(lines))
    print(f"appended section to {path}", flush=True)


if __name__ == "__main__":
    main()
