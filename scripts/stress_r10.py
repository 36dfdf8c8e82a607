#!/usr/bin/env python
"""SCALING doubling-tier battery for the ExactSubstr char-grain family
(VERDICT r9 next #4): push substring_dup_spans and
substring_cut_keep_first through 64x -> 128x -> 256x with the
unchanged unigram_surprisal linear control, same discipline as
scripts/stress_ext.py — the asymptote diagnostic is the per-doubling
ratio read AGAINST the control's own ratio on the same box/day (the r9
extension showed the box itself turns superlinear at the 256x tier, so
absolute ratios overstate).

Structure-preserving multiplication: token-prefix copies keep gram
universes disjoint per copy (no cross-copy duplicates; within-copy
duplicate structure repeats), so true span rows grow ~linearly and a
linear plan should double per doubling.

Usage: python scripts/stress_r10.py [multiples...]  (default 64 128 256)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kommunedata_data_pipeline_spark.session import get_spark  # noqa: E402
from kommunedata_data_pipeline_spark.sources.readers import load_table  # noqa: E402

from stress import multiply_documents  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    spark = get_spark(app_name="kommunedata-stress-r10")
    docs = load_table(spark, SF_DIR, "documents")

    def spans(d):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            substring_dup_spans,
        )

        return substring_dup_spans(d, min_len=25)

    def cut(d):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            substring_cut_keep_first,
        )

        return substring_cut_keep_first(d, min_len=25)

    def surprisal(d):
        from kommunedata_data_pipeline_spark.operators.corpus import (
            unigram_surprisal,
        )

        return unigram_surprisal(d)

    results: dict[str, dict[int, float]] = {}
    rows_at: dict[int, int] = {}
    for m in multiples:
        dm = multiply_documents(docs, m).localCheckpoint(eager=True)
        rows_at[m] = dm.count()
        for name, op in [
            ("substring_dup_spans", spans),
            ("substring_cut_keep_first", cut),
            ("unigram_surprisal", surprisal),
        ]:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                op(dm).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results.setdefault(name, {})[m] = round(best, 2)
            print(f"m={m:3d} {name:26s} {best:7.2f}s", flush=True)
        dm.unpersist()

    m_last = multiples[-1]
    lines = [
        "",
        "## Round-10 — ExactSubstr family doubling tiers "
        f"({'x / '.join(str(m) for m in multiples)}x; scripts/stress_r10.py)",
        "",
        f"Documents {rows_at[m_last]:,} rows at {m_last}x; token-prefix",
        "structure-preserving multiplication, best-of-2, noop sink. Read",
        "each family's per-doubling ratio AGAINST the unchanged",
        "unigram_surprisal linear control's ratio from the same run (the",
        "r9 extension measured the box itself superlinear at the 256x",
        "tier: control 2.84x that day).",
        "",
        "| operator | " + " | ".join(f"{m}x s" for m in multiples)
        + " | " + " | ".join(
            f"{multiples[i]}->{multiples[i + 1]}"
            for i in range(len(multiples) - 1)
        ) + " |",
        "|---|" + "---|" * (2 * len(multiples) - 1),
    ]
    for name, per in results.items():
        ratios = [
            round(per[multiples[i + 1]] / max(per[multiples[i]], 1e-9), 2)
            for i in range(len(multiples) - 1)
        ]
        lines.append(
            f"| {name} | "
            + " | ".join(str(per[m]) for m in multiples)
            + " | "
            + " | ".join(f"{r}x" for r in ratios)
            + " |"
        )
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALING.md",
        ),
        "a",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("appended round-10 section to SCALING.md", flush=True)


if __name__ == "__main__":
    main()
