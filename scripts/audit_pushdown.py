#!/usr/bin/env python
"""Registry-wide audit for the r8 generator-filter-pushdown signature:
a Filter whose condition re-states an expensive derived expression
(lambdas/md5/xxhash over scan columns) sitting BELOW the spread
exchange — i.e. evaluated serially in the narrow scan stage and then
re-evaluated above. The suite-level scan cache used to mask this
(persisted relations are pushdown barriers); with the cache removed
(round 12) every affected operator pays the expression once per row on
ONE core.

Heuristic: in `.explain("formatted")` text, flag any `(n) Filter` block
whose Condition exceeds a size threshold. Prints query name, filter
size, and whether the filter sits below an Exchange.

Usage: python scripts/audit_pushdown.py [threshold] [name_substr ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    threshold = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    filters = sys.argv[2:]
    import __spark_entry__ as entrymod
    from kommunedata_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="audit-pushdown",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    hits = []
    for name, fn in sorted(entrymod.queries().items()):
        if name.startswith("q_stream"):
            continue  # building a stream query executes it
        if filters and not any(f in name for f in filters):
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:
            print(f"{name}: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)
            continue
        for m in re.finditer(
            r"\(\d+\) Filter.*?\nInput.*?\nCondition : (.*?)\n", text, re.S
        ):
            cond = m.group(1)
            if len(cond) >= threshold:
                hits.append((name, len(cond)))
                print(f"{name}: filter condition {len(cond)} chars")
                break
    print(f"\n{len(hits)} queries flagged (threshold {threshold})")
    spark.stop()


if __name__ == "__main__":
    main()
