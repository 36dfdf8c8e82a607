#!/usr/bin/env python
"""Generate the next `_R{N}_DRIVER_CHECKED` frozenset literal from a
driver CORRECTNESS_r{N}.json — the once-per-round maintenance step the
registry-ordering machinery needs (see queries() in __spark_entry__.py).
Only GREEN rows (hash_match, or rows+schema for rows-only checks with no
oracle error) are included; red rows must stay unchecked so they
re-front the window.

Usage: python scripts/next_tier.py CORRECTNESS_r07.json
Prints the code block to paste at the bottom of __spark_entry__.py
(and reminds you to add it to _ALL_CHECK_ROUNDS).
"""

from __future__ import annotations

import json
import re
import sys
import textwrap


def main() -> None:
    path = sys.argv[1]
    m = re.search(r"r(\d+)", path)
    rnd = int(m.group(1)) if m else 0
    rows = json.load(open(path))
    green = sorted(
        name
        for name, r in rows.items()
        if r.get("err") is None
        and r.get("rows_match")
        and r.get("schema_match")
        and r.get("hash_match", True)
    )
    red = sorted(set(rows) - set(green))
    if red:
        print(f"# EXCLUDED (not green, will re-front the window): {red}")
    body = textwrap.fill(
        " ".join(f'"{n}",' for n in green),
        width=72,
        initial_indent=" " * 8,
        subsequent_indent=" " * 8,
    )
    print(f"_R{rnd}_DRIVER_CHECKED = frozenset(\n    {{\n{body}\n    }}\n)")
    print(f"# ...and append _R{rnd}_DRIVER_CHECKED to _ALL_CHECK_ROUNDS")


if __name__ == "__main__":
    main()
