#!/usr/bin/env python
"""Derive published counts from the registry instead of hand-editing
them (VERDICT r6 #6 — three consecutive rounds a hand-written count
went stale). Prints the authoritative numbers and rewrites the
`<!--COUNT-->`-tagged line in README.md in place. Run at round close:

    python scripts/counts.py          # report + rewrite README
    python scripts/counts.py --check  # exit 1 if any published count
                                      # disagrees with the registry
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    check = "--check" in sys.argv
    n_q = len(entrymod.queries())
    n_sql = len(entrymod.oracle_sql())
    print(f"registered queries : {n_q}")
    print(f"sql oracles        : {n_sql}")
    print(f"rows-only checked  : {n_q - n_sql}")

    readme = os.path.join(REPO, "README.md")
    with open(readme) as f:
        text = f.read()
    # the README publishes the count as "ALL <n> registered queries";
    # rewrite every occurrence of that phrase to the derived number
    new_text, n_sub = re.subn(
        r"ALL \d+ registered queries",
        f"ALL {n_q} registered queries",
        text,
    )
    stale = new_text != text
    if check:
        if stale:
            print("STALE: README.md count != registry", file=sys.stderr)
            sys.exit(1)
        print("counts consistent")
        return
    if stale:
        with open(readme, "w") as f:
            f.write(new_text)
        print(f"README.md: rewrote {n_sub} count occurrence(s) -> {n_q}")
    else:
        print("README.md already consistent")


if __name__ == "__main__":
    main()
