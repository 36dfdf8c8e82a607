"""Discovery plan — the reference's two discovery scripts as ONE
declarative chain (get_base_url.py `run()` → get_start_url.py
`run_discovery()`):

    stems → candidate fan-out (S4, priority reified)
          → probe with HEAD→GET retry (S3/C4)
          → first working candidate per stem (window by priority —
            the reference's try-in-order loop, get_base_url.py:62-81)
          → fetch the committee page (S12, Try-struct C5)
          → 3-strategy committee hunt (operators/discovery.py)
          → (stem, base_url, start_url, strategy)

Scale: probes and fetches are per-partition batched UDFs over the
injected transport; everything else is narrow expressions + one window
on stem. A failed stem survives the plan as a NULL start_url row (the
reference prints "Not Found." and moves on, get_start_url.py:129-130)
— no row is ever dropped silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.discovery import committee_hunt
from ..sources.fetch import Transport, candidate_urls, fetch_blobs, probe_urls


def discover_start_urls(stems: DataFrame, transport: Transport) -> DataFrame:
    """stems(stem string) → (stem, base_url, start_url, strategy).

    base_url is NULL when no candidate probes OK; start_url is NULL when
    the page fetched but no hunt strategy matched."""
    cands = candidate_urls(stems)
    probed = cands.join(
        probe_urls(cands, transport), "candidate_url"
    )
    ok = probed.where(
        (F.col("status") < 400) & F.col("resolved_url").isNotNull()
    )
    w = Window.partitionBy("stem").orderBy("priority")
    best = (
        ok.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("stem", F.col("resolved_url").alias("base_url"))
    )
    pages = fetch_blobs(best, transport, url_col="base_url").select(
        F.col("url").alias("base_url"),
        F.when(F.col("ok"), F.col("content").cast("string")).alias("html"),
    )
    hunted = committee_hunt(
        best.join(pages, "base_url"), base_url_col="base_url", html_col="html"
    ).select("stem", "base_url", "start_url", "strategy")
    # keep unresolvable stems as NULL rows (left join back to the input)
    return stems.join(hunted, "stem", "left")
