"""Slowly-changing-dimension (type 2) apply — the versioned-upsert dual
of the idempotent sink (SURVEY §2.10 ST2 / reference scraper_utils.py
48-70): where the reference's landing is last-write-wins by key, an
SCD-2 apply keeps history by closing the old version and opening a new
one at the effective date.

Scale shape: one equi-join on the business key (updates side is usually
the small one — broadcast when it fits) and a union; no windows over the
full dimension, no driver state. At 100 TB the dimension shuffles once
by key, which is the minimum any keyed merge needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    attr_cols: list[str],
    eff_date: str,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Apply a batch of attribute updates effective at ``eff_date`` to a
    current-state dimension, emitting the SCD-2 versioned table:

    - keys not in ``updates``: one open row (valid_to NULL), unchanged
    - updated keys: the prior row closed at ``eff_date`` + a new open
      row carrying the updated attributes

    ``dim`` must hold the current state with ``valid_from_col`` present;
    ``updates`` holds (key, new attr values). Dates travel as ISO
    strings (engine-bridge convention).
    """
    upd = updates.select(
        key,
        F.lit(True).alias("__upd_marker"),
        *[F.col(c).alias(f"__new_{c}") for c in attr_cols],
    )
    joined = dim.join(upd, key, "left")
    # marker column, not attr NULL-ness: an update that sets an attribute
    # to NULL must still close the prior version
    matched = F.col("__upd_marker").isNotNull()
    other_cols = [c for c in dim.columns if c != key]

    # prior versions: closed when an update supersedes them
    current = joined.select(
        key,
        *[F.col(c) for c in other_cols if c != valid_to_col],
        F.when(matched, F.lit(eff_date)).otherwise(F.lit(None).cast("string"))
        .alias(valid_to_col),
    )
    # new open versions for updated keys
    fresh = (
        joined.where(matched)
        .select(
            key,
            *[
                F.col(f"__new_{c}").alias(c) if c in attr_cols else F.col(c)
                for c in other_cols
                if c not in (valid_from_col, valid_to_col)
            ],
            F.lit(eff_date).alias(valid_from_col),
            F.lit(None).cast("string").alias(valid_to_col),
        )
    )
    cols = [key] + [c for c in other_cols if c != valid_to_col] + [valid_to_col]
    return current.select(*cols).unionByName(fresh.select(*cols))
