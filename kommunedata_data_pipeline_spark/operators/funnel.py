"""Event-sequence analytics: ordered funnels and cohort retention.

The reference's closest precedent is its run-metrics aggregation
(run_scrapers.py:59-97 — counts per stage of a pipeline); these
operators generalize that to the ordered, per-user event analytics any
product/events table needs, over the driver testdata ``events`` table.

Scale shape: everything is keyed by ``user_id`` — one shuffle per
operator stage, map-side combinable conditional mins, no self-joins on
the raw event stream (the per-user reduction happens FIRST, so the big
table crosses the wire once and later stages operate on the small
per-user frame).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: Sequence[str] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Ordered funnel: a user reaches stage k iff there is a strictly
    increasing timestamp chain step1 < step2 < ... < stepk through the
    named event types (earliest-completion semantics: each stage's
    timestamp is the MIN matching event after the previous stage).
    ``within`` (e.g. ``"24 hours"``) bounds each hop: stage k only
    counts if it happens within that interval of stage k-1 — the usual
    conversion-window semantics.

    Plan: one conditional-min aggregate per user collapses the event
    stream (the only big shuffle), then the stage chain is resolved with
    per-row expressions over the tiny per-user frame — at 100 TB the
    event table is reduced before anything sequential happens.

    Returns one row per stage (0 = never did step1) with user counts.
    """
    # Per (user, step): all candidate timestamps, smallest first. A
    # sorted-list-per-step is required for correctness: stage k's
    # timestamp is the min of step k's events AFTER stage k-1, which a
    # single unconditional min per step cannot express.
    per_user = events.groupBy(user_col).agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col(type_col) == s, F.col(ts_col)))
            ).alias(f"ts_{i}")
            for i, s in enumerate(steps)
        ]
    )
    # Resolve the chain: t0 = first step-0 ts; t_k = first step-k ts > t_{k-1}.
    within_iv = F.expr(f"INTERVAL {within}") if within else None

    def _first_after(arr, prev):
        # single-arg lambda only: a two-arg HOF lambda is (element, index)
        # to Spark, which would silently bind the index over `prev`
        if within_iv is not None:
            return F.get(
                F.filter(arr, lambda x: (x > prev) & (x <= prev + within_iv)), 0
            )
        return F.get(F.filter(arr, lambda x: x > prev), 0)

    t_prev = None
    stage_expr = F.lit(0)
    for i in range(len(steps)):
        arr = F.col(f"ts_{i}")
        # F.get is 0-based and null-on-out-of-bounds (element_at raises
        # under ANSI mode when the candidate list is empty).
        if t_prev is None:
            t_i = F.get(arr, 0)
        else:
            t_i = _first_after(arr, t_prev)
        per_user = per_user.withColumn(f"t_{i}", t_i)
        t_prev = F.col(f"t_{i}")
        stage_expr = F.when(t_prev.isNotNull(), i + 1).otherwise(stage_expr)
    staged = per_user.withColumn("stage", stage_expr)
    return (
        staged.groupBy("stage")
        .agg(F.count("*").alias("n_users"))
        .orderBy("stage")
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each (cohort_week, week_no) the number of cohort
    users active in that week. week_no 0 is the cohort week itself.

    Two shuffles: min(ts) per user (map-side combinable), then the
    distinct (user, week) activity grid joined back on user_id — the
    join's build side is the per-user cohort frame, broadcast when it
    fits. No window over the raw stream.
    """
    cohort = events.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    activity = events.select(
        user_col,
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("active_week"),
    ).dropDuplicates([user_col, "active_week"])
    return (
        activity.join(F.broadcast(cohort), user_col)
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("bigint")
            .alias("week_no"),
        )
        .groupBy("cohort_week", "week_no")
        .agg(F.count("*").alias("n_active"))
        # dates cross the oracle bridge as strings (repo convention)
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_no",
            "n_active",
        )
    )


def event_pattern_match(
    events: DataFrame,
    codes: dict,
    pattern: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """MATCH_RECOGNIZE-style behavioral pattern query — the regex
    sibling of `funnel_stages` (which counts ordered stage containment
    with a conversion window): encode each user's event history as a
    string of single-char codes in (ts, event_id) total order and
    match an arbitrary REGEX over it. Expresses patterns a fixed
    funnel can't (immediate adjacency, repetition counts, negated
    inter-stage events) — e.g. 'V[^P]*C.*P' = a view, then a click
    with NO purchase in between, then a purchase eventually.

    ``codes`` maps event_type → single char (unmapped types are
    dropped, stated). Keep patterns to literals, classes, and
    quantifiers — both engines run RE2-compatible semantics there.
    Scale shape: one map-side code projection, one per-user ordered
    collect (the per-user history string — sessionize first at scale
    if user histories are unbounded, as funnel_stages documents), one
    regex per user. Output: one row (n_users, n_matched, match_rate).
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in codes.items() for x in kv]
    )
    coded = events.select(
        F.col(user_col).alias("u"),
        mapping[F.col(type_col)].alias("c"),
        F.col(ts_col).alias("t"),
        F.col(id_col).alias("i"),
    ).where(F.col("c").isNotNull())
    hist = coded.groupBy("u").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "i", "c"))),
                lambda s: s["c"],
            ),
        ).alias("h")
    )
    flagged = hist.select(F.col("h").rlike(pattern).cast("int").alias("m"))
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("m").cast("bigint").alias("n_matched"),
        F.round(F.sum("m") / F.count(F.lit(1)), 6).alias("match_rate"),
    )
