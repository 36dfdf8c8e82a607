"""Time-series operators: calendar gap-fill with LOCF, and a
distributed global running sum powering sweep-line analytics.

The reference's incremental pipeline treats absent data explicitly
(ST5: unparseable dates get fallback handling rather than dropping the
row — scraper.py:181, scraper_svendborg.py:150-152); these operators are
the time-series generalization of that: a missing day is a fact to fill,
not a row to lose.

Scale notes are per-function; the interesting one is
``global_running_sum``: Spark has no built-in global cumulative sum that
scales (a ``Window.orderBy`` without partitioning collapses to ONE
task), so it is implemented as the classic two-phase scan: range
partition by the sort key, local prefix sums per partition, then a tiny
per-partition-offset table (one row per partition) broadcast back. The
full data is never on one executor; only the n_partitions-row offset
table passes through a single-task window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def calendar_spine(
    df: DataFrame, ts_col: str, *dims: str
) -> DataFrame:
    """(day × distinct dims) spine covering [min(ts), max(ts)] — the
    dense left side every gap-fill joins onto. The day sequence comes
    from ONE tiny aggregate row exploded; dims are a distinct over the
    input (both broadcast-sized by construction)."""
    bounds = df.agg(
        F.date_trunc("day", F.min(ts_col)).alias("lo"),
        F.date_trunc("day", F.max(ts_col)).alias("hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    if not dims:
        return days
    return days.crossJoin(F.broadcast(df.select(*dims).distinct()))


def locf_fill(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *dims: str,
) -> DataFrame:
    """Daily aggregate with gaps filled by Last Observation Carried
    Forward: dense (day × dims) spine left-joined with the observed
    daily sums, nulls replaced by the most recent prior observation in
    the same dim group (NULL before the first observation).

    Scale shape: the observed aggregate is map-side combinable; the
    spine join is broadcast (spine is |days| × |dims|, tiny); the fill
    itself is one per-dim window over the dense spine — partitioned by
    dims, so no global sort and no single-task stage. 100 TB of raw
    events reduce to |days|×|dims| rows BEFORE the window runs.
    """
    daily = (
        df.groupBy(
            F.date_trunc("day", F.col(ts_col)).alias("day"),
            *[F.col(d) for d in dims],
        )
        .agg(F.round(F.sum(value_col), 2).alias("observed"))
    )
    spine = calendar_spine(df, ts_col, *dims)
    w = (
        Window.partitionBy(*[F.col(d) for d in dims])
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(daily, ["day", *dims], "left")
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        *dims,
        "observed",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    delta_col: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Distributed global cumulative sum of ``delta_col`` in
    ``order_cols`` order, as a new ``running`` column.

    Two-phase scan (the textbook parallel prefix sum):
      1. ``repartitionByRange(order_cols)`` — co-locates sort ranges;
      2. local prefix sum per partition (window keyed by the physical
         partition id — already co-located, so the window's shuffle is
         pid→pid);
      3. per-partition totals (one row each) get their own exclusive
         prefix sum on a single task — n_partitions rows, trivially
         small — and broadcast back as offsets.

    ``running`` is exact for any associative delta (integers here);
    values at EXACT order-key ties are assigned per-tie-group as the
    same value set regardless of physical order, so aggregates over the
    result (max per day, final value) are deterministic.
    """
    spark = df.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism
    parted = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    local_w = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = parted.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__local", F.sum(delta_col).over(local_w)
    )
    # offsets: exclusive prefix over the per-partition totals — a
    # single-task window over n_partitions rows (bytes, not data)
    off_w = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("__pid")
        .agg(F.sum(delta_col).alias("__tot"))
        .withColumn("__off", F.coalesce(F.sum("__tot").over(off_w), F.lit(0)))
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("running", (F.col("__local") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__local", "__off")
    )


def peak_concurrency(
    df: DataFrame,
    ts_col: str,
    duration: str = "30 minutes",
) -> DataFrame:
    """Sweep-line peak concurrency: treat each row as an active interval
    [ts, ts + duration) and report, per day, the maximum number of
    simultaneously active intervals observed at boundary events.

    Boundary semantics (mirrored exactly by the SQL oracle): +1 at
    start, -1 at end, ends sort before starts at equal timestamps
    (half-open intervals — an interval ending exactly when another
    starts never overlaps it). The global running sum is the distributed
    two-phase scan above — no single-task sort of the boundary stream.
    """
    starts = df.select(
        F.col(ts_col).alias("t"), F.lit(1).alias("delta")
    )
    ends = df.select(
        (F.col(ts_col) + F.expr(f"INTERVAL {duration}")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    swept = global_running_sum(
        starts.unionByName(ends), ["t", "delta"], "delta"
    )
    return (
        swept.groupBy(
            F.date_format(F.date_trunc("day", "t"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.max("running").cast("bigint").alias("peak"))
    )


def ewma_smooth(
    events: DataFrame,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially weighted moving average in ONE window pass:
    the recurrence S_t = α·x_t + (1−α)·S_{t−1} (S_1 = x_1) has the
    closed form S_t = (1−α)^t · [ α·Σ_{i≤t} x_i·(1−α)^{−i}
    + (1−α)·x_1·(1−α)^{−1} − α·x_1·(1−α)^{−1} ]… folded here as a
    cumulative sum of re-based terms, so the sequential recurrence
    becomes a parallel prefix expression instead of a per-row loop.

    Numeric bound, stated honestly: the re-basing factor (1−α)^{−i}
    grows exponentially in the row index, so this form is valid for
    series up to a few hundred points per key (α=0.3 → ~2300 rows
    before double overflow). Longer series at 100 TB use segmented
    re-basing — cut each key's series into K-row segments, run this
    expression per segment, and stitch segments through the carry
    S_seg_end·(1−α)^len, which is the same two-phase pattern as
    ``global_running_sum``. The demo pins the one-pass segment math;
    the stitch is one extra join."""
    beta = 1.0 - alpha
    # S_t = beta^rn_t * [ x_1/beta + alpha * Σ_{i=2..t} x_i/beta^i ];
    # order_cols must include a unique tie-break so both engines (and
    # any re-run) fold the same fp sequence
    wo = Window.partitionBy(key_col).orderBy(*order_cols)
    return (
        events.withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "reb",
            F.when(
                F.col("rn") == 1, F.col(val_col) / F.lit(beta)
            ).otherwise(
                F.col(val_col) * F.lit(alpha) / F.pow(F.lit(beta), F.col("rn"))
            ),
        )
        .withColumn(
            "ewma",
            F.round(
                F.pow(F.lit(beta), F.col("rn"))
                * F.sum("reb").over(
                    wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                6,
            ),
        )
        .drop("rn", "reb")
    )


def m4_downsample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    n_buckets: int = 100,
) -> DataFrame:
    """M4 time-series downsampling (Jugel et al., VLDB 2014): per
    series key and time bucket, keep exactly the four value-defining
    points a pixel-perfect line rendering needs — first, last, min,
    max. The standard big-data viz reduction (TimescaleDB /
    VictoriaMetrics ship it as a first-class aggregate): error-free
    for line charts at ``n_buckets`` horizontal pixels while reducing
    arbitrarily many points to <= 4 per bucket.

    Buckets are ``n_buckets`` equal micro-second slices of the GLOBAL
    [min ts, max ts] range (computed in one tiny pre-agg, broadcast to
    the scan); the last instant folds into the final bucket.
    First/last are made deterministic under ts ties by the unique
    ``id_col`` tiebreak — packed struct min/max, so one hash aggregate
    computes all four points: a single shuffle on (key, bucket),
    map-side combinable, no window sort. Integer bucket arithmetic and
    pick-a-stored-value semantics (no float arithmetic on values) make
    the result engine- and partitioning-exact.
    """
    rng = df.agg(
        F.unix_micros(F.min(ts_col)).alias("t0"),
        (F.unix_micros(F.max(ts_col)) + 1).alias("t1"),
    )
    return (
        df.crossJoin(F.broadcast(rng))
        .select(
            F.col(key_col).alias("series"),
            # integer `div` on BIGINT micro-seconds: (us−t0)*n_buckets
            # is ≤ ~1e15, exact in BIGINT; float division here would
            # hit the Spark-truncates / DuckDB-rounds cast divergence
            F.least(
                F.lit(n_buckets - 1),
                F.expr(
                    f"(unix_micros({ts_col}) - t0) * {n_buckets} div (t1 - t0)"
                ),
            )
            .cast("int")
            .alias("bucket"),
            F.unix_micros(F.col(ts_col)).alias("t_us"),
            F.col(id_col).alias("pid"),
            F.col(val_col).alias("v"),
        )
        .groupBy("series", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min(F.struct("t_us", "pid", "v")).alias("o"),
            F.max(F.struct("t_us", "pid", "v")).alias("c"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
        )
        .select(
            "series",
            "bucket",
            "n_points",
            F.col("o.t_us").alias("t_open_us"),
            F.col("o.v").alias("v_open"),
            "v_min",
            "v_max",
            F.col("c.t_us").alias("t_close_us"),
            F.col("c.v").alias("v_close"),
        )
    )


def time_weighted_avg(
    df: DataFrame, key_col: str, ts_col: str, val_col: str
) -> DataFrame:
    """Per-key time-weighted average under LOCF semantics (the
    TimescaleDB ``time_weight('LOCF')`` statistic): each observation
    holds its value until the NEXT observation of the same key, so its
    weight is that interval in microseconds; the key's final
    observation spans zero time and contributes no weight (stated, not
    hidden — closing the window is the caller's modelling choice).
    avg = sum(value * dur_us) / sum(dur_us).

    Built on one lead() window per key (sort once per key group — the
    minimal requirement, since weights depend on the successor) and a
    map-side-combinable aggregate. EXACT cross-engine: duration is
    integer microseconds, the weighted sum accumulates in
    DECIMAL(38,6) (order-independent — double partial sums would make
    the answer depend on partitioning), division happens once at the
    end and is rounded on emission. Keys with a single observation
    yield NULL (zero total weight)."""
    w = Window.partitionBy(key_col).orderBy(ts_col, val_col)
    dur = (
        F.unix_micros(F.lead(ts_col).over(w)) - F.unix_micros(F.col(ts_col))
    ).alias("dur_us")
    return (
        df.select(key_col, ts_col, val_col)
        .withColumn("dur_us", dur)
        .where(F.col("dur_us").isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("total_us"),
            F.sum(
                F.col(val_col).cast("decimal(18,6)") * F.col("dur_us")
            ).alias("_wsum"),
        )
        .select(
            key_col,
            "n_intervals",
            "total_us",
            # cast the EXACT decimal sum to double, then one double
            # division — decimal-division scale rules differ between
            # engines, double ops on identical operands do not
            F.round(
                F.col("_wsum").cast("double") / F.col("total_us"), 6
            ).alias("twa"),
        )
    )


def rolling_median(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    n_preceding: int = 9,
) -> DataFrame:
    """Exact rolling median over the last ``n_preceding``+1 rows per
    key, ordered by (ts, value) — the robust smoother for spiky series
    (a rolling MEAN chases every outlier; the median ignores them
    until they are half the window). Runs as the percentile aggregate
    over a bounded ROWS window frame: one sort per key group, O(w)
    state per row, w fixed — scale cost is the per-key sort, identical
    to any windowed analytic. Interpolated-median parity with DuckDB's
    windowed quantile_cont is pinned by the oracle; emitted rounded."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, val_col)
        .rowsBetween(-n_preceding, 0)
    )
    return df.select(
        key_col,
        ts_col,
        val_col,
        F.round(
            F.expr(f"percentile({val_col}, 0.5D)").over(w), 6
        ).alias("roll_med"),
    )


def seasonal_residuals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Seasonal-baseline anomaly screen: each observation's residual
    against the mean of its own (key, day-of-week, hour) seasonal cell
    — the seasonal-naive detrend that catches "this Tuesday 9am is
    nothing like Tuesdays at 9" while ignoring ordinary daily rhythm.
    Emits the ``top_k`` largest absolute residuals with a full
    deterministic tie-break (rounded residual, unique id).

    The cell-mean table is (keys × 168) rows — broadcast back onto the
    scan, never a window over the data. Cross-engine exactness: cell
    sums accumulate in DECIMAL (order-independent), the mean is ONE
    double division, and the residual subtraction is the same double
    op on the same operands on both engines."""
    cell = [
        F.dayofweek(ts_col).alias("dow"),
        F.hour(ts_col).alias("hod"),
    ]
    base = (
        df.groupBy(F.col(key_col).alias("k"), *cell)
        .agg(
            (
                F.sum(F.col(val_col).cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("baseline")
        )
    )
    scored = (
        df.select(
            F.col(key_col).alias("k"),
            *cell,
            F.col(id_col).alias("pid"),
            F.col(val_col).alias("v"),
        )
        .join(F.broadcast(base), ["k", "dow", "hod"])
        .select(
            F.col("k").alias(key_col),
            "pid",
            "v",
            F.round("baseline", 6).alias("baseline"),
            F.round(F.col("v") - F.col("baseline"), 6).alias("residual"),
            F.round(F.abs(F.col("v") - F.col("baseline")), 6).alias("abs_res"),
        )
    )
    return scored.orderBy(F.desc("abs_res"), "pid").limit(top_k)


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_us: Column,
    end_us: Column,
) -> DataFrame:
    """Per-key total length of the UNION of (possibly overlapping)
    half-open intervals [start_us, end_us) — "how long was at least one
    session active", the measure that naive sum-of-durations
    double-counts. Gaps-and-islands on integer microseconds:

    - order each key's intervals by (start, end);
    - an interval starts a NEW island when its start exceeds the
      running max of all previous ends (strictly later — touching
      intervals merge, half-open semantics);
    - island id = running sum of those new-island flags; per-island
      coverage = max(end) − min(start); total = sum over islands.

    Two windows over the same per-key sort (one sort pays for both) +
    one aggregation. All integer microsecond arithmetic — exact on any
    engine and partitioning. The per-key sort is the scale cost —
    identical class to any per-key window analytic."""
    w_prev = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = (
        df.select(
            F.col(key_col).alias("k"),
            start_us.cast("bigint").alias("s"),
            end_us.cast("bigint").alias("e"),
        )
        .withColumn("prev_max_e", F.max("e").over(w_prev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_max_e").isNull()
                | (F.col("s") > F.col("prev_max_e")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(w_run))
    )
    islands = marked.groupBy("k", "island").agg(
        (F.max("e") - F.min("s")).alias("len_us")
    )
    return islands.groupBy(F.col("k").alias(key_col)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("len_us").cast("bigint").alias("covered_us"),
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    val_col: str,
    id_col: str,
) -> DataFrame:
    """CUSUM change-point locator per key: walk the series in time
    order accumulating (value − series mean); the position where the
    cumulative deviation attains its maximum |S_i| is the classic
    change-point estimate (before a level shift the partial sums drift
    one way, after it they drift back — the elbow is the shift).
    Emits per key: n, the peak |S|, and the timestamp/id at the peak.

    Exactness: the per-key mean is subtracted as an exact DECIMAL
    (sum/n in decimal micro-units — see below), the running sum is a
    DECIMAL window cumsum (order-independent given the (ts, id) total
    order), and the argmax is a struct max with the unique id as
    tie-break. To avoid decimal-division scale drift between engines,
    S_i is scaled by n: T_i = n·Σ_{j≤i} v_j − i·Σ_all v_j (integer
    multiples of exact decimal sums — NO division anywhere until the
    rounded report), which has its |max| at the same position as S_i.
    One window sort per key + one aggregate."""
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "pid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("k")
    scored = (
        df.select(
            F.col(key_col).alias("k"),
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("pid"),
            F.col(val_col).cast("decimal(18,6)").alias("v"),
        )
        .withColumn("run", F.sum("v").over(w))
        .withColumn("i", F.row_number().over(Window.partitionBy("k").orderBy("ts", "pid")))
        .withColumn("n", F.count(F.lit(1)).over(tot))
        .withColumn("all_sum", F.sum("v").over(tot))
        .withColumn(
            "t_scaled",
            F.col("n") * F.col("run") - F.col("i") * F.col("all_sum"),
        )
    )
    return (
        scored.groupBy(F.col("k").alias(key_col))
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.max(
                F.struct(
                    F.abs(F.col("t_scaled")).alias("a"),
                    F.col("pid").alias("pid"),
                    F.col("i").alias("i"),
                )
            ).alias("peak"),
        )
        .select(
            key_col,
            "n",
            F.col("peak.pid").alias("peak_id"),
            F.col("peak.i").cast("bigint").alias("peak_pos"),
            # report S at the peak, unscaled: |T|/n — ONE double division
            F.round(
                F.col("peak.a").cast("double") / F.col("n"), 4
            ).alias("peak_cusum"),
        )
    )


def freshness_weights(
    events: DataFrame,
    half_life_days: int = 30,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Recency-decayed sampling quotas per event type: every event
    gets weight 2^(-age_days / half_life) relative to the newest event
    in the table, and each type's share of the total decayed mass is
    its freshness-weighted sampling quota — the "prefer recent data"
    mixing step (a crawl snapshot mix, a news-corpus refresh) made
    deterministic and exactly oracle-able.

    Exactness: age is a CALENDAR-day integer (datediff of dates — no
    float epoch math); the decay pow() runs once per DISTINCT age (the
    bounded-transcendental exposure class of q_naive_bayes — ages are
    a few thousand values, never per-event) and is integerized to
    floor(1e9 · 2^(-age/h)) BEFORE any summation, so every sum and the
    final shares are pure integer arithmetic + one division.

    Scale shape: max-ts is a one-row aggregate broadcast back; events
    collapse to the (type, age) table in one combinable groupBy; the
    weight table is ages-sized. Output: one row per type
    (event_type, n_events, weight_sum_micro9, share)."""
    mx = events.agg(F.max(F.to_date(F.col(ts_col))).alias("mxd"))
    aged = events.crossJoin(F.broadcast(mx)).select(
        F.col(type_col).alias("event_type"),
        F.datediff(F.col("mxd"), F.to_date(F.col(ts_col))).alias("age"),
    )
    per_age = aged.groupBy("event_type", "age").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w9 = F.floor(
        F.lit(1e9)
        * F.pow(
            F.lit(2.0),
            -F.col("age").cast("double") / F.lit(float(half_life_days)),
        )
    ).cast("bigint")
    per_type = (
        per_age.withColumn("w9", w9)
        .groupBy("event_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.sum(F.col("n") * F.col("w9")).cast("bigint").alias("wsum9"),
        )
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_type.withColumn("tot9", F.sum("wsum9").over(wall))
        .select(
            "event_type",
            "n_events",
            F.col("wsum9").alias("weight_sum_micro9"),
            F.round(F.col("wsum9") / F.col("tot9"), 6).alias("share"),
        )
        .orderBy("event_type")
    )


def theil_sen_trend(
    series: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Theil–Sen robust trend per group: the MEDIAN of all pairwise
    slopes (y_j − y_i)/(x_j − x_i), x_i < x_j — the outlier-immune
    slope (breakdown point ~29%) next to the OLS line of
    `corr_regr`/`ridge_closed_form`, which one bad day can drag
    arbitrarily. The standard robust-trend readout for per-source
    volume/quality drift.

    Input contract (stated, enforced by the caller): ``series`` is a
    PRE-AGGREGATED series — one row per (group, x), e.g. daily totals —
    so the pair self-join is bounded by days² per group, never raw
    rows² (the operator's quadratic is in the SERIES length, the same
    budget as `rolling_median`'s frame). Slopes are one IEEE division
    of exact integers (identical both engines); the median is the
    LOWER median picked by rank over the total order (slope, x_i, x_j)
    — deterministic, no interpolation, no float summation.

    Output: one row per group (grp, n_points, n_pairs, slope);
    single-point groups have no pairs and are absent (stated — a
    1-day series has no trend)."""
    base = series.select(
        F.col(group_col).alias("grp"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    a = base.select("grp", F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = base.select("grp", F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = (
        a.join(b, "grp")
        .where(F.col("xi") < F.col("xj"))
        .select(
            "grp",
            "xi",
            "xj",
            (
                (F.col("yj") - F.col("yi")).cast("double")
                / (F.col("xj") - F.col("xi"))
            ).alias("slope"),
        )
    )
    w = Window.partitionBy("grp").orderBy("slope", "xi", "xj")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    npts = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    return (
        ranked.where(F.col("rn") == F.expr("(cnt + 1) div 2"))
        .select(
            "grp",
            F.col("cnt").cast("bigint").alias("n_pairs"),
            F.round("slope", 6).alias("slope"),
        )
        .join(npts, "grp")
        .select("grp", "n_points", "n_pairs", "slope")
        .orderBy("grp")
    )
