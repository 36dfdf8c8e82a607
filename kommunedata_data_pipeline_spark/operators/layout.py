"""Data-layout operators: Z-order clustering for multi-dimensional
data skipping (the lakehouse OPTIMIZE ZORDER BY pattern, expressed as
plain Spark writes).

A Z-value interleaves the bits of two quantized dimensions, so sorting/
partitioning by it co-locates rows that are close in BOTH dims. A scan
with a 2-D box predicate then prunes whole partitions: z is monotonic
in each coordinate, so every row inside box [a1,a2]x[b1,b2] has
z in [z(a1,b1), z(a2,b2)] — filtering the coarse z-bucket partition
column to that range is a conservative-correct partition pruning
(the classic BIGMIN refinement would tighten the range further; the
conservative range already turns a full scan into a few partitions).

All bit math is floor(x / 2^i) % 2 + exact BIGINT sums — engine-exact,
no UDFs, fully inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

Z_BITS = 12  # 12 bits per dim -> 24-bit z-values


def quantize(col: Column, width: float, bits: int = Z_BITS) -> Column:
    """Fixed-width quantizer clamped to the bit budget (stats-free: the
    width is a layout constant, not a data-dependent percentile, so
    writers on disjoint data slices produce compatible z-values)."""
    return F.least(
        F.greatest(F.floor(col / F.lit(width)), F.lit(0)).cast("bigint"),
        F.lit(2**bits - 1).cast("bigint"),
    )


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Interleave two ``bits``-wide nonnegative ints: bit i of ``a`` goes
    to position 2i+1, bit i of ``b`` to position 2i."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + (F.floor(a / F.pow(F.lit(2.0), i.cast("double")).cast("bigint")) % 2)
        * F.pow(F.lit(2.0), (2 * i + 1).cast("double")).cast("bigint")
        + (F.floor(b / F.pow(F.lit(2.0), i.cast("double")).cast("bigint")) % 2)
        * F.pow(F.lit(2.0), (2 * i).cast("double")).cast("bigint"),
    )


def z_value_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of ``z_value`` (same floor/2^i bit extraction)."""
    return (
        f"CAST(list_sum(list_transform(range(0, {bits}), i -> "
        f"(CAST(floor({a} / pow(2, i)) AS BIGINT) % 2) * CAST(pow(2, 2*i + 1) AS BIGINT) + "
        f"(CAST(floor({b} / pow(2, i)) AS BIGINT) % 2) * CAST(pow(2, 2*i) AS BIGINT)"
        f")) AS BIGINT)"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    a_col: str,
    b_col: str,
    a_width: float,
    b_width: float,
    bucket_shift: int = 12,
) -> None:
    """Z-order-clustered parquet: partition directories on the coarse
    z-bucket (top bits of z), rows within each partition sorted by full
    z. A 2-D box scan prunes partitions via the z_bucket range (see
    module docstring) and the within-file sort keeps parquet row-group
    min/max tight for row-group skipping below the partition level.
    Write amplification is one repartition — the same cost OPTIMIZE
    ZORDER pays, amortized over every multi-dim scan after it."""
    z = z_value(
        quantize(F.col(a_col), a_width), quantize(F.col(b_col), b_width)
    )
    (
        df.withColumn("z", z)
        .withColumn(
            "z_bucket",
            F.floor(
                F.col("z") / F.pow(F.lit(2.0), F.lit(bucket_shift)).cast("bigint")
            ),
        )
        .repartition("z_bucket")
        .sortWithinPartitions("z")
        .write.partitionBy("z_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def zbox_bucket_range(
    a_lo: float,
    a_hi: float,
    b_lo: float,
    b_hi: float,
    a_width: float,
    b_width: float,
    bucket_shift: int = 12,
    bits: int = Z_BITS,
) -> tuple[int, int]:
    """Partition-pruning bounds for a box query: the [lo, hi] z_bucket
    range that covers box [a_lo,a_hi]x[b_lo,b_hi] (driver-side constant
    arithmetic over the layout constants — no data access)."""

    def _q(v: float, w: float) -> int:
        return max(0, min(2**bits - 1, int(v // w)))

    def _z(a: int, b: int) -> int:
        out = 0
        for i in range(bits):
            out += ((a >> i) & 1) << (2 * i + 1)
            out += ((b >> i) & 1) << (2 * i)
        return out

    z_lo = _z(_q(a_lo, a_width), _q(b_lo, b_width))
    z_hi = _z(_q(a_hi, a_width), _q(b_hi, b_width))
    return z_lo >> bucket_shift, z_hi >> bucket_shift


def plan_compaction(
    files: DataFrame,
    part_col: str,
    size_col: str,
    order_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction plan: assign files to target-size output
    groups, per table partition — the maintenance pass every long-lived
    lake table needs (millions of 5 MB files turn scans into metadata
    storms; compaction restores splittable ~target-size objects).

    Assignment is cumsum-bucketing, NOT the strict streaming greedy:
    walk files in ``order_col`` order and bucket each file by which
    ``[k*target, (k+1)*target)`` interval its running-size prefix ends
    in (group = floor((cumsum-1)/target)). Consequences, documented on
    purpose: a group CAN close under target when a file straddles a
    bucket boundary (sizes [9, 9] at target 10 make two 9-byte groups,
    where the greedy would emit one 18-byte group), and a single file
    larger than the target consumes several raw bucket ids. Overflow
    stays bounded — a group exceeds target only via its final file —
    and under-fill is bounded by one straddling file per boundary,
    which is the trade for keeping assignment a pure window expression
    instead of an iterative packer. Raw bucket ids are renumbered with
    a dense_rank over the (tiny) per-group rollup so emitted group ids
    are contiguous from 0 per partition regardless of oversized files.

    Scale shape: one window partitioned by the TABLE partition
    (per-partition parallel sort over file *metadata* rows, never file
    contents) + one rollup + one dense_rank over the rollup rows (a few
    rows per partition — negligible); the output is the work list a
    rewrite job consumes group-by-group.
    """
    w = Window.partitionBy(part_col).orderBy(order_col)
    assigned = files.select(
        F.col(part_col).alias("part"),
        F.col(order_col).alias("f"),
        F.col(size_col).alias("sz"),
        F.floor((F.sum(size_col).over(w) - 1) / F.lit(target_bytes)).alias(
            "raw_grp"
        ),
    )
    rolled = assigned.groupBy("part", "raw_grp").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("sz").alias("total_bytes"),
        F.min("f").alias("first_file"),
        F.max("f").alias("last_file"),
    )
    dense = Window.partitionBy("part").orderBy("raw_grp")
    return rolled.select(
        "part",
        (F.dense_rank().over(dense) - 1).cast("bigint").alias("grp"),
        "n_files",
        "total_bytes",
        "first_file",
        "last_file",
    )


def zone_map_skip_stats(
    df: DataFrame,
    layouts: dict,
    value_col: str,
    lo,
    hi,
) -> DataFrame:
    """Zone-map (min/max file-statistics) skip audit: for each
    candidate physical LAYOUT — a named expression that buckets rows
    into files, e.g. insertion order vs date partitioning — compute
    per-file min/max of ``value_col`` and report how many files (and
    rows) a ``lo <= value_col <= hi`` predicate could skip without
    reading them. This is the measurement behind every layout decision
    (sort keys, partition columns, Z-order): parquet/iceberg/delta
    pruning reads ONLY footer stats, so skip_ratio here IS the scan
    cost saved at 100 TB — a layout whose files all straddle the
    predicate range prunes nothing no matter how selective the filter.

    A file can be skipped iff its zone is disjoint from the predicate
    interval: f_max < lo OR f_min > hi. One groupBy per layout (the
    ``layouts`` values are complete file-id expressions — bucketing
    rows into files is the caller's business); counts are
    exact integers, the ratio is one division. Output: one row per
    layout (layout, n_files, n_files_skipped, n_rows, n_rows_skipped,
    row_skip_ratio)."""
    outs = []
    for name, file_expr in layouts.items():
        per_file = (
            df.select(
                file_expr.alias("file_id"), F.col(value_col).alias("v")
            )
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("v").alias("f_min"),
                F.max("v").alias("f_max"),
            )
        )
        lo_c = lo if isinstance(lo, Column) else F.lit(lo)
        hi_c = hi if isinstance(hi, Column) else F.lit(hi)
        skipped = (F.col("f_max") < lo_c) | (F.col("f_min") > hi_c)
        outs.append(
            per_file.agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.sum(skipped.cast("bigint")).cast("bigint").alias(
                    "n_files_skipped"
                ),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum(F.when(skipped, F.col("n_rows")).otherwise(0))
                .cast("bigint")
                .alias("n_rows_skipped"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.select(
        "layout",
        "n_files",
        "n_files_skipped",
        "n_rows",
        "n_rows_skipped",
        F.round(F.col("n_rows_skipped") / F.col("n_rows"), 6).alias(
            "row_skip_ratio"
        ),
    ).orderBy("layout")


def partition_skew_audit(
    df: DataFrame,
    key_cols: dict,
    n_buckets: int = 32,
) -> DataFrame:
    """Shuffle-partition skew audit: for each candidate shuffle key,
    hash rows into ``n_buckets`` buckets (md5 — engine-stable, the
    same family Spark's HashPartitioner plays at runtime) and report
    the max/mean bucket ratio and the largest bucket's share — the
    measurement behind every salting / AQE-skew-join decision: a key
    whose max/mean is 5x serializes the reduce stage no matter how
    many executors the cluster has.

    ``key_cols`` maps audit name -> key Column. One groupBy per key
    over narrow (bucket) rows; counts exact integers, ratios single
    divisions. Output: one row per key (key_name, n_rows, n_buckets,
    max_bucket, skew_ratio, top_share)."""
    from ..functions.strings import md5_bigint

    outs = []
    for name, col in key_cols.items():
        b = (
            df.select(
                F.pmod(md5_bigint(col.cast("string")), F.lit(n_buckets))
                .alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        outs.append(
            b.agg(
                F.lit(name).alias("key_name"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_buckets_hit"),
                F.max("n").cast("bigint").alias("max_bucket"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.select(
        "key_name",
        "n_rows",
        "n_buckets_hit",
        "max_bucket",
        F.round(
            F.col("max_bucket")
            / (F.col("n_rows") / F.col("n_buckets_hit")),
            6,
        ).alias("skew_ratio"),
        F.round(F.col("max_bucket") / F.col("n_rows"), 6).alias("top_share"),
    ).orderBy("key_name")


def dict_encoding_audit(
    df: DataFrame,
    cols: list,
) -> DataFrame:
    """Dictionary-encodability audit per column: exact distinct count,
    total/average value bytes, and the estimated dictionary-encoding
    ratio (distinct values stored once + fixed-width codes vs raw
    bytes) — the storage-layout decision next to zone maps and
    Z-order: a 100 TB column at 0.1% cardinality dict-encodes ~100x,
    one at 90% cardinality shouldn't be dict-encoded at all.

    Estimate: dict_bytes = Σ distinct value lengths + 4·n (int32
    codes); ratio = dict_bytes / raw_bytes. Exact integers throughout
    (lengths and counts), one division on emission. One groupBy per
    column over (value) — combinable; columns audited independently.
    Output: (column, n_rows, n_distinct, raw_bytes, dict_bytes,
    est_ratio)."""
    outs = []
    for c in cols:
        v = df.select(F.col(c).cast("string").alias("v"))
        per = v.groupBy("v").agg(F.count(F.lit(1)).alias("n"))
        outs.append(
            per.agg(
                F.lit(c).alias("column"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
                F.sum(F.length("v") * F.col("n")).cast("bigint").alias(
                    "raw_bytes"
                ),
                (F.sum(F.length("v")) + 4 * F.sum("n"))
                .cast("bigint")
                .alias("dict_bytes"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.select(
        "column",
        "n_rows",
        "n_distinct",
        "raw_bytes",
        "dict_bytes",
        F.round(F.col("dict_bytes") / F.col("raw_bytes"), 6).alias(
            "est_ratio"
        ),
    ).orderBy("column")


def delete_amplification_audit(
    df: DataFrame,
    delete_pred,
    layouts: dict,
) -> DataFrame:
    """Right-to-be-forgotten cost audit: for each candidate physical
    LAYOUT (a file-id expression), how many files a copy-on-write
    delete of ``delete_pred`` rows must REWRITE, and the write
    amplification (rows rewritten per row actually deleted) — the
    measurement behind deletion-vector vs rewrite decisions and behind
    clustering the table by the delete key: deleting 0.1% of rows from
    files clustered by date touches every file (amplification ~1000x),
    from files clustered by the delete key touches only theirs (~1x).

    One groupBy per layout over (file_id, is_delete); exact integer
    counts, one division. Output: one row per layout (layout, n_files,
    n_files_touched, n_rows, n_rows_deleted, n_rows_rewritten,
    amplification)."""
    outs = []
    for name, file_expr in layouts.items():
        per_file = (
            df.select(
                file_expr.alias("file_id"),
                delete_pred.cast("int").alias("is_del"),
            )
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("is_del").alias("n_del"),
            )
        )
        touched = F.col("n_del") > 0
        outs.append(
            per_file.agg(
                F.lit(name).alias("layout"),
                F.count(F.lit(1)).cast("bigint").alias("n_files"),
                F.sum(touched.cast("bigint")).cast("bigint").alias(
                    "n_files_touched"
                ),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
                F.sum("n_del").cast("bigint").alias("n_rows_deleted"),
                # a copy-on-write delete rewrites every SURVIVING row of
                # a touched file
                F.sum(
                    F.when(touched, F.col("n_rows") - F.col("n_del"))
                    .otherwise(0)
                )
                .cast("bigint")
                .alias("n_rows_rewritten"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.select(
        "layout",
        "n_files",
        "n_files_touched",
        "n_rows",
        "n_rows_deleted",
        "n_rows_rewritten",
        F.round(
            F.col("n_rows_rewritten") / F.col("n_rows_deleted"), 6
        ).alias("amplification"),
    ).orderBy("layout")


def clustering_depth(
    df: DataFrame,
    layouts: dict,
    value_col: str,
) -> DataFrame:
    """Clustering-depth audit — the companion of `zone_map_skip_stats`:
    for each candidate LAYOUT (file-id expression), how many files'
    [min, max] zones OVERLAP at the worst point. Depth 1 = perfectly
    clustered (any point predicate touches one file); depth ≈ n_files
    = the key is scattered and zone maps prune nothing no matter how
    selective the filter. This is the metric Z-order/sort-key
    maintenance jobs optimize (OPTIMIZE ZORDER's "clustering depth").

    Plan: per-file min/max from one combinable groupBy per layout; the
    depth is a sweep-line over file BOUNDARY events (+1 at min, −1
    after max; starts sort before ends at a shared boundary so
    touching zones count as overlapping) with a running sum + max over
    the FILE-METADATA-sized event frame — the layout-family window
    contract (file counts, never rows). The global max is invariant to
    tie order inside an equal-(v, delta) run (the max is attained
    after the +1 run completes), so both engines agree. Output: one
    row per layout (layout, n_files, max_depth)."""
    outs = []
    for name, file_expr in layouts.items():
        zones = (
            df.select(file_expr.alias("fid"), F.col(value_col).alias("v"))
            .groupBy("fid")
            .agg(F.min("v").alias("f_min"), F.max("v").alias("f_max"))
        )
        events = zones.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("f_min").alias("v"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.col("f_max").alias("v"), F.lit(-1).alias("delta")
                    ),
                )
            ).alias("ev")
        ).select("ev.v", "ev.delta")
        ws = Window.orderBy(
            F.col("v").asc(), F.col("delta").desc()
        ).rowsBetween(Window.unboundedPreceding, 0)
        depth = events.withColumn("depth", F.sum("delta").over(ws))
        outs.append(
            depth.agg(
                F.lit(name).alias("layout"),
                (F.count(F.lit(1)) / 2).cast("bigint").alias("n_files"),
                F.max("depth").cast("bigint").alias("max_depth"),
            )
        )
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u.orderBy("layout")
