"""Sink operators (SURVEY §2.1 S14-S18, §2.10 ST2).

The reference lands documents into per-(municipality, committee) buckets
with a canonical key and skip-if-exists idempotency
(`upload_to_wasabi`/`ensure_bucket_exists` scraper_utils.py:25-70, local
rename scraper.py:252-267). Spark-native: one partitioned columnar table
instead of bucket-per-source, with the existence probe batched into a
single anti-join against the landed-keys catalog.

Scale notes (100 TB):
- `partitionBy(municipality, committee)` gives partition pruning for the
  committee/municipality predicates (P3/P5) on every downstream read.
- The catalog read for the upsert only scans the key columns (column
  pruning) — not the blobs.
- Blob payloads should be landed from the fetch UDF and carried as
  paths + metadata through shuffles (SURVEY §7.4); these sinks write
  whatever columns they are given and do not re-shuffle blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """S14/S15 — partitioned columnar sink (scraper.py:188-197 bucket
    layout as Hive-style partition dirs)."""
    partition_cols = partition_cols or ["municipality", "committee"]
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def load_catalog(spark: SparkSession, path: str, keys: list[str]) -> DataFrame | None:
    """The landed-keys catalog: key columns only (column-pruned scan of
    the sink — the batched replacement for per-row head_object probes,
    scraper.py:210-222). None if nothing landed yet.

    Only the nothing-landed-yet case (missing path / empty dir with no
    schema) maps to None; any other read failure propagates — treating a
    transient catalog error as "empty" would make the idempotent upsert
    silently re-append already-landed rows."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).select(*keys).dropDuplicates(keys)
    except AnalysisException as exc:
        cond = (exc.getCondition() or "") if hasattr(exc, "getCondition") else ""
        msg = str(exc)
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA") or (
            "PATH_NOT_FOUND" in msg or "Unable to infer schema" in msg
        ):
            return None
        raise


def upsert_partitioned(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
) -> int:
    """ST2/J2 — idempotent landing: dedup the incoming batch on its
    natural key, anti-join the already-landed catalog, append only the
    remainder. Re-running with the same input lands ZERO new rows.

    Returns the number of rows written. The count is taken on a cached
    frame so the write and the count are the same data (no double fetch
    upstream)."""
    fresh = df.dropDuplicates(keys)
    existing = load_catalog(df.sparkSession, path, keys)
    if existing is not None:
        fresh = fresh.join(F.broadcast(existing), keys, "left_anti")
    fresh = fresh.cache()
    try:
        n = fresh.count()
        if n:
            write_partitioned(fresh, path, partition_cols, mode="append")
    finally:
        fresh.unpersist()
    return n


def write_csv(df: DataFrame, path: str) -> None:
    """S16 — CSV sink (the discovery output found_start_urls*.csv,
    get_start_url.py:147-162; no per-row flush — one distributed write)."""
    df.write.option("header", True).mode("overwrite").csv(path)


def write_text(df: DataFrame, path: str, col: str = "url") -> None:
    """S17 — text sink (all_municipality_urls.txt, get_base_url.py:120-123).
    Single ordered file: the list is small (one line per portal)."""
    df.select(F.col(col).cast("string").alias("value")).orderBy("value").coalesce(
        1
    ).write.mode("overwrite").text(path)


def write_dead_letter(
    ok_rows: DataFrame, bad_rows: DataFrame, path: str, quarantine_suffix: str = "_quarantine"
) -> None:
    """S18/C5 — dead-letter sink: good rows to the main table, failed rows
    (with their `error` column) to a quarantine path (the debug_failure.html
    dump of scraper_ishoej.py:107-110 as a queryable table). Never fails
    the job for one bad row."""
    ok_rows.write.mode("append").parquet(path)
    bad_rows.write.mode("append").parquet(path + quarantine_suffix)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Bucketed table for co-located joins: rows are hash-distributed into
    `num_buckets` files per partition by the join key and sorted within
    buckets, so a join of two tables bucketed the same way needs NO
    exchange and NO sort (plan-audited in test_plans) — the standard way
    to amortize one shuffle across every future join on that key at
    100 TB. Registered via saveAsTable (bucket metadata lives in the
    catalog); `path` makes it an external table."""
    w = df.write.bucketBy(num_buckets, *bucket_cols).sortBy(*bucket_cols)
    if path:
        w = w.option("path", path)
    w.mode("overwrite").saveAsTable(table)
