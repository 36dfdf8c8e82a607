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


def _log_dir(path: str) -> str:
    import os

    return os.path.join(path, "_kdp_log")


def committed_files(path: str) -> tuple[int, list[str]]:
    """Read the commit log: (latest version, table-relative data files).
    Version -1 = no committed table. Commit files are written atomically
    (content first, then an atomic link into the log), so a concurrent
    reader sees each commit fully or not at all."""
    import json
    import os

    d = _log_dir(path)
    if not os.path.isdir(d):
        return -1, []
    version, files = -1, []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            rec = json.load(f)
        version = max(version, rec["version"])
        files.extend(rec["added"])
    return version, files


def read_committed(spark: SparkSession, path: str) -> DataFrame | None:
    """Snapshot read of a merge_upsert table: ONLY files named by the
    commit log (an in-flight writer's staged/orphaned part files are
    invisible — the manifest, not the directory listing, defines the
    table). basePath keeps Hive-style partition columns."""
    import os

    _, files = committed_files(path)
    if not files:
        return None
    return spark.read.option("basePath", path).parquet(
        *[os.path.join(path, f) for f in files]
    )


def merge_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    max_retries: int = 20,
    _test_hook=None,
) -> int:
    """Concurrent-writer-safe idempotent upsert — the transactional
    upgrade of `upsert_partitioned` (whose read-catalog-then-append has
    a classic lost-update window: two writers can both see a key absent
    and both append it). Minimal Delta-protocol shape on a shared
    filesystem:

    - commit log `_kdp_log/{version:012d}.json` lists the data files
      each commit ADDED; reads (`read_committed`) resolve the manifest,
      never the directory listing;
    - optimistic concurrency: plan the anti-join against version V,
      stage new uniquely-named part files into the table dir (invisible
      until committed), then claim commit V+1 by ATOMIC link creation —
      the filesystem serializes the claim, exactly one writer per
      version wins;
    - a loser deletes its staged files, re-reads the log, re-anti-joins
      its remaining fresh rows against what the winner landed, and
      retries at the next version — duplicate keys lose the race
      instead of landing twice, and no writer's unique rows are lost.

    Replay (ST2) is preserved: re-running the same batch anti-joins to
    zero rows and writes nothing. A writer crashing mid-stage leaves
    orphaned part files that no commit references — invisible to reads;
    sweep them with `vacuum_uncommitted`. `_test_hook(attempt)` runs
    between staging and the commit claim (deterministic-interleaving
    seam for the concurrency test). Returns rows written.

    Contracts: ``df`` must not itself read from ``path`` (each retry
    re-plans it against a newer snapshot); and the log is read whole on
    every call — at very high commit counts the production upgrade is
    Delta-style log CHECKPOINT compaction, out of scope for this
    minimal protocol."""
    import json
    import os
    import shutil
    import uuid

    spark = df.sparkSession
    pcols = partition_cols or []
    batch = df.dropDuplicates(keys)
    for attempt in range(max_retries):
        version, _ = committed_files(path)
        fresh = batch
        snapshot = read_committed(spark, path)
        if snapshot is not None:
            existing = snapshot.select(*keys).dropDuplicates(keys)
            fresh = fresh.join(F.broadcast(existing), keys, "left_anti")
        fresh = fresh.cache()
        try:
            n = fresh.count()
            if n == 0:
                return 0
            stage = os.path.join(path, f"_kdp_stage_{uuid.uuid4().hex}")
            w = fresh.write
            if pcols:
                w = w.partitionBy(*pcols)
            w.mode("overwrite").parquet(stage)
        finally:
            fresh.unpersist()
        # move part files to their final (partition-preserving) homes
        # under collision-free names; they stay invisible until the
        # commit names them
        added = []
        for root, _dirs, fs in os.walk(stage):
            for fn in fs:
                if not fn.endswith(".parquet"):
                    continue
                rel_dir = os.path.relpath(root, stage)
                newname = f"part-{uuid.uuid4().hex}.snappy.parquet"
                dest_dir = (
                    path if rel_dir == "." else os.path.join(path, rel_dir)
                )
                os.makedirs(dest_dir, exist_ok=True)
                os.replace(
                    os.path.join(root, fn), os.path.join(dest_dir, newname)
                )
                added.append(
                    newname
                    if rel_dir == "."
                    else os.path.normpath(os.path.join(rel_dir, newname))
                )
        shutil.rmtree(stage, ignore_errors=True)
        if _test_hook is not None:
            _test_hook(attempt)
        # claim the next version: write content to a temp file, then
        # LINK it into the log — link(2) is atomic and fails with
        # EEXIST if another writer claimed this version first
        logd = _log_dir(path)
        os.makedirs(logd, exist_ok=True)
        cpath = os.path.join(logd, f"{version + 1:012d}.json")
        tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": version + 1, "added": added}, f)
        try:
            os.link(tmp, cpath)
            return n
        except FileExistsError:
            # lost the race: drop our (uncommitted, invisible) files
            # and retry against the winner's state
            for rel in added:
                try:
                    os.remove(os.path.join(path, rel))
                except OSError:
                    pass
        finally:
            os.remove(tmp)
    raise RuntimeError(
        f"merge_upsert: no commit after {max_retries} attempts ({path})"
    )


def vacuum_uncommitted(path: str) -> int:
    """Delete data files not referenced by any commit (crashed writers'
    orphans). Safe only when no writer is mid-stage; returns count."""
    import os

    _, files = committed_files(path)
    keep = {os.path.normpath(f) for f in files}
    removed = 0
    for root, dirs, fs in os.walk(path):
        dirs[:] = [
            d
            for d in dirs
            if d != "_kdp_log" and not d.startswith("_kdp_stage_")
        ]
        for fn in fs:
            full = os.path.join(root, fn)
            rel = os.path.normpath(os.path.relpath(full, path))
            if fn.endswith(".parquet") and rel not in keep:
                os.remove(full)
                removed += 1
    return removed


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
