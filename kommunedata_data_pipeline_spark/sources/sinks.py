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

Object-store portability (the 100 TB deployment note — VERDICT r10
#7): the transactional protocol below assumes exactly three POSIX
primitives, each with a standard S3-class substitute:
- the commit CLAIM uses `os.link` (atomic, fails-if-exists) — on an
  object store this becomes a conditional PUT (`If-None-Match: *` on
  S3/GCS/ABFS) or an external lock row (the DynamoDB pattern Delta's
  S3 LogStore uses) on the `{version}.json` key;
- atomic renames (`os.replace` for staged->final part files, zone/
  checkpoint manifests) become plain PUTs of uniquely-named objects —
  every name here is already collision-free (uuid part names,
  versioned manifests), so non-atomic rename is never actually
  required, only last-writer-wins PUT of a NEW key;
- driver-side directory walks (`committed_files` listing the log,
  `_parquet_bytes` sizing) become LIST calls against the same
  prefixes — both are metadata-sized (log files / file stats), never
  data-sized.
Data-file reads/writes go through Spark's Hadoop FS layer and need no
change. Nothing in the protocol relies on directory mtimes, inode
identity, or in-place file mutation.

Transactional-table feature inventory (the minimal-Delta protocol,
grown round by round; every arm pytest-verified):
- ACID commits: optimistic version claim by atomic link; staged files
  invisible until named by a commit (`merge_upsert`).
- MERGE family: upsert (insert-new-keys), update (CoW of exactly the
  changed-key files), delete (CoW or deletion-vector).
- Disjoint-commit concurrency (r12): commits record key ranges; a
  race loser provably disjoint from every intervening winner re-claims
  at the new head without re-planning (`_rebase_commit`).
- Schema evolution (r12): add-column + lossless widenings via
  `merge_upsert(merge_schema=True)`; schema rides in commit records
  and checkpoints; reads resolve schema as of the version.
- Deletion vectors (r12): `merge_delete(mode="dv")` — merge-on-read,
  O(delete) bytes; applied at scan, dropped at OPTIMIZE.
- Time travel: `read_committed(version=)`; raises beyond HEAD and on
  log-compacted history; vacuum retention IS the travel window.
- CDC: `read_changes(from, to)` — per-commit value-level file diffs;
  OPTIMIZE emits zero changes, updates emit delete+insert pairs.
- OPTIMIZE: whole-table or incremental (r12: fold only sub-threshold
  files — the blast radius a 100 TB table can afford), optional range
  clustering or multi-column Z-ORDER (r12: `cluster_method="zorder"`)
  for zone-map skipping.
- Per-file column statistics (r12): every commit records footer
  min/max/null-count/row-count for its added files (driver-side, zero
  Spark jobs) — serving `read_committed(prune=)` data skipping and
  metadata-only `metadata_count` / `metadata_min_max` (the
  `SELECT count(*)` that never opens a data file).
- CHECK constraints (r12): `set_check_constraint` validates existing
  rows, then every writer validates its batch before staging; the
  active map rides in commit records like the schema.
- Vacuum: retirement-time retention for CoW-retired files and dead DV
  sidecars; orphans age by mtime.
- Checkpoints every `CHECKPOINT_INTERVAL` commits carry files +
  schema + live vectors + stats + constraints: O(interval) log reads
  at any table age.
"""

from __future__ import annotations

from typing import NamedTuple

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


# Above this many bytes of landed data, the existing-keys side of the
# idempotency anti-join is NOT hint-forced to broadcast: the keyset of
# a long-lived table grows without bound, and a forced broadcast of
# billions of keys OOMs executors where a plain anti-join shuffles (or
# AQE still broadcasts it at runtime if the actual key columns turn
# out small — the hint removed is the FORCING, not the possibility).
# Data bytes on disk are a conservative upper bound for key bytes, and
# cost a driver-side file listing only (VERDICT r9 #2).
BROADCAST_KEYSET_MAX_BYTES = 256 * 1024 * 1024


def _parquet_bytes(path: str) -> int:
    """Driver-side total size of a table's parquet data files (listing
    only — never reads data)."""
    import os

    total = 0
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith("_")]
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _maybe_broadcast(existing: DataFrame, data_bytes: int) -> DataFrame:
    """Broadcast-hint the existing-keys frame only while the landed
    table is provably small; above the threshold return it unhinted so
    Spark (AQE at runtime) picks the join strategy from actual sizes."""
    if data_bytes <= BROADCAST_KEYSET_MAX_BYTES:
        return F.broadcast(existing)
    return existing


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
        fresh = fresh.join(
            _maybe_broadcast(existing, _parquet_bytes(path)),
            keys,
            "left_anti",
        )
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


# A checkpoint manifest is written every K commits so readers resolve
# O(K) log files instead of the whole history (VERDICT r9 "missing" #3
# — the Delta-style log compaction this minimal protocol deferred).
CHECKPOINT_INTERVAL = 10


def committed_files(
    path: str, version: int | None = None
) -> tuple[int, list[str]]:
    """Read the commit log: (latest version, table-relative data files).
    Version -1 = no committed table. Commit files are written atomically
    (content first, then an atomic link into the log), so a concurrent
    reader sees each commit fully or not at all.

    Resolution starts from the NEWEST checkpoint manifest (the full
    cumulative file list as of its version, written every
    `CHECKPOINT_INTERVAL` commits) and applies only the commits after
    it — O(interval) files read regardless of table age. Commits may
    carry a `removed` list (merge_update's copy-on-write rewrites);
    removal applies in version order before that commit's adds.

    ``version``: TIME TRAVEL — resolve the table AS OF that commit
    (the audit/debug read the `removed`-file retention exists to
    serve). Starts from the newest checkpoint <= version (checkpoints
    newer than the ask are ignored) or from scratch; raises
    ValueError if the state is no longer reconstructible (a
    pre-checkpoint commit needed for the replay was deleted) — and
    ALSO when the asked version exceeds HEAD (matching Delta's
    VersionNotFoundException: silently serving newer data than an
    audit asked for would mask caller bugs; ADVICE r11 #3)."""
    st = _resolve_log(path, version)
    return st.version, st.files


def table_schema(path: str, version: int | None = None):
    """The table schema AS OF ``version`` (default HEAD) as a
    StructType, or None for tables whose surviving log never recorded
    one (pre-schema-evolution history — readers fall back to parquet
    inference, the legacy behavior). Commit records carry the full
    post-commit schema (VERDICT r11 missing #3); the LAST record at or
    below ``version`` wins, so time travel reads each version with the
    columns/types it actually had."""
    from pyspark.sql.types import StructType

    schema_json = _resolve_log(path, version).schema_json
    if schema_json is None:
        return None
    return StructType.fromJson(schema_json)


# Lossless type-widening lattice for schema evolution: each pair maps
# to the type that can represent every value of both. Only conversions
# the parquet reader performs natively are listed (verified on this
# Spark: int32->int64, int32->double, float->double read widened in
# place) — anything else is an incompatible evolution and raises.
_INT_CHAIN = ("byte", "short", "integer", "long")


def _widen_atomic(a: str, b: str) -> str | None:
    """Widened typeName for two ATOMIC type names, or None when neither
    losslessly contains the other."""
    if a == b:
        return a
    pair = {a, b}
    if pair <= set(_INT_CHAIN):
        return _INT_CHAIN[max(_INT_CHAIN.index(a), _INT_CHAIN.index(b))]
    if pair == {"float", "double"}:
        return "double"
    # int-family <= 32 bits fits double exactly (53-bit mantissa);
    # long does NOT (lossy above 2^53) and is deliberately excluded
    small_ints = set(_INT_CHAIN[:3])
    if (a in small_ints and b in ("float", "double")) or (
        b in small_ints and a in ("float", "double")
    ):
        return "double"
    return None


def _merge_schemas(table_st, batch_st):
    """Schema evolution (VERDICT r11 missing #3): the union schema of
    the table and an incoming batch — table columns first (types
    widened where the batch widened them), then batch-only columns
    appended (old files null-fill them at read). Nested/complex types
    must match exactly (no nested evolution). All fields are recorded
    nullable: every historical file must remain readable under the
    evolved schema, and absent columns read as null.

    Returns (merged StructType, changed bool); raises ValueError on an
    evolution the parquet reader cannot serve in place (e.g.
    int->string, long->double)."""
    from pyspark.sql.types import StructField, StructType, _parse_datatype_string

    batch_by_name = {f.name: f for f in batch_st.fields}
    out = []
    changed = False
    for f in table_st.fields:
        b = batch_by_name.get(f.name)
        if b is None or b.dataType == f.dataType:
            out.append(StructField(f.name, f.dataType, True))
            continue
        a_n, b_n = f.dataType.typeName(), b.dataType.typeName()
        w = _widen_atomic(a_n, b_n)
        if w is None:
            raise ValueError(
                f"incompatible schema change on column {f.name!r}: "
                f"table {a_n} vs batch {b_n} (only add-column and "
                f"lossless widenings {_INT_CHAIN}->long, float->double,"
                " small-int->double are supported)"
            )
        wt = _parse_datatype_string("int" if w == "integer" else w)
        if wt != f.dataType:
            changed = True
        out.append(StructField(f.name, wt, True))
    table_names = {f.name for f in table_st.fields}
    for f in batch_st.fields:
        if f.name not in table_names:
            out.append(StructField(f.name, f.dataType, True))
            changed = True
    return StructType(out), changed


def _align_to(df: DataFrame, merged) -> DataFrame:
    """Cast ``df``'s columns to their (possibly widened) types in the
    merged schema. Only df's own columns — table columns the batch
    lacks stay absent from its files and null-fill at read."""
    by_name = {f.name: f.dataType for f in merged.fields}
    cols = []
    for f in df.schema.fields:
        tgt = by_name[f.name]
        cols.append(
            F.col(f.name).cast(tgt).alias(f.name)
            if tgt != f.dataType
            else F.col(f.name)
        )
    return df.select(*cols)


class _LogState(NamedTuple):
    """Resolved table state as of a version — the shared product of
    one log walk. ``dv`` maps a live data file to its deletion-vector
    sidecars as (sidecar rel, n rows in this sidecar for this file |
    None) pairs — the count rides in r12+ ``dv_added`` records so
    metadata-only aggregates can subtract deletes without reading the
    sidecar; None for pre-count history. ``stats`` maps a live data
    file to its footer statistics ({"rows": n, "cols": {col: [lo, hi,
    nulls]}}) when its commit recorded them; files absent here are
    conservatively unknown. ``constraints`` is the active CHECK map
    ({name: sql expr}) as of the version."""

    version: int
    files: list
    schema_json: dict | None
    dv: dict
    stats: dict
    constraints: dict


def _dv_pair(entry) -> tuple[str, int | None]:
    """Normalize a dv-map value element: pre-r12 checkpoints stored
    bare sidecar rels, r12+ stores [sidecar, count]."""
    if isinstance(entry, str):
        return entry, None
    return entry[0], (entry[1] if len(entry) > 1 else None)


def _enforce_constraints(frame: DataFrame, constraints: dict) -> None:
    """CHECK enforcement at commit time, SQL semantics: a row violates
    a constraint only when the expression evaluates to FALSE (null
    passes — `x > 0` admits null x; add `x IS NOT NULL` to forbid it).
    One take(1) job per active constraint on the commit-sized frame;
    raises naming the first violated constraint with a sample row."""
    for name in sorted(constraints):
        expr = constraints[name]
        bad = frame.where(F.expr(expr) == F.lit(False)).take(1)
        if bad:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated, e.g. by "
                f"row {bad[0].asDict()}"
            )


def _with_missing_nulls(frame: DataFrame, merged) -> DataFrame:
    """``frame`` plus null columns for every merged-schema field it
    lacks — constraint expressions reference TABLE columns, and a
    batch that omits an evolved column inserts null there (which is
    exactly what the CHECK must see)."""
    have = set(frame.columns)
    add = [
        F.lit(None).cast(f.dataType).alias(f.name)
        for f in merged.fields
        if f.name not in have
    ]
    return frame.select("*", *add) if add else frame


def table_constraints(path: str, version: int | None = None) -> dict:
    """The active CHECK constraints ({name: sql expr}) as of
    ``version`` (default HEAD). Constraints ride in commit records
    like the schema (a set/drop commit carries the full post-commit
    map; the last record carrying one wins) and in checkpoints, so
    resolution stays O(interval)."""
    return dict(_resolve_log(path, version).constraints)


def set_check_constraint(
    spark: SparkSession,
    path: str,
    name: str,
    expr: str,
    max_retries: int = 20,
) -> None:
    """Add/replace a CHECK constraint on the committed table (the
    Delta `ALTER TABLE ADD CONSTRAINT` shape): validates every
    EXISTING row first (a constraint the table already violates is
    rejected with the offending row), then commits a metadata-only
    record carrying the full active map. From that version on, every
    `merge_upsert`/`merge_update` validates the rows it writes before
    staging and refuses the whole batch on a violation.

    Concurrency: the record carries no ``key_ranges``, so EVERY
    concurrent writer's disjoint-commit rebase refuses to jump it and
    full-retries against the new head — where it sees and enforces the
    new constraint. A writer can never race a row past a constraint:
    winning the version claim requires planning at the previous
    version, and a plan at any version >= the constraint commit
    enforces it."""
    for _ in range(max_retries):
        lst = _resolve_log(path)
        if lst.version < 0:
            raise ValueError(
                f"set_check_constraint: no committed table at {path}"
            )
        snap = read_committed(spark, path)
        if snap is not None:
            _enforce_constraints(snap, {name: expr})
        new = dict(lst.constraints)
        new[name] = expr
        if _try_commit(
            path,
            lst.version,
            [],
            schema_json=lst.schema_json,
            constraints=new,
        ):
            return
    raise RuntimeError(
        f"set_check_constraint: no commit after {max_retries} attempts"
    )


def drop_check_constraint(
    path: str, name: str, max_retries: int = 20
) -> None:
    """Remove a CHECK constraint: commits the full post-drop map (an
    EMPTY map is recorded explicitly — absence means 'unchanged', not
    'none'). Unknown names raise."""
    for _ in range(max_retries):
        lst = _resolve_log(path)
        if name not in lst.constraints:
            raise ValueError(
                f"drop_check_constraint: no constraint {name!r} on {path}"
            )
        new = {k: v for k, v in lst.constraints.items() if k != name}
        if _try_commit(
            path,
            lst.version,
            [],
            schema_json=lst.schema_json,
            constraints=new,
        ):
            return
    raise RuntimeError(
        f"drop_check_constraint: no commit after {max_retries} attempts"
    )


def _resolve_log(path: str, version: int | None = None) -> _LogState:
    """Shared log walk: the `_LogState` (live files, schema, deletion
    vectors, per-file stats, constraints) as of ``version`` (default
    HEAD). DV/stats entries accumulate across commits; entries whose
    data file a later commit retired are dropped here (their rows left
    the table with the file) so reads never scan dead vectors or trust
    stale statistics."""
    import json
    import os

    d = _log_dir(path)
    if not os.path.isdir(d):
        return _LogState(-1, [], None, {}, {}, {})
    names = os.listdir(d)
    base_version, files = -1, []
    schema_json: dict | None = None
    dv: dict[str, list] = {}  # data file rel -> [(sidecar, n|None)]
    stats: dict[str, dict] = {}  # data file rel -> footer stats
    constraints: dict[str, str] = {}
    all_ckpts = sorted(
        n
        for n in names
        if n.startswith("checkpoint-") and n.endswith(".json")
    )
    ckpts = all_ckpts
    if version is not None:
        ckpts = [
            n
            for n in ckpts
            if int(n[len("checkpoint-"): -len(".json")]) <= version
        ]
    if ckpts:
        with open(os.path.join(d, ckpts[-1])) as f:
            rec = json.load(f)
        base_version, files = rec["version"], list(rec["files"])
        schema_json = rec.get("schema")
        dv = {
            k: [_dv_pair(e) for e in v]
            for k, v in rec.get("dv", {}).items()
        }
        stats = dict(rec.get("stats", {}))
        constraints = dict(rec.get("constraints", {}))
    resolved = base_version
    for name in sorted(
        n
        for n in names
        if n.endswith(".json") and not n.startswith((".", "checkpoint-"))
    ):
        v = int(name[: -len(".json")])
        if v <= base_version or (version is not None and v > version):
            continue
        if v != resolved + 1:
            # a gap can only mean deleted pre-checkpoint commits that a
            # time-travel replay still needs — never a torn write (the
            # atomic link serializes versions densely)
            raise ValueError(
                f"cannot resolve version {version} of {path}: commit "
                f"{resolved + 1} is missing (pre-checkpoint commits "
                "were removed); oldest reconstructible state is the "
                "nearest surviving checkpoint"
            )
        with open(os.path.join(d, name)) as f:
            rec = json.load(f)
        resolved = rec["version"]
        removed = set(rec.get("removed", []))
        if removed:
            files = [f for f in files if f not in removed]
            for r in removed:
                dv.pop(r, None)
                stats.pop(r, None)
        files.extend(rec["added"])
        if rec.get("schema") is not None:
            schema_json = rec["schema"]
        if rec.get("constraints") is not None:
            constraints = dict(rec["constraints"])
        stats.update(rec.get("stats", {}))
        for ent in rec.get("dv_added", []):
            data_rel, sidecar = ent[0], ent[1]
            n = ent[2] if len(ent) > 2 else None
            dv.setdefault(data_rel, []).append((sidecar, n))
    if version is not None and resolved < version:
        # distinguish "asked beyond HEAD" (raise: the version does not
        # exist — Delta's VersionNotFoundException; silently resolving
        # to HEAD would let a typo'd audit read newer data and "pass")
        # from "version existed but its commits were deleted" (also
        # raise, with the log-compaction explanation)
        head_known = max(
            (
                int(n[:-len(".json")].removeprefix("checkpoint-"))
                for n in names
                if n.endswith(".json") and not n.startswith(".")
            ),
            default=-1,
        )
        if head_known > version:
            raise ValueError(
                f"cannot resolve version {version} of {path}: its "
                "commits were removed (log compaction); oldest "
                "reconstructible state is the nearest surviving "
                "checkpoint"
            )
        raise ValueError(
            f"cannot resolve version {version} of {path}: latest "
            f"committed version is {head_known}"
        )
    return _LogState(resolved, files, schema_json, dv, stats, constraints)


def table_history(path: str) -> list[dict]:
    """Commit-by-commit audit trail of a transactional table: one dict
    per surviving commit file — version, wall-clock ``ts`` (None for
    commits written before timestamps landed), files added/removed.
    Driver-side log listing only (never reads data)."""
    import json
    import os

    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(
        n
        for n in os.listdir(d)
        if n.endswith(".json") and not n.startswith((".", "checkpoint-"))
    ):
        with open(os.path.join(d, name)) as f:
            rec = json.load(f)
        out.append(
            {
                "version": rec["version"],
                "ts": rec.get("ts"),
                "n_added": len(rec.get("added", [])),
                "n_removed": len(rec.get("removed", [])),
            }
        )
    return out


def _json_scalar(v) -> bool:
    """True for values whose ordering survives a JSON round-trip
    (commit records are JSON): int/float/str/bool, no NaN/inf, no
    bytes/dates. Anything else is simply not recorded — conservative,
    the file is read instead of skipped."""
    import math

    if isinstance(v, bool):
        return True
    if isinstance(v, (int, str)):
        return True
    if isinstance(v, float):
        return math.isfinite(v)
    return False


def _footer_stats(path: str, rels: list[str]) -> dict:
    """Per-file column statistics read from the staged parquet FOOTERS
    — driver-side, zero Spark jobs (the Delta/Iceberg write-side stats
    collection; VERDICT r11 engine-extension direction): {rel:
    {"rows": n, "cols": {col: [min, max, null_count]}}}. Only
    top-level atomic columns whose min/max are JSON-safe get entries;
    an all-null column records [null, null, rows] (sound to skip for
    any value probe — it holds no non-null values); a column whose
    stats any row group failed to write gets NO entry (conservative:
    probes on it never skip). Multi-row-group files fold min/min and
    max/max. Partition columns live in the directory names, not the
    footers — they get no entry here (partition pruning is the
    directory layout's job)."""
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # stats are an optimization, never a gate
        return {}
    out = {}
    for rel in rels:
        try:
            md = pq.ParquetFile(os.path.join(path, rel)).metadata
        except Exception:
            continue
        # col -> [lo, hi, nulls] | None (= proven unusable)
        agg: dict[str, list | None] = {}
        for gi in range(md.num_row_groups):
            rg = md.row_group(gi)
            for ci in range(rg.num_columns):
                c = rg.column(ci)
                name = c.path_in_schema
                if "." in name:  # nested leaf: not a top-level column
                    continue
                if name in agg and agg[name] is None:
                    continue
                s = c.statistics
                cur = agg.get(name)
                if s is None or s.null_count is None:
                    agg[name] = None
                    continue
                if s.has_min_max:
                    lo, hi = s.min, s.max
                    if not (_json_scalar(lo) and _json_scalar(hi)):
                        agg[name] = None
                        continue
                elif s.null_count == rg.num_rows:
                    lo = hi = None  # all-null row group
                else:
                    agg[name] = None
                    continue
                if cur is None:  # absent (poisoned entries skipped above)
                    agg[name] = [lo, hi, s.null_count]
                else:
                    if lo is not None and (
                        cur[0] is None or lo < cur[0]
                    ):
                        cur[0] = lo
                    if hi is not None and (
                        cur[1] is None or hi > cur[1]
                    ):
                        cur[1] = hi
                    cur[2] += s.null_count
        cols = {k: v for k, v in agg.items() if v is not None}
        out[rel] = {"rows": md.num_rows, "cols": cols}
    return out


def _stats_ranges(entry: dict | None) -> dict | None:
    """Commit-record stats entry -> the {col: [lo, hi]} shape
    `zones._file_matches` prunes with; None (always read) for files
    without recorded stats."""
    if entry is None:
        return None
    return {c: [v[0], v[1]] for c, v in entry.get("cols", {}).items()}


def metadata_count(path: str, version: int | None = None) -> int | None:
    """Exact row count of the committed table answered from the LOG
    ALONE — zero data files opened (the `SELECT count(*)` every table
    format serves from metadata at 100 TB): sum of the per-file footer
    row counts recorded by each commit, minus the per-file deletion
    -vector row counts recorded by each DV commit. Returns None when
    any live file predates stats recording or any live DV predates
    count recording (the honest "not answerable from metadata" —
    fall back to `read_committed(...).count()`)."""
    st = _resolve_log(path, version)
    total = 0
    for rel in st.files:
        ent = st.stats.get(rel)
        if ent is None or "rows" not in ent:
            return None
        total += ent["rows"]
    for rel, pairs in st.dv.items():
        for _sidecar, n in pairs:
            if n is None:
                return None
            total -= n
    return total


def metadata_min_max(
    path: str, col: str, version: int | None = None
) -> tuple | None:
    """(min, max, exact) of ``col`` over the committed table answered
    from the log's per-file stats — zero data files opened. ``exact``
    is False when any live file carries deletion vectors (a deleted
    row may have been the extremum, so the values are then BOUNDS:
    true min >= reported min is wrong — true min is >= nothing; the
    reported range CONTAINS the true range). Returns None when any
    live nonempty file lacks stats for ``col`` (not answerable), and
    (None, None, True) for a table with no non-null values."""
    st = _resolve_log(path, version)
    lo = hi = None
    exact = not st.dv
    for rel in st.files:
        ent = st.stats.get(rel)
        if ent is None:
            return None
        if ent.get("rows", 0) == 0:
            continue
        c = ent.get("cols", {}).get(col)
        if c is None:
            return None
        flo, fhi, _nulls = c
        if flo is None:  # all-null file: contributes no values
            continue
        if lo is None or flo < lo:
            lo = flo
        if hi is None or fhi > hi:
            hi = fhi
    return lo, hi, exact


def _maybe_checkpoint(path: str, version: int) -> None:
    """Best-effort checkpoint manifest after winning commit `version`:
    the FULL table state at that version — cumulative file list, the
    schema as of the version, live deletion vectors — resolved from
    the log (O(interval) metadata reads, every K commits) and written
    atomically (tmp + rename). Readers that never see it just walk
    more commit files; a torn write is impossible and a duplicate (two
    winners of different versions checkpointing concurrently) is
    harmless — resolution takes the newest."""
    import json
    import os
    import uuid

    if version < 0 or (version + 1) % CHECKPOINT_INTERVAL != 0:
        return
    st = _resolve_log(path, version)
    rec = {"version": st.version, "files": st.files}
    if st.schema_json is not None:
        rec["schema"] = st.schema_json
    if st.dv:
        rec["dv"] = {
            k: [[s, n] for s, n in v] for k, v in st.dv.items()
        }
    if st.stats:
        rec["stats"] = st.stats
    if st.constraints:
        rec["constraints"] = st.constraints
    d = _log_dir(path)
    tmp = os.path.join(d, f".ckpt-tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(d, f"checkpoint-{version:012d}.json"))


def read_committed(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: dict | None = None,
) -> DataFrame | None:
    """Snapshot read of a merge_upsert table: ONLY files named by the
    commit log (an in-flight writer's staged/orphaned part files are
    invisible — the manifest, not the directory listing, defines the
    table). basePath keeps Hive-style partition columns.

    ``version``: time-travel read AS OF that commit — pre-update/
    pre-delete values are visible because merge_update's copy-on-write
    keeps retired files on disk until `vacuum_uncommitted`'s retention
    lets them go. Reading a version whose retired files were already
    vacuumed fails at scan time (the honest failure mode every
    table format shares); size the vacuum retention to the audit
    window (retention IS the time-travel window).

    Schema: read under the schema RECORDED as of the version (schema
    evolution support) — files written before a column was added
    null-fill it; files written before a widening are read at the
    widened type (in-place parquet widening). Tables whose surviving
    log never recorded a schema fall back to parquet inference, the
    legacy behavior.

    Deletion vectors: rows a `merge_delete(mode="dv")` commit marked
    deleted are filtered here via a (file, row position) anti-join
    against the live DV sidecars — merge-on-read; the data files are
    untouched until OPTIMIZE rewrites them.

    ``prune``: statistics-based file skipping ({col: ("range", lo,
    hi) | ("set", sorted values)}): files whose commit-recorded footer
    stats prove no row can match are never opened — combine with a
    clustered layout (`optimize_table(cluster_by=...)`) for the
    Delta/Iceberg data-skipping read. CALLER CONTRACT: the probe must
    be implied by the filter actually applied to the result (a probe
    value never matches a null), otherwise rows are silently missing.
    """
    df = _scan_committed(spark, path, version=version, prune=prune)
    if df is None:
        return None
    return df.drop("__kdp_file", "__kdp_pos")


def _scan_committed(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    only_files: list[str] | None = None,
    prune: dict | None = None,
) -> DataFrame | None:
    """The manifest-resolved scan all committed reads share: files as
    of the version, the recorded schema applied, deletion-vector rows
    filtered — plus `__kdp_file` (table-relative source file) and
    `__kdp_pos` (row position in file) stamped FROM THE SCAN for
    callers that need row provenance (CoW rewrites, DV staging).
    Stamping at the scan matters: `_metadata` pseudo-columns resolve
    only on a file-source frame, and `input_file_name()` through a
    join is whichever side streams — both footguns this helper
    removes. The DV anti-join is on (file, pos); the DV side is
    delete-sized (size-gated broadcast).

    ``only_files``: restrict the scan (and its DV application) to a
    subset of the version's live files — the incremental-OPTIMIZE
    read, whose blast radius must be the picked files, not the
    table.

    ``prune``: statistics-based FILE SKIPPING ({col: ("range", lo, hi)
    | ("set", sorted values)}, the `zones` probe spec): a live file is
    dropped from the scan when its commit-recorded footer stats prove
    no row can match — the Delta/Iceberg data-skipping read. Sound
    under the caller contract that its post-filter only accepts rows
    whose ``col`` is a NON-NULL value inside the probe (SQL predicates
    on a column never match null); files whose commit predates stats
    recording are always read."""
    import os

    from pyspark.sql.types import StructType

    from .zones import _file_matches

    st = _resolve_log(path, version)
    files, schema_json, dv = st.files, st.schema_json, dict(st.dv)
    if only_files is not None:
        live = set(files)
        files = [f for f in only_files if f in live]
    if prune:
        files = [
            f
            for f in files
            if _file_matches(_stats_ranges(st.stats.get(f)), prune)
        ]
    if only_files is not None or prune:
        subset = set(files)
        dv = {k: v for k, v in dv.items() if k in subset}
    if not files:
        return None
    r = spark.read.option("basePath", path)
    if schema_json is not None:
        r = r.schema(StructType.fromJson(schema_json))
    df = r.parquet(*[os.path.join(path, f) for f in files])
    # table-relative source path: the DV sidecars and commit records
    # store relatives so the table stays movable
    prefix = "file:" + os.path.abspath(path) + "/"
    df = df.withColumn(
        "__kdp_file",
        F.expr(f"substring(_metadata.file_path, {len(prefix) + 1})"),
    ).withColumn("__kdp_pos", F.col("_metadata.row_index"))
    if not dv:
        return df
    sidecars = sorted({s for v in dv.values() for s, _n in v})
    sidecar_bytes = 0
    for s_ in sidecars:
        try:
            sidecar_bytes += os.path.getsize(os.path.join(path, s_))
        except OSError:
            pass
    vecs = spark.read.parquet(
        *[os.path.join(path, s) for s in sidecars]
    )
    return df.join(
        _maybe_broadcast(vecs, sidecar_bytes),
        on=[
            df["__kdp_file"] == vecs["file"],
            df["__kdp_pos"] == vecs["pos"],
        ],
        how="left_anti",
    )


def _stage_part_files(
    frame: DataFrame, path: str, pcols: list[str]
) -> list[str]:
    """Write ``frame`` into the table dir as INVISIBLE data files: a
    staging write, then each part file moved to its final
    (partition-preserving) home under a collision-free name. Nothing
    references the files until a commit names them. Returns the
    table-relative paths."""
    import os
    import shutil
    import uuid

    stage = os.path.join(path, f"_kdp_stage_{uuid.uuid4().hex}")
    w = frame.write
    if pcols:
        w = w.partitionBy(*pcols)
    w.mode("overwrite").parquet(stage)
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
    return added


def merge_upsert(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    max_retries: int = 20,
    merge_schema: bool = False,
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
    re-plans it against a newer snapshot). Log reads resolve from the
    newest CHECKPOINT manifest (written every `CHECKPOINT_INTERVAL`
    commits by the winner) plus the commits after it — O(interval)
    files per read at any table age. The existing-keys anti-join is
    broadcast-hinted only below `BROADCAST_KEYSET_MAX_BYTES` of
    committed data (the keyset grows without bound over a table's
    life; above the threshold the join strategy is left to
    Spark/AQE).

    SCHEMA EVOLUTION (``merge_schema=True``): a batch may ADD columns
    (old files null-fill them at read) or losslessly WIDEN a column
    (int-chain->long, float->double, small-int->double — exactly the
    widenings the parquet reader serves in place); the commit records
    the evolved schema, `read_committed` resolves schema as of its
    version, and concurrent schema changes conflict with every
    in-flight commit (full retry). With ``merge_schema=False`` (the
    default) a mismatched batch raises instead of silently landing
    files future readers can't reconcile. Incompatible changes
    (int->string, drops, nested edits) always raise."""
    import os

    spark = df.sparkSession
    pcols = partition_cols or []
    batch = df.dropDuplicates(keys)
    for attempt in range(max_retries):
        lst = _resolve_log(path)
        version, cur_files = lst.version, lst.files
        active = lst.constraints
        base_schema_json = None
        snapshot = read_committed(spark, path)
        if snapshot is None:
            # first commit defines the schema (normalized nullable)
            merged, _ = _merge_schemas(batch.schema, batch.schema)
            schema_json = merged.jsonValue()
            fresh = _align_to(batch, merged)
        else:
            recorded = table_schema(path)
            if recorded is not None:
                base_schema_json = recorded.jsonValue()
            eff = recorded if recorded is not None else snapshot.schema
            merged, changed = _merge_schemas(eff, batch.schema)
            if changed and not merge_schema:
                raise ValueError(
                    f"merge_upsert: batch schema differs from table "
                    f"schema at {path} (new/widened columns); pass "
                    "merge_schema=True to evolve the table"
                )
            schema_json = merged.jsonValue()
            fresh = _align_to(batch, merged)
            existing = snapshot.select(*keys).dropDuplicates(keys)
            committed_bytes = 0
            for rel in cur_files:
                try:
                    committed_bytes += os.path.getsize(
                        os.path.join(path, rel)
                    )
                except OSError:
                    pass
            fresh = fresh.join(
                _maybe_broadcast(existing, committed_bytes),
                keys,
                "left_anti",
            )
        fresh = fresh.cache()
        try:
            # one stats job: row count + conflict ranges together
            # (VERDICT r12 #5 — was two jobs on the cached frame)
            r = fresh.agg(
                F.count(F.lit(1)).alias("__n"), *_key_range_aggs(keys)
            ).first()
            n = int(r["__n"])
            if n == 0:
                return 0
            if active:
                _enforce_constraints(
                    _with_missing_nulls(fresh, merged), active
                )
            kr = _key_ranges_from_row(r, keys)
            added = _stage_part_files(fresh, path, pcols)
        finally:
            fresh.unpersist()
        stats = _footer_stats(path, added)
        if _test_hook is not None:
            _test_hook(attempt)
        if _try_commit(
            path,
            version,
            added,
            key_ranges=kr,
            cleanup_on_loss=False,
            schema_json=schema_json,
            stats=stats,
        ):
            return n
        # lost the race — DISJOINT-COMMIT fast path first: if every
        # intervening winner touched provably different keys, land the
        # same staged files at the new head (zero re-plan/re-stage);
        # only a TRUE conflict pays the full retry
        if _rebase_commit(
            path,
            version,
            added,
            (),
            kr,
            schema_json=schema_json,
            base_schema_json=base_schema_json,
            stats=stats,
        ):
            return n
        _delete_staged(path, added)
    raise RuntimeError(
        f"merge_upsert: no commit after {max_retries} attempts ({path})"
    )


def _try_commit(
    path: str,
    version: int,
    added: list[str],
    removed: list[str] | tuple = (),
    key_ranges: dict | None = None,
    cleanup_on_loss: bool = True,
    schema_json: dict | None = None,
    dv_added: list | None = None,
    stats: dict | None = None,
    constraints: dict | None = None,
) -> bool:
    """Claim commit ``version + 1``: write the record to a temp file,
    then LINK it into the log — link(2) is atomic and fails with
    EEXIST if another writer claimed this version first. On a win,
    maybe write the checkpoint manifest and return True. On a loss,
    delete the caller's (uncommitted, invisible) staged files — unless
    ``cleanup_on_loss=False`` (the rebase path keeps them for a
    re-claim at the new head) — and return False.

    ``key_ranges`` ({col: [lo, hi]} over the keys this commit wrote,
    updated or deleted) is recorded for DISJOINT-COMMIT detection:
    a later loser may re-claim without re-staging iff its ranges are
    provably disjoint from every intervening winner's (`_rebase_commit`).

    ``schema_json`` is the full POST-commit table schema (recorded by
    every writer; the last record wins at resolution — schema
    evolution and schema-as-of-version time travel). ``dv_added`` is a
    list of (data file rel, dv sidecar rel, n rows) triples for
    merge-on-read deletes. ``stats`` maps each added file to its
    footer statistics (`_footer_stats`) — the data-skipping and
    metadata-only-aggregate source. ``constraints`` (only set/drop
    constraint commits pass it) is the full POST-commit CHECK map;
    absent means unchanged."""
    import json
    import os
    import time
    import uuid

    logd = _log_dir(path)
    os.makedirs(logd, exist_ok=True)
    cpath = os.path.join(logd, f"{version + 1:012d}.json")
    tmp = os.path.join(logd, f".tmp-{uuid.uuid4().hex}")
    rec = {"version": version + 1, "added": added, "ts": time.time()}
    if removed:
        rec["removed"] = list(removed)
    if key_ranges is not None:
        rec["key_ranges"] = key_ranges
    if schema_json is not None:
        rec["schema"] = schema_json
    if dv_added:
        rec["dv_added"] = [list(p) for p in dv_added]
    if stats:
        rec["stats"] = stats
    if constraints is not None:
        rec["constraints"] = constraints
    with open(tmp, "w") as f:
        json.dump(rec, f)
    try:
        os.link(tmp, cpath)
        _maybe_checkpoint(path, version + 1)
        return True
    except FileExistsError:
        if cleanup_on_loss:
            _delete_staged(path, added)
        return False
    finally:
        os.remove(tmp)


def _delete_staged(path: str, added: list[str]) -> None:
    """Drop a loser's (uncommitted, invisible) staged part files."""
    import os

    for rel in added:
        try:
            os.remove(os.path.join(path, rel))
        except OSError:
            pass


def _key_range_aggs(keys: list[str]) -> list:
    """The min/max/null-count aggregate columns `_key_ranges` needs —
    exposed so a caller folding several per-commit stats into ONE job
    (merge_update/merge_delete, VERDICT r12 next #5) can append these
    to its own aggregation instead of paying a separate pass."""
    aggs = []
    for k in keys:
        aggs.append(F.min(k).alias(f"__lo_{k}"))
        aggs.append(F.max(k).alias(f"__hi_{k}"))
        aggs.append(
            F.sum(F.col(k).isNull().cast("int")).alias(f"__n_{k}")
        )
    return aggs


def _key_ranges_from_row(r, keys: list[str]) -> dict | None:
    """Parse `_key_range_aggs` output into the commit-record ranges
    (same contract as `_key_ranges`)."""
    out = {}
    for k in keys:
        if r[f"__n_{k}"]:
            return None  # null keys sit outside any range: no bound
        lo, hi = r[f"__lo_{k}"], r[f"__hi_{k}"]
        if lo is None:
            return None  # empty frame: caller shouldn't commit anyway
        if not isinstance(lo, (int, float, str)) or isinstance(
            lo, bool
        ):
            return None
        out[k] = [lo, hi]
    return out


def _merge_key_range_rows(rows, keys: list[str]) -> dict | None:
    """Combine several `_key_range_aggs` rows (one per group of a
    grouped stats job) into the global conflict ranges — same contract
    as `_key_ranges` (None when any key holds nulls / a non-comparable
    type / no rows)."""
    out = {}
    for k in keys:
        if any(r[f"__n_{k}"] for r in rows):
            return None
        los = [r[f"__lo_{k}"] for r in rows if r[f"__lo_{k}"] is not None]
        his = [r[f"__hi_{k}"] for r in rows if r[f"__hi_{k}"] is not None]
        if not los:
            return None
        lo, hi = min(los), max(his)
        if not isinstance(lo, (int, float, str)) or isinstance(lo, bool):
            return None
        out[k] = [lo, hi]
    return out


def _key_ranges(frame: DataFrame, keys: list[str]) -> dict | None:
    """{key col: [lo, hi]} over ``frame`` — the commit record's
    conflict-detection ranges. None (= always-conflict, the
    conservative value) when a key column holds nulls or a
    non-JSON-comparable type (only int/float/str survive a JSON
    round-trip with ordering intact; dates/timestamps would compare a
    live object against a serialized string). One tiny agg job on an
    already-cached/checkpointed frame."""
    r = frame.agg(*_key_range_aggs(keys)).first()
    return _key_ranges_from_row(r, keys)


def _ranges_disjoint(a: dict, b: dict) -> bool:
    """True iff the two commits provably touched no common key tuple:
    disjoint on AT LEAST ONE shared key column (a composite key needs
    every column to collide for a tuple to collide). Type mismatch on
    a column (int vs str across writers) → not provably disjoint."""
    for k, (alo, ahi) in a.items():
        z = b.get(k)
        if z is None:
            continue
        blo, bhi = z
        num_a = isinstance(alo, (int, float))
        num_b = isinstance(blo, (int, float))
        if num_a != num_b:
            continue  # incomparable: this column proves nothing
        if ahi < blo or alo > bhi:
            return True
    return False


def _commits_between(path: str, after: int, upto: int) -> list[dict] | None:
    """Commit records (after, upto], or None when any is unreadable
    (deleted by log compaction — the conservative always-conflict)."""
    import json
    import os

    d = _log_dir(path)
    out = []
    for v in range(after + 1, upto + 1):
        try:
            with open(os.path.join(d, f"{v:012d}.json")) as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError):
            return None
    return out


def _rebase_commit(
    path: str,
    read_version: int,
    added: list[str],
    removed: list[str] | tuple,
    key_ranges: dict | None,
    schema_json: dict | None = None,
    base_schema_json: dict | None = None,
    referenced: list[str] | tuple = (),
    dv_added: list | None = None,
    stats: dict | None = None,
    max_hops: int = 20,
) -> bool:
    """Disjoint-commit fast path (VERDICT r11 missing #2): after losing
    the claim for ``read_version + 1``, land the SAME staged files at
    the new head WITHOUT re-planning or re-staging — allowed iff every
    intervening winner provably conflicts with nothing we did:

    - the winner's recorded ``key_ranges`` are disjoint from ours on
      some shared key column (no common key tuple — our anti-join /
      matched-set planned at ``read_version`` is still exact), and
    - no winner retired a file we also retire (our copy-on-write
      ``removed`` set must still be live at head — otherwise our
      restaged keep-old rows would resurrect rows a winner rewrote),
    - no winner retired a file we merely REFERENCE (``referenced``: a
      deletion-vector commit's target data files — a winner's CoW
      rewrite of one carries the rows we deleted into a new file our
      vectors don't cover), and
    - no winner CHANGED THE TABLE SCHEMA (its recorded schema differs
      from ``base_schema_json``, the schema at our read version) — a
      metadata change invalidates every concurrent plan, the
      Delta/Iceberg convention.

    A winner without recorded ranges (pre-r12 commits, OPTIMIZE's
    whole-table rewrite) conflicts conservatively. Returns True once
    committed; False → the caller deletes its staged files and
    re-plans (the r11 full-retry path, now only for TRUE conflicts).
    The committed result equals the serial order read-version-first —
    write-write conflict detection in the Delta/Iceberg style."""
    if key_ranges is None:
        return False
    my_removed = set(removed) | set(referenced)
    base = read_version
    for _ in range(max_hops):
        head, _head_files = committed_files(path)
        if head <= base:
            return False  # log went backwards? never rebase blind
        recs = _commits_between(path, base, head)
        if recs is None:
            return False
        for rec in recs:
            wr = rec.get("key_ranges")
            if wr is None:
                return False
            if not _ranges_disjoint(key_ranges, wr):
                return False
            if my_removed & set(rec.get("removed", [])):
                return False
            if rec.get("schema") != base_schema_json:
                return False  # winner changed the schema (or mixed
                # writer versions): metadata conflict, full retry
        if _try_commit(
            path,
            head,
            added,
            removed,
            key_ranges=key_ranges,
            cleanup_on_loss=False,
            schema_json=schema_json,
            dv_added=dv_added,
            stats=stats,
        ):
            return True
        base = head
    return False


def merge_update(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    max_retries: int = 20,
    _test_hook=None,
) -> tuple[int, int]:
    """Full MERGE on the transactional sink (VERDICT r9 "missing" #2):
    rows of ``df`` whose keys MATCH an existing row UPDATE it
    (copy-on-write rewrite of exactly the files holding changed keys);
    unmatched rows INSERT. Same optimistic-concurrency protocol as
    `merge_upsert` — plan against snapshot V, stage invisible files,
    claim V+1 by atomic link; the commit record's ``removed`` list
    retires the rewritten files from the manifest (their bytes stay on
    disk for in-flight readers of older resolutions until
    `vacuum_uncommitted`).

    Replay is a NO-OP: matched rows are rewritten only when a value
    column actually DIFFERS (null-safe struct comparison), so
    re-running the same batch finds zero changed rows and zero inserts
    and returns (0, 0) without staging or committing. Concurrent
    update+update on one key serializes last-writer-wins (the loser of
    the version race re-plans against the winner's snapshot and
    rewrites again iff its value still differs); concurrent
    update+insert on disjoint keys both land, one version apart.

    Scale shape: the snapshot is read ONCE per attempt with scan-level
    file provenance stamped; changed keys, their files, and the
    rewrite frame are all update-sized (plus the contents of touched
    files — the copy-on-write amplification `delete_amplification_audit`
    measures; a clustered layout keeps each key's blast radius to one
    file). The matched-keys join is a plain equi-join (AQE-decided —
    never a forced broadcast; the table is unbounded). Returns
    (n_updated, n_inserted). Contract: ``df`` must not read ``path``,
    and its schema must equal the table schema (schema evolution is
    the upsert arm's job — evolve with `merge_upsert(...,
    merge_schema=True)` first, then update)."""
    spark = df.sparkSession
    pcols = partition_cols or []
    # pin the batch once: it is re-joined and re-counted across
    # attempts, and must not drift between the plan and the write.
    # LAZY: the first consumer (the `work` materialization below)
    # computes it — an eager checkpoint would pay a separate job.
    batch = df.dropDuplicates(keys).localCheckpoint(eager=False)

    for attempt in range(max_retries):
        lst = _resolve_log(path)
        version, cur_files = lst.version, lst.files
        active = lst.constraints
        base_schema_json = lst.schema_json
        snap = _scan_committed(spark, path)
        if snap is None:
            inserts = batch
            n_upd, n_ins = 0, batch.count()
            if n_ins == 0:
                return (0, 0)
            if active:
                _enforce_constraints(batch, active)
            rewrite_rel: list[str] = []
            staged_frame = inserts
            kr = _key_ranges(batch, keys)
            schema_json = _merge_schemas(batch.schema, batch.schema)[
                0
            ].jsonValue()
        else:
            data_cols = [
                c
                for c in snap.columns
                if c not in keys and c not in ("__kdp_file", "__kdp_pos")
            ]
            olds = snap.select(
                *keys,
                *[F.col(c).alias(f"__old_{c}") for c in data_cols],
                F.col("__kdp_file").alias("__file"),
            )
            diff = ~F.struct(*[F.col(c) for c in data_cols]).eqNullSafe(
                F.struct(*[F.col(f"__old_{c}") for c in data_cols])
            )
            # ONE snapshot pass + ONE materialization of exactly the
            # rows this commit writes (VERDICT r12 next #5 — was: two
            # snapshot scans into two checkpoints, then two counts, a
            # distinct-collect and a range agg, each its own job): a
            # LEFT join marks matches via __file (snapshot rows always
            # carry scan provenance), unmatched batch rows are the
            # inserts, matched rows count only when a value DIFFERS.
            # LAZY checkpoint: the stats agg right below is the first
            # action, so the materialization rides in that job instead
            # of paying its own.
            work = (
                batch.join(olds, keys, "left")
                .where(F.col("__file").isNull() | diff)
                .select(*keys, *data_cols, "__file")
                .localCheckpoint(eager=False)
            )
            # ONE stats job off the checkpointed frame: update/insert
            # counts, the touched-file set and the conflict-detection
            # ranges together (the ranges cover exactly the keys this
            # commit WRITES — unchanged batch keys need no protection:
            # not rewriting them already matches the read-version-first
            # serial order).
            r = work.agg(
                F.sum(F.col("__file").isNotNull().cast("int")).alias(
                    "__n_upd"
                ),
                F.sum(F.col("__file").isNull().cast("int")).alias(
                    "__n_ins"
                ),
                F.collect_set("__file").alias("__files"),
                *_key_range_aggs(keys),
            ).first()
            n_upd = int(r["__n_upd"] or 0)
            n_ins = int(r["__n_ins"] or 0)
            if n_upd == 0 and n_ins == 0:
                return (0, 0)
            if active:
                # only the rows this commit WRITES need checking:
                # keep-old rows were validated by their own commits
                _enforce_constraints(
                    work.select(*keys, *data_cols), active
                )
            rewrite_rel = sorted(r["__files"])
            changed = work.where(F.col("__file").isNotNull())
            inserts = work.where(F.col("__file").isNull()).select(
                *keys, *data_cols
            )
            changed_keys = changed.select(*keys).distinct()
            keep_old = (
                snap.where(F.col("__kdp_file").isin(rewrite_rel))
                .drop("__kdp_file", "__kdp_pos")
                .join(changed_keys, keys, "left_anti")
            )
            updates = changed.select(*keys, *data_cols)
            staged_frame = keep_old.unionByName(
                updates.select(*keep_old.columns)
            ).unionByName(inserts.select(*keep_old.columns))
            kr = _key_ranges_from_row(r, keys)
            schema_json = base_schema_json
        added = _stage_part_files(staged_frame, path, pcols)
        stats = _footer_stats(path, added)
        if _test_hook is not None:
            _test_hook(attempt)
        if _try_commit(
            path,
            version,
            added,
            rewrite_rel,
            key_ranges=kr,
            cleanup_on_loss=False,
            schema_json=schema_json,
            stats=stats,
        ):
            return (n_upd, n_ins)
        if _rebase_commit(
            path,
            version,
            added,
            rewrite_rel,
            kr,
            schema_json=schema_json,
            base_schema_json=base_schema_json,
            stats=stats,
        ):
            return (n_upd, n_ins)
        _delete_staged(path, added)
    raise RuntimeError(
        f"merge_update: no commit after {max_retries} attempts ({path})"
    )


def merge_delete(
    df: DataFrame,
    path: str,
    keys: list[str],
    partition_cols: list[str] | None = None,
    max_retries: int = 20,
    mode: str = "cow",
    _test_hook=None,
) -> int:
    """WHEN MATCHED DELETE on the transactional sink (VERDICT r10 #4 —
    the right-to-be-forgotten arm of the MERGE family): rows of the
    committed table whose keys match a row of ``df`` are REMOVED;
    unmatched ``df`` keys are ignored. Same optimistic protocol as
    `merge_upsert`/`merge_update` — plan against snapshot V, stage
    invisible files, claim V+1 by atomic link.

    ``mode="cow"`` (default): copy-on-write rewrite of exactly the
    files holding matched keys (the survivors of each touched file are
    restaged; the commit's ``removed`` list retires the originals).
    Cost is O(touched files) — fine on clustered layouts, but a
    scattered-key delete rewrites many files
    (`delete_amplification_audit` N187 measures exactly this).

    ``mode="dv"`` — MERGE-ON-READ deletion vectors (VERDICT r11
    missing #4): instead of rewriting data files, stage one
    delete-sized sidecar of (file, row position) pairs under
    `_kdp_dv/` and commit it as ``dv_added``; `read_committed` filters
    the marked rows with a broadcast anti-join at scan time. Data file
    bytes are untouched — RTBF cost is O(delete), not O(touched
    files); OPTIMIZE later rewrites files without the dead rows and
    the resolution drops the vectors with the retired files. Time
    travel to V-1 still shows the rows (the DV commit is after V-1).

    Replay is a NO-OP in both modes: a re-run finds zero matching keys
    (DV-marked rows are already invisible to the planning read) and
    returns 0 without staging or committing. Deleted rows stay
    readable through `read_committed(..., version=V-1)` until
    `vacuum_uncommitted`'s retention lets the retired files/sidecars
    go — retention IS the audit/undo window. ``df`` must not read
    ``path``. A DV table MUST be read through `read_committed` (the
    manifest + vectors define it); a directory-listing reader sees
    pre-delete rows. Returns rows deleted."""
    if mode not in ("cow", "dv"):
        raise ValueError(f"merge_delete: unknown mode {mode!r}")
    spark = df.sparkSession
    pcols = partition_cols or []
    # LAZY: materialized by the first stats agg that consumes it
    del_keys = (
        df.select(*keys).dropDuplicates(keys).localCheckpoint(eager=False)
    )
    for attempt in range(max_retries):
        lst = _resolve_log(path)
        version, cur_files = lst.version, lst.files
        base_schema_json = lst.schema_json
        schema_json = base_schema_json
        snap = _scan_committed(spark, path)
        if snap is None:
            return 0
        if mode == "dv":
            marked = (
                snap.join(del_keys, keys, "left_semi")
                .select(*keys, "__kdp_file", "__kdp_pos")
                .localCheckpoint(eager=False)
            )
            # ONE stats job, grouped by data file: per-file delete
            # counts (they ride in the commit record), the total, and
            # the conflict ranges all come out of this collect —
            # previously a global agg + a re-read of the written
            # sidecar paid two more jobs. The lazy checkpoint above
            # materializes inside this same job.
            rows = (
                marked.groupBy("__kdp_file")
                .agg(
                    F.count(F.lit(1)).alias("__n_del"),
                    *_key_range_aggs(keys),
                )
                .collect()
            )
            n_del = sum(int(r["__n_del"]) for r in rows)
            if n_del == 0:
                return 0
            file_counts = {
                r["__kdp_file"]: int(r["__n_del"]) for r in rows
            }
            kr = _merge_key_range_rows(rows, keys)
            sidecar = _stage_dv_sidecar(marked, path)
            data_rels = sorted(file_counts)
            dv_added = [
                (rel, sidecar, file_counts[rel]) for rel in data_rels
            ]
            if _test_hook is not None:
                _test_hook(attempt)
            if _try_commit(
                path,
                version,
                [],
                key_ranges=kr,
                cleanup_on_loss=False,
                schema_json=schema_json,
                dv_added=dv_added,
            ):
                return n_del
            if _rebase_commit(
                path,
                version,
                [],
                (),
                kr,
                schema_json=schema_json,
                base_schema_json=base_schema_json,
                referenced=data_rels,
                dv_added=dv_added,
            ):
                return n_del
            _delete_staged(path, [sidecar])
            continue
        # only the keys + file provenance are consumed downstream —
        # checkpoint the NARROW projection, and fold count + touched
        # files + conflict ranges into ONE stats job (VERDICT r12 #5;
        # was: a full-row checkpoint, a count, a distinct-collect and a
        # range agg, each its own job)
        matched = (
            snap.join(del_keys, keys, "left_semi")
            .select(*keys, "__kdp_file")
            .localCheckpoint(eager=False)
        )
        r = matched.agg(
            F.count(F.lit(1)).alias("__n_del"),
            F.collect_set("__kdp_file").alias("__files"),
            *_key_range_aggs(keys),
        ).first()
        n_del = int(r["__n_del"])
        if n_del == 0:
            return 0
        rewrite_rel = sorted(r["__files"])
        keep_old = (
            snap.where(F.col("__kdp_file").isin(rewrite_rel))
            .drop("__kdp_file", "__kdp_pos")
            .join(del_keys, keys, "left_anti")
        )
        kr = _key_ranges_from_row(r, keys)
        added = _stage_part_files(keep_old, path, pcols)
        stats = _footer_stats(path, added)
        if _test_hook is not None:
            _test_hook(attempt)
        if _try_commit(
            path,
            version,
            added,
            rewrite_rel,
            key_ranges=kr,
            cleanup_on_loss=False,
            schema_json=schema_json,
            stats=stats,
        ):
            return n_del
        if _rebase_commit(
            path,
            version,
            added,
            rewrite_rel,
            kr,
            schema_json=schema_json,
            base_schema_json=base_schema_json,
            stats=stats,
        ):
            return n_del
        _delete_staged(path, added)
    raise RuntimeError(
        f"merge_delete: no commit after {max_retries} attempts ({path})"
    )


def _stage_dv_sidecar(marked: DataFrame, path: str) -> str:
    """Write one deletion-vector sidecar parquet under `_kdp_dv/` from
    a frame carrying __file (absolute scan URI) and __pos (row index)
    — invisible until a commit's ``dv_added`` names it. Returns the
    sidecar rel path; the per-file delete counts the commit record
    needs come from the caller's grouped stats job (the sidecar used
    to be RE-READ here just to count per file — one extra job + a disk
    read per delete). Delete-sized: coalesce(1) is the correct
    layout."""
    import os
    import shutil
    import uuid

    vecs = marked.select(
        F.col("__kdp_file").alias("file"),
        F.col("__kdp_pos").alias("pos"),
    )
    stage = os.path.join(path, f"_kdp_stage_{uuid.uuid4().hex}")
    vecs.coalesce(1).write.mode("overwrite").parquet(stage)
    dv_dir = os.path.join(path, "_kdp_dv")
    os.makedirs(dv_dir, exist_ok=True)
    sidecar_rel = None
    for fn in os.listdir(stage):
        if fn.endswith(".parquet"):
            newname = f"dv-{uuid.uuid4().hex}.snappy.parquet"
            os.replace(
                os.path.join(stage, fn), os.path.join(dv_dir, newname)
            )
            sidecar_rel = os.path.join("_kdp_dv", newname)
            break
    shutil.rmtree(stage, ignore_errors=True)
    if sidecar_rel is None:
        raise RuntimeError("deletion-vector stage wrote no parquet")
    return sidecar_rel


def optimize_table(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    max_retries: int = 20,
    incremental: bool = False,
    small_file_bytes: int | None = None,
    cluster_method: str = "range",
    _test_hook=None,
) -> tuple[int, int]:
    """Transactional OPTIMIZE on the merge sink (VERDICT r10 #8a): fold
    the committed table's data files into ~``target_file_bytes`` files
    — optionally CLUSTERED by ``cluster_by`` — committed through the
    log as one version: ``added`` = the rewritten files, ``removed`` =
    every file of the snapshot it rewrote.

    ``cluster_method="range"`` (default): repartitionByRange +
    sortWithinPartitions, the layout that tightens per-file min/max
    for zone-map / row-group skipping on the LEADING column(s) of the
    lexicographic order (`layout.zone_map_skip_stats` measures it).
    ``cluster_method="zorder"``: Morton bit-interleave of per-column
    equi-depth bucket ids (`_zorder_key`) — every clustered column
    keeps file-level locality, so `read_committed(prune=)` skips files
    on predicates over ANY of them, not just the first (the multi-
    dimensional layout Delta's OPTIMIZE ZORDER BY serves).

    ``incremental=True`` (r12): rewrite ONLY the files smaller than
    ``small_file_bytes`` (default ``target_file_bytes // 2``) — the
    maintenance shape that actually runs at 100 TB, where a
    whole-table rewrite is never viable. Blast radius = the picked
    small files; already-right-sized files keep their bytes AND their
    manifest entries; each picked file's deletion vectors are applied
    during the rewrite (the rewritten files carry no dead rows, and
    resolution drops those vectors with the retired files). A table
    compacted incrementally converges: every pass leaves at most one
    sub-target file per partition. No-ops (returns (n, n)) when fewer
    than two files qualify.

    Reads are ROW-identical before/after (no dedup, no filter — pure
    re-layout), and time travel to the pre-OPTIMIZE version still works
    until vacuum retention releases the retired files. Same optimistic
    protocol as the MERGE family: a concurrent writer that claims the
    version first wins; the loser re-reads the new snapshot and
    restages, so no committed row is ever lost or duplicated by an
    OPTIMIZE racing an upsert/update/delete. Returns
    (files_before, files_after) — for incremental mode, counted over
    the whole table (before = live files now, after = live files after
    the fold commit)."""
    import os

    if cluster_method not in ("range", "zorder"):
        raise ValueError(
            f"optimize_table: unknown cluster_method {cluster_method!r}"
        )
    pcols = partition_cols or []
    for attempt in range(max_retries):
        version, cur_files = committed_files(path)
        if not cur_files:
            return (0, 0)
        recorded = table_schema(path)
        schema_json = (
            recorded.jsonValue() if recorded is not None else None
        )
        sizes = {}
        for rel in cur_files:
            try:
                sizes[rel] = os.path.getsize(os.path.join(path, rel))
            except OSError:
                sizes[rel] = 0
        if incremental:
            thresh = (
                small_file_bytes
                if small_file_bytes is not None
                else target_file_bytes // 2
            )
            picked = sorted(
                rel for rel in cur_files if sizes[rel] < thresh
            )
            if len(picked) < 2:
                return (len(cur_files), len(cur_files))
            snapshot = _scan_committed(
                spark, path, only_files=picked
            ).drop("__kdp_file", "__kdp_pos")
            rewrite_rel = picked
            total = sum(sizes[rel] for rel in picked)
        else:
            snapshot = read_committed(spark, path)
            rewrite_rel = list(cur_files)
            total = sum(sizes.values())
        n_files = max(1, -(-total // target_file_bytes))
        # the requested file count is the layout contract (per-file key
        # ranges sized for zone-map skipping). An EXPLICIT partition
        # count makes the shuffle origin REPARTITION_BY_NUM, which
        # AQE's partition coalescing never touches (pytest-pinned) —
        # no session-global conf toggle, so concurrent queries planned
        # in this session keep their AQE behavior (ADVICE r11 #4)
        if cluster_by and cluster_method == "zorder":
            z = _zorder_key(snapshot, cluster_by)
            frame = (
                snapshot.withColumn("__kdp_z", z)
                .repartitionByRange(n_files, "__kdp_z")
                .sortWithinPartitions("__kdp_z", *cluster_by)
                .drop("__kdp_z")
            )
        elif cluster_by:
            frame = snapshot.repartitionByRange(
                n_files, *cluster_by
            ).sortWithinPartitions(*cluster_by)
        else:
            frame = snapshot.repartition(n_files)
        added = _stage_part_files(frame, path, pcols)
        stats = _footer_stats(path, added)
        if _test_hook is not None:
            _test_hook(attempt)
        if _try_commit(
            path,
            version,
            added,
            rewrite_rel,
            schema_json=schema_json,
            stats=stats,
        ):
            return (
                len(cur_files),
                len(cur_files) - len(rewrite_rel) + len(added),
            )
    raise RuntimeError(
        f"optimize_table: no commit after {max_retries} attempts ({path})"
    )


# Per-column bucket resolution for Z-order by clustering width: one
# column gets the full 16-bit range-cluster equivalent; more columns
# split the interleaved key's useful bits between them.
_ZBITS = {1: 16, 2: 8, 3: 5}


def _zorder_key(df: DataFrame, cols: list[str]):
    """Morton / Z-order key expression over ``cols`` — the multi-column
    clustering OPTIMIZE uses so per-file min/max stay tight on EVERY
    clustered column, not just the first of a lexicographic sort (the
    Delta OSS `interleave_bits(range_partition_id(...))` construction,
    rebuilt from public semantics). Two steps, both distributed:

    1. ONE aggregation pass computes per-column quantile cut points
       (`percentile_approx` over an order-preserving numeric surrogate:
       numerics cast to double; strings use their first 6 bytes
       big-endian — monotone in UTF-8 binary order, 48 bits is double-
       exact; dates/timestamps via epoch). The pass is an extra scan of
       exactly the data OPTIMIZE is already rewriting — maintenance
       cost, never query cost.
    2. each row's per-column bucket id (count of cut points <= its
       surrogate, an `aggregate` over the literal cut array — nulls
       bucket to 0) is bit-interleaved into one long; repartitionByRange
       + sort on that key gives every clustered column ~2^bits-way file
       locality.

    Quantile cuts (not fixed-width) make the buckets equi-DEPTH, so
    skew cannot collapse the interleave into a few giant buckets."""
    bits = _ZBITS.get(len(cols), 4)
    dtypes = dict(df.dtypes)
    surrogates = {}
    for c in cols:
        dt = dtypes[c]
        if dt in (
            "tinyint",
            "smallint",
            "int",
            "bigint",
            "float",
            "double",
        ) or dt.startswith("decimal"):
            surrogates[c] = F.col(c).cast("double")
        elif dt == "string":
            surrogates[c] = F.conv(
                F.rpad(
                    F.hex(F.encode(F.substring(F.col(c), 1, 6), "UTF-8")),
                    12,
                    "0",
                ),
                16,
                10,
            ).cast("double")
        elif dt == "date":
            surrogates[c] = F.datediff(
                F.col(c), F.lit("1970-01-01")
            ).cast("double")
        elif dt == "timestamp":
            surrogates[c] = F.col(c).cast("double")
        elif dt == "boolean":
            surrogates[c] = F.col(c).cast("int").cast("double")
        else:
            raise ValueError(
                f"_zorder_key: unsupported column type {dt} for {c!r}"
            )
    probs = [(i + 1) / (1 << bits) for i in range((1 << bits) - 1)]
    row = df.agg(
        *[
            F.percentile_approx(surrogates[c], probs, 10000).alias(
                f"__q_{c}"
            )
            for c in cols
        ]
    ).first()
    n = len(cols)
    z = None
    for j, c in enumerate(cols):
        cuts = sorted(
            {float(x) for x in (row[f"__q_{c}"] or []) if x is not None}
        )
        if cuts:
            arr = F.array(*[F.lit(x) for x in cuts])
            s = surrogates[c]
            b = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, cut: acc
                + F.when(s >= cut, 1).otherwise(0),
            ).cast("long")
        else:  # all-null / constant column: one bucket
            b = F.lit(0).cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
            )
            z = term if z is None else z + term
    return z


def vacuum_uncommitted(
    path: str, retention_seconds: float = 24 * 3600
) -> int:
    """Delete data files not referenced by the CURRENT manifest
    resolution — crashed writers' orphans and files retired by
    merge_update/merge_delete/optimize_table's copy-on-write rewrites —
    but only those whose RETIREMENT is older than ``retention_seconds``.
    The age of a retired file is measured from the ``ts`` of the commit
    whose ``removed`` list dropped it (scanned from the surviving log
    records), NOT from file mtime: mtime is creation time, and a file
    written 25h ago but retired one minute ago must survive the default
    24h retention so time travel to V-1 and in-flight old-version scans
    keep working right after a commit (ADVICE r11 #2). Orphans that no
    commit ever referenced (crashed stagings) have no retirement
    record and age by mtime — for them creation IS the last moment
    anything could hold their paths. The retention threshold is what
    makes vacuum safe to run concurrently with live traffic (VERDICT
    r10 #2):

    - a writer mid-stage has just created its part files (moved into
      the table dir before its commit names them) — younger than any
      sane retention, so they survive;
    - a reader resolving an older version (or a `read_committed(...,
      version=V)` time travel) holds file paths retired within its
      window — retention sized to the longest read/audit window keeps
      them on disk;
    - genuinely dead files age past the threshold and are collected on
      a later pass.

    Staged dirs (`_kdp_stage_*`) are never entered regardless of age.
    ``retention_seconds=0`` restores the eager sweep for controlled
    shutdowns (no concurrent writers/readers by construction — the
    pre-r11 behavior). Returns the number of files deleted."""
    import json
    import os
    import time

    lst = _resolve_log(path)
    keep = {os.path.normpath(f) for f in lst.files}
    keep |= {
        os.path.normpath(s)
        for v in lst.dv.values()
        for s, _n in v
    }
    # retirement times: rel -> ts of the commit that removed it (added
    # names are collision-free uuids, so a rel is removed at most once;
    # commits predating the ts field leave None -> mtime fallback, the
    # legacy lower bound). A DV sidecar retires when the LAST data file
    # it covers retires (before that it is live and kept above) — aging
    # it from file mtime would have the exact creation-vs-retirement
    # bug of ADVICE r11 #2.
    retired_ts: dict[str, float] = {}
    dv_covers: dict[str, set[str]] = {}  # sidecar -> data rels, all-time
    d = _log_dir(path)
    if os.path.isdir(d):
        for name in os.listdir(d):
            if not name.endswith(".json") or name.startswith(
                (".", "checkpoint-")
            ):
                continue
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue
            for ent in rec.get("dv_added", []):
                data_rel, sidecar = ent[0], ent[1]
                dv_covers.setdefault(
                    os.path.normpath(sidecar), set()
                ).add(os.path.normpath(data_rel))
            ts = rec.get("ts")
            if ts is None:
                continue
            for rel in rec.get("removed", []):
                retired_ts[os.path.normpath(rel)] = ts
    for sidecar, covered in dv_covers.items():
        if sidecar in keep:
            continue
        times = [retired_ts.get(r) for r in covered]
        if all(t is not None for t in times):
            retired_ts[sidecar] = max(times)
    cutoff = time.time() - retention_seconds
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
                try:
                    age_base = retired_ts.get(rel)
                    if age_base is None:
                        age_base = os.path.getmtime(full)
                    if age_base > cutoff:
                        continue
                    os.remove(full)
                except OSError:
                    continue  # already gone (concurrent vacuum/writer)
                removed += 1
    return removed


def read_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame | None:
    """CDC / incremental read from the commit log (VERDICT r11 next
    #7 — the feed a downstream incremental consumer needs): every row
    change in commits (``from_version``, ``to_version``] as
    (row..., _change_type insert|delete, _commit_version). An update
    appears as its delete(old values) + insert(new values) pair —
    the minimal change-feed form every CDC consumer can fold.

    Per commit the change set is the VALUE-LEVEL diff of the files it
    touched: rows of added files `exceptAll` rows of removed files are
    the inserts, the reverse are the deletes — so a copy-on-write
    rewrite's restaged UNCHANGED rows cancel out instead of appearing
    as phantom delete+insert pairs, and a pure re-layout OPTIMIZE
    yields zero changes by construction. Deletion-vector commits
    contribute their marked rows as deletes (the (file, pos) pairs
    resolved against the still-live data files).

    Scale shape: per commit, two scans bounded by the commit's blast
    radius (its added+removed files — never the table) and one
    exceptAll shuffle of the same size; versions union together. All
    files are read under the schema AS OF ``to_version`` — widenings
    are monotone, so older files widen in place and pre-evolution rows
    null-fill added columns (their delete/insert pairs still cancel:
    both sides read under the same schema).

    Raises when the range's commits were log-compacted away, and fails
    at scan time if a replayed file was already vacuumed (the honest
    failure mode; size retention to the longest consumer lag). Returns
    None for an empty range."""
    import os

    head, _files = committed_files(path)
    if to_version is None:
        to_version = head
    if to_version > head:
        raise ValueError(
            f"read_changes: to_version {to_version} exceeds HEAD {head}"
        )
    if from_version >= to_version:
        return None
    recs = _commits_between(path, from_version, to_version)
    if recs is None:
        raise ValueError(
            f"read_changes: commits ({from_version}, {to_version}] of "
            f"{path} are no longer all readable (log compaction)"
        )
    st = table_schema(path, to_version)
    # DV state AS OF from_version, walked forward commit by commit:
    # a removed file's rows that were ALREADY dv-deleted must not
    # re-report as deletes when a CoW rewrite/OPTIMIZE retires the file
    live_dv = {
        k: [s for s, _n in v]
        for k, v in _resolve_log(path, from_version).dv.items()
    }
    prefix = "file:" + os.path.abspath(path) + "/"

    def _read(rels: list[str], with_meta: bool = False) -> DataFrame | None:
        if not rels:
            return None
        r = spark.read.option("basePath", path)
        if st is not None:
            r = r.schema(st)
        df = r.parquet(*[os.path.join(path, f) for f in rels])
        if with_meta:
            df = df.withColumn(
                "__kdp_file",
                F.expr(
                    f"substring(_metadata.file_path, {len(prefix) + 1})"
                ),
            ).withColumn("__kdp_pos", F.col("_metadata.row_index"))
        return df

    def _dv_join(base: DataFrame, sidecars: list[str], how: str) -> DataFrame:
        vecs = spark.read.parquet(
            *[os.path.join(path, s_) for s_ in sidecars]
        )
        return base.join(
            F.broadcast(vecs),
            on=[
                base["__kdp_file"] == vecs["file"],
                base["__kdp_pos"] == vecs["pos"],
            ],
            how=how,
        ).drop("__kdp_file", "__kdp_pos")

    out = []

    def _tag(df: DataFrame, kind: str, v: int) -> DataFrame:
        return df.withColumn("_change_type", F.lit(kind)).withColumn(
            "_commit_version", F.lit(v)
        )

    for rec in recs:
        v = rec["version"]
        removed_rels = list(rec.get("removed", []))
        a = _read(rec.get("added", []))
        pre_sidecars = sorted(
            {
                s_
                for rel in removed_rels
                for s_ in live_dv.get(rel, [])
            }
        )
        if pre_sidecars:
            # live rows only: drop already-dv-deleted rows of the
            # retired files before diffing
            r = _dv_join(
                _read(removed_rels, with_meta=True),
                pre_sidecars,
                "left_anti",
            )
        else:
            r = _read(removed_rels)
        if a is not None and r is not None:
            out.append(_tag(a.exceptAll(r), "insert", v))
            out.append(_tag(r.exceptAll(a), "delete", v))
        elif a is not None:
            out.append(_tag(a, "insert", v))
        elif r is not None:
            out.append(_tag(r, "delete", v))
        dv_added = rec.get("dv_added", [])
        if dv_added:
            data_rels = sorted({e[0] for e in dv_added})
            sidecars = sorted({e[1] for e in dv_added})
            marked = _dv_join(
                _read(data_rels, with_meta=True), sidecars, "left_semi"
            )
            out.append(_tag(marked, "delete", v))
        # advance the dv state past this commit
        for rel in removed_rels:
            live_dv.pop(rel, None)
        for e in dv_added:
            live_dv.setdefault(e[0], []).append(e[1])
    if not out:
        return None
    res = out[0]
    for f in out[1:]:
        res = res.unionByName(f, allowMissingColumns=True)
    return res


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
