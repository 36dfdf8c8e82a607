"""Structured-Streaming CDC source over the transactional sink's
commit log — ``spark.readStream.format("kdp_table_changes")
.option("path", tbl)`` (N231; the Delta "table as a stream source"
shape, rebuilt on Spark 4's Python DataSource streaming API like
`sources/datasource.py`'s portal source).

The commit log IS the write-ahead log, so the stream's offset is just
a commit version: each micro-batch covers commits (start, end], one
input partition per commit, and Spark's own offset/commit log gives
the consumer exactly-once delivery without the cursor file
`streaming/cdc.py` maintains by hand. Rows are the same change feed
`sources/sinks.py:read_changes` produces — (row..., _change_type
insert|delete, _commit_version), value-level per commit so a
copy-on-write rewrite's restaged unchanged rows cancel and a pure
re-layout OPTIMIZE emits nothing; parity is pytest-pinned against
`read_changes` over the same history.

Scale shape: planning walks only the commit records of the batch's
version range (driver-side, log-sized); each partition reads exactly
its commit's blast radius (added + removed files + DV sidecars, never
the table) and diffs it in one Python task with a multiset counter —
the same bound as `read_changes`' per-commit exceptAll, minus its
per-commit Spark jobs. A commit's blast radius is batch-sized by
construction (MERGE touches matched-key files only), so the per-task
memory is bounded by what one writer committed, not by table size.

Contracts (both are exactly Delta's): the stream schema is fixed at
stream start (the table schema as of HEAD plus the two change
columns) — a mid-stream schema evolution requires a stream restart;
and commits compacted out of the log (or data files vacuumed past the
consumer's lag) raise rather than silently skipping history.

Reference parity: the reference re-scrapes portals and diffs against
the landed bucket per run (scraper.py full pass + skip-if-exists);
this source replaces that O(table) re-diff with a push-style
O(new commits) subscription.
"""

from __future__ import annotations

import os
from collections import Counter
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

CHANGE_COLS = "_change_type string, _commit_version bigint"


class CommitChangesPartition(InputPartition):
    """One commit's diff spec: everything the executor-side reader
    needs, resolved driver-side from the log (the reader never walks
    the log itself). ``pre_dv`` maps each removed file to the DV
    sidecars that were live on it BEFORE this commit — their rows
    already left the table and must not re-report as deletes when the
    file is retired."""

    def __init__(
        self,
        path: str,
        version: int,
        added: list,
        removed: list,
        pre_dv: dict,
        dv_added: list,
        fields: list,
    ):
        self.path = path
        self.version = version
        self.added = added
        self.removed = removed
        self.pre_dv = pre_dv
        self.dv_added = dv_added
        self.fields = fields


def _freeze(v):
    """Hashable multiset key for one value: lists/dicts recurse to
    tuples, NaN collapses to a sentinel (Spark's set ops treat NaN as
    equal to itself; Python's ``nan != nan`` would leak every
    NaN-carrying row past the copy-on-write cancellation)."""
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _freeze(x)) for k, x in v.items()))
    if isinstance(v, float) and v != v:
        return ("__kdp_nan__",)
    return v


def _file_rows(path: str, rel: str, fields: list) -> list[tuple]:
    """One data file's rows as tuples in stream-schema order, position
    -indexed. Columns the file predates null-fill (schema evolution's
    read-side add-column); integer/float widths normalize through
    Python ints/floats exactly like Spark reading the old file under
    the widened as-of schema."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(path, rel))
    return [
        tuple(row.get(f) for f in fields) for row in t.to_pylist()
    ]


def _sidecar_pairs(path: str, sidecar_rels: list) -> set[tuple]:
    """(data file rel, row position) pairs named by DV sidecars."""
    import pyarrow.parquet as pq

    out: set[tuple] = set()
    for s in sidecar_rels:
        t = pq.read_table(os.path.join(path, s), columns=["file", "pos"])
        for row in t.to_pylist():
            out.add((row["file"], row["pos"]))
    return out


class TableChangesStreamReader(DataSourceStreamReader):
    """Offsets are commit versions ({"version": last delivered}); a
    micro-batch plans one partition per commit in (start, end]."""

    def __init__(self, options: dict, fields: list):
        self.path = options["path"]
        self.start_from = int(options.get("startingVersion", 0))
        self.fields = fields

    def initialOffset(self) -> dict:
        return {"version": self.start_from - 1}

    def latestOffset(self) -> dict:
        from .sinks import committed_files

        head, _files = committed_files(self.path)
        return {"version": head}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        from .sinks import _commits_between, _resolve_log

        lo, hi = start["version"], end["version"]
        recs = _commits_between(self.path, lo, hi)
        if recs is None:
            raise ValueError(
                f"kdp_table_changes: commits ({lo}, {hi}] of "
                f"{self.path} are no longer all readable (log "
                f"compaction outran this consumer — restart from a "
                f"snapshot)"
            )
        # DV state as of the batch's start, walked forward per commit
        # (lo == -1 resolves to the empty pre-table state)
        live_dv = {
            k: [s for s, _n in v]
            for k, v in _resolve_log(self.path, lo).dv.items()
        }
        parts: list[InputPartition] = []
        for rec in recs:
            v = rec["version"]
            removed = list(rec.get("removed", []))
            pre_dv = {
                r: list(live_dv[r]) for r in removed if live_dv.get(r)
            }
            dv_added = [(e[0], e[1]) for e in rec.get("dv_added", [])]
            parts.append(
                CommitChangesPartition(
                    self.path,
                    v,
                    list(rec.get("added", [])),
                    removed,
                    pre_dv,
                    dv_added,
                    self.fields,
                )
            )
            for rel in removed:
                live_dv.pop(rel, None)
            for d, s in dv_added:
                live_dv.setdefault(d, []).append(s)
        return parts

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition
        v = p.version
        # multiset diff of the commit's touched files: counts keyed by
        # frozen row, one representative original kept for emission
        add_n: Counter = Counter()
        rem_n: Counter = Counter()
        rep: dict = {}
        for rel in p.added:
            for row in _file_rows(p.path, rel, p.fields):
                k = _freeze(row)
                add_n[k] += 1
                rep.setdefault(k, row)
        dead = _sidecar_pairs(
            p.path, sorted({s for v_ in p.pre_dv.values() for s in v_})
        )
        for rel in p.removed:
            for pos, row in enumerate(_file_rows(p.path, rel, p.fields)):
                if (rel, pos) in dead:
                    continue  # already dv-deleted: left the table earlier
                k = _freeze(row)
                rem_n[k] += 1
                rep.setdefault(k, row)
        for k, c in add_n.items():
            for _ in range(c - rem_n.get(k, 0)):
                yield rep[k] + ("insert", v)
        for k, c in rem_n.items():
            for _ in range(c - add_n.get(k, 0)):
                yield rep[k] + ("delete", v)
        # this commit's DV deletes: marked rows of still-live files
        if p.dv_added:
            by_file: dict[str, set] = {}
            for data_rel, pos in _sidecar_pairs(
                p.path, sorted({s for _d, s in p.dv_added})
            ):
                by_file.setdefault(data_rel, set()).add(pos)
            want = {d for d, _s in p.dv_added}
            for data_rel in sorted(by_file):
                if data_rel not in want:
                    continue
                rows = _file_rows(p.path, data_rel, p.fields)
                for pos in sorted(by_file[data_rel]):
                    yield rows[pos] + ("delete", v)

    def commit(self, end: dict) -> None:
        pass


class TableChangesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kdp_table_changes"

    def schema(self) -> str:
        from .sinks import table_schema

        st = table_schema(self.options["path"])
        if st is None:
            raise ValueError(
                "kdp_table_changes: no committed table (with a "
                f"recorded schema) at {self.options['path']}"
            )
        cols = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in st.fields
        )
        return f"{cols}, {CHANGE_COLS}"

    def streamReader(self, schema) -> TableChangesStreamReader:
        fields = [
            f.name
            for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]
        return TableChangesStreamReader(self.options, fields)


def register(spark) -> None:
    spark.dataSource.register(TableChangesDataSource)


def read_table_changes_stream(spark, path: str, starting_version: int = 0):
    """`readStream` over the committed table's change feed — the
    subscription form of `sinks.read_changes`. Replays history from
    ``starting_version`` (default: the first commit — for a keyed
    table the full history replay IS the initial snapshot), then
    delivers each new commit's changes as its own offset range."""
    register(spark)
    return (
        spark.readStream.format("kdp_table_changes")
        .option("path", path)
        .option("startingVersion", str(starting_version))
        .load()
    )
