"""Incremental CDC consumption from the transactional sink's commit
log — the downstream half of `sources.sinks.read_changes` (N225): a
durable cursor plus an advance-after-success delivery loop, so a
consumer replays exactly the commits it has not folded yet.

This is the Spark-idiomatic shape of "subscribe to a Delta table's
change feed" for a foreachBatch-style consumer: the upstream table's
commit log IS the write-ahead log, so the consumer needs no second
queue — only a version cursor. Delivery is AT-LEAST-ONCE: the cursor
advances only after the handler returns, so a crash mid-handler
re-delivers the same (from, to] window on the next run; handlers that
land into another transactional sink (`merge_upsert` keyed on the
change identity) make the pipeline end-to-end exactly-once, the same
replay discipline as `streaming/ingest.py`.

Scale shape: each poll reads only the NEW commits' blast radius
(added+removed files of commits (cursor, head]) — never the table —
and the cursor file is a few bytes. At 100 TB this is the tail-read
every incremental consumer (index maintenance, aggregate refresh,
replication) runs on a schedule.

Reference parity: the reference pipeline re-scrapes portals and diffs
against the landed bucket per run (scraper.py full-pass + skip-if-
exists); the change-feed consumer replaces that O(table) re-diff with
an O(new commits) log read.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..sources.sinks import committed_files, read_changes

_CURSOR_NAME = "cursor.json"


def changes_cursor(state_dir: str) -> int:
    """The consumer's durable cursor: the last commit version whose
    changes were fully handled; -1 before the first successful poll
    (the next poll then starts from the table's first commit)."""
    try:
        with open(os.path.join(state_dir, _CURSOR_NAME)) as f:
            return int(json.load(f)["version"])
    except (FileNotFoundError, NotADirectoryError, json.JSONDecodeError,
            KeyError, ValueError):
        return -1


def _advance_cursor(state_dir: str, version: int) -> None:
    """Atomic cursor write (tmp + rename): a crash mid-write leaves the
    old cursor, which only re-delivers — never skips."""
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f".cursor-tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, os.path.join(state_dir, _CURSOR_NAME))


def consume_changes(
    spark: SparkSession,
    path: str,
    state_dir: str,
    handler: Callable[[DataFrame, int, int], None],
    max_versions: int | None = None,
) -> tuple[int, int]:
    """One poll of the change feed: deliver every change in commits
    (cursor, head] to ``handler(changes_df, from_version, to_version)``
    and advance the cursor only after it returns (at-least-once; see
    module docstring for the exactly-once recipe). Returns the
    (from_version, to_version) window delivered; from == to means the
    consumer was already caught up (handler not called).

    ``max_versions`` bounds one poll's window (a consumer that fell far
    behind folds the backlog in bounded slices instead of one giant
    union — call again until caught up). A fresh consumer of an old
    table whose early commits were log-compacted away should seed its
    cursor from a snapshot instead (read_committed + _advance_cursor at
    that version); `read_changes` raises in that case rather than
    silently skipping history."""
    frm = changes_cursor(state_dir)
    head, _files = committed_files(path)
    if head <= frm:
        return (frm, frm)
    to = head if max_versions is None else min(head, frm + max_versions)
    changes = read_changes(spark, path, frm, to)
    if changes is not None:
        handler(changes, frm, to)
    _advance_cursor(state_dir, to)
    return (frm, to)
