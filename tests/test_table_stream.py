"""The `kdp_table_changes` streaming source (N231): Structured
Streaming over the transactional sink's commit log. The ground truth
for every test is `sinks.read_changes` — the batch CDC reader whose
semantics are already reconciled against snapshots — so these tests
pin the stream to an independently-verified oracle rather than to
themselves."""

import os

import pytest

from kommunedata_data_pipeline_spark.sources import sinks
from kommunedata_data_pipeline_spark.sources.table_stream import (
    TableChangesStreamReader,
    read_table_changes_stream,
)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _build_history(spark, path):
    """upsert -> MERGE update+insert -> CoW delete -> DV delete ->
    OPTIMIZE: one commit of every change-producing (and one
    change-free) kind."""
    sinks.merge_upsert(
        _mk(
            spark,
            [(i, f"v{i}", i * 10) for i in range(40)],
            "k int, v string, x int",
        ),
        path,
        ["k"],
    )
    sinks.merge_update(
        _mk(
            spark,
            [(3, "V3", 30), (7, "V7", 70), (100, "new", 1000)],
            "k int, v string, x int",
        ),
        path,
        ["k"],
    )
    sinks.merge_delete(_mk(spark, [(5,), (6,)], "k int"), path, ["k"])
    sinks.merge_delete(
        _mk(spark, [(8,), (9,)], "k int"), path, ["k"], mode="dv"
    )
    sinks.optimize_table(spark, path, target_file_bytes=1 << 20)


def _collect_stream(spark, path, name, ckpt, starting_version=0):
    """Drive the change stream to exhaustion with availableNow and a
    DURABLE checkpoint (so a second call resumes at the stored
    offset), returning the delivered rows."""
    q = (
        read_table_changes_stream(
            spark, path, starting_version=starting_version
        )
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def _key(r):
    return (r.k, r.v, r.x, r._change_type, r._commit_version)


def test_stream_matches_read_changes(spark, tmp_path):
    """Full-history replay through the streaming source produces
    EXACTLY the rows `read_changes(-1, head)` produces — including
    the update's delete+insert pairs, the DV deletes, and ZERO rows
    for the OPTIMIZE commit."""
    path = str(tmp_path / "tbl")
    _build_history(spark, path)
    head, _ = sinks.committed_files(path)
    want = sorted(
        _key(r) for r in sinks.read_changes(spark, path, -1, head).collect()
    )
    got = sorted(
        _key(r)
        for r in _collect_stream(
            spark, path, "tcs_parity", str(tmp_path / "ck")
        )
    )
    assert got == want
    # the OPTIMIZE commit (the head version) emitted nothing
    assert not [r for r in got if r[4] == head]
    # sanity on the feed itself: the update commit (version 1) shows
    # k=3 as its delete(old)+insert(new) pair
    k3 = [(r[3], r[1]) for r in got if r[0] == 3 and r[4] == 1]
    assert sorted(k3) == [("delete", "v3"), ("insert", "V3")]


def test_stream_incremental_offsets(spark, tmp_path):
    """A second availableNow run on the SAME checkpoint delivers only
    the commits that landed after the first run — Spark's offset log
    carries the version cursor (the memory sink cannot recover a
    checkpoint, so this drives the real file sink)."""
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        q = (
            read_table_changes_stream(spark, path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    sinks.merge_upsert(
        _mk(spark, [(1, "a", 1), (2, "b", 2)], "k int, v string, x int"),
        path,
        ["k"],
    )
    first = run_once()
    assert sorted(r.k for r in first) == [1, 2]
    assert all(
        r._change_type == "insert" and r._commit_version == 0
        for r in first
    )
    sinks.merge_update(
        _mk(spark, [(1, "A", 1)], "k int, v string, x int"), path, ["k"]
    )
    sinks.merge_delete(_mk(spark, [(2,)], "k int"), path, ["k"], mode="dv")
    everything = run_once()
    # version-0 inserts appear exactly ONCE (no re-delivery on resume)
    assert sorted(_key(r) for r in everything if r._commit_version == 0) == [
        (1, "a", 1, "insert", 0),
        (2, "b", 2, "insert", 0),
    ]
    # the resume delivered exactly the two new commits' changes
    assert sorted(_key(r) for r in everything if r._commit_version > 0) == [
        (1, "A", 1, "insert", 1),
        (1, "a", 1, "delete", 1),
        (2, "b", 2, "delete", 2),
    ]


def test_stream_starting_version_skips_history(spark, tmp_path):
    """startingVersion starts the subscription mid-log (the consumer
    that seeded from a snapshot) — earlier commits never deliver."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(1, "a", 1)], "k int, v string, x int"), path, ["k"]
    )
    sinks.merge_upsert(
        _mk(spark, [(2, "b", 2)], "k int, v string, x int"), path, ["k"]
    )
    rows = _collect_stream(
        spark, path, "tcs_sv", str(tmp_path / "ck"), starting_version=1
    )
    assert [(r.k, r._change_type, r._commit_version) for r in rows] == [
        (2, "insert", 1)
    ]


def test_partitions_raise_on_compacted_log(spark, tmp_path, monkeypatch):
    """A consumer whose range lost a commit record to log compaction
    gets a raise (restart from snapshot), never silently skipped
    history — while a consumer whose cursor sits at a checkpointed
    version keeps planning (its pre-start DV state resolves from the
    checkpoint). Asserted at the planning layer the executors call."""
    monkeypatch.setattr(sinks, "CHECKPOINT_INTERVAL", 2)
    path = str(tmp_path / "tbl")
    for i in range(4):  # v0..v3, checkpoints after v1 and v3
        sinks.merge_upsert(
            _mk(spark, [(i, f"v{i}", i)], "k int, v string, x int"),
            path,
            ["k"],
        )
    os.remove(os.path.join(path, "_kdp_log", f"{0:012d}.json"))
    os.remove(os.path.join(path, "_kdp_log", f"{1:012d}.json"))
    reader = TableChangesStreamReader({"path": path}, ["k", "v", "x"])
    with pytest.raises(ValueError, match="no longer all readable"):
        reader.partitions({"version": -1}, {"version": 3})
    # a cursor at the checkpointed v1 still plans the intact suffix
    parts = reader.partitions({"version": 1}, {"version": 3})
    assert [p.version for p in parts] == [2, 3]


def test_stream_after_schema_evolution(spark, tmp_path):
    """A stream started AFTER an add-column evolution reads
    pre-evolution files under the evolved schema: their change rows
    null-fill the added column (the same as-of-schema rule as
    read_changes)."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(1, "a")], "k int, v string"), path, ["k"]
    )
    sinks.merge_upsert(
        _mk(spark, [(2, "b", 9)], "k int, v string, flag int"),
        path,
        ["k"],
        merge_schema=True,
    )
    rows = _collect_stream(spark, path, "tcs_evo", str(tmp_path / "ck"))
    by_k = {r.k: r for r in rows}
    assert by_k[1].flag is None and by_k[2].flag == 9
    head, _ = sinks.committed_files(path)
    want = sorted(
        (r.k, r.v, r.flag, r._change_type, r._commit_version)
        for r in sinks.read_changes(spark, path, -1, head).collect()
    )
    got = sorted(
        (r.k, r.v, r.flag, r._change_type, r._commit_version) for r in rows
    )
    assert got == want
