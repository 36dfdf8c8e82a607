"""Round-12 second tranche: per-file commit statistics (data skipping
+ metadata-only aggregates), CHECK constraints, the CDC consumer
cursor, and Z-order clustering — the remaining lakehouse arms of the
transactional sink (engine extensions beyond the reference's
skip-if-exists landing, scraper_utils.py:25-70)."""

import json
import glob
import os

import pytest

from kommunedata_data_pipeline_spark.sources import sinks


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _commit_recs(path):
    d = os.path.join(path, "_kdp_log")
    out = []
    for f in sorted(glob.glob(os.path.join(d, "0*.json"))):
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def test_commit_records_footer_stats(spark, tmp_path):
    """Every commit records per-added-file footer stats (rows +
    min/max/null-count per JSON-safe top-level column) — driver-side,
    no extra Spark job; an all-null column records [null, null, rows]
    (skippable for any value probe)."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(
            spark,
            [(1, "a", 1.5, None), (2, "b", None, None)],
            "k int, s string, x double, dead string",
        ),
        path,
        ["k"],
    )
    (rec,) = _commit_recs(path)
    assert rec.get("stats"), "commit carries no stats"
    assert set(rec["stats"]) == set(rec["added"])
    populated = [e for e in rec["stats"].values() if e["rows"] >= 1]
    assert populated  # empty shuffle partitions may add 0-row files
    for ent in populated:
        cols = ent["cols"]
        assert cols["k"][0] >= 1 and cols["k"][1] <= 2
        assert cols["s"][0] >= "a" and cols["s"][1] <= "b"
        # all-null column: no values, nulls == rows
        assert cols["dead"][0] is None and cols["dead"][2] == ent["rows"]


def test_metadata_count_tracks_every_writer(spark, tmp_path):
    """metadata_count answers SELECT count(*) from the log alone and
    stays exact through upsert, DV delete, CoW update/delete and
    OPTIMIZE — cross-checked against the real scan at every step,
    including as-of-version time travel."""
    path = str(tmp_path / "tbl")

    def check():
        real = sinks.read_committed(spark, path).count()
        assert sinks.metadata_count(path) == real

    sinks.merge_upsert(
        _mk(spark, [(i, i % 7) for i in range(200)], "k int, v int"),
        path,
        ["k"],
    )
    check()
    assert sinks.merge_delete(
        _mk(spark, [(3,), (5,), (7,)], "k int"), path, ["k"], mode="dv"
    ) == 3
    check()
    sinks.merge_update(
        _mk(spark, [(10, 99), (1000, 1)], "k int, v int"), path, ["k"]
    )
    check()
    assert sinks.merge_delete(
        _mk(spark, [(11,), (12,)], "k int"), path, ["k"]
    ) == 2
    check()
    sinks.optimize_table(spark, path, target_file_bytes=1 << 20)
    check()
    # time travel: exact at every surviving version
    head, _ = sinks.committed_files(path)
    for v in range(head + 1):
        assert (
            sinks.metadata_count(path, version=v)
            == sinks.read_committed(spark, path, version=v).count()
        )


def test_metadata_count_none_for_legacy_commits(spark, tmp_path):
    """A live file whose commit predates stats recording makes the
    metadata answer None (honest fallback), never a wrong number."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(1, "a"), (2, "b")], "k int, v string"), path, ["k"]
    )
    recs = glob.glob(os.path.join(path, "_kdp_log", "0*.json"))
    (rec_path,) = recs
    with open(rec_path) as f:
        rec = json.load(f)
    del rec["stats"]
    with open(rec_path, "w") as f:
        json.dump(rec, f)
    assert sinks.metadata_count(path) is None
    assert sinks.metadata_min_max(path, "k") is None
    # rows remain perfectly readable
    assert sinks.read_committed(spark, path).count() == 2


def test_metadata_min_max(spark, tmp_path):
    """min/max from the log: exact on a DV-free table; DV presence
    degrades to containing bounds (exact=False); None for a column
    without stats."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(
            spark,
            [(i, float(i) / 4, None) for i in range(50)],
            "k int, x double, dead string",
        ),
        path,
        ["k"],
    )
    assert sinks.metadata_min_max(path, "k") == (0, 49, True)
    assert sinks.metadata_min_max(path, "x") == (0.0, 49 / 4, True)
    lo, hi, exact = sinks.metadata_min_max(path, "dead")
    assert lo is None and hi is None and exact
    sinks.merge_delete(
        _mk(spark, [(49,)], "k int"), path, ["k"], mode="dv"
    )
    lo, hi, exact = sinks.metadata_min_max(path, "k")
    assert (lo, hi) == (0, 49) and not exact  # bounds, flagged inexact
    # the dv_added record carries per-file delete counts (triples)
    dv_recs = [r for r in _commit_recs(path) if r.get("dv_added")]
    assert dv_recs and all(
        len(e) == 3 and e[2] >= 1 for r in dv_recs for e in r["dv_added"]
    )


def test_prune_read_skips_files_and_stays_sound(spark, tmp_path):
    """read_committed(prune=) opens strictly fewer files on a
    clustered table and returns exactly the rows the equivalent
    post-filter of the full read returns; a file whose commit lost its
    stats is read conservatively (soundness does not depend on
    stats)."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(
            spark,
            [
                # incompressible pad so file sizes track row counts
                (i, i % 97, f"{(i * 2654435761) % (1 << 61):016x}" * 4)
                for i in range(4000)
            ],
            "k int, v int, pad string",
        ),
        path,
        ["k"],
    )
    sinks.optimize_table(
        spark, path, target_file_bytes=12_000, cluster_by=["k"]
    )
    _, files = sinks.committed_files(path)
    assert len(files) >= 4
    probe = {"k": ("range", 100, 300)}
    pruned = sinks.read_committed(spark, path, prune=probe)
    full = sinks.read_committed(spark, path)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = sorted(
        (r.k, r.v)
        for r in full.where("k between 100 and 300").collect()
    )
    got = sorted(
        (r.k, r.v)
        for r in pruned.where("k between 100 and 300").collect()
    )
    assert got == want
    # strip stats from the OPTIMIZE commit: every file reads again
    recs = glob.glob(os.path.join(path, "_kdp_log", "0*.json"))
    for rp in recs:
        with open(rp) as f:
            rec = json.load(f)
        rec.pop("stats", None)
        with open(rp, "w") as f:
            json.dump(rec, f)
    conservative = sinks.read_committed(spark, path, prune=probe)
    assert len(conservative.inputFiles()) == len(full.inputFiles())


def test_check_constraints_gate_writers(spark, tmp_path):
    """CHECK constraints: setting one a current row violates is
    rejected; once set, upsert and update batches that violate raise
    BEFORE any commit (no partial state); null passes (SQL CHECK
    semantics); a batch omitting an evolved column passes a CHECK on
    that column; drop re-admits."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(1, 10), (2, -5)], "k int, v int"), path, ["k"]
    )
    with pytest.raises(ValueError, match="v_pos"):
        sinks.set_check_constraint(spark, path, "v_pos", "v > 0")
    sinks.merge_delete(_mk(spark, [(2,)], "k int"), path, ["k"])
    sinks.set_check_constraint(spark, path, "v_pos", "v > 0")
    assert sinks.table_constraints(path) == {"v_pos": "v > 0"}
    head_before, _ = sinks.committed_files(path)
    with pytest.raises(ValueError, match="v_pos"):
        sinks.merge_upsert(
            _mk(spark, [(3, 0)], "k int, v int"), path, ["k"]
        )
    with pytest.raises(ValueError, match="v_pos"):
        sinks.merge_update(
            _mk(spark, [(1, -1)], "k int, v int"), path, ["k"]
        )
    head_after, _ = sinks.committed_files(path)
    assert head_after == head_before  # nothing landed
    # null PASSES a CHECK (SQL semantics) — and a batch omitting an
    # evolved column (nulls there) passes a CHECK on that column
    sinks.merge_upsert(
        _mk(spark, [(4, None)], "k int, v int"), path, ["k"]
    )
    sinks.merge_upsert(
        _mk(spark, [(5, 1, "t")], "k int, v int, tag string"),
        path,
        ["k"],
        merge_schema=True,
    )
    sinks.set_check_constraint(
        spark, path, "tag_len", "length(tag) < 10"
    )
    sinks.merge_upsert(  # no tag column: inserts null tag, passes
        _mk(spark, [(6, 2)], "k int, v int"), path, ["k"]
    )
    sinks.drop_check_constraint(path, "v_pos")
    sinks.merge_upsert(
        _mk(spark, [(7, -100)], "k int, v int"), path, ["k"]
    )
    assert sinks.table_constraints(path) == {
        "tag_len": "length(tag) < 10"
    }
    with pytest.raises(ValueError, match="no constraint"):
        sinks.drop_check_constraint(path, "v_pos")


def test_constraint_beats_racing_writer(spark, tmp_path):
    """A writer that planned BEFORE a constraint landed cannot race a
    violating row past it: the constraint commit carries no key_ranges,
    so the loser's disjoint-commit rebase refuses and the full retry
    re-plans under the new constraint — which rejects the batch."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(1, 5)], "k int, v int"), path, ["k"]
    )
    fired = []

    def hook(attempt):
        if not fired:
            fired.append(True)
            sinks.set_check_constraint(spark, path, "v_pos", "v > 0")

    with pytest.raises(ValueError, match="v_pos"):
        sinks.merge_upsert(
            _mk(spark, [(9, -1)], "k int, v int"),
            path,
            ["k"],
            _test_hook=hook,
        )
    ks = {r.k for r in sinks.read_committed(spark, path).collect()}
    assert ks == {1}


def test_checkpoint_carries_stats_and_constraints(spark, tmp_path):
    """Resolution from a checkpoint alone must keep metadata_count
    exact and constraints enforced — a checkpoint that shed either
    would silently turn off data skipping and CHECK enforcement for
    every reader/writer that starts from it."""
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        _mk(spark, [(i, i) for i in range(10)], "k int, v int"),
        path,
        ["k"],
    )
    sinks.set_check_constraint(spark, path, "v_nonneg", "v >= 0")
    for i in range(sinks.CHECKPOINT_INTERVAL + 2):
        sinks.merge_upsert(
            _mk(spark, [(100 + i, i)], "k int, v int"), path, ["k"]
        )
    ckpts = sorted(
        glob.glob(os.path.join(path, "_kdp_log", "checkpoint-*.json"))
    )
    assert ckpts
    ck = json.load(open(ckpts[-1]))
    assert ck.get("stats") and ck.get("constraints")
    ck_v = ck["version"]
    for f in glob.glob(os.path.join(path, "_kdp_log", "0*.json")):
        if int(os.path.basename(f)[:-5]) <= ck_v:
            os.remove(f)
    real = sinks.read_committed(spark, path).count()
    assert sinks.metadata_count(path) == real
    assert sinks.table_constraints(path) == {"v_nonneg": "v >= 0"}
    with pytest.raises(ValueError, match="v_nonneg"):
        sinks.merge_upsert(
            _mk(spark, [(999, -1)], "k int, v int"), path, ["k"]
        )


def test_consume_changes_cursor_discipline(spark, tmp_path):
    """The CDC consumer: delivers exactly the commits after its
    cursor, advances only on handler success (a crash re-delivers the
    same window — at-least-once), no-ops when caught up, and
    max_versions slices a backlog into bounded polls."""
    from kommunedata_data_pipeline_spark.streaming import (
        changes_cursor,
        consume_changes,
    )

    path = str(tmp_path / "tbl")
    state = str(tmp_path / "cursor")
    sinks.merge_upsert(
        _mk(spark, [(1, "a"), (2, "b")], "k int, v string"), path, ["k"]
    )
    sinks.merge_upsert(_mk(spark, [(3, "c")], "k int, v string"), path, ["k"])
    got = []

    def handler(df, frm, to):
        got.append((frm, to, sorted((r.k, r._change_type) for r in df.collect())))

    assert consume_changes(spark, path, state, handler) == (-1, 1)
    assert got[-1] == (
        -1,
        1,
        [(1, "insert"), (2, "insert"), (3, "insert")],
    )
    # caught up: handler not called
    assert consume_changes(spark, path, state, handler) == (1, 1)
    assert len(got) == 1
    # new commits deliver only the delta; a failing handler leaves the
    # cursor so the next poll re-delivers the SAME window
    sinks.merge_update(_mk(spark, [(1, "A")], "k int, v string"), path, ["k"])
    sinks.merge_delete(_mk(spark, [(2,)], "k int"), path, ["k"], mode="dv")

    def boom(df, frm, to):
        raise RuntimeError("consumer crash")

    with pytest.raises(RuntimeError):
        consume_changes(spark, path, state, boom)
    assert changes_cursor(state) == 1
    assert consume_changes(spark, path, state, handler) == (1, 3)
    assert got[-1][2] == [
        (1, "delete"),
        (1, "insert"),
        (2, "delete"),
    ]
    # backlog slicing
    state2 = str(tmp_path / "cursor2")
    windows = []
    while True:
        frm, to = consume_changes(
            spark, path, state2, lambda df, f, t: None, max_versions=2
        )
        if frm == to:
            break
        windows.append((frm, to))
    assert windows == [(-1, 1), (1, 3)]


def test_zorder_clusters_every_column(spark, tmp_path):
    """OPTIMIZE cluster_method='zorder' on two independent columns:
    per-file stats (from the commit log) prove file-level locality on
    BOTH columns, where lexicographic range clustering serves only the
    leading one; rows identical; the pruned read returns exactly the
    post-filtered rows."""
    rows = [
        # incompressible pad so file sizes track row counts
        (i, (i * 2654435761) % 4096, f"{(i * 0x9E3779B9) % (1 << 61):016x}" * 3)
        for i in range(4096)
    ]
    schema = "x int, y int, pad string"

    def match_fraction(path, col, lo, hi):
        st = sinks._resolve_log(path)
        total = len(st.files)
        n = 0
        for rel in st.files:
            c = st.stats[rel]["cols"][col]
            if not (c[1] < lo or c[0] > hi):
                n += 1
        return n / total, total

    zpath = str(tmp_path / "z")
    sinks.merge_upsert(spark.createDataFrame(rows, schema), zpath, ["x"])
    pre = sorted(
        (r.x, r.y) for r in sinks.read_committed(spark, zpath).collect()
    )
    sinks.optimize_table(
        spark,
        zpath,
        target_file_bytes=12_000,
        cluster_by=["x", "y"],
        cluster_method="zorder",
    )
    post = sorted(
        (r.x, r.y) for r in sinks.read_committed(spark, zpath).collect()
    )
    assert post == pre
    fx, nz = match_fraction(zpath, "x", 0, 255)
    fy, _ = match_fraction(zpath, "y", 0, 255)
    assert nz >= 8, f"layout too coarse to measure ({nz} files)"
    assert fx <= 0.6 and fy <= 0.6, (fx, fy, nz)

    rpath = str(tmp_path / "r")
    sinks.merge_upsert(spark.createDataFrame(rows, schema), rpath, ["x"])
    sinks.optimize_table(
        spark,
        rpath,
        target_file_bytes=12_000,
        cluster_by=["x", "y"],
    )
    rfy, nr = match_fraction(rpath, "y", 0, 255)
    assert nr >= 8
    assert rfy >= 0.9, (rfy, nr)  # lexicographic: y un-skippable

    # pruned read equivalence on the z-ordered table
    probe = {"y": ("range", 0, 255)}
    pruned = sinks.read_committed(spark, zpath, prune=probe)
    assert len(pruned.inputFiles()) < nz
    want = sorted(
        (r.x, r.y)
        for r in sinks.read_committed(spark, zpath)
        .where("y between 0 and 255")
        .collect()
    )
    got = sorted(
        (r.x, r.y)
        for r in pruned.where("y between 0 and 255").collect()
    )
    assert got == want


def test_zorder_string_and_null_columns(spark, tmp_path):
    """Z-order handles string columns (order-preserving byte
    surrogate) and null values (bucket 0) without losing rows."""
    rows = [
        (i, f"{chr(97 + (i * 31) % 26)}{i:05d}" if i % 10 else None)
        for i in range(2000)
    ]
    path = str(tmp_path / "tbl")
    sinks.merge_upsert(
        spark.createDataFrame(rows, "k int, name string"), path, ["k"]
    )
    pre = sorted(
        (r.k, r.name)
        for r in sinks.read_committed(spark, path).collect()
    )
    sinks.optimize_table(
        spark,
        path,
        target_file_bytes=8_000,
        cluster_by=["name", "k"],
        cluster_method="zorder",
    )
    post = sorted(
        (r.k, r.name)
        for r in sinks.read_committed(spark, path).collect()
    )
    assert post == pre
    with pytest.raises(ValueError, match="cluster_method"):
        sinks.optimize_table(spark, path, cluster_method="hilbert")
