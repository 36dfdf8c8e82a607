"""Sink battery (SURVEY §2.1 S14-S18, ST2 idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.sources.sinks import (
    load_catalog,
    upsert_partitioned,
    write_csv,
    write_dead_letter,
    write_partitioned,
    write_text,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_key string, municipality string, committee string, n int"
    )


def test_partitioned_write_layout(spark, tmp_path):
    out = str(tmp_path / "sink")
    df = _batch(
        spark,
        [
            ("2025-01-01_aarhus_oek.pdf", "aarhus", "oek", 1),
            ("2025-01-02_odense_plan.pdf", "odense", "plan", 2),
        ],
    )
    write_partitioned(df, out)
    # Hive-style partition dirs => partition pruning for P3/P5 predicates
    assert (tmp_path / "sink" / "municipality=aarhus" / "committee=oek").exists()
    back = spark.read.parquet(out)
    assert back.count() == 2
    # partition filter prunes directories (pushed to the file index)
    assert back.where(F.col("municipality") == "aarhus").count() == 1


def test_upsert_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sink")
    b1 = _batch(
        spark,
        [
            ("k1", "aarhus", "oek", 1),
            ("k1", "aarhus", "oek", 1),  # in-batch dup (D1)
            ("k2", "odense", "plan", 2),
        ],
    )
    assert upsert_partitioned(b1, out, ["doc_key"]) == 2
    # exact re-delivery lands zero rows (ST2)
    assert upsert_partitioned(b1, out, ["doc_key"]) == 0
    # overlapping new batch lands only the novel key (J2 anti-join)
    b2 = _batch(spark, [("k2", "odense", "plan", 2), ("k3", "aarhus", "oek", 3)])
    assert upsert_partitioned(b2, out, ["doc_key"]) == 1
    assert spark.read.parquet(out).count() == 3
    cat = load_catalog(spark, out, ["doc_key"])
    assert sorted(r.doc_key for r in cat.collect()) == ["k1", "k2", "k3"]


def test_csv_and_text_sinks(spark, tmp_path):
    df = spark.createDataFrame(
        [("https://a.dk", "https://a.dk/s")], "base_url string, start_url string"
    )
    write_csv(df, str(tmp_path / "cfg"))
    back = spark.read.option("header", True).csv(str(tmp_path / "cfg"))
    assert back.columns == ["base_url", "start_url"] and back.count() == 1

    urls = spark.createDataFrame([("https://b.dk",), ("https://a.dk",)], "url string")
    write_text(urls, str(tmp_path / "urls"))
    lines = [r.value for r in spark.read.text(str(tmp_path / "urls")).collect()]
    assert lines == ["https://a.dk", "https://b.dk"]  # sorted (O2)


def test_dead_letter_split_write(spark, tmp_path):
    rows = spark.createDataFrame(
        [("u1", None), ("u2", "parse failure")], "url string, error string"
    )
    ok, bad = rows.where(F.col("error").isNull()), rows.where(F.col("error").isNotNull())
    write_dead_letter(ok, bad, str(tmp_path / "landed"))
    assert spark.read.parquet(str(tmp_path / "landed")).count() == 1
    q = spark.read.parquet(str(tmp_path / "landed_quarantine"))
    assert [r.error for r in q.collect()] == ["parse failure"]


def test_binary_blob_reader(spark, tmp_path):
    """S12-at-rest — binaryFile scan of landed blobs gives
    (path, modificationTime, length, content)."""
    from kommunedata_data_pipeline_spark.sources.readers import read_binary_blobs

    (tmp_path / "a.pdf").write_bytes(b"%PDF-1.4 aaa")
    (tmp_path / "b.pdf").write_bytes(b"%PDF-1.4 bb")
    (tmp_path / "skip.txt").write_bytes(b"nope")
    df = read_binary_blobs(spark, str(tmp_path), "*.pdf")
    rows = {r.path.split("/")[-1]: bytes(r.content) for r in df.collect()}
    assert set(rows) == {"a.pdf", "b.pdf"}
    assert rows["a.pdf"].startswith(b"%PDF-1.4")
    assert {r.length for r in df.collect()} == {12, 11}


def test_jsonl_round_trip_and_corrupt_capture(spark, tmp_path):
    """JSONL reader: declared schema (no inference pass), corrupt lines
    land in _corrupt_record instead of failing the scan."""
    from kommunedata_data_pipeline_spark.sources.readers import (
        read_jsonl,
        write_jsonl,
    )

    out = str(tmp_path / "docs_jsonl")
    df = spark.createDataFrame(
        [(1, "alpha", 4.5), (2, "beta", None)], "id long, name string, score double"
    )
    write_jsonl(df, out)
    back = read_jsonl(spark, out, "id long, name string, score double")
    assert {
        (r.id, r.name, r.score) for r in back.select("id", "name", "score").collect()
    } == {(1, "alpha", 4.5), (2, "beta", None)}

    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.jsonl").write_text(
        '{"id": 1, "name": "ok", "score": 1.0}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "fine", "score": 2.0}\n'
    )
    mixed = read_jsonl(spark, str(bad), "id long, name string, score double")
    rows = mixed.collect()
    good = [r for r in rows if r._corrupt_record is None]
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert {r.id for r in good} == {1, 2}
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC sink/scan: values survive, partition dirs exist, and a filter
    on the partition column prunes; a value filter reaches PushedFilters."""
    from kommunedata_data_pipeline_spark.sources.readers import read_orc, write_orc

    out = str(tmp_path / "orc_sink")
    df = _batch(
        spark,
        [
            ("a.pdf", "aarhus", "oek", 1),
            ("b.pdf", "odense", "plan", 2),
            ("c.pdf", "aarhus", "plan", 3),
        ],
    )
    write_orc(df, out, partition_cols=["municipality"])
    assert (tmp_path / "orc_sink" / "municipality=aarhus").exists()
    back = read_orc(spark, out)
    assert back.count() == 3
    assert back.where(F.col("municipality") == "aarhus").count() == 2
    plan = (
        back.where(F.col("n") > 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "GreaterThan(n,1)" in plan


# ------------------------------------------------- transactional merge


def test_merge_upsert_replay_lands_zero(spark, tmp_path):
    """ST2 replay on the transactional sink: same batch twice -> second
    call writes nothing; snapshot reads resolve the manifest."""
    from kommunedata_data_pipeline_spark.sources.sinks import (
        merge_upsert,
        read_committed,
    )

    path = str(tmp_path / "tbl")
    batch = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "x"), (2, "b", "x")],
        "k int, v string, part string",
    )
    assert merge_upsert(batch, path, ["k"], ["part"]) == 2
    assert merge_upsert(batch, path, ["k"], ["part"]) == 0
    out = read_committed(spark, path)
    assert out.count() == 2
    assert set(out.columns) == {"k", "v", "part"}


def test_merge_upsert_interleaved_writers_no_lost_no_dup(spark, tmp_path):
    """The lost-update window of catalog-then-append, closed: writer A
    plans its anti-join, then writer B (injected via the staging/commit
    seam) lands an overlapping batch FIRST; A must lose the version
    race, retry against B's state, land only its unique rows."""
    from kommunedata_data_pipeline_spark.sources.sinks import (
        merge_upsert,
        read_committed,
    )

    path = str(tmp_path / "tbl")
    a = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], "k int, v string"
    )
    b = spark.createDataFrame([(2, "b2"), (4, "b4")], "k int, v string")
    fired = []

    def interleave(attempt):
        if not fired:  # only on A's first attempt
            fired.append(1)
            merge_upsert(b, path, ["k"])

    n_a = merge_upsert(a, path, ["k"], _test_hook=interleave)
    out = read_committed(spark, path).orderBy("k").collect()
    ks = [r["k"] for r in out]
    assert ks == [1, 2, 3, 4], ks          # nothing lost, nothing duplicated
    assert n_a == 2                        # A lost key 2 to B's commit
    vals = {r["k"]: r["v"] for r in out}
    assert vals[2] == "b2"                 # the race winner's row survives


def test_merge_upsert_parallel_threads(spark, tmp_path):
    """True-parallel writers: every key lands exactly once across 4
    concurrent overlapping upserts."""
    import threading

    from kommunedata_data_pipeline_spark.sources.sinks import (
        merge_upsert,
        read_committed,
    )

    path = str(tmp_path / "tbl")
    batches = [
        spark.createDataFrame(
            [(k, f"w{w}") for k in range(w * 5, w * 5 + 10)],
            "k int, v string",
        )
        for w in range(4)
    ]
    errs = []

    def run(b):
        try:
            merge_upsert(b, path, ["k"])
        except Exception as exc:  # surface thread failures
            errs.append(exc)

    ts = [threading.Thread(target=run, args=(b,)) for b in batches]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    rows = read_committed(spark, path).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in rows)
    assert {r["k"] for r in rows} == set(range(25))


def test_vacuum_removes_only_orphans(spark, tmp_path):
    from kommunedata_data_pipeline_spark.sources.sinks import (
        merge_upsert,
        read_committed,
        vacuum_uncommitted,
    )

    path = str(tmp_path / "tbl")
    batch = spark.createDataFrame([(1, "a")], "k int, v string")
    merge_upsert(batch, path, ["k"])
    # fake a crashed writer's orphan
    orphan = tmp_path / "tbl" / "part-deadbeef.snappy.parquet"
    orphan.write_bytes(b"not a real parquet")
    assert vacuum_uncommitted(path, retention_seconds=0) == 1
    assert not orphan.exists()
    assert read_committed(spark, path).count() == 1
