"""Round-9 operator tests: substring dedup cover, KS test, keyness,
clustering depth, calibration-hist contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ substring dup spans


def test_substring_spans_exact_cover_vs_brute_force(spark):
    """The L-gram cover must equal the brute-force repeated-substring
    cover (the Lee et al. identity) on a corpus small enough to check
    every position directly."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        substring_dup_spans,
    )

    L = 5
    docs = [
        (1, "abcdefghij_SHAREDBLOCK_123"),
        (2, "zz_SHAREDBLOCK_qqqqqqqqqq"),   # SHAREDBLOCK repeats x-doc
        (3, "mmmmmmmmmm"),                   # self-repeat: mmmmm x6
        (4, "short"),                        # len 5: one gram, unique
        (5, "xyz"),                          # shorter than L: no grams
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(d, min_len=L).collect()
    }
    # brute force: position p covered iff text[p:p+L] occurs >= 2 times
    # in the corpus (counting overlaps within one doc)
    texts = dict((i, t) for i, t in docs)
    from collections import Counter

    grams = Counter()
    for t in texts.values():
        for p in range(len(t) - L + 1):
            grams[t[p : p + L]] += 1
    want = set()
    for i, t in texts.items():
        covered = sorted(
            p for p in range(len(t) - L + 1) if grams[t[p : p + L]] >= 2
        )
        spans = []
        for p in covered:
            s, e = p + 1, p + L  # 1-based inclusive
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        want |= {(i, s, e) for s, e in spans}
    assert got == want
    assert any(i == 3 for i, _, _ in got)  # self-repeat found
    assert not any(i in (4, 5) for i, _, _ in got)


def test_substring_spans_merge_adjacent(spark):
    """Two duplicated grams whose spans touch merge into one span."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        substring_dup_spans,
    )

    # 'aaaaaa' (6 chars, L=3): grams at 1..4 all 'aaa' -> one span 1..6
    d = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "bbb_aaa_ccc")], "doc_id long, text string"
    )
    rows = substring_dup_spans(d, min_len=3).collect()
    one = [r for r in rows if r["doc_id"] == 1]
    assert len(one) == 1
    assert (one[0]["span_start"], one[0]["span_end"]) == (1, 6)


# --------------------------------------------------------- KS test


def test_ks_matches_scipy_free_replica(spark):
    """KS D against a direct two-CDF replica on mixed tied data."""
    from kommunedata_data_pipeline_spark.operators.statistics import ks_test

    data = [(1, 0), (1, 1), (2, 0), (3, 0), (3, 1), (5, 1), (8, 1), (2, 0)]
    d = spark.createDataFrame(data, "s int, g int")
    row = ks_test(d, "s", "g").collect()[0]
    xs0 = sorted(s for s, g in data if g == 0)
    xs1 = sorted(s for s, g in data if g == 1)
    import bisect

    dmax = max(
        abs(
            bisect.bisect_right(xs1, t) / len(xs1)
            - bisect.bisect_right(xs0, t) / len(xs0)
        )
        for t in {s for s, _ in data}
    )
    assert row["n0"] == len(xs0) and row["n1"] == len(xs1)
    assert row["d"] == pytest.approx(dmax, abs=1e-6)


def test_ks_identical_distributions_and_degenerate(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import ks_test

    same = spark.createDataFrame(
        [(v, g) for v in (1, 2, 3) for g in (0, 1)], "s int, g int"
    )
    row = ks_test(same, "s", "g").collect()[0]
    assert row["d"] == 0.0 and row["reject_05"] == 0
    empty_arm = spark.createDataFrame([(1, 1), (2, 1)], "s int, g int")
    row = ks_test(empty_arm, "s", "g").collect()[0]
    assert row["d"] is None and row["reject_05"] is None


def test_ks_disjoint_distributions_reject(spark):
    """Fully separated samples -> D = 1, rejected at any sane size."""
    from kommunedata_data_pipeline_spark.operators.statistics import ks_test

    d = spark.createDataFrame(
        [(v, 0) for v in range(10)] + [(v + 100, 1) for v in range(10)],
        "s int, g int",
    )
    row = ks_test(d, "s", "g").collect()[0]
    assert row["d"] == 1.0 and row["reject_05"] == 1


# --------------------------------------------------------- keyness


def test_keyness_flags_corpus_specific_token(spark):
    from kommunedata_data_pipeline_spark.operators.corpus import (
        token_keyness,
    )

    rows = [(1, "alpha alpha alpha beta", "en")] * 5 + [
        (2, "gamma gamma gamma beta", "da")
    ] * 5
    d = spark.createDataFrame(
        [(i, t, l) for i, (j, t, l) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )
    out = token_keyness(d, F.col("lang") == "en", min_count=1, k=10).collect()
    by_tok = {r["token"]: r for r in out}
    # alpha is en-only, gamma da-only, beta balanced
    assert by_tok["alpha"]["direction"] == 1
    assert by_tok["gamma"]["direction"] == -1
    assert by_tok["alpha"]["g2"] > by_tok["beta"]["g2"]
    assert by_tok["beta"]["g2"] == pytest.approx(0.0, abs=1e-4)


def test_keyness_g2_matches_hand_formula(spark):
    import math

    from kommunedata_data_pipeline_spark.operators.corpus import (
        token_keyness,
    )

    d = spark.createDataFrame(
        [(1, "x x x y", "en"), (2, "x y y y", "da")],
        "doc_id long, text string, lang string",
    )
    out = {r["token"]: r for r in token_keyness(
        d, F.col("lang") == "en", min_count=1, k=10
    ).collect()}
    a, b, na, nb = 3, 1, 4, 4  # token x
    n = na + nb
    g2 = 2 * (
        a * math.log(a * n / (na * (a + b)))
        + b * math.log(b * n / (nb * (a + b)))
    )
    assert out["x"]["g2"] == pytest.approx(round(g2, 6), abs=1e-6)


# ------------------------------------------------- clustering depth


def test_clustering_depth_sorted_vs_scattered(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        clustering_depth,
    )

    # key-sorted layout: disjoint zones -> depth 1 (touching at the
    # shared boundary counts as overlap only when zones share a value)
    d = spark.createDataFrame(
        [(i, i) for i in range(40)], "k int, v int"
    )
    out = clustering_depth(
        d,
        {
            "sorted": F.floor(F.col("k") / 10),      # files 0-9,10-19,...
            "scattered": F.col("k") % 4,             # every file spans all v
        },
        "v",
    ).collect()
    by = {r["layout"]: r for r in out}
    assert by["sorted"]["max_depth"] == 1
    assert by["scattered"]["max_depth"] == 4
    assert by["sorted"]["n_files"] == 4 and by["scattered"]["n_files"] == 4


def test_clustering_depth_touching_zones_count_as_overlap(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        clustering_depth,
    )

    # two files sharing boundary value 5: depth 2 at v=5
    d = spark.createDataFrame(
        [(0, 1), (0, 5), (1, 5), (1, 9)], "f int, v int"
    )
    out = clustering_depth(d, {"l": F.col("f")}, "v").collect()
    assert out[0]["max_depth"] == 2


# ------------------------------------------- calibration bins (hist)


def test_calibration_hist_bins_partition_and_tie_contract(spark):
    """Bins partition the corpus; a tie group never splits; totals
    match the exact-ntile twin's totals."""
    from kommunedata_data_pipeline_spark.operators.statistics import (
        calibration_bins_hist,
    )

    rows = [(i, i % 7, 1 if i % 3 == 0 else 0) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, score_u long, label int")
    out = calibration_bins_hist(d, n_bins=4).collect()
    assert sum(r["n"] for r in out) == 100
    assert sum(r["n_pos"] for r in out) == sum(r[2] for r in rows)
    assert [r["bin"] for r in out] == sorted(r["bin"] for r in out)
    # 7 distinct scores in 4 bins: every score group lands whole
    per_score = {}
    for i, s, _l in rows:
        per_score[s] = per_score.get(s, 0) + 1
    sizes = [r["n"] for r in out]
    # each bin size is a sum of whole score-group sizes
    import itertools

    group_sizes = sorted(per_score.values())
    for n in sizes:
        found = any(
            sum(c) == n
            for r in range(1, len(group_sizes) + 1)
            for c in itertools.combinations(group_sizes, r)
        )
        assert found, (n, group_sizes)


# ------------------------------------------------------------- RRF


def test_rrf_fuse_integer_reciprocals_and_consensus(spark):
    """A doc ranked mid by BOTH lists outranks a doc ranked top by one
    list only (the RRF consensus property at k0=60); scores are exact
    integer micro-units."""
    from kommunedata_data_pipeline_spark.operators.retrieval import rrf_fuse

    r1 = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    r2 = spark.createDataFrame(
        [(40, 1), (20, 2), (30, 3)], "doc_id long, rank int"
    )
    out = rrf_fuse([r1, r2], k0=60, topk=10).collect()
    by = {r["doc_id"]: r for r in out}
    assert by[20]["n_lists"] == 2
    # doc 20: 2 * (1e9 div 62); docs 10/40: 1e9 div 61
    assert by[20]["rrf_u"] == 2 * (10**9 // 62)
    assert by[10]["rrf_u"] == 10**9 // 61
    assert by[20]["rrf_u"] > by[10]["rrf_u"]
    assert [r["doc_id"] for r in out][0] == 20


def test_term_jaccard_exact_ratio(spark):
    from kommunedata_data_pipeline_spark.operators.retrieval import (
        term_jaccard_topk,
    )

    d = spark.createDataFrame(
        [(1, "spark merge spark"), (2, "vector soup"), (3, "nothing here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["tj"] for r in term_jaccard_topk(
        d, ["spark", "vector", "merge"], topk=10
    ).collect()}
    # doc 1: set {spark, merge}, inter 2, union 2+3-2=3
    assert out[1] == pytest.approx(round(2 / 3, 6))
    # doc 2: inter 1, set {vector, soup}, union 2+3-1=4
    assert out[2] == pytest.approx(0.25)
    assert 3 not in out  # zero-overlap docs never rank


# ------------------------------------------------- event pattern


def test_event_pattern_negation_semantics(spark):
    """'V[^P]*C.*P' demands a view->click with NO intervening purchase:
    user 1 (V C P) matches, user 2 (V P C P) does not, user 3 (V C) has
    no purchase -> no match."""
    from kommunedata_data_pipeline_spark.operators.funnel import (
        event_pattern_match,
    )

    rows = [
        (1, "view", 1, 1), (1, "click", 2, 2), (1, "purchase", 3, 3),
        (2, "view", 1, 4), (2, "purchase", 2, 5), (2, "click", 3, 6),
        (2, "purchase", 4, 7),
        (3, "view", 1, 8), (3, "click", 2, 9),
    ]
    d = spark.createDataFrame(
        [(u, t, float(ts), i) for u, t, ts, i in rows],
        "user_id long, event_type string, ts double, event_id long",
    )
    out = event_pattern_match(
        d,
        {"view": "V", "click": "C", "purchase": "P"},
        "V[^P]*C.*P",
    ).collect()[0]
    assert out["n_users"] == 3
    assert out["n_matched"] == 1
    assert out["match_rate"] == pytest.approx(round(1 / 3, 6))


def test_event_pattern_order_is_ts_then_id(spark):
    """Same-ts ties break on event_id — the (ts, id) total order."""
    from kommunedata_data_pipeline_spark.operators.funnel import (
        event_pattern_match,
    )

    d = spark.createDataFrame(
        [(1, "click", 1.0, 2), (1, "view", 1.0, 1)],
        "user_id long, event_type string, ts double, event_id long",
    )
    out = event_pattern_match(
        d, {"view": "V", "click": "C"}, "^VC$"
    ).collect()[0]
    assert out["n_matched"] == 1


# --------------------------------------- substring ingest invariance


def test_substring_ingest_invariant_and_replay(spark, tmp_path):
    """The ExactSubstr ingest member's family contract: for id-ordered
    batch splits the landed set equals the one-batch rule (drop iff
    >= 50% of chars covered by grams of smaller-id docs ever seen);
    the min-merge store update is idempotent, so replaying the staged
    corpus over the SAME store+catalog lands zero new rows."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kommunedata_data_pipeline_spark.operators.corpus import (
        char_gram_hashes,
        merged_span_lengths,
    )
    from kommunedata_data_pipeline_spark.sources.readers import load_table
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        run_writer_available_now,
        substring_dedup_ingest,
    )

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 60)
    )
    L = 15
    # batch-mode expected landed set
    grams = char_gram_hashes(docs, L)
    firsts = grams.groupBy("h1", "h2").agg(F.min("doc_id").alias("md"))
    covered = (
        grams.join(firsts, ["h1", "h2"])
        .where(F.col("md") < F.col("doc_id"))
        .select("doc_id", "p")
    )
    dup = merged_span_lengths(covered, L)
    stats = (
        docs.select("doc_id", F.length("text").alias("n"))
        .join(dup, "doc_id", "left")
        .select(
            "doc_id", "n",
            F.coalesce("dup_chars", F.lit(0).cast("bigint")).alias("dc"),
        )
    )
    want = {
        r["doc_id"]
        for r in stats.where(
            F.col("dc").cast("double") < 0.5 * F.col("n")
        ).collect()
    }
    assert want and want != {
        r["doc_id"] for r in docs.select("doc_id").collect()
    }, "test corpus must exercise BOTH the keep and drop paths"

    def run(split_bounds, base=None, keep=False):
        base = base or tempfile.mkdtemp(
            prefix="kdp-subing-test-",
            dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
        )
        stage = f"{base}/stage"
        if not os.path.isdir(stage):
            os.makedirs(stage)
            lo = 0
            for i, hi in enumerate(split_bounds):
                part = f"{base}/p{i}"
                docs.where(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ).coalesce(1).write.mode("overwrite").parquet(part)
                src = glob.glob(f"{part}/part-*.parquet")[0]
                dst = f"{stage}/b{i}.parquet"
                os.rename(src, dst)
                os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
                lo = hi
        ck = f"{base}/ckpt-{len(os.listdir(base))}"
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        run_writer_available_now(
            substring_dedup_ingest(
                stream, f"{base}/index", f"{base}/landed",
                min_len=L, max_dup_ratio=0.5,
            ),
            ck,
        )
        landed = {
            r.doc_id for r in spark.read.parquet(f"{base}/landed").collect()
        }
        if keep:
            return landed, base
        shutil.rmtree(base, ignore_errors=True)
        return landed

    landed_one = run([60])
    landed_three, base3 = run([20, 40, 60], keep=True)
    try:
        assert landed_one == want
        assert landed_three == want
        # replay the whole staged corpus against the SAME store+catalog
        # (fresh checkpoint): zero new rows, store unchanged by min-merge
        n_before = spark.read.parquet(f"{base3}/landed").count()
        landed_replay = run([20, 40, 60], base=base3, keep=True)[0]
        assert landed_replay == want
        assert spark.read.parquet(f"{base3}/landed").count() == n_before
    finally:
        shutil.rmtree(base3, ignore_errors=True)


# ------------------------------------------------------- theil-sen


def test_theil_sen_robust_to_outlier(spark):
    """A clean slope-2 series with one wild outlier day: OLS would
    bend, the Theil-Sen median slope stays 2.0 exactly."""
    from kommunedata_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )

    rows = [("a", x, 2 * x) for x in range(10)]
    rows[5] = ("a", 5, 1000)  # outlier
    d = spark.createDataFrame(rows, "grp string, x long, y long")
    out = theil_sen_trend(d, "grp", "x", "y").collect()[0]
    assert out["slope"] == 2.0
    assert out["n_points"] == 10 and out["n_pairs"] == 45


def test_theil_sen_lower_median_even_pairs(spark):
    """2 points -> 1 pair; 3 points -> 3 pairs, median is the 2nd."""
    from kommunedata_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )

    d = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1), ("g", 2, 4)], "grp string, x long, y long"
    )
    out = theil_sen_trend(d, "grp", "x", "y").collect()[0]
    # slopes: (0,1)->1, (0,2)->2, (1,2)->3; lower median (rank (3+1)//2=2) -> 2
    assert out["slope"] == 2.0 and out["n_pairs"] == 3


# --------------------------------------------- histogram state merge


def test_histogram_merge_equals_direct_and_quantiles(spark):
    """Two shard states merged == the one-shot histogram; quantile
    bins from the merged state match a sorted-list replica."""
    from kommunedata_data_pipeline_spark.operators.aggregates import (
        histogram_state,
        merge_histogram_states,
        quantile_bins_from_histogram,
    )

    vals = [1.0, 4.0, 11.0, 12.0, 25.0, 33.0, 47.0, 52.0, 58.0, 99.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    d = spark.createDataFrame(rows, "k string, i int, v double")
    direct = histogram_state(d, ["k"], "v", 10.0)
    s0 = histogram_state(d.where(F.col("i") % 2 == 0), ["k"], "v", 10.0)
    s1 = histogram_state(d.where(F.col("i") % 2 == 1), ["k"], "v", 10.0)
    merged = merge_histogram_states(s0.unionByName(s1), ["k"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    q = {
        r["q"]: r
        for r in quantile_bins_from_histogram(
            merged, ["k"], [0.5, 0.9], 10.0
        ).collect()
    }
    # p50: ceil(0.5*10)=5th value (25.0) -> bin 2; p90: 9th (58.0) -> bin 5
    assert q[0.5]["bin"] == 2 and q[0.5]["bin_lo"] == 20.0
    assert q[0.9]["bin"] == 5
    assert q[0.5]["total_n"] == 10


# ------------------------------------------------- centroid drift


def test_centroid_drift_identical_and_orthogonal(spark):
    from kommunedata_data_pipeline_spark.operators.similarity import (
        centroid_drift,
    )

    same = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    r = centroid_drift(same, F.col("vec_id") % 2).collect()[0]
    assert r["centroid_cosine"] == 1.0
    assert r["centroid_norm_ratio"] == 1.0
    orth = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    r = centroid_drift(orth, F.col("vec_id") % 2).collect()[0]
    assert r["centroid_cosine"] == 0.0
    assert r["n_a"] == 2 and r["n_b"] == 2


# ------------------------------------------------------ CPR mod-11


def test_cpr_mod11_known_values(spark):
    """070761-4285 is the canonical VALID example (checksum 0 mod 11);
    flipping one digit breaks it; short/non-digit inputs are NULL."""
    from kommunedata_data_pipeline_spark.functions.strings import (
        cpr_mod11_valid,
    )

    d = spark.createDataFrame(
        [("0707614285",), ("0707614286",), ("123",), ("abcdefghij",)],
        "d string",
    )
    out = [r["ok"] for r in d.select(cpr_mod11_valid(F.col("d")).alias("ok")).collect()]
    assert out == [1, 0, None, None]


# --------------------------------------------------- substring cut


def test_substring_cut_keep_first_semantics(spark):
    """The smaller-id doc keeps its text untouched; the larger-id copy
    loses exactly the shared region; rebuilt text matches a Python
    replica of the lag-segment reconstruction."""
    import hashlib

    from kommunedata_data_pipeline_spark.operators.corpus import (
        substring_cut_keep_first,
    )

    shared = "THE_SHARED_BOILERPLATE_BLOCK"
    t1 = f"alpha {shared} omega"
    t2 = f"start {shared} finish"
    d = spark.createDataFrame(
        [(1, t1), (2, t2)], "doc_id long, text string"
    )
    L = 10
    out = {r["doc_id"]: r for r in substring_cut_keep_first(
        d, min_len=L
    ).collect()}
    # doc 1 is first: nothing cut
    assert out[1]["cut_chars"] == 0
    assert out[1]["new_fp"] == hashlib.md5(t1.encode()).hexdigest()
    # doc 2: the covered region is the union of dup L-gram spans —
    # replicate it directly
    grams1 = {t1[p : p + L] for p in range(len(t1) - L + 1)}
    covered = sorted(
        p for p in range(len(t2) - L + 1) if t2[p : p + L] in grams1
    )
    keep = [True] * len(t2)
    for p in covered:
        for i in range(p, p + L):
            keep[i] = False
    expect = "".join(c for c, k in zip(t2, keep) if k)
    assert out[2]["cut_chars"] == len(t2) - len(expect)
    assert out[2]["new_fp"] == hashlib.md5(expect.encode()).hexdigest()


def test_substring_cut_no_dups_is_identity(spark):
    import hashlib

    from kommunedata_data_pipeline_spark.operators.corpus import (
        substring_cut_keep_first,
    )

    d = spark.createDataFrame(
        [(1, "completely unique text one"), (2, "another different body")],
        "doc_id long, text string",
    )
    out = substring_cut_keep_first(d, min_len=10).collect()
    for r in out:
        assert r["cut_chars"] == 0
