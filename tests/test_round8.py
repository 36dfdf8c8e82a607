"""Round-8 operators: evaluation metrics (AUC / PR / ridge / kappa),
applied entity resolution + leakage-safe splits, shard balancing,
tokenizer fertility, datasheets, Luhn validation, zone-map audits,
multimodal binary dedup, matryoshka retrieval."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conftest import SF_SMALL
from kommunedata_data_pipeline_spark.sources.readers import load_table


# --------------------------------------------------------------------- AUC


def _auc_reference(pairs):
    """O(n^2) literal AUC: mean over (pos, neg) pairs of
    1[s_p > s_n] + 0.5 * 1[s_p == s_n]."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    tot = 0.0
    for p in pos:
        for n in neg:
            tot += 1.0 if p > n else (0.5 if p == n else 0.0)
    return tot / (len(pos) * len(neg))


def test_auc_exact_matches_pairwise_definition(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import auc_exact

    data = [(5, 1), (3, 0), (5, 0), (7, 1), (1, 0), (3, 1), (9, 1), (2, 0)]
    df = spark.createDataFrame(data, "score int, label int")
    row = auc_exact(df, "score", "label").collect()[0]
    expect = _auc_reference(data)
    assert row["n_pos"] == 4 and row["n_neg"] == 4
    assert abs(row["auc"] - expect) < 1e-9


def test_auc_degenerate_single_class_is_null(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import auc_exact

    df = spark.createDataFrame([(1, 1), (2, 1)], "score int, label int")
    assert auc_exact(df, "score", "label").collect()[0]["auc"] is None


def test_pr_curve_counts_are_cumulative_and_consistent(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import pr_curve

    data = [(5, 1), (3, 0), (5, 0), (7, 1), (1, 0), (3, 1)]
    df = spark.createDataFrame(data, "score int, label int")
    rows = pr_curve(df, "score", "label").collect()
    # thresholds descending; tp+fn == total positives on every row
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths, reverse=True)
    for r in rows:
        assert r["tp"] + r["fn"] == 3
        # tp = positives with score >= threshold, literally
        assert r["tp"] == sum(1 for s, y in data if y == 1 and s >= r["threshold"])
        assert r["fp"] == sum(1 for s, y in data if y == 0 and s >= r["threshold"])
        if r["tp"]:
            p, rec = r["precision"], r["recall"]
            assert abs(r["f1"] - 2 * p * rec / (p + rec)) < 1e-5


# ------------------------------------------------------------------- ridge


def test_ridge_closed_form_matches_numpy(spark):
    import numpy as np

    from kommunedata_data_pipeline_spark.operators.statistics import (
        ridge_closed_form,
    )

    xs = [1, 2, 3, 5, 8, 13, 21, 4, 9]
    ys = [3, 5, 6, 11, 17, 27, 44, 9, 19]
    df = spark.createDataFrame(list(zip(xs, ys)), "x int, y int")
    row = ridge_closed_form(df, "x", "y", lam=2.0).collect()[0]
    X = np.array([[1.0, x] for x in xs])
    pen = np.diag([0.0, 2.0])  # slope-only penalty
    beta = np.linalg.solve(X.T @ X + pen, X.T @ np.array(ys, dtype=float))
    assert abs(row["beta0"] - beta[0]) < 1e-5
    assert abs(row["beta1"] - beta[1]) < 1e-5


def test_ridge_singular_design_emits_null(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import (
        ridge_closed_form,
    )

    df = spark.createDataFrame([(4, 1), (4, 2), (4, 3)], "x int, y int")
    row = ridge_closed_form(df, "x", "y", lam=0.0).collect()[0]
    assert row["beta0"] is None and row["beta1"] is None


# ------------------------------------------------------------------- kappa


def test_cohens_kappa_matches_manual(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import (
        cohens_kappa,
    )

    # classic worked example: 2x2 with po=0.7, pe=0.5 -> kappa=0.4
    rows = (
        [("a", "a")] * 40 + [("b", "b")] * 30
        + [("a", "b")] * 20 + [("b", "a")] * 10
    )
    df = spark.createDataFrame(rows, "ra string, rb string")
    r = cohens_kappa(df, "ra", "rb").collect()[0]
    assert r["n"] == 100 and r["n_agree"] == 70
    po, pe = 0.7, 0.6 * 0.5 + 0.4 * 0.5
    assert abs(r["po"] - po) < 1e-9 and abs(r["pe"] - pe) < 1e-9
    assert abs(r["kappa"] - (po - pe) / (1 - pe)) < 1e-6


def test_cohens_kappa_perfect_and_constant(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import (
        cohens_kappa,
    )

    perfect = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], "ra string, rb string"
    )
    assert cohens_kappa(perfect, "ra", "rb").collect()[0]["kappa"] == 1.0
    # both raters constant & agreeing -> pe=1, kappa undefined -> NULL
    const = spark.createDataFrame([("x", "x")] * 5, "ra string, rb string")
    assert cohens_kappa(const, "ra", "rb").collect()[0]["kappa"] is None


# ------------------------------------------------------------ ER / splits


def test_er_clusters_transitive_closure_and_agreement_block(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import er_clusters

    rows = [
        (1, "kkkk0001", "A"),
        (2, "kkkk0002", "A"),   # lev1 of 1, same segment -> same entity
        (3, "kkkk0003", "B"),   # lev1 of 2 but segment differs -> blocked
        (4, "zzzz9999", "A"),   # matches nothing -> singleton
    ]
    df = spark.createDataFrame(rows, "rid long, name string, seg string")
    got = {
        r["rid"]: (r["entity_id"], r["n_members"])
        for r in er_clusters(df, "rid", "name", agree_cols=("seg",)).collect()
    }
    assert got[1] == (1, 2) and got[2] == (1, 2)
    assert got[3] == (3, 1)
    assert got[4] == (4, 1)
    # without the agreement rule, 1-2-3 chain into one entity
    free = {
        r["rid"]: r["entity_id"]
        for r in er_clusters(df, "rid", "name").collect()
    }
    assert free[1] == free[2] == free[3] == 1


def test_leakproof_split_no_cluster_straddles(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from kommunedata_data_pipeline_spark.operators.sampling import (
        leakproof_split,
    )

    d = load_table(spark, SF_SMALL, "documents")
    out = leakproof_split(d, minhash_lsh_pairs(d, 3, 16, 4, 0.5)).collect()
    assert len(out) == d.count()
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # and it is a real split (more than one value over the corpus)
    assert len({r["split"] for r in out}) > 1


# ------------------------------------------------------------ shard balance


def test_shard_balance_partitions_tokens_and_snakes(spark):
    from kommunedata_data_pipeline_spark.operators.sampling import (
        shard_balance,
    )

    # 8 docs with token counts 8..1 onto 4 shards: snake order gives
    # every shard exactly 9 tokens (8+1, 7+2, 6+3, 5+4)
    rows = [(i, " ".join(["w"] * (8 - i))) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["shard"]: r for r in shard_balance(df, n_shards=4).collect()}
    assert set(out) == {0, 1, 2, 3}
    for s in out.values():
        assert s["n_tokens"] == 9 and s["n_docs"] == 2
        assert abs(s["balance"] - 1.0) < 1e-9


def test_shard_balance_total_is_corpus_total(spark):
    from kommunedata_data_pipeline_spark.operators.sampling import (
        shard_balance,
    )
    from kommunedata_data_pipeline_spark.functions.text import token_count

    d = load_table(spark, SF_SMALL, "documents")
    out = shard_balance(d, n_shards=8).collect()
    total = d.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert sum(r["n_tokens"] for r in out) == total
    assert sum(r["n_docs"] for r in out) == d.count()
    # snake packing on a real corpus: worst shard within 25% of perfect
    assert max(abs(r["balance"] - 1.0) for r in out) < 0.25


# -------------------------------------------------------------------- Luhn


def test_luhn_known_vectors(spark):
    from kommunedata_data_pipeline_spark.functions.strings import (
        luhn_checksum,
    )

    cases = [
        ("79927398713", 0),       # the canonical Luhn example (valid)
        ("79927398710", 7),
        ("4539578763621486", 0),  # valid 16-digit test number
        ("4539578763621487", 1),
        ("0", 0),
        ("18", 0),                # 8*2=16 -> 7; 7+... wait: 8,1 -> 8 + 2 = 10
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = {
        r["s"]: r["c"]
        for r in df.select("s", luhn_checksum(F.col("s")).alias("c")).collect()
    }
    for s, expect in cases:
        # recompute expected in pure python to keep the fixture honest
        digs = [int(ch) for ch in s[::-1]]
        tot = 0
        for i, d in enumerate(digs, start=1):
            if i % 2 == 0:
                d2 = d * 2
                tot += d2 - 9 if d2 > 9 else d2
            else:
                tot += d
        assert got[s] == tot % 10, s


# ---------------------------------------------------------------- zone map


def test_zone_map_skip_stats_counts_disjoint_files(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        zone_map_skip_stats,
    )

    # file 0: values 1..10, file 1: values 11..20, file 2: values 21..30
    rows = [(i, i // 10, i + 1) for i in range(30)]
    df = spark.createDataFrame(rows, "rid long, fid long, v long")
    out = zone_map_skip_stats(
        df, {"given": F.col("fid")}, "v", 12, 18
    ).collect()
    r = out[0]
    # files 0 (max 10 < 12) and 2 (min 21 > 18) are skippable
    assert r["n_files"] == 3 and r["n_files_skipped"] == 2
    assert r["n_rows"] == 30 and r["n_rows_skipped"] == 20
    assert abs(r["row_skip_ratio"] - 2 / 3) < 1e-6


def test_zone_map_date_layout_beats_key_layout_on_bench(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry8", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    rows = {
        r["layout"]: r
        for r in m.queries()["q_zone_map_skip"](spark, SF_SMALL).collect()
    }
    # the scale claim itself: date-clustered files prune, key-clustered don't
    assert rows["by_date"]["row_skip_ratio"] > rows["by_key"]["row_skip_ratio"]
    assert rows["by_date"]["n_rows_skipped"] > 0


# ------------------------------------------------------------- media dedup


def test_media_dedup_savings_match_modular_classes(spark):
    from kommunedata_data_pipeline_spark.transforms.multimodal import (
        media_dedup_stats,
    )

    # doc_ids 0..223 = two full cycles of every blob class:
    # png classes = even residues mod 112 (56), wav classes = odd mod 8 (4)
    df = spark.createDataFrame([(i,) for i in range(224)], "doc_id long")
    out = {r["fmt"]: r for r in media_dedup_stats(df).collect()}
    png, wav = out["png"], out["wav"]
    assert png["n_blobs"] == 112 and png["n_unique"] == 56
    assert wav["n_blobs"] == 112 and wav["n_unique"] == 4
    assert png["bytes_total"] == 112 * 33 and png["bytes_stored"] == 56 * 33
    assert wav["bytes_total"] == 112 * 36 and wav["bytes_stored"] == 4 * 36
    assert abs(wav["savings_ratio"] - (1 - 4 / 112)) < 1e-6


# ------------------------------------------------------------- matryoshka


def test_matryoshka_stage2_subset_of_shortlist_and_full_recall(spark):
    from kommunedata_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        matryoshka_rerank,
    )

    e = load_table(spark, SF_SMALL, "embeddings")
    qs = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    n = e.count()
    # shortlist >= corpus makes stage 1 a no-op: result == brute force
    full = matryoshka_rerank(e, qs, prefix_dims=16, shortlist=n, k=5)
    bf = brute_force_topk(e, qs, k=5)
    got = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine_sim"]) for r in full.collect()}
    expect = {(r["query_id"], r["rank"]): (r["vec_id"], r["cosine_sim"]) for r in bf.collect()}
    assert got == expect
    # with a tight shortlist, every stage-2 hit is a stage-1 candidate
    tight = matryoshka_rerank(e, qs, prefix_dims=16, shortlist=8, k=5)
    assert tight.count() == 4 * 5


# ------------------------------------------------- fertility / datasheet


def test_tokenizer_fertility_manual_counts(spark):
    from kommunedata_data_pipeline_spark.operators.corpus import (
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [(1, "en", "don't stop"), (2, "en", "abc 123")],
        "doc_id long, lang string, text string",
    )
    r = tokenizer_fertility(df).collect()[0]
    # words: 2 + 2 = 4; BPE tokens: don/'t/stop=4? -> don,',t,stop? regex:
    # ' ?[A-Za-z]+'->don, '[^A-Za-z0-9\s]+'->', then t, stop; abc,123 -> 2
    assert r["n_docs"] == 2 and r["n_words"] == 4
    assert r["n_bpe_tokens"] == 6
    assert r["n_chars"] == len("don't stop") + len("abc 123")
    assert abs(r["fertility"] - 6 / 4) < 1e-9


def test_corpus_datasheet_row_per_source_and_exact_dup_rate(spark):
    from kommunedata_data_pipeline_spark.operators.corpus import (
        corpus_datasheet,
    )

    rows = [
        (1, "s1", "en", "alpha beta gamma"),
        (2, "s1", "en", "alpha beta gamma"),   # exact dup of 1
        (3, "s1", "da", "noget helt andet her"),
        (4, "s2", "zh", "one two"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {r["source"]: r for r in corpus_datasheet(df).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["n_langs"] == 2
    assert s1["top_lang"] == "en" and abs(s1["top_lang_share"] - 2 / 3) < 1e-6
    assert abs(s1["exact_dup_rate"] - 1 / 3) < 1e-6
    assert out["s2"]["n_docs"] == 1 and out["s2"]["exact_dup_rate"] == 0.0


# ------------------------------------------------------------ padding waste


def test_padding_waste_buckets_and_truncation(spark):
    from kommunedata_data_pipeline_spark.operators.sampling import (
        padding_waste,
    )

    df = spark.createDataFrame(
        [(1, "a " * 70), (2, "b " * 200), (3, "c " * 3000)],
        "doc_id long, text string",
    )
    out = {r["bucket"]: r for r in padding_waste(df).collect()}
    assert set(out) == {128, 256, 2048}
    assert out[128]["n_padding"] == 58 and out[128]["n_truncated"] == 0
    assert out[256]["n_padding"] == 56
    assert out[2048]["n_padding"] == 0 and out[2048]["n_truncated"] == 952
    assert abs(out[128]["pad_ratio"] - 58 / 128) < 1e-6


# -------------------------------------------------------- negative sampling


def test_negative_sampling_replica(spark):
    import math

    from kommunedata_data_pipeline_spark.operators.sampling import (
        negative_sampling_table,
    )

    df = spark.createDataFrame(
        [(1, "a a a a b b c")], "doc_id long, text string"
    )
    rows = {r["token"]: r for r in negative_sampling_table(df, 3).collect()}
    p9 = {t: math.floor(1e9 * c**0.75) for t, c in [("a", 4), ("b", 2), ("c", 1)]}
    tot = sum(p9.values())
    for t, c in [("a", 4), ("b", 2), ("c", 1)]:
        assert rows[t]["cnt"] == c
        assert rows[t]["quota_micro"] == (p9[t] * 1_000_000) // tot
    # quotas sum to <= 1e6 and the head is down-weighted vs raw frequency
    assert sum(r["quota_micro"] for r in rows.values()) <= 1_000_000
    assert rows["a"]["quota_micro"] / 1e6 < 4 / 7


# ------------------------------------------------------- label propagation


def test_label_propagation_rounds_and_ties(spark):
    from kommunedata_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # chain: 1(seed 'en') - 2 - 3 ; isolated 4 ; 5 with two seed
    # neighbours 'da'(6) and 'en'(1) -> tie -> 'da' < 'en' wins? no:
    # count tie 1-1, label ASC -> 'da'
    nodes = spark.createDataFrame(
        [(1, "en"), (2, None), (3, None), (4, None), (5, None), (6, "da")],
        "doc_id long, seed_label string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (1, 5)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: (r["label"], r["round_assigned"])
        for r in label_propagation(nodes, pairs, n_rounds=2).collect()
    }
    assert got[1] == ("en", 0) and got[6] == ("da", 0)
    assert got[2] == ("en", 1)        # 1-hop from seed
    assert got[3] == ("en", 2)        # 2-hop, second round
    assert got[4] == (None, None)     # unreachable stays unlabeled
    assert got[5] == ("da", 1)        # tie 'da' vs 'en' -> label ASC


# ------------------------------------------------------------- k-center


def test_kcenter_matches_numpy_greedy_and_radii_decrease(spark):
    import numpy as np

    from kommunedata_data_pipeline_spark.operators.similarity import (
        kcenter_coreset,
    )
    from kommunedata_data_pipeline_spark.sources.readers import load_table

    e = load_table(spark, SF_SMALL, "embeddings").where(F.col("vec_id") < 60)
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in e.collect()}
    got = [(r["pick"], r["vec_id"], r["radius_micro"])
           for r in kcenter_coreset(e, k=5).collect()]

    def d2u(a, b):
        return math.floor(float(((a - b) ** 2).sum()) * 100000.0 + 0.5)

    sel = [min(vecs)]
    expect = [(1, sel[0], None)]
    for i in range(2, 6):
        best = None
        for v in sorted(vecs):
            if v in sel:
                continue
            mind = min(d2u(vecs[v], vecs[c]) for c in sel)
            if best is None or mind > best[1] or (mind == best[1] and v < best[0]):
                best = (v, mind)
        sel.append(best[0])
        expect.append((i, best[0], best[1]))
    assert got == expect
    radii = [r for _, _, r in got[1:]]
    assert radii == sorted(radii, reverse=True)  # greedy radii non-increasing


# ------------------------------------------------------------ stream route


def test_quality_route_ingest_matches_batch_rules_and_replays_empty(spark, tmp_path):
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        quality_route_ingest,
        run_writer_available_now,
    )

    docs = [
        (1, "one two"),                                  # min_tokens
        (2, "a b c d e"),                                # min_chars (9 < 20)
        (3, "yes yes yes yes yes yes definitely yes"),   # repetition
        (4, "a perfectly reasonable sentence with plenty of distinct words here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    stage = str(tmp_path / "stage")
    df.repartition(2).write.parquet(stage)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    kept_p, rej_p = str(tmp_path / "kept"), str(tmp_path / "rej")
    run_writer_available_now(
        quality_route_ingest(stream, kept_p, rej_p), str(tmp_path / "ck")
    )
    kept = {r["doc_id"] for r in spark.read.parquet(kept_p).collect()}
    rej = {r["doc_id"]: r["reason"] for r in spark.read.parquet(rej_p).collect()}
    assert kept == {4}
    assert rej == {1: "min_tokens", 2: "min_chars", 3: "repetition"}
    # replay: same data through a fresh stream lands zero new rows
    stream2 = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    run_writer_available_now(
        quality_route_ingest(stream2, kept_p, rej_p), str(tmp_path / "ck2")
    )
    assert spark.read.parquet(kept_p).count() == 1
    assert spark.read.parquet(rej_p).count() == 3


# ---------------------------------------------------------------- rank sum


def test_rank_sum_matches_scipy_free_replica(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import (
        rank_sum_test,
    )

    data = [(3, 0), (5, 0), (5, 1), (7, 1), (9, 1), (2, 0), (5, 0)]
    df = spark.createDataFrame(data, "score int, grp int")
    r = rank_sum_test(df, "score", "grp").collect()[0]
    # average ranks: 2->1, 3->2, 5->(3+4+5)/3=4, 7->6, 9->7
    ranks = {2: 1.0, 3: 2.0, 5: 4.0, 7: 6.0, 9: 7.0}
    r1 = sum(ranks[s] for s, g in data if g == 1)
    n1 = 3
    n0 = 4
    u1 = r1 - n1 * (n1 + 1) / 2
    assert r["n0"] == n0 and r["n1"] == n1
    assert abs(r["u1"] - u1) < 1e-9
    n = n0 + n1
    tie3 = sum(t**3 - t for t in [1, 1, 3, 1, 1])
    var = n0 * n1 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1 - n0 * n1 / 2) / math.sqrt(var)
    assert abs(r["z"] - round(z, 4)) < 1e-9


def test_rank_sum_all_tied_is_null_z(spark):
    from kommunedata_data_pipeline_spark.operators.statistics import (
        rank_sum_test,
    )

    df = spark.createDataFrame(
        [(5, 0), (5, 1), (5, 0)], "score int, grp int"
    )
    assert rank_sum_test(df, "score", "grp").collect()[0]["z"] is None


# ------------------------------------------------------------- freshness


def test_freshness_weights_decay_and_shares(spark):
    import datetime as dt
    import math as m

    from kommunedata_data_pipeline_spark.operators.timeseries import (
        freshness_weights,
    )

    base = dt.datetime(2026, 1, 31)
    rows = [
        (1, base, "new"),
        (2, base - dt.timedelta(days=30), "old"),
        (3, base - dt.timedelta(days=30), "old"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {r["event_type"]: r for r in freshness_weights(df, 30).collect()}
    w_new = m.floor(1e9 * 1.0)
    w_old = m.floor(1e9 * 2 ** (-1.0))
    assert out["new"]["weight_sum_micro9"] == w_new
    assert out["old"]["weight_sum_micro9"] == 2 * w_old
    tot = w_new + 2 * w_old
    assert abs(out["new"]["share"] - w_new / tot) < 1e-6
    # a 30-day-old event weighs exactly half a fresh one (integerized)
    assert abs(w_old - w_new / 2) <= 1


# ---------------------------------------------------------------- k-fold


def test_stratified_kfold_balance_within_one(spark):
    from kommunedata_data_pipeline_spark.operators.sampling import (
        stratified_kfold,
    )

    d = load_table(spark, SF_SMALL, "documents")
    rows = stratified_kfold(d, "lang", k=5).collect()
    per_stratum: dict = {}
    for r in rows:
        per_stratum.setdefault(r["stratum"], []).append(r["n_docs"])
    for stratum, counts in per_stratum.items():
        assert max(counts) - min(counts) <= 1, stratum
    total = sum(r["n_docs"] for r in rows)
    assert total == d.count()


# ------------------------------------------------------------ layout audits


def test_partition_skew_flags_low_cardinality_key(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        partition_skew_audit,
    )

    rows = [(i, i, "HOT" if i % 10 else "COLD") for i in range(1000)]
    df = spark.createDataFrame(rows, "rid long, good long, bad string")
    out = {
        r["key_name"]: r
        for r in partition_skew_audit(
            df, {"good": F.col("good"), "bad": F.col("bad")}, 32
        ).collect()
    }
    assert out["good"]["n_rows"] == 1000
    # 2-value key hits <= 2 buckets; the hot one holds 90% of rows
    assert out["bad"]["n_buckets_hit"] <= 2
    assert out["bad"]["top_share"] >= 0.9
    # high-cardinality key spreads: top bucket well under 20%
    assert out["good"]["top_share"] < 0.2
    assert out["bad"]["skew_ratio"] >= out["good"]["skew_ratio"]


def test_dict_encoding_audit_exact_byte_math(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        dict_encoding_audit,
    )

    df = spark.createDataFrame(
        [("aa",), ("aa",), ("bb",), ("bb",)], "v string"
    )
    r = dict_encoding_audit(df, ["v"]).collect()[0]
    assert r["n_rows"] == 4 and r["n_distinct"] == 2
    assert r["raw_bytes"] == 8            # 4 values x 2 chars
    assert r["dict_bytes"] == 4 + 16      # 2 distinct x 2 + 4 codes x 4
    assert abs(r["est_ratio"] - 20 / 8) < 1e-6   # tiny values EXPAND


def test_luhn_empty_string_is_null(spark):
    from kommunedata_data_pipeline_spark.functions.strings import (
        luhn_checksum,
    )

    df = spark.createDataFrame([("",), ("0",)], "s string")
    got = [r["c"] for r in df.select(luhn_checksum(F.col("s")).alias("c")).collect()]
    assert got == [None, 0]


# --------------------------------------------------------- delete ampl.


def test_delete_amplification_clustered_vs_scattered(spark):
    from kommunedata_data_pipeline_spark.operators.layout import (
        delete_amplification_audit,
    )

    # 3 scattered files vs user-clustered files; delete key u=7 rows
    # (rid = 10k+7) land in every rid%3 file but exactly one u-file
    rows = [(i, i % 10) for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, u long")
    out = {
        r["layout"]: r
        for r in delete_amplification_audit(
            df,
            F.col("u") == 7,
            {"scattered": F.col("rid") % 3, "clustered": F.col("u")},
        ).collect()
    }
    sc, cl = out["scattered"], out["clustered"]
    assert sc["n_rows_deleted"] == cl["n_rows_deleted"] == 10
    assert sc["n_files_touched"] == 3          # every file holds a u=7 row
    assert cl["n_files_touched"] == 1          # only the u=7 file
    assert cl["n_rows_rewritten"] == 0         # that file is ALL deletes
    assert sc["n_rows_rewritten"] == 90
    assert abs(sc["amplification"] - 9.0) < 1e-9
    assert cl["amplification"] == 0.0


# ----------------------------------------------------------------- GMM EM


def test_gmm_em_step_matches_numpy_replica(spark):
    import math as m

    from kommunedata_data_pipeline_spark.operators.statistics import (
        gmm_em_step,
    )

    xs = [100, 400, 500, 900, 1400, 1500, 1600, 2000, 500, 1500]
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    row = gmm_em_step(df, "x", mu0=500.0, mu1=1500.0, sigma=400.0).collect()[0]

    def r6(x):
        z = ((x - 500.0) ** 2 - (x - 1500.0) ** 2) / (2 * 400.0 * 400.0)
        return m.floor(1e6 / (1.0 + m.exp(-z)))

    sr = sum(r6(x) for x in xs)
    srx = sum(r6(x) * x for x in xs)
    sq = sum(1_000_000 - r6(x) for x in xs)
    sqx = sum((1_000_000 - r6(x)) * x for x in xs)
    assert row["n"] == 10
    assert abs(row["mu0_new"] - round(sqx / sq, 6)) < 1e-9
    assert abs(row["mu1_new"] - round(srx / sr, 6)) < 1e-9
    assert abs(row["pi1_new"] - round(sr / 1e7, 6)) < 1e-9
    # the step moves the means toward their clusters' mass
    assert row["mu0_new"] < 1000 < row["mu1_new"]


# ----------------------------------------------------------- lang id / MMR


def test_ngram_lang_id_separates_constructed_langs(spark):
    from kommunedata_data_pipeline_spark.operators.corpus import (
        ngram_lang_id,
    )

    aa = "aaab aaac aaad aaae"      # 'aa'-heavy trigrams
    zz = "zzzy zzzx zzzw zzzv"      # 'zz'-heavy trigrams
    rows = [
        (0, "la", aa), (3, "la", aa + " aaaf"),        # seeds la
        (6, "lz", zz), (9, "lz", zz + " zzzu"),        # seeds lz
        (1, "la", "aaab aaac something"),              # test -> la
        (2, "lz", "zzzy zzzx other"),                  # test -> lz
        (4, "la", "qqq www eee"),                      # no overlap -> unknown
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {
        (r["lang"], r["predicted"]): r["n"]
        for r in ngram_lang_id(df, F.col("doc_id") % 3 == 0).collect()
    }
    assert out[("la", "la")] == 1
    assert out[("lz", "lz")] == 1
    assert out[("la", "unknown")] == 1
    assert sum(out.values()) == 3        # only non-seed docs are classified


def test_mmr_rank1_is_top_sim_and_diversity_beats_redundancy(spark):
    from kommunedata_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        mmr_rerank,
    )

    # query 0; vecs 1,2 nearly identical & most relevant; vec 3 less
    # relevant but orthogonal-ish -> MMR rank2 should prefer 3 over 2
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.12, 0.0, 0.0]),
        (2, [0.99, 0.125, 0.0, 0.0]),
        (3, [0.6, -0.8, 0.0, 0.0]),
        (4, [0.5, 0.86, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = e.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    mmr = {r["rank"]: r["vec_id"] for r in mmr_rerank(e, qs, 0.5, 4, 3).collect()}
    plain = {r["rank"]: r["vec_id"] for r in brute_force_topk(e, qs, 3).collect()}
    assert mmr[1] == plain[1] == 1       # rank 1 = plain relevance argmax
    assert plain[2] == 2                 # plain top-k returns the near-copy
    assert mmr[2] == 3                   # MMR skips it for the diverse hit


# ------------------------------------------------------ NDCG / golden rec.


def test_ann_ndcg_perfect_when_approx_equals_exact(spark):
    import math as m

    from kommunedata_data_pipeline_spark.operators.similarity import (
        ann_ndcg_audit,
    )

    e = load_table(spark, SF_SMALL, "embeddings")
    qs = e.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
    )
    # nprobe = n_centroids makes IVF scan every list -> exact ranking
    rows = ann_ndcg_audit(e, qs, 5, n_centroids=8, nprobe=8).collect()
    idcg = sum((6 - r) / m.log2(r + 1) for r in range(1, 6))
    assert len(rows) == 4
    for r in rows:
        assert abs(r["ndcg"] - 1.0) < 1e-6
        assert abs(r["idcg"] - round(idcg, 6)) < 1e-9
        assert abs(r["dcg"] - r["idcg"]) < 1e-5
    # a lossy operating point cannot exceed 1 and reports per query
    lossy = ann_ndcg_audit(e, qs, 5, n_centroids=16, nprobe=1).collect()
    assert all(0.0 <= r["ndcg"] <= 1.0 for r in lossy)


def test_golden_records_survivorship_rules(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        golden_records,
    )

    rows = [
        (1, "kkkk0001", "A", 10.0),
        (2, "kkkk0002", "A", 30.0),   # same entity as 1
        (3, "kkkk0003", "B", 99.0),   # lev1 of 2 but segment differs
        (4, "zzzz9999", "A", 7.0),    # singleton
    ]
    df = spark.createDataFrame(
        rows, "rid long, name string, seg string, bal double"
    )
    out = {
        r["entity_id"]: r
        for r in golden_records(
            df, "rid", "name", agree_cols=("seg",), value_cols=("bal",)
        ).collect()
    }
    g = out[1]
    assert g["n_members"] == 2
    assert g["canonical_name"] == "kkkk0001"     # min-string rule
    assert g["seg"] == "A" and g["max_bal"] == 30.0
    assert out[3]["n_members"] == 1 and out[4]["max_bal"] == 7.0


# ------------------------------------------------------- incremental CC


def test_cc_index_update_equals_rebuild_including_merge(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        cc_index_update,
        dup_clusters,
    )

    def pairs_df(ps):
        return spark.createDataFrame(ps, "doc_a long, doc_b long")

    # stored: components {1,2} and {5,6}; batch merges them via 2-5,
    # extends with a brand-new node 9 attached to 6, and adds a
    # disjoint new component {20,21}
    stored = dup_clusters(pairs_df([(1, 2), (5, 6)]))
    batch = pairs_df([(2, 5), (6, 9), (20, 21)])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_index_update(stored, batch).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(pairs_df([(1, 2), (5, 6), (2, 5), (6, 9), (20, 21)])).collect()
    }
    assert got == full
    assert got[9] == 1 and got[20] == 20     # merged root is the global min


def test_cc_index_update_empty_batch_is_identity(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        cc_index_update,
        dup_clusters,
    )

    stored = dup_clusters(
        spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    )
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_index_update(stored, empty).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


# ------------------------------------------------------------- tfidf knn


def test_tfidf_knn_rare_term_beats_common_overlap(spark):
    from kommunedata_data_pipeline_spark.operators.retrieval import (
        tfidf_knn,
    )

    # query doc 0 shares the RARE term 'zyzzyva' with doc 10 and only
    # corpus-wide common terms with doc 11 -> 10 must rank first
    common = "the data table row value"
    rows = [
        (0, f"{common} zyzzyva"),
        (10, f"other words here zyzzyva"),
        (11, f"{common} unrelated"),
    ] + [(100 + i, common + f" filler{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r["doc_id"], r["rank"])
        for r in tfidf_knn(df, F.col("doc_id") == 0, k=2, df_cap=50).collect()
    ]
    assert got[0] == (10, 1)


# -------------------------------------------------------------- LSH PR


def test_lsh_pr_audit_counts_and_bounds(spark):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        lsh_pr_audit,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, SF_SMALL, "documents")
    r = lsh_pr_audit(d).collect()[0]
    n_truth = ngram_jaccard_pairs(d, 3, 0.5, 50).count()
    n_pred = minhash_lsh_pairs(d, 3, 16, 4, 0.5).count()
    assert r["n_truth"] == n_truth and r["n_pred"] == n_pred
    assert r["n_hit"] <= min(n_truth, n_pred)
    if r["n_hit"]:
        assert 0.0 < r["precision"] <= 1.0 and 0.0 < r["recall"] <= 1.0
        p, rec = r["precision"], r["recall"]
        assert abs(r["f1"] - 2 * p * rec / (p + rec)) < 1e-4


# ------------------------------------------------------- streaming CC


def test_cc_label_ingest_matches_batch_and_replays_idempotent(spark, tmp_path):
    from kommunedata_data_pipeline_spark.operators.dedup import dup_clusters
    from kommunedata_data_pipeline_spark.streaming.ingest import (
        cc_label_ingest,
        read_cc_labels,
        run_writer_available_now,
    )

    pairs = [(1, 2), (5, 6), (2, 5), (6, 9), (20, 21)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    stage = str(tmp_path / "stage")
    df.repartition(2).write.parquet(stage)
    labels_p = str(tmp_path / "labels")

    def run(ck):
        stream = (
            spark.readStream.schema("doc_a bigint, doc_b bigint")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        run_writer_available_now(cc_label_ingest(stream, labels_p), ck)

    run(str(tmp_path / "ck1"))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in read_cc_labels(spark, labels_p).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(df).collect()
    }
    assert got == full
    # replay the SAME pairs through a fresh stream: idempotent store
    run(str(tmp_path / "ck2"))
    again = {
        r["doc_id"]: r["cluster_id"]
        for r in read_cc_labels(spark, labels_p).collect()
    }
    assert again == full
    # replay appended NO rows: the raw history is unchanged (the
    # changed-rows delta of an already-folded edge set is empty)
    raw = spark.read.parquet(labels_p)
    assert raw.count() == raw.dropDuplicates(["doc_id", "cluster_id"]).count()


# ------------------------------------------------------------------- RFM


def test_rfm_segments_tiles_partition_and_monotone_monetary(spark):
    import importlib.util

    from kommunedata_data_pipeline_spark.operators.aggregates import (
        rfm_segments,
    )
    from kommunedata_data_pipeline_spark.sources.readers import load_table

    o = load_table(spark, SF_SMALL, "orders")
    rows = rfm_segments(o, n_tiles=5).collect()
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r_tile"] <= 5 and 1 <= r["f_tile"] <= 5
        assert 1 <= r["m_tile"] <= 5
    # higher m_tile cells have higher average spend (marginalized)
    by_m: dict = {}
    for r in rows:
        s, n = by_m.get(r["m_tile"], (0.0, 0))
        by_m[r["m_tile"]] = (s + r["avg_monetary"] * r["n_customers"], n + r["n_customers"])
    means = [by_m[m][0] / by_m[m][1] for m in sorted(by_m)]
    assert means == sorted(means)
