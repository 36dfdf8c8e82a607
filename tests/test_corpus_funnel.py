"""Unit tests for the round-2 corpus/funnel/quantize/salted operators —
semantics checks on hand-built frames (the oracle battery covers the
full-table differential; these pin the edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.operators.aggregates import salted_sum
from kommunedata_data_pipeline_spark.operators.corpus import (
    contamination_check,
    ngram_novelty,
    pii_scrub,
    repetition_stats,
    word_ngrams,
)
from kommunedata_data_pipeline_spark.operators.dedup import edit_distance_topk
from kommunedata_data_pipeline_spark.operators.funnel import (
    funnel_stages,
    retention_cohorts,
)
from kommunedata_data_pipeline_spark.operators.similarity import quantize_embeddings


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_doc_is_empty(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b c d")])
    out = df.select("doc_id", word_ngrams(F.col("text"), 3).alias("g")).collect()
    got = {r.doc_id: r.g for r in out}
    assert got[1] == []
    assert got[2] == ["a b c", "b c d"]


def test_repetition_stats_flags_repeats(spark):
    # "x y z x y z x y z" has 7 trigrams, 3 distinct
    df = _docs(spark, [(1, "x y z x y z x y z"), (2, "a b c d")])
    got = {r.doc_id: r for r in repetition_stats(df, n=3).collect()}
    assert got[1].n_ngrams == 7 and got[1].n_distinct == 3
    assert got[1].rep_frac > 0.5
    assert got[2].rep_frac == 0.0


def test_contamination_hits_verbatim_overlap(spark):
    train = _docs(spark, [(0, "one two three four five six seven eight nine")])
    test = _docs(
        spark,
        [
            (1, "one two three four five six seven eight tail"),  # shares 8-gram
            (3, "totally different words with no overlap at all nine"),
        ],
    )
    got = {r.doc_id: r for r in contamination_check(train, test, n=8).collect()}
    assert got[1].n_hit == 1 and got[1].n_ngrams == 2
    assert got[3].n_hit == 0


def test_ngram_novelty_first_doc_wins(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b c e")])
    got = {r.doc_id: r for r in ngram_novelty(df, n=3).collect()}
    assert got[1].novelty == 1.0
    # doc 2 repeats "a b c" from doc 1; only "b c e" is novel
    assert got[2].n_novel == 1 and got[2].n_ngrams == 2


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe@firma.dk or call +45 12 34 56 78, cpr 010203-1234")],
        "doc_id long, text string",
    )
    row = pii_scrub(df).collect()[0]
    assert (row.n_email, row.n_cpr, row.n_phone) == (1, 1, 1)
    assert "[EMAIL]" in row.scrubbed and "[CPR]" in row.scrubbed
    assert "@" not in row.scrubbed and "010203" not in row.scrubbed


def test_funnel_requires_strict_order(spark):
    rows = [
        # user 1: full ordered chain
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "purchase"),
        # user 2: purchase BEFORE the first view-click chain -> stage 2
        (2, "2024-01-01 09:00:00", "purchase"),
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:01:00", "click"),
        # user 3: never viewed -> stage 0
        (3, "2024-01-01 10:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts_s string, event_type string"
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    got = {r.stage: r.n_users for r in funnel_stages(df).collect()}
    assert got == {3: 1, 2: 1, 0: 1}


def test_retention_week_zero_has_whole_cohort(spark):
    rows = [
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-10 10:00:00"),  # next week
        (2, "2024-01-02 10:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {(r.cohort_week, r.week_no): r.n_active for r in retention_cohorts(df).collect()}
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1


def test_quantize_roundtrip_error_is_small(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = quantize_embeddings(df).collect()
    got = {r.vec_id: r for r in rows}
    # zero vector has no scale -> dropped
    assert set(got) == {1}
    assert got[1].q8 == [127, -64, 32, 0]
    assert got[1].rms_err < got[1].scale  # error bounded by one quant step


def test_salted_sum_equals_plain_groupby(spark):
    df = spark.range(1000).select(
        (F.col("id") % 3).alias("k"),
        F.col("id").alias("rid"),
        (F.col("id") % 7).cast("decimal(18,2)").alias("v"),
    )
    salted = {
        r.k: (str(r.s), r.n_rows)
        for r in salted_sum(df, "k", "v", n_salts=4, salt_src="rid", alias="s").collect()
    }
    plain = {
        r.k: (str(r.s), r.n)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    for k in plain:
        assert salted[k][0].rstrip("0").rstrip(".") == plain[k][0].rstrip("0").rstrip(".")
        assert salted[k][1] == plain[k][1]


def test_edit_distance_topk_orders_identical_first(spark):
    df = spark.createDataFrame(
        [
            (1, "en", 100, "same prefix text here"),
            (2, "en", 101, "same prefix text here"),
            (3, "en", 120, "completely other words"),
        ],
        "doc_id long, lang string, n_chars long, text string",
    )
    rows = edit_distance_topk(df, bucket_width=50, per_bucket=8, k=5).collect()
    assert rows[0].doc_a == 1 and rows[0].doc_b == 2 and rows[0].edit_dist == 0


def test_token_pmi_caps_and_counts(spark):
    """Hand-computable corpus: a pair that always co-occurs gets top
    PMI; tokens outside the [min_df, df_cap] band never enter the
    join (the stopword 'the' appears in every doc and is df-capped
    out); pairs under min_pair are dropped."""
    import math

    from kommunedata_data_pipeline_spark.operators.corpus import token_pmi_pairs

    docs = [
        (1, "the alpha beta gamma"),
        (2, "the alpha beta delta"),
        (3, "the alpha beta gamma"),
        (4, "the gamma delta"),
        (5, "the epsilon zeta"),
        (6, "the epsilon zeta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = token_pmi_pairs(df, df_cap=5, min_df=2, min_pair=2, k=10).collect()
    got = {(r.ta, r.tb): (r.c_ab, r.pmi) for r in rows}
    # 'the' (df=6 > cap 5) must appear in no pair
    assert not any("the" in pair for pair in got)
    # alpha+beta co-occur in all 3 of their docs: c=3, df 3 each
    assert got[("alpha", "beta")][0] == 3
    assert got[("alpha", "beta")][1] == round(math.log(3 * 6 / (3 * 3)), 6)
    # epsilon+zeta: perfect 2-of-2 association -> highest PMI, rank 1
    top = min(rows, key=lambda r: r.rank)
    assert (top.ta, top.tb) == ("epsilon", "zeta")
    assert top.pmi == round(math.log(2 * 6 / (2 * 2)), 6)
    # gamma+delta co-occur only once (< min_pair) -> absent
    assert ("delta", "gamma") not in got


def test_association_rules_hand_case(spark):
    from kommunedata_data_pipeline_spark.operators.corpus import association_rules

    # 4 baskets: {a,b,c} {a,b} {a,c} {b,d-only-once}
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "d"),
        (4, "b"),  # duplicate line: basket-distinct must collapse it
    ]
    df = spark.createDataFrame(rows, "b long, item string")
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, "b", "item", 2, 2).collect()
    }
    # d has support 1 -> pruned before pairs; (b,d) absent
    assert all("d" not in k for k in out)
    ab = out[("a", "b")]
    # support(a)=3, support(b)=3, support(ab)=2, n=4
    assert ab.n_ab == 2
    assert ab.support == round(2 / 4, 6)
    assert ab.confidence == round(2 / 3, 6)
    assert ab.lift == round(2 * 4 / (3 * 3), 6)
    # rules are directional: (b,a) exists with its own confidence
    assert out[("b", "a")].confidence == round(2 / 3, 6)
    assert ("a", "c") in out and out[("a", "c")].n_ab == 2


def test_duplicated_spans_exact_bounds(spark):
    """Constructed corpus: docs 1 and 2 share a 7-token passage (every
    5-gram of it repeats), doc 3 is unique. Spans must carry exact
    merged bounds: 7 shared tokens -> three 5-grams -> one island of
    union size 7 per sharing doc."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        duplicated_spans,
    )

    shared = "a1 b2 c3 d4 e5 f6 g7"
    df = spark.createDataFrame(
        [
            (1, f"x1 x2 {shared} x3 x4"),
            (2, f"y1 {shared} y2 y3 y4"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in duplicated_spans(df, n=5, min_count=2).collect()}
    assert set(rows) == {1, 2}
    for doc_id, r in rows.items():
        assert r.n_spans == 1
        assert r.dup_tokens == 7
    assert rows[1].n_tokens == 11
    assert rows[2].n_tokens == 11
    # within-doc repetition also counts toward min_count
    df2 = spark.createDataFrame(
        [(9, "p q r s t u p q r s t u")],  # 12 tokens, passage repeats
        "doc_id long, text string",
    )
    r9 = duplicated_spans(df2, n=5, min_count=2).collect()
    # "p q r s t" and "q r s t u" repeat (positions 1..6 vs 7..12 eh:
    # 5-grams at starts 1,2,7,8 repeat pairwise) -> islands merge
    assert len(r9) == 1 and r9[0].dup_tokens > 0


def test_cut_duplicated_spans_exact_text(spark):
    """The cut applied to the constructed corpus above must remove
    exactly the shared passage's tokens and pass unique docs through
    untouched — pinned to the exact cleaned strings."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        cut_duplicated_spans,
    )

    shared = "a1 b2 c3 d4 e5 f6 g7"
    df = spark.createDataFrame(
        [
            (1, f"x1 x2 {shared} x3 x4"),
            (2, f"y1 {shared} y2 y3 y4"),
            (3, "z1 z2 z3 z4 z5 z6 z7 z8 z9"),
            (4, "w1 w2"),  # shorter than n: no grams, must pass through
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in cut_duplicated_spans(df, n=5, min_count=2).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].clean_text == "x1 x2 x3 x4"
    assert rows[1].n_cut_tokens == 7 and rows[1].n_tokens == 11
    assert rows[2].clean_text == "y1 y2 y3 y4"
    assert rows[2].n_cut_tokens == 7
    assert rows[3].clean_text == "z1 z2 z3 z4 z5 z6 z7 z8 z9"
    assert rows[3].n_cut_tokens == 0
    assert rows[4].clean_text == "w1 w2" and rows[4].n_cut_tokens == 0

    # a doc that is ENTIRELY duplicated passage must empty out
    df2 = spark.createDataFrame(
        [(7, shared), (8, shared)], "doc_id long, text string"
    )
    rows2 = {r.doc_id: r for r in cut_duplicated_spans(df2, n=5, min_count=2).collect()}
    assert rows2[7].clean_text == "" and rows2[7].n_cut_tokens == 7
    assert rows2[8].clean_text == "" and rows2[8].n_cut_tokens == 7


def test_chunk_dedup_keep_first_exact(spark):
    """Keep-first chunk dedup on a constructed corpus, pinned to exact
    cleaned strings: the globally first (doc_id, chunk_idx) occurrence
    of each chunk survives, later repeats are cut, within-doc repeats
    count, and an all-duplicate doc empties out."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        chunk_dedup_keep_first,
    )

    df = spark.createDataFrame(
        [
            (1, "a b c d a b"),   # chunks(2): [a b][c d][a b] -> within-doc repeat
            (2, "c d x"),          # [c d][x] -> 'c d' first seen in doc 1
            (3, "q r s"),          # unique, untouched (incl. partial chunk 's')
            (4, "a b"),            # entirely duplicate -> empties
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in chunk_dedup_keep_first(df, chunk=2).collect()
    }
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].clean_text == "a b c d"
    assert rows[1].n_chunks == 3 and rows[1].n_removed_chunks == 1
    assert rows[2].clean_text == "x"
    assert rows[2].n_chunks == 2 and rows[2].n_removed_chunks == 1
    assert rows[3].clean_text == "q r s"
    assert rows[3].n_removed_chunks == 0
    assert rows[4].clean_text == "" and rows[4].n_removed_chunks == 1


def test_bpe_merge_candidates_exact_counts(spark):
    """BPE pair counts on a constructed vocab: overlapping repeats
    count per adjacent position, counts weight by word frequency, and
    the rank is totally ordered (count desc, pair asc)."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        bpe_merge_candidates,
    )

    # vocab: 'aaa' freq 2 (pair (a,a) twice per occurrence -> cnt 4),
    # 'bb' freq 1 -> (b,b) cnt 1; 'ab' freq 1 -> (a,b) cnt 1; single
    # chars contribute nothing
    df = spark.createDataFrame(
        [(1, "aaa bb AAA ab"), (2, "c")], "doc_id long, text string"
    )
    rows = [tuple(r) for r in bpe_merge_candidates(df, k=10).collect()]
    assert rows[0] == (1, "a", "a", 4, 1)
    # tie between (a,b) and (b,b) at cnt 1 breaks on pair asc
    assert rows[1] == (2, "a", "b", 1, 1)
    assert rows[2] == (3, "b", "b", 1, 1)
    assert len(rows) == 3


def test_logreg_newton_step_matches_numpy(spark):
    """The closed-form 2x2 Newton step must equal an independent numpy
    solve of beta = 4 (X^T X)^{-1} X^T (y - 1/2); a constant feature
    (det = 0) yields NULL betas instead of an error."""
    import numpy as np

    from kommunedata_data_pipeline_spark.operators.statistics import (
        logreg_newton_step,
    )

    data = [(1, 1), (2, 0), (3, 1), (4, 0), (10, 1), (7, 0), (7, 1)]
    df = spark.createDataFrame(data, "x long, y long")
    r = logreg_newton_step(df, F.col("x"), F.col("y")).collect()[0]
    xs = np.array([d[0] for d in data], dtype=float)
    ys = np.array([d[1] for d in data], dtype=float)
    X = np.stack([np.ones_like(xs), xs], axis=1)
    beta = 4.0 * np.linalg.solve(X.T @ X, X.T @ (ys - 0.5))
    assert r.n == len(data) and r.n_pos == int(ys.sum())
    assert abs(r.b0 - beta[0]) < 1e-6
    assert abs(r.b1 - beta[1]) < 1e-6

    const = spark.createDataFrame([(5, 1), (5, 0)], "x long, y long")
    r2 = logreg_newton_step(const, F.col("x"), F.col("y")).collect()[0]
    assert r2.b0 is None and r2.b1 is None


def test_bpe_learn_apply_textbook_merges(spark):
    """Full greedy BPE on the Sennrich-style toy vocab, pinned to exact
    segmentations: merges must be learned SEQUENTIALLY (round 2 counts
    round 1's merged symbols) with ties broken (count desc, pair asc),
    and within-word application is left-to-right non-overlapping."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        bpe_learn_apply,
    )

    df = spark.createDataFrame(
        [
            (1, "low lower lowest low low newer new"),
            (2, "low newer wider new new"),
        ],
        "doc_id long, text string",
    )
    # by hand: r1 (l,o)=6 ties (o,w)=6 -> 'l'<'o' merges lo; r2 (lo,w)=6;
    # r3 (e,w)=5 ties (n,e)=5 -> 'e'<'n' merges ew
    rows = [tuple(r) for r in bpe_learn_apply(df, merges=3, k_words=10).collect()]
    assert rows == [
        ("low", 4, "low"),
        ("new", 3, "n ew"),
        ("newer", 2, "n ew e r"),
        ("lower", 1, "low e r"),
        ("lowest", 1, "low e s t"),
        ("wider", 1, "w i d e r"),
    ]

    # overlapping repeats merge left-to-right: 'aaaa' with merge (a,a)
    # becomes 'aa aa', 'aaa' becomes 'aa a' — never 'a aa'
    df2 = spark.createDataFrame(
        [(1, "aaaa aaa aa")], "doc_id long, text string"
    )
    rows2 = {
        r.word: r.segmented
        for r in bpe_learn_apply(df2, merges=1, k_words=10).collect()
    }
    assert rows2 == {"aaaa": "aa aa", "aaa": "aa a", "aa": "aa"}


def test_logreg_apply_matches_scored_betas(spark):
    """The kept manifest must be exactly the rows whose logit (under the
    trainer's own round6 betas) is positive, with the logit reported."""
    from kommunedata_data_pipeline_spark.operators.statistics import (
        logreg_apply,
        logreg_newton_step,
    )

    data = [(0, 1, 1), (1, 2, 0), (2, 3, 1), (3, 4, 0), (4, 10, 1),
            (5, 7, 0), (6, 7, 1)]
    df = spark.createDataFrame(data, "doc_id long, x long, y long")
    b = logreg_newton_step(df, F.col("x"), F.col("y")).collect()[0]
    kept = {
        r.doc_id: r
        for r in logreg_apply(
            df, F.col("x"), F.col("y"), id_col="doc_id"
        ).collect()
    }
    for doc_id, x, y in data:
        logit = b.b0 + b.b1 * x
        assert (doc_id in kept) == (logit > 0)
        if doc_id in kept:
            assert kept[doc_id].x == x and kept[doc_id].label == y
            assert abs(kept[doc_id].logit - logit) < 1e-6


def _md5_mod(s: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % mod


def test_vocab_oov_audit_hand_case(spark):
    """Constructed split: train docs say only 'alpha beta'; one held-out
    doc adds the unseen token 'zzz' — the audit must count exactly the
    unseen tokens as OOV on the held-out side."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        vocab_oov_audit,
    )

    held_ids = [i for i in range(200) if _md5_mod(str(i), 100) < 20]
    train_ids = [i for i in range(200) if _md5_mod(str(i), 100) >= 20]
    assert held_ids and train_ids
    rows = [(i, "alpha beta", "en") for i in train_ids]
    # held-out docs: two known tokens + one unseen
    rows += [(held_ids[0], "alpha zzz", "en")]
    rows += [(i, "alpha beta", "da") for i in held_ids[1:]]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in vocab_oov_audit(df, vocab_size=10).collect()}
    assert out["en"].n_tokens == 2 and out["en"].n_oov == 1
    assert abs(out["en"].oov_rate - 0.5) < 1e-9
    assert out["da"].n_oov == 0
    assert out["da"].n_tokens == 2 * len(held_ids[1:])


def test_dsir_select_matches_python_replica(spark):
    """DSIR integer scores must equal an exact Python replica (hashed
    buckets, Laplace-smoothed ln ratios, floor-to-micro, per-doc sums),
    and docs wording like the target must outrank ones that don't."""
    import math

    from kommunedata_data_pipeline_spark.operators.corpus import dsir_select

    rows = [
        (0, "gold gold silver", "en"),       # target
        (1, "gold silver gold gold", "en"),  # target
        (2, "gold gold silver", "xx"),       # raw, target-like
        (3, "mud mud rock", "xx"),           # raw, unlike target
        (4, "gold mud", "xx"),               # raw, mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_select(
        df, target_pred=(F.col("lang") == "en"), n_buckets=8, top_n=10
    ).collect()
    got = {r.doc_id: r.score_micro for r in out}

    # python replica
    c_t: dict[int, int] = {}
    c_s: dict[int, int] = {}
    doc_buckets: dict[int, list[int]] = {}
    for doc_id, text, lang in rows:
        for tok in text.split():
            b = _md5_mod(tok, 8)
            if lang == "en":
                c_t[b] = c_t.get(b, 0) + 1
            else:
                c_s[b] = c_s.get(b, 0) + 1
                doc_buckets.setdefault(doc_id, []).append(b)
    tot_t, tot_s = sum(c_t.values()), sum(c_s.values())
    w = {
        b: math.floor(
            1e6
            * math.log(
                (c_t.get(b, 0) + 1) * (tot_s + 8)
                / ((c_s.get(b, 0) + 1) * (tot_t + 8))
            )
        )
        for b in set(c_t) | set(c_s)
    }
    expect = {
        d: sum(w[b] for b in bl) for d, bl in doc_buckets.items()
    }
    assert got == expect
    assert got[2] > got[3]  # target-like raw doc outranks the unlike one


def test_bigram_surprisal_matches_python_replica(spark):
    """Exact replica of the stupid-backoff scoring: seen bigrams score
    ln c1 - ln c2, unseen bigrams with seen w2 back off to
    ln N - ln cu + λ, unseen w2 adds ln N + λ — all in integer
    micro-nats."""
    import math

    from kommunedata_data_pipeline_spark.operators.corpus import (
        _BACKOFF_MICRO,
        bigram_surprisal,
    )

    rows = [
        (0, "a b a b c"),      # train
        (2, "a a b c"),        # train
        (1, "a b zzz c qq"),   # score: seen, backoff(seen w2), unseen w2
        (3, "b c"),            # score: seen bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_surprisal(df).collect()}

    train_toks = "a b a b c".split() + "a a b c".split()
    cu: dict = {}
    for t in train_toks:
        cu[t] = cu.get(t, 0) + 1
    c2: dict = {}
    for s in ("a b a b c", "a a b c"):
        w = s.split()
        for i in range(len(w) - 1):
            c2[(w[i], w[i + 1])] = c2.get((w[i], w[i + 1]), 0) + 1
    lnm = lambda c: round(math.log(c) * 1e6)  # noqa: E731
    ln_n = lnm(len(train_toks))

    def score(w1, w2):
        if (w1, w2) in c2 and w1 in cu:
            return lnm(cu[w1]) - lnm(c2[(w1, w2)]), 0
        if w2 in cu:
            return ln_n - lnm(cu[w2]) + _BACKOFF_MICRO, 1
        return ln_n + _BACKOFF_MICRO, 1

    for doc_id, text in [(1, "a b zzz c qq"), (3, "b c")]:
        w = text.split()
        scores = [score(w[i], w[i + 1]) for i in range(len(w) - 1)]
        tot = sum(s for s, _ in scores)
        nb = sum(b for _, b in scores)
        r = out[doc_id]
        assert r.n_bigrams == len(scores)
        assert r.n_backoff == nb
        assert r.surprisal_micro == tot
        assert abs(r.avg_neg_logp - round(tot / len(scores) / 1e6, 4)) < 1e-9
    assert out[1].n_backoff >= 2  # both backoff shapes exercised
    assert 0 not in out and 2 not in out  # train docs are not scored


def test_cdc_chunking_reassembles_and_localizes_edits(spark):
    """The two CDC invariants: (1) chunks reassemble the exact token
    stream; (2) prepending tokens re-chunks only up to the next
    surviving boundary — the chunk lists share their entire tail
    (fixed-width chunking would shift every later chunk)."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        cdc_chunk_arrays,
    )

    base_text = " ".join(f"tok{i % 97}x{i % 13}" for i in range(400))
    edited = "inserted words here " + base_text
    df = spark.createDataFrame(
        [(1, base_text, "s"), (2, edited, "s")],
        "doc_id long, text string, source string",
    )
    out = {
        r["doc_id"]: r["chunks"]
        for r in cdc_chunk_arrays(df, divisor=8).collect()
    }
    assert " ".join(out[1]) == base_text
    assert " ".join(out[2]) == edited
    # edit locality: all but the first few chunks are identical
    c1, c2 = out[1], out[2]
    shared = 0
    while shared < min(len(c1), len(c2)) and c1[-1 - shared] == c2[-1 - shared]:
        shared += 1
    assert shared >= len(c1) - 2, (
        f"prepend disturbed more than the head: shared tail {shared} "
        f"of {len(c1)}"
    )


def test_cdc_dedup_stats_counts_exact_duplicates(spark):
    """Two identical docs → every chunk duplicated: n_chunks == 2 *
    n_distinct and bytes_total == 2 * bytes_distinct."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        cdc_dedup_stats,
    )

    text = " ".join(f"w{i % 53}q{i % 7}" for i in range(300))
    df = spark.createDataFrame(
        [(1, text, "s"), (2, text, "s")],
        "doc_id long, text string, source string",
    )
    row = cdc_dedup_stats(df, divisor=8).collect()[0]
    assert row["n_chunks"] == 2 * row["n_distinct"]
    assert row["bytes_total"] == 2 * row["bytes_distinct"]
    assert abs(row["dedup_ratio"] - 0.5) < 1e-9
