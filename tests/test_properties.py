"""Property-based tests (SURVEY §5 item 4) — hypothesis drives randomized
inputs through the Spark operators and checks them against independent
in-Python models (pandas merge_asof, brute-force theta join, round-trip
identities)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kommunedata_data_pipeline_spark.functions.dates import parse_meeting_date
from kommunedata_data_pipeline_spark.operators.joins import asof_join, range_join_binned

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_MONTHS_DA = [
    "januar", "februar", "marts", "april", "maj", "juni",
    "juli", "august", "september", "oktober", "november", "december",
]


def _fmt(d: dt.date, kind: int) -> str:
    if kind == 0:
        return d.strftime("%Y-%m-%d")
    if kind == 1:
        return d.strftime("%d-%m-%Y")
    if kind == 2:
        return d.strftime("%d.%m.%Y")
    return f"{d.day}. {_MONTHS_DA[d.month - 1]} {d.year} - 15:30"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.dates(dt.date(1990, 1, 1), dt.date(2035, 12, 31)),
            st.integers(0, 3),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_date_parse_round_trips_all_formats(spark, cases):
    rows = [(i, _fmt(d, k)) for i, (d, k) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i int, raw string")
    got = {
        r.i: r.parsed
        for r in df.select(
            "i", parse_meeting_date(F.col("raw")).alias("parsed")
        ).collect()
    }
    for i, (d, _) in enumerate(cases):
        assert got[i] == d, (i, cases[i], got[i])


@settings(**_SETTINGS)
@given(
    points=st.lists(st.integers(0, 3_000), min_size=1, max_size=60, unique=True),
    intervals=st.lists(
        st.tuples(st.integers(0, 3_000), st.integers(1, 900)),
        min_size=1,
        max_size=30,
    ),
    bin_s=st.sampled_from([1, 7, 60, 300]),
)
def test_range_join_matches_theta_model(spark, points, intervals, bin_s):
    """Binned equi-join rewrite == brute-force containment, for any bin
    width (bins are an execution detail, never semantics)."""
    p = spark.createDataFrame(
        [(i, v) for i, v in enumerate(points)], "pid int, sec long"
    ).select("pid", F.timestamp_seconds("sec").alias("pts"))
    iv = spark.createDataFrame(
        [(i, s, s + w) for i, (s, w) in enumerate(intervals)],
        "iid int, s long, e long",
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("sts"),
        F.timestamp_seconds("e").alias("ets"),
    )
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(p, iv, "pts", "sts", "ets", bin_s).collect()
    }
    expected = {
        (pi, ii)
        for pi, pv in enumerate(points)
        for ii, (s, w) in enumerate(intervals)
        if s <= pv < s + w
    }
    assert got == expected


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=40,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Union-sort-fill as-of == pandas merge_asof (backward, exact
    matches allowed), per key."""
    right = list({(k, t): (k, t) for k, t in right}.values())  # unique (k,t)
    l_df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k int, sec long"
    ).select("lid", "k", F.timestamp_seconds("sec").alias("ts"))
    r_df = spark.createDataFrame(
        [(k, t, t * 10) for k, t in right], "k int, sec long, payload long"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "payload")
    got = {
        r.lid: r.asof_payload
        for r in asof_join(
            l_df, r_df, on="k", left_ts="ts", right_ts="ts", right_payload=["payload"]
        ).collect()
    }
    lp = pd.DataFrame({"lid": range(len(left)), "k": [k for k, _ in left], "t": [t for _, t in left]})
    rp = pd.DataFrame({"k": [k for k, _ in right], "t": [t for _, t in right], "payload": [t * 10 for _, t in right]})
    merged = pd.merge_asof(
        lp.sort_values(["t", "lid"]),
        rp.sort_values("t"),
        on="t",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    for _, row in merged.iterrows():
        exp = None if pd.isna(row["payload"]) else int(row["payload"])
        assert got[int(row["lid"])] == exp, (row["lid"], exp, got[int(row["lid"])])


def test_skyline_matches_bruteforce(spark):
    import random

    from kommunedata_data_pipeline_spark.operators.relational import skyline_2d

    rng = random.Random(7)
    rows = [(i, float(rng.randrange(0, 500)), rng.randrange(0, 500)) for i in range(400)]
    # a couple of exact duplicates to pin the min-id-representative rule
    rows += [(1000, rows[0][1], rows[0][2]), (1001, 77.0, 77), (1002, 77.0, 77)]

    def dominated(p, q):
        return (
            q[1] >= p[1] and q[2] <= p[2] and (q[1] > p[1] or q[2] < p[2])
        )

    sky = set()
    for p in rows:
        if any(dominated(p, q) for q in rows if q[0] != p[0]):
            continue
        dups = [q[0] for q in rows if q[1] == p[1] and q[2] == p[2]]
        if p[0] == min(dups):
            sky.add(p[0])

    df = spark.createDataFrame(rows, "id long, price double, lead long")
    got = {r.id for r in skyline_2d(df, "price", "lead", "id", 50.0).collect()}
    assert got == sky


# --- gap-session processor vs reference model (pure Python, no Spark) ---


class _FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self._timers: list[int] = []

    def getValueState(self, name, schema):
        self._state = _FakeValueState()
        return self._state

    def listTimers(self):
        return list(self._timers)

    def deleteTimer(self, t):
        self._timers.remove(t)

    def registerTimer(self, t):
        self._timers.append(t)


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=50_000), min_size=1, max_size=40
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=39), max_size=4),
    gap_s=st.sampled_from([60, 600, 3600]),
)
@settings(max_examples=60, deadline=None)
def test_session_processor_matches_reference_under_any_batch_split(
    ts, cuts, gap_s
):
    """Drive SessionCloseProcessor directly (mock state/handle, no
    Spark): for ANY in-order batch split of a timestamp multiset, the
    emitted sessions (evidence-closed + final timer fire) must equal
    the single-pass gap-merge reference — batching is an execution
    detail, not a semantic one."""
    import pandas as pd

    from kommunedata_data_pipeline_spark.streaming.stateful import (
        SessionCloseProcessor,
    )

    ts = sorted(ts)
    gap_us = gap_s * 1_000_000
    # reference: single-pass gap merge over the sorted multiset (us)
    us = [t * 1_000_000 for t in ts]
    ref = [[us[0], us[0], 1]]
    for t in us[1:]:
        if t - ref[-1][1] <= gap_us:
            ref[-1][1] = t
            ref[-1][2] += 1
        else:
            ref.append([t, t, 1])
    expected = {tuple(s) for s in ref}

    proc = SessionCloseProcessor(gap_ms=gap_s * 1000)
    handle = _FakeHandle()
    proc.init(handle)
    bounds = sorted({0, len(ts), *(c for c in cuts if c < len(ts))})
    emitted = []
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = ts[lo:hi]
        if not chunk:
            continue
        pdf = pd.DataFrame(
            {"ts": pd.to_datetime([t * 1_000_000_000 for t in chunk])}
        )
        for out in proc.handleInputRows((7,), iter([pdf]), None):
            emitted.extend(
                zip(
                    out["session_start_us"],
                    out["session_end_us"],
                    out["n_events"],
                )
            )
        # exactly one live timer at open-end + gap after every batch
        assert len(handle._timers) == 1
    # final watermark passes everything: fire the timer for the tail
    for out in proc.handleExpiredTimer((7,), None, None):
        emitted.extend(
            zip(out["session_start_us"], out["session_end_us"], out["n_events"])
        )
    got = {(int(a), int(b), int(c)) for a, b, c in emitted}
    assert got == expected


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(**_SETTINGS)
@given(
    st.lists(
        # 2-letter alphabet + short lengths force dense near-dup structure
        # (many pairs at distance exactly k) — the adversarial case for
        # both filter schemes
        st.text(alphabet="ab", min_size=0, max_size=8),
        min_size=2,
        max_size=12,
    )
)
def test_fuzzy_joins_lose_nothing_vs_bruteforce(spark, strings):
    from kommunedata_data_pipeline_spark.operators.dedup import (
        deletion_neighborhood_join,
        edit_distance_join,
    )

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "sid long, s string")
    expect1 = {
        (i, j, _lev(a, b))
        for (i, a) in rows
        for (j, b) in rows
        if i < j and _lev(a, b) <= 1
    }
    got_del = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in deletion_neighborhood_join(df, "sid", "s").collect()
    }
    assert got_del == expect1
    got_ed = {
        (r.id_a, r.id_b, r.edit_dist)
        for r in edit_distance_join(df, "sid", "s", k=1, q=2).collect()
    }
    assert got_ed == expect1


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(2, 3),
)
def test_cut_duplicated_spans_matches_python_model(spark, corpora, n):
    """cut_duplicated_spans vs an independent per-token Python model:
    a token is cut iff some n-gram occurrence covering it appears
    >= min_count times corpus-wide. Tiny alphabet forces heavy overlap,
    within-doc repeats, all-duplicated docs, and sub-n docs."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        cut_duplicated_spans,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]

    # model: count every n-gram occurrence corpus-wide, mark covered
    from collections import Counter

    counts = Counter()
    for _, text in docs:
        toks = text.split()
        for s in range(len(toks) - n + 1):
            counts[tuple(toks[s:s + n])] += 1
    expected = {}
    for i, text in docs:
        toks = [t for t in text.split() if t]
        covered = set()
        for s in range(len(toks) - n + 1):
            if counts[tuple(toks[s:s + n])] >= 2:
                covered.update(range(s, s + n))
        clean = [t for j, t in enumerate(toks) if j not in covered]
        expected[i] = (" ".join(clean), len(toks), len(covered))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_cut_tokens)
        for r in cut_duplicated_spans(df, n=n, min_count=2).collect()
    }
    assert got == expected


@settings(**_SETTINGS)
@given(st.integers(0, 9), st.integers(2, 5))
def test_index_updates_equal_rebuild_for_any_split(spark, pivot, mod):
    """For ANY old/new split of the corpus, incremental MinHash update
    must return exactly the full-rebuild pairs that involve a new doc
    (the invariant the driver oracle pins for one fixed split)."""
    from kommunedata_data_pipeline_spark.operators.dedup import (
        minhash_band_table,
        minhash_index_update,
        minhash_lsh_pairs,
    )
    from kommunedata_data_pipeline_spark.sources.readers import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 120)
    )
    old = docs.where(F.col("doc_id") % mod != pivot % mod)
    new = docs.where(F.col("doc_id") % mod == pivot % mod)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    index = minhash_band_table(old, 3, 16, 4)
    pairs, _ = minhash_index_update(new, index, 3, 16, 4, 0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    full = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, 3, 16, 4, 0.5).collect()
        if r.doc_a in new_ids or r.doc_b in new_ids
    }
    assert got == full


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(
            st.integers(0, 30).map(lambda i: f"w{i}"),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_cdc_chunks_reassemble_for_any_corpus(spark, token_lists):
    """CDC invariant under randomized corpora: every document's chunk
    list concatenates back to its exact token stream (empty docs emit
    no row)."""
    from kommunedata_data_pipeline_spark.operators.corpus import (
        cdc_chunk_arrays,
    )

    rows = [(i, " ".join(toks), "s") for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {
        r["doc_id"]: list(r["chunks"])
        for r in cdc_chunk_arrays(df, divisor=4).collect()
    }
    for i, toks in enumerate(token_lists):
        if not toks:
            assert i not in got
        else:
            assert " ".join(got[i]).split(" ") == toks


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=40),
    st.integers(1, 200),
)
def test_token_budget_prefix_model_for_any_budget(spark, lens, budget):
    """token_budget_select == the Python greedy prefix for ANY corpus of
    random token lengths and ANY budget (inclusive cumsum <= budget in
    (quality desc, doc_id) order)."""
    from kommunedata_data_pipeline_spark.operators.sampling import (
        token_budget_select,
    )
    from kommunedata_data_pipeline_spark.functions.text import (
        quality_score,
        token_count,
    )

    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)), "s")
        for i, n in enumerate(lens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in token_budget_select(df, budget=budget).collect()
    }
    scored = sorted(
        df.select(
            "doc_id",
            token_count(F.col("text")).alias("nt"),
            quality_score(F.col("text")).alias("q"),
        ).collect(),
        key=lambda r: (-r["q"], r["doc_id"]),
    )
    cum, expect = 0, {}
    for r in scored:
        cum += r["nt"]
        if cum > budget:
            break
        expect[r["doc_id"]] = cum
    assert got == expect


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=3, max_size=8),
        min_size=2,
        max_size=25,
    )
)
def test_sorted_neighborhood_is_subset_of_exact_lev1(spark, strings):
    """Blocking soundness: every pair the sorted-neighborhood pass
    emits is a true lev<=1 pair (SN verifies, so SN ⊆ the deletion
    join's exact ground truth) — recall may drop, precision may not."""
    from kommunedata_data_pipeline_spark.operators.dedup import (
        deletion_neighborhood_join,
        sorted_neighborhood_pairs,
    )

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "c_custkey long, c_name string")
    sn = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "c_custkey", "c_name", window=5
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in deletion_neighborhood_join(
            df, "c_custkey", "c_name"
        ).collect()
    }
    assert sn <= exact


@settings(**_SETTINGS)
@given(
    st.integers(8, 30),   # shared-run length in tokens (>= w+window-1)
    st.integers(0, 20),   # doc-a prefix length
    st.integers(0, 20),   # doc-b suffix length
)
def test_winnowing_guarantee_for_any_shared_run(spark, run_len, pre, suf):
    """The winnowing theorem, property-tested: for ANY shared token run
    of length >= w + window - 1 (= 8 here) embedded at ANY offsets, the
    two docs share at least one selected fingerprint."""
    from kommunedata_data_pipeline_spark.operators.dedup import (
        winnowing_overlap_pairs,
    )

    shared = " ".join(f"sh{i}r{i % 7}" for i in range(run_len))
    a = " ".join(f"pa{i}x" for i in range(pre)) + " " + shared
    b = shared + " " + " ".join(f"sb{i}y" for i in range(suf))
    df = spark.createDataFrame(
        [(1, a.strip(), "s"), (2, b.strip(), "s")],
        "doc_id long, text string, source string",
    )
    pairs = winnowing_overlap_pairs(
        df, w=4, window=5, min_shared=1
    ).collect()
    assert any(
        (r["doc_a"], r["doc_b"]) == (1, 2) for r in pairs
    ), f"guarantee violated at run_len={run_len}, pre={pre}, suf={suf}"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=20,
    ),
    st.integers(0, 100),  # split percentile: which edges are "stored"
)
def test_cc_index_update_equals_rebuild_for_any_split(spark, edges, pct):
    """Incremental-CC soundness property: for ANY edge set and ANY
    store/batch split of it, updating the stored labels with the batch
    yields exactly the full-rebuild labels (same nodes, same min-label
    roots) — merges across the split included."""
    from kommunedata_data_pipeline_spark.operators.dedup import (
        cc_index_update,
        dup_clusters,
    )

    edges = list({(min(a, b), max(a, b)) for a, b in edges})
    cut = (len(edges) * pct) // 100
    stored_e, batch_e = edges[:cut], edges[cut:]

    def df_of(ps):
        if not ps:
            return spark.createDataFrame([], "doc_a long, doc_b long")
        return spark.createDataFrame(ps, "doc_a long, doc_b long")

    stored = dup_clusters(df_of(stored_e))
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in cc_index_update(stored, df_of(batch_e)).collect()
    }
    full = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(df_of(edges)).collect()
    }
    assert got == full


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abXY", min_size=0, max_size=6),
        min_size=1,
        max_size=30,
    )
)
def test_ranged_global_rank_is_exact_for_any_strings(spark, strings):
    """ranged_global_rank == the global-window row_number for ANY
    key distribution — including all-equal keys (ties broken by the
    unique id) and heavily skewed prefixes (the r7-advice shape)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kommunedata_data_pipeline_spark.operators.dedup import (
        ranged_global_rank,
    )

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "sid long, str string"
    )
    got = {
        r["sid"]: r["rn"]
        for r in ranged_global_rank(df, ["str", "sid"]).collect()
    }
    w = Window.orderBy("str", "sid")
    expect = {
        r["sid"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == expect


# ------------------------------------------------ round-9 properties


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=30),
        min_size=2,
        max_size=12,
    )
)
def test_substring_cover_equals_brute_force_any_corpus(spark, texts):
    """The Lee et al. cover identity holds for ANY corpus: the merged
    duplicated-L-gram spans equal the brute-force repeated-substring
    cover. Tiny alphabet forces heavy within- and cross-doc repeats."""
    from collections import Counter

    from kommunedata_data_pipeline_spark.operators.corpus import (
        substring_dup_spans,
    )

    L = 4
    docs = list(enumerate(texts))
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in substring_dup_spans(d, min_len=L).collect()
    }
    grams = Counter()
    for _, t in docs:
        for p in range(len(t) - L + 1):
            grams[t[p : p + L]] += 1
    want = set()
    for i, t in docs:
        spans = []
        for p in range(len(t) - L + 1):
            if grams[t[p : p + L]] < 2:
                continue
            s, e = p + 1, p + L
            if spans and s <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        want |= {(i, s, e) for s, e in spans}
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    )
)
def test_ks_matches_bisect_model_any_data(spark, data):
    """KS D equals the two-ECDF max-gap model for any tied integer
    data; D ∈ [0, 1]; D == 0 for identical multisets."""
    import bisect

    from kommunedata_data_pipeline_spark.operators.statistics import ks_test

    d = spark.createDataFrame(data, "s int, g int")
    row = ks_test(d, "s", "g").collect()[0]
    xs0 = sorted(s for s, g in data if g == 0)
    xs1 = sorted(s for s, g in data if g == 1)
    if not xs0 or not xs1:
        assert row["d"] is None
        return
    dmax = max(
        abs(
            bisect.bisect_right(xs1, t) / len(xs1)
            - bisect.bisect_right(xs0, t) / len(xs0)
        )
        for t in {s for s, _ in data}
    )
    assert row["d"] == round(dmax, 6)
    assert 0.0 <= row["d"] <= 1.0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.lists(st.integers(0, 30), min_size=1, max_size=8, unique=True),
        min_size=1,
        max_size=4,
    ),
    st.permutations(range(4)),
)
def test_rrf_invariant_under_list_order(spark, rank_lists, perm):
    """RRF fusion is a SUM over lists — permuting the input list order
    must not change any fused score."""
    from kommunedata_data_pipeline_spark.operators.retrieval import rrf_fuse

    frames = [
        spark.createDataFrame(
            [(doc, r + 1) for r, doc in enumerate(lst)],
            "doc_id long, rank int",
        )
        for lst in rank_lists
    ]
    a = {
        (r["doc_id"], r["n_lists"], r["rrf_u"])
        for r in rrf_fuse(frames, topk=100).collect()
    }
    shuffled = [frames[i] for i in perm if i < len(frames)]
    if not shuffled:
        shuffled = frames
    b = {
        (r["doc_id"], r["n_lists"], r["rrf_u"])
        for r in rrf_fuse(shuffled, topk=100).collect()
    }
    if len(shuffled) == len(frames):
        assert a == b


@settings(**_SETTINGS)
@given(
    st.lists(st.floats(0, 100, allow_nan=False), min_size=1, max_size=40),
    st.integers(2, 4),
)
def test_histogram_merge_associative_any_split(spark, vals, n_shards):
    """Merging per-shard histogram states equals the one-shot
    histogram for ANY shard assignment (commutative monoid)."""
    from kommunedata_data_pipeline_spark.operators.aggregates import (
        histogram_state,
        merge_histogram_states,
    )

    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    d = spark.createDataFrame(rows, "k string, i int, v double")
    direct = sorted(
        map(tuple, histogram_state(d, ["k"], "v", 7.0).collect())
    )
    shards = [
        histogram_state(
            d.where(F.col("i") % n_shards == s), ["k"], "v", 7.0
        )
        for s in range(n_shards)
    ]
    u = shards[0]
    for sh in shards[1:]:
        u = u.unionByName(sh)
    merged = sorted(
        map(tuple, merge_histogram_states(u, ["k"]).collect())
    )
    assert merged == direct
