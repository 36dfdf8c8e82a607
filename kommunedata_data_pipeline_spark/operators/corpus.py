"""Corpus-level training-data curation operators (north-star LLM ops).

These extend the per-document text analysis in ``functions.text`` to
whole-corpus questions a pretraining-data pipeline asks: is the eval set
leaking into train (contamination)? how repetitive is each document
(Gopher-style rep fraction)? which documents only restate n-grams the
corpus already has (novelty)? what does the token frequency head look
like (Zipf)? and PII scrubbing before anything ships.

All hot paths are built-in column expressions (whole-stage codegen); the
only shuffles are the corpus-wide groupBy/join each op fundamentally
needs, and every one of those is map-side-combinable or equi-join
shaped, so the plans hold at 100 TB: n-gram streams shard uniformly by
ngram hash, no operator collects to the driver, and skew valves
(document-frequency caps) bound hot-key fan-out.

Reference parity: the reference has no corpus analytics (it is a
scraper); these are mandated by the north-star scope (BASELINE.json:6)
as first-class engine surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.expr import let
from ..functions.strings import md5_bigint
from ..functions.text import tokens


def word_ngrams(text: Column, n: int) -> Column:
    """Space-joined word n-grams as an array column; [] when the doc has
    fewer than ``n`` tokens.

    Evaluates the token split ONCE via ``let`` (Catalyst has no CSE in
    HOF lambdas). DuckDB twin shape::

        list_transform(range(1, len(toks) - n + 2),
                       i -> toks[i] || ' ' || ... || toks[i + n - 1])

    (DuckDB ``range(a, b)`` is end-exclusive and lists are 1-based;
    Spark ``sequence(a, b)`` is inclusive — both enumerate the same
    start positions.)
    """

    def _grams(toks: Column) -> Column:
        m = F.size(toks)
        return F.when(
            m >= n,
            F.transform(
                F.sequence(F.lit(1), m - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return let(tokens(text), _grams)


def repetition_stats(documents: DataFrame, n: int = 3) -> DataFrame:
    """Gopher-style repetition score: the fraction of a document's word
    n-grams that are repeats of an n-gram already used in the same
    document (1 - distinct/total). High values flag boilerplate and
    looped generations that dedup-by-hash misses.

    Narrow, shuffle-free: both counts come from one array expression per
    row, so this scans and never redistributes — at 100 TB it is pure
    map work pipelined into whatever follows.
    """
    grams = word_ngrams(F.col("text"), n)

    def _stats(g: Column) -> Column:
        return F.struct(
            F.size(g).alias("n_ngrams"),
            F.size(F.array_distinct(g)).alias("n_distinct"),
        )

    st = let(grams, _stats)
    return documents.select(
        "doc_id",
        st["n_ngrams"].alias("n_ngrams"),
        st["n_distinct"].alias("n_distinct"),
        F.when(st["n_ngrams"] > 0,
               F.round(1.0 - st["n_distinct"] / st["n_ngrams"], 6))
        .otherwise(F.lit(0.0)).alias("rep_frac"),
    )


def contamination_check(
    train: DataFrame, test: DataFrame, n: int = 8
) -> DataFrame:
    """Train/test contamination: for each test document, how many of its
    word ``n``-grams appear verbatim anywhere in the train corpus
    (the standard n-gram-overlap decontamination test used for
    pretraining evals).

    Scale shape: both sides explode to (ngram) streams, distinct is
    map-side combinable, and the only cross-corpus operation is an
    equi-join on the ngram itself — shards uniformly by ngram hash. A
    white-hot n-gram ("of the of the...") costs train-side one row after
    distinct, so there is no skew amplification on the build side.
    Returns every test doc (zero-hit docs included, LEFT join).
    """
    test_grams = (
        test.select(
            "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("ngram")
        )
        .dropDuplicates(["doc_id", "ngram"])
    )
    train_grams = (
        train.select(F.explode(word_ngrams(F.col("text"), n)).alias("ngram"))
        .dropDuplicates(["ngram"])
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        test_grams.join(train_grams, "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_ngrams"), 6).alias("contamination"),
    )


def decontaminate(train: DataFrame, test: DataFrame, n: int = 8) -> DataFrame:
    """APPLY the contamination check (the detect→act discipline from the
    reference's filter→write chains, scraper.py:181-267, and the r6
    verdict's span-cut precedent): DROP every train document sharing ANY
    word ``n``-gram with the eval/test corpus and return the kept train
    rows as (doc_id, n_ngrams) — the decontaminated corpus manifest a
    pretraining pipeline writes next. Zero-gram (too-short) docs cannot
    be contaminated and are kept with n_ngrams = 0.

    Scale shape: eval corpora are tiny next to a 100 TB train set — the
    distinct eval gram set shards by ngram; contamination detection is a
    semi-join on the ngram key (no payload crosses), and the kept set is
    ONE doc_id anti-join. Nothing rejoins the text column.
    """
    test_grams = test.select(
        F.explode(word_ngrams(F.col("text"), n)).alias("ngram")
    ).dropDuplicates(["ngram"])
    train_grams = train.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("ngram")
    ).dropDuplicates(["doc_id", "ngram"])
    contaminated = (
        train_grams.join(test_grams, "ngram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        train.join(contaminated, "doc_id", "left_anti")
        .select("doc_id", F.size(word_ngrams(F.col("text"), n)).alias("n_ngrams"))
        .orderBy("doc_id")
    )


def _bloom_hashes(col: Column) -> list[Column]:
    """(`__h1`, `__h2`): two 31-bit double-hashing values from ONE
    xxhash64 evaluation (low 31 bits / next 31 bits). Shared by the
    bitmap build and the probe predicate — they must agree bit-for-bit,
    nothing else about the hash matters to a bloom screen."""
    h = F.xxhash64(col)
    return [
        h.bitwiseAND(F.lit(0x7FFFFFFF)).alias("__h1"),
        F.shiftrightunsigned(h, 31)
        .bitwiseAND(F.lit(0x7FFFFFFF))
        .alias("__h2"),
    ]


def bloom_filter_row(
    items: DataFrame, col: str, n_bits: int, k: int
) -> DataFrame:
    """ONE-row frame holding a dense bloom bitmap (`__words`:
    array<bigint>, ceil(n_bits/64) words) of the distinct values of
    ``col``. Double hashing (Kirsch & Mitzenmacher 2006): probe i sets
    bit pmod(h1 + i·h2, n_bits), with h1/h2 the two 31-bit xxhash64
    slices from ``_bloom_hashes``. The dense array
    broadcasts as a single row, so membership probes are a pure
    MAP-SIDE bit test (`bloom_probe_pred`) — no shuffle, no explode.

    Sizing contract (caller's): ~10 bits/item with k=4 gives ≈1% false
    positives; false NEGATIVES are impossible (every true member set
    all its bits). Build cost: k positions per item, one bit_or
    aggregate over n_bits/64 words.

    Hash material: ONE xxhash64 per item, sliced into two 31-bit
    halves (`_bloom_hashes`) — NOT the md5 pipeline the exactness-
    bearing operators use. A bloom screen's hash never touches
    correctness (false positives are re-verified exactly downstream,
    false negatives are impossible for ANY deterministic hash), it
    only needs to agree between build and probe — and xxhash64 is a
    single JVM intrinsic vs md5's digest+hex+conv chain, which was
    the measured CPU bottleneck of the screen (r10: the md5 double
    hash made the screened path SLOWER than the unscreened exact join
    on a local box where shuffles are memory-speed). 31-bit halves so
    `h1 + i·h2` stays far from BIGINT overflow under ANSI."""
    m = int(n_bits)
    w = (m + 63) // 64
    hashed = items.select(*_bloom_hashes(F.col(col)))
    sparse = (
        hashed.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, {k - 1}),"
                    f" i -> pmod(__h1 + i * __h2, {m}L))"
                )
            ).alias("pos")
        )
        .select(
            F.expr("pos DIV 64").alias("word_idx"),
            F.expr("CAST(pmod(pos, 64) AS INT)").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(shiftleft(1L, bit))").alias("bits"))
    )
    dense = (
        items.sparkSession.range(w)
        .select(F.col("id").alias("word_idx"))
        .join(sparse, "word_idx", "left")
        .select(
            "word_idx",
            F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"),
        )
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word_idx", "bits"))),
            lambda s: s["bits"],
        ).alias("__words")
    )


def bloom_probe_pred(n_bits: int, k: int) -> str:
    """SQL predicate (for F.expr) testing columns `__h1`/`__h2` against
    the broadcast `__words` bitmap — true iff ALL k probe bits are set
    (value POSSIBLY in the set)."""
    m = int(n_bits)
    terms = []
    for i in range(k):
        pos = f"pmod(__h1 + {i} * __h2, {m}L)"
        terms.append(
            f"(shiftright(element_at(__words, CAST({pos} DIV 64 AS INT) + 1),"
            f" CAST(pmod({pos}, 64) AS INT)) & 1) = 1"
        )
    return " AND ".join(terms)


def decontaminate_bloom(
    train: DataFrame,
    test: DataFrame,
    n: int = 8,
    n_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """`decontaminate` with a BLOOM-FILTER screen in front of the exact
    ngram semi-join (VERDICT r9 next #7b): the eval gram set collapses
    to an n_bits bitmap (ONE broadcast row, ~10 bits/gram vs the 50+
    bytes/row of the gram table), every train gram is screened by a
    map-side bit test, and only the survivors — true hits plus the ~1%
    bloom false positives — reach the exact semi-join. False negatives
    are impossible, so the OUTPUT IS BIT-IDENTICAL to the exact
    operator (pytest-pinned, and the driver oracle is the same exact
    SQL): the bloom changes the I/O shape, not the semantics.

    Why it matters at 100 TB: the exact semi-join shuffles the train
    gram stream by ngram (the dominant movement — train is the 100 TB
    side); the screen cuts that shuffle to contaminated-ish volume
    (measured ~97% fewer gram rows at sf0.01 for the standard split,
    NOTES_r10) for one broadcast and a few integer ops per gram. The
    train side deliberately does NOT dropDuplicates before the screen
    (the exact twin does, as map-side pre-aggregation for ITS full
    semi-join shuffle): a pre-screen dedup is itself a full train-gram
    shuffle, which would negate the screen entirely, and duplicates are
    harmless to a semi-join feeding a distinct doc_id set — NOTHING
    shuffles here until after the bit test (r10 self-review; the first
    cut shipped the dedup and kept the full shuffle it existed to
    remove). ``n_bits`` is the caller's capacity knob (~10× expected
    eval grams; a production pipeline sizes it from the eval manifest —
    never a plan-time count here)."""
    test_grams = test.select(
        F.explode(word_ngrams(F.col("text"), n)).alias("ngram")
    ).dropDuplicates(["ngram"])
    bloom = bloom_filter_row(test_grams, "ngram", n_bits, k)
    train_grams = train.select(
        "doc_id",
        F.explode(word_ngrams(F.col("text"), n)).alias("ngram"),
    ).select("doc_id", "ngram", *_bloom_hashes(F.col("ngram")))
    screened = (
        train_grams.crossJoin(F.broadcast(bloom))
        .where(F.expr(bloom_probe_pred(n_bits, k)))
        .select("doc_id", "ngram")
    )
    contaminated = (
        screened.join(test_grams, "ngram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        train.join(contaminated, "doc_id", "left_anti")
        .select(
            "doc_id", F.size(word_ngrams(F.col("text"), n)).alias("n_ngrams")
        )
        .orderBy("doc_id")
    )


def ngram_novelty(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-document novelty rate: the fraction of a doc's distinct word
    n-grams that no earlier document (smaller doc_id) already contains.
    The corpus-curriculum dual of dedup — a near-zero novelty doc is a
    rephrasing of what the corpus already holds.

    Two shuffles, both keyed by ngram: distinct (doc, ngram) pairs, then
    a min(doc_id) window per ngram. ``first_doc == doc_id`` marks the
    ngram's first appearance; everything is count-aggregated back per
    doc. No joins back to the text, no driver state.
    """
    pairs = documents.select(
        "doc_id", F.explode(word_ngrams(F.col("text"), n)).alias("ngram")
    ).dropDuplicates(["doc_id", "ngram"])
    w = Window.partitionBy("ngram")
    flagged = pairs.withColumn("first_doc", F.min("doc_id").over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint"))
            .alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_novel",
            F.round(F.col("n_novel") / F.col("n_ngrams"), 6).alias("novelty"),
        )
    )


def token_zipf(documents: DataFrame, k: int = 50) -> DataFrame:
    """Global token-frequency head: top-``k`` lowercased tokens with a
    deterministic rank (count desc, token asc — total order, so the
    driver hash can't flip on ties).

    One explode + one map-side-combinable groupBy; the top-k is a
    TakeOrdered over per-partition heads, never a full sort of the
    vocabulary. This is the Zipf sanity check every corpus build runs.
    """
    counted = (
        documents.select(
            F.explode(tokens(F.lower(F.col("text")))).alias("token")
        )
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "token", "cnt")
    )


# PII patterns shared with the oracle SQL (RE2-safe: no lookaround).
PII_EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_CPR_RE = r"\d{6}-\d{4}"
PII_PHONE_RE = r"\+45 \d{2} \d{2} \d{2} \d{2}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, Danish CPR numbers, and +45 phone numbers from a
    text column, reporting per-row redaction counts by type. Order
    matters and is fixed: CPR before phone (a CPR digit block must not
    be half-eaten by the phone pattern), emails first (usernames may
    contain digit runs).

    Narrow and codegen'd — three regexp_replace + three
    regexp_extract_all sizes per row, no shuffle at all; at 100 TB this
    is free map work on the ingest pass.
    """
    c = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0)))
    n_cpr = F.size(F.regexp_extract_all(c, F.lit(PII_CPR_RE), F.lit(0)))
    n_phone = F.size(F.regexp_extract_all(c, F.lit(PII_PHONE_RE), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, PII_EMAIL_RE, "[EMAIL]"),
            PII_CPR_RE,
            "[CPR]",
        ),
        PII_PHONE_RE,
        "[PHONE]",
    )
    return df.withColumns(
        {
            "n_email": n_email,
            "n_cpr": n_cpr,
            "n_phone": n_phone,
            "scrubbed": scrubbed,
        }
    )


def unigram_surprisal(
    documents: DataFrame, text_col: str = "text", hot_cut: int = 5000
) -> DataFrame:
    """Per-document unigram-LM surprisal: average -log p(token) under the
    corpus's own unigram distribution — the classic cheap "perplexity"
    quality score a pretraining pipeline runs before any model-based
    filter (low surprisal = boilerplate/stopword soup, very high =
    garbage/linebreak noise).

    Engine-exact by construction: each token's ln(count) is rounded once
    to integer micro-nats (BIGINT), so the per-document accumulation is
    an exact integer sum — no float-summation-order dependence anywhere.
    The only doubles are one final division + round per doc.

    Scale shape: vocab is one map-side-combinable groupBy. The
    token→frequency join is the skew trap (every "the" row hashes to ONE
    partition), so the vocab is split at ``hot_cut``: the head (bounded
    by N/hot_cut entries — tiny by Zipf) is broadcast and joined
    map-side, the cold tail equi-joins with near-uniform key spread.
    100 TB: vocab head stays a few thousand rows regardless of corpus
    size; the tail join shards by token hash with no hot keys left. The
    token stream is produced twice (once per path) — a deliberate trade:
    two narrow, column-pruned scans cost far less than one shuffle
    stalled on a partition holding every "the" in the corpus. The VOCAB,
    however, is pinned (one-slot cache, evicted on a new input): it is
    bounded by the distinct-token count — far smaller than the corpus at
    any scale — and without the persist Catalyst planned the tokenize +
    full aggregate THREE times (hot, cold, and total each rebuilt it;
    measured 10 parquet scans / 0 reused exchanges in the r5 plan,
    the likely source of the r5 bench regression flagged in VERDICT #2).
    """
    from .dedup import _ensure_parallel, one_slot_cached

    # the tokenize explode is produced twice map-side (hot and cold
    # paths) and must not be bound to a narrow input partitioning
    tok = _ensure_parallel(documents).select(
        "doc_id", F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    )
    vocab = one_slot_cached(
        f"unigram_vocab:{text_col}",
        documents,
        lambda: tok.groupBy("token").agg(F.count("*").alias("c")),
    )
    ln_micro = F.round(F.log(F.col("c")) * 1e6).cast("bigint").alias("lnc")
    hot = F.broadcast(vocab.where(F.col("c") >= hot_cut).select("token", ln_micro))
    cold = vocab.where(F.col("c") < hot_cut).select("token", ln_micro)
    total = F.broadcast(
        vocab.agg(
            F.round(F.log(F.sum("c")) * 1e6).cast("bigint").alias("ln_n")
        )
    )
    scored = tok.join(hot, "token").unionByName(tok.join(cold, "token"))
    return (
        scored.groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"), F.sum("lnc").alias("__sum_lnc"))
        .crossJoin(total)
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") * F.col("ln_n") - F.col("__sum_lnc"))
            .cast("bigint")
            .alias("surprisal_micro"),
            F.round(
                (F.col("n_tokens") * F.col("ln_n") - F.col("__sum_lnc"))
                / F.col("n_tokens")
                / 1e6,
                4,
            ).alias("avg_neg_logp"),
        )
    )


def token_pmi_pairs(
    documents: DataFrame,
    df_cap: int = 150,
    min_df: int = 3,
    min_pair: int = 3,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` within-document token co-occurrences by pointwise
    mutual information: PMI(a,b) = ln(c_ab · N / (df_a · df_b)) over
    distinct-token document sets — the collocation detector every
    corpus analysis runs (strongly-associated pairs surface compound
    terms and boilerplate).

    Scale shape: the pair self-join is the quadratic danger, so the
    same df-cap discipline as the n-gram join applies BEFORE it —
    tokens outside [min_df, df_cap] never enter the join. Stopword-band
    tokens (df > cap) would each contribute O(df²) pairs for pure
    noise (their PMI ≈ 0 by construction); singletons can't co-occur
    meaningfully. What remains is a doc_id equi-join whose per-doc
    fan-out is bounded by the kept-tokens-per-doc choose 2, then one
    map-side-combinable pair count and a TakeOrdered head — no full
    sort, no uncapped blowup. The ranking key is the ROUNDED pmi (ties
    broken by the pair), so cross-engine float ulps can't flip the
    order."""
    tok = documents.select(
        "doc_id",
        F.explode(
            F.array_distinct(tokens(F.lower(F.col("text"))))
        ).alias("token"),
    )
    dfreq = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df").between(min_df, df_cap))
    )
    kept = tok.join(dfreq, "token")
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    a = kept.select(
        "doc_id", F.col("token").alias("ta"), F.col("df").alias("dfa")
    )
    b = kept.select(
        "doc_id", F.col("token").alias("tb"), F.col("df").alias("dfb")
    )
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb", "dfa", "dfb")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= min_pair)
    )
    scored = pairs.crossJoin(F.broadcast(n_docs)).select(
        "ta",
        "tb",
        F.col("c_ab").cast("bigint").alias("c_ab"),
        F.round(
            F.log(
                F.col("c_ab")
                * F.col("n_docs")
                / (F.col("dfa") * F.col("dfb"))
            ),
            6,
        ).alias("pmi"),
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("ta"), F.asc("tb"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "ta", "tb", "c_ab", "pmi")
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 2,
    min_pair_support: int = 2,
) -> DataFrame:
    """Pairwise association rules (support / confidence / lift) over
    ``(basket, item)`` transactions — the market-basket sibling of
    ``token_pmi_pairs``: one rule row per ORDERED pair (a -> b) with
    pair support >= ``min_pair_support``.

    Shuffle-lean shape: baskets are packed once into per-basket
    distinct item ARRAYS (collect_set — one shuffle, dedup included),
    item supports come from exploding the packed arrays (second
    shuffle, already distinct), and candidate pairs are generated
    MAP-SIDE from each array (nested transform + flatten — bounded by
    basket size squared, never corpus-quadratic) feeding one
    map-side-combinable pair count (third shuffle). No per-basket
    self-join.

    Apriori pruning where it matters at scale: items below
    ``min_item_support`` are intersected OUT of the packed arrays
    before pair generation (an infrequent item cannot participate in a
    frequent pair — the anti-monotone property). The frequent-item set
    is a one-row broadcast array, so the prune is fully distributed
    with no driver-side collect. Confidence and lift are double
    divisions of exact BIGINT counts (identical operands -> identical
    IEEE results on both engines), rounded on emission only.
    """
    from .dedup import one_slot_cached

    arr = one_slot_cached(
        f"assoc_rules:{basket_col}:{item_col}",
        baskets,
        lambda: baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("item")
        )
        .groupBy("b")
        .agg(F.collect_set("item").alias("items")),
    )
    # corpus-level constant as a lazy one-row broadcast (never a
    # driver-side count): stapled onto the rule rows at the end
    nb = arr.agg(F.count(F.lit(1)).alias("n_baskets"))
    isup = (
        arr.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    fset = isup.where(F.col("n_item") >= min_item_support).agg(
        F.collect_set("item").alias("fset")
    )
    pair = (
        arr.crossJoin(F.broadcast(fset))
        .select(F.array_intersect("items", "fset").alias("fi"))
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            "fi",
                            lambda a: F.transform(
                                F.col("fi"),
                                lambda b: F.struct(
                                    a.alias("item_a"), b.alias("item_b")
                                ),
                            ),
                        )
                    ),
                    lambda p: p["item_a"] != p["item_b"],
                )
            ).alias("p")
        )
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_support)
    )
    sa = F.broadcast(
        isup.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    )
    sb = F.broadcast(
        isup.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    )
    return (
        pair.join(sa, "item_a")
        .join(sb, "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(F.col("n_ab") / F.col("n_baskets"), 6).alias("support"),
            F.round(F.col("n_ab") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                (F.col("n_ab") * F.col("n_baskets"))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


def _span_tokens(documents: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, toks) with the input spread first (_ensure_parallel) —
    the shared tokenized base of the span localization/cut pair."""
    from .dedup import _ensure_parallel

    return _ensure_parallel(documents).select(
        "doc_id", tokens(F.col(text_col)).alias("toks")
    )


def _dup_span_intervals(toks: DataFrame, n: int, min_count: int) -> DataFrame:
    """(doc_id, n_tokens, span_s, span_e): per-doc maximal merged
    intervals of corpus-duplicated n-gram occurrences [s, s+n-1]
    (1-based, inclusive; overlapping/touching occurrences merge) —
    the gaps-and-islands core shared by `duplicated_spans` (report)
    and `cut_duplicated_spans` (act). Intervals within a doc are
    disjoint by construction, so downstream token-coverage sums are
    exact union sizes."""
    from .dedup import one_slot_cached

    def build_grams():
        return toks.select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            F.posexplode(word_ngrams_from_tokens(F.col("toks"), n)).alias(
                "start0", "gram"
            ),
        ).select(
            "doc_id",
            "n_tokens",
            (F.col("start0") + 1).alias("s"),
            (F.col("start0") + n).alias("e"),
            "gram",
        )

    # PIN the gram stream: it feeds BOTH the >=min_count frequency
    # aggregate and the semi-join's probe side — unpinned, each
    # consumer re-ran the whole upstream (scan → filters → windows →
    # tokenize → n-gram explode) from the source (guide §5
    # persist-when-reused; stage evidence in plans/r13). Identity-keyed
    # one-slot cache, so nothing crosses queries.
    grams = one_slot_cached(
        f"dupspan_grams:{n}:{min_count}", toks, build_grams
    )
    hot = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_count)
        .select("gram")
    )
    dup = grams.join(hot, "gram", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_end = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = dup.select(
        "doc_id",
        "n_tokens",
        "s",
        "e",
        F.when(
            prev_max_end.isNull() | (F.col("s") > prev_max_end + 1), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    islands = marked.withColumn(
        "isl", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy("doc_id", "isl").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.min("s").alias("span_s"),
        F.max("e").alias("span_e"),
    )


def duplicated_spans(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Exact duplicated-passage LOCALIZATION: per document, the maximal
    token intervals formed as the UNION of all corpus-duplicated n-gram
    occurrences (every token in a span is covered by at least one
    n-gram occurring ``min_count``+ times; overlapping and touching
    occurrences merge, so an interior n-gram that straddles a junction
    may itself be rarer — ADVICE r6 nailed the distinction, and the
    union semantics is the right one here because the span's USE is
    cutting covered tokens, see ``cut_duplicated_spans``) — the
    distributed core of exact-substring training-data dedup (find the
    repeated passages, then cut or downweight them), the span-level
    complement of the doc-level near-dup queries (which docs) and
    ngram_novelty (how much).

    Output: one row per document owning at least one duplicated span —
    (doc_id, n_spans, dup_tokens, n_tokens, dup_ratio), with dup_tokens
    the union size of the spans (each span counts its tokens once even
    where source n-grams overlap).

    Plan: tokenize once per doc; enumerate (start, gram) pairs map-side
    (the per-doc n-gram explode — spread first, it multiplies rows by
    document length); one map-side-combinable gram-frequency aggregate;
    an equi-join of the gram stream against the >=min_count gram keys
    (semi-join — only the hot grams' keys travel); then a per-document
    gaps-and-islands merge (window partitioned BY DOC — never a global
    sort) folds overlapping/adjacent duplicated n-grams [s, s+n-1] into
    maximal intervals. Everything shuffles on gram or doc_id keys;
    counts and span bounds are integers, so the output is engine-exact
    (the one double, dup_ratio, is a single division rounded on
    emission)."""
    toks = _span_tokens(documents, text_col)
    spans = _dup_span_intervals(toks, n, min_count)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.col("span_e") - F.col("span_s") + 1)
            .cast("bigint")
            .alias("dup_tokens"),
            F.first("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("dup_tokens") * 1.0 / F.col("n_tokens"), 6),
        )
    )


def cut_duplicated_spans(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """APPLY the duplicated-span cut: emit the cleaned corpus with every
    token covered by a corpus-duplicated n-gram removed — the step a
    training-data pipeline runs after `duplicated_spans` localizes the
    repeats (VERDICT r6 #3; reference precedent: detection always feeds
    an action in the filter→write chain, scraper.py:181-267).

    Output: one row per INPUT document — (doc_id, clean_text, n_tokens,
    n_cut_tokens). ``clean_text`` is the surviving tokens joined by a
    single space (whitespace-normalized, same as the token stream every
    downstream op consumes); docs with nothing duplicated pass through
    with n_cut_tokens = 0, docs that are entirely boilerplate emit
    clean_text = ''.

    Plan: the span intervals come from the shared gaps-and-islands core
    (`_dup_span_intervals` — gram enumeration spread map-side, one
    map-side-combinable gram-frequency aggregate, a semi-join against
    hot gram keys, per-doc windows). The CUT itself adds ONE extra
    shuffle: spans collect to an array per doc (disjoint intervals,
    typically a handful) and a single equi-join on doc_id brings them
    to the token arrays; masking is a pure array expression
    (transform + filter + exists — no explode of the token stream, no
    UDF), so token data never shuffles at all. At 100 TB the join is
    doc_id-keyed and the span side is tiny relative to the text side."""
    from .dedup import one_slot_cached

    # PIN the tokenized base: the span-interval core and the cut join
    # both read it — unpinned, the whole upstream (which in the e2e
    # chain includes the quality gates and the dedup window) executed
    # once per consumer. Identity-keyed, never crosses queries.
    toks = one_slot_cached(
        f"cutspan_toks:{text_col}",
        documents,
        lambda: _span_tokens(documents, text_col).select(
            "doc_id", "toks", F.size("toks").alias("n_tokens")
        ),
    )
    span_arr = (
        _dup_span_intervals(toks.select("doc_id", "toks"), n, min_count)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_s", "span_e")).alias("spans")
        )
    )
    joined = toks.join(span_arr, "doc_id", "left")
    # 1-based token positions; keep tokens outside every span interval
    pos_toks = F.transform(
        F.col("toks"),
        lambda t, i: F.struct(t.alias("tok"), (i + 1).alias("p")),
    )
    kept = F.filter(
        pos_toks,
        lambda x: ~F.exists(
            F.col("spans"),
            lambda sp: (x["p"] >= sp["span_s"]) & (x["p"] <= sp["span_e"]),
        ),
    )
    no_spans = F.col("spans").isNull()
    clean_toks = F.when(no_spans, F.col("toks")).otherwise(
        F.transform(kept, lambda x: x["tok"])
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", clean_toks).alias("clean_text"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("n_tokens") - F.size(clean_toks))
        .cast("bigint")
        .alias("n_cut_tokens"),
    )


def chunk_dedup_keep_first(
    documents: DataFrame,
    text_col: str = "text",
    chunk: int = 8,
) -> DataFrame:
    """C4-style chunk-aligned exact dedup with KEEP-FIRST semantics:
    split each document's token stream into aligned ``chunk``-token
    windows (the trailing partial chunk included), keep the globally
    FIRST occurrence of every distinct chunk (first = smallest
    (doc_id, chunk_idx)), and remove every later verbatim repeat —
    the rule C4 applies at three-sentence granularity (Raffel et al.
    2020 §2.2). This is the keep-one complement of
    ``cut_duplicated_spans``, which removes ALL occurrences of a
    duplicated passage: keep-first preserves exactly one copy of
    boilerplate the corpus should still contain once.

    Output: one row per input document — (doc_id, clean_text,
    n_chunks, n_removed_chunks); untouched docs pass through with
    n_removed_chunks = 0, a doc whose every chunk appeared earlier
    emits clean_text = ''.

    Plan: chunking is a pure array expression per row (slice over the
    token array — no token-stream explode); the chunk stream explodes
    one row per chunk (rows multiply by ~len/chunk, so the input is
    spread first), and the ONE content-keyed shuffle is the
    first-occurrence window partitioned by the chunk string. The
    keep/remove verdict travels back as a per-doc removed-index array
    over a doc_id equi-join; masking is array expressions, so the
    text column itself never shuffles. Occurrence order is encoded as
    doc_id * 1_000_000 + chunk_idx (exact while docs stay under 1e6
    chunks; BIGINT-safe to 9e12 docs) so both engines compare one
    integer instead of a struct. At 100 TB the chunk key would be a
    128-bit content hash so only (hash, key) pairs shuffle — kept as
    the raw string here for engine-exact grouping.
    """
    toks = _span_tokens(documents, text_col)
    m = F.size("toks")
    n_chunks = F.floor((m + F.lit(chunk - 1)) / F.lit(chunk)).cast("int")
    chunk_arr = F.when(
        m > 0,
        F.transform(
            F.sequence(F.lit(1), n_chunks),
            lambda i: F.concat_ws(
                " ", F.slice("toks", (i - 1) * chunk + 1, chunk)
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    # PIN the chunk array (see cdc_chunk_arrays): the posexplode below
    # otherwise infers size/isnotnull filters that inline this whole
    # slice-per-chunk expression below the spread exchange (serial scan
    # stage) and re-evaluate it above.
    from ..functions.expr import pin_columns

    base = pin_columns(toks, {"chunks": chunk_arr}, keep=["doc_id"])
    occ = base.select(
        "doc_id", F.posexplode("chunks").alias("ci", "chunk")
    ).withColumn("k", F.col("doc_id") * 1_000_000 + F.col("ci"))
    first_k = F.min("k").over(Window.partitionBy("chunk"))
    removed = (
        occ.withColumn("fk", first_k)
        .where(F.col("k") != F.col("fk"))
        .groupBy("doc_id")
        .agg(F.collect_list("ci").alias("rm"))
    )
    joined = base.join(removed, "doc_id", "left")
    kept = F.when(F.col("rm").isNull(), F.col("chunks")).otherwise(
        F.transform(
            F.filter(
                F.transform(
                    F.col("chunks"),
                    lambda c, i: F.struct(c.alias("c"), i.alias("i")),
                ),
                lambda x: ~F.array_contains(F.col("rm"), x["i"]),
            ),
            lambda x: x["c"],
        )
    )
    return joined.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("chunks").cast("bigint").alias("n_chunks"),
        F.coalesce(F.size("rm"), F.lit(0))
        .cast("bigint")
        .alias("n_removed_chunks"),
    )


def bpe_merge_candidates(
    documents: DataFrame, text_col: str = "text", k: int = 20
) -> DataFrame:
    """One distributed BPE learning step (Sennrich et al. 2016): the
    ranked table of byte-pair merge candidates — corpus-weighted
    adjacent character-pair counts over the word vocabulary, the
    argmax of which IS the next merge a BPE tokenizer trainer applies.
    Output: top-``k`` rows (rank, left_sym, right_sym, pair_cnt,
    n_words), rank totally ordered (count desc, then pair asc) so
    ties cannot flip between engines; pair_cnt counts every adjacent
    position (overlapping repeats like "aaa" contribute twice, the
    standard convention), n_words = distinct vocab words containing
    the pair.

    Scale shape: the expensive part of BPE training is exactly this
    aggregate, and it distributes the right way — the token explode
    collapses to a word-frequency vocab FIRST (map-side combinable;
    vocab ≪ corpus), pairs then enumerate over the vocab only (rows ~
    vocab size × word length), and the pair aggregate is combinable
    again. The top-k is a window over the pair table, whose size is
    bounded by the alphabet squared — never corpus-sized. Applying
    the chosen merge is a per-word array rewrite (map-only); the
    iteration loop re-runs this aggregate per merge with the standard
    frequency-delta optimization at production scale.
    """
    vocab = (
        _span_tokens(documents, text_col)
        .select(F.explode("toks").alias("w"))
        .select(F.lower("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        vocab.where(F.length("word") >= 2)
        .select(
            "word",
            "freq",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.struct(
                        F.col("word").substr(i, F.lit(1)).alias("l"),
                        F.col("word").substr(i + 1, F.lit(1)).alias("r"),
                    ),
                )
            ).alias("p"),
        )
        .select("word", "freq", "p.l", "p.r")
    )
    agg = pairs.groupBy("l", "r").agg(
        F.sum("freq").cast("bigint").alias("pair_cnt"),
        F.countDistinct("word").cast("bigint").alias("n_words"),
    )
    w = Window.orderBy(F.desc("pair_cnt"), F.asc("l"), F.asc("r"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "rank",
            F.col("l").alias("left_sym"),
            F.col("r").alias("right_sym"),
            "pair_cnt",
            "n_words",
        )
    )


def bpe_learn_apply(
    documents: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    k_words: int = 15,
) -> DataFrame:
    """Greedy BPE trained AND applied (Sennrich et al. 2016, the full
    loop ``bpe_merge_candidates`` takes one step of): ``merges``
    sequential merge rounds, each recounting adjacent symbol-pair
    frequencies on the CURRENT segmentation (true BPE — the 2nd merge
    sees the 1st merge's output symbols), then the final segmentation
    of the ``k_words`` most frequent words. Output: (word, freq,
    segmented) with symbols space-joined, ordered (freq desc, word).

    The word representation is ``'|s1||s2||...||sk|'`` — DOUBLE
    separators between symbols, single at the ends — and applying a
    merge (l, r) is ONE literal string replace of ``'|l||r|'`` with
    ``'|lr|'``. The doubling matters: with single separators,
    back-to-back merges share their boundary character, so the
    non-overlapping replace scan skips every second merge in a run
    (``a a a a`` → ``aa a a``, not BPE's greedy ``aa aa``). With
    doubled separators each pair owns a full boundary on both sides:
    a match consumes at most the second '|' of a double (leaving the
    first with the preceding symbol) and at most the first '|' of the
    following double — the separator structure reconstitutes exactly,
    and both engines' left-to-right non-overlapping replace IS BPE's
    greedy within-word merge order (a merged symbol can never equal
    l or r of the same round, so one pass per round is complete).
    Words containing the '|' sentinel are excluded from the vocab
    (documented data contract; none exist in whitespace-tokenized
    text here).

    Scale shape: everything runs over the word-frequency VOCAB (≪
    corpus — the token explode collapses first and the vocab is
    cached once), each round is one combinable pair aggregate plus a
    1-row argmax broadcast back via crossJoin (the kmeans_step
    pattern — no driver collect), and the merge application is a
    map-side string expression. ``merges`` is a small constant (real
    trainers run tens of thousands of rounds with frequency-delta
    updates; the per-round DATA PASS is what distributes, and it is
    this one)."""
    from .dedup import one_slot_cached

    base = (
        _span_tokens(documents, text_col)
        .select(F.explode("toks").alias("w"))
        .select(F.lower("w").alias("word"))
        .where(~F.col("word").contains("|"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = one_slot_cached(f"bpe_vocab:{text_col}", documents, lambda: base)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    v = vocab.select(
        "word",
        "freq",
        F.concat(F.lit("|"), F.concat_ws("||", chars), F.lit("|")).alias(
            "repr"
        ),
    )
    for _ in range(merges):
        syms = F.split(
            F.col("repr").substr(F.lit(2), F.length("repr") - 2), r"\|\|"
        )

        def _pairs(s: Column) -> Column:
            return F.when(
                F.size(s) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(s) - 1),
                    lambda i: F.struct(
                        F.element_at(s, i).alias("l"),
                        F.element_at(s, i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.expr("CAST(array() AS array<struct<l:string,r:string>>)"))

        best = (
            v.select("freq", F.explode(let(syms, _pairs)).alias("p"))
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .select(F.col("l").alias("ml"), F.col("r").alias("mr"))
        )
        v = v.crossJoin(F.broadcast(best)).select(
            "word",
            "freq",
            F.replace(
                F.col("repr"),
                F.concat(F.lit("|"), "ml", F.lit("||"), "mr", F.lit("|")),
                F.concat(F.lit("|"), "ml", "mr", F.lit("|")),
            ).alias("repr"),
        )
    # '||' -> ' ' empties every interior separator; the two remaining
    # single '|' are the word ends
    segmented = F.replace(
        F.replace(F.col("repr"), F.lit("||"), F.lit(" ")),
        F.lit("|"),
        F.lit(""),
    )
    return (
        v.orderBy(F.desc("freq"), F.asc("word"))
        .limit(k_words)
        .select(
            "word",
            F.col("freq").cast("bigint").alias("freq"),
            segmented.alias("segmented"),
        )
    )


def word_ngrams_from_tokens(toks: Column, n: int) -> Column:
    """`word_ngrams` over an already-tokenized array column (0-based
    positions come from the caller's posexplode)."""
    m = F.size(toks)
    return F.when(
        m >= n,
        F.transform(
            F.sequence(F.lit(1), m - (n - 1)),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i, n)
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def vocab_oov_audit(
    documents: DataFrame,
    vocab_size: int = 500,
    holdout_pct: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-coverage audit: learn a top-``vocab_size`` word vocab
    from the deterministic train split and measure the out-of-vocab
    rate per language on the held-out split — the readout that decides
    whether a vocab is big enough BEFORE committing to a tokenization
    of a 100 TB corpus (the measurement sibling of `bpe_learn_apply`:
    that op builds subword units; this op says how far whole-word
    units get).

    Split: md5-hash split on doc_id (`sampling.sample_hash`), hash <
    ``holdout_pct`` → held-out, rest → train, so both engines cut the
    identical corpus. Vocab: top-``vocab_size`` train tokens by
    (count DESC, token ASC) — boundary ties pinned by the token
    tiebreak. OOV: held-out token stream left-joined to the vocab on
    the token key; per-lang totals are combinable counts.

    Scale shape: the vocab aggregate is map-side-combinable and its
    result is ``vocab_size`` rows — broadcast back onto the held-out
    token stream, so the membership probe is shuffle-free (at real
    scale the same broadcast carries a bloom filter first; the exact
    join here IS the semantics). Output: one row per held-out lang,
    (lang, n_tokens, n_oov, oov_rate).
    """
    from .sampling import sample_hash

    toks = tokens(F.col(text_col))
    split = documents.withColumn(
        "__h", sample_hash(F.col("doc_id").cast("string"))
    )
    train_toks = (
        split.where(F.col("__h") >= holdout_pct)
        .select(F.explode(toks).alias("token"))
    )
    vocab = (
        train_toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token")
    )
    held = (
        split.where(F.col("__h") < holdout_pct)
        .select("lang", F.explode(toks).alias("token"))
    )
    return (
        held.join(
            F.broadcast(vocab.withColumn("__in", F.lit(1))), "token", "left"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .select(
            "lang",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
        .orderBy("lang")
    )


def dsir_select(
    documents: DataFrame,
    target_pred: Column,
    n_buckets: int = 64,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling (Xie et al. 2023,
    DSIR) over hashed unigram buckets: fit two bag-of-hashed-ngrams
    unigram models — one on the TARGET slice (the distribution you
    want more of, e.g. a high-quality domain), one on the remaining
    RAW pool — and rank every raw document by its log importance
    weight  sum_t [ log p_target(bucket(t)) - log p_raw(bucket(t)) ],
    keeping the ``top_n``. This is the published scale recipe for
    "find me more documents like THESE" selection: the feature space
    is a fixed ``n_buckets``-bucket hash, so both models are one
    combinable count aggregate each, regardless of corpus size.

    Exactness discipline (the `q_naive_bayes` integer-log-micro
    pattern): per-bucket weights are floor(1e6 · ln(ratio)) BIGINTs
    computed ONCE on the ``n_buckets``-row model table from exact
    integer counts (Laplace-smoothed), then per-doc scores are plain
    integer sums — order/partition-independent, so the top-``top_n``
    cut is pinned by (score DESC, doc_id ASC) in both engines.

    Scale shape: one token-explode pass feeds both model counts (a
    conditional aggregate over ``n_buckets`` keys); the weight table
    is ``n_buckets`` rows — broadcast back onto the raw token stream;
    the per-doc sum is map-side-combinable on doc_id. No all-pairs
    anything; the only corpus-sized shuffle is the per-doc groupBy.
    Output: (doc_id, score_micro, n_tokens) for the selected docs.
    """
    from ..functions.strings import md5_bigint

    toks = documents.select(
        "doc_id",
        # NULL predicate rows mean "not target" (they stay in the raw
        # pool) — matches the oracle's CASE ... ELSE 0 semantics; a
        # bare cast would NULL-propagate and silently drop the doc's
        # tokens from BOTH models and the raw scoring.
        F.coalesce(target_pred.cast("int"), F.lit(0)).alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    ).withColumn(
        "bucket", F.pmod(md5_bigint(F.col("token")), F.lit(n_buckets))
    )
    # ONE token pass: reduce the token stream to the per-(doc, bucket)
    # histogram first (map-side combinable, <= n_buckets rows per doc)
    # and pin it — both the model counts and the raw scoring below are
    # integer rollups of this frame, so the tokenize+explode never
    # re-runs (previously each consumer re-scanned: 2 full passes).
    from .dedup import one_slot_cached

    # The slot key must carry target_pred: the cached hist bakes __tgt
    # in, so two calls on the SAME frame object with different
    # predicates are different computations (ADVICE r12: omitting it
    # silently returned the first predicate's selection).
    hist = one_slot_cached(
        f"dsir_hist:{n_buckets}:{text_col}:{target_pred}",
        documents,
        lambda: toks.groupBy("doc_id", "__tgt", "bucket").agg(
            F.count(F.lit(1)).alias("n")
        ),
    )
    counts = hist.groupBy("bucket").agg(
        F.sum(F.col("n") * F.col("__tgt")).alias("c_t"),
        F.sum(F.col("n") * (1 - F.col("__tgt"))).alias("c_s"),
    )
    totals = counts.agg(
        F.sum("c_t").alias("tot_t"), F.sum("c_s").alias("tot_s")
    )
    b = F.lit(n_buckets)
    weights = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                F.lit(1e6)
                * F.log(
                    ((F.col("c_t") + 1) * (F.col("tot_s") + b)).cast("double")
                    / ((F.col("c_s") + 1) * (F.col("tot_t") + b)).cast(
                        "double"
                    )
                )
            )
            .cast("bigint")
            .alias("w_micro"),
        )
    )
    raw_scores = (
        hist.where(F.col("__tgt") == 0)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("w_micro") * F.col("n")).alias("score_micro"),
            F.sum("n").alias("n_tokens"),
        )
    )
    return (
        raw_scores.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(top_n)
        .select(
            "doc_id",
            F.col("score_micro").cast("bigint").alias("score_micro"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
        )
    )


def quality_rules_report(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/Gopher-style quality RULE battery with per-rule drop
    accounting — the audit a rule-based curation gate publishes before
    anyone trusts its kept corpus (the reference's filter→count
    discipline, scraper.py:181-267, applied to text-quality rules
    instead of URL predicates). Rules (all integer/boolean arithmetic —
    zero float-parity exposure):

    - ``min_tokens``   fail if fewer than 5 tokens
    - ``min_chars``    fail if fewer than 20 characters
    - ``long_word``    fail if any token longer than 20 chars (Gopher's
                       mean-word-length guard, in max form)
    - ``repetition``   fail if duplicate-token fraction > 0.6, i.e.
                       5·n_distinct < 2·n_tokens (exact integer test)
    - ``no_stopword``  fail if no EN/DA stopword at all (gibberish
                       guard)
    - ``any_fail``     fail count under OR of all rules (what a gate
                       keyed on this battery would actually drop)

    One pass computes every flag as an array/int expression, one
    combinable aggregate sums them, and the one-row result unpivots to
    (rule, n_fail, fail_rate) — corpus scanned exactly once.
    """
    from ..functions.text import DA_STOPWORDS, EN_STOPWORDS

    toks = tokens(F.lower(F.col(text_col)))
    sw = EN_STOPWORDS + DA_STOPWORDS

    def _flags(w: Column) -> Column:
        n = F.size(w)
        nd = F.size(F.array_distinct(w))
        maxlen = F.aggregate(
            w, F.lit(0), lambda acc, t: F.greatest(acc, F.length(t))
        )
        nstop = F.size(F.filter(w, lambda t: t.isin(*sw)))
        f_min_tokens = (n < 5).cast("int")
        f_min_chars = (F.length(F.col(text_col)) < 20).cast("int")
        f_long_word = (maxlen > 20).cast("int")
        f_rep = (5 * nd < 2 * n).cast("int")
        f_no_stop = (nstop == 0).cast("int")
        return F.struct(
            f_min_tokens.alias("f1"),
            f_min_chars.alias("f2"),
            f_long_word.alias("f3"),
            f_rep.alias("f4"),
            f_no_stop.alias("f5"),
            F.greatest(
                f_min_tokens, f_min_chars, f_long_word, f_rep, f_no_stop
            ).alias("f6"),
        )

    flagged = documents.select(let(toks, _flags).alias("f"))
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("f")[f"f{i}"]).alias(f"s{i}") for i in range(1, 7)],
    )
    names = [
        "min_tokens", "min_chars", "long_word",
        "repetition", "no_stopword", "any_fail",
    ]
    stack = ", ".join(
        f"'{nm}', s{i}" for i, nm in enumerate(names, 1)
    )
    return (
        agg.select(
            F.expr(f"stack({len(names)}, {stack}) AS (rule, n_fail)"),
            F.col("n"),
        )
        .select(
            "rule",
            F.col("n_fail").cast("bigint").alias("n_fail"),
            F.round(F.col("n_fail") / F.col("n"), 6).alias("fail_rate"),
        )
        .orderBy("rule")
    )


# round(-ln(0.4)·1e6): the stupid-backoff penalty as an integer literal
# shared verbatim with the SQL oracle — zero float-parity exposure on λ
_BACKOFF_MICRO = 916291


def bigram_surprisal(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Held-out bigram-LM surprisal with stupid backoff (Brants et al.
    2007 — the published web-scale LM smoothing) — the step up from
    `unigram_surprisal` toward the CCNet-style "perplexity under a
    reference LM" quality filter: train bigram/unigram counts on the
    EVEN doc_ids, score every ODD doc's adjacent token pairs with

        -ln p(w2|w1) = ln c1(w1) - ln c2(w1,w2)        seen bigram
                       ln N - ln c(w2) - ln 0.4        backoff to unigram
                       ln N - ln 0.4                   w2 unseen (c→1/N·λ)

    The train/score split is what makes backoff REAL (a same-corpus LM
    never backs off — every observed bigram has count ≥ 1).

    Engine-exact: every ln(count) is integerized to micro-nats ONCE on
    the model tables; -ln 0.4 is the shared integer literal
    ``_BACKOFF_MICRO``; per-doc accumulation is an exact BIGINT sum.
    Scale shape: pair enumeration is a map-side array transform (no
    positional self-join); ln-scores attach to the MODEL tables
    (bigram-vocab-sized joins), so the corpus-sized pair stream does
    ONE (w1,w2) equi-join — bigram keys are far flatter than unigram
    keys by Zipf — plus the w2 backoff attach under the unigram
    hot-split valve (Zipf head broadcast, cold tail equi-joined flat).
    Docs with < 2 tokens have no bigrams and are absent by definition.
    Output: (doc_id, n_bigrams, n_backoff, surprisal_micro,
    avg_neg_logp)."""
    from .dedup import _ensure_parallel

    toks_arr = _ensure_parallel(documents).select(
        "doc_id", tokens(F.lower(F.col(text_col))).alias("w")
    )
    pairs = toks_arr.where(F.size("w") >= 2).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("w"), i).alias("w1"),
                    F.element_at(F.col("w"), i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    train_pairs = pairs.where(F.col("doc_id") % 2 == 0)
    score_pairs = pairs.where(F.col("doc_id") % 2 == 1)
    train_toks = (
        toks_arr.where(F.col("doc_id") % 2 == 0)
        .select(F.explode("w").alias("token"))
    )

    lnm = lambda c: F.round(F.log(c) * 1e6).cast("bigint")  # noqa: E731
    uni = train_toks.groupBy("token").agg(F.count("*").alias("cu"))
    tot = F.broadcast(uni.agg(lnm(F.sum("cu")).alias("ln_n")))
    # ln-scores attach at MODEL granularity: bigram table joins the
    # unigram table (vocab-sized), never the corpus pair stream
    bg = (
        train_pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .join(uni.select(F.col("token").alias("w1"), F.col("cu").alias("c1")), "w1")
        .select("w1", "w2", (lnm(F.col("c1")) - lnm(F.col("c2"))).alias("bg_micro"))
    )
    # the w2 backoff attach reuses unigram_surprisal's hot-split valve:
    # the Zipf head (few thousand rows at any corpus size) broadcasts —
    # every "the"-as-w2 row resolves map-side — and only cold keys ride
    # the equi-join, so no partition inherits a hot token
    hot_cut = 5000
    hot_back = F.broadcast(
        uni.where(F.col("cu") >= hot_cut).select(
            F.col("token").alias("w2"), lnm(F.col("cu")).alias("ln_hot")
        )
    )
    cold_back = uni.where(F.col("cu") < hot_cut).select(
        F.col("token").alias("w2"), lnm(F.col("cu")).alias("ln_cold")
    )
    scored = (
        score_pairs.join(bg, ["w1", "w2"], "left")
        .join(hot_back, "w2", "left")
        .join(cold_back, "w2", "left")
        .crossJoin(tot)
        .select(
            "doc_id",
            F.coalesce(
                F.col("bg_micro"),
                F.col("ln_n")
                - F.coalesce(F.col("ln_hot"), F.col("ln_cold"))
                + F.lit(_BACKOFF_MICRO),
                F.col("ln_n") + F.lit(_BACKOFF_MICRO),
            ).alias("s_micro"),
            F.col("bg_micro").isNull().cast("int").alias("is_back"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.sum("is_back").cast("bigint").alias("n_backoff"),
            F.sum("s_micro").cast("bigint").alias("surprisal_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_backoff",
            "surprisal_micro",
            F.round(
                F.col("surprisal_micro") / F.col("n_bigrams") / 1e6, 4
            ).alias("avg_neg_logp"),
        )
        .orderBy("doc_id")
    )


CDC_DIVISOR = 16  # average chunk length in tokens (boundary prob 1/16)


def cdc_chunk_arrays(
    documents: DataFrame, text_col: str = "text", divisor: int = CDC_DIVISOR
) -> DataFrame:
    """(doc_id, source, chunks): content-defined chunking of each
    document's token stream — a token ENDS a chunk iff
    md5_bigint(token) % divisor == 0 (plus the forced final boundary),
    so boundaries depend only on LOCAL content, never on absolute
    position. That is the CDC property (Muthitacharoen et al. 2001 LBFS;
    FastCDC 2016): inserting or deleting tokens re-chunks only up to the
    next surviving boundary, where fixed-width chunking shifts every
    later chunk — the property that makes chunk-level dedup robust to
    edits. Expected chunk length = divisor tokens; no min/max clamp
    (the clamp is a constant-factor tweak that would make boundaries
    position-dependent again at the clamp edges).

    Pure array expressions per row (hash, filter, slice) — no explode,
    no shuffle; the downstream dedup pays the only shuffle."""
    from .dedup import _ensure_parallel

    base = _ensure_parallel(documents).select(
        "doc_id", "source", tokens(F.col(text_col)).alias("toks")
    )
    n = F.size("toks")
    bpos = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(F.md5(F.element_at(F.col("toks"), i)), 1, 8), 16, 10
        ).cast("bigint")
        % divisor
        == 0,
    )
    # forced final boundary; appended only when the last token is not
    # already one (explicit conditional, not array_distinct — DuckDB's
    # list_distinct does not guarantee order, so both engines take the
    # same branch). bpos/ends are let-bound: each evaluates once per row.
    chunks = let(
        bpos,
        lambda bp: let(
            F.when(F.try_element_at(bp, F.lit(-1)) == n, bp).otherwise(
                F.concat(bp, F.array(n))
            ),
            lambda ends: F.transform(
                ends,
                lambda e, idx: F.concat_ws(
                    " ",
                    F.slice(
                        F.col("toks"),
                        F.when(idx == 0, F.lit(1)).otherwise(
                            F.element_at(ends, idx) + 1
                        ),
                        e
                        - F.when(idx == 0, F.lit(0)).otherwise(
                            F.element_at(ends, idx)
                        ),
                    ),
                ),
            ),
        ),
    )
    # PIN the chunk expression (functions.expr.pin_columns): downstream
    # explodes infer `size(chunks) > 0 AND isnotnull(chunks)` and the
    # optimizer would inline this whole md5-per-token expression into a
    # filter pushed below the spread exchange — evaluated serially in
    # the narrow scan stage and then again up here (the r8
    # generator-pushdown gotcha; measured 7.1 s -> sub-second on
    # q_cdc_dedup at sf0.1, OPTIMIZATION_r12.md).
    from ..functions.expr import pin_columns

    return pin_columns(
        base.where(n > 0), {"chunks": chunks}, keep=["doc_id", "source"]
    )


def cdc_dedup_stats(
    documents: DataFrame, text_col: str = "text", divisor: int = CDC_DIVISOR
) -> DataFrame:
    """Per-source content-addressable-store accounting over CDC chunks:
    how much would chunk-level dedup save? Output one row per source —
    (source, n_chunks, n_distinct, bytes_total, bytes_distinct,
    dedup_ratio) where dedup_ratio = 1 - bytes_distinct/bytes_total.

    Plan: chunk arrays are narrow per-row expressions; the explode
    multiplies rows ~len/divisor (input spread first via the shared
    tokenized base), then ONE map-side-combinable aggregate keyed on
    (source, chunk) followed by a per-source rollup — chunk keys shard
    uniformly (content hash), so no skew. At 100 TB the chunk string
    would be replaced by its 128-bit hash before the shuffle (only
    (hash, nbytes) pairs move); kept raw here for engine-exact
    grouping."""
    occ = cdc_chunk_arrays(documents, text_col, divisor).select(
        "source", F.explode("chunks").alias("chunk")
    )
    per_chunk = occ.groupBy("source", "chunk").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    b = F.length("chunk").cast("bigint")
    return (
        per_chunk.groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_chunks"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.sum(F.col("cnt") * b).cast("bigint").alias("bytes_total"),
            F.sum(b).cast("bigint").alias("bytes_distinct"),
        )
        .withColumn(
            "dedup_ratio",
            F.round(1.0 - F.col("bytes_distinct") / F.col("bytes_total"), 6),
        )
    )


def surprisal_gate(
    documents: DataFrame,
    lo: float = 0.1,
    hi: float = 0.9,
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity band filter APPLIED (Wenzek et al. 2020
    keep the middle of the reference-LM perplexity distribution): rank
    each document's unigram surprisal WITHIN ITS SOURCE (sources have
    different score distributions — the same per-source discipline as
    the quality gate), drop the boilerplate tail (lowest ``lo`` percent
    rank) and the garbage tail (highest ``1-hi``), keep the band.
    Output one row per source: (source, n_docs, n_kept, n_drop_low,
    n_drop_high) — all-integer accounting of the cut.

    Engine-exact: surprisal_micro is an exact BIGINT (integer micro-nat
    sums, see unigram_surprisal), percent_rank is one division of
    integers with a doc_id tiebreak, so the band boundary cannot flip
    between engines. Scale: rides unigram_surprisal's hot/cold-split
    plan; the ranking window is PARTITIONED by source; the final
    aggregate is |sources| rows."""
    scores = unigram_surprisal(documents, text_col).select(
        "doc_id", "surprisal_micro"
    )
    j = documents.select("doc_id", "source").join(scores, "doc_id")
    w = Window.partitionBy("source").orderBy("surprisal_micro", "doc_id")
    pr = F.percent_rank().over(w)
    flagged = j.select(
        "source",
        F.when(pr < lo, "low")
        .when(pr > hi, "high")
        .otherwise("keep")
        .alias("band"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("band") == "keep").cast("int"))
        .cast("bigint")
        .alias("n_kept"),
        F.sum((F.col("band") == "low").cast("int"))
        .cast("bigint")
        .alias("n_drop_low"),
        F.sum((F.col("band") == "high").cast("int"))
        .cast("bigint")
        .alias("n_drop_high"),
    )


def tokenizer_fertility(
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer fertility audit per language: BPE-ish tokens per
    whitespace word (fertility — how many subwords the tokenizer
    spends per word) and characters per BPE token (compression) — the
    standard multi-lingual tokenizer-efficiency readout (a tokenizer
    trained on English typically shows 2-3× the fertility on
    underrepresented scripts, which silently multiplies their training
    cost per byte).

    One combinable aggregate over three per-row integer counts
    (whitespace words, BPE-regex tokens, chars) — exact BIGINT sums,
    two divisions on the per-lang result rows. Output: one row per
    lang (lang, n_docs, n_words, n_bpe_tokens, n_chars, fertility,
    chars_per_token)."""
    from ..functions.text import bpe_token_count, token_count

    t = F.col(text_col)
    return (
        documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(token_count(t).cast("bigint")).alias("n_words"),
            F.sum(bpe_token_count(t).cast("bigint")).alias("n_bpe_tokens"),
            F.sum(F.length(t).cast("bigint")).alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6).alias(
                "fertility"
            ),
            F.round(F.col("n_chars") / F.col("n_bpe_tokens"), 6).alias(
                "chars_per_token"
            ),
        )
        .orderBy("lang")
    )


def corpus_datasheet(
    documents: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-source corpus datasheet (Gebru et al. "Datasheets for
    Datasets" applied to a text corpus): one row per source with the
    numbers every dataset card publishes — volume (docs / tokens /
    chars), language concentration (share of the dominant language),
    exact-duplicate rate (normalized-text fingerprint), and mean
    document length. The one-stop audit table a curation run emits
    next to the corpus itself.

    Scale shape: ONE pass computes per-row counts + fingerprint; the
    dup flag is a fingerprint-partitioned window (same shape as
    dedup_exact); everything then collapses into a per-source
    combinable aggregate plus a tiny per-(source, lang) max for the
    dominant-language share. No joins against corpus-sized sides.
    Output: (source, n_docs, n_tokens, n_chars, n_langs, top_lang,
    top_lang_share, exact_dup_rate, mean_chars)."""
    from ..functions.text import fingerprint, token_count

    t = F.col(text_col)
    wfp = Window.partitionBy(fingerprint(t))
    rows = documents.select(
        "source",
        "lang",
        token_count(t).alias("n_toks"),
        F.length(t).alias("n_ch"),
        (F.row_number().over(wfp.orderBy("doc_id")) > 1)
        .cast("int")
        .alias("is_dup"),
    )
    per_lang = rows.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("lang_n")
    )
    wl = Window.partitionBy("source").orderBy(
        F.col("lang_n").desc(), F.col("lang").asc()
    )
    top = (
        per_lang.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("lang_n").alias("top_n"),
        )
    )
    base = rows.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("n_toks").cast("bigint")).alias("n_tokens"),
        F.sum(F.col("n_ch").cast("bigint")).alias("n_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("is_dup").cast("bigint").alias("n_dups"),
    )
    return (
        base.join(top, "source")
        .select(
            "source",
            "n_docs",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_chars").cast("bigint").alias("n_chars"),
            "n_langs",
            "top_lang",
            F.round(F.col("top_n") / F.col("n_docs"), 6).alias(
                "top_lang_share"
            ),
            F.round(F.col("n_dups") / F.col("n_docs"), 6).alias(
                "exact_dup_rate"
            ),
            F.round(F.col("n_chars") / F.col("n_docs"), 6).alias(
                "mean_chars"
            ),
        )
        .orderBy("source")
    )


def ngram_lang_id(
    documents: DataFrame,
    seed_pred: Column,
    profile_size: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Character-trigram language identification (Cavnar & Trenkle
    1994 profile method, the published upgrade over stopword voting):
    build per-language profiles — the ``profile_size`` most frequent
    character trigrams of the SEED docs (labeled, ``seed_pred``) —
    then classify every non-seed doc by distinct-trigram overlap with
    each profile (argmax, ties on lang ascending; zero overlap
    everywhere → 'unknown'). Emits the confusion table against the
    true labels — the audit that says whether the classifier is good
    enough to gate on.

    All integer: profile cut pinned by (count DESC, trigram ASC),
    scores are distinct-overlap counts. Scale shape: ONE distinct
    (doc, trigram) stream; profiles are |langs|·profile_size rows
    (broadcast); score = one equi-join on trigram + per-(doc, lang)
    count + per-doc argmax window; confusion is a tiny rollup.
    Output: (lang, predicted, n)."""
    from ..functions.expr import let as _let
    from ..functions.text import normalized_text
    from .dedup import _ensure_parallel

    norm = normalized_text(F.col(text_col))
    # raw (non-distinct) trigrams: the classify path's array_intersect
    # dedups by contract, so only the seed/profile branch pays the
    # per-doc array_distinct sort (r10 profiling: the distinct was ~25%
    # of the non-seed scan stage for zero semantic effect)
    tris = F.when(
        F.length(norm) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(norm) - 2),
            lambda i: norm.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array(norm))
    # spread FIRST: the per-row trigram transform multiplies work by
    # text length and the seed explode by ~n_chars rows — bound to a
    # 1-partition parquet read both serialize on one core (the
    # _ensure_parallel pathology, r6)
    base = _ensure_parallel(documents).select(
        "doc_id", "lang", seed_pred.alias("__seed"), tris.alias("tris")
    )
    # explode_OUTER + post-filter, deliberately: a plain explode makes
    # Catalyst infer `size(tris) > 0 AND tris IS NOT NULL` and push the
    # ENTIRE trigram expression below the _ensure_parallel exchange into
    # the 1-task scan stage (measured: 23 s of the 25 s wall at sf0.1);
    # the outer variant generates no inferable child filter, so the
    # heavy transform stays in the spread stage
    seed_tris = (
        base.where(F.col("__seed"))
        .select(
            "lang",
            F.explode_outer(F.array_distinct("tris")).alias("tri"),
        )
        .where(F.col("tri").isNotNull())
    )
    wprof = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("tri").asc()
    )
    profiles = (
        seed_tris.groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(wprof))
        .where(F.col("rn") <= profile_size)
        .select(F.col("lang").alias("p_lang"), "tri")
    )
    # classification is MAP-SIDE: the |langs|x50 profile table collapses
    # to ONE broadcast row of (lang, tris[]) arrays and each test doc
    # scores every profile with an array_intersect — no corpus-sized
    # trigram explode, no shuffle after the (seed-corpus-sized) profile
    # build; the argmax fold keeps (score DESC, lang ASC) semantics
    # including the all-zero -> 'unknown' case
    prof_row = (
        profiles.groupBy("p_lang")
        .agg(F.collect_list("tri").alias("ptris"))
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("p_lang", "ptris"))
            ).alias("profs")
        )
    )
    best = F.aggregate(
        F.col("profs"),
        F.struct(
            F.lit(0).cast("int").alias("score"),
            F.lit("unknown").alias("predicted"),
        ),
        # let-bind the overlap: Catalyst has no CSE inside HOF lambdas,
        # so naming it once halves the array_intersect work per profile
        # (r10 profiling — the intersect was evaluated in both the when
        # condition and the replacement struct)
        lambda acc, pr: _let(
            F.size(F.array_intersect(F.col("tris"), pr["ptris"])).cast(
                "int"
            ),
            lambda sc: F.when(
                sc > acc["score"],
                F.struct(
                    sc.alias("score"),
                    pr["p_lang"].alias("predicted"),
                ),
            ).otherwise(acc),
        ),
    )
    labeled = (
        base.where(~F.col("__seed"))
        .crossJoin(F.broadcast(prof_row))
        .select("doc_id", "lang", best["predicted"].alias("predicted"))
    )
    return (
        labeled.groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("lang", "predicted")
    )


def char_gram_hashes(
    documents: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, p, h1, h2): a 128-bit two-seed xxhash64 key of the
    length-``min_len`` character gram at every 1-based position — the
    shared linear pass behind `substring_dup_spans` and the streaming
    substring ingest. The gram is let-bound (one substring per
    position) and only the two 8-byte hash halves leave the projection
    — substrings never shuffle. The hashes are EQUALITY-ONLY keys
    (gram equal ⟺ key equal up to a ~2^-128 birthday term): no
    consumer ever surfaces h1/h2, so the hash function is a free
    implementation choice — xxhash64 runs in-register per gram where
    the previous two-slice md5 paid a digest + hex encode + two
    conv(hex,16,10) parses per position (measured 1.6× slower at
    sf0.1: 0.93 s vs 0.58 s for the pass + first-occurrence groupBy)."""
    from ..functions.expr import let as _let

    L = int(min_len)
    d = documents.select("doc_id", F.col(text_col).alias("t"))
    hx = _let(
        F.substring(F.col("t"), F.col("p"), L),
        lambda g: F.struct(
            F.xxhash64(g).alias("h1"),
            F.xxhash64(g, F.lit(1)).alias("h2"),
        ),
    )
    return (
        d.select(
            "doc_id",
            "t",
            F.explode(
                F.when(
                    F.length("t") >= L,
                    F.sequence(F.lit(1), F.length("t") - L + 1),
                ).otherwise(F.expr("array()").cast("array<int>"))
            ).alias("p"),
        )
        .select("doc_id", "p", hx.alias("hx"))
        .select("doc_id", "p", F.col("hx.h1").alias("h1"),
                F.col("hx.h2").alias("h2"))
    )


def merged_span_lengths(covered: DataFrame, min_len: int) -> DataFrame:
    """(doc_id, dup_chars): total characters under the interval UNION
    of the covered gram positions (gaps-and-islands per doc — the
    merge step `substring_dup_spans` and the streaming ingest share).
    ``covered`` is (doc_id, p) rows of duplicated gram positions."""
    L = int(min_len)
    spans0 = covered.select(
        "doc_id", F.col("p").alias("s"), (F.col("p") + L - 1).alias("e")
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = spans0.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(prev_max_e, F.col("s") - 2) + 1).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg((F.max("e") - F.min("s") + 1).alias("len"))
        .groupBy("doc_id")
        .agg(F.sum("len").cast("bigint").alias("dup_chars"))
    )


def substring_dup_spans(
    documents: DataFrame,
    min_len: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-substring localization at CHARACTER grain — the
    suffix-array half of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", ExactSubstr): report, per document,
    the maximal character ranges covered by some substring of length
    >= ``min_len`` that occurs at least twice anywhere in the corpus
    (including twice inside one document). Complements the n-gram-grain
    span family (`duplicated_spans` / `cut_duplicated_spans`): those
    match token windows, this matches raw characters — boilerplate,
    licenses, templated headers that tokenize inconsistently.

    Identity: a position range is covered by a repeated substring of
    length >= L iff some length-L window starting inside it is
    duplicated — so the union of duplicated L-gram spans IS the exact
    Lee et al. cover, no suffix array required. The single-node suffix
    array becomes three Spark-native steps:

      1. ONE linear pass emits every char position's L-gram HASH
         map-side — the md5 is let-bound so it computes once per
         position, and only (doc_id, pos, h1, h2) ever shuffles,
         never substrings (the 64-bit two-slice md5 key keeps
         birthday collisions ~2^-64-scale — the `dedup_exact`
         guarantee class);
      2. occurrence counts come from a count window PARTITIONED by
         the hash key over that one shuffle — NOT a groupBy +
         join-back, which would re-scan and re-hash the whole corpus
         a second time (measured 2× at sf0.01) and let Catalyst
         infer join-key isnotnull filters that double-evaluate the
         md5;
      3. the per-doc interval union is the classic gaps-and-islands
         pass under a window PARTITIONED by doc_id (document-sized
         frames).

    Scale: every stage is linear in corpus characters with combinable
    aggregates; the L-gram density constant (one row per char) is the
    honest exactness premium — the sampled/winnowed fingerprint family
    (`winnowing_overlap_pairs`) is the cheap screen when char-exact
    covers aren't required. Output: (doc_id, span_start, span_end)
    1-based inclusive char ranges, merged (overlapping/adjacent spans
    coalesce), ordered."""
    L = int(min_len)
    grams = char_gram_hashes(documents, min_len, text_col)
    wh = Window.partitionBy("h1", "h2")
    covered = (
        grams.withColumn("n_occ", F.count(F.lit(1)).over(wh))
        .where(F.col("n_occ") >= 2)
        .select(
            "doc_id",
            F.col("p").alias("s"),
            (F.col("p") + L - 1).alias("e"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = covered.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(prev_max_e, F.col("s") - 2) + 1).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("s").cast("int").alias("span_start"),
            F.max("e").cast("int").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
        .orderBy("doc_id", "span_start")
    )


def token_keyness(
    documents: DataFrame,
    is_a,
    min_count: int = 5,
    k: int = 40,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` keyness tokens between two sub-corpora (Dunning 1993
    log-likelihood G² — the standard corpus-comparison statistic):
    which tokens are most OVER-represented in corpus A (rows where
    ``is_a``) vs B, the domain-shift / style-drift readout next to
    `kl_divergence_splits` (distribution-level) and `token_pmi_pairs`
    (within-doc association). G² = 2·(a·ln(a/Eₐ) + b·ln(b/E_b)) with
    expectations from the pooled corpus; 0-count terms contribute 0.

    Scale shape: ONE token explode → ONE combinable (token, a, b)
    count aggregate; corpus totals Nₐ/N_b are a 1-row aggregate of the
    UNFILTERED vocab table broadcast onto the ``min_count``-filtered
    vocab — computed before the filter so the G² expectations really
    are drawn from the pooled corpus (ADVICE r9: totals taken after
    the filter silently exclude the long singleton tail, which can be
    a large share of tokens, biasing every score); the head is a
    TakeOrdered on the ROUNDED g2 (ties by token — the token_pmi
    discipline: cross-engine float ulps can't flip a rank on a rounded
    key). ``min_count`` drops the long singleton tail before ranking.
    Output: (token, n_a, n_b, direction, g2) — direction +1 when the
    token leans A (rate_a > rate_b), −1 otherwise."""
    toks = documents.select(
        is_a.cast("int").alias("ia"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum("ia").cast("bigint").alias("a"),
        F.sum(1 - F.col("ia")).cast("bigint").alias("b"),
    )
    totals = counts.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    tot = counts.where(F.col("a") + F.col("b") >= min_count).crossJoin(
        F.broadcast(totals)
    )
    n = F.col("na") + F.col("nb")
    ad = F.col("a").cast("double")
    bd = F.col("b").cast("double")
    # a·ln(a·N / (Nₐ·(a+b))): ln of a ratio of exact integers — the
    # only transcendental, applied to identical operands both engines
    ta = F.when(
        F.col("a") > 0,
        ad * F.log(ad * n / (F.col("na") * (ad + bd))),
    ).otherwise(F.lit(0.0))
    tb = F.when(
        F.col("b") > 0,
        bd * F.log(bd * n / (F.col("nb") * (ad + bd))),
    ).otherwise(F.lit(0.0))
    scored = tot.select(
        "token",
        F.col("a").alias("n_a"),
        F.col("b").alias("n_b"),
        F.when(
            ad * F.col("nb") >= bd * F.col("na"), F.lit(1)
        ).otherwise(F.lit(-1)).alias("direction"),
        F.round(2.0 * (ta + tb), 6).alias("g2"),
    )
    return (
        scored.orderBy(F.col("g2").desc(), F.col("token").asc())
        .limit(k)
        .select("token", "n_a", "n_b", "direction", "g2")
    )


def substring_cut_keep_first(
    documents: DataFrame,
    min_len: int = 25,
    text_col: str = "text",
) -> DataFrame:
    """Char-grain substring dedup APPLIED — the detect→act member of
    the ExactSubstr family (`substring_dup_spans` detects,
    `substring_dedup_ingest` drops whole docs; this CUTS surgically,
    Lee et al. 2022's actual remedy): remove every character covered
    by an L-gram that also occurs in a SMALLER-id document
    (keep-first-by-id — the first document keeps its text, later
    copies lose exactly the shared regions), and emit the cut
    manifest.

    The cut itself is the lag-segment reconstruction (identical shape
    in both engines, no sequential fold): merged covered spans per doc
    → each span contributes the text segment between the PREVIOUS
    span's end and its own start (lag window, doc-partitioned) → plus
    the tail after the last span → ordered concat. Docs with no
    covered span pass through whole. Output: (doc_id, n_chars,
    cut_chars, new_fp) — new_fp is the md5 of the surviving text (the
    blob never needs to leave the engine for the audit; a real cut
    job writes the text column instead of hashing it).

    Scale shape: the gram pass / first-occurrence groupBy / interval
    union are `substring_dup_spans`' linear stages; the reconstruction
    adds one doc-partitioned lag window over SPAN rows and one
    per-doc ordered concat."""
    L = int(min_len)
    d = documents.select("doc_id", F.col(text_col).alias("t"))
    grams = char_gram_hashes(documents, min_len, text_col)
    # first-occurrence ownership via a min window PARTITIONED by the
    # hash key over the ONE gram stream — a groupBy + join-back would
    # re-scan and re-hash the corpus and double-evaluate the md5 under
    # inferred join-key filters (the substring_dup_spans lesson)
    wh = Window.partitionBy("h1", "h2")
    covered = (
        grams.withColumn("md", F.min("doc_id").over(wh))
        .where(F.col("md") < F.col("doc_id"))
        .select(
            "doc_id", F.col("p").alias("s"), (F.col("p") + L - 1).alias("e")
        )
    )
    w = Window.partitionBy("doc_id").orderBy("s")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = covered.withColumn(
        "new_island",
        (F.col("s") > F.coalesce(prev_max_e, F.col("s") - 2) + 1).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = islands.groupBy("doc_id", "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("ee")
    )
    wl = Window.partitionBy("doc_id").orderBy("ss")
    segs = (
        spans.join(d, "doc_id")
        .withColumn(
            "prev_e",
            F.coalesce(F.lag("ee").over(wl), F.lit(0).cast("bigint")),
        )
        .select(
            "doc_id",
            F.col("ss").alias("ord"),
            F.substring(
                F.col("t"),
                (F.col("prev_e") + 1).cast("int"),
                (F.col("ss") - F.col("prev_e") - 1).cast("int"),
            ).alias("seg"),
        )
    )
    tails = (
        spans.groupBy("doc_id")
        .agg(F.max("ee").alias("last_e"))
        .join(d, "doc_id")
        .select(
            "doc_id",
            (F.length("t") + 1).cast("bigint").alias("ord"),
            F.substring(
                F.col("t"),
                (F.col("last_e") + 1).cast("int"),
                F.greatest(
                    F.length("t") - F.col("last_e"), F.lit(0)
                ).cast("int"),
            ).alias("seg"),
        )
    )
    rebuilt = (
        segs.unionByName(tails)
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "seg"))),
                    lambda x: x["seg"],
                ),
            ).alias("nt")
        )
    )
    return (
        d.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.length("t").cast("bigint").alias("n_chars"),
            (F.length("t") - F.length(F.coalesce("nt", "t")))
            .cast("bigint")
            .alias("cut_chars"),
            F.md5(F.coalesce("nt", "t")).alias("new_fp"),
        )
        .orderBy("doc_id")
    )
