"""Training-data sampling & mixing operators (north-star LLM-pipeline
surface, beyond the reference's own operator set — SURVEY §2 extension).

All four are deterministic (hash-ranked, never RNG) so runs are
reproducible and re-runs of a 100 TB job sample the SAME rows — the
property a training-data pipeline actually needs from "random" sampling
(and what makes every one of them exactly oracle-able in SQL):

- `deterministic_sample`: Bernoulli p% by md5(key) — a narrow filter, no
  shuffle, prunes before anything downstream.
- `stratified_sample`: n docs per stratum, hash-ranked — one shuffle on
  the stratum key; the per-group limit is a window, not a collect.
- `mixture_weights`: integer epoch weights per source (the "see
  Wikipedia 3×, CommonCrawl 1×" mixing step) via explode(sequence) —
  row multiplication happens executor-side, weight dim broadcast.
- `pack_sequences`: context-length packing — running token cumsum per
  source (window) binned by the sequence budget into pack_id. The
  streaming-friendly first-fit-in-order heuristic, not bin-packing NP
  optimal; deterministic given the (source, doc_id) order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.strings import md5_bigint
from ..functions.text import token_count, tokens


def sample_hash(key: Column, mod: int = 100) -> Column:
    """Deterministic [0, mod) sampling hash from a key column (md5-based
    so the DuckDB oracle reproduces it bit-for-bit)."""
    return F.pmod(md5_bigint(key.cast("string")), F.lit(mod))


def deterministic_sample(
    df: DataFrame, key_col: str, pct: int, mod: int = 100
) -> DataFrame:
    """Keep rows whose sampling hash < pct — a pure narrow filter (plans
    as a codegen'd predicate; at 100 TB it prunes before any shuffle)."""
    return df.where(sample_hash(F.col(key_col), mod) < pct)


def stratified_sample(
    df: DataFrame, stratum_col: str, key_col: str, n_per_stratum: int
) -> DataFrame:
    """First n rows per stratum by (hash, key) rank — per-group uniform
    sampling with a total deterministic order (hash ties broken by key)."""
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(key_col)), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def mixture_weights(
    df: DataFrame, source_col: str, weights: dict[str, int]
) -> DataFrame:
    """Repeat each row `weights[source]` times with an `epoch` column
    (1-based); unknown sources default to weight 1. The weights live in
    a literal CASE expression — no dim table, no join, no shuffle."""
    wexpr = F.lit(1)
    for src, n in weights.items():
        wexpr = F.when(F.col(source_col) == src, F.lit(int(n))).otherwise(wexpr)
    return df.withColumn(
        "epoch", F.explode(F.sequence(F.lit(1), wexpr))
    )


def pack_sequences(
    documents: DataFrame,
    budget: int = 2048,
    source_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Context-length packing by token-offset binning: per source, in key
    order, pack_id = floor(exclusive-prefix-sum(tokens) / budget) — one
    shuffle on source + one running-sum window. A pack holds ~budget
    tokens; a doc straddling a boundary stays in the pack its START
    offset falls in (so a pack can exceed budget by at most one doc's
    tail — the cheap deterministic heuristic; strict-capacity first-fit
    needs a sequential reset and is not a single window)."""
    n_tok = token_count(F.col(text_col))
    w = (
        Window.partitionBy(source_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return (
        documents.select(
            key_col, source_col, n_tok.cast("bigint").alias("n_tokens")
        )
        .withColumn("pack_id", F.floor(prefix / F.lit(budget)).cast("bigint"))
    )


PRIORITY_U_MOD = 1 << 20


def priority_sample(
    df: DataFrame, key: Column, weight: Column, k: int
) -> DataFrame:
    """Priority sampling (Duffield–Lund–Thorup): weight-biased without-
    replacement sample of ``k`` rows with an unbiased subset-sum
    estimator. Each row gets priority ``w / u`` for a deterministic
    uniform ``u`` in (0,1]; the ``k`` highest-priority rows are kept and
    each is assigned estimator weight ``max(w, tau)`` where ``tau`` is
    the (k+1)-th priority — sums of estimator weights over any subset
    are unbiased for the true weight sums.

    Engine-exact by construction: ``u`` is a dyadic-ish rational from an
    md5 hash ((1 + h%2^20) / (2^20+1)) and the priority is ONE IEEE
    division of parquet-identical doubles — no transcendentals, no
    accumulation order, so both engines rank identically (plus a key
    tiebreak for exact priority ties). Scale: top-(k+1) is a TakeOrdered
    (per-partition heads + driver merge of k+1-row heads), never a
    global sort; tau broadcast back over the k survivors only."""
    u = (
        (1 + F.pmod(md5_bigint(key.cast("string")), F.lit(PRIORITY_U_MOD)))
        / F.lit(float(PRIORITY_U_MOD + 1))
    )
    scored = df.select(
        key.alias("skey"),
        weight.cast("double").alias("w"),
        (weight.cast("double") / u).alias("priority"),
    )
    top = scored.orderBy(F.col("priority").desc(), F.col("skey")).limit(k + 1)
    w_rank = Window.orderBy(F.col("priority").desc(), F.col("skey"))
    ranked = top.select(
        "skey", "w", "priority", F.row_number().over(w_rank).alias("rn")
    )
    tau = ranked.where(F.col("rn") == k + 1).select(
        F.col("priority").alias("tau")
    )
    return (
        ranked.where(F.col("rn") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            "skey",
            F.round("w", 2).alias("w"),
            F.round("priority", 4).alias("priority"),
            F.round(F.greatest(F.col("w"), F.col("tau")), 4).alias("est_weight"),
        )
        .orderBy(F.col("priority").desc(), "skey")
    )


def split_assign(
    df: DataFrame,
    key_col: str,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Deterministic train/val/test split assignment by content key —
    the canonical dataset-versioning op: membership is a pure function
    of the key (md5 mod 100), so re-runs, late-arriving shards, and
    other engines (the DuckDB oracle) all agree row-for-row, and no
    document ever migrates between splits as the corpus grows.

    Narrow: one hash + CASE per row, no shuffle — the split column is
    free at any scale and typically feeds a partitioned write
    (`.write.partitionBy("split")`).
    """
    h = sample_hash(F.col(key_col).cast("string"))
    return df.withColumn(
        "split",
        F.when(h < train_pct, "train")
        .when(h < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    key: Column,
    weight: Column,
    k: int,
) -> DataFrame:
    """Per-group priority sampling (Duffield–Lund–Thorup within each
    stratum): the k highest-priority rows per group, each with the
    unbiased estimator weight max(w, tau_g) for that group's own
    tau — balanced weighted sampling across sources, the training-data
    use case where a global sample would starve small strata.

    Engine-exact like the global variant (md5 dyadic uniform + one IEEE
    division, key tiebreak on exact priority ties). Scale: ONE shuffle
    on the group key; the rank and the (k+1)-th-priority tau both come
    from the same per-group window pass — no per-group collect, no
    second shuffle."""
    u = (
        (1 + F.pmod(md5_bigint(key.cast("string")), F.lit(PRIORITY_U_MOD)))
        / F.lit(float(PRIORITY_U_MOD + 1))
    )
    scored = df.select(
        F.col(group_col).alias("grp"),
        key.alias("skey"),
        weight.cast("double").alias("w"),
        (weight.cast("double") / u).alias("priority"),
    )
    w_rank = Window.partitionBy("grp").orderBy(
        F.col("priority").desc(), F.col("skey")
    )
    # tau = (k+1)-th priority of the SAME window pass, visible to every
    # row via an unbounded frame over the ranked order
    w_all = w_rank.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = scored.select(
        "grp",
        "skey",
        "w",
        "priority",
        F.row_number().over(w_rank).alias("__rn"),
    ).withColumn(
        "__tau",
        F.max(F.when(F.col("__rn") == k + 1, F.col("priority"))).over(w_all),
    )
    return (
        ranked.where(F.col("__rn") <= k)
        .select(
            "grp",
            "skey",
            F.round("w", 2).alias("w"),
            F.round("priority", 4).alias("priority"),
            F.round(
                F.greatest(F.col("w"), F.coalesce(F.col("__tau"), F.col("w"))), 4
            ).alias("est_weight"),
        )
    )


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.3,
    quota_docs: int = 10000,
) -> DataFrame:
    """Temperature-scaled domain mixture derivation (the XLM-R /
    multilingual-pretraining recipe): per-source corpus shares p_s are
    flattened to q_s ∝ p_s^α (α < 1 upsamples the tail, α = 1 keeps the
    natural mix) and turned into document quotas at a sampling budget —
    the step that PRODUCES the weights `mixture_weights` consumes.

    Exactness discipline: p_s = n_s/N is a division of exact counts;
    the flattened masses are integerized per source as
    floor(1e9·p_s^α) BIGINTs so the normalizing sum is exact and
    order-independent (the ln/pow-parity precedent from the
    integer-log-micro family — pow is evaluated once per SOURCE, never
    per row); shares and quotas derive from those integers with one
    deterministic division each. Scale shape: one combinable
    per-source count over the pruned column, then everything happens
    on the |sources|-row table. Output:
    (source, n_docs, share, temp_share, quota)."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n_total"))
    massed = counts.crossJoin(F.broadcast(tot)).withColumn(
        "s_u",
        F.floor(
            F.lit(1e9)
            * F.pow(F.col("n_docs") / F.col("n_total"), F.lit(alpha))
        ).cast("bigint"),
    )
    denom = massed.agg(F.sum("s_u").alias("sum_u"))
    return (
        massed.crossJoin(F.broadcast(denom))
        .select(
            F.col(source_col).alias("source"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
            F.round(F.col("s_u") / F.col("sum_u"), 6).alias("temp_share"),
            F.floor(
                F.col("s_u") / F.col("sum_u") * F.lit(quota_docs) + 0.5
            )
            .cast("bigint")
            .alias("quota"),
        )
        .orderBy("source")
    )


def token_budget_select(
    documents: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget corpus selection: rank documents by composite
    quality (desc, ``key_col`` tiebreak — a total order) and keep the
    quality prefix whose INCLUSIVE running token sum fits the budget —
    the "best N tokens" curation step that turns a scored corpus into a
    fixed-size training set (the budget is in tokens because training
    cost is, not in documents).

    Output: the kept manifest — (doc_id, source, n_tokens, quality,
    cum_tokens), one row per kept doc; ``cum_tokens`` is the inclusive
    prefix sum, so max(cum_tokens) <= budget by construction. Greedy
    PREFIX semantics: the first doc that would overflow the budget stops
    the fill (no skip-and-continue — that needs a sequential scan with
    state and is neither a window nor reproducible under re-ordering).

    Engine-exact: quality is the shared round-6 composite (one rounded
    double, same expression the oracle evaluates); the ORDER is
    (quality DESC, key ASC) so equal scores cannot flip between engines;
    cum_tokens is BIGINT.

    Scale: NOT one global-order window (that is a single task in Spark).
    Two-phase bucket-offset plan with identical output: (1) aggregate
    token sums per exact quality value — quality is rounded to 6
    decimals in [0, 1], so the bucket table is at most ~10^6 rows at ANY
    corpus size and its exclusive-prefix window is a tiny single-task
    sort; (2) buckets whose exclusive prefix already exceeds the budget
    are pruned (no doc in them can qualify: cum >= prefix), and the
    per-doc inclusive cumsum runs in a window PARTITIONED by quality —
    fully parallel — with the bucket offset added. Global cum =
    bucket-exclusive-prefix + within-bucket inclusive prefix because
    the order (quality DESC, key) sorts bucket-contiguously."""
    from ..functions.expr import pin_columns
    from ..functions.text import quality_score

    # PIN quality (functions.expr.pin_columns): the bucket-offset join
    # below is keyed on it, so the optimizer infers isnotnull(quality),
    # inlines the whole composite-score expression into that filter and
    # pushes it below the spread exchange — evaluated serially in the
    # scan stage and again up here. Pinned, it evaluates once per side,
    # parallel.
    scored = pin_columns(
        documents,
        {
            "n_tokens": token_count(F.col(text_col)).cast("bigint"),
            "quality": quality_score(F.col(text_col)),
        },
        keep=[key_col, "source"],
    )
    wb = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        scored.groupBy("quality")
        .agg(F.sum("n_tokens").alias("bkt_tokens"))
        .withColumn(
            "bkt_prefix",
            F.coalesce(F.sum("bkt_tokens").over(wb), F.lit(0).cast("bigint")),
        )
        .where(F.col("bkt_prefix") <= budget)
        .select("quality", "bkt_prefix")
    )
    wd = (
        Window.partitionBy("quality")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scored.join(offsets, "quality")
        .withColumn(
            "cum_tokens",
            (F.col("bkt_prefix") + F.sum("n_tokens").over(wd)).cast("bigint"),
        )
        .where(F.col("cum_tokens") <= budget)
        .select(key_col, "source", "n_tokens", "quality", "cum_tokens")
    )


EPOCH_HASH_A = 2654435761  # Knuth multiplicative constant
EPOCH_HASH_B = 1099087573  # odd 31-bit mix constant
EPOCH_HASH_MOD = 2147483647  # 2^31 - 1


def epoch_shuffle(
    df: DataFrame,
    n_epochs: int = 2,
    n_shards: int = 8,
    key_col: str = "doc_id",
) -> DataFrame:
    """Seeded per-epoch shuffle + sharding: for each epoch, assign every
    row a deterministic pseudo-random rank h(key, epoch), shard by
    h % n_shards, and emit the within-shard read order — the data-order
    plan a trainer consumes ("every epoch sees a different permutation,
    each worker reads its own shard sequentially") WITHOUT materializing
    a permutation table or using RNG state.

    Output: (epoch, shard, position, doc_id, h) — position is the
    1-based within-(epoch, shard) rank. Reproducible: h is pure integer
    arithmetic ((key*A + (epoch+1)*B) % (2^31-1), BIGINT-exact in both
    engines for keys < 2^63/A ≈ 3.4e9 — documents' doc_id domain;
    larger key spaces pre-reduce key % (2^31-1) first, and ANSI mode
    fails loudly rather than wrapping if that is missed), so the same
    corpus always yields the same epoch order, and two epochs yield
    (near-)independent orders because A is a multiplicative-hash
    constant and B shifts the lattice per epoch.

    Scale: the hash is map-side; the only shuffle is the window's
    hash-partition on (epoch, shard) — exactly the partitioning the
    downstream sharded write wants, so the sort pays for itself
    (sortWithinPartitions order IS the emit order). No global sort,
    no skew (h is uniform)."""
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(int(n_epochs) - 1))
    ).alias("epoch")
    h = F.pmod(
        F.col(key_col).cast("bigint") * F.lit(EPOCH_HASH_A)
        + (F.col("epoch") + 1).cast("bigint") * F.lit(EPOCH_HASH_B),
        F.lit(EPOCH_HASH_MOD),
    ).cast("bigint")
    w = Window.partitionBy("epoch", "shard").orderBy("h", key_col)
    return (
        df.select(key_col)
        .select(F.col(key_col), epochs)
        .withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(int(n_shards))).cast("int"))
        .select(
            F.col("epoch").cast("int").alias("epoch"),
            "shard",
            F.row_number().over(w).alias("position"),
            F.col(key_col),
            "h",
        )
    )


def curriculum_schedule(
    documents: DataFrame,
    n_tiles: int = 4,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Competence-based curriculum data schedule (Platanios et al.
    2019): rank the corpus by quality (desc, key tiebreak), split the
    rank order into ``n_tiles`` difficulty tiles (tile 1 = cleanest),
    and let epoch e admit tiles 1..e — the progressive-admission
    schedule a curriculum trainer consumes. Output one row per epoch:
    (epoch, n_docs, n_tokens, min_quality) over everything admitted by
    that epoch.

    Tile assignment uses the explicit floor formula tile =
    (rank-1)*n_tiles // n + 1 (bucket sizes differ by at most one, the
    SQL-standard ntile distribution) — spelled out rather than ntile()
    so both engines compute the identical expression. The global rank
    itself is NEVER a global window: same two-phase bucket-offset plan
    as token_budget_select — per-quality-value counts (bounded bucket
    table, tiny prefix window) + a per-bucket PARTITIONED row_number
    plus the bucket offset. The epoch fan-out is an explode of
    sequence(tile, n_tiles) (a doc admitted by its tile and every later
    epoch), then one map-side-combinable aggregate keyed by epoch."""
    from ..functions.expr import pin_columns
    from ..functions.text import quality_score, token_count

    # PIN quality — same isnotnull-inference pushdown as
    # token_budget_select (the rank join below is keyed on quality)
    scored = pin_columns(
        documents,
        {
            "n_tokens": token_count(F.col(text_col)).cast("bigint"),
            "quality": quality_score(F.col(text_col)),
        },
        keep=[key_col],
    )
    wb = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wtot = Window.orderBy(F.desc("quality")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = (
        scored.groupBy("quality")
        .agg(F.count(F.lit(1)).alias("bkt_n"))
        .withColumn(
            "bkt_prefix",
            F.coalesce(F.sum("bkt_n").over(wb), F.lit(0).cast("bigint")),
        )
        .withColumn("n_total", F.sum("bkt_n").over(wtot).cast("bigint"))
        .select("quality", "bkt_prefix", "n_total")
    )
    wd = Window.partitionBy("quality").orderBy(key_col)
    ranked = (
        scored.join(offsets, "quality")
        .withColumn(
            "rn", F.col("bkt_prefix") + F.row_number().over(wd)
        )
        .withColumn(
            "tile",
            (
                F.floor((F.col("rn") - 1) * n_tiles / F.col("n_total")) + 1
            ).cast("int"),
        )
    )
    admitted = ranked.select(
        "n_tokens",
        "quality",
        F.explode(
            F.sequence(F.col("tile"), F.lit(int(n_tiles)))
        ).alias("epoch"),
    )
    return admitted.groupBy("epoch").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.round(F.min("quality"), 6).alias("min_quality"),
    )


def leakproof_split(
    documents: DataFrame,
    pairs: DataFrame,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """Leakage-safe train/val/test split: assign the split per
    NEAR-DUP CLUSTER, not per document, so two near-duplicates can
    never land on opposite sides of the cut (per-doc hash splits —
    `split_assign` — silently leak eval content into training whenever
    the corpus has near-dups; this is the decontamination-correct
    variant every published pipeline audit calls out).

    ``pairs`` is any near-dup pair stream (doc_a, doc_b) — MinHash-LSH,
    SimHash, embedding-cosine. Clusters come from `dup_clusters`
    (connected components, cluster_id = min member); docs in no pair
    are their own singleton cluster. Membership is then a pure
    function of md5(cluster_id) — stable under corpus growth exactly
    like `split_assign`, but at cluster granularity.

    Scale shape: the CC runs on the pair graph only (pairs-sized, not
    corpus-sized); the corpus-sized work is one left join against the
    (small) clustered-node set plus the narrow hash. Output:
    (doc_id, cluster_id, split)."""
    from .dedup import dup_clusters

    clusters = dup_clusters(pairs)
    h = sample_hash(F.col("cluster_id").cast("string"))
    return (
        documents.select("doc_id")
        .join(clusters, "doc_id", "left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id"))
        )
        .withColumn(
            "split",
            F.when(h < train_pct, "train")
            .when(h < train_pct + val_pct, "val")
            .otherwise("test"),
        )
    )


def shard_balance(
    documents: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Token-balanced shard packing: order docs by token count
    descending and deal them onto ``n_shards`` shards in SNAKE
    (boustrophedon) order — pass 1 deals shards 0..s-1, pass 2 deals
    s-1..0, … . The deterministic one-pass approximation of
    longest-processing-time bin packing: each pass pairs a large deal
    with a small one, so shard token totals stay within one document
    of each other — the property that keeps every trainer data-loader
    rank finishing together instead of idling on the smallest shard.

    Exactness: the global rank is `ranged_global_rank` (range-sampled
    two-phase offsets — no single-task global sort, no distribution
    assumption); the snake position is pure integer arithmetic on the
    rank, identical in both engines. Output: one row per shard
    (shard, n_docs, n_tokens, balance) with balance =
    shard_tokens · n_shards / total_tokens (1.0 = perfect)."""
    from .dedup import ranged_global_rank

    scored = documents.select(
        "doc_id", token_count(F.col(text_col)).alias("n_tokens")
    ).withColumn("neg_t", -F.col("n_tokens"))
    ranked = ranged_global_rank(scored, ["neg_t", "doc_id"])
    pos = (F.col("rn") - 1) % (2 * n_shards)
    shard = F.when(pos < n_shards, pos).otherwise(2 * n_shards - 1 - pos)
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ranked.withColumn("shard", shard.cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        )
        .withColumn("total", F.sum("n_tokens").over(w))
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") * n_shards / F.col("total"), 6).alias(
                "balance"
            ),
        )
        .orderBy("shard")
    )


def padding_waste(
    documents: DataFrame,
    buckets: tuple = (64, 128, 256, 512, 1024, 2048),
    text_col: str = "text",
) -> DataFrame:
    """Length-bucketed batching audit: assign every document to the
    smallest bucket length >= its token count (docs beyond the largest
    bucket are truncated to it) and report per bucket the docs, real
    tokens, PADDING tokens a fixed-length batcher would burn, and the
    truncation loss — the numbers that decide bucket boundaries for a
    trainer's batch packer (padding is pure wasted FLOPs; truncation
    is lost data; `pack_sequences` is the packing alternative this
    audit justifies or kills).

    Pure integer arithmetic per row (a CASE chain over the fixed
    bucket tuple — no log2/float), one combinable aggregate. Output:
    one row per occupied bucket (bucket, n_docs, n_tokens, n_padding,
    n_truncated, pad_ratio)."""
    n = token_count(F.col(text_col))
    b = F.lit(buckets[-1])
    for edge in reversed(buckets[:-1]):
        b = F.when(n <= edge, edge).otherwise(b)
    rows = documents.select(
        b.cast("bigint").alias("bucket"),
        n.cast("bigint").alias("n_toks"),
    )
    kept = F.least(F.col("n_toks"), F.col("bucket"))
    return (
        rows.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum(F.col("bucket") - kept).cast("bigint").alias("n_padding"),
            F.sum(F.col("n_toks") - kept).cast("bigint").alias("n_truncated"),
        )
        .withColumn(
            "pad_ratio",
            F.round(
                F.col("n_padding")
                / (F.col("n_docs") * F.col("bucket")),
                6,
            ),
        )
        .orderBy("bucket")
    )


def negative_sampling_table(
    documents: DataFrame,
    vocab_size: int = 50,
    alpha: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """word2vec-style negative-sampling distribution: the top
    ``vocab_size`` tokens with sampling quota ∝ count^alpha (Mikolov's
    0.75 smoothing — down-weights the Zipf head so negatives aren't
    all stopwords), integerized to micro-units. The table a trainer's
    alias-sampler is built from.

    Exactness: counts are exact integers; pow() runs ONCE per vocab
    row (bounded by vocab_size, the accepted ln()/pow() exposure class
    of q_naive_bayes / q_domain_temperature — never per-token) and is
    integerized to floor(1e9·c^α) BEFORE the normalizing sum (the
    q_domain_temperature discipline: the sum is then an exact BIGINT,
    immune to double-addition order), so the quota is pure integer
    division (p9 · 1e6) div Σp9 — bounded while c^α < ~5.6e3·1e9/1e6,
    i.e. vocab counts below ~10^17^(4/3); far beyond any corpus. The
    vocab cut is pinned by (count DESC, token ASC).
    Output: (token, cnt, quota_micro)."""
    toks = documents.select(F.explode(tokens(F.col(text_col))).alias("token"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    p9 = F.floor(
        F.lit(1e9) * F.pow(F.col("cnt").cast("double"), F.lit(float(alpha)))
    ).cast("bigint")
    return (
        vocab.withColumn("p9", p9)
        .withColumn("tot9", F.sum("p9").over(w))
        .selectExpr(
            "token",
            "cnt",
            "CAST((p9 * CAST(1000000 AS BIGINT)) DIV tot9 AS BIGINT)"
            " AS quota_micro",
        )
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
    )


def stratified_kfold(
    documents: DataFrame,
    strata_col: str = "lang",
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Stratified k-fold assignment: within every stratum, documents
    are hash-ordered (md5 — deterministic, corpus-growth-stable order
    like every sampler here) and dealt round-robin onto ``k`` folds,
    so each fold carries the SAME class balance as the corpus and
    per-stratum fold sizes differ by at most 1 — the property plain
    hash splits (`split_assign`) only achieve in expectation.

    Scale shape: the within-stratum rank is derived from ONE
    `ranged_global_rank` over (stratum, hash, id) — range-sampled
    two-phase offsets, no per-stratum single-task window (a skewed
    stratum would serialize one) — minus the stratum's min rank (a
    tiny per-stratum aggregate joined back). Output: one row per
    (stratum, fold): (stratum, fold, n_docs)."""
    from .dedup import ranged_global_rank
    from ..functions.strings import md5_bigint

    s = documents.select(
        F.col(strata_col).alias("stratum"),
        F.col(id_col).alias("rid"),
        md5_bigint(F.col(id_col).cast("string")).alias("h"),
    )
    ranked = ranged_global_rank(s, ["stratum", "h", "rid"])
    base = ranked.groupBy("stratum").agg(F.min("rn").alias("rn0"))
    return (
        ranked.join(base, "stratum")
        .withColumn("fold", ((F.col("rn") - F.col("rn0")) % k).cast("int"))
        .groupBy("stratum", "fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("stratum", "fold")
    )
