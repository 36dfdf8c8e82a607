"""Similarity search over an embedding column (north-star ANN ops).

`embeddings(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)`.

- brute-force cosine top-k: broadcast the (small) query set against the
  full corpus; dot/norms via zip_with + aggregate folds (sequential,
  deterministic — bit-identical to the DuckDB oracle's list fold).
- LSH-bucketed ANN: sign-bit random-hyperplane-style bucketing using the
  first `nbits` dimensions as deterministic "hyperplanes" (sign of each
  coordinate) — queries only scan their own bucket. The scale path:
  bucket key is a shuffle key, each bucket a tiny candidate set.

Scale (100 TB): brute force is O(Q·N) — fine for small Q with broadcast;
the bucketed variant shards N by key so per-task candidate sets fit in
memory. Both avoid Python: the whole distance computation is Catalyst
higher-order functions inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    queries: (query_id, q_embedding). Broadcast-joined against the corpus
    (no shuffle of the big side); ranking is fully deterministic: rounded
    similarity desc, then vec_id asc as tiebreak."""
    joined = embeddings.crossJoin(
        F.broadcast(queries.select(query_id, F.col("q_embedding")))
    ).where(F.col("vec_id") != F.col(query_id))
    scored = joined.select(
        F.col(query_id),
        F.col("vec_id"),
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "vec_id", "cosine_sim", "rank")
        .orderBy(query_id, "rank")
    )


def sign_bucket(embedding: Column, nbits: int = 8) -> Column:
    """Deterministic coarse quantizer: bucket = Σ 2^i · [e_i > 0] over the
    first nbits dims. A stand-in for random hyperplanes that both engines
    compute identically (no RNG needed)."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(nbits - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.when(
            F.element_at(embedding, (i + 1).cast("int")) > 0,
            F.pow(F.lit(2.0), i.cast("double")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nbits: int = 8,
    query_id: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bucket.

    Same scoring/ranking as brute force but the join is an equi-join on
    bucket — at corpus scale this is a standard shuffle-partitioned probe
    instead of a full scan per query (recall < 1 by design)."""
    cand = embeddings.withColumn("bucket", sign_bucket(F.col("embedding"), nbits))
    q = queries.withColumn("bucket", sign_bucket(F.col("q_embedding"), nbits))
    joined = cand.join(
        F.broadcast(q.select(query_id, "q_embedding", "bucket")), "bucket"
    ).where(F.col("vec_id") != F.col(query_id))
    scored = joined.select(
        F.col(query_id),
        F.col("vec_id"),
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "vec_id", "cosine_sim", "rank")
        .orderBy(query_id, "rank")
    )


def banded_sign_keys(
    embedding: Column, n_bands: int = 4, band_bits: int = 8
) -> Column:
    """Banded coarse quantizer: ``array<struct<band,bkey>>`` where band b's
    key packs the sign bits of dims [b·band_bits, (b+1)·band_bits).

    The two knobs decouple the scale trade-off the single-bucket quantizer
    couldn't express (VERDICT r1): `band_bits` bounds per-bucket fan-out
    (the in-bucket pair join is quadratic in bucket size — at 100 TB run
    16–32 bits so 2^bits ≫ corpus/executor), `n_bands` buys recall back
    (a pair is a candidate if ANY band agrees — same OR-of-ANDs shape as
    the MinHash band join, dedup.py:157)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.aggregate(
                F.sequence(F.lit(0), F.lit(band_bits - 1)),
                F.lit(0).cast("bigint"),
                lambda acc, i: acc
                + F.when(
                    F.element_at(
                        embedding, (b * band_bits + i + 1).cast("int")
                    )
                    > 0,
                    F.pow(F.lit(2.0), i.cast("double")).cast("bigint"),
                ).otherwise(F.lit(0).cast("bigint")),
            ).alias("bkey"),
        ),
    )


def _explode_keys(
    df: DataFrame, vec_col: str, n_bands: int, band_bits: int
) -> DataFrame:
    bk = F.explode(banded_sign_keys(F.col(vec_col), n_bands, band_bits)).alias("bk")
    return df.select("*", bk).select(
        *df.columns, F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def lsh_banded_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bands: int = 4,
    band_bits: int = 8,
    query_id: str = "query_id",
) -> DataFrame:
    """Multi-probe ANN top-k: a query probes every band's bucket and the
    candidate set is the union (dedup'd), strictly ⊇ the single-bucket
    candidates when band 0 covers the same dims. Still one equi-join
    shuffle on (band, bkey); per-bucket fan-out bounded by band_bits."""
    ek = _explode_keys(embeddings, "embedding", n_bands, band_bits)
    qk = _explode_keys(
        queries.select(query_id, "q_embedding"), "q_embedding", n_bands, band_bits
    )
    joined = ek.join(
        F.broadcast(qk.select(query_id, "q_embedding", "band", "bkey")),
        ["band", "bkey"],
    ).where(F.col("vec_id") != F.col(query_id))
    scored = joined.select(
        F.col(query_id),
        F.col("vec_id"),
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias(
            "cosine_sim"
        ),
    ).distinct()
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "vec_id", "cosine_sim", "rank")
        .orderBy(query_id, "rank")
    )


def embedding_near_dup_pairs_banded(
    embeddings: DataFrame,
    n_bands: int = 4,
    band_bits: int = 8,
    threshold: float = 0.95,
) -> DataFrame:
    """Banded-multi-probe near-dup pairs: candidates share ANY band bucket
    (union across bands, dedup'd), then exact cosine ≥ threshold
    verifies. The 100 TB-hard variant of ``embedding_near_dup_pairs`` —
    per-bucket pair fan-out is bounded by 2^band_bits granularity instead
    of a single 2^nbits partition of the whole corpus."""
    b = _explode_keys(
        embeddings.select("vec_id", "embedding"), "embedding", n_bands, band_bits
    )
    a, c = b.alias("a"), b.alias("b")
    return (
        a.join(c, ["band", "bkey"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 5).alias(
                "cosine_sim"
            ),
        )
        .distinct()
        .where(F.col("cosine_sim") >= threshold)
    )


def ann_band_table(
    embeddings: DataFrame, n_bands: int = 4, band_bits: int = 8
) -> DataFrame:
    """(vec_id, embedding, band, bkey) — the banded sign-LSH INDEX
    representation: one row per (vector, band) keyed by the packed sign
    bits of that band's dims. The embedding-side sibling of
    `dedup.minhash_band_table`: band keys depend only on the vector
    itself and the (n_bands, band_bits) config, so rows written by one
    run join correctly against rows written by any later run — this is
    the table an incremental ANN pipeline persists between ingests
    (see `ann_index_update`)."""
    return _explode_keys(
        embeddings.select("vec_id", "embedding"), "embedding", n_bands, band_bits
    )


def ann_index_update(
    new_vecs: DataFrame,
    index_df: DataFrame,
    n_bands: int = 4,
    band_bits: int = 8,
    threshold: float = 0.95,
    new_bands: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Incremental embedding near-dup of a NEW vector batch against an
    already-indexed corpus — the ANN sibling of
    `dedup.minhash_index_update` (VERDICT r6 #4): a production ingest
    never re-keys everything it has ever embedded.

    ``index_df`` is a stored `ann_band_table`. Returns ``(pairs,
    updated_index)``:

    - ``pairs``: verified near-dup pairs (vec_a < vec_b, exact
      cosine_sim >= threshold) where AT LEAST ONE side is in
      ``new_vecs`` — new-vs-index (band-key equi-join against the
      stored table; the index is never re-keyed or self-joined) plus
      new-vs-new (the fresh batch may duplicate itself);
    - ``updated_index``: ``index_df`` with any rows for RE-INGESTED
      vec_ids replaced by the new batch's band rows (anti-join on
      vec_id, then union — same replace-on-reingest discipline the
      MinHash index learned from ADVICE r6).

    Update-then-query ≡ full rebuild: band keys are pure functions of
    each vector, so the pairs here are EXACTLY the full-rebuild
    `embedding_near_dup_pairs_banded` output restricted to pairs with a
    new member (pinned by pytest and the driver oracle).

    Scale shape: banding costs O(new batch) only; the index join is a
    (band, bkey) equi-join whose shuffle is sized by the new batch's
    band rows — AQE broadcasts a small ingest batch against a huge
    stored index; verify is an exact cosine on candidates only. The
    stored index grows by n_bands rows/vector.

    ``new_bands``: optionally a PRECOMPUTED `ann_band_table` of
    ``new_vecs`` (the streaming ingest passes a lazily checkpointed one
    so banding is computed once for both the pair join and the store
    delta)."""
    if new_bands is None:
        new_bands = ann_band_table(new_vecs, n_bands, band_bits)
    base_index = index_df.join(
        new_vecs.select("vec_id").distinct(), "vec_id", "left_anti"
    )
    ni = (
        new_bands.alias("a")
        .join(base_index.alias("b"), ["band", "bkey"])
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_a"),
            F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias("vec_b"),
            F.when(
                F.col("a.vec_id") < F.col("b.vec_id"), F.col("a.embedding")
            )
            .otherwise(F.col("b.embedding"))
            .alias("emb_a"),
            F.when(
                F.col("a.vec_id") < F.col("b.vec_id"), F.col("b.embedding")
            )
            .otherwise(F.col("a.embedding"))
            .alias("emb_b"),
        )
    )
    nn = (
        new_bands.alias("a")
        .join(new_bands.alias("b"), ["band", "bkey"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("emb_a"),
            F.col("b.embedding").alias("emb_b"),
        )
    )
    from ..functions.expr import pin_columns

    # PIN the verify cosine so the threshold filter binds the computed
    # value instead of inlining the dot product twice (filter + project)
    pairs = pin_columns(
        ni.unionByName(nn).dropDuplicates(["vec_a", "vec_b"]),
        {"cosine_sim": F.round(cosine(F.col("emb_a"), F.col("emb_b")), 5)},
        keep=["vec_a", "vec_b"],
    ).where(F.col("cosine_sim") >= threshold)
    return pairs, base_index.unionByName(new_bands)


def embedding_near_dup_pairs(
    embeddings: DataFrame, nbits: int = 8, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the 5th dedup family of the
    north star): candidate pairs share a sign-bucket (the quantizer above),
    then exact cosine >= threshold verifies.

    Scale: the full-corpus shuffle is the equi-join on bucket; per-bucket
    candidate sets are small (2^nbits buckets), so the quadratic step is
    local and bounded — same shape as the MinHash band join. Recall misses
    only pairs straddling a sign flip in the first nbits dims; raise recall
    by unioning a second bucket over dims nbits..2*nbits (multi-probe), at
    one extra shuffle."""
    from ..functions.expr import pin_columns

    b = embeddings.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding"), nbits).alias("bucket")
    )
    a, c = b.alias("a"), b.alias("b")
    cand = a.join(c, "bucket").where(F.col("a.vec_id") < F.col("b.vec_id"))
    # PIN the verify cosine (see ann_index_update): one evaluation per
    # candidate instead of filter + projection copies
    return pin_columns(
        cand,
        {
            "cosine_sim": F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 5
            ),
            "vec_a": F.col("a.vec_id"),
            "vec_b": F.col("b.vec_id"),
        },
        keep=[],
    ).select("vec_a", "vec_b", "cosine_sim").where(
        F.col("cosine_sim") >= threshold
    )


def deterministic_centroids(
    embeddings: DataFrame, n_centroids: int = 16
) -> DataFrame:
    """IVF "training" both engines can replay exactly: the ``n_centroids``
    corpus vectors with the smallest ``md5(vec_id)`` act as centroids (a
    deterministic stand-in for k-means — md5 gives a uniform pseudo-random
    draw with no RNG state to disagree on). ``orderBy().limit()`` is a
    distributed TakeOrdered, not a single-partition sort."""
    return (
        embeddings.select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("c_embedding"),
        )
        .orderBy(F.md5(F.col("centroid_id").cast("string")), F.col("centroid_id"))
        .limit(n_centroids)
    )


def nearest_centroid(vec: Column, cents: Column) -> Column:
    """Argmax-cosine over a ``array<struct<centroid_id,c_embedding>>``
    column (sorted by centroid_id): a single sequential fold keeping the
    best (sim, cid); strict ``>`` + ascending iteration keeps the lowest
    centroid_id on rounded-sim ties — same order as
    ``ORDER BY sim DESC, centroid_id``. Entirely map-side: assignment
    costs zero shuffles no matter the corpus size."""
    from ..functions.expr import let

    def _fold(nv: Column) -> Column:
        return F.aggregate(
            cents,
            F.struct(
                F.lit(-2.0).alias("sim"), F.lit(-1).cast("bigint").alias("cid")
            ),
            lambda acc, c: let(
                F.round(
                    _dot(vec, c["c_embedding"]) / (nv * _norm(c["c_embedding"])), 5
                ),
                lambda s: F.when(
                    s > acc["sim"],
                    F.struct(s.alias("sim"), c["centroid_id"].alias("cid")),
                ).otherwise(acc),
            ),
        )

    return let(_norm(vec), _fold)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF ANN top-k: partition the corpus into ``n_centroids`` inverted
    lists (nearest-centroid assignment), probe the query's ``nprobe``
    nearest lists, score exactly inside them.

    Scale shape (100 TB): centroids are a one-row broadcast array, so
    assignment is pure map-side codegen (no shuffle); the only corpus
    shuffle is the equi-join on centroid_id, and each list holds ~N/K
    vectors — `n_centroids` is the fan-out bound, `nprobe` buys recall,
    exactly the IVF trade-off (Faiss-style) expressed relationally. No
    dedup needed: every vector lives in exactly one list."""
    cents = deterministic_centroids(embeddings, n_centroids)
    lists = ivf_assignment_table(embeddings, cents)
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select(
            query_id,
            "q_embedding",
            "centroid_id",
            F.round(cosine(F.col("q_embedding"), F.col("c_embedding")), 5).alias(
                "csim"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.col("csim").desc(), F.col("centroid_id").asc()
                )
            ),
        )
        .where(F.col("rn") <= nprobe)
        .select(query_id, "q_embedding", "centroid_id")
    )
    joined = lists.join(F.broadcast(probes), "centroid_id").where(
        F.col("vec_id") != F.col(query_id)
    )
    scored = joined.select(
        F.col(query_id),
        F.col("vec_id"),
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "vec_id", "cosine_sim", "rank")
        .orderBy(query_id, "rank")
    )


def ann_recall_audit(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """Recall@k audit of the IVF approximate path against the exact
    brute-force baseline — the measurement that justifies (or vetoes)
    shipping an ANN index at a given (n_centroids, nprobe) operating
    point, the embedding-side sibling of the MinHash accuracy audit.
    Output: one row per query — (query_id, n_exact, n_hits, recall)
    with n_hits = |IVF top-k ∩ exact top-k|, ordered by query_id.

    Both sides rank by round-5 cosine desc with vec_id tiebreak, so
    each top-k SET is fully deterministic and the intersection is
    engine-exact. Scale shape: the exact side is the expensive one
    (query_set × corpus broadcast scan) — which is fine, because a
    recall audit runs over a SAMPLED query set by construction; the
    intersection is a (query_id, vec_id) semi-join of two k-row-per-
    query frames, i.e. nothing. At 100 TB the audit's cost is one
    broadcast scan of the corpus per query batch, the same bill
    q_cosine_topk already pays."""
    exact = brute_force_topk(embeddings, queries, k, query_id)
    approx = ivf_topk(embeddings, queries, k, n_centroids, nprobe, query_id)
    hits = exact.select(query_id, "vec_id").join(
        approx.select(query_id, "vec_id"), [query_id, "vec_id"], "left_semi"
    )
    ex_n = exact.groupBy(query_id).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact")
    )
    hit_n = hits.groupBy(query_id).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hits")
    )
    return (
        ex_n.join(hit_n, query_id, "left")
        .select(
            query_id,
            "n_exact",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("bigint")
            .alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) * 1.0
                / F.col("n_exact"),
                6,
            ).alias("recall"),
        )
        .orderBy(query_id)
    )


def ivf_assignment_table(
    embeddings: DataFrame, centroids: DataFrame
) -> DataFrame:
    """(vec_id, embedding, centroid_id) — the IVF inverted-lists INDEX
    representation: every vector assigned to its nearest centroid by
    the map-side broadcast-array fold (`nearest_centroid` — zero
    shuffles regardless of corpus size). ``centroids`` is a
    (centroid_id, c_embedding) table; pass the SAME frozen centroids at
    build and at every later `ivf_index_update` — IVF trains once and
    assigns forever (the Faiss add() discipline), so assignment rows
    written by different runs are directly comparable."""
    carr = centroids.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("centroid_id"), F.col("c_embedding")))
        ).alias("cents")
    )
    return embeddings.select("vec_id", "embedding").crossJoin(
        F.broadcast(carr)
    ).select(
        "vec_id",
        "embedding",
        nearest_centroid(F.col("embedding"), F.col("cents"))["cid"].alias(
            "centroid_id"
        ),
    )


def ivf_index_update(
    new_vecs: DataFrame, index_df: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Incremental IVF ingest — the inverted-list sibling of
    `ann_index_update`: assign ONLY the new batch to the frozen
    centroids (map-side, zero shuffles) and splice the rows into the
    stored assignment table, replacing any re-ingested vec_ids' stale
    rows (anti-join on vec_id, then union). Returns the updated
    (vec_id, embedding, centroid_id) table; update-then-assign ≡
    full rebuild with the same centroids, pinned by pytest and the
    driver oracle. At 100 TB the ingest batch never touches the stored
    lists except through the doc-sized anti-join."""
    base = index_df.join(
        new_vecs.select("vec_id").distinct(), "vec_id", "left_anti"
    )
    return base.unionByName(ivf_assignment_table(new_vecs, centroids))


def semantic_dedup(
    embeddings: DataFrame, n_centroids: int = 16, threshold: float = 0.8
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the corpus into ``n_centroids`` inverted
    lists, compute pairwise cosine similarity ONLY within each cluster,
    and drop every vector dominated by a higher-priority near-duplicate.
    Priority follows the paper's keep-the-edge-example rule — lower
    similarity to the assigned centroid wins (vec_id breaks exact-rounded
    ties, so the order is total). The drop rule is the deterministic
    PAIRWISE variant: v is dropped iff ANY higher-priority cluster-mate u
    has round(cos(u, v), 5) >= threshold — one relational pass, same
    discipline as the MinHash family's keep-first rule (vs the paper's
    sequential greedy-vs-kept scan, which is order-dependent and not
    expressible as a join; on chain clusters the pairwise rule drops a
    superset).

    Returns the KEPT rows: (vec_id, centroid_id, centroid_sim).

    Scale shape (100 TB): centroids broadcast (assignment is map-side,
    zero shuffles); the only corpus shuffle is the centroid_id equi-join
    feeding the within-cluster self-join — O(sum n_c^2) total work, which
    is SemDeDup's own trade: n_centroids grows with the corpus so each
    list stays ~N/K bounded (the paper runs K=50k on LAION-440M). No
    cross-cluster pair is ever considered.

    Reference shape composed: D1 distinct-by-key lifted to embedding
    space (scraper.py:181-195's seen-set discipline, semantic metric)."""
    cents = deterministic_centroids(embeddings, n_centroids)
    lists = ivf_assignment_table(embeddings, cents)
    return _semdedup_dominate(
        lists, cents, threshold, f"semdedup_ws:{n_centroids}", embeddings
    )


def _semdedup_dominate(
    lists: DataFrame,
    cents: DataFrame,
    threshold: float,
    cache_slot: str,
    cache_source: DataFrame,
) -> DataFrame:
    """Shared SemDeDup tail: per-cluster pairwise domination over a
    (vec_id, embedding, centroid_id) assignment table. ws feeds BOTH
    legs of the self-join AND the final anti-join; cache it once
    (one_slot_cached discipline — no bare per-call .cache()). nvec
    pre-normalizes each vector so the pairwise similarity below is ONE
    dot fold instead of dot + two norms per pair — the oracle
    normalizes identically, so the rounded values stay in lockstep."""
    from .dedup import one_slot_cached

    ws = one_slot_cached(
        cache_slot,
        cache_source,
        lambda: lists.join(F.broadcast(cents), "centroid_id").select(
            "vec_id",
            "centroid_id",
            F.round(cosine(F.col("embedding"), F.col("c_embedding")), 5).alias(
                "centroid_sim"
            ),
            F.transform(
                "embedding", lambda x: x.cast("double") / _norm(F.col("embedding"))
            ).alias("nvec"),
        ),
    )
    a = ws.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("a_id"),
        F.col("nvec").alias("a_nvec"),
        F.col("centroid_sim").alias("a_cs"),
    )
    b = ws.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("b_id"),
        F.col("nvec").alias("b_nvec"),
        F.col("centroid_sim").alias("b_cs"),
    )
    dominated = (
        a.join(b, "centroid_id")
        .where(
            (F.col("a_cs") < F.col("b_cs"))
            | ((F.col("a_cs") == F.col("b_cs")) & (F.col("a_id") < F.col("b_id")))
        )
        .where(
            F.round(_dot(F.col("a_nvec"), F.col("b_nvec")), 5) >= threshold
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
    )
    return (
        ws.join(dominated, "vec_id", "left_anti")
        .select("vec_id", "centroid_id", "centroid_sim")
        .orderBy("vec_id")
    )


def semantic_dedup_2level(
    embeddings: DataFrame, n_centroids: int = 16, threshold: float = 0.8
) -> DataFrame:
    """`semantic_dedup` with a TWO-LEVEL (coarse-then-refine) centroid
    assignment — the hierarchical-quantizer shape that tames the flat
    variant's O(N*K) assignment term to O(N*2*sqrt(K)), so K can grow
    with the corpus (the measured requirement in SCALING.md's K-knob
    battery) without assignment becoming the new quadratic. Coarse
    centroids are the sqrt(K) fine centroids with the smallest
    md5(vec_id) (a prefix of the same deterministic ordering that picked
    the fine K); each fine centroid joins its nearest coarse's group;
    a vector folds over the sqrt(K) coarse array, then over its coarse's
    fine group only. Assignment is approximate in exactly the IVF-HNSW/
    two-level-Faiss sense — a vector may land in a different (still
    near) list than flat argmax — which changes cluster SHAPES, not the
    domination semantics; the oracle replays the identical two-level
    rule. Everything corpus-sized stays map-side: coarse array, fine
    groups, and the group lookup are all broadcast."""
    cents = deterministic_centroids(embeddings, n_centroids)
    n_coarse = max(1, int(n_centroids**0.5))
    coarse = (
        cents.orderBy(
            F.md5(F.col("centroid_id").cast("string")), F.col("centroid_id")
        )
        .limit(n_coarse)
        .select("centroid_id", "c_embedding")
    )
    carr = coarse.agg(
        F.sort_array(
            F.collect_list(F.struct("centroid_id", "c_embedding"))
        ).alias("cents")
    )
    f2c = cents.crossJoin(F.broadcast(carr)).select(
        "centroid_id",
        "c_embedding",
        nearest_centroid(F.col("c_embedding"), F.col("cents"))["cid"].alias(
            "coarse_id"
        ),
    )
    groups = f2c.groupBy("coarse_id").agg(
        F.sort_array(
            F.collect_list(F.struct("centroid_id", "c_embedding"))
        ).alias("fines")
    )
    vc = embeddings.select("vec_id", "embedding").crossJoin(
        F.broadcast(carr)
    ).select(
        "vec_id",
        "embedding",
        nearest_centroid(F.col("embedding"), F.col("cents"))["cid"].alias(
            "coarse_id"
        ),
    )
    lists = vc.join(F.broadcast(groups), "coarse_id").select(
        "vec_id",
        "embedding",
        nearest_centroid(F.col("embedding"), F.col("fines"))["cid"].alias(
            "centroid_id"
        ),
    )
    return _semdedup_dominate(
        lists, cents, threshold, f"semdedup2_ws:{n_centroids}", embeddings
    )


def quantize_embeddings(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization of an embedding column with per-vector
    scale (absmax/127) and the round-trip RMS error — the storage-side
    prep every large ANN index does before serving, and the error column
    is the quality gate for it.

    Narrow and codegen'd: three HOF folds per row (absmax, quantize,
    error accumulate), all in double with a fixed sequential order so
    both engines sum identically; no shuffle anywhere. The quantized
    array itself is emitted as int (int8 range by construction) so the
    downstream sink stores 1 byte/dim instead of 4.
    """
    from ..functions.expr import let

    def _q(v: Column) -> Column:
        absmax = F.aggregate(
            v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
        )

        def _with_scale(scale: Column) -> Column:
            quant = F.transform(
                v, lambda x: F.round(x.cast("double") / scale).cast("int")
            )

            def _err(q: Column) -> Column:
                sqerr = F.aggregate(
                    F.zip_with(
                        v,
                        q,
                        lambda x, qi: (x.cast("double") - qi.cast("double") * scale)
                        * (x.cast("double") - qi.cast("double") * scale),
                    ),
                    F.lit(0.0),
                    lambda acc, e: acc + e,
                )
                return F.struct(
                    scale.alias("scale"),
                    q.alias("q"),
                    F.sqrt(sqerr / F.size(v)).alias("rms"),
                )

            return let(quant, _err)

        return F.when(absmax > 0, let(absmax / F.lit(127.0), _with_scale))

    from ..functions.expr import pin_columns

    return (
        # PIN the quantization struct: the isNotNull filter below would
        # otherwise inline the whole three-fold expression into a
        # predicate pushed under the spread exchange (serial scan
        # stage) and re-evaluate it in the projection (r8
        # generator-pushdown shape; see functions.expr.pin_columns)
        pin_columns(
            embeddings, {"__s": let(F.col(vec_col), _q)}, keep=["vec_id"]
        )
        # all-zero vectors have no scale; drop them (oracle: WHERE scale > 0)
        .where(F.col("__s").isNotNull())
        .select(
            "vec_id",
            F.round(F.col("__s.scale"), 6).alias("scale"),
            F.col("__s.q").alias("q8"),
            F.round(F.col("__s.rms"), 6).alias("rms_err"),
        )
    )


def pca_top_component(
    embeddings: DataFrame, vec_col: str = "embedding", iters: int = 6
) -> DataFrame:
    """Top principal direction of the embedding cloud by ``iters`` fixed
    MATRIX-FREE power-iteration steps on the centered data — the
    dimensionality diagnostic every embedding store runs (dominant
    variance direction; project onto it for 1-D indexing or drift
    checks).

    Never materializes the d×d covariance: each step is two passes
    expressed as joins — per-row dot = ⟨x−μ, v⟩ (map-side, v and μ ride
    a broadcast), then v' = Σ_r (x_r−μ)·dot_r (one groupBy pos). That
    is the 100 TB shape: O(n·d) per step streamed through aggregations,
    never an O(d²) explode per row, and the iterate itself is a d-row
    frame checkpointed per step (the PageRank lineage discipline,
    graph.py). Fixed iteration count + deterministic all-ones start
    give a cross-engine-reproducible result (the oracle unrolls the
    same steps as CTE layers); output loadings are L2-normalized and
    rounded. Like any power method, convergence to the true eigenpair
    depends on the spectral gap — the CONTRACT here is "exactly k
    power steps", which is what the oracle pins."""
    rows = embeddings.select(
        "vec_id", F.col(vec_col).cast("array<double>").alias("e")
    )
    by_pos = rows.select(
        "vec_id", F.posexplode("e").alias("pos", "val")
    )
    means = by_pos.groupBy("pos").agg(F.avg("val").alias("m"))

    def _as_array(df: DataFrame, val_col: str) -> DataFrame:
        """(pos, val) frame → one-row ordered-array frame."""
        return df.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", F.col(val_col)))),
                lambda s: s[val_col],
            ).alias("arr")
        )

    marr = _as_array(means, "m").withColumnRenamed("arr", "mu")
    v = means.select("pos", F.lit(1.0).alias("val"))
    for _ in range(iters):
        varr = _as_array(v, "val").withColumnRenamed("arr", "vv")
        dots = (
            rows.crossJoin(F.broadcast(marr))
            .crossJoin(F.broadcast(varr))
            .select(
                "vec_id",
                F.zip_with("e", "mu", lambda a, b: a - b).alias("c"),
                F.aggregate(
                    F.zip_with(
                        F.zip_with("e", "mu", lambda a, b: a - b),
                        "vv",
                        lambda a, b: a * b,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dot"),
            )
        )
        v = (
            dots.select("dot", F.posexplode("c").alias("pos", "cval"))
            .groupBy("pos")
            .agg(F.sum(F.col("cval") * F.col("dot")).alias("val"))
            .localCheckpoint(eager=True)  # d rows; cut the join lineage
        )
    nrm = v.agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"))
    return (
        v.crossJoin(F.broadcast(nrm))
        .select(
            "pos", F.round(F.col("val") / F.col("nrm"), 4).alias("loading")
        )
        .orderBy("pos")
    )


def random_sign_projection(
    embeddings: DataFrame, out_dims: int = 4, vec_col: str = "embedding"
) -> DataFrame:
    """Johnson–Lindenstrauss random-SIGN projection (Achlioptas): map
    each embedding to ``out_dims`` components p_j = Σ_d sign(j,d)·v_d
    where sign(j,d) = ±1 comes from bit j of an md5 hash of the input
    dimension index — the sketch-sized, index-free dimensionality
    reducer next to PCA (data-dependent, iterative) and int8
    quantization (per-vector): distances are preserved in expectation
    with no training pass at all.

    Cross-engine exactness discipline: the ±1 matrix is md5-derived
    (bit j = floor(h_d / 2^j) % 2 — the repo's bit convention), and
    each input element is first quantized to INTEGER micro-units via
    floor(x · 1e6) — double multiply + floor are bit-identical on both
    engines, whereas casting a FLOAT to DECIMAL is NOT (DuckDB routes
    through the float's shortest round-trip string, Spark through the
    exact binary expansion — measured 10% of elements differing at
    scale 9). Components are then pure BIGINT sums:
    order/partitioning-independent by construction. Scale shape:
    posexplode to (vec, dim) rows → ONE map-side-combinable groupBy
    with out_dims conditional sums; dims is a constant factor, never a
    join."""
    from ..functions.strings import md5_bigint

    ex = embeddings.select(
        "vec_id",
        F.posexplode(vec_col).alias("pos", "x"),
    ).select(
        "vec_id",
        md5_bigint(F.concat(F.lit("rp#"), (F.col("pos") + 1).cast("string")))
        .alias("h"),
        F.floor(F.col("x").cast("double") * 1_000_000)
        .cast("bigint")
        .alias("xi"),
    )
    aggs = []
    for j in range(out_dims):
        sign = 1 - 2 * (F.floor(F.col("h") / (2 ** j)) % 2)
        aggs.append(
            F.sum(sign * F.col("xi")).cast("bigint").alias(f"p{j}_micro")
        )
    return ex.groupBy("vec_id").agg(*aggs)


# --------------------------------------------------------------------------
# product quantization (IVF-PQ's other half): codebooks, encoding, ADC top-k


def _d2_micro(a: Column, b: Column) -> Column:
    """Squared L2 between two float arrays as BIGINT 1e-5 units:
    the zip_with/aggregate fold is sequential (bit-identical to the
    DuckDB list fold over the same doubles), and the floor(x·1e5 + .5)
    integerization makes every downstream comparison and SUM exact and
    order-independent — the same reason the LUT sums below can run in
    any partition order on both engines."""
    d2 = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(d2 * 100000.0 + F.lit(0.5)).cast("bigint")


def pq_codebooks(
    embeddings: DataFrame, m: int = 4, k: int = 16, d_sub: int = 16
) -> DataFrame:
    """Deterministic PQ "training": one ``k``-entry codebook per
    subspace, rows (subspace, code, c_sub). The ``k`` corpus vectors
    with the smallest md5(vec_id) seed the codes (codes 0..k-1 in that
    order — `deterministic_centroids`' replayable stand-in for the
    per-subspace k-means a production PQ trains; the ENCODE/ADC
    machinery is identical either way, which is what's under test).
    Each seed contributes its slice to every subspace's book."""
    w = Window.orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    seeds = (
        embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(k)
        .withColumn("code", F.row_number().over(w) - 1)
    )
    return seeds.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("subspace"),
        "code",
        "embedding",
    ).select(
        "subspace",
        "code",
        F.slice(
            F.col("embedding"), F.col("subspace") * d_sub + 1, F.lit(d_sub)
        ).alias("c_sub"),
    )


def _books_array(codebooks: DataFrame) -> DataFrame:
    """One-row frame: ``books`` = array over subspace of (subspace,
    entries: array of (code, c_sub) sorted by code) — the broadcastable
    shape every map-side PQ pass reads (m·k sub-vectors ≈ KBs)."""
    return (
        codebooks.groupBy("subspace")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("code", "c_sub"))
            ).alias("entries")
        )
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("subspace", "entries"))
            ).alias("books")
        )
    )


def _argmin_code(sub: Column, entries: Column) -> Column:
    """Code of the nearest codebook entry to ``sub`` (integer-micro
    squared L2, strict < over code-ascending entries keeps the lowest
    code on ties — same order as ORDER BY d2, code)."""
    from ..functions.expr import let

    return F.aggregate(
        entries,
        F.struct(
            F.lit(1 << 62).cast("bigint").alias("d"),
            F.lit(-1).cast("int").alias("code"),
        ),
        lambda acc, e: let(
            _d2_micro(sub, e["c_sub"]),
            lambda d: F.when(
                d < acc["d"],
                F.struct(d.alias("d"), e["code"].cast("int").alias("code")),
            ).otherwise(acc),
        ),
        lambda acc: acc["code"],
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    d_sub: int = 16,
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ-encode the corpus: (vec_id, codes array<int> of length ``m``)
    — 64 floats compress to ``m`` byte-sized codes, the representation
    a 100 TB vector store actually keeps hot. Entirely map-side: the
    codebooks collapse to a one-row broadcast array and every vector's
    per-subspace argmin runs inside codegen; the encode pass costs zero
    shuffles at any corpus size."""
    cb = _books_array(codebooks)
    emb = F.col("embedding")
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_code(
            F.slice(emb, s * d_sub + 1, F.lit(d_sub)),
            F.element_at(F.col("books"), s + 1)["entries"],
        ),
    )
    return (
        embeddings.crossJoin(F.broadcast(cb))
        .select(F.col(id_col), codes.alias("codes"))
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    d_sub: int = 16,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ-encoded corpus — the
    Jégou et al. 2011 search shape Faiss's IVF-PQ uses: per query,
    precompute the m×k lookup table of exact squared distances from the
    query's sub-vectors to every codebook entry, then score each
    encoded vector with ``m`` table lookups instead of ``d`` float ops.

    Scale shape (100 TB): the LUT frame is (queries × m·k ints) —
    broadcast; the corpus side touches only the CODES table (the
    ~16-byte-per-vector index, not the raw embeddings), and scoring is
    a map-side fold of m array lookups per (vector, query). The only
    shuffle is the final per-query top-k window. Distances stay BIGINT
    micro-units end to end, so sums/ranks are exact in both engines;
    ties break by vec_id. Output: (query_id, vec_id, adc_d2, rank).
    """
    books = pq_codebooks(embeddings, m, k_codes, d_sub)
    cb = _books_array(books)
    enc = pq_encode(embeddings, books, m, d_sub)
    q_emb = F.col("q_embedding")
    lut = F.transform(
        F.col("books"),
        lambda b: F.transform(
            b["entries"],
            lambda e: _d2_micro(
                F.slice(q_emb, b["subspace"] * d_sub + 1, F.lit(d_sub)),
                e["c_sub"],
            ),
        ),
    )
    luts = queries.crossJoin(F.broadcast(cb)).select(
        query_id, lut.alias("lut")
    )
    dist_u = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("bigint"),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(F.col("lut"), s + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        ),
    )
    scored = (
        enc.crossJoin(F.broadcast(luts))
        .where(F.col("vec_id") != F.col(query_id))
        .select(query_id, "vec_id", dist_u.alias("dist_u"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("dist_u").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            "vec_id",
            F.round(F.col("dist_u") / 100000.0, 5).alias("adc_d2"),
            "rank",
        )
        .orderBy(query_id, "rank")
    )


def pq_rerank_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    m: int = 4,
    k_codes: int = 16,
    d_sub: int = 16,
    shortlist: int = 20,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """The full two-stage IVF-PQ retrieval shape: ADC over the encoded
    corpus produces a ``shortlist`` of candidates per query (cheap — m
    integer lookups per vector, codes table only), then ONLY those
    candidates rejoin the raw embeddings for an exact squared-L2
    re-rank to the final ``k``. This is how a production PQ store
    answers queries: the approximate stage bounds how many full-width
    vectors are ever touched (shortlist·|Q| rows, not N·|Q|).

    Scale shape: stage 1 is `pq_adc_topk` (broadcast LUTs over the
    codes table); stage 2's equi-join on vec_id pulls ``shortlist``
    embeddings per query — with AQE that's a broadcast of the tiny
    candidate set against the corpus scan, and the exact distances are
    integer-micro units (`_d2_micro`), so the final ranking is
    engine-exact with (d2, vec_id) tie-breaks. Output:
    (query_id, vec_id, exact_d2, rank)."""
    cand = pq_adc_topk(
        embeddings, queries, m, k_codes, d_sub, shortlist, query_id
    ).select(query_id, "vec_id")
    exact = (
        cand.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(
            F.broadcast(queries.select(query_id, "q_embedding")), query_id
        )
        .select(
            query_id,
            "vec_id",
            _d2_micro(F.col("embedding"), F.col("q_embedding")).alias(
                "d2u"
            ),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("d2u").asc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            "vec_id",
            F.round(F.col("d2u") / 100000.0, 5).alias("exact_d2"),
            "rank",
        )
        .orderBy(query_id, "rank")
    )


def hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    ``k`` most cosine-similar corpus vectors whose label DIFFERS from
    the query's — the examples a retrieval/embedding trainer most
    needs in its negative pool (easy negatives are free; hard ones
    require exactly this search). Same broadcast-scan cost and
    (round5 sim, vec_id) determinism as `brute_force_topk`; the label
    inequality is a map-side filter, and at scale the scan is replaced
    by any ANN stage above without changing the contract. queries:
    (query_id, q_embedding, q_label). Output:
    (query_id, vec_id, neg_label, cosine_sim, rank)."""
    joined = embeddings.crossJoin(
        F.broadcast(queries.select(query_id, "q_embedding", "q_label"))
    ).where(
        (F.col("vec_id") != F.col(query_id))
        & (F.col(label_col) != F.col("q_label"))
    )
    scored = joined.select(
        F.col(query_id),
        F.col("vec_id"),
        F.col(label_col).cast("int").alias("neg_label"),
        F.round(
            cosine(F.col("embedding"), F.col("q_embedding")), 5
        ).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "vec_id", "neg_label", "cosine_sim", "rank")
        .orderBy(query_id, "rank")
    )


def prototype_classify(
    embeddings: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Nearest-class-prototype evaluation: per-label mean vectors
    (prototypes) from integer-micro per-dimension sums — exact and
    partition-order-independent, the float-accumulation discipline the
    cosine family already uses — then every vector is assigned to its
    nearest prototype by cosine and the per-(label, predicted) counts
    come back as the confusion table. The standard quick probe of
    embedding quality (a linear-probe stand-in that needs no trainer).

    Scale shape: prototype sums are ONE map-side-combinable aggregate
    over (dim, label) keyed by posexplode — |labels|·d rows out; the
    prototype table collapses to a one-row broadcast array and the
    assignment fold is pure codegen (zero shuffles); the confusion
    aggregate is combinable. Output:
    (label, predicted, n) ordered by (label, predicted)."""
    dim_sums = (
        embeddings.select(
            F.col(label_col).alias("label"),
            F.posexplode("embedding").alias("pos", "x"),
        )
        .groupBy("label", "pos")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * 1000000.0).cast("bigint")
            ).alias("s_u"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    protos = (
        dim_sums.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "pos",
                        ((F.col("s_u") / F.col("n")) / 1000000.0).alias("v"),
                    )
                )
            ).alias("pv")
        )
        .select(
            F.col("label").alias("p_label"),
            F.transform(F.col("pv"), lambda e: e["v"]).alias("p_vec"),
        )
    )
    parr = protos.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("p_label"), F.col("p_vec")))
        ).alias("ps")
    )

    def _nearest(vec: Column, ps: Column) -> Column:
        from ..functions.expr import let

        def _fold(nv: Column) -> Column:
            return F.aggregate(
                ps,
                F.struct(
                    F.lit(-2.0).alias("sim"),
                    F.lit(-1).cast("int").alias("lab"),
                ),
                lambda acc, p: let(
                    F.round(
                        _dot(vec, p["p_vec"]) / (nv * _norm(p["p_vec"])), 5
                    ),
                    lambda s: F.when(
                        s > acc["sim"],
                        F.struct(
                            s.alias("sim"),
                            p["p_label"].cast("int").alias("lab"),
                        ),
                    ).otherwise(acc),
                ),
            )["lab"]

        return let(_norm(vec), _fold)

    assigned = embeddings.crossJoin(F.broadcast(parr)).select(
        F.col(label_col).cast("int").alias("label"),
        _nearest(F.col("embedding"), F.col("ps")).alias("predicted"),
    )
    return (
        assigned.groupBy("label", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("label", "predicted")
    )


def matryoshka_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    prefix_dims: int = 16,
    shortlist: int = 20,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Matryoshka two-stage retrieval (Kusupati et al. 2022 MRL
    embeddings): stage 1 scores the corpus with the FIRST
    ``prefix_dims`` dimensions only (an MRL-trained embedding packs a
    coarse representation into every prefix) and shortlists
    ``shortlist`` candidates per query; stage 2 re-ranks only the
    shortlist with full-dimension cosine and keeps top ``k``. The
    dim-sliced sibling of PQ's two-stage ADC→exact retrieval: stage 1
    reads prefix_dims/D of the vector bytes — at 100 TB that is the
    difference between scanning 25 GB and 100 GB per query batch, and
    a columnar layout that stores prefixes separately prunes the scan
    for real.

    Determinism: both stages rank by (round5 cosine DESC, vec_id) —
    the whole cosine family's total order; the stage-1 cut is
    therefore engine-stable and the oracle replays it exactly.
    Output: (query_id, vec_id, prefix_sim, cosine_sim, rank)."""
    pre = F.slice(F.col("embedding"), 1, prefix_dims)
    qpre = F.slice(F.col("q_embedding"), 1, prefix_dims)
    joined = embeddings.crossJoin(
        F.broadcast(queries.select(query_id, "q_embedding"))
    ).where(F.col("vec_id") != F.col(query_id))
    stage1 = joined.select(
        F.col(query_id),
        "vec_id",
        "embedding",
        "q_embedding",
        F.round(cosine(pre, qpre), 5).alias("prefix_sim"),
    )
    w1 = Window.partitionBy(query_id).orderBy(
        F.col("prefix_sim").desc(), F.col("vec_id").asc()
    )
    short = stage1.withColumn("srn", F.row_number().over(w1)).where(
        F.col("srn") <= shortlist
    )
    rer = short.select(
        F.col(query_id),
        "vec_id",
        "prefix_sim",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias(
            "cosine_sim"
        ),
    )
    w2 = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col("vec_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            query_id,
            "vec_id",
            "prefix_sim",
            "cosine_sim",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy(query_id, "rank")
    )


def kcenter_coreset(
    embeddings: DataFrame,
    k: int = 5,
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal, the classic 2-approximation): start from the lowest
    vec_id, then k-1 times pick the vector FARTHEST from the selected
    set (max over the corpus of min distance to any selected center;
    ties on min vec_id). The diversity-selection dual of semantic
    dedup — instead of dropping redundant points, pick the maximally
    spread subset (active-learning / annotation-budget selection).

    Exactness: every distance is `_d2_micro` (BIGINT 1e-5 units), so
    min/max/argmax are integer comparisons with a vec_id tiebreak —
    both engines replay the identical greedy trajectory. The reported
    radius_micro of each pick is its distance to the PREVIOUSLY
    selected set (the coverage radius the k-center bound speaks about;
    the seed's is NULL).

    Scale shape: k-1 rounds, each ONE map-side pass over the corpus
    against a broadcast <=k-row center set (no corpus-sized shuffle at
    all — the argmax is a 1-row reduce), with the center set
    checkpoint-pinned per round (the dup_clusters iterative
    discipline). k is a constant (annotation budgets are small);
    corpus size only enters linearly per round."""
    base = embeddings.select("vec_id", "embedding")
    sel = (
        base.orderBy("vec_id")
        .limit(1)
        .select(
            "vec_id",
            "embedding",
            F.lit(1).alias("pick"),
            F.lit(None).cast("bigint").alias("radius_micro"),
        )
        .localCheckpoint(eager=False)
    )
    for i in range(2, k + 1):
        centers = sel.select(
            F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
        )
        dists = (
            base.crossJoin(F.broadcast(centers))
            .select(
                "vec_id",
                "embedding",
                _d2_micro(F.col("embedding"), F.col("c_vec")).alias("d2u"),
            )
            .groupBy("vec_id")
            .agg(
                F.first("embedding").alias("embedding"),
                F.min("d2u").alias("mind"),
            )
        )
        # the per-round argmax is a TakeOrdered limit-1 (per-partition
        # top-1 then a 1-row driver-side merge) — NOT a global window,
        # which would shuffle the corpus-sized dists frame (embeddings
        # included) onto one task every round
        nxt = (
            dists.orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .limit(1)
            .select(
                "vec_id",
                "embedding",
                F.lit(i).alias("pick"),
                F.col("mind").alias("radius_micro"),
            )
        )
        sel = sel.unionAll(nxt).localCheckpoint(eager=False)
    return sel.select(
        F.col("pick").cast("int").alias("pick"),
        "vec_id",
        "radius_micro",
    ).orderBy("pick")


def mmr_rerank(
    embeddings: DataFrame,
    queries: DataFrame,
    lam: float = 0.7,
    shortlist: int = 20,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): per query, greedily pick k results maximizing
    λ·sim(q, d) − (1−λ)·max_{s∈selected} sim(d, s) — relevance traded
    against redundancy, the diversity re-rank every RAG/retrieval
    stack wants when the corpus is near-dup-heavy (plain top-k returns
    five copies of the same paragraph; MMR returns one plus four
    genuinely different hits).

    Determinism: all similarities are round5 cosines; the MMR score is
    one double expression over two round5 values (identical operand
    bits → identical IEEE result in both engines), ties broken on
    vec_id — both engines replay the same greedy trajectory.

    Scale shape: ONE corpus-sized stage (the broadcast-query shortlist
    top-``shortlist`` window); everything after runs on the
    shortlist×shortlist pair table — CONSTANT size per query
    regardless of corpus size — through k-1 checkpoint-pinned argmax
    rounds. Output: (query_id, vec_id, cosine_sim, mmr_score, rank)
    with rank 1's mmr_score = its plain relevance."""
    joined = embeddings.crossJoin(
        F.broadcast(queries.select(query_id, "q_embedding"))
    ).where(F.col("vec_id") != F.col(query_id))
    scored = joined.select(
        F.col(query_id),
        "vec_id",
        "embedding",
        F.round(cosine(F.col("embedding"), F.col("q_embedding")), 5).alias(
            "sim"
        ),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    cands = (
        scored.withColumn("srn", F.row_number().over(w))
        .where(F.col("srn") <= shortlist)
        .select(query_id, "vec_id", "embedding", "sim")
        .localCheckpoint(eager=False)
    )
    a = cands.alias("a")
    b = cands.alias("b")
    pair = (
        a.join(
            b,
            (F.col(f"a.{query_id}") == F.col(f"b.{query_id}"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col(f"a.{query_id}").alias(query_id),
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 5
            ).alias("sim_ab"),
        )
        .localCheckpoint(eager=False)
    )
    wq = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("vec_id").asc()
    )
    sel = (
        cands.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") == 1)
        .select(
            query_id,
            "vec_id",
            F.col("sim").alias("cosine_sim"),
            F.col("sim").alias("mmr_score"),
            F.lit(1).alias("rank"),
        )
        .localCheckpoint(eager=False)
    )
    for i in range(2, k + 1):
        chosen = sel.select(query_id, F.col("vec_id").alias("vb"))
        remaining = cands.join(
            sel.select(query_id, "vec_id"), [query_id, "vec_id"], "left_anti"
        )
        red = (
            pair.join(chosen, [query_id, "vb"])
            .groupBy(query_id, F.col("va").alias("vec_id"))
            .agg(F.max("sim_ab").alias("max_red"))
        )
        scored_i = remaining.join(red, [query_id, "vec_id"]).select(
            query_id,
            "vec_id",
            F.col("sim"),
            (
                F.lit(float(lam)) * F.col("sim")
                - F.lit(1.0 - float(lam)) * F.col("max_red")
            ).alias("mmr"),
        )
        wpick = Window.partitionBy(query_id).orderBy(
            F.col("mmr").desc(), F.col("vec_id").asc()
        )
        nxt = (
            scored_i.withColumn("rn", F.row_number().over(wpick))
            .where(F.col("rn") == 1)
            .select(
                query_id,
                "vec_id",
                F.col("sim").alias("cosine_sim"),
                F.round(F.col("mmr"), 5).alias("mmr_score"),
                F.lit(i).alias("rank"),
            )
        )
        sel = sel.unionAll(nxt).localCheckpoint(eager=False)
    return sel.select(
        query_id,
        "vec_id",
        "cosine_sim",
        "mmr_score",
        F.col("rank").cast("int").alias("rank"),
    ).orderBy(query_id, "rank")


def ann_ndcg_audit(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 2,
    query_id: str = "query_id",
) -> DataFrame:
    """NDCG@k audit of the IVF approximate retrieval path against the
    exact brute-force ranking — the position-aware upgrade over
    `ann_recall_audit`'s set overlap: recall says WHETHER the true
    hits were found, NDCG says whether they surfaced in the right
    ORDER (gain k+1−exact_rank, discount 1/log2(pos+1), the standard
    graded formulation with exact-rank-derived integer gains).

    Determinism: gains are integers from engine-exact top-k sets; DCG
    and IDCG are SEQUENTIAL folds over pos-sorted arrays (never an
    unordered float sum — 5-term double addition order would be the
    only nondeterminism, so it is removed); log2 runs k times per
    query (the bounded-transcendental exposure class). Output:
    (query_id, dcg, idcg, ndcg)."""
    ex = brute_force_topk(embeddings, queries, k, query_id).select(
        query_id, "vec_id", F.col("rank").alias("ex_rank")
    )
    ap = ivf_topk(
        embeddings, queries, k, n_centroids, nprobe, query_id
    ).select(query_id, "vec_id", F.col("rank").alias("pos"))
    rel = ap.join(ex, [query_id, "vec_id"], "left").select(
        query_id,
        "pos",
        F.coalesce(k + 1 - F.col("ex_rank"), F.lit(0)).alias("rel"),
    )
    folded = rel.groupBy(query_id).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("pos", "rel"))),
            F.lit(0.0),
            lambda acc, e: acc
            + e["rel"].cast("double")
            / F.log2(e["pos"].cast("double") + 1),
        ).alias("dcg")
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.lit(k)),
        F.lit(0.0),
        lambda acc, r: acc
        + (k + 1 - r).cast("double") / F.log2(r.cast("double") + 1),
    )
    return (
        folded.withColumn("idcg", idcg)
        .select(
            query_id,
            F.round(F.col("dcg"), 6).alias("dcg"),
            F.round(F.col("idcg"), 6).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
        )
        .orderBy(query_id)
    )


def centroid_drift(
    embeddings: DataFrame,
    split: Column,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-distribution drift between two sub-corpora: the cosine
    between the two splits' CENTROIDS (plus the centroid-norm ratio) —
    the cheap first-line drift monitor for an embedding pipeline
    (re-embedded corpus vs old, new crawl vs reference; cosine near 1
    = stable, drops = the space moved). ``split`` must evaluate 0/1.

    Exactness discipline: float sums are order-dependent, so every
    element is quantized to integer 1e-5 units FIRST
    (floor(CAST AS DOUBLE · 1e5) — the cross-engine-exact float
    quantization from the verify contract); per-dimension sums are
    then exact integers in any partition order, dot/norm products run
    in DECIMAL(38,0) (a 64-dim corpus of ~5e3 vectors already
    overflows bigint), and the only floats are the final sqrt/divide
    (IEEE-correctly-rounded in both engines). cosine(sum_a, sum_b) ==
    cosine(centroid_a, centroid_b) — scale invariance, so no division
    by n ever happens.

    Scale shape: one posexplode (rows × dims — the same budget as any
    per-dimension aggregate), one combinable (split, dim) groupBy, a
    dims-sized join + 1-row reduce. Output: one row
    (n_a, n_b, centroid_cosine, centroid_norm_ratio)."""
    base = embeddings.select(
        split.cast("int").alias("s"), F.col(vec_col).alias("v")
    )
    el = base.select(
        "s", F.posexplode("v").alias("d", "x")
    ).select(
        "s",
        "d",
        F.floor(F.col("x").cast("double") * 100000.0)
        .cast("bigint")
        .alias("xu"),
    )
    sums = el.groupBy("d").agg(
        F.sum(F.when(F.col("s") == 0, F.col("xu")).otherwise(0))
        .alias("sa"),
        F.sum(F.when(F.col("s") == 1, F.col("xu")).otherwise(0))
        .alias("sb"),
    )
    dec = "decimal(19,0)"
    agg = sums.agg(
        F.sum(F.col("sa").cast(dec) * F.col("sb")).alias("dot"),
        F.sum(F.col("sa").cast(dec) * F.col("sa")).alias("na2"),
        F.sum(F.col("sb").cast(dec) * F.col("sb")).alias("nb2"),
    )
    counts = base.groupBy().agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
    )
    cos = F.when(
        (F.col("na2") > 0) & (F.col("nb2") > 0),
        F.col("dot").cast("double")
        / (
            F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double"))
        ),
    )
    ratio = F.when(
        (F.col("nb2") > 0) & (F.col("n_a") > 0) & (F.col("n_b") > 0),
        (F.sqrt(F.col("na2").cast("double")) / F.col("n_a"))
        / (F.sqrt(F.col("nb2").cast("double")) / F.col("n_b")),
    )
    return counts.crossJoin(F.broadcast(agg)).select(
        "n_a",
        "n_b",
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(ratio, 6).alias("centroid_norm_ratio"),
    )
