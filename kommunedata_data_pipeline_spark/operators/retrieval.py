"""Ranked-retrieval primitives over the document corpus.

A training-data pipeline needs lightweight lexical retrieval long before
it needs a vector store: contamination probes ("which training docs
score highest against this eval question"), boilerplate hunting, and
targeted curation are all "score every document against a small term
set" problems. BM25 is the standard scoring function; expressed
relationally it is two aggregations and three broadcast joins — no
per-document loop, no index server.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def bm25_topk(
    documents: DataFrame,
    terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 against a fixed query-term set.

    score(D) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf + k1·(1−b+b·|D|/avgdl)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene-positive form).

    Scale shape: one tokenize+explode pass feeds BOTH the doc-length
    aggregation and the term-filtered tf aggregation (the term filter
    lands right after the explode, so only query-term postings ever
    reach a shuffle); df and the corpus stats are tiny aggregates
    broadcast back. Total: two map-side-combinable groupBys over the
    corpus + joins whose build sides are |terms| and 1 rows. The final
    top-k is a rounded-score sort with doc_id tiebreak (total order).
    """
    # ONE tokenize pass for both doc length and term frequencies: map
    # non-query tokens to a null marker before the aggregation, so the
    # per-(doc, marker) counts carry dl (= sum over markers) AND tf
    # (= the non-null marker rows). Without this, doclen and tf would
    # each re-run the normalize+explode over the corpus.
    from .dedup import _ensure_parallel

    toks = _ensure_parallel(documents).select(
        "doc_id",
        F.explode(F.split(normalized_text(F.col("text")), " ")).alias("w"),
    )
    per = (
        toks.select(
            "doc_id",
            F.when(F.col("w").isin(list(terms)), F.col("w")).alias("qw"),
        )
        .groupBy("doc_id", "qw")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    doclen = per.groupBy("doc_id").agg(F.sum("c").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = per.where(F.col("qw").isNotNull()).select(
        "doc_id", F.col("qw").alias("w"), F.col("c").alias("tf")
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 4).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(topk)
    )


def tfidf_knn(
    documents: DataFrame,
    query_pred,
    k: int = 5,
    df_cap: int | None = 50,
    text_col: str = "text",
) -> DataFrame:
    """Sparse TF-IDF cosine k-nearest-neighbours: for every QUERY doc
    (``query_pred``), the ``k`` most similar corpus docs under
    TF-IDF-weighted cosine — the inverted-index text-similarity search
    that complements BM25 (query→doc relevance) and shingle Jaccard
    (set overlap): weighted sparse vectors, so a shared RARE term
    counts far more than shared boilerplate.

    Exactness discipline: idf = floor(1e3·ln(N/df)) computed once per
    term (bounded transcendental; milli-units keep Σw² comfortably
    inside BIGINT — w ≤ tf·1e3·ln(N), so Σw² < 1e14 even at 1e9 docs
    with tf 100); weights w = tf·idf_milli are exact
    BIGINTs, so the dot product and squared norms are pure integer
    sums — partition-order-independent — and only the final
    cosine = dot/(|a||b|) is a double, rounded to 5 with a doc_id
    tiebreak (the embedding-family total order).

    Scale shape: one (doc, term, tf) aggregate; a document-frequency
    cap drops terms in > ``df_cap`` docs (the quadratic-hot-key valve —
    exactly the terms whose idf ≈ 0 anyway); candidates come from ONE
    term equi-join of the query docs' postings against the corpus
    postings; per-pair integer dot groupBy; norms joined back. Never
    all-pairs. Output: (query_id, doc_id, cosine_sim, rank)."""
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id",
        query_pred.alias("__q"),
        F.explode(
            F.split(normalized_text(F.col(text_col)), " ")
        ).alias("term"),
    ).where(F.col("term") != "")
    # NOT pinned: an r12 A/B read the pinned-postings variant at the
    # same-or-worse wall (the tokenize is cheap and the 4 parallel
    # scan pipelines beat one cache materialization + 3 memory reads)
    tf = toks.groupBy("doc_id", "__q", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n"))
    capped = dfreq.where(F.col("df") <= df_cap) if df_cap is not None else dfreq
    idf = (
        capped
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.floor(
                F.lit(1e3) * F.log(F.col("n") / F.col("df"))
            ).cast("bigint").alias("idf3"),
        )
    )
    w = tf.join(idf, "term").select(
        "doc_id",
        "__q",
        "term",
        (F.col("tf") * F.col("idf3")).alias("w"),
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("n2")
    )
    qw = w.where(F.col("__q")).select(
        F.col("doc_id").alias("query_id"), "term", F.col("w").alias("wq")
    )
    cw = w.select("doc_id", "term", "w")
    dots = (
        qw.join(cw, "term")
        .where(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("wq") * F.col("w")).alias("dot"))
    )
    scored = (
        dots.join(
            norms.withColumnRenamed("doc_id", "query_id").withColumnRenamed(
                "n2", "nq2"
            ),
            "query_id",
        )
        .join(norms, "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("nq2")) * F.sqrt(F.col("n2"))),
                5,
            ).alias("cosine_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "cosine_sim",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )


def term_jaccard_topk(
    documents: DataFrame,
    terms: Sequence[str],
    topk: int = 20,
) -> DataFrame:
    """Top-k documents by Jaccard of the query-term SET vs the doc's
    distinct-token set — the set-overlap lexical ranker (the second
    signal a hybrid fusion wants next to BM25's tf-weighted one).
    One normalize+explode+distinct pass, one combinable per-doc
    aggregate with the term filter inside it; j = |∩| / (|doc set| +
    |terms| − |∩|) is an exact integer ratio rounded once. Output:
    (doc_id, tj) ordered (tj desc, doc_id), limit topk."""
    from .dedup import _ensure_parallel

    toks = _ensure_parallel(documents).select(
        "doc_id",
        F.explode(
            F.array_distinct(F.split(normalized_text(F.col("text")), " "))
        ).alias("w"),
    )
    per = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_set"),
        F.sum(
            F.when(F.col("w").isin(list(terms)), 1).otherwise(0)
        ).alias("inter"),
    )
    nt = len(set(terms))
    return (
        per.where(F.col("inter") > 0)
        .select(
            "doc_id",
            F.round(
                F.col("inter")
                / (F.col("n_set") + F.lit(nt) - F.col("inter")),
                6,
            ).alias("tj"),
        )
        .orderBy(F.desc("tj"), "doc_id")
        .limit(topk)
    )


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k0: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack/Clarke/Buettcher 2009) — the
    standard hybrid-search combiner: fuse any number of rankings of
    the same corpus by score(d) = Σ_lists 1/(k0 + rank_d), no score
    calibration needed (ranks only). The modern lexical+vector stack's
    default fusion (k0 = 60 from the paper).

    Exactness: each reciprocal is the INTEGER 1e9 div (k0 + rank)
    (floored micro-units — one integer division per membership, no
    float summation order), so fused scores and their ranking are
    bit-identical in both engines; ties break on id. Scale shape: the
    inputs are top-k frames (constant-size); one union + one
    combinable groupBy + a TakeOrdered head. Output: (id, n_lists,
    rrf_u) — rrf_u in 1e-9 units."""
    u = rankings[0].select(id_col, rank_col)
    for r in rankings[1:]:
        u = u.unionByName(r.select(id_col, rank_col))
    return (
        u.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_lists"),
            F.sum(
                F.expr(f"1000000000 div ({k0} + {rank_col})")
            ).cast("bigint").alias("rrf_u"),
        )
        .orderBy(F.desc("rrf_u"), id_col)
        .limit(topk)
    )
