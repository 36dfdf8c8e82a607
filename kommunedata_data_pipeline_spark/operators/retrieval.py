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
