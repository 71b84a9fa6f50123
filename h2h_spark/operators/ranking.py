"""Relevance ranking over the document corpus: BM25 scoring and the
inverted-index build that backs it (engine extension, SURVEY.md §2.3 E4 —
the retrieval side of the text-analysis family).

BM25 is the classic probabilistic relevance function (Robertson &
Spärck Jones; the idf variant is Lucene's non-negative form
``ln(1 + (N - df + 0.5) / (df + 0.5))``).  Everything here is built-in
``pyspark.sql.functions`` — whole-stage-codegen'd, no Python in the hot
path — and each operator has an exact ANSI-SQL twin in
``__spark_entry__``.

Scale notes (100 TB posture):
- The query-term filter is applied *before* the tf aggregate, so the
  explode → groupBy shuffle carries only postings of the query's terms,
  not the corpus vocabulary.
- Document length and corpus stats (N, avgdl) reach the scoring join as
  broadcast one-row aggregates — no driver action.
- Per-document scores sum fixed-point (decimal) per-term contributions,
  so the result is independent of Spark's partial-aggregation order —
  bit-identical to the serial SQL oracle.
- ``inverted_index`` is one explode → one map-side-combined groupBy:
  the postings shuffle is proportional to corpus token count, and the
  output is vocabulary-sized (tiny relative to input).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from h2h_spark.operators.dedup import tokens

__all__ = ["bm25_scores", "bm25_topk", "inverted_index"]


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """``(id, score)`` — BM25 relevance of every matching document.

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    over the query's terms, with ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))``.
    Documents containing none of the query terms are absent (score would
    be 0).  Per-term contributions are rounded to 6 digits and summed as
    ``decimal(18,6)`` so the total is order-independent; the final score
    is rounded to 4.
    """
    terms = [t.lower() for t in query_terms]
    # Per-document length over ALL tokens (no explode — array size).
    dl = df.select(
        F.col(id_col).alias("id"), F.size(tokens(text_col)).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # Postings restricted to query terms BEFORE the aggregate: the
    # shuffle carries only the query's postings.
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    # tf already holds one row per (doc, term): df is a plain count.
    docfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = F.round(idf * F.col("tf") * (k1 + 1.0) / denom, 6).cast(
        "decimal(18,6)"
    )
    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select("id", contrib.alias("__c"))
    )
    return (
        scored.groupBy("id")
        .agg(F.round(F.sum("__c").cast("double"), 4).alias("score"))
        .select(F.col("id").alias(id_col), "score")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 (score desc, id asc — deterministic).

    ``orderBy().limit()`` compiles to TakeOrderedAndProject: per-partition
    heaps of size k, never a full sort shuffle.
    """
    scores = bm25_scores(df, id_col, text_col, query_terms, k1=k1, b=b)
    return scores.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def inverted_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    min_df: int = 1,
) -> DataFrame:
    """Term-level postings summary: ``(term, df, total_tf, first_doc)``.

    ``df`` = number of documents containing the term, ``total_tf`` = total
    occurrences, ``first_doc`` = smallest document id containing it (the
    head of the posting list, a cheap stand-in proof that posting order
    is available).  One explode feeds one map-side-combined aggregate;
    the intermediate (doc, term) tf table is the posting list itself —
    materialize it instead of this summary to build a real index.
    """
    postings = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )
    out = postings.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.min("id").alias("first_doc"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out
