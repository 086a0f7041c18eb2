"""Okapi BM25 document ranking — query-time retrieval scoring over a
document table, the standard lexical companion to the embedding
similarity stack (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond").

score(D, q) = Σ_t idf(t) · tf(t,D)·(k1+1) /
                    (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
with the Lucene non-negative idf: ln(1 + (N − df + 0.5)/(df + 0.5)).

Scale shape (all JVM built-ins, no UDFs):
- document length |D| is ``size(filter(split(text)))`` — narrow,
  computed inside the scan projection, NO shuffle;
- N and avgdl are one tiny global aggregate, broadcast back via a
  1-row cross join;
- the token fan-out is filtered to the QUERY'S terms before the
  (doc, term) groupBy, so the only real shuffle carries just
  query-term hits — O(docs containing a query term), not O(corpus
  tokens) (predicate pushes into the generator output; a 100 TB scan
  emits nothing for non-matching tokens);
- df per term is an O(|query|) aggregate off that same grouped table,
  joined back broadcast.

No reference counterpart (the reference is a numeric-sketch library);
this extends the training-data-pipeline text surface (SURVEY.md §2)
next to ``tfidf_top_terms`` — same tokenizer, so the two scorers are
comparable term-for-term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["bm25_scores", "bm25_topk"]


def _tokens_expr(text_col, lowercase: bool):
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, " "), lambda x: x != "")


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms``: (id, score).
    Documents matching NO query term are omitted (score would be 0;
    at scale emitting the whole corpus with zeros is the bug).
    Deterministic for a fixed corpus + query."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms is empty")
    terms = [t.lower() if lowercase else t for t in query_terms]
    toks = _tokens_expr(text_col, lowercase)
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__dl"),
    )
    # N and avgdl: one 1-row aggregate, broadcast cross join
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # fan out ONLY matching tokens: filter before the explode output
    # reaches the groupBy, so the shuffle carries query-term hits only
    hits = (
        base.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("__n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                    )
                )
            ).alias("__term_score"),
        )
    )
    return scored.groupBy(id_col).agg(F.sum("__term_score").alias("score"))


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` documents for a free-text query: (rank, id, score),
    deterministic tie-break (score desc, id asc). The query tokenizes
    with the same rule as the corpus (duplicate query terms count
    once — standard bag-of-terms BM25)."""
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1, got {k}")
    q = query.lower() if lowercase else query
    terms = sorted({t for t in q.split(" ") if t})
    s = bm25_scores(docs, id_col, text_col, terms, k1=k1, b=b, lowercase=lowercase)
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k then a k-row merge) — never a single-task global window
    top = s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score"
    )
