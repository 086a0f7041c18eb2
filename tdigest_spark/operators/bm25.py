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

__all__ = ["bm25_scores", "bm25_topk", "bm25_topk_multi"]


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
    require_all: bool = False,
    phrase: str | None = None,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms``: (id, score).
    Documents matching NO query term are omitted (score would be 0;
    at scale emitting the whole corpus with zeros is the bug).
    Deterministic for a fixed corpus + query.

    ``require_all`` switches to AND semantics: only documents matching
    EVERY query term score (bag-of-words OR is the default, and its
    false positives — one rare term outscoring a full match — are the
    first thing real retrieval users hit). Implemented as a count on
    the per-doc aggregate that already runs: zero extra shuffle.

    ``phrase`` keeps only documents whose token stream contains the
    phrase's tokens CONTIGUOUSLY in order (whitespace-normalized, the
    corpus tokenizer's view) — full-phrase semantics, strictly stronger
    than a bigram AND. Corpus statistics (N, avgdl, df) stay
    corpus-wide, matching standard engines where a phrase filter
    restricts candidates, not the collection model; the match flag is
    a codegen ``contains`` over the already-built token array, no
    extra pass."""
    if not query_terms:
        raise ValueError("bm25_scores: query_terms is empty")
    terms = [t.lower() if lowercase else t for t in query_terms]
    toks = _tokens_expr(text_col, lowercase)
    base_cols = [
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__dl"),
    ]
    if phrase is not None:
        p = phrase.lower() if lowercase else phrase
        p_norm = " ".join(t for t in p.split(" ") if t)
        if not p_norm:
            raise ValueError("bm25_scores: phrase is empty")
        # pad both sides with a space so matches respect token
        # boundaries ("rat" never matches inside "grate")
        base_cols.append(
            F.contains(
                F.concat(F.lit(" "), F.concat_ws(" ", toks), F.lit(" ")),
                F.lit(f" {p_norm} "),
            ).alias("__ph")
        )
    base = docs.select(*base_cols)
    # N and avgdl: one 1-row aggregate, broadcast cross join
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    # fan out ONLY matching tokens: filter before the explode output
    # reaches the groupBy, so the shuffle carries query-term hits only
    carry = [id_col, "__dl"] + (["__ph"] if phrase is not None else [])
    hits = (
        base.select(*carry, F.explode("__toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy(*carry, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # df is corpus-wide (computed BEFORE the phrase filter restricts
    # the candidate set — the collection model doesn't shrink)
    df_ = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if phrase is not None:
        hits = hits.where(F.col("__ph"))
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
    agg = scored.groupBy(id_col).agg(
        F.sum("__term_score").alias("score"),
        # hits are per (doc, term), so count(*) here IS the number of
        # distinct query terms the doc matched
        F.count(F.lit(1)).alias("__matched"),
    )
    if require_all:
        agg = agg.where(F.col("__matched") == len(set(terms)))
    return agg.select(id_col, "score")


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    require_all: bool = False,
    phrase: str | None = None,
) -> DataFrame:
    """Top-``k`` documents for a free-text query: (rank, id, score),
    deterministic tie-break (score desc, id asc). The query tokenizes
    with the same rule as the corpus (duplicate query terms count
    once — standard bag-of-terms BM25). ``require_all`` = AND
    semantics, ``phrase`` = contiguous-phrase candidate filter — see
    :func:`bm25_scores`."""
    if k < 1:
        raise ValueError(f"bm25_topk: k must be >= 1, got {k}")
    q = query.lower() if lowercase else query
    terms = sorted({t for t in q.split(" ") if t})
    s = bm25_scores(
        docs, id_col, text_col, terms, k1=k1, b=b, lowercase=lowercase,
        require_all=require_all, phrase=phrase,
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-k then a k-row merge) — never a single-task global window
    top = s.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "score"
    )


def bm25_topk_multi(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    queries: DataFrame,
    query_id: str,
    query_text: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    lowercase: bool = True,
    return_scores: bool = False,
    require_all: bool = False,
) -> DataFrame:
    """Top-``k`` documents per query for a QUERY TABLE — the
    decontamination / batch-retrieval form (one corpus pass for all
    queries, vs calling :func:`bm25_topk` per query).
    ``require_all`` = AND semantics per query (each query's own term
    count is the bar; a broadcast join of the O(queries) count table).

    Scale shape: the (query, term) table is distinct query terms —
    broadcast-small by the same contract as the similarity stack's
    query sets; the corpus tokenizes ONCE and the broadcast semi-join
    keeps only tokens matching ANY query's terms before the (doc,
    term) groupBy, so the one real shuffle carries hits for the union
    of query vocabularies. df/idf are corpus-wide per term (computed
    once, shared by every query using the term), then per-(query, doc)
    scores aggregate and a per-query WindowGroupLimit takes top-k.
    Output: (query_id, rank, id, score)."""
    if k < 1:
        raise ValueError(f"bm25_topk_multi: k must be >= 1, got {k}")
    qt = F.col(query_text)
    if lowercase:
        qt = F.lower(qt)
    q_terms = queries.select(
        F.col(query_id),
        F.explode(F.array_distinct(F.filter(F.split(qt, " "), lambda x: x != ""))).alias(
            "term"
        ),
    )
    toks = _tokens_expr(text_col, lowercase)
    base = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__dl"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
    )
    vocab = q_terms.select("term").distinct()
    # tf per (doc, term) for terms in ANY query — ONE corpus shuffle
    hits = (
        base.select(id_col, "__dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(vocab), "term")
        .groupBy(id_col, "__dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    term_scores = (
        hits.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
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
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
                )
            ).alias("__ts"),
        )
    )
    per_query = (
        term_scores.join(F.broadcast(q_terms), "term")
        .groupBy(query_id, id_col)
        .agg(
            F.sum("__ts").alias("score"),
            F.count(F.lit(1)).alias("__matched"),
        )
    )
    if require_all:
        q_counts = q_terms.groupBy(query_id).agg(
            F.count(F.lit(1)).alias("__qn")
        )
        per_query = per_query.join(F.broadcast(q_counts), query_id).where(
            F.col("__matched") == F.col("__qn")
        )
    per_query = per_query.select(query_id, id_col, "score")
    if return_scores:
        # unranked (query, doc, score) rows — for callers that rank on
        # a ROUNDED score (cross-engine float-stable ordering) or feed
        # a downstream fusion
        return per_query
    w = Window.partitionBy(query_id).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        per_query.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "score")
    )
