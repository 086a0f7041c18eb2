"""TF-IDF term scoring — the canonical corpus-statistics text op.

``tfidf_top_terms`` returns each document's top-k terms by
``tf * idf`` with smooth idf ``ln((1 + N) / (1 + df)) + 1`` (the
add-one form that keeps terms present in every document from zeroing
out). All Spark built-ins:

- tokenize: ``explode(split(lower(text)))`` — one narrow fan-out,
- tf: groupBy (doc, term) — ONE shuffle of (doc, term) pairs,
- df: distinct terms per doc re-aggregated by term — rides the same
  (doc, term) grouping, then an O(vocabulary) aggregate,
- idf join: the vocabulary table is O(distinct terms) — broadcast,
- top-k: window row_number per doc with a deterministic tie-break
  (score desc, term asc).

Scale shape: the big shuffle carries (doc_id, term) pairs once; the
vocabulary side is small relative to the corpus and broadcasts. For a
100 TB corpus where even the vocabulary is huge, cap it first with
``min_df`` (rare-term noise is also statistically useless) or feed the
heavy-hitter sketch's candidate vocabulary in as a semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["tfidf_top_terms"]


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` terms per document: ``(id, term, tf, df, score,
    rank)``. Terms are whitespace tokens (empty tokens dropped);
    ``min_df`` drops terms appearing in fewer documents. Deterministic:
    ties break by term ascending."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tokens = (
        docs.select(F.col(id_col), F.explode(F.split(t, " ")).alias("term"))
        .filter(F.col("term") != "")
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        df_ = df_.filter(F.col("df") >= min_df)
    n_docs = docs.select(id_col).distinct().count()
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df"))) + F.lit(
        1.0
    )
    scored = tf.join(F.broadcast(df_), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        (F.col("tf") * idf).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
