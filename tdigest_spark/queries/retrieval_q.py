"""Retrieval query family: BM25 ranking over ``documents`` with an
independent DuckDB BM25 oracle (round-4 addition; the slot was freed
by consolidating the two mm_* rows into one — SURVEY.md §8.3 swap
discipline).

Ranking is on the ROUNDED score in both engines: per-term BM25 values
come out of ``ln`` implementations that may differ in the last ulp
between the JVM and DuckDB's libm, so ordering by the raw double is
not cross-engine stable at exact ties — order by the rounded score
with a doc_id tie-break and the ranking is deterministic on both
sides. Round-5 hardening (ADVICE r4): the hashed row carries RANK
ONLY (no score column — a float that can straddle a rounding boundary
between the engines' libms), and the ranking round is coarsened to 4
decimals so near-ties collapse to the doc_id tie-break identically in
both engines instead of depending on a 0.5e-6 boundary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tdigest_spark.operators.bm25 import bm25_topk_multi
from tdigest_spark.sources.tables import load

# fixed probe queries (hit real vocabulary in the synthetic corpus)
PROBE_QUERIES = ["data quality", "the pipeline", "model training data"]
K = 10
K1, B = 1.2, 0.75


def rt_bm25_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": range(len(PROBE_QUERIES)), "qtext": PROBE_QUERIES})
    )
    s = bm25_topk_multi(
        docs, "doc_id", "text", qdf, "qid", "qtext",
        k=K, k1=K1, b=B, return_scores=True,
    ).withColumn("score", F.round("score", 4))
    w = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        s.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .select("qid", "rank", "doc_id")
    )


QUERIES = {"rt_bm25_rank_docs": rt_bm25_rank_docs}

_QVALS = ", ".join(
    f"({i}, '{q}')" for i, q in enumerate(PROBE_QUERIES)
)

ORACLES = {
    "rt_bm25_rank_docs": f"""
        WITH q(qid, qtext) AS (VALUES {_QVALS}),
        q_terms AS (
          SELECT DISTINCT qid, t.term
          FROM q, unnest(list_filter(string_split(lower(qtext), ' '),
                                     x -> x <> '')) AS t(term)
        ),
        base AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
          FROM documents
        ),
        lens AS (SELECT doc_id, len(toks) AS dl FROM base),
        stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
        hits AS (
          SELECT b.doc_id, t.term, count(*) AS tf
          FROM base b, unnest(b.toks) AS t(term)
          WHERE t.term IN (SELECT term FROM q_terms)
          GROUP BY b.doc_id, t.term
        ),
        dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY term),
        scored AS (
          SELECT qt.qid, h.doc_id,
                 round(sum(
                   ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (h.tf * ({K1} + 1.0))
                   / (h.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl))
                 ), 4) AS score
          FROM hits h
          JOIN q_terms qt USING (term)
          JOIN dfs d USING (term)
          JOIN lens l USING (doc_id)
          CROSS JOIN stats s
          GROUP BY qt.qid, h.doc_id
        ),
        ranked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY score DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT qid, rank, doc_id FROM ranked WHERE rank <= {K}
    """,
}
