"""Hybrid retrieval — reciprocal-rank fusion (RRF) of ranked lists,
the standard way to combine lexical (BM25) and embedding (ANN)
retrieval (Cormack, Clarke & Buettcher, SIGIR 2009: RRF outperforms
either list alone and needs no score calibration).

RRF(d) = Σ_lists 1 / (rrf_k + rank_list(d)) — rank-based, so the
incomparable score scales of BM25 and cosine never need normalizing.

Scale shape: the inputs are ALREADY top-k tables (O(queries × k)
rows — candidate lists, not corpora), so fusion is a union + one
groupBy on (query, doc) over tiny data; the expensive work happened
inside the upstream retrievers (``bm25_topk``, ``cosine_topk``,
``pq_topk`` — each with its own documented scale shape). Rankers that
emit no ``query_id`` column (single-query ``bm25_topk``) fuse with a
literal query id.

No reference counterpart; extends the training-data-pipeline
retrieval surface next to ``bm25.py`` / ``pq.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["rrf_fuse"]


def rrf_fuse(
    ranked: list[DataFrame],
    id_col: str,
    k: int = 10,
    rrf_k: int = 60,
    query_col: str | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked candidate lists into one top-``k``.

    Each input needs ``rank_col`` (1-based) and ``id_col``; pass
    ``query_col`` when fusing per-query tables (multi-query retrieval)
    — otherwise all rows fuse into one list. Output:
    (query?, rank, id, rrf_score), ties broken by id ascending.
    Documents appearing in only some lists simply collect fewer
    reciprocal terms (the RRF contract — no outer-join NULL handling
    needed).
    """
    if not ranked:
        raise ValueError("rrf_fuse: no ranked inputs")
    if k < 1 or rrf_k < 1:
        raise ValueError("rrf_fuse: k and rrf_k must be >= 1")
    keys = ([query_col] if query_col else []) + [id_col]
    parts = [
        df.select(
            *keys,
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(rank_col))).alias("__rr"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy(*keys).agg(F.sum("__rr").alias("rrf_score"))
    order = [F.col("rrf_score").desc(), F.col(id_col).asc()]
    if query_col:
        w = Window.partitionBy(query_col).orderBy(*order)
        return (
            fused.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_col, "rank", id_col, "rrf_score")
        )
    top = fused.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", id_col, "rrf_score"
    )
