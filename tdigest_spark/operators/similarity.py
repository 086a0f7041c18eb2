"""Similarity search over embedding columns (``array<float>``):
exact brute-force cosine top-k as the baseline, and an LSH
(random-hyperplane) bucketed path for scale.

Scale shape:
* brute-force path: queries are broadcast (small side), the corpus
  never shuffles; dot products are JVM ``zip_with``/``aggregate``
  expressions inside codegen; top-k per query via window over the
  (|corpus| x |queries|) scored rows — at 100 TB you bound |queries|
  or switch to the LSH path;
* LSH path: one vectorized pandas-UDF pass computes sign-bucket ids
  (batch matmul against a seed-deterministic plane matrix), then
  candidates co-group by bucket — shuffle carries (id, bucket, vec)
  once; exact cosine verification only within buckets.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "cosine_expr",
    "with_norm",
    "cosine_topk",
    "with_lsh_bucket",
    "lsh_neardup_pairs",
]


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_expr(a, b, norm_a, norm_b):
    """Cosine from precomputed norms (JVM codegen, no UDF)."""
    return _dot(a, b) / (norm_a * norm_b)


def with_norm(df: DataFrame, vec_col: str, out_col: str = "__norm") -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.withColumn(vec_col, v).withColumn(
        out_col, F.sqrt(_dot(F.col(vec_col), F.col(vec_col)))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector. ``queries`` must be
    small (it is broadcast); self-matches (same id) are excluded.

    Output: (query_id, rank, id, cosine)."""
    c = with_norm(corpus, vec_col).select(
        F.col(id_col), F.col(vec_col).alias("__cv"), F.col("__norm").alias("__cn")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias(query_id),
        F.col(vec_col).alias("__qv"),
        F.col("__norm").alias("__qn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col(query_id))
        .select(
            query_id,
            id_col,
            cosine_expr(
                F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "cosine")
    )


def with_lsh_bucket(
    df: DataFrame, vec_col: str, planes: int = 16, seed: int = 7, out_col: str = "bucket"
) -> DataFrame:
    """Random-hyperplane LSH bucket id per row: sign bits of the
    projection onto ``planes`` seed-deterministic Gaussian directions.
    One Arrow-batched matmul per batch — the vectorized-UDF shape the
    input_hint mandates (never per-row Python)."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.LongType())]
    )
    dim = None  # inferred from first batch

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[vec_col].to_numpy())
            nonlocal_dim = mat.shape[1]
            if P is None:
                P = np.random.default_rng(seed).standard_normal((nonlocal_dim, planes))
            signs = (mat.astype(np.float64) @ P) > 0
            out = pdf.copy()
            out[out_col] = signs.dot(1 << np.arange(planes)).astype(np.int64)
            yield out

    return df.mapInPandas(bucketize, out_schema)


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.999,
    planes: int = 16,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold via LSH bucketing +
    exact in-bucket verification. Vectors within angle theta collide
    with prob (1 - theta/pi)^planes; at threshold ~1 (theta ~ 0) the
    planted-duplicate recall is 1 by construction."""
    b = with_lsh_bucket(with_norm(df, vec_col), vec_col, planes)
    a_side = b.select(
        F.col(id_col).alias("id_a"), F.col("bucket"),
        F.col(vec_col).alias("__va"), F.col("__norm").alias("__na"),
    )
    b_side = b.select(
        F.col(id_col).alias("id_b"), F.col("bucket"),
        F.col(vec_col).alias("__vb"), F.col("__norm").alias("__nb"),
    )
    return (
        a_side.join(b_side, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_expr(
                F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
