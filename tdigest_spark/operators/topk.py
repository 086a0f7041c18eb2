"""Approximate heavy hitters (frequent items / top-k).

The exact plan (`groupBy(col).count().orderBy(...).limit(k)`) shuffles
one row per DISTINCT value — fine for small domains, a full-shuffle
bottleneck at 100 TB of high-cardinality keys. The sketch plan bounds
the shuffle at O(partitions x m):

  1. per-partition local top-m candidates (vectorized value_counts —
     a candidate that is in the global top-k must be in SOME
     partition's local top-m; with m >= k the union of local tops
     contains every value whose count exceeds ~N/(m·partitions),
     the standard SpaceSaving-style guarantee);
  2. count the candidates EXACTLY with a second aggregation
     restricted to the (broadcast) candidate set — the counts are
     exact, only candidate membership is approximate;
  3. rank, take k.

Alternatively :func:`cms_topk_estimates` skips pass 2 and reads the
counts from a count-min sketch (one-sided error <= eps*N) when a
second scan is unaffordable.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["approx_topk", "cms_topk_estimates"]


def _local_candidates(
    df: DataFrame, key_col: str, m: int, by: Sequence[str] = ()
) -> DataFrame:
    """Distinct union of per-partition top-m values of ``key_col``
    (per ``by`` group when given)."""
    by = list(by)
    src = df.select(*by, F.col(key_col).cast("string").alias(key_col))
    out_schema = T.StructType(
        [src.schema[c] for c in by] + [T.StructField(key_col, T.StringType())]
    )

    def tops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[tuple, dict[str, int]] = {}
        for pdf in batches:
            groups = pdf.groupby(by, sort=False, dropna=False) if by else [((), pdf)]
            for g_key, g in groups:
                g_key = g_key if isinstance(g_key, tuple) else (g_key,)
                c = counts.setdefault(g_key, {})
                for v, n in g[key_col].dropna().value_counts().items():
                    c[v] = c.get(v, 0) + int(n)
        if not counts:
            return
        data: dict[str, list] = {c: [] for c in by}
        data[key_col] = []
        for g_key, c in counts.items():
            top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
            for v, _ in top:
                for col, kv in zip(by, g_key):
                    data[col].append(kv)
                data[key_col].append(v)
        yield pd.DataFrame(data)

    return src.mapInPandas(tops, out_schema).distinct()


def approx_topk(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    m: int | None = None,
    by: Sequence[str] = (),
) -> DataFrame:
    """Top-k most frequent values of ``key_col`` with EXACT counts —
    per ``by`` group when given — candidate-pruned so the count
    aggregation only shuffles rows whose value is in the
    O(partitions x groups x m) candidate set.

    Output: (by..., key_col string, cnt long, rank int), rank 1..k per
    group, ties broken by value ascending (deterministic).
    """
    by = list(by)
    m = m or max(4 * k, 64)
    cand = _local_candidates(df, key_col, m, by=by)
    exact = (
        df.select(*by, F.col(key_col).cast("string").alias(key_col))
        .join(F.broadcast(cand), [*by, key_col])
        .groupBy(*by, key_col)
        .agg(F.count("*").alias("cnt"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(*[F.col(c) for c in by]).orderBy(
        F.col("cnt").desc(), F.col(key_col).asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*by, key_col, "cnt", "rank")
    )


def cms_topk_estimates(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    m: int | None = None,
    eps: float = 0.0001,
    delta: float = 0.001,
) -> DataFrame:
    """One-extra-scan-free variant: candidate counts read from a
    count-min sketch built in the same pass shape (est >= true,
    est <= true + eps*N w.p. 1-delta). Output:
    (key_col, est_count, rank)."""
    from tdigest_spark.operators.sketch_agg import cms_probe, sketch_build

    m = m or max(4 * k, 64)
    cand = _local_candidates(df, key_col, m)
    sk = sketch_build(df, {"c": ("cms", key_col, eps, delta)})
    probed = cms_probe(cand, sk, key_col, "c")
    from pyspark.sql import Window as W

    w = W.orderBy(F.col("est_count").desc(), F.col(key_col).asc())
    return (
        probed.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(key_col, "est_count", "rank")
    )
