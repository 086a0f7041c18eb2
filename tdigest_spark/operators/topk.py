"""Approximate heavy hitters (frequent items / top-k).

The exact plan (`groupBy(col).count().orderBy(...).limit(k)`) shuffles
one row per DISTINCT value — fine for small domains, a full-shuffle
bottleneck at 100 TB of high-cardinality keys. The sketch plan bounds
the shuffle at O(partitions x m):

  1. per-partition local top-m candidates from a BOUNDED Misra-Gries
     summary (capacity 8m counters per partition-group — memory is
     O(m), NOT O(distinct), so a 100 TB high-cardinality key column
     cannot OOM the Python worker); any value whose partition count
     exceeds N_part/(8m+1) provably survives the summary, so the
     union of local tops contains every value whose global count
     exceeds ~N/(m·partitions) — the standard frequent-items
     admission guarantee;
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

from tdigest_spark.operators.digest_agg import canon_key

__all__ = ["approx_topk", "cms_topk_estimates"]

# per-(partition x group) counter capacity = _MG_CAP_FACTOR * m: the
# Misra-Gries guarantee below then holds with error N_part/(cap+1),
# comfortably below the N_part/(m*partitions) admission threshold the
# candidate set needs
_MG_CAP_FACTOR = 8


def _mg_add_batch(counts: dict[str, int], series: pd.Series, cap: int) -> int:
    """Misra-Gries batched update with HARD capacity ``cap``:
    add the batch's value counts, then — if over capacity — decrement
    every counter by the (cap+1)-th largest residual and drop the
    non-positive ones (the batched generalization of the classic
    decrement-all step). Carried state is O(cap) between batches
    (transiently O(cap + batch-distinct) inside one batch, bounded by
    the Arrow batch size), and any value with true partition frequency
    > N_partition/(cap+1) is guaranteed to survive (total decremented
    mass per counter <= N/(cap+1)).

    Returns the decrement applied (0 if the batch fit in capacity):
    accumulating it across calls gives the EXACT total under-count,
    i.e. every value's true count so far lies in
    [residual, residual + sum-of-returns] — at most the classic
    N/(cap+1) but 0 while no eviction has ever fired (the streaming
    operator reports this as its error interval)."""
    for v, n in series.value_counts().items():
        counts[v] = counts.get(v, 0) + int(n)
    if len(counts) <= cap:
        return 0
    import numpy as np

    vals = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
    # (cap+1)-th largest residual = decrement that leaves <= cap
    thr = int(np.partition(vals, len(vals) - (cap + 1))[len(vals) - (cap + 1)])
    for v in [v for v, n in counts.items() if n - thr <= 0]:
        del counts[v]
    for v in counts:
        counts[v] -= thr
    return thr


def _local_candidates(
    df: DataFrame, key_col: str, m: int, by: Sequence[str] = ()
) -> DataFrame:
    """Distinct union of per-partition top-m surviving Misra-Gries
    counters of ``key_col`` (per ``by`` group when given). Worker
    memory is bounded at O(groups x _MG_CAP_FACTOR x m) counters per
    partition regardless of key cardinality."""
    by = list(by)
    cap = _MG_CAP_FACTOR * m
    src = df.select(*by, F.col(key_col).cast("string").alias(key_col))
    out_schema = T.StructType(
        [src.schema[c] for c in by] + [T.StructField(key_col, T.StringType())]
    )

    def tops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[tuple, dict[str, int]] = {}
        for pdf in batches:
            groups = pdf.groupby(by, sort=False, dropna=False) if by else [((), pdf)]
            for g_key, g in groups:
                # canon_key: a NaN group key must hit ONE accumulator
                # across batches (here only the candidate-set size is
                # at stake — the exact recount groups Spark-side — but
                # a split accumulator also halves the MG guarantee)
                g_key = canon_key(g_key if isinstance(g_key, tuple) else (g_key,))
                _mg_add_batch(counts.setdefault(g_key, {}), g[key_col].dropna(), cap)
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
