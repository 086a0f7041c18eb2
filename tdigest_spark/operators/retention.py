"""Cohort retention: "of the users first seen in period p, how many
were active again in period p+k?" — the companion report to
:mod:`~tdigest_spark.operators.funnel` and
:mod:`~tdigest_spark.operators.sessionize` in an event-analytics
suite.

Spark-first shape: one distinct pass reduces events to (key, period)
pairs (map-side combined — the shuffle carries one row per active
key-period, never the raw events), a min-aggregate over those pairs
yields each key's cohort, and a co-partitioned join + groupBy produces
the (cohort, offset) counts. All JVM; the heaviest movement is
O(distinct key-periods).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["cohort_retention"]


def cohort_retention(
    events: DataFrame,
    ts_col: str,
    key: str = "user_id",
    period_sec: int = 7 * 86_400,
    by: Sequence[str] = (),
) -> DataFrame:
    """One row per (cohort_start, offset): ``n_active`` distinct keys
    from that cohort active ``offset`` periods after first being seen,
    ``cohort_size`` (== n_active at offset 0, every key is active in
    its own first period), and ``retention`` = n_active/cohort_size.
    NULL timestamps are ignored. Extra ``by`` columns segment the
    whole report (cohorts computed within each segment)."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be > 0, got {period_sec}")
    by = list(by)
    ts = F.col(ts_col).cast("timestamp").cast("double")
    per = F.floor(ts / F.lit(int(period_sec))).cast("long")
    active = (
        events.filter(F.col(ts_col).isNotNull())
        .select(*by, F.col(key).alias("__k"), per.alias("__per"))
        .distinct()
    )
    w = Window.partitionBy(*by, "__k")
    # cohort from the SAME distinct pairs — no second scan of events
    marked = active.withColumn("__cohort", F.min("__per").over(w))
    counts = marked.groupBy(*by, "__cohort", (F.col("__per") - F.col("__cohort")).alias("offset")).agg(
        F.count(F.lit(1)).alias("n_active")
    )
    base = counts.filter(F.col("offset") == 0).select(
        *by, "__cohort", F.col("n_active").alias("cohort_size")
    )
    out = counts.join(base, [*by, "__cohort"])
    return out.select(
        *by,
        (F.col("__cohort") * period_sec).cast("timestamp").alias("cohort_start"),
        "offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )
