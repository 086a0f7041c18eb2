"""Hypertable query family for the driver contract.

The hypertable rollup (continuous aggregate + tiered retention,
``operators/hypertable.py``) was previously pytest-only; this family
routes the WHOLE lifecycle through the oracle gate in one row:

  two incremental ingests -> tiered downsample (old day-buckets merged
  into week-buckets) -> week-window stats read from the rollup table.

What makes it SQL-checkable: in lossless mode every digest merge is
exact, and both the incremental upsert and the downsample are
re-associations of the same merge — every raw row is covered exactly
once at every granularity (the reference's semigroup claim,
``tdigest/src/Data/TDigest/Tree/Internal.hs:143-153``, applied to the
rollup lattice). So week stats computed from a table that was built in
two batches AND coarsened under a retention tier equal plain
``quantile_cont`` SQL over the raw rows — REGARDLESS of batch split or
tier boundary.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.sources.tables import load

LOSSLESS = 4_000_000
DAY = 86_400
WEEK = 7 * DAY


def ht_rollup_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ingested into a day-bucketed hypertable in TWO batches
    (incremental-view maintenance: only touched buckets pay the second
    merge), then downsampled — buckets whose week is entirely older
    than 14 days before a FIXED ``as_of`` merge into week rows (events
    data spans 2024-01, so both widths coexist) — then per
    (week, event_type) p50/count answered from the rollup table alone.
    Raw data is scanned only by the two ingests, never by the query."""
    from tdigest_spark.operators.digest_agg import tdigest_stats
    from tdigest_spark.operators.hypertable import (
        hypertable_downsample,
        hypertable_upsert,
        hypertable_window_stats,
    )

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "ts", "event_type", "value")
        .where(F.col("ts").isNotNull())
    )
    d = tempfile.mkdtemp(prefix="ht_q_")
    table = f"{d}/table"
    # any deterministic-or-not split works: lossless merge makes the
    # final stats batch-invariant (that IS the property under test)
    half = F.pmod(F.xxhash64("event_id"), F.lit(2))
    for i in range(2):
        hypertable_upsert(
            ev.where(half == i).drop("event_id"),
            "value",
            "ts",
            DAY,
            table,
            by=["event_type"],
            delta=LOSSLESS,
        )
    # fixed as_of (2024-02-15 UTC): weeks ending by 2024-02-01 coarsen,
    # the final partial week stays at day granularity — both widths
    # must round-trip through window stats
    hypertable_downsample(
        spark,
        table,
        DAY,
        "2024-02-15T00:00:00+00:00",
        tiers=[(14 * DAY, WEEK)],
    )
    out = hypertable_window_stats(
        spark,
        table,
        DAY,
        WEEK,
        {"p50": ("quantile", 0.5), "n": ("total_weight",)},
        by=["event_type"],
    )
    return out.select(
        "window_start",
        "event_type",
        F.round("p50", 4).alias("p50"),
        F.col("n").cast("long").alias("n"),
    )


QUERIES = {
    "ht_rollup_window_events": ht_rollup_window_events,
}

ORACLES = {
    # epoch(ts) is DOUBLE in DuckDB; floor() before the multiply
    # (integer // would true-divide), make_timestamp takes microseconds
    "ht_rollup_window_events": f"""
        SELECT make_timestamp(CAST(floor(epoch(ts) / {WEEK}) AS BIGINT)
                              * {WEEK} * 1000000) AS window_start,
               event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               count(value) AS n
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """,
}
