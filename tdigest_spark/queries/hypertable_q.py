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
    data spans 2024-01, so both widths coexist) — then TWO window reads
    answered from the rollup table alone, union-tagged by ``leg``:
    tumbling weekly stats (``tumble_1w``) and SLIDING trailing-2-week
    stats at a weekly slide (``slide_2w_1w`` — each bucket fanned to
    its covering windows, per-width, then merged associatively). Raw
    data is scanned only by the two ingests, never by either read."""
    from tdigest_spark.operators.digest_agg import tdigest_stats
    from tdigest_spark.operators.hypertable import (
        hypertable_downsample,
        hypertable_sliding_stats,
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
    stats = {"p50": ("quantile", 0.5), "n": ("total_weight",)}
    tumble = hypertable_window_stats(
        spark, table, DAY, WEEK, stats, by=["event_type"]
    )
    slide = hypertable_sliding_stats(
        spark, table, DAY, 2 * WEEK, WEEK, stats, by=["event_type"]
    )

    def shape(df: DataFrame, leg: str) -> DataFrame:
        return df.select(
            F.lit(leg).alias("leg"),
            "window_start",
            "event_type",
            F.round("p50", 4).alias("p50"),
            F.col("n").cast("long").alias("n"),
        )

    return shape(tumble, "tumble_1w").unionByName(shape(slide, "slide_2w_1w"))


QUERIES = {
    "ht_rollup_window_events": ht_rollup_window_events,
}

ORACLES = {
    # epoch(ts) is DOUBLE in DuckDB; floor() before the multiply
    # (integer // would true-divide), make_timestamp takes microseconds.
    # Sliding leg: each raw event fans to every window start k*WEEK in
    # (t - 2 weeks, t] — the exact covering-window set (the engine fans
    # BUCKETS, but a window covering a bucket contains all its events
    # and every event's covering window covers its whole bucket, since
    # week edges are bucket edges — so the window sets coincide).
    "ht_rollup_window_events": f"""
        SELECT 'tumble_1w' AS leg,
               make_timestamp(CAST(floor(epoch(ts) / {WEEK}) AS BIGINT)
                              * {WEEK} * 1000000) AS window_start,
               event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               count(value) AS n
        FROM events
        WHERE ts IS NOT NULL
        GROUP BY 1, 2, 3
        UNION ALL
        SELECT 'slide_2w_1w' AS leg,
               make_timestamp(k * {WEEK} * 1000000) AS window_start,
               event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               count(value) AS n
        FROM (
            SELECT event_type, value,
                   unnest(generate_series(
                       CAST(floor((epoch(ts) - {2 * WEEK}) / {WEEK}) AS BIGINT) + 1,
                       CAST(floor(epoch(ts) / {WEEK}) AS BIGINT))) AS k
            FROM events
            WHERE ts IS NOT NULL
        )
        GROUP BY 1, 2, 3
    """,
}
