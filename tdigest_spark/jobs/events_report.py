"""End-to-end event-analytics job: the composition a product/weblog
pipeline runs over the events table, built entirely from this engine's
operators — runnable via ``spark-submit --py-files``.

Stages (each one shuffle or less; raw events are scanned ONCE per
independent report axis, never collected):

 1. sessions    ``session_stats`` (gap rule) -> per-session rows
 2. session SLA ``tdigest_agg`` over session durations per day bucket
                (the hypertable shape: O(days) digest rows answer any
                coarser window later by merge)
 3. funnel      ``funnel_counts`` — step reach + conversion
 4. retention   ``cohort_retention`` — weekly cohort curves
 5. drift gate  ``digest_drift`` of this run's session-duration
                distribution vs a previous run's digest table (when
                given) — the regression gate between report runs
 6. report      one JSON line per section

At 100 TB only the input DataFrame changes: sessions/funnel/retention
each reduce to O(keys)/O(steps)/O(cohorts x offsets) rows before
anything wide happens.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from tdigest_spark.operators.digest_agg import tdigest_agg, tdigest_stats
from tdigest_spark.operators.drift import digest_drift
from tdigest_spark.operators.funnel import funnel_counts
from tdigest_spark.operators.retention import cohort_retention
from tdigest_spark.operators.sessionize import session_stats

__all__ = ["events_report", "main"]

DAY = 86_400


def events_report(
    events: DataFrame,
    steps: list[str],
    gap_sec: float = 1800.0,
    key: str = "user_id",
    ts_col: str = "ts",
    step_col: str = "event_type",
    retention_period_sec: int = 7 * DAY,
    delta: int = 200,
    prev_session_digests: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Returns the report sections as DataFrames: ``sessions`` (per-day
    duration quantiles + counts), ``session_digests`` (the mergeable
    per-day digest table — persist it and pass it back as
    ``prev_session_digests`` next run), ``funnel``, ``retention``, and
    ``drift`` (None-keyed out when no previous digests are given)."""
    sess = session_stats(events, ts_col, gap_sec, key).withColumn(
        "day", F.date_trunc("day", F.col("session_start"))
    )
    dig = tdigest_agg(sess, "duration_sec", by=["day"], delta=delta)
    sessions = tdigest_stats(
        dig,
        {
            "p50_duration": ("quantile", 0.5),
            "p99_duration": ("quantile", 0.99),
            "n_sessions": ("total_weight",),
        },
    )
    out = {
        "sessions": sessions,
        "session_digests": dig,
        "funnel": funnel_counts(events, step_col, steps, ts_col, key),
        "retention": cohort_retention(
            events, ts_col, key=key, period_sec=retention_period_sec
        ),
    }
    if prev_session_digests is not None:
        out["drift"] = digest_drift(
            dig, prev_session_digests, by=["day"], how="full"
        )
    return out


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--events", required=True, help="events parquet path")
    p.add_argument("--steps", default="signup,purchase,error")
    p.add_argument("--gap-sec", type=float, default=1800.0)
    p.add_argument("--out", default=None, help="dir for section parquet dumps")
    args = p.parse_args()
    from tdigest_spark.session import get_spark

    spark = get_spark("events_report")
    events = spark.read.parquet(args.events)
    report = events_report(events, args.steps.split(","), args.gap_sec)
    for name, df in report.items():
        if args.out:
            df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        rows = df.limit(20).collect()
        print(json.dumps({"section": name, "rows": [r.asDict(recursive=True) for r in rows]}, default=str))


if __name__ == "__main__":
    main()
