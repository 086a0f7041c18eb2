"""Funnel query family for the driver contract.

``fn_funnel_events`` drives
:func:`tdigest_spark.operators.funnel.funnel_counts` (the one-shuffle
sorted-fold funnel) against the classic k-way self-join min-chain in
DuckDB — two independent formulations of greedy-earliest funnel
semantics that must agree on every step's reach count and conversion
rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.funnel import funnel_counts
from tdigest_spark.sources.tables import load

STEPS = ["signup", "purchase", "error"]


def fn_funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    out = funnel_counts(ev, "event_type", STEPS, "ts", "user_id")
    return out.withColumn("conversion", F.round("conversion", 6))


QUERIES = {"fn_funnel_events": fn_funnel_events}

ORACLES = {
    "fn_funnel_events": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
          WHERE event_type = 'purchase' AND ts >= t1 GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
          WHERE event_type = 'error' AND ts >= t2 GROUP BY e.user_id
        ),
        c AS (
          SELECT (SELECT count(*) FROM s1) AS r1,
                 (SELECT count(*) FROM s2) AS r2,
                 (SELECT count(*) FROM s3) AS r3
        )
        SELECT 1 AS step, 'signup' AS step_name, r1 AS n_reached,
               round(1.0, 6) AS conversion FROM c
        UNION ALL
        SELECT 2, 'purchase', r2, round(r2::DOUBLE / r1, 6) FROM c
        UNION ALL
        SELECT 3, 'error', r3, round(r3::DOUBLE / r2, 6) FROM c
    """,
}
