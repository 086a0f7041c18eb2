"""Sessionization query family for the driver contract.

``ss_sessions_events`` drives :mod:`tdigest_spark.operators.sessionize`
end-to-end against an exact SQL oracle: the gap rule is plain
lag/cumsum window algebra, so DuckDB reproduces the session
partitioning exactly (boundaries depend only on each key's sorted
timestamp multiset — tie-order between engines cannot change them),
and the per-user session-duration median ties the digest library in
(lossless digest == quantile_cont exactly, the family's established
equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.digest_agg import tdigest_agg, tdigest_stats
from tdigest_spark.operators.sessionize import session_stats
from tdigest_spark.sources.tables import load

LOSSLESS = 1_000_000
GAP_SEC = 1800.0


def ss_sessions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session summary over events (gap = 30 min): session
    count, total events, longest session, and the median session
    duration via a lossless digest over the DERIVED session table —
    one window shuffle for the sessionize, one partial+final agg for
    the summary, digest build over O(sessions) rows."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    sess = session_stats(ev, "ts", GAP_SEC, "user_id")
    # O(sessions) rows feed BOTH the summary agg and the digest build
    sess = sess.localCheckpoint(eager=True)
    summary = sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.max("n_events").cast("long").alias("max_len"),
    )
    dig = tdigest_agg(sess, "duration_sec", by=["user_id"], delta=LOSSLESS)
    med = tdigest_stats(dig, {"dur_p50": ("quantile", 0.5)})
    out = summary.join(med, "user_id")
    return out.withColumn("dur_p50", F.round("dur_p50", 4))


QUERIES = {"ss_sessions_events": ss_sessions_events}

ORACLES = {
    "ss_sessions_events": """
        WITH s AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1
                      ELSE 0 END AS ns
          FROM events WHERE ts IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        i AS (
          SELECT user_id, ts,
                 sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
          FROM s
        ),
        g AS (
          SELECT user_id, sid, count(*) AS n_events,
                 epoch(max(ts)) - epoch(min(ts)) AS dur
          FROM i GROUP BY user_id, sid
        )
        SELECT user_id,
               count(*) AS n_sessions,
               sum(n_events)::BIGINT AS n_events,
               max(n_events)::BIGINT AS max_len,
               round(quantile_cont(dur, 0.5), 4) AS dur_p50
        FROM g GROUP BY user_id
    """,
}
