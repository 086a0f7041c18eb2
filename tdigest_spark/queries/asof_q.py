"""As-of join query family for the driver contract.

``aj_asof_enrich_events`` drives
:func:`tdigest_spark.operators.asof.asof_join` against DuckDB's NATIVE
``ASOF JOIN`` — the strongest possible oracle for the operator: two
independent implementations of the nearest-timestamp semantics must
agree row-for-row. The reference side is a deterministic slice of
events (every 17th event id) deduplicated to unique (user_id, ts) by
max(value), so both engines join against the identical table; the
enriched rows fold to per-event_type match counts, an integer-exact
reference checksum (values carry 2 decimals -> x100 is integral), and
the maximum staleness gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.asof import asof_join
from tdigest_spark.sources.tables import load


def aj_asof_enrich_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    right = (
        ev.filter(F.col("event_id") % 17 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
    )
    left = ev.filter(F.col("event_id") % 17 != 0)
    joined = asof_join(left, right, "ts", by="user_id")
    # parquet ts is TIMESTAMP_NTZ, which has no direct double cast
    gap = F.col("ts").cast("timestamp").cast("double") - F.col("matched_ts").cast(
        "double"
    )
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("ref_value").alias("n_matched"),
        F.sum(F.round(F.col("ref_value") * 100).cast("long")).alias("ref_checksum"),
        F.round(F.max(gap), 4).alias("max_gap_sec"),
    )


QUERIES = {"aj_asof_enrich_events": aj_asof_enrich_events}

ORACLES = {
    "aj_asof_enrich_events": """
        WITH r AS (
          SELECT user_id, ts, max(value) AS ref_value
          FROM events WHERE event_id % 17 = 0
          GROUP BY user_id, ts
        ),
        l AS (
          SELECT event_id, user_id, ts, event_type, value
          FROM events WHERE event_id % 17 <> 0
        ),
        j AS (
          SELECT l.event_type, r.ref_value,
                 epoch(l.ts) - epoch(r.ts) AS gap
          FROM l ASOF LEFT JOIN r
            ON l.user_id = r.user_id AND l.ts >= r.ts
        )
        SELECT event_type,
               count(*) AS n_events,
               count(ref_value) AS n_matched,
               sum(round(ref_value * 100)::BIGINT)::BIGINT AS ref_checksum,
               round(max(gap), 4) AS max_gap_sec
        FROM j GROUP BY event_type
    """,
}
