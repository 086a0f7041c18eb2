"""Range-join query family for the driver contract.

``rj_value_bands_events`` drives
:func:`tdigest_spark.operators.range_join.range_join` (bucketized
equi-join, half-open semantics) against DuckDB's plain inequality
join — independent implementations agreeing row-for-row. The bands
OVERLAP (stride 7.5, width 20), so most points match 2-3 intervals
and the one-point-many-intervals fan-out is actually exercised; the
matched pairs fold to per-(event_type, band) counts plus an
integer-exact value checksum (2-decimal values -> x100 integral).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.range_join import range_join
from tdigest_spark.sources.tables import load


def rj_value_bands_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    bands = spark.range(14).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 7.5).alias("lo"),
        (F.col("id") * 7.5 + 20.0).alias("hi"),
    )
    j = range_join(ev, bands, "value", "lo", "hi", bucket_width=10.0)
    return j.groupBy("event_type", "band_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v_checksum"),
    )


QUERIES = {"rj_value_bands_events": rj_value_bands_events}

ORACLES = {
    "rj_value_bands_events": """
        WITH b AS (
          SELECT i AS band_id, i * 7.5 AS lo, i * 7.5 + 20.0 AS hi
          FROM (SELECT unnest(generate_series(0, 13)) AS i)
        ),
        j AS (
          SELECT e.event_type, b.band_id, e.value
          FROM events e JOIN b ON e.value >= b.lo AND e.value < b.hi
        )
        SELECT event_type, band_id,
               count(*) AS n,
               sum(round(value * 100)::BIGINT)::BIGINT AS v_checksum
        FROM j GROUP BY event_type, band_id
    """,
}
