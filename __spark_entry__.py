"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``tdigest_spark/queries/``; this module is a
thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: grouped t-digest sketch (median/p99/count) over
    events.value at sf0.001."""
    from pyspark.sql import functions as F

    from tdigest_spark.operators.digest_agg import tdigest_agg, tdigest_stats

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    dig = tdigest_agg(events, "value", by=["event_type"], delta=200)
    out = tdigest_stats(
        dig,
        {
            "median_value": ("quantile", 0.5),
            "p99_value": ("quantile", 0.99),
            "n_values": ("total_weight",),
        },
    )
    return out.withColumn("n_values", F.col("n_values").cast("long"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tdigest_spark.queries import registry

    return registry()[0]


def oracle_sql() -> dict[str, str]:
    from tdigest_spark.queries import registry

    return registry()[1]
