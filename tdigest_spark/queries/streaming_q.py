"""Streaming query family for the driver contract.

Structured Streaming was previously pytest-only (no driver row); this
family routes it through the oracle gate. The trick that makes a
STREAMING result SQL-checkable: in lossless mode the digest merge is
exact, and ``digest_sink`` is the same associative merge applied per
micro-batch — so the final table's rank stats equal the one-shot batch
aggregate exactly, REGARDLESS of how rows were chunked into batches
(streaming query == incremental batch job, the reference's ``Reducer``
claim, ``Tree/Internal.hs:69-77``). The oracle is therefore plain
``quantile_cont``/``count`` SQL over the same input.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.sources.tables import load

LOSSLESS = 4_000_000


def st_digest_sink_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events replayed as a 3-chunk file stream; ``digest_sink`` merges
    each micro-batch into the snapshot-pointer table; final per-type
    p50/count read back from the table — exact, so hash-checked."""
    from tdigest_spark.operators.digest_agg import tdigest_stats
    from tdigest_spark.streaming.digest_stream import digest_sink

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    d = tempfile.mkdtemp(prefix="st_sink_q_")
    # any deterministic-or-not 3-way split works: lossless merge makes
    # the final stats chunking-invariant (that IS the property under test)
    for i in range(3):
        ev.where(F.pmod(F.xxhash64("value"), F.lit(3)) == i).coalesce(1)\
            .write.parquet(f"{d}/src/chunk={i}")
    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src/chunk=*")
    )
    q = digest_sink(
        stream, "value", ["event_type"], f"{d}/table", f"{d}/ck", delta=LOSSLESS
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("st_digest_sink_events: stream did not finish in 300s")
    dig = spark.read.parquet(f"{d}/table")
    out = tdigest_stats(
        dig, {"p50_value": ("quantile", 0.5), "n_values": ("total_weight",)}
    )
    return out.select(
        "event_type",
        F.round("p50_value", 4).alias("p50_value"),
        F.col("n_values").cast("long").alias("n_values"),
    )


QUERIES = {"st_digest_sink_events": st_digest_sink_events}

ORACLES = {
    "st_digest_sink_events": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50_value,
               count(value) AS n_values
        FROM events GROUP BY event_type
    """,
}
