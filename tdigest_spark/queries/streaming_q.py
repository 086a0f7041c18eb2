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


from tdigest_spark.queries.sketch_q import _HLL_3SIG  # derived from the build's _HLL_P


def st_sketch_sink_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents replayed as a 3-chunk file stream; ``sketch_sink``
    merges each micro-batch's HLL/CMS/KLL blobs into the snapshot
    table. HLL register-max and CMS counter-add merges are
    chunking-invariant and KLL is lossless at this k, so the read-back
    estimates equal the one-shot batch build's: CMS total and lossless
    KLL median are hash-exact vs SQL; the HLL distinct estimate uses
    the established 3-sigma bound-boolean pattern."""
    from tdigest_spark.operators.sketch_agg import sketch_estimates
    from tdigest_spark.streaming.digest_stream import sketch_sink

    docs = load(spark, sf_dir, "documents")
    d = tempfile.mkdtemp(prefix="st_sksink_q_")
    cols = ["lang", "text", "source", "n_chars"]
    for i in range(3):
        docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i).select(*cols)\
            .coalesce(1).write.parquet(f"{d}/src/chunk={i}")
    stream = (
        spark.readStream.schema("lang string, text string, source string, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/src/chunk=*")
    )
    q = sketch_sink(
        stream,
        {
            "h": ("hll", "text"),
            "c": ("cms", "source"),
            "k": ("kll", "n_chars", 1_000_000),
        },
        ["lang"],
        f"{d}/table",
        f"{d}/ck",
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("st_sketch_sink_docs: stream did not finish in 300s")
    tbl = spark.read.parquet(f"{d}/table")
    est = sketch_estimates(
        tbl,
        {
            "nd_est": ("hll_estimate", "h"),
            "n_rows": ("cms_total", "c"),
            "p50_chars": ("kll_quantile", "k", 0.5),
        },
    )
    exact = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact_distinct"))
    return est.join(exact, "lang").select(
        "lang",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.round("p50_chars", 4).alias("p50_chars"),
        "exact_distinct",
        (
            F.abs(F.col("nd_est") - F.col("exact_distinct"))
            <= F.lit(_HLL_3SIG) * F.col("exact_distinct") + F.lit(3)
        ).alias("hll_ok"),
    )


QUERIES = {
    "st_digest_sink_events": st_digest_sink_events,
    "st_sketch_sink_docs": st_sketch_sink_docs,
}

ORACLES = {
    "st_digest_sink_events": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50_value,
               count(value) AS n_values
        FROM events GROUP BY event_type
    """,
    "st_sketch_sink_docs": """
        SELECT lang,
               count(source) AS n_rows,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               count(DISTINCT text) AS exact_distinct,
               true AS hll_ok
        FROM documents GROUP BY lang
    """,
}
