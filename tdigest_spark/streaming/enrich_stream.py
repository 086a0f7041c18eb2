"""Streaming as-of enrichment: attach the most recent reference
reading to each event as it streams in.

Spark's native stream-static joins cover equi-joins only; the as-of
form needs the window machinery, which is not stream-composable. The
correct decomposition: as-of matching is PER LEFT ROW (each event's
match depends only on the static reference side, never on other
events), so enriching micro-batch by micro-batch in ``foreachBatch``
produces EXACTLY the batch result over the full stream — tested.

The enriched log is append-only, partitioned by ``batch_id`` with
per-partition overwrite, so a replayed batch overwrites its own
partition byte-identically — replay idempotence without a commit
protocol (the same discipline as
:func:`~tdigest_spark.streaming.drift_stream.drift_monitor`'s log).

Scale shape: per batch, one shuffle of (batch ∪ reference-keys) —
the reference is re-read per batch, so snapshot it (parquet) rather
than recomputing; at a large reference, pre-partition it by the keys
once and the per-batch sort touches only matching partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from tdigest_spark.operators.asof import asof_join

__all__ = ["asof_enrich_stream"]


def asof_enrich_stream(
    stream: DataFrame,
    reference: DataFrame,
    ts_col: str,
    by: str | Sequence[str],
    out_dir: str,
    checkpoint_dir: str,
    direction: str = "backward",
    tolerance_sec: float | None = None,
):
    """foreachBatch sink: each micro-batch LEFT-as-of-joined to the
    static ``reference`` and appended to ``out_dir`` partitioned by
    ``batch_id``. Returns the StreamingQuery."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        enriched = asof_join(
            batch_df,
            reference,
            ts_col,
            by=by,
            direction=direction,
            tolerance_sec=tolerance_sec,
        ).withColumn("batch_id", F.lit(batch_id))
        enriched.write.mode("overwrite").partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
