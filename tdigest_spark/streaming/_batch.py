"""Shared foreachBatch plumbing for the exactly-once sinks."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["drain_batch"]


def drain_batch(batch_df: DataFrame) -> None:
    """Fully consume a micro-batch without writing anything.

    An exactly-once sink that detects a replayed (already-committed)
    batch must still PROCESS every partition before skipping its own
    writes: when the upstream query holds a stateful operator
    (``streaming_bloom_dedup``, watermarked windows, ...), Spark only
    commits that operator's per-partition state stores as the batch's
    partitions are consumed, and Spark 4's commit validation fails the
    batch outright (``STATE_STORE_COMMIT_VALIDATION_FAILED``) if the
    sink returns early. The built-in ``noop`` datasource is the
    cheapest full consumer — every partition is computed, nothing is
    serialized or stored.
    """
    batch_df.write.format("noop").mode("overwrite").save()
