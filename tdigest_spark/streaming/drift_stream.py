"""Streaming distribution-drift monitor — the data-quality gate of an
ingestion pipeline.

Each micro-batch is sketched (``tdigest_agg`` per group) and scored
against a STATIC reference digest table (last crawl / golden corpus)
with the exact closed-form drift metrics of
:mod:`~tdigest_spark.operators.drift`; scored rows append to a
partitioned parquet log, one partition per micro-batch. Per-batch
work is O(batch) to sketch + O(groups) to score — the reference is
O(groups x delta) rows broadcast once per batch, and history is never
rescanned.

Idempotence without a commit protocol: the log is partitioned by
``batch_id`` and each batch OVERWRITES exactly its own partition
directory, so a replayed batch rewrites identical rows instead of
appending duplicates — the natural idempotent shape for an append-only
log (the digest/sketch sinks need the snapshot-pointer protocol
because they maintain mutable state; a log does not).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["drift_monitor"]


def drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    value_col: str,
    by: Sequence[str],
    log_dir: str,
    checkpoint_dir: str,
    delta: int = 200,
    metrics: Sequence[str] = ("ks", "w1", "psi"),
    thresholds: dict[str, float] | None = None,
):
    """Score every micro-batch's per-group distribution against
    ``reference`` (a digest table: ``by..., digest`` from
    ``tdigest_agg`` or a ``digest_sink`` table) and append
    ``by..., <metric>..., alert`` rows under
    ``{log_dir}/batch_id=<n>/``.

    ``alert`` is true when any metric exceeds its entry in
    ``thresholds`` (e.g. ``{"psi": 0.25, "ks": 0.1}``) OR when the
    group is absent from the reference (metrics NULL — a brand-new
    group is itself a drift signal; the right-join keeps it). Groups
    in the reference that this batch doesn't touch are not emitted —
    a micro-batch is a partial view, their absence means nothing.

    Read the log with ``spark.read.parquet(log_dir)`` — ``batch_id``
    comes back as a partition column. Returns the StreamingQuery.
    """
    from tdigest_spark.operators.digest_agg import tdigest_agg
    from tdigest_spark.operators.drift import digest_drift

    by = list(by)
    if not by:
        raise ValueError("drift_monitor needs grouping keys (by=...)")
    thresholds = dict(thresholds or {})
    unknown = [m for m in thresholds if m not in metrics]
    if unknown:
        raise ValueError(f"thresholds for unrequested metric(s) {unknown}")
    # the reference is reused every batch: pin its computed form once
    reference = reference.localCheckpoint(eager=True)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        cur = tdigest_agg(batch_df, value_col, by=by, delta=delta)
        scored = digest_drift(reference, cur, by=by, metrics=metrics, how="right")
        new_group = F.lit(False)
        breach = F.lit(False)
        for m in metrics:
            new_group = new_group | F.col(m).isNull()
            if m in thresholds:
                breach = breach | (F.col(m) > F.lit(float(thresholds[m])))
        scored = scored.withColumn("alert", new_group | breach)
        # overwrite exactly this batch's partition: replay-idempotent
        scored.write.mode("overwrite").parquet(f"{log_dir}/batch_id={batch_id}")

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
