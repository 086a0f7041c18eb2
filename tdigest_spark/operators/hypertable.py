"""Hypertable rollup: an incrementally-maintained time-bucketed digest
table (the "continuous aggregate" shape).

Raw events land in batches; the rollup table holds ONE digest row per
(time bucket, keys) — O(buckets x groups x delta), not O(rows) — and
each ingest touches only the buckets present in the new data. Coarser
windows (day -> week -> month) are answered by MERGING bucket digests,
never by rescanning raw data: the same mergeability that powers the
partial/final aggregate powers the rollup lattice.

Storage/commit protocol is the streaming ``digest_sink``'s
snapshot-pointer table (one atomic symlink swap carries data + the
last-ingest marker), so batch ingests get the same crash safety and
replay idempotence without a streaming checkpoint:

- ``hypertable_upsert`` — digest the new rows per (bucket, keys),
  semi/anti-split the existing table so ONLY touched buckets pay the
  merge, commit a new snapshot. Re-running an ingest id is a no-op.
- ``hypertable_window_stats`` — stats over any window that is a
  multiple of the bucket: merge O(window/bucket) digest rows per
  output row, all from the rollup table.

At 100 TB: the ingest scans only the new raw partitions; the rollup
table itself stays O(buckets x groups) rows forever, so the
maintenance merge and every window query are sketch-sized jobs.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from tdigest_spark.operators.digest_agg import (
    tdigest_agg,
    tdigest_merge_agg,
    tdigest_stats,
)
from tdigest_spark.streaming.digest_stream import (
    _commit_snapshot,
    _last_committed_batch,
    _split_touched,
)

__all__ = ["hypertable_upsert", "hypertable_window_stats", "time_bucket"]


def time_bucket(ts_col: str, bucket_sec: int, out_col: str = "bucket_start"):
    """Tumbling time-bucket start as a timestamp column (codegen)."""
    e = F.col(ts_col).cast("timestamp").cast("double")
    return (
        (F.floor(e / F.lit(int(bucket_sec))) * F.lit(int(bucket_sec)))
        .cast("timestamp")
        .alias(out_col)
    )


def hypertable_upsert(
    rows: DataFrame,
    value_col: str,
    ts_col: str,
    bucket_sec: int,
    table_dir: str,
    by: Sequence[str] = (),
    delta: int = 200,
    ingest_id: int | None = None,
) -> int | None:
    """Merge one batch of raw rows into the rollup table. Returns the
    committed ingest id, or None if ``ingest_id`` was already merged
    (replay no-op). Rows with NULL timestamps are skipped (no bucket)."""
    by = list(by)
    keys = ["bucket_start", *by]
    last = _last_committed_batch(table_dir)
    if ingest_id is None:
        ingest_id = 0 if last is None else last + 1
    if last is not None and ingest_id <= last:
        return None
    spark = rows.sparkSession
    bucketed = rows.withColumn("bucket_start", time_bucket(ts_col, bucket_sec)).filter(
        F.col("bucket_start").isNotNull()
    )
    new = tdigest_agg(bucketed, value_col, by=keys, delta=delta)
    if last is not None:
        # incremental-view maintenance: only buckets present in this
        # ingest go through the merge; untouched rows pass through
        # byte-identical (same split as digest_sink)
        new = new.localCheckpoint(eager=True)
        old = spark.read.parquet(table_dir)
        ks = new.select(*keys).distinct()
        touched, untouched = _split_touched(old, ks, keys)
        merged = tdigest_merge_agg(
            touched.unionByName(new), by=keys
        ).unionByName(untouched)
    else:
        merged = new
    _commit_snapshot(merged, table_dir, ingest_id)
    return ingest_id


def hypertable_window_stats(
    spark: SparkSession,
    table_dir: str,
    bucket_sec: int,
    window_sec: int,
    stats: Mapping[str, tuple],
    by: Sequence[str] = (),
) -> DataFrame:
    """Stats per (window_start, keys) for any window that is a whole
    multiple of the bucket — computed by merging bucket digests from
    the rollup table; raw data is never touched."""
    if window_sec % bucket_sec != 0 or window_sec <= 0:
        raise ValueError(
            f"window_sec ({window_sec}) must be a positive multiple of "
            f"bucket_sec ({bucket_sec})"
        )
    t = spark.read.parquet(table_dir)
    win = time_bucket("bucket_start", window_sec, out_col="window_start")
    merged = tdigest_merge_agg(
        t.withColumn("window_start", win).drop("bucket_start"),
        by=["window_start", *list(by)],
    )
    return tdigest_stats(merged, dict(stats))
