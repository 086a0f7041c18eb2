"""Continuous-aggregate maintenance job: the spark-submit front door
for the hypertable rollup lifecycle (``operators/hypertable.py``) —
one CLI that a scheduler can run per arriving batch and per retention
window, emitting a JSON manifest line per action (the checkpoint/
lineage/metrics shape the webpages job established).

Actions (``--mode``):

  ingest     merge one parquet batch of raw rows into the rollup
             (replay-idempotent: an already-committed ingest id is a
             recorded no-op)
  retention  tiered downsample + age-out (``--tiers age:width,...``);
             ``--bump-id false`` for tables fed by a streaming sink
  report     window stats from the rollup alone — tumbling
             (``--window-sec``) or sliding (``+ --slide-sec``),
             optionally gap-filled (``--gapfill null|locf``)
  info       table metrics: ingest id, snapshot revision, per-width
             bucket counts + coverage

At 100 TB: ingest scans only the new batch; retention and every
report touch only the O(buckets x groups) rollup rows.
"""

from __future__ import annotations

import json
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from tdigest_spark.operators.hypertable import (
    gapfill_windows,
    hypertable_downsample,
    hypertable_info,
    hypertable_sliding_stats,
    hypertable_upsert,
    hypertable_window_stats,
)

__all__ = ["ingest_batch", "run_retention", "window_report", "main"]

DEFAULT_STATS = {
    "p50": ("quantile", 0.5),
    "p99": ("quantile", 0.99),
    "n": ("total_weight",),
}


def ingest_batch(
    rows: DataFrame,
    table_dir: str,
    value_col: str,
    ts_col: str,
    bucket_sec: int,
    by: Sequence[str] = (),
    delta: int = 200,
    ingest_id: int | None = None,
) -> dict:
    """One upsert + manifest (ingest id, rows seen, wall seconds, and
    the post-commit table metrics)."""
    t0 = time.perf_counter()
    n = rows.count()
    iid = hypertable_upsert(
        rows, value_col, ts_col, bucket_sec, table_dir,
        by=by, delta=delta, ingest_id=ingest_id,
    )
    wall = round(time.perf_counter() - t0, 3)
    m = {
        "action": "ingest",
        "ingest_id": iid,
        "replayed_noop": iid is None,
        "rows_in_batch": n,
        "wall_sec": wall,
        "rows_per_sec": round(n / wall, 1) if wall > 0 else None,
    }
    m["table"] = hypertable_info(rows.sparkSession, table_dir, bucket_sec)
    return m


def run_retention(
    spark: SparkSession,
    table_dir: str,
    bucket_sec: int,
    as_of,
    tiers: Sequence[tuple[float, int]] = (),
    drop_older_than: float | None = None,
    bump_id: bool = True,
) -> dict:
    """One downsample pass + before/after metrics manifest."""
    before = hypertable_info(spark, table_dir, bucket_sec)
    t0 = time.perf_counter()
    iid = hypertable_downsample(
        spark, table_dir, bucket_sec, as_of,
        tiers=tiers, drop_older_than=drop_older_than, bump_id=bump_id,
    )
    after = hypertable_info(spark, table_dir, bucket_sec)
    return {
        "action": "retention",
        "committed_id": iid,
        "bump_id": bump_id,
        "wall_sec": round(time.perf_counter() - t0, 3),
        "rows_before": before["n_rows"],
        "rows_after": after["n_rows"],
        "widths_after": sorted(after["widths"]),
        "table": after,
    }


def window_report(
    spark: SparkSession,
    table_dir: str,
    bucket_sec: int,
    window_sec: int,
    slide_sec: int | None = None,
    stats: dict | None = None,
    by: Sequence[str] = (),
    gapfill: str = "none",
) -> DataFrame:
    """Window stats from the rollup alone: tumbling (default) or
    sliding (``slide_sec``), optionally densified (``gapfill`` in
    {"none", "null", "locf"}; the gapfill window unit is the slide
    for sliding reports, the window for tumbling ones)."""
    if slide_sec is None:
        out = hypertable_window_stats(
            spark, table_dir, bucket_sec, window_sec,
            stats or DEFAULT_STATS, by=by,
        )
        step = window_sec
    else:
        out = hypertable_sliding_stats(
            spark, table_dir, bucket_sec, window_sec, slide_sec,
            stats or DEFAULT_STATS, by=by,
        )
        step = slide_sec
    if gapfill != "none":
        out = gapfill_windows(out, step, by=by, fill=gapfill)
    return out


def _parse_tiers(s: str) -> list[tuple[float, int]]:
    """``"1209600:604800,5184000:2419200"`` -> [(age, width), ...]."""
    out = []
    for part in s.split(","):
        if not part.strip():
            continue
        age, _, width = part.partition(":")
        out.append((float(age), int(width)))
    return out


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", required=True,
                   choices=["ingest", "retention", "report", "info"])
    p.add_argument("--table", required=True, help="rollup table dir")
    p.add_argument("--bucket-sec", type=int, default=86_400)
    p.add_argument("--events", help="parquet batch path (ingest)")
    p.add_argument("--value-col", default="value")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--by", default="", help="comma-separated group keys")
    p.add_argument("--delta", type=int, default=200)
    p.add_argument("--ingest-id", type=int, default=None)
    p.add_argument("--as-of", help="retention reference time (ISO/epoch)")
    p.add_argument("--tiers", default="", help="age:width,... (seconds)")
    p.add_argument("--drop-older-than", type=float, default=None)
    p.add_argument("--bump-id", default="true", choices=["true", "false"],
                   help="false for streaming-sink-fed tables")
    p.add_argument("--window-sec", type=int, default=7 * 86_400)
    p.add_argument("--slide-sec", type=int, default=None)
    p.add_argument("--gapfill", default="none", choices=["none", "null", "locf"])
    p.add_argument("--out", default=None, help="report parquet output dir")
    args = p.parse_args()
    from tdigest_spark.session import get_spark

    spark = get_spark("hypertable_job")
    by = [c for c in args.by.split(",") if c]
    if args.mode == "ingest":
        rows = spark.read.parquet(args.events)
        manifest = ingest_batch(
            rows, args.table, args.value_col, args.ts_col, args.bucket_sec,
            by=by, delta=args.delta, ingest_id=args.ingest_id,
        )
        print(json.dumps(manifest, default=str))
    elif args.mode == "retention":
        manifest = run_retention(
            spark, args.table, args.bucket_sec,
            float(args.as_of) if args.as_of.replace(".", "").isdigit() else args.as_of,
            tiers=_parse_tiers(args.tiers),
            drop_older_than=args.drop_older_than,
            bump_id=args.bump_id == "true",
        )
        print(json.dumps(manifest, default=str))
    elif args.mode == "report":
        df = window_report(
            spark, args.table, args.bucket_sec, args.window_sec,
            slide_sec=args.slide_sec, by=by, gapfill=args.gapfill,
        )
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
        rows = df.limit(50).collect()
        print(json.dumps(
            {"action": "report", "rows": [r.asDict(recursive=True) for r in rows]},
            default=str,
        ))
    else:
        print(json.dumps(
            {"action": "info",
             "table": hypertable_info(spark, args.table, args.bucket_sec)},
            default=str,
        ))


if __name__ == "__main__":
    main()
