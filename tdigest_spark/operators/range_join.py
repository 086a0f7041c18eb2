"""Range (interval) join — points matched to every covering interval.

Joins each point row to every interval row with ``lo <= p < hi``
(half-open, per key). Spark's own answer to a non-equi join is a
nested-loop — quadratic per key at 100 TB. This is the Spark-first
bucketization:

1. pick a bucket width (default: the intervals' median span, read
   from ONE tiny aggregate over the interval table — the digest
   library's own trick of sizing physical layout from a distribution
   summary),
2. explode each interval to the buckets it covers
   (``sequence(floor(lo/w), floor(hi/w))`` — the end bucket may be
   one too many on exact boundaries; the residual predicate removes
   false pairs, so no epsilon games),
3. EQUI-join points on ``(keys, floor(p/w))`` — shuffle hash/sort
   merge, never nested-loop — then filter ``lo <= p AND p < hi``.
   A point lives in exactly one bucket, so no dedup pass is needed.

Degenerate guard: an interval spanning more than ``max_span_buckets``
buckets would explode the build side. Such intervals (rare by
construction when the width tracks the median span) are split off and
joined by broadcast nested-loop instead — the artifact of record for
"no silent caps": both paths are exact, only the join strategy
differs.

Cost: O(points + intervals x avg_span/width) exploded rows through
one equi-join shuffle; the long tail pays a broadcast of only its own
rows. All JVM expressions, zero Python stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["range_join"]


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: str | Sequence[str] = (),
    bucket_width: float | None = None,
    max_span_buckets: int = 64,
) -> DataFrame:
    """Inner range join: every (point row, interval row) pair with
    ``lo <= point < hi`` and equal ``by`` keys. Output columns: all
    point columns, then the interval's non-key columns. NULL points or
    NULL bounds never match."""
    by = [by] if isinstance(by, str) else list(by)
    clash = (set(intervals.columns) - set(by)) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns collide with points: {sorted(clash)}")
    if point_col in intervals.columns:
        raise ValueError(f"point column {point_col!r} also exists on intervals")
    p = F.col(point_col).cast("double")
    lo, hi = F.col(lo_col).cast("double"), F.col(hi_col).cast("double")

    if bucket_width is None:
        # one O(intervals) aggregate; median span keeps the explode
        # factor ~2 per interval regardless of units
        row = intervals.select(
            F.expr(
                f"percentile_approx(cast({hi_col} as double) - "
                f"cast({lo_col} as double), 0.5)"
            ).alias("w")
        ).collect()[0]
        bucket_width = float(row["w"]) if row["w"] and row["w"] > 0 else 1.0
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    w = float(bucket_width)

    iv = intervals.filter(lo.isNotNull() & hi.isNotNull() & (lo < hi))
    span = (F.floor(hi / w) - F.floor(lo / w)).cast("long")
    short = iv.filter(span < max_span_buckets)
    long_ = iv.filter(span >= max_span_buckets)
    # one tiny job on the interval side decides whether the long
    # branch exists at all — otherwise the union would re-scan the
    # full points table against an empty broadcast side
    has_long = bool(long_.limit(1).count())

    pts = points.filter(p.isNotNull()).withColumn(
        "__bucket", F.floor(p / w).cast("long")
    )
    exploded = short.withColumn(
        "__bucket",
        F.explode(
            F.sequence(F.floor(lo / w).cast("long"), F.floor(hi / w).cast("long"))
        ),
    )
    residual = (p >= lo) & (p < hi)
    matched = pts.join(exploded, [*by, "__bucket"]).filter(residual).drop("__bucket")

    out_cols = [*points.columns, *[c for c in intervals.columns if c not in (*by,)]]
    matched = matched.select(*out_cols)
    if not has_long:
        return matched
    # the rare wide intervals: broadcast THEM (only their rows), join
    # by predicate — exactness preserved, strategy differs
    long_matched = (
        points.filter(p.isNotNull())
        .join(
            F.broadcast(long_),
            [
                *[points[c] == long_[c] for c in by],
                p >= lo,
                p < hi,
            ],
        )
        .select(
            *[points[c] for c in points.columns],
            *[long_[c] for c in intervals.columns if c not in (*by,)],
        )
    )
    return matched.unionByName(long_matched)
