"""As-of (nearest-timestamp) join — the event-enrichment operator.

Joins every left row to the single right row with the greatest
timestamp ``<=`` the left row's (``direction="backward"``; ``>=`` for
``"forward"``), per key — "attach the most recent reference reading
to each event". Spark has no built-in; the naive forms are a range
join (quadratic per key) or a per-key Python loop. This is the
Spark-first composition:

1. UNION the two sides with a tag column (right rows carry their
   payload columns, left rows carry NULLs),
2. ONE shuffle+sort on ``(keys, ts, tag)`` — right sorts before left
   at equal timestamps, so an exact-timestamp match is visible,
3. ``last(payload, ignorenulls=True)`` over the running window fills
   each left row with the latest right payload at-or-before it,
4. filter back to left rows; an optional ``tolerance_sec`` NULLs out
   matches staler than the bound (match presence is per-row, the join
   itself never drops left rows — it is a LEFT as-of join).

Cost: O((|L|+|R|) log) — one Exchange of the projected columns and a
per-key sort, all JVM window expressions, zero Python stages. Skew is
bounded by the heaviest key (same note as sessionize). At 100 TB this
beats a range join by orders of magnitude: no candidate explosion,
and the only wide column movement is the right payload actually
requested.

Semantics match DuckDB's native ``ASOF JOIN`` (the oracle in
``aj_asof_enrich_events``): ties inside the RIGHT side on (key, ts)
are resolved arbitrarily there, so — like any well-defined as-of use —
deduplicate the right side to unique (key, ts) first.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str | Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``value_cols`` (default: all right columns except keys and ts) and
    its timestamp as ``matched_ts``. Unmatched (or out-of-tolerance)
    rows keep NULLs."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    by = [by] if isinstance(by, str) else list(by)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by, ts_col)]
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns collide with left: {sorted(clash)}")
    if matched_ts_col in left.columns:
        raise ValueError(f"column {matched_ts_col!r} already exists on the left")

    ts = F.col(ts_col).cast("timestamp")
    # tag 0 sorts before 1 in either direction's ordering: the right
    # row is visible at an exact timestamp tie, which is what
    # "at-or-before" (resp. at-or-after) means
    l_tag, r_tag = 1, 0
    # the whole right row travels as ONE struct so the window fill
    # cannot mix fields from different right rows (a per-column
    # last(ignorenulls) would backfill a NULL payload field from an
    # OLDER row); right rows with NULL timestamps have no position in
    # time and are dropped
    r_struct = F.struct(
        ts.alias("__rts"), *[F.col(c) for c in value_cols]
    )
    left_struct_t = left.select(F.struct(*left.columns).alias("s")).schema[
        "s"
    ].dataType
    right_struct_t = right.select(r_struct.alias("s")).schema["s"].dataType
    lhs = left.select(
        *by,
        ts.alias(ts_col),
        F.lit(l_tag).alias("__tag"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(right_struct_t).alias("__right"),
    )
    rhs = right.filter(ts.isNotNull()).select(
        *by,
        ts.alias(ts_col),
        F.lit(r_tag).alias("__tag"),
        F.lit(None).cast(left_struct_t).alias("__left"),
        r_struct.alias("__right"),
    )
    both = lhs.unionByName(rhs)
    order = [F.col(ts_col).asc(), F.col("__tag").asc()]
    if direction == "forward":
        order = [F.col(ts_col).desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # a NULL-timestamp left row has no position in time: force a
    # NULL match rather than whatever the sort order would fill
    has_ts = F.col(ts_col).isNotNull()
    filled = both.select(
        "__left",
        F.col(ts_col).alias("__lts"),
        F.col("__tag"),
        F.when(has_ts, F.last("__right", ignorenulls=True).over(w)).alias("__m"),
    ).filter(F.col("__tag") == l_tag)
    if tolerance_sec is not None:
        gap = F.abs(
            F.col("__lts").cast("double") - F.col("__m.__rts").cast("double")
        )
        ok = F.col("__m").isNotNull() & (gap <= F.lit(float(tolerance_sec)))
        filled = filled.withColumn("__m", F.when(ok, F.col("__m")))
    return filled.select(
        "__left.*",
        F.col("__m.__rts").alias(matched_ts_col),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
