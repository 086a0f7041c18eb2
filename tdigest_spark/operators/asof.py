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


def _fill_bucketed(
    rows: DataFrame,
    ts_col: str,
    by: list,
    has_ts,
    time_bucket_sec: float,
) -> DataFrame:
    """Heavy-key as-of fill, parallel over time buckets: the window
    fill runs WITHIN ``floor(__p / time_bucket_sec)`` buckets, and a
    per-(key, bucket) summary — the latest right struct of each bucket,
    carried forward with last(ignorenulls) over the O(buckets) bucket
    stream — supplies the match for rows whose nearest right row lives
    in an earlier bucket. Equal timestamps share a bucket (floor is
    monotone in __p), so tie semantics match the one-window fill."""
    if time_bucket_sec <= 0:
        raise ValueError(f"time_bucket_sec must be > 0, got {time_bucket_sec}")
    b = rows.withColumn(
        "__b", F.floor(F.col("__p") / F.lit(float(time_bucket_sec)))
    )
    wloc = (
        Window.partitionBy(*by, "__b")
        .orderBy(F.col("__p").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = b.withColumn(
        "__m_loc", F.when(has_ts, F.last("__right", ignorenulls=True).over(wloc))
    )
    # bucket domain = every (key, bucket) seen on EITHER side (a left
    # row's bucket may hold no right rows at all), right-summarized
    domain = b.where(has_ts).select(*by, "__b").distinct()
    right_last = (
        b.where((F.col("__tag") == 0) & has_ts)
        .groupBy(*by, "__b")
        .agg(F.max_by("__right", F.col("__p")).alias("__blast"))
        .select(
            *[F.col(c).alias(f"__r_{c}") for c in by],
            F.col("__b").alias("__r_b"),
            "__blast",
        )
    )
    cond = domain["__b"] == F.col("__r_b")
    for c in by:
        cond = cond & domain[c].eqNullSafe(F.col(f"__r_{c}"))
    summary = domain.join(right_last, cond, "left").select(*by, "__b", "__blast")
    wb = Window.partitionBy(*by).orderBy("__b")
    summary = summary.select(
        *[F.col(c).alias(f"__s_{c}") for c in by],
        F.col("__b").alias("__s_b"),
        F.last("__blast", ignorenulls=True)
        .over(wb.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__carry"),
    )
    jc = local["__b"] == summary["__s_b"]
    for c in by:
        jc = jc & local[c].eqNullSafe(summary[f"__s_{c}"])
    return (
        local.join(F.broadcast(summary), jc, "left")
        .select(
            "__left",
            F.col(ts_col).alias("__lts"),
            F.col("__tag"),
            F.when(has_ts, F.coalesce("__m_loc", "__carry")).alias("__m"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str | Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    matched_ts_col: str = "matched_ts",
    max_rows_per_key: int | None = None,
    time_bucket_sec: float = 3600.0,
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``value_cols`` (default: all right columns except keys and ts) and
    its timestamp as ``matched_ts``. Unmatched (or out-of-tolerance)
    rows keep NULLs.

    Skew routing (``max_rows_per_key``, opt-in): the window fill puts
    one key's full (left+right) stream in one task; keys whose UNION
    row count exceeds the budget are detected with the heavy-hitter
    pass and filled inside ``time_bucket_sec`` time buckets instead —
    the latest right payload of each earlier bucket is carried across
    boundaries by an O(buckets) summary, so the result is identical to
    the one-window fill while each heavy key's work spreads over
    buckets many tasks wide. Works for keyless (global) as-of too."""
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
    # "procession coordinate": ascending == the direction matches are
    # carried. backward walks time forward (p = epoch), forward walks
    # it backward (p = -epoch); all fill logic below is direction-free.
    p = F.col(ts_col).cast("double")
    if direction == "forward":
        p = -p
    both = both.withColumn("__p", p)
    # a NULL-timestamp left row has no position in time: force a
    # NULL match rather than whatever the sort order would fill
    has_ts = F.col(ts_col).isNotNull()

    def fill_plain(rows: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__p").asc(), F.col("__tag").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return rows.select(
            "__left",
            F.col(ts_col).alias("__lts"),
            F.col("__tag"),
            F.when(has_ts, F.last("__right", ignorenulls=True).over(w)).alias(
                "__m"
            ),
        )

    if max_rows_per_key is not None:
        from tdigest_spark.operators.skew import heavy_key_strings, key_string

        heavy = heavy_key_strings(both, by, max_rows_per_key)
    else:
        heavy = []
    if heavy:
        is_heavy = key_string(by).isin(heavy) if by else F.lit(True)
        filled = fill_plain(both.where(~is_heavy)).unionByName(
            _fill_bucketed(
                both.where(is_heavy), ts_col, by, has_ts, time_bucket_sec
            )
        )
    else:
        filled = fill_plain(both)
    filled = filled.filter(F.col("__tag") == l_tag)
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
