"""Sessionization: gap-based event grouping for web/event logs.

The classic weblog operator the reference's bench harness has no analog
for but every Common-Crawl-style events pipeline needs: split each
user's (or url's, or host's) event stream into sessions separated by
quiet gaps of at least ``gap_sec``, then aggregate per session.

Semantics match Spark's built-in ``session_window`` exactly: an event
at ``ts`` EXTENDS the current session while ``ts < prev_ts + gap``
(the built-in's window range is ``[first_ts, last_ts + gap)``,
end-exclusive), so a gap of exactly ``gap_sec`` STARTS a new session.
That makes :func:`sessionize` (per-event session ids via window
functions) and :func:`session_window_stats` (the built-in, which also
runs under Structured Streaming with watermark-based state eviction)
two views of the same partitioning — tested equal.

Scale shapes:

- :func:`sessionize` is ONE shuffle on ``by`` (the window partition)
  and a per-key sort — all JVM window expressions, no Python stage.
  Per-key state is each key's own rows, so skew is bounded by the
  heaviest single key (a bot url/user); pre-filter such keys with the
  heavy-hitter sketches if one key's events exceed a task's memory.
- Ties on ``ts`` are safe: a 0-second gap never splits, so session
  BOUNDARIES depend only on each key's sorted timestamp multiset —
  the output is deterministic under repartitioning and non-unique
  sort orders.
- :func:`session_window_stats` is the streaming form: with a
  watermark, Spark drops session state older than the watermark, so
  state is O(open sessions), not O(history).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["sessionize", "session_stats", "session_window_stats"]


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_sec: float,
    by: str | Sequence[str],
    session_col: str = "session_idx",
    max_rows_per_key: int | None = None,
    time_bucket_sec: float = 3600.0,
) -> DataFrame:
    """Add a per-key 1-based session index to every event.

    ``session_idx`` is the running count of session starts in the
    key's time-ordered stream: ``lag`` exposes the previous timestamp,
    a codegen boolean marks gaps ``>= gap_sec``, and a running sum
    over the same window numbers the sessions — one shuffle, one sort,
    zero Python. Rows with a NULL timestamp get a NULL session index
    (they belong to no session; filter or impute upstream).

    Skew routing (``max_rows_per_key``, opt-in): per-key state is each
    key's own rows, so one bot-grade key (count > a task budget) can
    stall a task. With a budget set, keys over it are detected via the
    heavy-hitter sketch pass and routed through
    :func:`_sessionize_heavy` — a per-key PARALLEL sub-plan that
    windows inside ``time_bucket_sec`` time buckets and stitches
    session numbering across bucket boundaries with an O(buckets)
    summary table — then unioned with the unchanged normal path.
    Output is identical to the unrouted form (tested on a planted
    10x-skew key).
    """
    if gap_sec <= 0:
        raise ValueError(f"gap_sec must be > 0, got {gap_sec}")
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError("sessionize needs at least one key column")
    if max_rows_per_key is not None:
        from tdigest_spark.operators.skew import heavy_key_strings, key_string

        heavy = heavy_key_strings(df, by, max_rows_per_key)
        if heavy:
            is_heavy = key_string(by).isin(heavy)
            light = sessionize(
                df.where(~is_heavy), ts_col, gap_sec, by, session_col
            )
            routed = _sessionize_heavy(
                df.where(is_heavy), ts_col, gap_sec, by, session_col,
                time_bucket_sec,
            )
            return light.unionByName(routed)
    ts = F.col(ts_col).cast("timestamp")
    # NULL timestamps sort first and must not advance the counter —
    # their new_sess is pinned to 0 so real rows stay numbered 1..k
    w = Window.partitionBy(*by).orderBy(ts.asc_nulls_first())
    prev = F.lag(ts).over(w)
    new_sess = prev.isNull() | (
        ts.cast("double") - prev.cast("double") >= F.lit(float(gap_sec))
    )
    run = Window.partitionBy(*by).orderBy(ts.asc_nulls_first()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    idx = F.sum(F.when(ts.isNull(), F.lit(0)).otherwise(new_sess.cast("long"))).over(run)
    return df.withColumn(
        session_col, F.when(ts.isNotNull(), idx).otherwise(F.lit(None))
    )


def _sessionize_heavy(
    df: DataFrame,
    ts_col: str,
    gap_sec: float,
    by: list,
    session_col: str,
    time_bucket_sec: float,
) -> DataFrame:
    """Per-key parallel sessionization for heavy keys: window WITHIN
    ``floor(epoch/time_bucket_sec)`` buckets (so one key's rows spread
    over many tasks), then stitch across buckets with an O(buckets)
    summary — per bucket: does its first event start a new session
    (gap vs the previous bucket's last event), and the running count of
    sessions started in earlier buckets (the index offset). Equal
    timestamps always share a bucket (floor is monotone), so tie
    semantics match the unrouted window exactly."""
    if time_bucket_sec <= 0:
        raise ValueError(f"time_bucket_sec must be > 0, got {time_bucket_sec}")
    ts = F.col(ts_col).cast("timestamp")
    ep = ts.cast("double")
    bucketed = df.withColumn("__b", F.floor(ep / F.lit(float(time_bucket_sec))))
    null_ts = bucketed.where(ts.isNull()).withColumn(
        session_col, F.lit(None).cast("long")
    )
    ev = bucketed.where(ts.isNotNull())

    wloc = Window.partitionBy(*by, "__b").orderBy(ts.asc())
    prev = F.lag(ts).over(wloc)
    # new-session flag EXCLUDING each bucket's first event (its
    # predecessor lives in the previous bucket; the summary decides it)
    new_flag = F.when(
        prev.isNotNull()
        & (ts.cast("double") - prev.cast("double") >= F.lit(float(gap_sec))),
        F.lit(1),
    ).otherwise(F.lit(0))
    # materialize the flag before aggregating: lag() is a window
    # expression and may not appear inside an aggregate function
    flagged = ev.withColumn("__nf", new_flag).withColumn(
        "__run",
        F.sum("__nf").over(
            wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )

    summary = flagged.groupBy(*by, "__b").agg(
        F.min(ts).alias("__first_ts"),
        F.max(ts).alias("__last_ts"),
        F.sum("__nf").alias("__n_mid"),
    )
    wb = Window.partitionBy(*by).orderBy("__b")
    prev_last = F.lag("__last_ts").over(wb)
    first_new = (
        prev_last.isNull()
        | (
            F.col("__first_ts").cast("double") - prev_last.cast("double")
            >= F.lit(float(gap_sec))
        )
    ).cast("long")
    summary = summary.withColumn("__first_new", first_new).withColumn(
        "__offset",
        F.coalesce(
            F.sum(F.col("__n_mid") + F.col("__first_new")).over(
                wb.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    # null-safe key equality: a NULL key (missing user id) is the
    # CLASSIC bot-grade heavy key and must still find its summary rows
    s = summary.select(
        *[F.col(c).alias(f"__s_{c}") for c in by],
        F.col("__b").alias("__s_b"),
        "__first_new",
        "__offset",
    )
    cond = flagged["__b"] == s["__s_b"]
    for c in by:
        cond = cond & flagged[c].eqNullSafe(s[f"__s_{c}"])
    stitched = flagged.join(F.broadcast(s), cond).withColumn(
        session_col,
        (F.col("__offset") + F.col("__first_new") + F.col("__run")).cast("long"),
    )
    out_cols = [*df.columns, session_col]
    return stitched.select(*out_cols).unionByName(null_ts.select(*out_cols))


def _std_aggs(ts: Column) -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts).alias("session_start"),
        F.max(ts).alias("session_end"),
        (F.max(ts).cast("double") - F.min(ts).cast("double")).alias(
            "duration_sec"
        ),
    ]


def session_stats(
    df: DataFrame,
    ts_col: str,
    gap_sec: float,
    by: str | Sequence[str],
    aggs: Mapping[str, Column] | None = None,
    max_rows_per_key: int | None = None,
    time_bucket_sec: float = 3600.0,
) -> DataFrame:
    """One row per session: keys, ``session_idx``, start/end,
    ``duration_sec``, ``n_events``, plus any extra ``aggs`` (name ->
    aggregate Column). Builds on :func:`sessionize`; the groupBy
    re-uses the window shuffle's partitioning, so Catalyst plans a
    partial+final aggregate with no second full shuffle of raw rows.
    NULL-timestamp rows (NULL session) are excluded.
    ``max_rows_per_key``/``time_bucket_sec`` pass through to
    :func:`sessionize`'s heavy-key skew routing."""
    by = [by] if isinstance(by, str) else list(by)
    sess = sessionize(
        df, ts_col, gap_sec, by,
        max_rows_per_key=max_rows_per_key, time_bucket_sec=time_bucket_sec,
    )
    ts = F.col(ts_col).cast("timestamp")
    extra = [col.alias(name) for name, col in (aggs or {}).items()]
    return (
        sess.filter(F.col("session_idx").isNotNull())
        .groupBy(*by, "session_idx")
        .agg(*_std_aggs(ts), *extra)
    )


def session_window_stats(
    df: DataFrame,
    ts_col: str,
    gap_sec: float,
    by: str | Sequence[str],
    aggs: Mapping[str, Column] | None = None,
    watermark_sec: float | None = None,
) -> DataFrame:
    """The same per-session aggregate via Spark's native
    ``session_window`` — the form that ALSO runs under Structured
    Streaming: pass the streaming DataFrame and a ``watermark_sec``
    and Spark maintains open-session state per key, finalizing a
    session once the watermark passes its close (state stays O(open
    sessions)). ``session_start``/``session_end`` are the window's
    first/last event times (window.end minus the gap), matching
    :func:`session_stats` exactly on batch input."""
    by = [by] if isinstance(by, str) else list(by)
    if dict(df.dtypes).get(ts_col) != "timestamp":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark_sec is not None:
        # watermark must attach to the GROUPING attribute itself — a
        # cast expression in session_window would orphan it
        df = df.withWatermark(ts_col, f"{int(watermark_sec)} seconds")
    ts = F.col(ts_col)
    win = F.session_window(ts, f"{gap_sec} seconds")
    extra = [col.alias(name) for name, col in (aggs or {}).items()]
    grouped = df.filter(ts.isNotNull()).groupBy(win.alias("w"), *by)
    out = grouped.agg(*_std_aggs(ts), *extra)
    return out.select(
        *by,
        "n_events",
        "session_start",
        "session_end",
        "duration_sec",
        *[c for c in (aggs or {})],
    )
