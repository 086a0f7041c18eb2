"""Funnel analysis: ordered multi-step conversion over event streams.

"Of the users who did step 1, how many went on to do step 2, then
step 3, ...?" — each later step must occur AT OR AFTER the previous
step's earliest qualifying time (the standard product-analytics
funnel, greedy-earliest semantics: t1 = min ts of step 1, t_k = min
ts of step k with ts >= t_{k-1}).

Spark-first shape: ONE shuffle groups each key's (ts, step) pairs,
then a whole-stage-codegen ``aggregate`` fold walks the key's
time-sorted events once, carrying the per-step earliest times — no
k-way self-join (the naive form joins the events table once per step;
at 100 TB that is k shuffles of the full table), no Python stage.
Events not matching any step are dropped BEFORE the shuffle, so the
shuffle carries only funnel-relevant rows.

Ties: an event at exactly t_{k-1} can satisfy step k (>= semantics) —
but within the fold, one event row advances at most one step, and
same-timestamp events are processed in timestamp order with ties
broken by step index (earlier steps first), making the result
deterministic and equal to the greedy chain on the sorted multiset.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel_steps", "funnel_counts"]


def funnel_steps(
    events: DataFrame,
    step_col: str,
    steps: Sequence[str],
    ts_col: str,
    by: str | Sequence[str],
) -> DataFrame:
    """One row per key: ``steps_completed`` (0..len(steps)) plus a
    ``t_step_i`` timestamp column per step (NULL once the chain
    breaks). Keys with no step-1 event report 0 completed but still
    appear (they had SOME funnel event)."""
    if not steps:
        raise ValueError("need at least one funnel step")
    if len(set(steps)) != len(steps):
        # array_position maps every event to the FIRST occurrence, so a
        # repeated step name could never be reached — reject loudly
        raise ValueError(f"funnel steps must be distinct, got {list(steps)}")
    by = [by] if isinstance(by, str) else list(by)
    k = len(steps)
    step_idx = F.array_position(
        F.array(*[F.lit(s) for s in steps]), F.col(step_col)
    ).cast("int")
    ts = F.col(ts_col).cast("timestamp")
    ev = (
        events.filter(ts.isNotNull())
        .withColumn("__step", step_idx)
        .filter(F.col("__step") > 0)
        .select(*by, ts.alias("__ts"), "__step")
    )
    # per key: sort (ts, step) pairs, then fold carrying the earliest
    # qualifying time per step; acc[i] = t_{i+1} or NULL
    pairs = ev.groupBy(*by).agg(
        F.array_sort(F.collect_list(F.struct("__ts", "__step"))).alias("__evs")
    )
    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])

    def fold(acc, e):
        # advance step j (1-based e.__step) iff it is unreached and its
        # predecessor was reached at or before this event
        out = []
        for j in range(k):
            prev_ok = (
                F.lit(True)
                if j == 0
                else (acc[j - 1].isNotNull() & (e["__ts"] >= acc[j - 1]))
            )
            take = acc[j].isNull() & (e["__step"] == j + 1) & prev_ok
            out.append(F.when(take, e["__ts"]).otherwise(acc[j]))
        return F.array(*out)

    folded = pairs.select(
        *by, F.aggregate("__evs", init, fold).alias("__t")
    )
    t_cols = [F.col("__t")[i].alias(f"t_step_{i + 1}") for i in range(k)]
    completed = F.aggregate(
        "__t", F.lit(0), lambda acc, t: F.when(t.isNotNull(), acc + 1).otherwise(acc)
    )
    # NULLs after a break are structural (a later step cannot be
    # reached without its predecessor), so counting non-NULLs == the
    # prefix length
    return folded.select(*by, completed.alias("steps_completed"), *t_cols)


def funnel_counts(
    events: DataFrame,
    step_col: str,
    steps: Sequence[str],
    ts_col: str,
    by: str | Sequence[str],
) -> DataFrame:
    """The funnel report: one row per step with the number of keys
    that reached it (monotone non-increasing) and the conversion rate
    from the previous step."""
    per_key = funnel_steps(events, step_col, steps, ts_col, by)
    k = len(steps)
    reached = per_key.agg(
        *[
            F.sum((F.col("steps_completed") >= i).cast("long")).alias(f"__r{i}")
            for i in range(1, k + 1)
        ]
    )
    rows = reached.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("step"),
                        F.lit(steps[i - 1]).alias("step_name"),
                        F.col(f"__r{i}").alias("n_reached"),
                        (
                            F.col(f"__r{i}")
                            / F.nullif(
                                F.col(f"__r{i - 1}") if i > 1 else F.col("__r1"),
                                F.lit(0),
                            )
                            if i > 1
                            else F.lit(1.0)
                        ).alias("conversion"),
                    )
                    for i in range(1, k + 1)
                ]
            )
        ).alias("s")
    )
    return rows.select("s.*")
