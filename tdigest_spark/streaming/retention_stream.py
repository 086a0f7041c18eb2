"""Streaming cohort retention — split where the scale lives: a
stateful EXACTLY-ONCE dedup of raw events down to first-seen
(key, period) pairs (the only O(events) stage), plus a cheap batch
rollup of those pairs into the (cohort, offset) report.

``retention_pairs_stream`` is ORDER-INSENSITIVE (set membership has no
order), so — unlike the funnel fold — streaming output equals the
batch operator's distinct pass for ANY arrival order; parity with
``operators/retention.py::cohort_retention`` is exact and tested on
shuffled delivery. State per key is the set of periods the key was
active in (one long per active period — the same cardinality the batch
shuffle carries for that key).

The emitted append-mode delta table is the natural sink: each row is a
(key, period) pair seen for the FIRST time. ``retention_report`` then
equals ``cohort_retention`` on the reassembled pairs — run it over the
sink table at read time, or in ``foreachBatch`` for a maintained
report."""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["retention_pairs_stream", "retention_report"]


def retention_pairs_stream(
    stream: DataFrame,
    ts_col: str,
    key: str = "user_id",
    period_sec: int = 7 * 86_400,
    by: Sequence[str] = (),
) -> DataFrame:
    """Append-mode stream of first-seen (by..., key, period long)
    pairs: each distinct (key, period) is emitted exactly once, in the
    micro-batch it first appears. NULL timestamps/keys are ignored."""
    if period_sec <= 0:
        raise ValueError(f"period_sec must be > 0, got {period_sec}")
    by = list(by)
    ts = F.col(ts_col).cast("timestamp").cast("double")
    src = stream.filter(
        F.col(ts_col).isNotNull() & F.col(key).isNotNull()
    ).select(
        *by,
        F.col(key).alias("__k"),
        F.floor(ts / F.lit(int(period_sec))).cast("long").alias("__per"),
    )
    state_schema = T.StructType(
        [T.StructField("periods", T.ArrayType(T.LongType()), False)]
    )
    out_schema = T.StructType(
        [src.schema[c] for c in by]
        + [src.schema["__k"], T.StructField("period", T.LongType())]
    )

    def update(
        key_t: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        fresh: list[int] = []
        for pdf in pdfs:
            for p in pdf["__per"]:
                p = int(p)
                if p not in seen:
                    seen.add(p)
                    fresh.append(p)
        state.update((sorted(seen),))
        if not fresh:
            return
        row: dict = {c: [kv] * len(fresh) for c, kv in zip(by, key_t[:-1])}
        row["__k"] = [key_t[-1]] * len(fresh)
        row["period"] = fresh
        yield pd.DataFrame(row)

    return src.groupBy(*by, "__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def retention_report(
    pairs: DataFrame, period_sec: int = 7 * 86_400, by: Sequence[str] = ()
) -> DataFrame:
    """The (cohort_start, offset, n_active, cohort_size, retention)
    report from a first-seen pairs table (the
    :func:`retention_pairs_stream` sink) — identical output schema and
    values to :func:`~tdigest_spark.operators.retention.cohort_retention`
    over the same events. All the heavy lifting (event dedup) already
    happened in the stream; this is an O(distinct pairs) rollup."""
    from pyspark.sql import Window

    by = list(by)
    w = Window.partitionBy(*by, "__k")
    marked = pairs.withColumn("__cohort", F.min("period").over(w))
    counts = marked.groupBy(
        *by, "__cohort", (F.col("period") - F.col("__cohort")).alias("offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))
    base = counts.filter(F.col("offset") == 0).select(
        *by, "__cohort", F.col("n_active").alias("cohort_size")
    )
    out = counts.join(base, [*by, "__cohort"])
    return out.select(
        *by,
        (F.col("__cohort") * period_sec).cast("timestamp").alias("cohort_start"),
        "offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )
