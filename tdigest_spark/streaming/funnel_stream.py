"""Streaming funnel: the batch greedy-earliest fold
(``operators/funnel.py::funnel_steps``) as per-key
``applyInPandasWithState`` state.

State per key is exactly the fold accumulator — one epoch per step
(O(k) FOREVER, stream length never grows it). Each micro-batch sorts
its own (ts, step) pairs and advances the chain; the key's current
(steps_completed, t_step_i...) row is re-emitted every batch the key
appears in (update mode).

Parity caveat (inherent to greedy funnel state, not this
implementation): the fold equals the batch result when each key's
events are PROCESSED in nondecreasing event-time order across
micro-batches (within a batch they are sorted here). A step-1 event
arriving after a later one was already accepted cannot retract the
chain — the same property any incremental funnel engine has. Batch
parity on time-ordered delivery is tested exactly.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stateful_funnel_stream"]


def stateful_funnel_stream(
    stream: DataFrame,
    step_col: str,
    steps: Sequence[str],
    ts_col: str,
    by: str | Sequence[str],
) -> DataFrame:
    """Per-key funnel progress over an unbounded stream. Output
    (update mode): (by..., steps_completed int, t_step_1..k timestamp)
    — the same row :func:`~tdigest_spark.operators.funnel.funnel_steps`
    produces for the data seen so far."""
    steps = list(steps)
    if not steps:
        raise ValueError("need at least one funnel step")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    by = [by] if isinstance(by, str) else list(by)
    k = len(steps)
    step_rank = {s: j for j, s in enumerate(steps)}

    ts = F.col(ts_col).cast("timestamp")
    src = stream.filter(ts.isNotNull() & F.col(step_col).isin(steps)).select(
        *by,
        ts.cast("double").alias("__ep"),
        F.col(step_col).cast("string").alias("__step"),
    )
    state_schema = T.StructType(
        [T.StructField("t", T.ArrayType(T.DoubleType()), False)]
    )
    out_schema = T.StructType(
        [src.schema[c] for c in by]
        + [T.StructField("steps_completed", T.IntegerType())]
        + [
            T.StructField(f"t_step_{j + 1}", T.TimestampType())
            for j in range(k)
        ]
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        t: list = list(state.get[0]) if state.exists else [None] * k
        for pdf in pdfs:
            # batch-local time order; step index breaks ts ties exactly
            # like the batch fold's array_sort over (ts, step) structs
            pdf = pdf.assign(__j=pdf["__step"].map(step_rank)).sort_values(
                ["__ep", "__j"], kind="mergesort"
            )
            for ep, j in zip(pdf["__ep"], pdf["__j"]):
                j = int(j)
                if t[j] is None and (
                    j == 0 or (t[j - 1] is not None and ep >= t[j - 1])
                ):
                    t[j] = float(ep)
        state.update((t,))
        done = sum(1 for x in t if x is not None)
        row: dict = {c: [kv] for c, kv in zip(by, key)}
        row["steps_completed"] = [done]
        for j in range(k):
            # tz-aware UTC: a NAIVE epoch-rebuilt Timestamp would be
            # re-localized by the Arrow serializer to the session
            # timezone, shifting every step time on non-UTC sessions
            row[f"t_step_{j + 1}"] = [
                None if t[j] is None else pd.Timestamp(t[j], unit="s", tz="UTC")
            ]
        yield pd.DataFrame(row)

    return src.groupBy(*by).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
