"""Heavy-key detection + routing support for the per-key windowed
operators (sessionize, as-of join).

Both operators shuffle once on their key and sort each key's rows in
ONE task — the right 100-TB shape except for bot-grade keys (a crawler
user id, a hot url) whose row count exceeds a task budget. The routing
move: detect such keys with the heavy-hitter machinery
(:func:`~tdigest_spark.operators.topk.approx_topk` — one extra
candidate-pruned scan), send normal keys down the unchanged one-window
path, and give each heavy key a PER-KEY PARALLEL sub-plan (time-range
bucketing + boundary stitch, implemented in the operators themselves),
then union. Opt-in via each operator's ``max_rows_per_key``.

Detection guarantee: Misra-Gries candidates capture every key with
count > N/m (m = candidate capacity), so any key over a budget that is
a meaningful fraction of the data is found; if detection SATURATES
(every returned candidate exceeds the budget) the routing raises
rather than silently leaving unrouted heavy keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["key_string", "heavy_key_strings"]

# unit separator + a NULL stand-in that cannot collide with real data
# containing the separator (concat_ws would silently DROP null parts,
# conflating ('a', NULL) with ('a',))
_SEP = "\x1f"
_NULL = "\x00\x00N"


def key_string(by: list[str]) -> Column:
    """Canonical string form of a (possibly multi-column, possibly
    NULL-holding) key — the routing predicate's left side."""
    return F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in by]
    )


def heavy_key_strings(
    df: DataFrame, by: list[str], max_rows_per_key: int, k: int = 64
) -> list[str]:
    """Key strings whose exact row count exceeds ``max_rows_per_key``.
    One candidate-pruned scan (Misra-Gries partials -> exact counts of
    the O(k) candidates); raises if detection saturates."""
    from tdigest_spark.operators.topk import approx_topk

    if max_rows_per_key < 1:
        raise ValueError(f"max_rows_per_key must be >= 1, got {max_rows_per_key}")
    top = approx_topk(df.select(key_string(by).alias("__key")), "__key", k=k)
    rows = top.collect()
    heavy = [r["__key"] for r in rows if r["cnt"] > max_rows_per_key]
    if len(rows) == k and len(heavy) == k:
        raise ValueError(
            f"heavy-key detection saturated: all {k} candidates exceed "
            f"max_rows_per_key={max_rows_per_key}; raise k or the budget"
        )
    return heavy
