"""Sequence packing: assemble documents into fixed token-budget
training sequences (the "sample packing" step of an LLM data pipeline)
as one distributed, deterministic operator.

Globally optimal bin packing is NP-hard and unnecessary — production
packers pack greedily within shards. The Spark-first shape here:

* every doc is assigned a logical PACK GROUP by ``xxhash64(id) %
  n_groups`` — a property of the ROW, not of the physical partitioning,
  so the output is identical at any parallelism / input layout (the
  repo-wide determinism contract);
* one ``applyInPandas`` per (keys, group) packs its docs with
  first-fit-decreasing (sorted by token count desc, id asc — fully
  deterministic), touching each row once; groups are independent, so
  the stage scales out embarrassingly and per-task memory is
  O(docs/group);
* the classic first-fit guarantee holds per group: at most ONE emitted
  sequence is less than half full (two half-empty bins would have been
  merged), so total sequence count is within ~2x of optimal and fill
  ratios stay high without any cross-group coordination.

Docs longer than the budget get a sequence of their own (callers
truncate/split downstream — this operator never drops or mutates
rows); every other sequence is <= budget by construction.

Sizing ``n_groups``: per-group state is the docs of that group, so
pick n_groups ~ total_docs / (a few million) at warehouse scale; the
default (256) is right for corpora up to the low billions of docs.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    by: Sequence[str] = (),
    n_groups: int = 256,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign every row a sequence id such that each sequence's total
    ``tokens_col`` is <= ``budget`` (oversized docs: singleton
    sequences). Packing never crosses ``by`` boundaries (e.g. pack
    within language or split). Returns ``by + (id_col, tokens_col,
    seq_col)``; sequence-level stats are one groupBy away.

    ``seq_col`` is a BIGINT unique within ``by``: (pack_group << 32) |
    local_bin — stable across runs, partitionings, and cluster sizes.
    Rows with NULL/non-positive token counts are rejected (token
    counting upstream must produce them; silently packing unknown
    lengths would overflow budgets downstream).
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if not 1 <= n_groups <= 1 << 31:
        raise ValueError(f"n_groups must be in [1, 2^31], got {n_groups}")
    by = list(by)
    bad = df.where(
        F.col(tokens_col).isNull() | (F.col(tokens_col) <= 0)
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"pack_sequences: NULL or non-positive {tokens_col} present; "
            "fix token counting upstream"
        )
    src = df.select(
        *by,
        F.col(id_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)))
        .cast("int")
        .alias("__pg"),
    )
    out_schema = T.StructType(
        [src.schema[c] for c in by]
        + [
            src.schema[id_col],
            T.StructField(tokens_col, T.LongType(), False),
            T.StructField(seq_col, T.LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pg = int(pdf["__pg"].iloc[0])
        g = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        toks = g[tokens_col].to_numpy()
        # best-fit-decreasing over a capacity-sorted list: O(log m)
        # search per doc (vs O(m) linear first-fit); the any-fit
        # at-most-one-light-bin guarantee is preserved, tie-break is
        # (smallest remaining, lowest bin id) — deterministic
        caps: list[tuple[int, int]] = []  # sorted (remaining, bin_id)
        n_bins = 0
        assign = []
        for t in toks:
            t = int(t)
            i = bisect.bisect_left(caps, (t, -1))
            if i < len(caps):
                rem, b = caps.pop(i)
                bisect.insort(caps, (rem - t, b))
                assign.append(b)
            else:
                # new bin; an oversized doc occupies one with 0 left
                bisect.insort(caps, (max(budget - t, 0), n_bins))
                assign.append(n_bins)
                n_bins += 1
        out = g[by + [id_col, tokens_col]].copy()
        out[seq_col] = [(pg << 32) | b for b in assign]
        return out

    return src.groupBy(*by, "__pg").applyInPandas(pack, out_schema)
