"""Sketch-accelerated joins: Bloom semijoin pre-filter.

The 100 TB join problem: joining a huge fact table to a selective
dimension subset shuffles the whole fact table even though only a
small fraction survives the join. Spark's AQE adds runtime bloom
filters for some shapes; here the same idea is built from OUR Bloom
sketch so it (a) works for any join the planner can't infer and
(b) demonstrates the sketch algebra accelerating relational execution:

  1. aggregate the small side's keys into ONE Bloom blob
     (``sketch_build`` partial/merge — one tiny collect, O(n_bits));
  2. broadcast the blob inside a vectorized pandas-UDF predicate and
     filter the fact table BEFORE its shuffle;
  3. run the exact join on the survivors.

Bloom has no false negatives, so the filtered join returns exactly the
unfiltered join's rows; false positives (rate ~(1-e^{-kn/m})^k) only
cost a little extra shuffle. Shuffle volume drops by ~the join
selectivity — the difference between shipping 100 TB and shipping the
~1% that matters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tdigest_spark.operators.sketch_agg import sketch_build
from tdigest_spark.sketch.bloom import BloomFilter

__all__ = ["bloom_filter_column", "bloom_semijoin"]


def bloom_filter_column(
    df: DataFrame,
    key_col: str,
    keys_df: DataFrame,
    keys_col: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    out_col: str = "__bloom_hit",
) -> DataFrame:
    """Add a boolean column: ``key_col`` probably in ``keys_df.keys_col``.

    The key set is sketched into one Bloom blob (distributed build,
    one O(n_bits/8)-byte collect) that rides the UDF closure to every
    worker — the sketch analog of a broadcast join's build side.

    The probe is a mapInPandas stage, opaque to Catalyst: ``select()``
    the columns you need BEFORE calling this, or the scan reads every
    column (PLANS.md §5).
    """
    import numpy as np

    blob = sketch_build(keys_df, {"b": ("bloom", keys_col, n_bits, n_hashes)}).collect()[
        0
    ]["b"]
    bf = BloomFilter.from_bytes(bytes(blob))
    # stringify SPARK-side with the exact cast the build side used —
    # pandas astype(str) disagrees with Spark cast for nullable ints
    # ('123.0' vs '123'), booleans and scientific-notation doubles,
    # which would turn into false negatives (dropped rows)
    key_str = "__bloom_key"
    src = df.withColumn(key_str, F.col(key_col).cast("string"))
    out_schema = T.StructType(
        list(src.schema.fields) + [T.StructField(out_col, T.BooleanType())]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            keys = pdf[key_str]
            mask = keys.notna().to_numpy()
            res = np.zeros(len(pdf), dtype=bool)  # NULL key: not a member
            if mask.any():
                res[mask] = bf.might_contain(keys[mask].to_numpy())
            out[out_col] = res
            yield out

    return src.mapInPandas(probe, out_schema).drop(key_str)


def bloom_semijoin(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_bits: int = 1 << 20,
    n_hashes: int = 7,
    how: str = "inner",
) -> DataFrame:
    """Exact ``large JOIN small ON on`` with the large side pre-filtered
    by a Bloom sketch of the small side's keys, then broadcast-joined.

    Because Bloom never misses a present key, the result is EXACTLY the
    plain join's result; only the (shuffle) volume changes. That
    equivalence holds ONLY for join types that drop unmatched large-side
    rows anyway (``inner`` / ``left_semi``): for left/full outer the
    pre-filter would silently delete the unmatched rows an outer join
    must keep, so other types are rejected.
    """
    if how not in ("inner", "left_semi", "semi", "leftsemi"):
        raise ValueError(
            f"bloom_semijoin supports inner/left_semi joins only, got {how!r}: "
            "the Bloom pre-filter drops unmatched large-side rows, which an "
            "outer join must preserve — use a plain join for those"
        )
    filtered = bloom_filter_column(
        large, on, small.select(on), on, n_bits=n_bits, n_hashes=n_hashes
    )
    survivors = filtered.where(F.col("__bloom_hit")).drop("__bloom_hit")
    return survivors.join(F.broadcast(small), on, how)
