"""SQL-callable sketch functions.

``register_sql_functions(spark)`` exposes the sketch query surface to
pure SQL (``spark.sql(...)``), mirroring how the reference exposes its
query algebra as plain functions over a digest value
(``quantile``/``cdf``/``mean`` wrappers, ``Postprocess.hs:27-62``):

    SELECT lang, tdigest_quantile(digest, 0.99) FROM digests_view

These run over *digest/sketch rows* — O(groups) rows, never the raw
table — so a per-row Python loop here is driver-light by construction
(the heavy lifting happened in the vectorized build/merge UDAFs). All
are Arrow-batched pandas UDFs, one deserialize per row per batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from tdigest_spark.sketch.bloom import BloomFilter
from tdigest_spark.sketch.cms import CountMin
from tdigest_spark.sketch.hll import HLL
from tdigest_spark.sketch.kll import KLL
from tdigest_spark.sketch.tdigest import TDigest

__all__ = ["register_sql_functions"]


def _digests(d) -> list[TDigest]:
    """A struct column reaches a pandas UDF as a pd.DataFrame of its
    fields (Arrow struct -> columns); plain Series of dicts otherwise."""
    if isinstance(d, pd.DataFrame):
        rows = d.to_dict("records")
    else:
        rows = [r if isinstance(r, dict) else r.asDict() for r in d]
    return [TDigest.from_row(r) for r in rows]


def register_sql_functions(spark: SparkSession) -> None:
    """Register the sketch query surface as SQL functions:

    t-digest (struct column): ``tdigest_quantile(d, q)``,
    ``tdigest_cdf(d, x)``, ``tdigest_median(d)``, ``tdigest_mean(d)``,
    ``tdigest_stddev(d)``, ``tdigest_trimmed_mean(d, lo, hi)``,
    ``tdigest_total_weight(d)``.

    Companion sketches (binary blob column): ``kll_quantile(b, q)``,
    ``hll_estimate(b)``, ``cms_count(b, key)``, ``bloom_contains(b, key)``.

    Drift metrics over TWO digest struct columns (e.g. after joining a
    current and a reference digest view): ``tdigest_ks(a, b)``,
    ``tdigest_w1(a, b)``, ``tdigest_psi(a, b)`` (10 equal-mass bins of
    the first argument).
    """

    @pandas_udf(T.DoubleType())
    def tdigest_quantile(d: pd.DataFrame, q: pd.Series) -> pd.Series:
        return pd.Series(
            [t.quantile(float(x)) for t, x in zip(_digests(d), q)], dtype="float64"
        )

    @pandas_udf(T.DoubleType())
    def tdigest_cdf(d: pd.DataFrame, x: pd.Series) -> pd.Series:
        return pd.Series(
            [t.cdf(float(v)) for t, v in zip(_digests(d), x)], dtype="float64"
        )

    @pandas_udf(T.DoubleType())
    def tdigest_median(d: pd.DataFrame) -> pd.Series:
        return pd.Series([t.median() for t in _digests(d)], dtype="float64")

    @pandas_udf(T.DoubleType())
    def tdigest_mean(d: pd.DataFrame) -> pd.Series:
        return pd.Series([t.mean() for t in _digests(d)], dtype="float64")

    @pandas_udf(T.DoubleType())
    def tdigest_stddev(d: pd.DataFrame) -> pd.Series:
        return pd.Series([t.stddev() for t in _digests(d)], dtype="float64")

    @pandas_udf(T.DoubleType())
    def tdigest_trimmed_mean(d: pd.DataFrame, lo: pd.Series, hi: pd.Series) -> pd.Series:
        return pd.Series(
            [
                t.trimmed_mean(float(a), float(b))
                for t, a, b in zip(_digests(d), lo, hi)
            ],
            dtype="float64",
        )

    @pandas_udf(T.DoubleType())
    def tdigest_total_weight(d: pd.DataFrame) -> pd.Series:
        return pd.Series(
            [0.0 if t.is_empty() else t.total_weight for t in _digests(d)],
            dtype="float64",
        )

    @pandas_udf(T.DoubleType())
    def kll_quantile(b: pd.Series, q: pd.Series) -> pd.Series:
        return pd.Series(
            [KLL.from_bytes(bytes(r)).quantile(float(x)) for r, x in zip(b, q)],
            dtype="float64",
        )

    @pandas_udf(T.DoubleType())
    def hll_estimate(b: pd.Series) -> pd.Series:
        return pd.Series(
            [HLL.from_bytes(bytes(r)).estimate() for r in b], dtype="float64"
        )

    @pandas_udf(T.LongType())
    def cms_count(b: pd.Series, key: pd.Series) -> pd.Series:
        out = []
        for r, k in zip(b, key):
            out.append(int(CountMin.from_bytes(bytes(r)).query([str(k)])[0]))
        return pd.Series(out, dtype="int64")

    @pandas_udf(T.BooleanType())
    def bloom_contains(b: pd.Series, key: pd.Series) -> pd.Series:
        out = []
        for r, k in zip(b, key):
            out.append(bool(BloomFilter.from_bytes(bytes(r)).might_contain([str(k)])[0]))
        return pd.Series(out, dtype="bool")

    # drift metrics over two digest struct columns (joined views):
    #   SELECT tdigest_ks(a.digest, b.digest) FROM cur a JOIN prev b USING (lang)
    from tdigest_spark.operators.drift import ks_distance, psi_score, w1_distance

    def _drift_udf(fn):
        @pandas_udf(T.DoubleType())
        def udf(a: pd.DataFrame, b: pd.DataFrame) -> pd.Series:
            return pd.Series(
                [fn(x, y) for x, y in zip(_digests(a), _digests(b))],
                dtype="float64",
            )

        return udf

    tdigest_ks = _drift_udf(ks_distance)
    tdigest_w1 = _drift_udf(w1_distance)
    tdigest_psi = _drift_udf(psi_score)

    for name, fn in (
        ("tdigest_quantile", tdigest_quantile),
        ("tdigest_cdf", tdigest_cdf),
        ("tdigest_median", tdigest_median),
        ("tdigest_mean", tdigest_mean),
        ("tdigest_stddev", tdigest_stddev),
        ("tdigest_trimmed_mean", tdigest_trimmed_mean),
        ("tdigest_total_weight", tdigest_total_weight),
        ("kll_quantile", kll_quantile),
        ("hll_estimate", hll_estimate),
        ("cms_count", cms_count),
        ("bloom_contains", bloom_contains),
        ("tdigest_ks", tdigest_ks),
        ("tdigest_w1", tdigest_w1),
        ("tdigest_psi", tdigest_psi),
    ):
        spark.udf.register(name, fn)
