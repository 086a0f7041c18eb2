"""Per-row digest-scoring query family for the driver contract.

``eq_rank_bucket_lineitem`` drives the two per-row scoring operators —
:func:`~tdigest_spark.operators.digest_agg.with_equidepth_bucket`
(codegen bucket assignment from digest quantile cuts) and
:func:`~tdigest_spark.operators.digest_agg.with_percentile_rank`
(vectorized mid-rank cdf of every row against its group's broadcast
digest) — from ONE shared lossless digest table, then folds the
per-row outputs into a compact per-(group, bucket) summary the driver
can hash: bucket sizes, a 1e6-scaled integer checksum of all ranks,
and the bucket's rank extrema.

Oracle equivalences (both exact at lossless delta): bucket cuts are
quantile_cont at i/n, membership is ``value > cut`` (cut values
interpolate strictly between adjacent data values, so an ulp of
engine difference cannot flip a comparison); the mid-rank cdf at a
data value is ``(rank()-1 + 0.5*count(=v)) / n``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.digest_agg import (
    tdigest_agg,
    with_equidepth_bucket,
    with_percentile_rank,
)
from tdigest_spark.sources.tables import load

LOSSLESS = 1_000_000


def eq_rank_bucket_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    dig = tdigest_agg(li, "l_extendedprice", by=["l_returnflag"], delta=LOSSLESS)
    # O(groups) digest rows feed both per-row operators — build once
    dig = dig.localCheckpoint(eager=True)
    bucketed = with_equidepth_bucket(
        li, "l_extendedprice", 4, by=["l_returnflag"], digests=dig
    )
    ranked = with_percentile_rank(
        bucketed, dig, "l_extendedprice", by=["l_returnflag"], out_col="pr"
    )
    return ranked.groupBy("l_returnflag", "bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("pr") * 1_000_000).cast("long")).alias("pr_checksum"),
        F.round(F.min("pr"), 6).alias("pr_min"),
        F.round(F.max("pr"), 6).alias("pr_max"),
    )


QUERIES = {"eq_rank_bucket_lineitem": eq_rank_bucket_lineitem}

ORACLES = {
    "eq_rank_bucket_lineitem": """
        WITH c AS (
          SELECT l_returnflag,
                 quantile_cont(l_extendedprice, 0.25) AS c1,
                 quantile_cont(l_extendedprice, 0.50) AS c2,
                 quantile_cont(l_extendedprice, 0.75) AS c3
          FROM lineitem GROUP BY l_returnflag
        ),
        r AS (
          SELECT l.l_returnflag,
                 (l_extendedprice > c1)::INT + (l_extendedprice > c2)::INT
                   + (l_extendedprice > c3)::INT AS bucket,
                 (rank() OVER (PARTITION BY l.l_returnflag
                               ORDER BY l_extendedprice) - 1
                  + 0.5 * count(*) OVER (PARTITION BY l.l_returnflag,
                                         l_extendedprice))
                 / count(*) OVER (PARTITION BY l.l_returnflag) AS pr
          FROM lineitem l JOIN c USING (l_returnflag)
        )
        SELECT l_returnflag, bucket,
               count(*) AS n,
               sum(round(pr * 1000000)::BIGINT)::BIGINT AS pr_checksum,
               round(min(pr), 6) AS pr_min,
               round(max(pr), 6) AS pr_max
        FROM r GROUP BY l_returnflag, bucket
    """,
}
