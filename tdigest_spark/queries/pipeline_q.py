"""End-to-end training-data curation query: the composition the whole
engine exists for — dedup -> quality filter -> per-lang sketch stats,
one Spark pipeline, oracle-checked as one SQL statement.

Shape at 100 TB: exact dedup is a hash groupBy on the text (or a
fingerprint column to avoid shuffling full text); the quality filter is
pure codegen; the surviving rows feed the digest partial/merge
aggregation — three stages, two shuffles (dedup + final agg), no
Python in the filter path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.functions.textstats import with_text_stats
from tdigest_spark.operators.dedup import exact_dedup
from tdigest_spark.operators.digest_agg import tdigest_agg, tdigest_stats
from tdigest_spark.queries.dedup_q import _AUG_SQL, _augmented
from tdigest_spark.queries.text_q import _NTOK, _QUALITY

LOSSLESS = 4_000_000


def pl_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curate the (duplicate-planted) corpus: drop exact duplicates
    (keep min doc_id), drop docs with quality < 0.4, then per-lang
    corpus size, token volume, and median token count (lossless digest
    -> exact)."""
    corpus = _augmented(spark, sf_dir)
    deduped = exact_dedup(corpus, ["text"], "doc_id", keep="min")
    curated = with_text_stats(deduped).where(F.col("quality") >= 0.4)
    stats = curated.select(
        "lang", F.col("n_tokens").cast("double").alias("n_tokens")
    )
    dig = tdigest_agg(stats, "n_tokens", by=["lang"], delta=LOSSLESS)
    q = tdigest_stats(dig, {"p50_tokens": ("quantile", 0.5)})
    agg = curated.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
    )
    return agg.join(q, "lang").select(
        "lang", "n_docs", "sum_tokens", F.round("p50_tokens", 4).alias("p50_tokens")
    )


QUERIES = {"pl_curation_stats": pl_curation_stats}

ORACLES = {
    "pl_curation_stats": f"""
        WITH corpus AS ({_AUG_SQL}),
        deduped AS (
          SELECT * FROM corpus
          WHERE doc_id IN (SELECT min(doc_id) FROM corpus GROUP BY text)
        ),
        curated AS (
          SELECT lang, {_NTOK} AS n_tokens FROM deduped
          WHERE {_QUALITY} >= 0.4
        )
        SELECT lang, count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS sum_tokens,
               round(quantile_cont(n_tokens::DOUBLE, 0.5), 4) AS p50_tokens
        FROM curated GROUP BY lang
    """,
}
