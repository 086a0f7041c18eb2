"""Text-analysis query family — language-ID, quality scoring, token
counting, fingerprinting over ``documents``, each with an exact DuckDB
oracle replicating the same arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.functions.textstats import STOPWORDS, with_text_stats
from tdigest_spark.operators.digest_agg import tdigest_agg, tdigest_stats
from tdigest_spark.sources.tables import load

LOSSLESS = 4_000_000


def tx_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("n_subwords").cast("long").alias("sum_subwords"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


def tx_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    return docs.groupBy("lang").agg(
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg("stopword_ratio_en"), 4).alias("avg_sw_ratio"),
        F.sum((F.col("quality") >= 0.7).cast("long")).alias("n_high_quality"),
    )


def tx_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "lang_guess").agg(F.count("*").alias("n"))


def tx_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rolling-hash fingerprint (exact cross-engine value) +
    collision census."""
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    return docs.select("doc_id", "fingerprint")


def tx_quality_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition: text stats feeding the t-digest — quantiles of the
    subword count per lang (lossless -> exact)."""
    docs = with_text_stats(load(spark, sf_dir, "documents")).select(
        "lang", F.col("n_subwords").cast("double").alias("n_subwords")
    )
    dig = tdigest_agg(docs, "n_subwords", by=["lang"], delta=LOSSLESS)
    out = tdigest_stats(dig, {"p50": ("quantile", 0.5), "p90": ("quantile", 0.9)})
    return out.withColumn("p50", F.round("p50", 4)).withColumn(
        "p90", F.round("p90", 4)
    )


QUERIES = {
    "tx_token_stats": tx_token_stats,
    "tx_quality_scores": tx_quality_scores,
    "tx_lang_id_agreement": tx_lang_id_agreement,
    "tx_fingerprints": tx_fingerprints,
    "tx_quality_quantiles": tx_quality_quantiles,
}


def _sw_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> list_contains([{lst}], t)))"
    )


_NTOK = "len(string_split(text, ' '))"
_NSUB = "len(string_split_regex(text, '[aeiou]+')) - 1"
_MEANLEN = f"length(replace(text, ' ', ''))::DOUBLE / {_NTOK}"
_QUALITY = (
    f"(CASE WHEN {_NTOK} BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END"
    f" + CASE WHEN {_MEANLEN} BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END"
    f" + CASE WHEN {_sw_hits('en')} > 0 THEN 0.3 ELSE 0.0 END)"
)
# argmax with earlier-profile-wins-ties: strict > when folding left
_LANG_GUESS = (
    "(SELECT lang FROM ("
    + " UNION ALL ".join(
        f"SELECT '{lg}' AS lang, {_sw_hits(lg)} AS n, {i} AS ord"
        for i, lg in enumerate(STOPWORDS)
    )
    + ") ORDER BY n DESC, ord ASC LIMIT 1)"
)
_FP = (
    "list_reduce(list_prepend(0::BIGINT,"
    " [ascii(text[i])::BIGINT FOR i IN range(1, length(text)+1)]),"
    " (acc, c) -> (acc * 31 + c) % 2147483648)"
)

ORACLES = {
    "tx_token_stats": f"""
        SELECT lang,
               sum({_NTOK})::BIGINT AS sum_tokens,
               sum({_NSUB})::BIGINT AS sum_subwords,
               round(avg(length(text)), 4) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "tx_quality_scores": f"""
        SELECT lang,
               round(avg({_QUALITY}), 4) AS avg_quality,
               round(avg({_sw_hits('en')}::DOUBLE / {_NTOK}), 4) AS avg_sw_ratio,
               sum(CASE WHEN {_QUALITY} >= 0.7 THEN 1 ELSE 0 END)::BIGINT
                   AS n_high_quality
        FROM documents GROUP BY lang
    """,
    "tx_lang_id_agreement": f"""
        SELECT lang, {_LANG_GUESS} AS lang_guess, count(*) AS n
        FROM documents GROUP BY lang, lang_guess
    """,
    "tx_fingerprints": f"""
        SELECT doc_id, {_FP} AS fingerprint FROM documents
    """,
    "tx_quality_quantiles": f"""
        SELECT lang,
               round(quantile_cont(({_NSUB})::DOUBLE, 0.5), 4) AS p50,
               round(quantile_cont(({_NSUB})::DOUBLE, 0.9), 4) AS p90
        FROM documents GROUP BY lang
    """,
}
