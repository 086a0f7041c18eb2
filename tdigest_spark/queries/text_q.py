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
    """Token/subword/char stats per lang, plus the per-doc rolling-hash
    fingerprints folded to a per-lang sum + distinct census
    (consolidates round-1's per-doc tx_fingerprints under the 50-row
    driver cap — any single doc's fingerprint changing flips
    fp_checksum, so the evidence strength is preserved; fingerprints
    are mod 2^31, so the BIGINT sum cannot overflow). Round 4 adds
    ``sum_subword_mode`` — the ``token_count(mode="subword")`` fidelity
    level, hash-checked against its DuckDB twin."""
    from tdigest_spark.functions.textstats import token_count

    docs = with_text_stats(load(spark, sf_dir, "documents")).withColumn(
        "n_sub_mode", token_count(F.col("text"), mode="subword")
    )
    return docs.groupBy("lang").agg(
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("n_subwords").cast("long").alias("sum_subwords"),
        F.sum("n_sub_mode").cast("long").alias("sum_subword_mode"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("fingerprint").cast("long").alias("fp_checksum"),
        F.countDistinct("fingerprint").alias("n_fp_distinct"),
    )


def tx_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring + the text-stats -> t-digest composition in one
    row set (consolidates round-2's tx_quality_scores +
    tx_quality_quantiles under the 50-row budget): per-lang mean
    quality / stopword ratio / high-quality count, plus lossless digest
    quantiles of the subword count."""
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    scores = docs.groupBy("lang").agg(
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.round(F.avg("stopword_ratio_en"), 4).alias("avg_sw_ratio"),
        F.sum((F.col("quality") >= 0.7).cast("long")).alias("n_high_quality"),
    )
    sub = docs.select("lang", F.col("n_subwords").cast("double").alias("n_subwords"))
    dig = tdigest_agg(sub, "n_subwords", by=["lang"], delta=LOSSLESS)
    q = tdigest_stats(dig, {"p50_subwords": ("quantile", 0.5), "p90_subwords": ("quantile", 0.9)})
    q = q.withColumn("p50_subwords", F.round("p50_subwords", 4)).withColumn(
        "p90_subwords", F.round("p90_subwords", 4)
    )
    return scores.join(q, "lang")


def tx_lang_id_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = with_text_stats(load(spark, sf_dir, "documents"))
    return docs.groupBy("lang", "lang_guess").agg(F.count("*").alias("n"))


QUERIES = {
    "tx_token_stats": tx_token_stats,
    "tx_quality_summary": tx_quality_summary,
    "tx_lang_id_agreement": tx_lang_id_agreement,
}


def _sw_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(text, ' '), t -> list_contains([{lst}], t)))"
    )


_NTOK = "len(string_split(text, ' '))"
_NSUB = "len(string_split_regex(text, '[aeiou]+')) - 1"
# token_count(mode="subword") twin: per-token greatest(1, vowel groups)
from tdigest_spark.functions.textstats import SUBWORD_COUNT_DUCKDB as _SUBMODE_T

_SUBMODE = _SUBMODE_T.format(col="text")
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
               sum({_SUBMODE})::BIGINT AS sum_subword_mode,
               round(avg(length(text)), 4) AS avg_chars,
               sum({_FP})::BIGINT AS fp_checksum,
               count(DISTINCT {_FP}) AS n_fp_distinct
        FROM documents GROUP BY lang
    """,
    "tx_quality_summary": f"""
        SELECT lang,
               round(avg({_QUALITY}), 4) AS avg_quality,
               round(avg({_sw_hits('en')}::DOUBLE / {_NTOK}), 4) AS avg_sw_ratio,
               sum(CASE WHEN {_QUALITY} >= 0.7 THEN 1 ELSE 0 END)::BIGINT
                   AS n_high_quality,
               round(quantile_cont(({_NSUB})::DOUBLE, 0.5), 4) AS p50_subwords,
               round(quantile_cont(({_NSUB})::DOUBLE, 0.9), 4) AS p90_subwords
        FROM documents GROUP BY lang
    """,
    "tx_lang_id_agreement": f"""
        SELECT lang, {_LANG_GUESS} AS lang_guess, count(*) AS n
        FROM documents GROUP BY lang, lang_guess
    """,
}
