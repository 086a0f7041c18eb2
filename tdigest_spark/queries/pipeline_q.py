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


def pl_neardup_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL near-dup curation composition — MinHash near-dup pairs
    -> connected components -> keep one doc per cluster (min doc_id) ->
    per-lang surviving corpus stats (lossless digest p50 -> exact).
    One pipeline exercising candidate generation, exact verification,
    transitive closure and sketch aggregation together; oracle is a
    single recursive-CTE SQL statement over the exhaustive Jaccard
    graph."""
    from tdigest_spark.operators.dedup import connected_components, minhash_dedup_pairs

    corpus = _augmented(spark, sf_dir)
    pairs = minhash_dedup_pairs(
        corpus, "doc_id", "text", threshold=0.5, shingle_k=3, n_hashes=64, bands=16
    )
    comp = connected_components(pairs.select("id_a", "id_b"))
    dropped = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    survivors = corpus.join(dropped, "doc_id", "left_anti")
    stats = with_text_stats(survivors)
    dig = tdigest_agg(
        stats.select("lang", F.col("n_tokens").cast("double").alias("n_tokens")),
        "n_tokens", by=["lang"], delta=LOSSLESS,
    )
    q = tdigest_stats(dig, {"p50_tokens": ("quantile", 0.5)})
    agg = stats.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("sum_tokens"),
    )
    return agg.join(q, "lang").select(
        "lang", "n_docs", "sum_tokens", F.round("p50_tokens", 4).alias("p50_tokens")
    )


QUERIES = {
    "pl_curation_stats": pl_curation_stats,
    "pl_neardup_curation": pl_neardup_curation,
}

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
    "pl_neardup_curation": f"""
        WITH RECURSIVE
        corpus AS ({_AUG_SQL}),
        sh AS (
          SELECT DISTINCT doc_id,
                 unnest([array_to_string(toks[i:i+2], ' ')
                         FOR i IN range(1, greatest(len(toks)-2,1)+1)]) AS s
          FROM (SELECT doc_id, string_split(text,' ') AS toks FROM corpus)
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes na ON na.doc_id = id_a
          JOIN sizes nb ON nb.doc_id = id_b
          WHERE c / (na.n + nb.n - c) >= 0.5
        ),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION SELECT id_b, id_a FROM pairs
        ),
        reach(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v
        ),
        comp AS (
          SELECT u AS doc_id, least(u, min(v)) AS component
          FROM reach GROUP BY u
        ),
        survivors AS (
          SELECT c.lang, {_NTOK} AS n_tokens FROM corpus c
          WHERE c.doc_id NOT IN
            (SELECT doc_id FROM comp WHERE doc_id != component)
        )
        SELECT lang, count(*) AS n_docs,
               sum(n_tokens)::BIGINT AS sum_tokens,
               round(quantile_cont(n_tokens::DOUBLE, 0.5), 4) AS p50_tokens
        FROM survivors GROUP BY lang
    """,
}
