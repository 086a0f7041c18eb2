"""TF-IDF: golden scores, exact DuckDB oracle parity on documents,
min_df filtering, deterministic ranking."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.tfidf import tfidf_top_terms
from tdigest_spark.sources.tables import load


def test_golden(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "c c c")],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.score, r.rank)
        for r in tfidf_top_terms(docs, "doc_id", "text", k=2).collect()
    }
    idf = lambda df: math.log((1 + 3) / (1 + df)) + 1.0
    # doc 1: a(tf2) scores 2*idf(2), b(tf1) 1*idf(1) -> b's rarity wins? 2*1.288 vs 1*1.693
    assert out[(1, "a")] == (2, 2, pytest.approx(2 * idf(2)), 1)
    assert out[(1, "b")] == (1, 1, pytest.approx(idf(1)), 2)
    # doc 2: a and c both tf=1, df=2 -> score tie, term asc wins
    assert out[(2, "a")][3] == 1 and out[(2, "c")][3] == 2
    assert out[(3, "c")] == (3, 2, pytest.approx(3 * idf(2)), 1)


def test_duckdb_oracle_parity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        (r.doc_id, r.rank): (r.term, r.tf, r.df, round(r.score, 9))
        for r in tfidf_top_terms(docs, "doc_id", "text", k=3).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH tok AS (
          SELECT doc_id, t AS term
          FROM '{sf_dir}/documents.parquet',
               unnest(string_split(lower(text), ' ')) AS u(t)
          WHERE t <> ''
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT doc_id) AS n FROM '{sf_dir}/documents.parquet'),
        s AS (
          SELECT doc_id, term, tf, df,
                 tf * (ln((1.0 + n) / (1.0 + df)) + 1.0) AS score,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf * (ln((1.0 + n) / (1.0 + df)) + 1.0) DESC,
                                             term ASC) AS rank
          FROM tf JOIN dfq USING (term) CROSS JOIN n
        )
        SELECT doc_id, rank, term, tf, df, round(score, 9)
        FROM s WHERE rank <= 3
        """
    ).fetchall()
    exp = {(r[0], r[1]): (r[2], r[3], r[4], r[5]) for r in rows}
    assert got == exp and len(got) > 1000


def test_min_df_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "rare common"), (2, "common x")], "doc_id long, text string"
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=5, min_df=2)
    assert {r.term for r in out.collect()} == {"common"}
    with pytest.raises(ValueError, match="k must"):
        tfidf_top_terms(docs, "doc_id", "text", k=0)
