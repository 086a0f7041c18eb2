"""Repetition + pattern curation signals: goldens, DuckDB oracle
parity on documents, codegen-purity plan."""

import duckdb
from pyspark.sql import functions as F

from tdigest_spark.functions.textstats import with_curation_signals
from tdigest_spark.sources.tables import load


def test_goldens(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam ham"),
            (2, "all tokens unique here"),
            (3, ""),
            (4, "mail me at bob@x.com or visit https://x.com/page now 42 7"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in with_curation_signals(df).collect()}
    assert out[1].dup_token_frac == 0.5 and out[1].top_token_frac == 0.75
    assert out[2].dup_token_frac == 0.0 and out[2].top_token_frac == 0.25
    assert out[3].dup_token_frac == 0.0 and out[3].top_token_frac == 0.0
    assert out[4].n_emails == 1 and out[4].n_urls == 1 and out[4].n_numbers == 2


def test_duckdb_oracle_parity(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    got = {
        r.doc_id: (
            round(r.dup_token_frac, 9),
            round(r.top_token_frac, 9),
            r.n_emails,
            r.n_urls,
            r.n_numbers,
        )
        for r in with_curation_signals(docs).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        WITH d AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), t -> t <> '') AS toks,
                 text
          FROM '{sf_dir}/documents.parquet'
        )
        SELECT doc_id,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE round(1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 9)
               END AS dup_frac,
               CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE round(list_max(list_transform(list_distinct(toks),
                         u -> len(list_filter(toks, t -> t = u))))::DOUBLE
                         / len(toks), 9)
               END AS top_frac,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]+')) AS n_emails,
               len(regexp_extract_all(text, 'https?://[^ ]+')) AS n_urls,
               len(regexp_extract_all(text, '[0-9]+')) AS n_numbers
        FROM d
        """
    ).fetchall()
    exp = {r[0]: (r[1], r[2], r[3], r[4], r[5]) for r in rows}
    assert got == exp and len(got) == 500


def test_codegen_pure_plan(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        with_curation_signals(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan  # narrow: one scan, no shuffle
