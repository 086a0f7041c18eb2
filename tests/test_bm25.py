"""BM25 (operators/bm25.py): exact DuckDB-oracle parity on the real
documents table, plan shape (filter before the shuffle, no Python),
and ranking invariants."""

import duckdb
import numpy as np
import pytest

from tdigest_spark.operators.bm25 import bm25_scores, bm25_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _oracle_scores(terms, k1=1.2, b=0.75):
    """Independent BM25 in SQL over the same parquet (same tokenizer:
    lowercase, split on single space, empties dropped)."""
    tl = ", ".join(f"'{t}'" for t in terms)
    con = duckdb.connect()
    q = f"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM '{SF_DIR}/documents.parquet'
    ), lens AS (
      SELECT doc_id, len(toks) AS dl FROM base
    ), stats AS (
      SELECT count(*) AS n, avg(dl) AS avgdl FROM lens
    ), hits AS (
      SELECT b.doc_id, t.term, count(*) AS tf
      FROM base b, unnest(b.toks) AS t(term)
      WHERE t.term IN ({tl})
      GROUP BY b.doc_id, t.term
    ), dfs AS (
      SELECT term, count(*) AS df FROM hits GROUP BY term
    )
    SELECT h.doc_id,
           round(sum(
             ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
             * (h.tf * ({k1} + 1.0))
             / (h.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl))
           ), 6) AS score
    FROM hits h
    JOIN dfs d USING (term)
    JOIN lens l USING (doc_id)
    CROSS JOIN stats s
    GROUP BY h.doc_id
    """
    return {r[0]: r[1] for r in con.execute(q).fetchall()}


def test_bm25_scores_match_duckdb_exactly(spark, docs):
    terms = ["the", "data", "pipeline"]
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    want = _oracle_scores(terms)
    assert len(got) > 10  # real hits on the real table
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-6), d


def test_bm25_topk_ranking_and_determinism(spark, docs):
    top = bm25_topk(docs, "doc_id", "text", "data quality the", k=10).toPandas()
    assert list(top["rank"]) == list(range(1, 11))
    # descending scores, deterministic tie-break
    assert (np.diff(top["score"]) <= 1e-12).all()
    top2 = bm25_topk(
        docs.repartition(7), "doc_id", "text", "data quality the", k=10
    ).toPandas()
    assert list(top["doc_id"]) == list(top2["doc_id"])
    # agrees with the full scorer's best rows
    full = bm25_scores(docs, "doc_id", "text", ["data", "quality", "the"]).toPandas()
    best = set(
        full.sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10)["doc_id"]
    )
    assert set(top["doc_id"]) == best


def test_bm25_plan_no_python_and_filter_before_shuffle(spark, docs):
    plan = bm25_scores(docs, "doc_id", "text", ["data"])._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # the term filter must sit below the (doc, term) aggregate so the
    # shuffle carries only query-term hits
    assert "Filter" in plan


def test_bm25_validation(spark, docs):
    with pytest.raises(ValueError, match="empty"):
        bm25_scores(docs, "doc_id", "text", [])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, "doc_id", "text", "data", k=0)
