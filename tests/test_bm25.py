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


def test_bm25_topk_multi_matches_single_query_form(spark, docs):
    """The batch form == per-query bm25_topk for every query (same
    formula, one corpus pass)."""
    import pandas as pd

    from tdigest_spark.operators.bm25 import bm25_topk_multi

    qs = ["data quality", "the pipeline", "model training data"]
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": range(len(qs)), "qtext": qs})
    )
    multi = bm25_topk_multi(
        docs, "doc_id", "text", qdf, "qid", "qtext", k=8
    ).toPandas()
    assert (multi.groupby("qid").size() == 8).all()
    for qid, q in enumerate(qs):
        single = bm25_topk(docs, "doc_id", "text", q, k=8).toPandas()
        m = multi[multi.qid == qid].sort_values("rank")
        assert list(m["doc_id"]) == list(single["doc_id"]), q
        assert np.allclose(m["score"].to_numpy(), single["score"].to_numpy(), atol=1e-9)


def test_bm25_topk_multi_single_corpus_shuffle_of_tokens(spark, docs):
    """One (doc, term) aggregate for ALL queries: the corpus token
    fan-out feeds exactly one hashpartitioning Exchange keyed on the
    doc id (tf); everything query-side is broadcast."""
    import pandas as pd

    from tdigest_spark.operators.bm25 import bm25_topk_multi

    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": [0, 1], "qtext": ["data quality", "the pipeline"]})
    )
    plan = (
        bm25_topk_multi(docs, "doc_id", "text", qdf, "qid", "qtext", k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BatchEvalPython" not in plan
    doc_shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line
        and "Reused" not in line
        and "doc_id" in line
        and "qid" not in line
    ]
    # tf aggregate (+ AQE may keep the df/term agg separate): the corpus
    # token stream crosses at most these; never one per query
    assert 1 <= len(doc_shuffles) <= 2, plan


def test_bm25_b_zero_disables_length_normalization(spark, docs):
    """With b=0 the per-term score is the closed form
    idf * tf*(k1+1)/(tf+k1) — independent of document length; verify
    directly from token counts (no oracle SQL needed)."""
    import math

    got = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(docs, "doc_id", "text", ["data"], b=0.0).collect()
    }
    pdf = docs.toPandas()
    toks = pdf["text"].str.lower().str.split(" ").apply(
        lambda ts: [t for t in ts if t]
    )
    tf = toks.apply(lambda ts: sum(1 for t in ts if t == "data"))
    n = len(pdf)
    df = int((tf > 0).sum())
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    k1 = 1.2
    for doc_id, t in zip(pdf["doc_id"], tf):
        if t > 0:
            want = idf * t * (k1 + 1.0) / (t + k1)
            assert got[doc_id] == pytest.approx(want, abs=1e-9)
        else:
            assert doc_id not in got


def test_bm25_require_all_and_semantics(spark, docs):
    """AND mode: exactly the docs matching EVERY term survive, with
    UNCHANGED scores (same formula, same corpus stats) — verified
    against a DuckDB twin with a HAVING matched-term-count bar."""
    terms = ["the", "data"]
    any_scores = _oracle_scores(terms)
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores(
            docs, "doc_id", "text", terms, require_all=True
        ).collect()
    }
    tl = ", ".join(f"'{t}'" for t in terms)
    con = duckdb.connect()
    want_ids = {
        r[0]
        for r in con.execute(f"""
            SELECT doc_id FROM (
              SELECT b.doc_id, count(DISTINCT t.term) AS m
              FROM (SELECT doc_id,
                           list_filter(string_split(lower(text), ' '),
                                       x -> x <> '') AS toks
                    FROM '{SF_DIR}/documents.parquet') b,
                   unnest(b.toks) AS t(term)
              WHERE t.term IN ({tl})
              GROUP BY b.doc_id
            ) WHERE m = {len(terms)}
        """).fetchall()
    }
    assert set(got) == want_ids
    assert 0 < len(got) < len(any_scores)  # a strict, non-empty subset
    for d, s in got.items():
        assert s == pytest.approx(any_scores[d], abs=1e-6)


def test_bm25_phrase_filter_contiguous_and_corpuswide_stats(spark, docs):
    """The phrase filter keeps exactly the docs whose normalized token
    stream contains the phrase contiguously, and their scores equal
    the UNFILTERED run's (df/N/avgdl stay corpus-wide: a phrase
    restricts candidates, never the collection model)."""
    terms = ["the", "data"]
    base = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores(docs, "doc_id", "text", terms).collect()
    }
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in bm25_scores(
            docs, "doc_id", "text", terms, phrase="the data"
        ).collect()
    }
    con = duckdb.connect()
    want_ids = {
        r[0]
        for r in con.execute(f"""
            SELECT doc_id
            FROM (SELECT doc_id,
                         ' ' || array_to_string(
                           list_filter(string_split(lower(text), ' '),
                                       x -> x <> ''), ' ') || ' ' AS nt
                  FROM '{SF_DIR}/documents.parquet')
            WHERE contains(nt, ' the data ')
        """).fetchall()
    }
    # phrase-matching docs necessarily match both terms -> all score
    assert set(got) == want_ids
    assert 0 < len(got) < len(base)
    for d, s in got.items():
        assert s == base[d], d  # identical score incl. corpus-wide df
    # token-boundary safety: a phrase that only occurs inside longer
    # tokens must not match
    none = bm25_scores(
        docs, "doc_id", "text", ["data"], phrase="he dat"
    ).collect()
    assert none == []
    with pytest.raises(ValueError, match="phrase is empty"):
        bm25_scores(docs, "doc_id", "text", ["data"], phrase="  ")


def test_bm25_topk_multi_require_all_matches_single(spark, docs):
    import pandas as pd

    from tdigest_spark.operators.bm25 import bm25_topk_multi

    qs = ["data quality pipeline", "the model"]
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": range(len(qs)), "qtext": qs})
    )
    multi = bm25_topk_multi(
        docs, "doc_id", "text", qdf, "qid", "qtext", k=8, require_all=True
    ).toPandas()
    for qid, q in enumerate(qs):
        single = bm25_topk(
            docs, "doc_id", "text", q, k=8, require_all=True
        ).toPandas()
        m = multi[multi.qid == qid].sort_values("rank")
        assert list(m["doc_id"]) == list(single["doc_id"]), q
        assert np.allclose(
            m["score"].to_numpy(), single["score"].to_numpy(), atol=1e-9
        )
