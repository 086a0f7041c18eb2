"""RRF fusion (operators/retrieval.py): exact-formula oracle, hybrid
end-to-end over the real documents+embeddings tables, multi-query
partitioned fusion, validation."""

import numpy as np
import pandas as pd
import pytest

from tdigest_spark.operators.retrieval import rrf_fuse

SF_DIR = "/root/testdata/sf0.001"


def _ranked(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["rank", "doc_id"])
    )


def test_rrf_exact_formula_single_query(spark):
    a = _ranked(spark, [(1, "x"), (2, "y"), (3, "z")])
    b = _ranked(spark, [(1, "y"), (2, "x"), (3, "w")])
    got = {
        r["doc_id"]: (r["rank"], r["rrf_score"])
        for r in rrf_fuse([a, b], "doc_id", k=4, rrf_k=60).collect()
    }
    want = {
        "x": 1 / 61 + 1 / 62,
        "y": 1 / 62 + 1 / 61,
        "z": 1 / 63,
        "w": 1 / 63,
    }
    for d, s in want.items():
        assert got[d][1] == pytest.approx(s, abs=1e-12)
    # x and y tie exactly -> id-ascending tie-break
    assert got["x"][0] == 1 and got["y"][0] == 2
    # z and w tie -> w before z
    assert got["w"][0] == 3 and got["z"][0] == 4


def test_rrf_multi_query_partitioned(spark):
    a = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [1, 1, 2, 2], "rank": [1, 2, 1, 2],
             "doc_id": ["a", "b", "c", "a"]}
        )
    )
    b = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": [1, 1, 2, 2], "rank": [1, 2, 1, 2],
             "doc_id": ["b", "a", "a", "d"]}
        )
    )
    out = rrf_fuse([a, b], "doc_id", k=2, query_col="query_id").toPandas()
    assert (out.groupby("query_id").size() == 2).all()
    q1 = out[out.query_id == 1].sort_values("rank")
    # both a and b have 1/61 + 1/62 in q1 -> tie, id-ascending
    assert list(q1["doc_id"]) == ["a", "b"]
    q2 = out[out.query_id == 2].sort_values("rank")
    # q2: a = 1/61 + 1/62 beats c = 1/61 alone
    assert list(q2["doc_id"]) == ["a", "c"]


def test_hybrid_bm25_plus_ann_on_real_tables(spark):
    """End-to-end hybrid: BM25 over documents + cosine ANN over the
    joined embeddings, fused — the retrieval composition this module
    exists for."""
    from tdigest_spark.operators.bm25 import bm25_topk
    from tdigest_spark.operators.similarity import cosine_topk

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lex = bm25_topk(docs, "doc_id", "text", "data quality", k=10).select(
        "rank", "doc_id"
    )
    qvec = emb.limit(1)
    ann = (
        cosine_topk(emb, qvec, "vec_id", "embedding", k=10)
        .select("rank", "vec_id")
        .withColumnRenamed("vec_id", "doc_id")
    )
    fused = rrf_fuse([lex, ann], "doc_id", k=10).toPandas()
    assert len(fused) == 10
    assert list(fused["rank"]) == list(range(1, 11))
    assert (np.diff(fused["rrf_score"]) <= 1e-15).all()
    # every fused doc came from one of the input lists
    src = set(lex.toPandas()["doc_id"]) | set(ann.toPandas()["doc_id"])
    assert set(fused["doc_id"]) <= src


def test_rrf_validation(spark):
    with pytest.raises(ValueError, match="no ranked"):
        rrf_fuse([], "doc_id")
    a = _ranked(spark, [(1, "x")])
    with pytest.raises(ValueError, match=">= 1"):
        rrf_fuse([a], "doc_id", k=0)


def test_rrf_input_order_invariance(spark):
    """Fusion is a sum over lists — permuting the input list order
    changes nothing (rank provenance is per-list, not positional)."""
    a = _ranked(spark, [(1, "x"), (2, "y")])
    b = _ranked(spark, [(1, "y"), (2, "z")])
    c = _ranked(spark, [(1, "z"), (2, "x")])
    base = rrf_fuse([a, b, c], "doc_id", k=3).toPandas()
    perm = rrf_fuse([c, a, b], "doc_id", k=3).toPandas()
    assert list(base["doc_id"]) == list(perm["doc_id"])
    assert np.allclose(base["rrf_score"], perm["rrf_score"], atol=1e-15)
