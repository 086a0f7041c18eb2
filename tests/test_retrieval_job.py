"""Hybrid-retrieval job (jobs/retrieval_job.py): section contract,
fusion provenance, IVF-PQ index path, CLI smoke."""

import subprocess
import sys

import numpy as np
import pytest

from tdigest_spark.jobs.retrieval_job import hybrid_search

SF_DIR = "/root/testdata/sf0.001"


def test_hybrid_search_sections_and_provenance(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = hybrid_search(docs, emb, "data quality", query_vec_id=0, k=8)
    lex = out["lexical"].toPandas()
    sem = out["semantic"].toPandas()
    fused = out["fused"].toPandas()
    assert list(lex["rank"]) == list(range(1, 9))
    assert list(sem["rank"]) == list(range(1, 9))
    assert list(fused["rank"]) == list(range(1, 9))
    assert (np.diff(fused["rrf_score"]) <= 1e-15).all()
    assert set(fused["doc_id"]) <= set(lex["doc_id"]) | set(sem["doc_id"])


def test_hybrid_search_with_ivfpq_index(spark, tmp_path):
    from tdigest_spark.operators.pq import build_ivfpq_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    d = str(tmp_path / "idx")
    build_ivfpq_index(emb, "vec_id", "embedding", d, nlist=4, m=8, ksub=32, seed=5)
    out = hybrid_search(
        docs, emb, "data quality", query_vec_id=0, k=6,
        spark=spark, index_dir=d, nprobe=4,
    )
    fused = out["fused"].toPandas()
    assert list(fused["rank"]) == list(range(1, 7))


def test_cli_smoke(tmp_path):
    r = subprocess.run(
        [
            sys.executable, "-m", "tdigest_spark.jobs.retrieval_job",
            "--docs", f"{SF_DIR}/documents.parquet",
            "--embeddings", f"{SF_DIR}/embeddings.parquet",
            "--query", "data quality",
            "--query-vec-id", "0",
            "--k", "5",
        ],
        capture_output=True, text=True, timeout=300,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    sections = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    names = {s["section"] for s in sections}
    assert names == {"lexical", "semantic", "fused"}
    for s in sections:
        assert len(s["rows"]) == 5


def test_hybrid_search_missing_query_vec_id_raises_both_paths(spark, tmp_path):
    """ADVICE r4: a nonexistent query_vec_id must raise the SAME clear
    error on the brute-force path (which previously returned a silent
    BM25-only fusion) and the indexed path."""
    from tdigest_spark.operators.pq import build_ivfpq_index

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError, match="query_vec_id"):
        hybrid_search(docs, emb, "data quality", query_vec_id=-12345, k=5)
    d = str(tmp_path / "idx")
    build_ivfpq_index(emb, "vec_id", "embedding", d, nlist=4, m=8, ksub=32, seed=5)
    with pytest.raises(ValueError, match="query_vec_id"):
        hybrid_search(
            docs, emb, "data quality", query_vec_id=-12345, k=5,
            spark=spark, index_dir=d,
        )
