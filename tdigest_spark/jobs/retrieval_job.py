"""End-to-end hybrid-retrieval job: lexical BM25 + embedding ANN +
reciprocal-rank fusion, built entirely from this engine's operators —
runnable via ``spark-submit``.

Stages:
 1. lexical   ``bm25_topk`` over the documents table (one
               query-vocabulary-filtered shuffle — PLANS-shaped)
 2. semantic  ``cosine_topk`` against the embeddings table, or, when
               ``--index-dir`` points at a persisted IVF-PQ index
               (``build_ivfpq_index``), ``ivfpq_topk_indexed`` —
               probe-cell partition pruning + m-byte ADC scan
 3. fusion    ``rrf_fuse`` — rank-based, no score calibration
 4. report    one JSON line per section + optional parquet dump

The doc/embedding tables join on id (the testdata contract:
``doc_id``/``vec_id`` share the id space); at 100 TB each stage's
scale shape is its operator's — the fusion itself only ever sees two
top-k tables.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F

from tdigest_spark.operators.bm25 import bm25_topk
from tdigest_spark.operators.retrieval import rrf_fuse
from tdigest_spark.operators.similarity import cosine_topk

__all__ = ["hybrid_search", "main"]


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_text: str,
    query_vec_id,
    k: int = 10,
    rrf_k: int = 60,
    doc_id: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    spark=None,
    index_dir: str | None = None,
    nprobe: int = 4,
) -> dict[str, DataFrame]:
    """Run both retrievers for ONE query (text + an exemplar vector id
    drawn from the embeddings table) and fuse. Returns
    ``{"lexical", "semantic", "fused"}`` DataFrames, each
    (rank, doc_id, ...)."""
    lex = bm25_topk(docs, doc_id, text_col, query_text, k=k)
    qvec = embeddings.where(F.col(vec_id) == F.lit(query_vec_id))
    # fail the same way on both paths: without this the indexed path
    # raises from ivfpq_topk_indexed while brute-force cosine_topk
    # silently returns an empty semantic list (a BM25-only fusion
    # masquerading as hybrid). One cheap probe — qvec is a single-id
    # equality filter, broadcast-small by contract.
    if qvec.limit(1).count() == 0:
        raise ValueError(
            f"hybrid_search: query_vec_id {query_vec_id!r} not found in "
            f"embeddings.{vec_id} — empty query set"
        )
    if index_dir is not None:
        from tdigest_spark.operators.pq import ivfpq_topk_indexed

        sem = ivfpq_topk_indexed(
            spark or docs.sparkSession,
            index_dir,
            qvec,
            vec_id,
            vec_col,
            k=k,
            nprobe=nprobe,
        )
    else:
        sem = cosine_topk(embeddings, qvec, vec_id, vec_col, k=k)
    sem = sem.select("rank", F.col(vec_id).alias(doc_id))
    fused = rrf_fuse(
        [lex.select("rank", doc_id), sem], doc_id, k=k, rrf_k=rrf_k
    )
    return {"lexical": lex, "semantic": sem, "fused": fused}


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--embeddings", required=True, help="embeddings parquet path")
    p.add_argument("--query", required=True, help="free-text query")
    p.add_argument(
        "--query-vec-id", type=int, required=True,
        help="embeddings row to use as the semantic query vector",
    )
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--index-dir", default=None, help="persisted IVF-PQ index dir")
    p.add_argument("--nprobe", type=int, default=4)
    p.add_argument("--out", default=None, help="dir for section parquet dumps")
    args = p.parse_args()
    from tdigest_spark.session import get_spark

    spark = get_spark("retrieval_job")
    docs = spark.read.parquet(args.docs)
    emb = spark.read.parquet(args.embeddings)
    sections = hybrid_search(
        docs, emb, args.query, args.query_vec_id,
        k=args.k, spark=spark, index_dir=args.index_dir, nprobe=args.nprobe,
    )
    for name, df in sections.items():
        if args.out:
            df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        rows = df.limit(args.k).collect()
        print(
            json.dumps(
                {"section": name, "rows": [r.asDict(recursive=True) for r in rows]},
                default=str,
            )
        )


if __name__ == "__main__":
    main()
