"""Product quantization (PQ) for embedding columns — the vector
compression layer of the similarity stack (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Why this exists at 100 TB: a ``float32[768]`` embedding is 3 KB/row;
PQ at m=16 subspaces stores 16 BYTES/row (192× smaller), and queries
score those codes with asymmetric distance computation (ADC): one
(m × ksub) lookup table per query, then a table-gather + sum per
corpus code — no float vector is ever read on the scan side. The
companion-sketch pattern of this repo applied to vectors: train small
(bounded driver-side sample, O(1) in table size), encode distributed
(one Arrow pass), score distributed (codes + broadcast LUTs).

Scale shape:
* codebooks are (m, ksub, dim/m) — a few hundred KB; they ride the
  task closure like the IVF centroids (``similarity.py``);
* encoding is ``mapInPandas`` (vectorized argmin per subspace), the
  corpus never shuffles;
* ADC search broadcasts the query LUTs, scans ONLY the m-byte code
  column (column pruning keeps the full vector out of the scan), and
  keeps per-batch partial top-R so the post-scan shuffle carries
  O(batches × queries × R) candidate rows, never the corpus;
* optional exact re-rank touches full vectors for candidate ids only
  (broadcast semi-join — at scale a point-lookup against the
  persisted index).

No reference counterpart (the reference is a numeric-sketch library,
``tdigest/src/Data/TDigest/Internal.hs:4-7``); this extends the
repo's training-data-pipeline surface (SURVEY.md §2 "similarity
search") with the standard billion-scale ANN compression layer.

Determinism: seeded k-means, lowest-index argmin ties, sample-order
independence is NOT claimed (same (data, seed, sample) → same
codebooks, matching ``train_ivf_centroids``'s contract).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tdigest_spark.operators.similarity import cosine_expr, with_norm

__all__ = [
    "train_pq_codebooks",
    "with_pq_code",
    "pq_encode",
    "pq_reconstruct",
    "pq_topk",
    "ivfpq_topk",
    "build_ivfpq_index",
    "ivfpq_topk_indexed",
    "append_ivfpq_index",
    "refresh_ivfpq_index",
]


def _unit_rows(X: np.ndarray) -> np.ndarray:
    return X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    m: int = 8,
    ksub: int = 256,
    sample: int = 8192,
    seed: int = 7,
    iters: int = 12,
) -> np.ndarray:
    """Train per-subspace codebooks on a bounded driver-side sample
    (same O(1)-in-table-size rationale as ``train_ivf_centroids``).
    Vectors are L2-normalized first (this stack's cosine regime: for
    unit vectors cosine == dot, and dot decomposes exactly over
    subspaces, which is what makes ADC a sum of table lookups).
    Returns ``(m, ksub, dim // m)`` float64 codebooks.
    """
    if ksub < 1 or ksub > 256:
        raise ValueError("train_pq_codebooks: ksub must be in [1, 256] (uint8 codes)")
    pdf = corpus.select(vec_col).limit(sample).toPandas()
    if len(pdf) == 0:
        raise ValueError("train_pq_codebooks: corpus is empty")
    X = _unit_rows(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
    if X.shape[1] % m != 0:
        raise ValueError(
            f"train_pq_codebooks: dim {X.shape[1]} not divisible by m={m}"
        )
    return _kmeans_books(X, m, ksub, seed, iters)


def _kmeans_books(
    X: np.ndarray, m: int, ksub: int, seed: int, iters: int
) -> np.ndarray:
    """Seeded per-subspace Lloyd iterations over an in-memory sample —
    the training core shared by the plain (unit-vector) and residual
    paths."""
    dsub = X.shape[1] // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        Xs = X[:, j * dsub : (j + 1) * dsub]
        k = min(ksub, len(Xs))
        C = Xs[rng.choice(len(Xs), size=k, replace=False)]
        if k < ksub:  # degenerate tiny corpus: pad by repetition
            C = np.vstack([C] * (ksub // k + 1))[:ksub]
        C = C.copy()
        for _ in range(iters):
            # squared distance argmin == argmax(2 x·c - |c|²); Lloyd step
            d2 = -2.0 * (Xs @ C.T) + (C * C).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                pts = Xs[assign == c]
                if len(pts):
                    C[c] = pts.mean(axis=0)
                else:
                    C[c] = Xs[rng.integers(0, len(Xs))]
        books[j] = C
    return books


def pq_encode(
    X: np.ndarray, codebooks: np.ndarray, normalize: bool = True
) -> np.ndarray:
    """Encode rows -> (n, m) uint8 codes (numpy core, shared by the
    Spark pass and tests). ``normalize=False`` is the residual-vector
    form (residuals must NOT be re-normalized — their magnitude IS the
    signal the codebook quantizes)."""
    m, ksub, dsub = codebooks.shape
    X = np.asarray(X, dtype=np.float64)
    if normalize:
        X = _unit_rows(X)
    codes = np.empty((len(X), m), dtype=np.uint8)
    for j in range(m):
        Xs = X[:, j * dsub : (j + 1) * dsub]
        C = codebooks[j]
        d2 = -2.0 * (Xs @ C.T) + (C * C).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_reconstruct(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Decode (n, m) codes back to (n, dim) approximate vectors."""
    m, ksub, dsub = codebooks.shape
    codes = np.asarray(codes)
    out = np.empty((len(codes), m * dsub), dtype=np.float64)
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = codebooks[j][codes[:, j]]
    return out


def with_pq_code(
    df: DataFrame,
    vec_col: str,
    codebooks: np.ndarray,
    out_col: str = "pq_code",
) -> DataFrame:
    """Append the m-byte PQ code (``binary``) for each vector — one
    Arrow-batched pass, codebooks ride the closure. This is the
    distributed index build: persist ``(id, pq_code)`` and the scan
    side of every later search reads m bytes per row."""
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.BinaryType())]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = pq_encode(X, B)
            out = pdf.copy()
            out[out_col] = [c.tobytes() for c in codes]
            yield out

    return df.mapInPandas(encode, out_schema)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 256,
    rerank: int = 32,
    codebooks: np.ndarray | None = None,
    seed: int = 7,
    query_id: str = "query_id",
    batch_topr: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via PQ/ADC with optional exact
    re-rank.

    Flow: (1) encode the corpus (one Arrow pass, never shuffled);
    (2) per query build the ADC lookup table LUT[j, c] = q_j · C[j, c]
    (unit-norm q, so Σ_j LUT[j, code_j] ≈ cosine); (3) scan the codes
    with the LUTs in the closure, keeping a per-batch partial top-R
    per query (R = max(k, rerank)) so only candidate rows leave the
    scan; (4) global top-R per query; (5) if ``rerank`` > 0, exact
    cosine on those candidates (broadcast id semi-join back to the
    full vectors) and final top-k — ADC ranks the shortlist, exact
    math ranks the answer.

    Recall < 1 by construction (quantization); property tests pin
    recall on clustered data, and the ADC-exactness invariant (scores
    are EXACT dots against the reconstruction) is tested directly.
    Output: (query_id, rank, id, cosine) — same shape as cosine_topk.
    """
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, vec_col, m=m, ksub=ksub, seed=seed
        )
    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    mm = B.shape[0]
    R = max(k, rerank if rerank > 0 else k)
    topr = batch_topr or R

    qp = queries.select(id_col, vec_col).toPandas()
    if len(qp) == 0:
        raise ValueError("pq_topk: empty query set")
    qids = qp[id_col].to_numpy()
    Q = _unit_rows(np.vstack(qp[vec_col].to_numpy()).astype(np.float64))
    dsub = B.shape[2]
    # LUTs: (nq, m, ksub) — q's j-th block dotted with every codeword
    luts = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ B[j].T for j in range(mm)], axis=1
    )

    enc = with_pq_code(corpus.select(id_col, vec_col), vec_col, B).select(
        id_col, "pq_code"
    )
    id_dtype = corpus.schema[id_col].dataType
    cand_schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[id_col].dataType),
            T.StructField(id_col, id_dtype),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"].to_list()), dtype=np.uint8
            ).reshape(n, mm)
            # scores[q, i] = Σ_j luts[q, j, codes[i, j]]
            scores = np.zeros((len(Q), n), dtype=np.float64)
            for j in range(mm):
                scores += luts[:, j, :][:, codes[:, j]]
            r = min(topr, n)
            top = np.argpartition(-scores, r - 1, axis=1)[:, :r]
            rows = {
                query_id: np.repeat(qids, r),
                id_col: pdf[id_col].to_numpy()[top.ravel()],
                "adc": np.take_along_axis(scores, top, axis=1).ravel(),
            }
            yield pd.DataFrame(rows)

    cands = enc.mapInPandas(scan, cand_schema).where(
        F.col(id_col) != F.col(query_id)
    )
    w_adc = Window.partitionBy(query_id).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    short = (
        cands.withColumn("__r", F.row_number().over(w_adc))
        .where(F.col("__r") <= R)
        .drop("__r")
    )
    if rerank <= 0:
        return (
            short.withColumn("rank", F.row_number().over(w_adc))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", id_col, F.col("adc").alias("cosine"))
        )
    # exact re-rank: candidate ids are tiny — broadcast them onto the
    # full-vector table, then exact cosine vs each query vector
    qv = corpus.sparkSession.createDataFrame(
        pd.DataFrame(
            {
                query_id: qids,
                "__qv": [[float(x) for x in row] for row in Q],
            }
        ),
        schema=T.StructType(
            [
                T.StructField(query_id, queries.schema[id_col].dataType),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    vecs = with_norm(corpus.select(id_col, vec_col), vec_col)
    scored = (
        vecs.join(F.broadcast(short.select(query_id, id_col)), id_col)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id,
            id_col,
            cosine_expr(
                F.col(vec_col), F.col("__qv"), F.col("__norm"), F.lit(1.0)
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "cosine")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 256,
    rerank: int = 32,
    seed: int = 7,
    query_id: str = "query_id",
) -> DataFrame:
    """IVF + PQ composed (the FAISS-style billion-scale shape): the
    coarse quantizer prunes to ``nprobe`` of ``nlist`` cells, then ADC
    scores only the m-byte codes inside probed cells, then the exact
    re-rank touches full vectors for the shortlist only. At scale the
    (cell, pq_code) table is the persisted index: cell is the
    partition column (scan pruning, as in ``ivf_topk_indexed``) and
    the code column is 8-16 bytes/row, so probing 4/64 cells of a
    100 TB corpus reads ~0.03% of the raw bytes.

    ``nprobe >= nlist`` with generous ``rerank`` approaches the exact
    result; recall properties are pinned in ``tests/test_pq.py``.
    Output: (query_id, rank, id, cosine).
    """
    from tdigest_spark.operators.similarity import (
        train_ivf_centroids,
        with_ivf_cell,
    )

    C = train_ivf_centroids(corpus, vec_col, nlist=nlist, seed=seed)
    nprobe = min(nprobe, C.shape[0])
    books = train_pq_codebooks(corpus, vec_col, m=m, ksub=ksub, seed=seed)

    # index side: (id, cell, pq_code [, vec for the re-rank])
    cells = with_ivf_cell(corpus.select(id_col, vec_col), vec_col, C, nprobe=1)
    enc = with_pq_code(cells, vec_col, books).select(
        id_col, F.col("cell")[0].alias("cell"), "pq_code"
    )

    qp = queries.select(id_col, vec_col).toPandas()
    if len(qp) == 0:
        raise ValueError("ivfpq_topk: empty query set")
    qids = qp[id_col].to_numpy()
    Q = _unit_rows(np.vstack(qp[vec_col].to_numpy()).astype(np.float64))
    sims = Q @ C.T
    top = np.argsort(-sims, axis=1)[:, :nprobe]
    dsub = books.shape[2]
    luts = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(m)], axis=1
    )
    # query -> probed cells (broadcast-small); per-query LUTs ride the closure
    probe_cells = sorted({int(c) for r in top for c in r})
    q_cells = {i: {int(c) for c in top[i]} for i in range(len(qids))}

    R = max(k, rerank if rerank > 0 else k)
    cand_schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[id_col].dataType),
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"].to_list()), dtype=np.uint8
            ).reshape(n, m)
            batch_cells = pdf["cell"].to_numpy()
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                mask = np.isin(batch_cells, list(q_cells[qi]))
                if not mask.any():
                    continue
                sub = codes[mask]
                scores = np.zeros(len(sub), dtype=np.float64)
                for j in range(m):
                    scores += luts[qi, j, :][sub[:, j]]
                r = min(R, len(sub))
                sel = np.argpartition(-scores, r - 1)[:r] if len(sub) > r else np.arange(len(sub))
                ids_m = pdf[id_col].to_numpy()[mask]
                out_q.append(np.repeat(qids[qi], len(sel)))
                out_i.append(ids_m[sel])
                out_s.append(scores[sel])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    query_id: np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "adc": np.concatenate(out_s),
                }
            )

    cands = (
        enc.where(F.col("cell").isin(probe_cells))  # cell pruning (at scale: partition filter)
        .mapInPandas(scan, cand_schema)
        .where(F.col(id_col) != F.col(query_id))
    )
    w_adc = Window.partitionBy(query_id).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    short = (
        cands.withColumn("__r", F.row_number().over(w_adc))
        .where(F.col("__r") <= R)
        .drop("__r")
    )
    if rerank <= 0:
        return (
            short.withColumn("rank", F.row_number().over(w_adc))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", id_col, F.col("adc").alias("cosine"))
        )
    qv = corpus.sparkSession.createDataFrame(
        pd.DataFrame(
            {query_id: qids, "__qv": [[float(x) for x in row] for row in Q]}
        ),
        schema=T.StructType(
            [
                T.StructField(query_id, queries.schema[id_col].dataType),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    vecs = with_norm(corpus.select(id_col, vec_col), vec_col)
    scored = (
        vecs.join(F.broadcast(short.select(query_id, id_col)), id_col)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id,
            id_col,
            cosine_expr(
                F.col(vec_col), F.col("__qv"), F.col("__norm"), F.lit(1.0)
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "cosine")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    index_dir: str,
    nlist: int = 16,
    m: int = 8,
    ksub: int = 256,
    seed: int = 7,
    residual: bool = False,
) -> str:
    """Build-once persisted IVF-PQ index: ``(id, pq_code, vec, norm)``
    written as a ``cell``-PARTITIONED table with the coarse centroids
    and PQ codebooks in underscore sidecars (skipped by table
    readers). Searches prune to probe cells AT SCAN TIME (partition
    pruning) and ADC-score the m-byte codes; the full vectors live in
    the SAME partitioned table so the exact re-rank's candidate
    lookups stay inside the probed shards. Train is driver-side
    bounded-sample (O(1) in table size); assignment + encoding are one
    distributed Arrow pass. Returns the format written
    (``sources.catalog``).

    ``residual=True`` encodes ``x − centroid[cell]`` instead of ``x``
    (FAISS-style IVFPQ, Jégou et al. 2011 §IV): residuals have far
    less variance than the vectors themselves, so the same m bytes
    quantize finer — the search adds ``q·centroid[cell]`` back as a
    per-cell constant in ADC. The flag is recorded in a
    ``_pq_meta.json`` sidecar and honored by search/append/refresh."""
    import json
    import os

    from tdigest_spark.operators.similarity import train_ivf_centroids
    from tdigest_spark.sources.catalog import write_table

    # validate BEFORE the (driver-side but non-trivial) centroid
    # training; the residual branch previously bypassed the plain
    # branch's guards — ksub > 256 silently wrapped uint8 codes and an
    # empty corpus surfaced as a cryptic np.vstack error (ADVICE r4)
    if ksub < 1 or ksub > 256:
        raise ValueError(
            "build_ivfpq_index: ksub must be in [1, 256] (uint8 codes)"
        )
    C = train_ivf_centroids(corpus, vec_col, nlist=nlist, seed=seed)
    if residual:
        pdf = corpus.select(vec_col).limit(8192).toPandas()
        if len(pdf) == 0:  # unreachable after centroid training; kept as a guard
            raise ValueError("build_ivfpq_index: corpus is empty")
        X = _unit_rows(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
        if X.shape[1] % m != 0:
            raise ValueError(
                f"build_ivfpq_index: dim {X.shape[1]} not divisible by m={m}"
            )
        res = X - C[np.argmax(X @ C.T, axis=1)]
        books = _kmeans_books(res, m, ksub, seed, 12)
    else:
        books = train_pq_codebooks(corpus, vec_col, m=m, ksub=ksub, seed=seed)
    enc = _encode_index_rows(corpus, id_col, vec_col, C, books, residual)
    fmt = write_table(enc, index_dir, partition_by=("cell",))
    with open(os.path.join(index_dir, "_centroids.json"), "w") as f:
        json.dump(C.tolist(), f)
    with open(os.path.join(index_dir, "_pq_codebooks.json"), "w") as f:
        json.dump(books.tolist(), f)
    with open(os.path.join(index_dir, "_pq_meta.json"), "w") as f:
        json.dump({"residual": residual}, f)
    return fmt


def _encode_index_rows(
    rows: DataFrame,
    id_col: str,
    vec_col: str,
    C: np.ndarray,
    books: np.ndarray,
    residual: bool,
) -> DataFrame:
    """(id, vec, norm, cell, pq_code) index rows — assignment and
    encoding in ONE Arrow pass (plain: codes of the unit vector;
    residual: codes of unit vector − its cell centroid)."""
    from tdigest_spark.operators.similarity import with_ivf_cell, with_norm

    cells = with_ivf_cell(
        with_norm(rows.select(id_col, vec_col), vec_col), vec_col, C, nprobe=1
    ).select(
        F.col(id_col),
        F.col(vec_col).alias("vec"),
        F.col("__norm").alias("norm"),
        F.col("cell")[0].alias("cell"),
    )
    Cc = np.ascontiguousarray(C, dtype=np.float64)
    B = np.ascontiguousarray(books, dtype=np.float64)
    out_schema = T.StructType(
        list(cells.schema.fields) + [T.StructField("pq_code", T.BinaryType())]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _unit_rows(np.vstack(pdf["vec"].to_numpy()).astype(np.float64))
            if residual:
                X = X - Cc[pdf["cell"].to_numpy()]
            codes = pq_encode(X, B, normalize=False)
            out = pdf.copy()
            out["pq_code"] = [c.tobytes() for c in codes]
            yield out

    return cells.mapInPandas(encode, out_schema)


def _load_pq_codebooks(index_dir: str) -> np.ndarray:
    import json
    import os

    with open(os.path.join(index_dir, "_pq_codebooks.json")) as f:
        return np.asarray(json.load(f), dtype=np.float64)


def _load_pq_meta(index_dir: str) -> dict:
    import json
    import os

    path = os.path.join(index_dir, "_pq_meta.json")
    if not os.path.exists(path):  # pre-residual indexes: plain encoding
        return {"residual": False}
    with open(path) as f:
        return json.load(f)


def ivfpq_topk_indexed(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    nprobe: int = 4,
    rerank: int = 32,
    query_id: str = "query_id",
    fmt: str | None = None,
) -> DataFrame:
    """Search a persisted IVF-PQ index (:func:`build_ivfpq_index`):
    probe cells become a literal IN partition filter (unprobed shards
    never read), the ADC scan projects only ``(id, cell, pq_code)``
    (column pruning keeps the full vectors out of the hot scan), and
    the exact re-rank re-reads ONLY the probed partitions joined to
    the broadcast candidate ids. Queries are driver-side assigned
    (broadcast-small by the same contract as ``ivf_topk_indexed``).
    Output: (query_id, rank, id, cosine)."""
    from tdigest_spark.operators.similarity import _load_ivf_centroids, cosine_expr
    from tdigest_spark.sources.catalog import read_table

    C = _load_ivf_centroids(index_dir)
    books = _load_pq_codebooks(index_dir)
    residual = bool(_load_pq_meta(index_dir)["residual"])
    mm, _, dsub = books.shape
    nprobe = min(nprobe, C.shape[0])

    qp = queries.select(id_col, vec_col).toPandas()
    if len(qp) == 0:
        raise ValueError("ivfpq_topk_indexed: empty query set")
    qids = qp[id_col].to_numpy()
    Q = _unit_rows(np.vstack(qp[vec_col].to_numpy()).astype(np.float64))
    sims = Q @ C.T
    top = np.argsort(-sims, axis=1)[:, :nprobe]
    luts = np.stack(
        [Q[:, j * dsub : (j + 1) * dsub] @ books[j].T for j in range(mm)], axis=1
    )
    probe_cells = sorted({int(c) for r in top for c in r})
    q_cells = {i: {int(c) for c in top[i]} for i in range(len(qids))}
    R = max(k, rerank if rerank > 0 else k)

    idx = read_table(spark, index_dir, fmt=fmt).where(
        F.col("cell").isin(probe_cells)  # literal IN -> partition pruning
    )
    qid_dtype = queries.schema[id_col].dataType
    id_dtype = idx.schema[id_col].dataType
    cand_schema = T.StructType(
        [
            T.StructField(query_id, qid_dtype),
            T.StructField(id_col, id_dtype),
            T.StructField("adc", T.DoubleType()),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf["pq_code"].to_list()), dtype=np.uint8
            ).reshape(n, mm)
            batch_cells = pdf["cell"].to_numpy()
            out_q, out_i, out_s = [], [], []
            for qi in range(len(qids)):
                mask = np.isin(batch_cells, list(q_cells[qi]))
                if not mask.any():
                    continue
                sub = codes[mask]
                # residual indexes: cosine ≈ q·centroid[cell] (exact,
                # per-row constant) + q·residual-reconstruction (ADC)
                scores = (
                    sims[qi][batch_cells[mask]].astype(np.float64).copy()
                    if residual
                    else np.zeros(len(sub), dtype=np.float64)
                )
                for j in range(mm):
                    scores += luts[qi, j, :][sub[:, j]]
                r = min(R, len(sub))
                sel = (
                    np.argpartition(-scores, r - 1)[:r]
                    if len(sub) > r
                    else np.arange(len(sub))
                )
                ids_m = pdf[id_col].to_numpy()[mask]
                out_q.append(np.repeat(qids[qi], len(sel)))
                out_i.append(ids_m[sel])
                out_s.append(scores[sel])
            if not out_q:
                continue
            yield pd.DataFrame(
                {
                    query_id: np.concatenate(out_q),
                    id_col: np.concatenate(out_i),
                    "adc": np.concatenate(out_s),
                }
            )

    cands = (
        idx.select(id_col, "cell", "pq_code")  # hot scan: codes only
        .mapInPandas(scan, cand_schema)
        .where(F.col(id_col) != F.col(query_id))
    )
    w_adc = Window.partitionBy(query_id).orderBy(
        F.col("adc").desc(), F.col(id_col).asc()
    )
    short = (
        cands.withColumn("__r", F.row_number().over(w_adc))
        .where(F.col("__r") <= R)
        .drop("__r")
    )
    if rerank <= 0:
        return (
            short.withColumn("rank", F.row_number().over(w_adc))
            .where(F.col("rank") <= k)
            .select(query_id, "rank", id_col, F.col("adc").alias("cosine"))
        )
    qv = spark.createDataFrame(
        pd.DataFrame(
            {query_id: qids, "__qv": [[float(x) for x in row] for row in Q]}
        ),
        schema=T.StructType(
            [
                T.StructField(query_id, qid_dtype),
                T.StructField("__qv", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    scored = (
        idx.select(id_col, "vec", "norm")  # probed partitions only
        .join(F.broadcast(short.select(query_id, id_col)), id_col)
        .join(F.broadcast(qv), query_id)
        .select(
            query_id,
            id_col,
            cosine_expr(
                F.col("vec"), F.col("__qv"), F.col("norm"), F.lit(1.0)
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id, "rank", id_col, "cosine")
    )


def append_ivfpq_index(
    new_rows: DataFrame, id_col: str, vec_col: str, index_dir: str
) -> None:
    """Append rows to a persisted IVF-PQ index WITHOUT retraining:
    new vectors are assigned to the EXISTING coarse cells and encoded
    with the EXISTING codebooks (both sidecars read, not refit), then
    appended into the cell-partitioned table — only touched cell
    partitions gain files, and searches see the new rows through the
    same PartitionFilters-pruned scan. Codebook drift as the corpus
    grows is monitored the same way as the coarse quantizer's
    (``ivf_retrain_needed`` over ``ivf_cell_stats`` works unchanged on
    this table); rebuild via :func:`build_ivfpq_index` into a fresh
    directory and pointer-swap, as with ``refresh_ivf_index``."""
    from tdigest_spark.operators.similarity import _load_ivf_centroids
    from tdigest_spark.sources.catalog import write_table

    C = _load_ivf_centroids(index_dir)
    books = _load_pq_codebooks(index_dir)
    residual = bool(_load_pq_meta(index_dir)["residual"])
    enc = _encode_index_rows(new_rows, id_col, vec_col, C, books, residual)
    write_table(enc, index_dir, mode="append", partition_by=("cell",))


def refresh_ivfpq_index(
    spark,
    index_dir: str,
    out_dir: str,
    id_col: str,
    vec_col: str,
    nlist: int | None = None,
    m: int | None = None,
    ksub: int | None = None,
    seed: int = 7,
    fmt: str | None = None,
) -> str:
    """Rebuild (retrain) a drifted IVF-PQ index from its CURRENT
    contents into ``out_dir``: re-trains the coarse quantizer AND the
    PQ codebooks on the live corpus and re-encodes every row. Writes
    to a NEW directory — swap the pointer after the build so
    concurrent readers never see a half-written index (the same
    atomic-snapshot discipline as ``refresh_ivf_index`` and the
    streaming sinks). Geometry AND the residual flag default to the
    existing sidecars'."""
    from tdigest_spark.operators.similarity import _load_ivf_centroids
    from tdigest_spark.sources.catalog import read_table

    if os.path.abspath(out_dir) == os.path.abspath(index_dir):
        raise ValueError(
            "refresh_ivfpq_index: out_dir must be a NEW directory — "
            "overwriting index_dir while lazily reading it would destroy "
            "the index (swap a pointer to out_dir after the build instead)"
        )
    idx = read_table(spark, index_dir, fmt=fmt)
    corpus = idx.select(F.col(id_col), F.col("vec").alias(vec_col))
    if nlist is None:
        nlist = _load_ivf_centroids(index_dir).shape[0]
    books = _load_pq_codebooks(index_dir)
    if m is None:
        m = books.shape[0]
    if ksub is None:
        ksub = books.shape[1]
    return build_ivfpq_index(
        corpus, id_col, vec_col, out_dir, nlist=nlist, m=m, ksub=ksub, seed=seed,
        residual=bool(_load_pq_meta(index_dir)["residual"]),
    )
