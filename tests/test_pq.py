"""Product quantization (operators/pq.py): codebook training,
encode/reconstruct invariants, ADC exactness, Spark parity, and
recall on clustered data vs the exact brute-force baseline."""

import numpy as np
import pandas as pd
import pytest

from tdigest_spark.operators.pq import (
    pq_encode,
    pq_reconstruct,
    pq_topk,
    train_pq_codebooks,
    with_pq_code,
)
from tdigest_spark.operators.similarity import cosine_topk


def _clustered(n_clusters=20, per=30, dim=32, seed=3):
    """Well-separated unit-norm clusters: true neighbors are in-cluster."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + 0.05 * rng.normal(size=(per, dim))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        for i, p in enumerate(pts):
            rows.append((c * per + i, [float(x) for x in p]))
    return rows


def _corpus_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"id": [r[0] for r in rows], "vec": [r[1] for r in rows]})
    )


def test_codebook_shapes_determinism_validation(spark):
    rows = _clustered()
    df = _corpus_df(spark, rows)
    b1 = train_pq_codebooks(df, "vec", m=4, ksub=16, sample=400, seed=5, iters=4)
    b2 = train_pq_codebooks(df, "vec", m=4, ksub=16, sample=400, seed=5, iters=4)
    assert b1.shape == (4, 16, 8)
    assert np.array_equal(b1, b2)  # same (data, seed, sample) -> same books
    with pytest.raises(ValueError, match="divisible"):
        train_pq_codebooks(df, "vec", m=5)
    with pytest.raises(ValueError, match="ksub"):
        train_pq_codebooks(df, "vec", m=4, ksub=300)
    with pytest.raises(ValueError, match="empty"):
        train_pq_codebooks(df.where("id < 0"), "vec", m=4)


def test_reconstruction_error_shrinks_with_m():
    """More subspaces (same ksub) -> strictly finer quantization on
    the same data (the PQ size/accuracy dial)."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(600, 32))
    X /= np.linalg.norm(X, axis=1, keepdims=True)

    def mse(m):
        # train directly on the numpy sample (mirror of the Spark path)
        import tdigest_spark.operators.pq as pqm

        books = np.empty((m, 16, 32 // m))
        r = np.random.default_rng(7)
        for j in range(m):
            Xs = X[:, j * (32 // m) : (j + 1) * (32 // m)]
            C = Xs[r.choice(len(Xs), 16, replace=False)].copy()
            for _ in range(8):
                d2 = -2 * (Xs @ C.T) + (C * C).sum(1)[None, :]
                a = np.argmin(d2, 1)
                for c in range(16):
                    if (a == c).any():
                        C[c] = Xs[a == c].mean(0)
            books[j] = C
        codes = pqm.pq_encode(X, books)
        return float(((pq_reconstruct(codes, books) - X) ** 2).mean())

    assert mse(16) < mse(4) < mse(2)


def test_adc_scores_are_exact_dots_against_reconstruction(spark):
    """The ADC invariant: Σ_j LUT[j, code_j] == q · reconstruct(code)
    exactly (float assoc aside) — ADC is exact math on the quantized
    corpus, the only approximation is the quantization itself."""
    rows = _clustered(n_clusters=6, per=20, dim=16, seed=9)
    df = _corpus_df(spark, rows)
    books = train_pq_codebooks(df, "vec", m=4, ksub=16, sample=200, seed=5, iters=6)
    X = np.array([r[1] for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    codes = pq_encode(X, books)
    recon = pq_reconstruct(codes, books)
    q = X[0]
    dsub = 4
    lut = np.stack([q[j * dsub : (j + 1) * dsub] @ books[j].T for j in range(4)])
    adc = np.array([lut[np.arange(4), codes[i]].sum() for i in range(len(X))])
    assert np.allclose(adc, recon @ q, atol=1e-9)


def test_with_pq_code_matches_numpy_and_is_partition_invariant(spark):
    rows = _clustered(n_clusters=5, per=20, dim=16, seed=2)
    df = _corpus_df(spark, rows)
    books = train_pq_codebooks(df, "vec", m=4, ksub=16, sample=200, seed=5, iters=6)
    got = {
        r["id"]: bytes(r["pq_code"])
        for r in with_pq_code(df, "vec", books).collect()
    }
    got8 = {
        r["id"]: bytes(r["pq_code"])
        for r in with_pq_code(df.repartition(8), "vec", books).collect()
    }
    X = np.array([r[1] for r in rows])
    want = pq_encode(X, books)
    for i, (rid, _) in enumerate(rows):
        assert got[rid] == want[i].tobytes() == got8[rid]
        assert len(got[rid]) == 4  # m bytes per vector on the wire


def test_pq_topk_recall_on_clusters_and_rerank_exactness(spark):
    rows = _clustered(n_clusters=10, per=25, dim=32, seed=4)
    corpus = _corpus_df(spark, rows)
    queries = _corpus_df(spark, rows[::25][:6])  # one query per cluster
    exact = cosine_topk(corpus, queries, "id", "vec", k=5).toPandas()
    approx = pq_topk(
        corpus, queries, "id", "vec", k=5, m=8, ksub=32, rerank=40, seed=5
    ).toPandas()
    assert set(approx["query_id"]) == set(exact["query_id"])
    assert (approx.groupby("query_id").size() == 5).all()
    # recall@5 on well-separated clusters with a generous re-rank
    hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["id"])
        a = set(approx[approx.query_id == qid]["id"])
        hits += len(e & a)
    assert hits / (5 * 6) >= 0.9
    # re-ranked cosines are EXACT (same values the brute-force path emits)
    merged = approx.merge(exact, on=["query_id", "id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)
    # ADC-only path (rerank=0) still returns k well-formed rows per query
    adc_only = pq_topk(
        corpus, queries, "id", "vec", k=5, m=8, ksub=32, rerank=0, seed=5
    ).toPandas()
    assert (adc_only.groupby("query_id").size() == 5).all()
    assert (adc_only["cosine"] <= 1.01).all()
    with pytest.raises(ValueError, match="empty"):
        pq_topk(corpus, queries.where("id < 0"), "id", "vec")


def test_ivfpq_topk_recall_and_shape(spark):
    from tdigest_spark.operators.pq import ivfpq_topk

    rows = _clustered(n_clusters=10, per=25, dim=32, seed=4)
    corpus = _corpus_df(spark, rows)
    queries = _corpus_df(spark, rows[::25][:6])
    exact = cosine_topk(corpus, queries, "id", "vec", k=5).toPandas()
    # exhaustive probe + generous re-rank: near-exact
    approx = ivfpq_topk(
        corpus, queries, "id", "vec",
        k=5, nlist=8, nprobe=8, m=8, ksub=32, rerank=40, seed=5,
    ).toPandas()
    assert (approx.groupby("query_id").size() == 5).all()
    hits = 0
    for qid in exact["query_id"].unique():
        e = set(exact[exact.query_id == qid]["id"])
        a = set(approx[approx.query_id == qid]["id"])
        hits += len(e & a)
    assert hits / (5 * 6) >= 0.9
    # pruned probe (nprobe=2/8) on well-separated clusters: the true
    # cluster is the nearest cell, so in-cluster neighbors survive
    pruned = ivfpq_topk(
        corpus, queries, "id", "vec",
        k=5, nlist=8, nprobe=2, m=8, ksub=32, rerank=40, seed=5,
    ).toPandas()
    assert (pruned.groupby("query_id").size() == 5).all()
    merged = pruned.merge(exact, on=["query_id", "id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        ivfpq_topk(corpus, queries.where("id < 0"), "id", "vec")


def test_pq_topk_plan_shape(spark):
    """The candidate path's only Exchanges are for the tiny candidate
    rows (windows/joins over O(queries x R)) — the corpus-side encode +
    ADC scan is narrow (no Exchange below the first mapInPandas)."""
    rows = _clustered(n_clusters=5, per=20, dim=16, seed=2)
    corpus = _corpus_df(spark, rows)
    queries = _corpus_df(spark, rows[:3])
    out = pq_topk(corpus, queries, "id", "vec", k=3, m=4, ksub=16, rerank=10, seed=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every SHUFFLE partitions by the query id (candidate windows) —
    # the corpus/code side never shuffles, and the re-rank joins are
    # broadcast, so corpus rows cross no Exchange anywhere
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line and "Reused" not in line
    ]
    assert shuffles and all("query_id" in line for line in shuffles), plan
    assert len(shuffles) <= 2, plan  # ADC shortlist + final top-k
    assert plan.count("BroadcastHashJoin") == 2, plan  # re-rank joins
    # encode + ADC scan are back-to-back over the scan, pipelined
    assert plan.count("MapInPandas") == 2, plan


def test_ivfpq_index_persist_prune_exhaustive_and_rerank(spark, tmp_path):
    from tdigest_spark.operators.pq import build_ivfpq_index, ivfpq_topk_indexed

    rows = _clustered(n_clusters=8, per=25, dim=32, seed=4)
    corpus = _corpus_df(spark, rows)
    queries = _corpus_df(spark, rows[::25][:5])
    idx_dir = str(tmp_path / "ivfpq_idx")
    fmt = build_ivfpq_index(corpus, "id", "vec", idx_dir, nlist=8, m=8, ksub=32, seed=5)
    import os

    assert os.path.exists(os.path.join(idx_dir, "_centroids.json"))
    assert os.path.exists(os.path.join(idx_dir, "_pq_codebooks.json"))
    exact = cosine_topk(corpus, queries, "id", "vec", k=5).toPandas()
    # exhaustive probe + generous re-rank: high recall, exact cosines
    full = ivfpq_topk_indexed(
        spark, idx_dir, queries, "id", "vec", k=5, nprobe=8, rerank=40, fmt=fmt
    ).toPandas()
    assert (full.groupby("query_id").size() == 5).all()
    hits = sum(
        len(set(exact[exact.query_id == q]["id"]) & set(full[full.query_id == q]["id"]))
        for q in exact["query_id"].unique()
    )
    assert hits / (5 * 5) >= 0.9
    merged = full.merge(exact, on=["query_id", "id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)
    # pruned probe: the scan carries a partition filter on cell
    pruned_df = ivfpq_topk_indexed(
        spark, idx_dir, queries, "id", "vec", k=5, nprobe=2, rerank=40, fmt=fmt
    )
    plan = pruned_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    pruned = pruned_df.toPandas()
    assert (pruned.groupby("query_id").size() == 5).all()
    # indexed pruned results == the in-memory composition at the same params
    from tdigest_spark.operators.pq import ivfpq_topk

    mem = ivfpq_topk(
        corpus, queries, "id", "vec",
        k=5, nlist=8, nprobe=2, m=8, ksub=32, rerank=40, seed=5,
    ).toPandas()
    got = pruned.sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = mem.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert list(got["id"]) == list(want["id"])
    assert np.allclose(got["cosine"], want["cosine"], atol=1e-9)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="empty"):
        ivfpq_topk_indexed(spark, idx_dir, queries.where("id < 0"), "id", "vec")


def test_ivfpq_index_append_found_and_codes_stable(spark, tmp_path):
    """Appended vectors are searchable through the pruned scan; their
    codes come from the ORIGINAL sidecars (no refit on append)."""
    from tdigest_spark.operators.pq import (
        append_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk_indexed,
        pq_encode,
    )
    from tdigest_spark.operators.pq import _load_pq_codebooks

    rows = _clustered(n_clusters=6, per=20, dim=16, seed=7)
    corpus = _corpus_df(spark, rows[:100])
    idx_dir = str(tmp_path / "ivfpq_append")
    build_ivfpq_index(corpus, "id", "vec", idx_dir, nlist=4, m=4, ksub=16, seed=5)
    books_before = _load_pq_codebooks(idx_dir)
    extra = _corpus_df(spark, rows[100:])
    append_ivfpq_index(extra, "id", "vec", idx_dir)
    assert np.array_equal(_load_pq_codebooks(idx_dir), books_before)
    # query WITH an appended vector: its exact self-cell neighbors
    # (appended + original) are retrievable
    q = _corpus_df(spark, rows[100:101])
    got = ivfpq_topk_indexed(
        spark, idx_dir, q, "id", "vec", k=5, nprobe=4, rerank=20
    ).toPandas()
    assert len(got) == 5
    all_rows = _corpus_df(spark, rows)
    exact = cosine_topk(all_rows, q, "id", "vec", k=5).toPandas()
    assert set(got["id"]) == set(exact["id"])  # exhaustive probe == brute force
    # appended rows' stored codes == encoding under the original books
    idx = spark.read.parquet(idx_dir)
    stored = {r["id"]: bytes(r["pq_code"]) for r in idx.collect()}
    X = np.array([r[1] for r in rows[100:]])
    want = pq_encode(X, books_before)
    for i, (rid, _) in enumerate(rows[100:]):
        assert stored[rid] == want[i].tobytes()


def test_ivfpq_index_refresh_rebuilds_from_live_contents(spark, tmp_path):
    from tdigest_spark.operators.pq import (
        append_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk_indexed,
        refresh_ivfpq_index,
    )

    rows = _clustered(n_clusters=6, per=20, dim=16, seed=7)
    corpus = _corpus_df(spark, rows[:80])
    d1 = str(tmp_path / "v1")
    build_ivfpq_index(corpus, "id", "vec", d1, nlist=4, m=4, ksub=16, seed=5)
    append_ivfpq_index(_corpus_df(spark, rows[80:]), "id", "vec", d1)
    d2 = str(tmp_path / "v2")
    fmt = refresh_ivfpq_index(spark, d1, d2, "id", "vec", seed=5)
    # every row survives the rebuild; geometry carried from sidecars
    assert spark.read.parquet(d2).count() == len(rows)
    q = _corpus_df(spark, rows[:1])
    exact = cosine_topk(_corpus_df(spark, rows), q, "id", "vec", k=5).toPandas()
    got = ivfpq_topk_indexed(
        spark, d2, q, "id", "vec", k=5, nprobe=4, rerank=20, fmt=fmt
    ).toPandas()
    assert set(got["id"]) == set(exact["id"])


def test_residual_ivfpq_quantizes_finer_and_searches_exactly(spark, tmp_path):
    """FAISS-style residual encoding: (1) residual quantization error
    < plain at identical (m, ksub) on clustered data (residuals have
    less variance); (2) the residual-index search with exhaustive
    probe + re-rank still matches brute force; (3) append and refresh
    honor the persisted residual flag."""
    from tdigest_spark.operators.pq import (
        _kmeans_books,
        _load_pq_meta,
        append_ivfpq_index,
        build_ivfpq_index,
        ivfpq_topk_indexed,
        refresh_ivfpq_index,
    )
    from tdigest_spark.operators.similarity import train_ivf_centroids

    rows = _clustered(n_clusters=8, per=25, dim=32, seed=4)
    corpus = _corpus_df(spark, rows)

    # (1) numpy-level error comparison at identical geometry
    X = np.array([r[1] for r in rows])
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    C = train_ivf_centroids(corpus, "vec", nlist=8, seed=5)
    assign = np.argmax(X @ C.T, axis=1)
    res = X - C[assign]
    plain_books = _kmeans_books(X, 8, 16, 5, 12)
    res_books = _kmeans_books(res, 8, 16, 5, 12)
    plain_err = ((pq_reconstruct(pq_encode(X, plain_books, normalize=False), plain_books) - X) ** 2).mean()
    res_recon = C[assign] + pq_reconstruct(
        pq_encode(res, res_books, normalize=False), res_books
    )
    res_err = ((res_recon - X) ** 2).mean()
    assert res_err < plain_err

    # (2) end-to-end: residual index, exhaustive probe == brute force sets
    queries = _corpus_df(spark, rows[::25][:4])
    d = str(tmp_path / "res_idx")
    build_ivfpq_index(
        corpus, "id", "vec", d, nlist=8, m=8, ksub=16, seed=5, residual=True
    )
    assert _load_pq_meta(d)["residual"] is True
    exact = cosine_topk(corpus, queries, "id", "vec", k=5).toPandas()
    got = ivfpq_topk_indexed(
        spark, d, queries, "id", "vec", k=5, nprobe=8, rerank=40
    ).toPandas()
    hits = sum(
        len(set(exact[exact.query_id == q]["id"]) & set(got[got.query_id == q]["id"]))
        for q in exact["query_id"].unique()
    )
    assert hits / (5 * 4) >= 0.9
    merged = got.merge(exact, on=["query_id", "id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["cosine_a"], merged["cosine_e"], atol=1e-9)

    # (3) append + refresh keep the flag and stay searchable
    extra_rows = [(10_000 + i, r[1]) for i, r in enumerate(rows[:10])]
    append_ivfpq_index(_corpus_df(spark, extra_rows), "id", "vec", d)
    d2 = str(tmp_path / "res_idx_v2")
    refresh_ivfpq_index(spark, d, d2, "id", "vec", seed=5)
    assert _load_pq_meta(d2)["residual"] is True
    assert spark.read.parquet(d2).count() == len(rows) + 10
    again = ivfpq_topk_indexed(
        spark, d2, queries, "id", "vec", k=5, nprobe=8, rerank=40
    ).toPandas()
    assert (again.groupby("query_id").size() == 5).all()


def test_residual_build_validates_ksub_and_empty_corpus(spark, tmp_path):
    """ADVICE r4: the residual branch must enforce the same ksub/empty
    guards as the plain branch (ksub > 256 would silently wrap uint8
    codes; an empty corpus gave a cryptic np.vstack error)."""
    import pytest as _pytest

    from tdigest_spark.operators.pq import build_ivfpq_index

    rows = _clustered(n_clusters=4, per=10, dim=16, seed=3)
    corpus = _corpus_df(spark, rows)
    with _pytest.raises(ValueError, match="ksub"):
        build_ivfpq_index(
            corpus, "id", "vec", str(tmp_path / "a"),
            nlist=2, m=4, ksub=300, residual=True,
        )
    empty = corpus.where("id < 0")
    with _pytest.raises(ValueError, match="empty"):
        build_ivfpq_index(
            empty, "id", "vec", str(tmp_path / "b"),
            nlist=2, m=4, ksub=16, residual=True,
        )


def test_refresh_rejects_inplace_overwrite(spark, tmp_path):
    """ADVICE r4: out_dir == index_dir would overwrite the index while
    lazily reading it — must raise, never destroy."""
    import pytest as _pytest

    from tdigest_spark.operators.pq import build_ivfpq_index, refresh_ivfpq_index

    rows = _clustered(n_clusters=4, per=10, dim=16, seed=3)
    d = str(tmp_path / "idx")
    build_ivfpq_index(_corpus_df(spark, rows), "id", "vec", d, nlist=2, m=4, ksub=16)
    with _pytest.raises(ValueError, match="NEW directory"):
        refresh_ivfpq_index(spark, d, d, "id", "vec")
    # unchanged index still readable
    assert spark.read.parquet(d).count() == len(rows)
