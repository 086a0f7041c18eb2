"""Frequent-directions sketch: the covariance guarantee (PSD deficit
bounded by the carried shrink mass, worst case 2||A||_F^2/ell), exact
below ell, merge composition, serialization, and the distributed
operator over the embeddings table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.fd_agg import fd_agg, fd_merge_agg, fd_project, fd_stats
from tdigest_spark.sketch.fd import FrequentDirections


def _deficit_eigs(A: np.ndarray, fd: FrequentDirections) -> np.ndarray:
    return np.linalg.eigvalsh(A.T @ A - fd.gram())


def _rand_lowrank(rng, n, d, rank, noise=0.05):
    base = rng.normal(size=(rank, d))
    return rng.normal(size=(n, rank)) @ base + noise * rng.normal(size=(n, d))


def test_fd_covariance_guarantee_and_posteriori_bound():
    rng = np.random.default_rng(5)
    A = _rand_lowrank(rng, n=3000, d=32, rank=6)
    fd = FrequentDirections(16, 32)
    for i in range(0, len(A), 97):  # uneven batches
        fd.add(A[i : i + 97])
    eigs = _deficit_eigs(A, fd)
    frob = float((A * A).sum())
    assert eigs.min() >= -1e-6 * frob            # deficit is PSD
    assert eigs.max() <= fd.error_bound() + 1e-6 * frob
    assert fd.error_bound() <= 2 * frob / 16 + 1e-9
    assert fd.n_rows == 3000
    assert fd.frob_sq == pytest.approx(frob, rel=1e-12)
    assert len(fd.rows) < 16
    # low-rank signal: the top-6 directions carry almost all mass, so
    # the sketch's top singular values track the true ones closely
    s_true = np.linalg.svd(A, compute_uv=False)
    s_fd, _ = fd.spectrum()
    for i in range(6):
        assert s_fd[i] ** 2 >= s_true[i] ** 2 - fd.error_bound()
        assert s_fd[i] <= s_true[i] + 1e-9


def test_fd_exact_below_ell_and_nan_policy():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(10, 8))
    fd = FrequentDirections(32, 8).add(A)
    assert np.allclose(fd.gram(), A.T @ A)
    assert fd.error_bound() == 0.0
    bad = A.copy()
    bad[3, 2] = np.nan
    fd2 = FrequentDirections(32, 8).add(bad)
    assert fd2.n_rows == 9  # NaN row dropped

    with pytest.raises(ValueError, match="dim mismatch"):
        fd.add(np.zeros((2, 5)))
    with pytest.raises(ValueError, match="ell >= 2"):
        FrequentDirections(1, 8)


def test_fd_merge_bound_composes():
    rng = np.random.default_rng(11)
    A = _rand_lowrank(rng, n=4000, d=24, rank=5)
    parts = [
        FrequentDirections(20, 24).add(A[i::4]) for i in range(4)
    ]
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.merge(p)
    assert merged.n_rows == 4000
    frob = float((A * A).sum())
    assert merged.frob_sq == pytest.approx(frob, rel=1e-12)
    eigs = _deficit_eigs(A, merged)
    assert eigs.min() >= -1e-6 * frob
    assert eigs.max() <= merged.error_bound() + 1e-6 * frob
    assert merged.error_bound() <= 2 * frob / 20 + 1e-9

    with pytest.raises(ValueError, match="shape mismatch"):
        parts[0].merge(FrequentDirections(20, 8))


def test_fd_roundtrip():
    rng = np.random.default_rng(13)
    fd = FrequentDirections(12, 16).add(rng.normal(size=(500, 16)))
    rt = FrequentDirections.from_bytes(fd.to_bytes())
    assert rt.ell == 12 and rt.d == 16 and rt.n_rows == 500
    assert rt.frob_sq == fd.frob_sq and rt.shrink_total == fd.shrink_total
    assert np.array_equal(rt.rows, fd.rows)


def test_fd_agg_distributed_bound_and_stats(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pdf = emb.select("label", "embedding").toPandas()
    ell = 24
    out = fd_agg(emb, "embedding", ell, by=["label"])
    blobs = {r["label"]: bytes(r["fd"]) for r in out.collect()}
    assert set(blobs) == set(pdf["label"].unique())
    for label, b in blobs.items():
        fd = FrequentDirections.from_bytes(b)
        g = pdf[pdf["label"] == label]
        A = np.asarray([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        assert fd.n_rows == len(A)
        assert fd.frob_sq == pytest.approx(float((A * A).sum()), rel=1e-6)
        eigs = _deficit_eigs(A, fd)
        frob = fd.frob_sq
        assert eigs.min() >= -1e-6 * frob
        assert eigs.max() <= fd.error_bound() + 1e-6 * frob

    stats = {r["label"]: r for r in fd_stats(out, top_k=4).collect()}
    for label, b in blobs.items():
        fd = FrequentDirections.from_bytes(b)
        r = stats[label]
        assert r["n_rows"] == fd.n_rows
        assert r["err_bound"] == pytest.approx(fd.error_bound())
        assert r["err_bound"] <= r["worst_case_bound"] + 1e-9
        s, _ = fd.spectrum()
        assert r["singular_values"] == pytest.approx(list(s[:4]))

    # global (ungrouped) sketch over everything + merge-agg of the
    # per-label table reach the same row count / mass
    g1 = fd_agg(emb, "embedding", ell).collect()[0]
    g2 = fd_merge_agg(out).collect()[0]
    f1 = FrequentDirections.from_bytes(bytes(g1["fd"]))
    f2 = FrequentDirections.from_bytes(bytes(g2["fd"]))
    assert f1.n_rows == f2.n_rows == len(pdf)
    assert f1.frob_sq == pytest.approx(f2.frob_sq, rel=1e-9)
    A = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    for f in (f1, f2):
        eigs = _deficit_eigs(A, f)
        assert eigs.min() >= -1e-6 * f.frob_sq
        assert eigs.max() <= f.error_bound() + 1e-6 * f.frob_sq


def test_fd_project_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    pdf = emb.toPandas()
    fd = FrequentDirections(16, 64)
    fd.add(np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]))
    _, vt = fd.spectrum()
    comp = vt[:3]
    got = {r["vec_id"]: r["projected"] for r in fd_project(emb, "embedding", comp).collect()}
    for _, row in pdf.iterrows():
        want = np.asarray(row["embedding"], dtype=np.float64) @ comp.T
        assert got[row["vec_id"]] == pytest.approx(list(want), abs=1e-9)
    with pytest.raises(ValueError, match="2-D"):
        fd_project(emb, "embedding", np.zeros(3))


def test_subspace_overlap_identical_orthogonal_rotated():
    from tdigest_spark.operators.fd_agg import subspace_overlap

    rng = np.random.default_rng(17)
    d = 16
    # data concentrated on axes 0..2 vs axes 3..5: disjoint subspaces
    A = rng.normal(size=(2000, 3)) @ np.eye(3, d, 0) + 0.01 * rng.normal(size=(2000, d))
    B = rng.normal(size=(2000, 3)) @ np.eye(3, d, 3) + 0.01 * rng.normal(size=(2000, d))
    fa = FrequentDirections(12, d).add(A)
    fb = FrequentDirections(12, d).add(B)
    ov, ang = subspace_overlap(fa, fa, 3)
    assert ov == pytest.approx(1.0, abs=1e-9) and ang == pytest.approx(0.0, abs=1e-6)
    ov, ang = subspace_overlap(fa, fb, 3)
    assert ov < 0.05 and ang > 1.5  # near-orthogonal: angle ~ pi/2

    # same distribution, different sample: high overlap
    A2 = rng.normal(size=(2000, 3)) @ np.eye(3, d, 0) + 0.01 * rng.normal(size=(2000, d))
    fa2 = FrequentDirections(12, d).add(A2)
    ov, ang = subspace_overlap(fa, fa2, 3)
    assert ov > 0.95 and ang < 0.3

    assert subspace_overlap(fa, fb, 12) is None  # < k directions kept
    with pytest.raises(ValueError, match="shape mismatch"):
        subspace_overlap(fa, FrequentDirections(12, 8), 2)


def test_fd_subspace_drift_operator(spark, sf_dir):
    from tdigest_spark.operators.fd_agg import fd_subspace_drift, subspace_overlap

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = fd_agg(emb.filter("vec_id % 2 = 0"), "embedding", 32, by=["label"])
    b = fd_agg(emb.filter("vec_id % 2 = 1"), "embedding", 32, by=["label"])
    rows = fd_subspace_drift(a, b, k=3, by=["label"]).collect()
    ba = {r["label"]: bytes(r["fd"]) for r in a.collect()}
    bb = {r["label"]: bytes(r["fd"]) for r in b.collect()}
    assert rows
    for r in rows:
        want = subspace_overlap(
            FrequentDirections.from_bytes(ba[r["label"]]),
            FrequentDirections.from_bytes(bb[r["label"]]),
            3,
        )
        assert (r["subspace_overlap"], r["max_principal_angle"]) == pytest.approx(want)
    # self-drift: identical subspace
    self_rows = fd_subspace_drift(a, a, k=3, by=["label"]).collect()
    assert all(r["subspace_overlap"] == pytest.approx(1.0) for r in self_rows)


def test_fd_as_sketch_kind_one_pass(spark, sf_dir):
    """FD through the generic sketch_build framework: one scan builds
    the spectral summary alongside an HLL; invariants (n_rows,
    frob_sq, PSD deficit <= carried bound) hold per group; the blob
    merges through sketch_merge_agg; bad spec raises."""
    from tdigest_spark.operators.sketch_agg import sketch_build, sketch_merge_agg

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = sketch_build(
        emb,
        {"spec": ("fd", "embedding", 24, 64), "ids": ("hll", "vec_id", 12)},
        by=["label"],
    )
    pdf = emb.select("label", "embedding").toPandas()
    blobs = {r["label"]: bytes(r["spec"]) for r in out.collect()}
    assert set(blobs) == set(pdf["label"].unique())
    for label, b in blobs.items():
        fd = FrequentDirections.from_bytes(b)
        g = pdf[pdf["label"] == label]
        A = np.asarray([np.asarray(v, dtype=np.float64) for v in g["embedding"]])
        assert fd.n_rows == len(A)
        assert fd.frob_sq == pytest.approx(float((A * A).sum()), rel=1e-6)
        eigs = np.linalg.eigvalsh(A.T @ A - fd.gram())
        assert eigs.min() >= -1e-6 * fd.frob_sq
        assert eigs.max() <= fd.error_bound() + 1e-6 * fd.frob_sq

    rolled = sketch_merge_agg(out.drop("ids"), {"spec": "fd"}).collect()[0]
    fr = FrequentDirections.from_bytes(bytes(rolled["spec"]))
    assert fr.n_rows == len(pdf)

    with pytest.raises(Exception, match="fd kind needs"):
        sketch_build(emb, {"s": ("fd", "embedding", 24)}, by=["label"]).collect()


def test_fd_estimates_surface(spark, sf_dir):
    from tdigest_spark.operators.sketch_agg import sketch_build, sketch_estimates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sk = sketch_build(emb, {"s": ("fd", "embedding", 24, 64)}, by=["label"])
    out = sketch_estimates(
        sk, {"n": ("fd_n_rows", "s"), "eb": ("fd_err_bound", "s"), "fr": ("fd_frob_sq", "s")}
    ).collect()
    counts = {r["label"]: r["count"] for r in emb.groupBy("label").count().collect()}
    for r in out:
        assert r["n"] == counts[r["label"]]
        assert r["fr"] > 0 and 0 <= r["eb"] <= 2 * r["fr"] / 24


def test_fd_buffer_bounded_when_d_below_half_ell():
    """d <= ell/2: the SVD has <= d singular values, so the shrink
    pivot never exists — the buffer must still stay bounded (rebuild
    from the SVD, Gram preserved exactly) instead of growing by every
    batch."""
    rng = np.random.default_rng(21)
    fd = FrequentDirections(24, 8)
    A = rng.normal(size=(5000, 8))
    for i in range(0, len(A), 100):
        fd.add(A[i : i + 100])
        assert len(fd.rows) <= 24 + 100  # bounded across the whole run
    assert len(fd.rows) <= 8  # rank <= d after the last rebuild
    assert np.allclose(fd.gram(), A.T @ A)  # no mass lost, ever
    assert fd.error_bound() == 0.0


def test_fd_project_null_and_empty_vectors(spark):
    """NULL and EMPTY embedding rows project to NULL (the shared
    vector-ingest policy) instead of crashing the ragged stack."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, []), (3, [0.0, 2.0])],
        "id long, v array<double>",
    )
    comp = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = {r["id"]: r["projected"] for r in fd_project(df, "v", comp).collect()}
    assert got[0] == [1.0, 0.0] and got[3] == [0.0, 2.0]
    assert got[1] is None and got[2] is None
