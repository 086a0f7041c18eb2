"""Property tests for the companion sketch cores (HLL / Bloom /
count-min / KLL), mirroring the reference's three-layer strategy
(SURVEY.md §5): invariants, goldens on deterministic inputs, and
accuracy-vs-exact within published bounds."""

import numpy as np
import pytest

from tdigest_spark.sketch.bloom import BloomFilter
from tdigest_spark.sketch.cms import CountMin
from tdigest_spark.sketch.hashing import hash64, hash_pair
from tdigest_spark.sketch.hll import HLL
from tdigest_spark.sketch.kll import KLL

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------- hashing
def test_hash64_deterministic_and_seeded():
    vals = ["a", "b", "c", "a"]
    h1 = hash64(vals)
    h2 = hash64(vals)
    assert np.array_equal(h1, h2)
    assert h1[0] == h1[3] and h1[0] != h1[1]
    assert not np.array_equal(hash64(vals, seed=1), h1)


def test_hash_pair_independent():
    h1, h2 = hash_pair(np.arange(1000))
    assert np.all(h2 % 2 == 1)  # odd for full-period double hashing
    assert len(np.unique(h1)) == 1000


# ---------------------------------------------------------------- HLL
def test_hll_accuracy_and_merge():
    n = 50_000
    vals = np.array([f"item-{i}" for i in range(n)], dtype=object)
    h = HLL(p=12).add(vals)
    est = h.estimate()
    assert abs(est / n - 1) < 3 * h.rel_error()

    # merge of disjoint halves == single-pass (registers identical)
    a = HLL(p=12).add(vals[: n // 2])
    b = HLL(p=12).add(vals[n // 2 :])
    m = a.merge(b)
    assert np.array_equal(m.registers, h.registers)
    # idempotent: re-adding the same values changes nothing
    assert np.array_equal(HLL(p=12).add(vals).add(vals).registers, h.registers)


def test_hll_small_range_linear_counting():
    h = HLL(p=12).add(np.array([f"x{i}" for i in range(100)], dtype=object))
    assert abs(h.estimate() - 100) <= 3


def test_hll_roundtrip():
    h = HLL(p=10).add(np.arange(1000))
    h2 = HLL.from_bytes(h.to_bytes())
    assert h2.p == 10 and np.array_equal(h2.registers, h.registers)
    assert h2.estimate() == h.estimate()


def test_hll_precision_mismatch():
    with pytest.raises(ValueError):
        HLL(p=10).merge(HLL(p=12))


# ---------------------------------------------------------------- Bloom
def test_bloom_no_false_negatives_and_fpp():
    n = 20_000
    present = np.array([f"in-{i}" for i in range(n)], dtype=object)
    absent = np.array([f"out-{i}" for i in range(n)], dtype=object)
    bf = BloomFilter.for_capacity(n, fpp=0.01).add(present)
    assert bool(np.all(bf.might_contain(present)))  # never a false negative
    fp = float(np.mean(bf.might_contain(absent)))
    assert fp < 0.03  # 3x headroom over target 1%


def test_bloom_merge_is_union():
    a = BloomFilter(1 << 14, 5).add(["x", "y"])
    b = BloomFilter(1 << 14, 5).add(["z"])
    m = a.merge(b)
    assert bool(np.all(m.might_contain(["x", "y", "z"])))
    assert np.array_equal(m.bits, BloomFilter(1 << 14, 5).add(["x", "y", "z"]).bits)


def test_bloom_roundtrip():
    bf = BloomFilter(1 << 10, 3).add(np.arange(100))
    b2 = BloomFilter.from_bytes(bf.to_bytes())
    assert (b2.n_bits, b2.n_hashes) == (1 << 10, 3)
    assert np.array_equal(b2.bits, bf.bits)


# ---------------------------------------------------------------- CMS
def test_cms_overestimates_within_bound():
    words = RNG.choice([f"w{i}" for i in range(500)], size=50_000, p=None)
    exact = {}
    for w in words:
        exact[w] = exact.get(w, 0) + 1
    cm = CountMin.for_error(eps=0.001, delta=0.01).add(words)
    keys = np.array(list(exact.keys()), dtype=object)
    est = cm.query(keys)
    true = np.array([exact[k] for k in keys])
    assert np.all(est >= true)  # one-sided guarantee
    assert np.all(est <= true + cm.eps_bound() + 1)


def test_cms_merge_exact_sum():
    a = CountMin(512, 4).add(["x"] * 10 + ["y"] * 3)
    b = CountMin(512, 4).add(["x"] * 5)
    m = a.merge(b)
    assert np.array_equal(m.table, CountMin(512, 4).add(["x"] * 15 + ["y"] * 3).table)
    assert m.total == 18
    assert int(m.query(np.array(["x"], dtype=object))[0]) >= 15


def test_cms_roundtrip():
    cm = CountMin(256, 3).add(np.arange(1000))
    c2 = CountMin.from_bytes(cm.to_bytes())
    assert (c2.width, c2.depth, c2.total) == (256, 3, 1000)
    assert np.array_equal(c2.table, cm.table)


# ---------------------------------------------------------------- KLL
def test_kll_lossless_matches_quantile_cont():
    import duckdb

    vals = RNG.normal(50, 10, size=5000)
    k = KLL(k=10_000).add(vals)  # k >= n -> no compaction -> exact
    for q in (0.01, 0.25, 0.5, 0.9, 0.99):
        exact = duckdb.sql(
            f"SELECT quantile_cont(v, {q}) FROM (SELECT unnest($1::DOUBLE[]) v)",
            params=[vals.tolist()],
        ).fetchone()[0]
        assert k.quantile(q) == pytest.approx(exact, abs=1e-9)


def test_kll_weight_conservation_under_compaction():
    k = KLL(k=64)
    for chunk in np.array_split(RNG.uniform(0, 1, 30_000), 13):
        k.add(chunk)
    v, w = k._items()
    assert float(w.sum()) == 30_000  # weights conserved exactly
    assert k.size() < 2_000  # genuinely compacted


def test_kll_rank_error_bound():
    n = 200_000
    vals = RNG.exponential(1.0, n)
    k = KLL(k=200).add(vals)
    svals = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99, 0.999):
        est = k.quantile(q)
        true_rank = np.searchsorted(svals, est) / n
        assert abs(true_rank - q) < 0.015  # ~3/k with headroom


def test_kll_merge_close_to_single_pass():
    vals = RNG.normal(0, 1, 100_000)
    parts = np.array_split(vals, 16)
    merged = KLL(k=256)
    for p in parts:
        merged = merged.merge(KLL(k=256).add(p))
    svals = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        true_rank = np.searchsorted(svals, est) / len(vals)
        assert abs(true_rank - q) < 0.02
    assert merged.n == len(vals)


def test_kll_roundtrip():
    k = KLL(k=128).add(RNG.uniform(0, 1, 10_000))
    k2 = KLL.from_bytes(k.to_bytes())
    assert (k2.n, k2.vmin, k2.vmax, k2.coin) == (k.n, k.vmin, k.vmax, k.coin)
    assert k2.quantile(0.5) == k.quantile(0.5)


def test_kll_empty_and_mismatch():
    assert KLL(k=10).quantile(0.5) is None
    assert KLL(k=10).cdf(1.0) is None
    with pytest.raises(ValueError):
        KLL(k=10).merge(KLL(k=20))


def test_kll_cdf_matches_exact_when_lossless():
    vals = RNG.uniform(0, 100, 2000)
    k = KLL(k=5000).add(vals)
    # exact mid-rank equality at sample points; within 1/n between them
    for x in vals[:20]:
        exact = (np.sum(vals < x) + 0.5 * np.sum(vals == x)) / len(vals)
        assert k.cdf(float(x)) == pytest.approx(exact, abs=1e-12)
    for x in (10.0, 50.0, 90.0):
        exact = (np.sum(vals < x) + 0.5 * np.sum(vals == x)) / len(vals)
        assert k.cdf(x) == pytest.approx(exact, abs=1.0 / len(vals))


# ------------------------------------------------------- weighted KLL
def test_kll_weighted_conserves_weight_and_bounds():
    v = RNG.uniform(0, 1000, 5000)
    w = RNG.integers(1, 50, 5000)
    k = KLL(k=10_000_000).add_weighted(v, w)  # lossless
    _, iw = k._items()
    assert float(iw.sum()) == float(w.sum())  # binary decomposition exact
    assert k.n == int(w.sum())
    assert (k.vmin, k.vmax) == (v.min(), v.max())
    # cdf exact at retained sample values (mid-rank convention)
    for x in v[:20]:
        exact = (w[v < x].sum() + 0.5 * w[v == x].sum()) / w.sum()
        assert k.cdf(float(x)) == pytest.approx(exact, abs=1e-12)


def test_kll_weighted_rank_error_compacted():
    v = RNG.exponential(100.0, 50_000)
    w = RNG.integers(1, 20, 50_000)
    k = KLL(k=400).add_weighted(v, w)
    assert k.size() < 6_000  # genuinely compacted
    order = np.argsort(v)
    cum = np.cumsum(w[order]) / w.sum()
    for q in (0.1, 0.5, 0.9, 0.99):
        est = k.quantile(q)
        true_rank = cum[np.searchsorted(v[order], est, side="right") - 1]
        assert abs(true_rank - q) < 0.02


def test_kll_weighted_merge_and_mixed():
    v = RNG.normal(0, 1, 20_000)
    w = RNG.integers(1, 8, 20_000)
    a = KLL(k=256).add_weighted(v[:10_000], w[:10_000])
    b = KLL(k=256).add(v[10_000:])  # unweighted half (weight 1 each)
    m = a.merge(b)
    assert m.n == int(w[:10_000].sum()) + 10_000
    wa = np.concatenate([w[:10_000], np.ones(10_000, dtype=np.int64)])
    order = np.argsort(v)
    cum = np.cumsum(wa[order]) / wa.sum()
    for q in (0.25, 0.5, 0.75):
        est = m.quantile(q)
        true_rank = cum[np.searchsorted(v[order], est, side="right") - 1]
        assert abs(true_rank - q) < 0.02


def test_kll_weighted_drops_invalid():
    k = KLL(k=100).add_weighted([1.0, 2.0, np.nan, 3.0], [2, 0, 5, np.nan])
    assert k.n == 2  # only (1.0, w=2) survives


# ----------------------------------------------------------------- KMV

def test_kmv_merge_sample_estimate_roundtrip():
    """Bottom-k invariants: merge-of-parts == single build EXACTLY
    (min-k of a union is the merge of min-k's), merge is idempotent,
    the sample IS the k distinct values with the globally smallest
    hashes (independently recomputed), the estimate is exact below k
    and within 5x its published RSE (1/sqrt(k-2)) above, and blobs
    round-trip."""
    import pandas as pd

    from tdigest_spark.sketch.hashing import hash64
    from tdigest_spark.sketch.kmv import KMV

    rng = np.random.default_rng(3)
    vals = [f"v{int(x)}" for x in rng.integers(0, 10_000, 50_000)]
    single = KMV(256).add(vals)
    merged = KMV(256).add(vals[0::3]).merge(KMV(256).add(vals[1::3])).merge(
        KMV(256).add(vals[2::3])
    )
    assert np.array_equal(single.hashes, merged.hashes)
    assert single.values == merged.values
    assert np.array_equal(single.merge(single).hashes, single.hashes)

    distinct = pd.Series(sorted(set(vals)))
    order = np.argsort(hash64(distinct))
    assert single.sample() == [str(distinct.iloc[i]) for i in order[:256]]

    assert KMV(256).add([f"u{i}" for i in range(100)]).estimate() == 100.0
    n_true = len(distinct)
    assert abs(single.estimate() - n_true) / n_true < 5 / np.sqrt(254)

    rt = KMV.from_bytes(single.to_bytes())
    assert rt.k == 256 and rt.values == single.values
    assert np.array_equal(rt.hashes, single.hashes)


def test_kmv_overlap_exact_and_estimated():
    """Set algebra (Beyer et al. 2007): exact Jaccard/intersection/
    union below k; within 5x the binomial RSE sqrt(j(1-j)/k) above;
    0 for disjoint sets; None when both empty; k mismatch raises."""
    from tdigest_spark.sketch.kmv import KMV

    # exact regime: union (150 distinct) < k=256
    a = KMV(256).add([f"x{i}" for i in range(100)])
    b = KMV(256).add([f"x{i}" for i in range(50, 150)])
    j, inter, union = a.overlap(b)
    assert j == 50 / 150 and inter == 50.0 and union == 150.0

    # estimation regime: |A|=20k, |B|=20k, overlap 10k -> J = 1/3
    big_a = KMV(512).add([f"y{i}" for i in range(20_000)])
    big_b = KMV(512).add([f"y{i}" for i in range(10_000, 30_000)])
    j, inter, union = big_a.overlap(big_b)
    rse = np.sqrt((1 / 3) * (2 / 3) / 512)
    assert abs(j - 1 / 3) < 5 * rse
    assert abs(union - 30_000) / 30_000 < 5 / np.sqrt(510)
    assert abs(inter - 10_000) / 10_000 < 5 * (rse / (1 / 3) + 1 / np.sqrt(510))

    # disjoint
    c = KMV(256).add([f"z{i}" for i in range(100)])
    j, inter, _ = a.overlap(c)
    assert j == 0.0 and inter == 0.0

    # empties
    assert KMV(256).overlap(KMV(256)) is None
    j, inter, union = a.overlap(KMV(256))
    assert j == 0.0 and inter == 0.0 and union == 100.0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="k mismatch"):
        a.overlap(KMV(128))


def test_cms_inner_product_join_size():
    import numpy as np

    from tdigest_spark.sketch.cms import CountMin

    rng = np.random.default_rng(7)
    a_keys = rng.integers(0, 500, 20_000).astype(str)
    b_keys = rng.integers(0, 500, 5_000).astype(str)
    ca = CountMin(width=8192, depth=5).add(a_keys)
    cb = CountMin(width=8192, depth=5).add(b_keys)
    # exact join size: sum over keys of count_a * count_b
    ua, na = np.unique(a_keys, return_counts=True)
    ub, nb = np.unique(b_keys, return_counts=True)
    true = int(sum(na[list(ua).index(k)] * nb[i] for i, k in enumerate(ub) if k in set(ua)))
    est = ca.inner_product(cb)
    assert est >= true  # one-sided, like the point query
    assert est <= true + ca.inner_product_bound(cb)
    # disjoint domains: true join size 0, estimate within the bound
    cd = CountMin(width=8192, depth=5).add(
        (rng.integers(10_000, 10_500, 5_000)).astype(str)
    )
    assert ca.inner_product(cd) <= ca.inner_product_bound(cd)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="geometry"):
        ca.inner_product(CountMin(width=4096, depth=5))


def test_hll_sparse_wire_format():
    """Small-cardinality sketches serialize SPARSE (far under the 4 KB
    dense array), round-trip exactly, and merge identically; large
    ones stay dense; the choice is a pure function of state (same
    state -> same bytes, preserving streamed==batch byte parity)."""
    small = HLL(p=12).add(np.arange(10))
    b = small.to_bytes()
    assert b[:4] == b"HLLS" and len(b) < 100
    rt = HLL.from_bytes(b)
    assert rt.p == 12 and np.array_equal(rt.registers, small.registers)
    assert rt.to_bytes() == b  # deterministic
    big = HLL(p=12).add(np.arange(50_000))
    bb = big.to_bytes()
    assert bb[:4] == b"HLL1" and len(bb) == 5 + (1 << 12)
    assert np.array_equal(HLL.from_bytes(bb).registers, big.registers)
    # merge through the wire == direct merge
    m1 = HLL.from_bytes(b).merge(HLL.from_bytes(bb))
    m2 = small.merge(big)
    assert np.array_equal(m1.registers, m2.registers)
    # legacy dense blobs (pre-sparse format) still parse
    import struct as _s

    legacy = b"HLL1" + _s.pack("<B", 12) + small.registers.tobytes()
    assert np.array_equal(HLL.from_bytes(legacy).registers, small.registers)


def test_cms_sparse_wire_format():
    """Few-distinct-key sketches serialize SPARSE (far under the 80 KB
    dense table), round-trip exactly, merge identically through the
    wire, and the choice is a pure function of state; legacy dense
    blobs still parse."""
    small = CountMin().add(np.array([f"k{i}" for i in range(20)], dtype=object))
    b = small.to_bytes()
    assert b[:4] == b"CMSS" and len(b) < 2_000
    rt = CountMin.from_bytes(b)
    assert (
        rt.width == small.width
        and rt.depth == small.depth
        and rt.total == small.total
        and np.array_equal(rt.table, small.table)
    )
    assert rt.to_bytes() == b  # deterministic
    big = CountMin().add(np.arange(50_000).astype(str).astype(object))
    bb = big.to_bytes()
    assert bb[:4] == b"CMS1" and len(bb) == 20 + 8 * big.depth * big.width
    assert np.array_equal(CountMin.from_bytes(bb).table, big.table)
    m1 = CountMin.from_bytes(b).merge(CountMin.from_bytes(bb))
    m2 = small.merge(big)
    assert np.array_equal(m1.table, m2.table) and m1.total == m2.total
    import struct as _s

    legacy = (
        b"CMS1"
        + _s.pack("<IIq", small.width, small.depth, small.total)
        + small.table.tobytes()
    )
    assert np.array_equal(CountMin.from_bytes(legacy).table, small.table)


def test_bloom_sparse_wire_format():
    """Lightly-filled filters serialize SPARSE, round-trip exactly,
    merge identically through the wire; heavily-filled stay dense;
    legacy dense blobs still parse."""
    small = BloomFilter(n_bits=1 << 20).add(
        np.array([f"u{i}" for i in range(50)], dtype=object)
    )
    b = small.to_bytes()
    assert b[:4] == b"BLMS" and len(b) < 3_000
    rt = BloomFilter.from_bytes(b)
    assert (
        rt.n_bits == small.n_bits
        and rt.n_hashes == small.n_hashes
        and np.array_equal(rt.bits, small.bits)
    )
    assert rt.to_bytes() == b
    big = BloomFilter(n_bits=1 << 14, n_hashes=7).add(
        np.arange(20_000).astype(str).astype(object)
    )
    bb = big.to_bytes()
    assert bb[:4] == b"BLM1" and len(bb) == 14 + (1 << 14) // 8
    assert np.array_equal(BloomFilter.from_bytes(bb).bits, big.bits)
    sm2 = BloomFilter(n_bits=1 << 14, n_hashes=7).add(
        np.array(["a", "b"], dtype=object)
    )
    m1 = BloomFilter.from_bytes(sm2.to_bytes()).merge(BloomFilter.from_bytes(bb))
    m2 = sm2.merge(big)
    assert np.array_equal(m1.bits, m2.bits)
    assert bool(m1.might_contain(np.array(["a"], dtype=object))[0])
    import struct as _s

    legacy = (
        b"BLM1" + _s.pack("<QH", small.n_bits, small.n_hashes) + small.bits.tobytes()
    )
    assert np.array_equal(BloomFilter.from_bytes(legacy).bits, small.bits)
