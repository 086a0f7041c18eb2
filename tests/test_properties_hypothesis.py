"""QuickCheck-style property tests via hypothesis, mirroring the
reference's tasty/QuickCheck layer (``tdigest/tests/Tests.hs:13-35``):
arbitrary inputs -> structural invariants hold. Pure numpy cores only
(fast, no Spark session).
"""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from tdigest_spark.sketch.kll import KLL
from tdigest_spark.sketch.tdigest import TDigest

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
small_delta = st.integers(min_value=2, max_value=50)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=1, max_size=300), small_delta)
def test_tdigest_is_valid(xs, delta):
    """propTDigestIsValid (Tests.hs:19-24): any input + any small delta
    -> the digest passes validate and conserves weight exactly."""
    d = TDigest.from_values(np.array(xs), delta).compressed()
    d.validate()
    assert d.total_weight == len(xs)
    assert d.vmin == min(xs) and d.vmax == max(xs)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=1, max_size=300), small_delta)
def test_histogram_is_valid(xs, delta):
    """propHistogramIsValid (Tests.hs:27-35 /
    Postprocess/Internal.hs:169-178): bins chain with no gaps and
    cumulative weights accumulate exactly."""
    d = TDigest.from_values(np.array(xs), delta).compressed()
    bins = d.histogram()
    cum = 0.0
    prev_hi = None
    for lo, hi, _mid, w, cw in bins:
        assert lo <= hi
        if prev_hi is not None:
            assert lo == prev_hi  # no gap
        assert cw == cum or math.isclose(cw, cum, rel_tol=1e-9, abs_tol=1e-9)
        cum += w
        prev_hi = hi
    assert math.isclose(cum, d.total_weight, rel_tol=1e-9)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=200),
    st.lists(finite, min_size=1, max_size=200),
    small_delta,
)
def test_merge_conserves_and_bounds(xs, ys, delta):
    """Semigroup laws within bound (Tree/Internal.hs:65-77): merge
    conserves weight/min/max, and quantiles stay inside [vmin, vmax]."""
    a = TDigest.from_values(np.array(xs), delta)
    b = TDigest.from_values(np.array(ys), delta)
    m = a.merge(b).compressed()
    m.validate()
    assert m.total_weight == len(xs) + len(ys)
    assert m.vmin == min(min(xs), min(ys))
    assert m.vmax == max(max(xs), max(ys))
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        v = m.quantile(q)
        assert m.vmin - 1e-9 <= v <= m.vmax + 1e-9


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=2, max_size=300), small_delta)
def test_cdf_is_monotone(xs, delta):
    d = TDigest.from_values(np.array(xs), delta).compressed()
    lo, hi = d.vmin, d.vmax
    probes = np.linspace(lo - 1.0, hi + 1.0, 25)
    cdfs = [d.cdf(float(x)) for x in probes]
    assert all(b >= a - 1e-12 for a, b in zip(cdfs, cdfs[1:]))
    assert cdfs[0] == 0.0 and cdfs[-1] == 1.0


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=1, max_size=300), st.integers(8, 64))
def test_kll_weight_conservation(xs, k):
    s = KLL(k=k).add(np.array(xs))
    _v, w = s._items()
    assert float(w.sum()) == len(xs)
    assert s.n == len(xs)
    for q in (0.0, 0.5, 1.0):
        v = s.quantile(q)
        assert s.vmin - 1e-9 <= v <= s.vmax + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.lists(finite, min_size=1, max_size=150),
    st.lists(st.integers(1, 30), min_size=1, max_size=150),
    st.integers(16, 64),
)
def test_kll_weighted_conservation(xs, ws, k):
    n = min(len(xs), len(ws))
    v, w = np.array(xs[:n]), np.array(ws[:n], dtype=np.int64)
    s = KLL(k=k).add_weighted(v, w)
    _iv, iw = s._items()
    assert float(iw.sum()) == float(w.sum())
    assert s.n == int(w.sum())


# ---------------------------------------------------------------- HLL / Bloom / CMS
from tdigest_spark.sketch.bloom import BloomFilter
from tdigest_spark.sketch.cms import CountMin
from tdigest_spark.sketch.hll import HLL

keys = st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=200)


@settings(max_examples=40, deadline=None)
@given(keys, keys)
def test_hll_merge_equals_union(xs, ys):
    """HLL register-max merge == sketching the union (order-free)."""
    a = HLL(10).add(np.array(xs, dtype=object))
    b = HLL(10).add(np.array(ys, dtype=object))
    u = HLL(10).add(np.array(xs + ys, dtype=object))
    assert a.merge(b).estimate() == u.estimate()
    assert b.merge(a).estimate() == u.estimate()  # commutative


@settings(max_examples=40, deadline=None)
@given(keys, keys)
def test_bloom_no_false_negatives_property(xs, ys):
    bf = BloomFilter(n_bits=1 << 14, n_hashes=5).add(np.array(xs, dtype=object))
    assert bf.might_contain(np.array(xs, dtype=object)).all()
    m = bf.merge(BloomFilter(n_bits=1 << 14, n_hashes=5).add(np.array(ys, dtype=object)))
    assert m.might_contain(np.array(xs + ys, dtype=object)).all()


@settings(max_examples=40, deadline=None)
@given(keys)
def test_cms_one_sided_property(xs):
    """CMS estimates never undercount; merge preserves totals."""
    from collections import Counter

    cm = CountMin.for_error(eps=0.01, delta=0.01)
    uniq, cnt = np.unique(np.array(xs, dtype=object), return_counts=True)
    cm.add(uniq, cnt)
    true = Counter(xs)
    est = cm.query(uniq)
    for v, e in zip(uniq, est):
        assert e >= true[v]
    assert cm.total == len(xs)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=2, max_size=200), st.integers(8, 64))
def test_kll_cdf_is_monotone(xs, k):
    s = KLL(k=k).add(np.array(xs))
    probes = np.linspace(s.vmin - 1.0, s.vmax + 1.0, 25)
    cdfs = [s.cdf(float(x)) for x in probes]
    assert all(b >= a - 1e-12 for a, b in zip(cdfs, cdfs[1:]))
    assert cdfs[0] == 0.0 and cdfs[-1] == 1.0


# ---------------------------------------------------------- Misra-Gries

from tdigest_spark.operators.topk import _mg_add_batch  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=400),
    st.integers(2, 12),
    st.lists(st.integers(1, 50), min_size=1, max_size=8),
)
def test_misra_gries_interval_invariant(vals, cap, cuts):
    """For ANY chunking of ANY stream: every key's true count lies in
    [residual, residual + dec_total]; dec_total never exceeds the
    classic n // (cap + 1); the summary never holds more than cap
    counters — the invariants stateful_topk_stream's error interval
    is built on."""
    import pandas as pd

    keys = [f"k{v}" for v in vals]
    # cuts -> deterministic chunk boundaries within the stream
    bounds = sorted({min(len(keys), c) for c in cuts})
    chunks, prev = [], 0
    for b in bounds + [len(keys)]:
        if b > prev:
            chunks.append(keys[prev:b])
            prev = b
    counts: dict[str, int] = {}
    dec = 0
    for ch in chunks:
        dec += _mg_add_batch(counts, pd.Series(ch, dtype=object), cap)
        assert len(counts) <= cap
    n = len(keys)
    assert dec <= n // (cap + 1)
    true = pd.Series(keys, dtype=object).value_counts().to_dict()
    for k in set(true) | set(counts):
        res = counts.get(k, 0)
        assert res <= true.get(k, 0) <= res + dec, (k, res, true.get(k), dec)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite, min_size=1, max_size=300), small_delta)
def test_cdf_many_matches_scalar(xs, delta):
    """Vectorized cdf_many must agree with the scalar cdf everywhere:
    data values, centroid atoms, support endpoints, out-of-range."""
    d = TDigest.from_values(np.array(xs, dtype=float), delta)
    probes = np.concatenate(
        [np.array(xs, dtype=float), d.means, [d.vmin, d.vmax, d.vmin - 1.0, d.vmax + 1.0]]
    )
    vec = d.cdf_many(probes)
    for x, c in zip(probes, vec):
        assert abs(d.cdf(float(x)) - c) < 1e-12
