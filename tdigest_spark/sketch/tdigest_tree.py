"""Tree-variant t-digest kernel: the reference's weight-balanced-BST
digest, re-implemented from its published semantics.

This closes the last two reference-surface rows that the production
merging kernel subsumes rather than reproduces:

* ``insertCentroid`` — descend the BST comparing means, merge the
  incoming centroid into the nearest non-full node up to the k0
  threshold ``4·n·q·(1−q)/δ``, and spill any remainder back in as a
  brand-new node (reference ``Tree/Internal.hs:155-239``).
* tree ``forceCompress`` — linearize with a per-centroid "space left"
  key ``thr − w``, reinsert fullest-first (``Tree/Internal.hs:338-372``),
  gated by ``compress``'s dual size bound ``size > 25·δ && size > 1000``
  (``Tree/Internal.hs:327-335``, params ``:386-403``).

It is NOT the production path — Spark aggregation uses the vectorized
merging kernel in ``tdigest.py`` (the reference's own vector variant
makes the same trade, ``Vector/Internal.hs:142-167``). This kernel
exists for full API parity and because the reference ships executable
goldens for it: the doctests in ``Tree.hs:12-76`` pin exact quantiles
and exact post-compression tree SIZES, which ``tests/test_tdigest_tree.py``
reproduces — cross-implementation evidence no property test can give.

Scale note: single-node only by design. The distributed story is the
merging kernel's partial/final UDAF; this module's role at 100 TB is
as a driver-side verification oracle (its digests are exchangeable
with the vector kernel via ``centroids()``/``from_centroids``).
"""

from __future__ import annotations

import math
from typing import Iterable, Sequence

# Hard-coded reference params (Tree/Internal.hs:386-403)
REL_MAX_SIZE = 25
ABS_MAX_SIZE = 1000
BAL_OMEGA = 3
BAL_ALPHA = 2


class _Node:
    """One BST node: subtree size, mean, weight, subtree total weight,
    children (reference ``data TDigest = Node Size Mean Weight Weight
    TDigest TDigest | Nil``, ``Tree/Internal.hs:41-49``). ``None`` is Nil.
    """

    __slots__ = ("s", "x", "w", "tw", "l", "r")

    def __init__(self, s: int, x: float, w: float, tw: float,
                 l: "_Node | None", r: "_Node | None") -> None:
        self.s = s
        self.x = x
        self.w = w
        self.tw = tw
        self.l = l
        self.r = r


def _size(t: _Node | None) -> int:
    return 0 if t is None else t.s


def _total(t: _Node | None) -> float:
    return 0.0 if t is None else t.tw


def _node(x: float, w: float, l: _Node | None, r: _Node | None) -> _Node:
    # 'node' smart constructor (Tree/Internal.hs:243-249)
    return _Node(1 + _size(l) + _size(r), x, w,
                 w + _total(l) + _total(r), l, r)


def _sing(x: float, w: float) -> _Node:
    return _Node(1, x, w, w, None, None)


def _minimum(t: _Node) -> float:
    while t.l is not None:
        t = t.l
    return t.x


def _maximum(t: _Node) -> float:
    while t.r is not None:
        t = t.r
    return t.x


def _balance_r(x: float, w: float, l: _Node | None, r: _Node | None) -> _Node:
    """Rebalance after a right insertion (Tree/Internal.hs:250-267);
    weight-balanced rotations with omega=3, alpha=2."""
    if _size(l) + _size(r) <= 1:
        return _node(x, w, l, r)
    if _size(r) > BAL_OMEGA * _size(l):
        assert r is not None
        rl, rr = r.l, r.r
        if rl is None or _size(rl) < BAL_ALPHA * _size(rr):
            # single left rotation
            return _node(r.x, r.w, _node(x, w, l, rl), rr)
        # double rotation through r.l
        return _node(rl.x, rl.w, _node(x, w, l, rl.l),
                     _node(r.x, r.w, rl.r, rr))
    return _node(x, w, l, r)


def _balance_l(x: float, w: float, l: _Node | None, r: _Node | None) -> _Node:
    """Mirror of :func:`_balance_r` (Tree/Internal.hs:269-285)."""
    if _size(l) + _size(r) <= 1:
        return _node(x, w, l, r)
    if _size(l) > BAL_OMEGA * _size(r):
        assert l is not None
        ll, lr = l.l, l.r
        if lr is None or _size(lr) < BAL_ALPHA * _size(ll):
            # single right rotation
            return _node(l.x, l.w, ll, _node(x, w, lr, r))
        # double rotation through l.r
        return _node(lr.x, lr.w, _node(l.x, l.w, ll, lr.l),
                     _node(x, w, lr.r, r))
    return _node(x, w, l, r)


def _threshold(n: float, q: float, compression: float) -> float:
    # k0 scale bound 4·n·q·(1−q)/δ (Tree/Internal.hs:306-313)
    return 4.0 * n * q * (1.0 - q) / compression


def _insert_centroid(td: _Node | None, mean: float, weight: float,
                     compression: float, literal: bool = False) -> _Node:
    """The reference's core weighted insert (Tree/Internal.hs:155-239).

    Descend comparing means. An exact mean match absorbs the whole
    weight unconditionally. A node at or over its k0 threshold is
    passed through. Otherwise the incoming centroid merges into the
    current node when the current node is strictly nearer than the
    in-order neighbor on the incoming side (or that side is empty),
    taking at most the node's remaining room ``thr − w``; any
    remainder re-descends with the everything-as-is flag set and lands
    as a brand-new node. ``n`` (the post-insert total) is fixed once
    per call, exactly as the reference closes over it.

    ``literal=True`` evaluates combinedCentroid's weighted-mean formula
    literally as the reference does — see the LT-branch note.
    """
    if td is None:
        return _sing(mean, weight)
    n = td.tw + weight

    def go(cum: float, new_x: float, new_w: float, e: bool,
           t: _Node | None) -> _Node:
        if t is None:
            return _sing(new_x, new_w)
        s, x, w, tw, l, r = t.s, t.x, t.w, t.tw, t.l, t.r
        if new_x == x:
            # exact match: no threshold check (Tree/Internal.hs:181)
            return _Node(s, x, w + new_w, tw + new_w, l, r)
        cum_l = cum + _total(l)
        thr = _threshold(n, (w / 2.0 + cum_l) / n, compression)
        if new_x < x:
            if thr <= w or e:
                return _balance_l(x, w, go(cum, new_x, new_w, e, l), r)
            # room bookkeeping, forced only on merge branches
            # (the reference's lazy (dw, mrw) pair, :228-236)
            diff = w + new_w - thr
            if diff < 0:
                dw, mrw = new_w, None
            else:
                dw, mrw = thr - w, diff
            nw = w + dw
            # combinedCentroid x w x dw (:295-303) is always called with
            # the node's OWN mean, so nx == x identically in real
            # arithmetic — but the reference evaluates the literal
            # (x*w + x*dw)/(w+dw), which can drift an ulp (its comment
            # admits "probably not num. stable", :300). The drift is
            # BEHAVIORAL: later exact-value inserts miss the EQ match,
            # so tree sizes differ — the Tree.hs:68-76 size goldens
            # (78/78/48) only reproduce with the literal form. It is
            # also a real defect: on duplicate-heavy data the drift
            # manufactures equal-mean neighbor nodes that violate the
            # reference's own strict-ordering validate. Default is the
            # hardened exact form (as the vector kernel hardens the
            # same function); literal=True restores bit-parity.
            nx = (x * w + x * dw) / nw if literal else x
            if l is None:
                if mrw is None:
                    return _Node(s, nx, nw, tw + new_w, None, r)
                return _balance_l(nx, nw, go(cum, new_x, mrw, True, None), r)
            lmax = _maximum(l)
            if lmax < new_x and abs(new_x - x) < abs(new_x - lmax):
                if mrw is None:
                    return _Node(s, nx, nw, tw + nw - w, l, r)
                return _balance_l(nx, nw, go(cum, new_x, mrw, True, l), r)
            return _balance_l(x, w, go(cum, new_x, new_w, e, l), r)
        else:
            if thr <= w or e:
                return _balance_r(x, w, l,
                                  go(cum_l + w, new_x, new_w, e, r))
            diff = w + new_w - thr
            if diff < 0:
                dw, mrw = new_w, None
            else:
                dw, mrw = thr - w, diff
            nw = w + dw
            nx = (x * w + x * dw) / nw if literal else x  # see LT note
            if r is None:
                if mrw is None:
                    return _Node(s, nx, nw, tw + new_w, l, None)
                return _balance_r(nx, nw, l,
                                  go(cum + _total(l) + nw, new_x, mrw,
                                     True, None))
            rmin = _minimum(r)
            if rmin > new_x and abs(new_x - x) < abs(new_x - rmin):
                if mrw is None:
                    return _Node(s, nx, nw, tw + new_w, l, r)
                return _balance_r(nx, nw, l,
                                  go(cum + _total(l) + nw, new_x, mrw,
                                     True, r))
            return _balance_r(x, w, l, go(cum_l + w, new_x, new_w, e, r))

    return go(0.0, mean, weight, False, td)


def _centroids(t: _Node | None, acc: list | None = None) -> list:
    """In-order (mean, weight) list (getCentroids, Tree/Internal.hs:95-99)."""
    if acc is None:
        acc = []
    if t is not None:
        _centroids(t.l, acc)
        acc.append((t.x, t.w))
        _centroids(t.r, acc)
    return acc


def _va_max_child(a: list, key_ix: int, child: int, length: int) -> int:
    """Index of the max among up to four children starting at ``child``
    in a quaternary heap; ties pick the earliest child (vector-algorithms
    ``Data.Vector.Algorithms.Heap.maximumChild``)."""
    c2, c3, c4 = child + 1, child + 2, child + 3
    if c4 < length:
        k1, k2, k3, k4 = (a[child][key_ix], a[c2][key_ix],
                          a[c3][key_ix], a[c4][key_ix])
        if k1 < k2:
            if k2 < k3:
                return c4 if k3 < k4 else c3
            return c4 if k2 < k4 else c2
        if k1 < k3:
            return c4 if k3 < k4 else c3
        return c4 if k1 < k4 else child
    if c3 < length:
        k1, k2, k3 = a[child][key_ix], a[c2][key_ix], a[c3][key_ix]
        if k1 < k2:
            return c3 if k2 < k3 else c2
        return c3 if k1 < k3 else child
    if c2 < length:
        return c2 if a[child][key_ix] < a[c2][key_ix] else child
    return child


def _va_heapsort(a: list, key_ix: int) -> None:
    """In-place ascending heapsort replicating vector-algorithms'
    quaternary-heap ``Data.Vector.Algorithms.Heap.sortBy`` — the sort
    the reference's ``forceCompress`` calls (Tree/Internal.hs:341-349).
    Being unstable, its permutation of TIED keys differs from a stable
    sort; replicating it is what makes the reference's forceCompress
    doctest goldens reproduce bit-for-bit."""
    n = len(a)
    if n < 2:
        return
    if n <= 4:
        a.sort(key=lambda t: t[key_ix])
        return

    def sift(val: tuple, root: int, length: int) -> None:
        while True:
            child = (root << 2) + 1
            if child >= length:
                a[root] = val
                return
            c = _va_max_child(a, key_ix, child, length)
            if val[key_ix] < a[c][key_ix]:
                a[root] = a[c]
                root = c
            else:
                a[root] = val
                return

    for k in range((n - 1) >> 2, -1, -1):  # heapify
        sift(a[k], k, n)
    # sortHeap l=0 m=4: pop the max into k for k = n-1 .. 5, then swap
    # the remaining root with position 4 and small-sort the first four
    for k in range(n - 1, 4, -1):
        displaced = a[k]
        a[k] = a[0]
        sift(displaced, 0, k)
    a[0], a[4] = a[4], a[0]
    a[0:4] = sorted(a[0:4], key=lambda t: t[key_ix])


def _force_compress(td: _Node | None, compression: float,
                    literal: bool = False) -> _Node | None:
    """Flatten with per-centroid space-left ``thr − w``, heap-sort
    fullest-first with the reference's exact (unstable) quaternary
    heapsort, reinsert everything (Tree/Internal.hs:338-372)."""
    if td is None:
        return None
    n = td.tw
    items: list[tuple[float, float, float]] = []

    def walk(t: _Node | None, cum: float) -> float:
        if t is None:
            return cum
        cum = walk(t.l, cum)
        thr = _threshold(n, (t.w / 2.0 + cum) / n, compression)
        items.append((t.x, t.w, thr - t.w))
        return walk(t.r, cum + t.w)

    walk(td, 0.0)
    _va_heapsort(items, 2)
    out: _Node | None = None
    for x, w, _sp in items:
        out = _insert_centroid(out, x, w, compression, literal)
    return out


def _compress(td: _Node | None, compression: float,
              literal: bool = False) -> _Node | None:
    # dual size gate (Tree/Internal.hs:327-335)
    if td is not None and td.s > REL_MAX_SIZE * compression \
            and td.s > ABS_MAX_SIZE:
        return _force_compress(td, compression, literal)
    return td


# ---------------------------------------------------------------------------
# Postprocess over the in-order centroid list — the reference shares one
# histogram-based postprocess between variants (Tree/Internal.hs:91-93
# routes through histogramFromCentroids, Postprocess/Internal.hs:70-90).
# ---------------------------------------------------------------------------


def _hist_bins(cents: Sequence[tuple[float, float]]
               ) -> list[tuple[float, float, float, float, float]]:
    """(lo, hi, value, weight, cum-weight-before) bins between centroid
    midpoints (histogramFromCentroids, Postprocess/Internal.hs:70-90)."""
    k = len(cents)
    if k == 0:
        return []
    if k == 1:
        x, w = cents[0]
        return [(x, x, x, w, 0.0)]
    bins = []
    t = 0.0
    for i, (x, w) in enumerate(cents):
        lo = x if i == 0 else (cents[i - 1][0] + x) / 2.0
        hi = x if i == k - 1 else (x + cents[i + 1][0]) / 2.0
        bins.append((lo, hi, x, w, t))
        t += w
    return bins


def _hist_quantile(q: float, tw: float,
                   bins: Sequence[tuple[float, float, float, float, float]]
                   ) -> float:
    # Postprocess/Internal.hs:97-106: q' = q·tw, interpolate in the
    # first bin whose [t, t+w) covers it; the last bin always answers.
    qw = q * tw
    for i, (a, b, _x, w, t) in enumerate(bins):
        if i == len(bins) - 1 or qw < t + w:
            return a + (b - a) * (qw - t) / w
    raise ValueError("empty histogram")


def _hist_cdf(x: float, n: float,
              bins: Sequence[tuple[float, float, float, float, float]]
              ) -> float:
    # Postprocess/Internal.hs:153-162
    for (a, b, _v, w, t) in bins:
        if x < a:
            return 0.0
        if x < b:
            return (t + w * (x - a) / (b - a)) / n
    return 1.0


class TDigestTree:
    """Public wrapper over the weight-balanced tree digest.

    ``compression`` is the reference's type-level nat (1/δ in its
    comment, e.g. ``TDigest 25`` → ``compression=25``).
    """

    __slots__ = ("compression", "_root", "literal_combine")

    def __init__(self, compression: float = 100.0,
                 _root: _Node | None = None,
                 literal_combine: bool = False) -> None:
        """``literal_combine=True`` evaluates combinedCentroid's
        weighted-mean formula literally like the reference, whose
        floating-point drift is behavioral (tree sizes differ) — needed
        to reproduce the Tree.hs doctest size goldens bit-for-bit, but
        it can break strict mean ordering on duplicate-heavy data.
        Default is the hardened exact form."""
        if compression <= 0:
            raise ValueError("compression must be positive")
        self.compression = float(compression)
        self._root = _root
        self.literal_combine = bool(literal_combine)

    # -- construction / population (Tree/Internal.hs:452-485) --------

    @classmethod
    def from_values(cls, values: Iterable[float],
                    compression: float = 100.0,
                    literal_combine: bool = False) -> "TDigestTree":
        """Bulk build: deferred inserts in 1000-element chunks with a
        compress after each chunk (tdigest, Tree/Internal.hs:475-485).
        """
        d = cls(compression, literal_combine=literal_combine)
        lit = d.literal_combine
        root = d._root
        i = 0
        for v in values:
            root = _insert_centroid(root, float(v), 1.0, d.compression, lit)
            i += 1
            if i == 1000:
                root = _compress(root, d.compression, lit)
                i = 0
        if i:
            root = _compress(root, d.compression, lit)
        d._root = root
        return d

    @classmethod
    def singleton(cls, x: float,
                  compression: float = 100.0) -> "TDigestTree":
        # Tree/Internal.hs:471-472
        return cls(compression).insert(x)

    @classmethod
    def from_centroids(cls, cents: Iterable[tuple[float, float]],
                       compression: float = 100.0,
                       literal_combine: bool = False) -> "TDigestTree":
        """Rebuild from (mean, weight) pairs via insertCentroid — the
        interop path to/from the vector kernel's ``centroids()``."""
        d = cls(compression, literal_combine=literal_combine)
        lit = d.literal_combine
        root = d._root
        for x, w in cents:
            root = _insert_centroid(root, float(x), float(w),
                                    d.compression, lit)
        d._root = _compress(root, d.compression, lit)
        return d

    def insert(self, x: float) -> "TDigestTree":
        """compress ∘ insert' (Tree/Internal.hs:452-457)."""
        lit = self.literal_combine
        return TDigestTree(
            self.compression,
            _compress(_insert_centroid(self._root, float(x), 1.0,
                                       self.compression, lit),
                      self.compression, lit),
            literal_combine=lit)

    def insert_deferred(self, x: float) -> "TDigestTree":
        """insert' — no compression, may grow linearly
        (Tree/Internal.hs:463-468)."""
        return TDigestTree(
            self.compression,
            _insert_centroid(self._root, float(x), 1.0, self.compression,
                             self.literal_combine),
            literal_combine=self.literal_combine)

    def insert_centroid(self, mean: float, weight: float) -> "TDigestTree":
        if weight <= 0:
            raise ValueError("weight must be positive")
        return TDigestTree(
            self.compression,
            _insert_centroid(self._root, float(mean), float(weight),
                             self.compression, self.literal_combine),
            literal_combine=self.literal_combine)

    # -- merge (Tree/Internal.hs:143-153) -----------------------------

    def merge(self, other: "TDigestTree") -> "TDigestTree":
        """combineDigest: the SMALLER tree's centroids are inserted
        into the larger (ties insert the right operand into the left),
        then compress. Not strictly associative — the reference's own
        caveat (Tree.hs:23-44), pinned by the 802/726 golden."""
        if self.compression != other.compression:
            raise ValueError("cannot merge digests with different compression")
        a, b = self._root, other._root
        if a is None:
            return other
        if b is None:
            return self
        if a.s < b.s:
            tgt, src = b, a
        else:
            tgt, src = a, b
        for x, w in _centroids(src):
            tgt = _insert_centroid(tgt, x, w, self.compression,
                                   self.literal_combine)
        return TDigestTree(self.compression,
                           _compress(tgt, self.compression,
                                     self.literal_combine),
                           literal_combine=self.literal_combine)

    def __add__(self, other: "TDigestTree") -> "TDigestTree":
        return self.merge(other)

    # -- compression ---------------------------------------------------

    def compress(self) -> "TDigestTree":
        return TDigestTree(self.compression,
                           _compress(self._root, self.compression,
                                     self.literal_combine),
                           literal_combine=self.literal_combine)

    def force_compress(self) -> "TDigestTree":
        return TDigestTree(self.compression,
                           _force_compress(self._root, self.compression,
                                           self.literal_combine),
                           literal_combine=self.literal_combine)

    # -- stats (Tree/Internal.hs:101-134, Postprocess) ------------------

    @property
    def size(self) -> int:
        return _size(self._root)

    @property
    def total_weight(self) -> float:
        return _total(self._root)

    def is_empty(self) -> bool:
        return self._root is None

    def centroids(self) -> list[tuple[float, float]]:
        return _centroids(self._root)

    def minimum_value(self) -> float | None:
        """Mean of the leftmost centroid — 'may be different than the
        min element inserted' (Tree/Internal.hs:114-134)."""
        return None if self._root is None else _minimum(self._root)

    def maximum_value(self) -> float | None:
        return None if self._root is None else _maximum(self._root)

    def quantile(self, q: float) -> float | None:
        if self._root is None:
            return None
        return _hist_quantile(q, self._root.tw,
                              _hist_bins(_centroids(self._root)))

    def median(self) -> float | None:
        return self.quantile(0.5)

    def icdf(self, q: float) -> float | None:
        return self.quantile(q)

    def cdf(self, x: float) -> float | None:
        if self._root is None:
            return None
        return _hist_cdf(float(x), self._root.tw,
                         _hist_bins(_centroids(self._root)))

    def mean(self) -> float | None:
        # Mean' semigroup fold (Postprocess/Internal.hs:113-127)
        if self._root is None:
            return None
        w_acc, x_acc = 0.0, 0.0
        for _lo, _hi, x, w, _t in _hist_bins(_centroids(self._root)):
            nw = w_acc + w
            x_acc = (x_acc * w_acc + x * w) / nw
            w_acc = nw
        return x_acc

    def variance(self) -> float | None:
        # Variance semigroup (Postprocess/Internal.hs:130-146); sample
        # variance: d / (w − 1)
        if self._root is None:
            return None
        w_acc, x_acc, d_acc = 0.0, 0.0, 0.0
        for _lo, _hi, x, w, _t in _hist_bins(_centroids(self._root)):
            nw = w_acc + w
            nx = (x_acc * w_acc + x * w) / nw
            d_acc = d_acc + w_acc * x_acc * x_acc + w * x * x - nw * nx * nx
            w_acc, x_acc = nw, nx
        if w_acc <= 1.0:
            return None
        return d_acc / (w_acc - 1.0)

    def stddev(self) -> float | None:
        # with the sqrt the reference's NonEmpty wrapper forgot
        # (Tree/NonEmpty.hs:148-149)
        v = self.variance()
        return None if v is None or v < 0 else math.sqrt(v)

    # -- validation / debug (Tree/Internal.hs:403-445) ------------------

    def validate(self) -> None:
        """Raise ValueError on any broken invariant: cached sizes,
        cached subtree weights, strict in-order means, weight balance.
        """
        def walk(t: _Node | None) -> None:
            if t is None:
                return
            if t.s != 1 + _size(t.l) + _size(t.r):
                raise ValueError("invalid sizes")
            expect = t.w + _total(t.l) + _total(t.r)
            if abs(t.tw - expect) > 1e-6 * max(1.0, abs(expect)):
                raise ValueError("invalid weights")
            if t.l is not None and not t.l.x < t.x:
                raise ValueError("invalid ordering")
            if t.r is not None and not t.x < t.r.x:
                raise ValueError("invalid ordering")
            if _size(t.l) > max(1, BAL_OMEGA * _size(t.r)) or \
                    _size(t.r) > max(1, BAL_OMEGA * _size(t.l)):
                raise ValueError("tree is ill-balanced")
            walk(t.l)
            walk(t.r)

        walk(self._root)

    def valid(self) -> bool:
        try:
            self.validate()
        except ValueError:
            return False
        return True

    def debug_print(self) -> str:
        """In-order indented dump (debugPrint, Tree/Internal.hs:403-410)."""
        lines: list[str] = []

        def go(i: int, t: _Node | None) -> None:
            if t is None:
                lines.append(" " * (3 * i) + "Nil")
                return
            go(i + 1, t.l)
            lines.append(" " * (3 * i) +
                         f"Node ({t.s},{t.x},{t.w},{t.tw})")
            go(i + 1, t.r)

        go(0, self._root)
        return "\n".join(lines)
