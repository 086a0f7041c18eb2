"""KLL quantile sketch — pure numpy, mergeable.

Companion sketch required by the north_rule (SURVEY.md §2.8); design
per Karnin–Lang–Liberty 2016 (see also KLL± , PAPERS.md): a ladder of
level buffers where level h items carry weight 2^h; a full level is
sorted and every other item promoted ("compaction"), with geometric
capacities cap(h) = max(k * c^(H-1-h), 8), c = 2/3. Rank error is
O(1/k) with small constants; compaction offsets are derived from a
deterministic counter (not a random coin) so runs are reproducible —
the same determinism-over-randomness choice the reference makes with
its alternating merge direction (``Vector/Internal.hs:34``).

Like the t-digest core (tdigest.py), an uncompacted sketch (k >= n) is
*lossless*: quantile() then reproduces SQL ``quantile_cont`` exactly,
which is what the DuckDB oracle checks; compacted operation is covered
by rank-error property tests.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["KLL"]

_MAGIC = b"KLL1"
_MIN_CAP = 8
_C = 2.0 / 3.0


@dataclass
class KLL:
    k: int = 200
    levels: list = field(default_factory=lambda: [np.empty(0, dtype=np.float64)])
    n: int = 0
    vmin: float = math.inf
    vmax: float = -math.inf
    coin: int = 0  # compaction counter -> deterministic offsets

    def _cap(self, h: int) -> int:
        height = len(self.levels)
        return max(int(math.ceil(self.k * (_C ** (height - 1 - h)))), _MIN_CAP)

    def _compact_level(self, h: int) -> None:
        buf = np.sort(self.levels[h], kind="stable")
        off = self.coin & 1
        self.coin += 1
        # odd size: one item stays behind so weight is conserved exactly
        # (2m items at weight 2^h -> m promoted items at weight 2^(h+1))
        if buf.size & 1:
            keep, buf = (buf[:1], buf[1:]) if off else (buf[-1:], buf[:-1])
        else:
            keep = buf[:0]
        promoted = buf[off::2]
        self.levels[h] = keep
        if h + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[h + 1] = np.concatenate([self.levels[h + 1], promoted])

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if self.levels[h].size > self._cap(h):
                self._compact_level(h)
            h += 1

    # ---------------- update / merge ----------------

    def add(self, values) -> "KLL":
        """Vectorized batch insert (drops NaN, SQL aggregate semantics)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress()
        return self

    def add_weighted(self, values, weights) -> "KLL":
        """Weighted batch insert (the KLL± direction, PAPERS.md): an
        item of integer weight w is decomposed over its binary digits —
        one copy at every level h whose bit is set in w, since level-h
        items carry weight 2^h. Weight-exact (no rounding), vectorized
        per bit, and compaction/merge are unchanged.

        Weights must be positive integers (rows with weight < 1 or NaN
        are dropped, SQL aggregate semantics).
        """
        v = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights, dtype=np.float64).ravel()
        ok = ~np.isnan(v) & ~np.isnan(w) & (w >= 1)
        v, w = v[ok], w[ok]
        if not np.all(w == np.floor(w)):
            raise ValueError(
                "KLL.add_weighted requires integer weights "
                "(fractional weight found — scale weights up instead)"
            )
        w = w.astype(np.int64)
        if v.size == 0:
            return self
        for h in range(int(w.max()).bit_length()):
            sel = v[(w >> h) & 1 == 1]
            if sel.size == 0:
                continue
            while h >= len(self.levels):
                self.levels.append(np.empty(0, dtype=np.float64))
            self.levels[h] = np.concatenate([self.levels[h], sel])
        self.n += int(w.sum())
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress()
        return self

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError(f"KLL k mismatch ({self.k} vs {other.k})")
        out = KLL(self.k)
        height = max(len(self.levels), len(other.levels))
        out.levels = [
            np.concatenate(
                [
                    self.levels[h] if h < len(self.levels) else np.empty(0),
                    other.levels[h] if h < len(other.levels) else np.empty(0),
                ]
            )
            for h in range(height)
        ]
        out.n = self.n + other.n
        out.vmin = min(self.vmin, other.vmin)
        out.vmax = max(self.vmax, other.vmax)
        out.coin = self.coin + other.coin
        out._compress()
        return out

    # ---------------- queries ----------------

    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        """(sorted values, weights) across all levels."""
        vs = [lv for lv in self.levels if lv.size]
        ws = [np.full(lv.size, float(1 << h)) for h, lv in enumerate(self.levels) if lv.size]
        if not vs:
            return np.empty(0), np.empty(0)
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float | None:
        """Mid-rank interpolation between retained items (same convention
        as TDigest.quantile — exact ``quantile_cont`` when lossless)."""
        return self.quantiles(np.asarray([q]))[0] if self.n else None

    def quantiles(self, qs) -> np.ndarray:
        if self.n == 0:
            return np.full(len(qs), np.nan)
        v, w = self._items()
        tw = float(w.sum())
        if v.size == 1:
            return np.full(len(qs), float(v[0]))
        centers = np.cumsum(w) - w / 2.0
        t = np.clip(np.asarray(qs, dtype=np.float64), 0, 1) * (tw - 1.0) + 0.5
        xs = np.concatenate(([0.0], centers, [tw]))
        ys = np.concatenate(([self.vmin], v, [self.vmax]))
        return np.interp(t, xs, ys)

    def cdf(self, x: float) -> float | None:
        """Mid-rank cdf estimate (matches TDigest.cdf convention)."""
        if self.n == 0:
            return None
        v, w = self._items()
        tw = float(w.sum())
        below = float(w[v < x].sum())
        at = float(w[v == x].sum())
        if at > 0:
            return (below + 0.5 * at) / tw
        if x < self.vmin:
            return 0.0
        if x > self.vmax:
            return 1.0
        centers = np.cumsum(w) - w / 2.0
        xs = np.concatenate(([self.vmin], v, [self.vmax]))
        ts = np.concatenate(([0.0], centers, [tw]))
        # tied positions are atoms with a cdf jump: leave an atom at its
        # UPPER rank, arrive at the next at its LOWER rank (same
        # monotonicity fix as TDigest.cdf)
        ux, first_idx = np.unique(xs, return_index=True)
        last_idx = np.searchsorted(xs, ux, side="right") - 1
        t_hi, t_lo = ts[last_idx], ts[first_idx]
        k = int(np.searchsorted(ux, x)) - 1
        frac = (x - ux[k]) / (ux[k + 1] - ux[k])
        return float((t_hi[k] + frac * (t_lo[k + 1] - t_hi[k])) / tw)

    def size(self) -> int:
        return int(sum(lv.size for lv in self.levels))

    # ---------------- wire format ----------------

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<IqddII", self.k, self.n, self.vmin, self.vmax, self.coin, len(self.levels)
        )
        lens = struct.pack(f"<{len(self.levels)}I", *[lv.size for lv in self.levels])
        body = b"".join(np.ascontiguousarray(lv, dtype=np.float64).tobytes() for lv in self.levels)
        return _MAGIC + head + lens + body

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        assert b[:4] == _MAGIC, "bad KLL blob"
        hsize = 4 + struct.calcsize("<IqddII")
        k, n, vmin, vmax, coin, nlv = struct.unpack("<IqddII", b[4:hsize])
        lens = struct.unpack(f"<{nlv}I", b[hsize : hsize + 4 * nlv])
        out = cls(k)
        out.n, out.vmin, out.vmax, out.coin = n, vmin, vmax, coin
        off = hsize + 4 * nlv
        levels = []
        for ln in lens:
            levels.append(np.frombuffer(b[off : off + 8 * ln], dtype=np.float64).copy())
            off += 8 * ln
        out.levels = levels or [np.empty(0, dtype=np.float64)]
        return out
