"""Count-min sketch — pure numpy, mergeable (elementwise add).

Companion sketch required by the north_rule (SURVEY.md §2.8); design
per Cormode–Muthukrishnan 2005: depth d = ceil(ln 1/delta) rows,
width w = ceil(e / eps) counters; point query = min over rows;
guarantees est >= true and est <= true + eps*N with prob 1 - delta.
Merge = elementwise sum (exact, associative, commutative — same
Monoid shape as the reference digest merge, ``Tree/Internal.hs:65-77``).
Includes a conservative heavy-hitters helper (track-candidates pass).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from tdigest_spark.sketch.hashing import hash64

__all__ = ["CountMin"]

_MAGIC = b"CMS1"
_MAGIC_SPARSE = b"CMSS"


@dataclass
class CountMin:
    width: int = 2048
    depth: int = 5
    table: np.ndarray = field(default=None)  # type: ignore[assignment]
    total: int = 0

    def __post_init__(self) -> None:
        if self.table is None:
            self.table = np.zeros((self.depth, self.width), dtype=np.int64)

    @classmethod
    def for_error(cls, eps: float = 0.001, delta: float = 0.01) -> "CountMin":
        """eps: additive error as fraction of stream length N; delta:
        failure probability."""
        return cls(
            width=int(math.ceil(math.e / eps)),
            depth=int(math.ceil(math.log(1.0 / delta))),
        )

    def _rows_idx(self, values) -> np.ndarray:
        """(depth, n) column indices — one independent hash family per row."""
        return np.stack(
            [hash64(values, seed=r) % np.uint64(self.width) for r in range(self.depth)]
        ).astype(np.int64)

    def add(self, values, counts=None) -> "CountMin":
        """Vectorized batch update; pre-aggregates duplicates first so
        the scatter-add touches each (row, col) once per distinct key."""
        vals = np.asarray(values, dtype=object)
        if counts is None:
            uniq, cnt = np.unique(vals, return_counts=True)
        else:
            uniq, cnt = vals, np.asarray(counts, dtype=np.int64)
        if len(uniq) == 0:
            return self
        idx = self._rows_idx(uniq)
        for r in range(self.depth):
            np.add.at(self.table[r], idx[r], cnt)
        self.total += int(cnt.sum())
        return self

    def query(self, values) -> np.ndarray:
        """Vectorized point query -> int64 estimates (>= true count)."""
        idx = self._rows_idx(values)
        ests = np.stack([self.table[r][idx[r]] for r in range(self.depth)])
        return ests.min(axis=0)

    def merge(self, other: "CountMin") -> "CountMin":
        if self.width != other.width or self.depth != other.depth:
            raise ValueError("count-min geometry mismatch")
        return CountMin(
            self.width, self.depth, self.table + other.table, self.total + other.total
        )

    def eps_bound(self) -> float:
        """Additive error bound eps*N (holds with prob 1 - delta)."""
        return math.e / self.width * self.total

    def inner_product(self, other: "CountMin") -> int:
        """Equi-join size estimate: sum_k f_self(k) * f_other(k)
        (Cormode-Muthukrishnan 2005 Thm 3) = min over rows of the
        row-wise table dot product. One-sided like the point query:
        est >= true, and est <= true + eps * N_self * N_other with
        prob 1 - delta. Both sketches must share geometry (and hence
        this module's fixed per-row hash family)."""
        if self.width != other.width or self.depth != other.depth:
            raise ValueError("count-min geometry mismatch")
        return int(
            min(
                int(np.dot(self.table[r], other.table[r]))
                for r in range(self.depth)
            )
        )

    def inner_product_bound(self, other: "CountMin") -> float:
        """The eps * N_self * N_other additive overcount bound."""
        return math.e / self.width * self.total * other.total

    # ---------------- wire format ----------------

    def to_bytes(self) -> bytes:
        """Dense (magic ``CMS1``: header + d*w int64 counters) or
        SPARSE (``CMSS``: header + nnz + flat uint32 indices + int64
        counts), whichever is smaller — the same wire-level idea as
        the HLL sparse format (``hll.py``). Each distinct key touches
        ``depth`` counters, so a group with 100 distinct values ships
        ~6 KB instead of the 80 KB dense table (default 5×2048) on the
        partial-stage shuffle. The format choice is a pure function of
        the table STATE, so byte-parity invariants (streamed ==
        batch-built tables) are unaffected; in-memory state stays
        dense either way."""
        nz = np.flatnonzero(self.table)
        dense_payload = 8 * self.depth * self.width
        if self.depth * self.width < 1 << 32 and 4 + 12 * nz.size < dense_payload:
            return (
                _MAGIC_SPARSE
                + struct.pack("<IIqI", self.width, self.depth, self.total, nz.size)
                + nz.astype(np.uint32).tobytes()
                + self.table.ravel()[nz].tobytes()
            )
        return (
            _MAGIC
            + struct.pack("<IIq", self.width, self.depth, self.total)
            + self.table.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        if b[:4] == _MAGIC_SPARSE:
            w, d, tot, n = struct.unpack("<IIqI", b[4:24])
            idx = np.frombuffer(b[24 : 24 + 4 * n], dtype=np.uint32).astype(np.int64)
            flat = np.zeros(d * w, dtype=np.int64)
            flat[idx] = np.frombuffer(b[24 + 4 * n : 24 + 12 * n], dtype=np.int64)
            return cls(w, d, flat.reshape(d, w), tot)
        assert b[:4] == _MAGIC, "bad CMS blob"
        w, d, tot = struct.unpack("<IIq", b[4:20])
        table = np.frombuffer(b[20:], dtype=np.int64).reshape(d, w).copy()
        return cls(w, d, table, tot)
