"""Bottom-k / KMV sketch: a mergeable uniform sample of DISTINCT
values plus the KMV distinct-count estimator.

Published algorithm: the k-minimum-values synopsis of Bar-Yossef et
al. 2002 ("Counting distinct elements in a data stream"); the
unbiased estimator (k-1)/U_(k) and its multiset-operation algebra are
analyzed by Beyer et al. 2007 (SIGMOD, "On synopses for
distinct-value estimation"). State is the k smallest 64-bit hashes of
the distinct values, carrying the values themselves: min-k of a union
equals the merge of min-k's, so the sketch is EXACTLY mergeable
(associative, commutative, idempotent — duplicates hash identically
and collapse), and the retained values are a uniform sample of the
distinct domain (order statistics of a uniform hash).

Why the engine wants it: at 100 TB "show me a uniform sample of each
language's distinct sources/domains" is otherwise a full
distinct-shuffle; this travels as an O(k) blob through the same
partial/merge UDAF shape as the other sketches. Relative standard
error of the estimator ~ 1/sqrt(k-2).

Hash collisions between distinct values (2^-64 per pair) conflate
those values — the standard KMV caveat, negligible at any k used here.
"""

from __future__ import annotations

import struct

import numpy as np

from tdigest_spark.sketch.hashing import hash64

_TWO64 = float(1 << 64)


class KMV:
    __slots__ = ("k", "hashes", "values")

    def __init__(self, k: int = 256):
        if k < 2:
            raise ValueError("KMV needs k >= 2 (the estimator divides by k-1)")
        self.k = int(k)
        self.hashes = np.empty(0, dtype=np.uint64)
        self.values: list[str] = []

    # ------------------------------------------------------------ build

    def add(self, vals) -> "KMV":
        """Absorb a batch of scalars (stringified upstream; the Spark
        kind casts to string so Spark and pandas render identically)."""
        import pandas as pd

        s = pd.Series(vals)
        self._absorb(hash64(s), np.asarray(s, dtype=object))
        return self

    def _absorb(self, h: np.ndarray, v: np.ndarray) -> None:
        allh = np.concatenate([self.hashes, h.astype(np.uint64, copy=False)])
        allv = np.concatenate([np.asarray(self.values, dtype=object), v])
        uh, idx = np.unique(allh, return_index=True)  # sorted, first occurrence
        keep = min(self.k, len(uh))
        self.hashes = uh[:keep].copy()
        self.values = [str(x) for x in allv[idx[:keep]]]

    # ------------------------------------------------------------ merge

    def merge(self, other: "KMV") -> "KMV":
        if other.k != self.k:
            raise ValueError(f"KMV k mismatch: {self.k} vs {other.k}")
        out = KMV(self.k)
        out._absorb(
            np.concatenate([self.hashes, other.hashes]),
            np.concatenate(
                [
                    np.asarray(self.values, dtype=object),
                    np.asarray(other.values, dtype=object),
                ]
            ),
        )
        return out

    # ------------------------------------------------------------ query

    def estimate(self) -> float:
        """Distinct-count estimate: EXACT while fewer than k distinct
        hashes were seen; (k-1)/U_(k) beyond (Beyer et al. 2007)."""
        m = len(self.hashes)
        if m < self.k:
            return float(m)
        u_k = (float(self.hashes[self.k - 1]) + 1.0) / _TWO64
        return (self.k - 1) / u_k

    def sample(self) -> list[str]:
        """Uniform sample of the DISTINCT values (hash order — i.e.
        random order with respect to the data)."""
        return list(self.values)

    def overlap(self, other: "KMV") -> tuple[float, float, float] | None:
        """(jaccard, intersection_est, union_est) against another KMV
        of the same k — the Beyer et al. 2007 multiset algebra: the k
        smallest hashes of the union, L, are a uniform sample of the
        union domain, so the fraction of L present in BOTH sketches is
        an unbiased Jaccard estimate; intersection = jaccard x union.
        EXACT whenever the union has fewer than k distinct hashes
        (both sketches then hold their full domains). None if both
        sides are empty (Jaccard undefined); (0, 0, est) if one is.
        """
        if other.k != self.k:
            raise ValueError(f"KMV k mismatch: {self.k} vs {other.k}")
        if len(self.hashes) == 0 and len(other.hashes) == 0:
            return None
        union = self.merge(other)
        u_est = union.estimate()
        ell = union.hashes  # the k smallest union hashes
        both = np.isin(ell, self.hashes) & np.isin(ell, other.hashes)
        rho = float(both.sum()) / len(ell)
        return rho, rho * u_est, u_est

    # ---------------------------------------------------------- (de)ser

    def to_bytes(self) -> bytes:
        blob = b"".join(
            struct.pack("<I", len(b)) + b
            for b in (v.encode("utf-8") for v in self.values)
        )
        return (
            struct.pack("<II", self.k, len(self.hashes))
            + self.hashes.tobytes()
            + blob
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "KMV":
        k, m = struct.unpack_from("<II", b, 0)
        out = cls(k)
        off = 8
        out.hashes = np.frombuffer(b, dtype=np.uint64, count=m, offset=off).copy()
        off += 8 * m
        vals = []
        for _ in range(m):
            (ln,) = struct.unpack_from("<I", b, off)
            off += 4
            vals.append(b[off : off + ln].decode("utf-8"))
            off += ln
        out.values = vals
        return out
