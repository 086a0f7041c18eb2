"""Bloom filter — pure numpy, mergeable (bitwise OR).

Companion sketch required by the north_rule (SURVEY.md §2.8); design
per Bloom 1970 with Kirsch–Mitzenmacher double hashing
(h_i = h1 + i*h2). No false negatives; false-positive probability
~ (1 - e^{-kn/m})^k. Merge = OR (exact, associative, commutative —
same Monoid shape as the reference digest merge,
``Tree/Internal.hs:65-77``).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field

import numpy as np

from tdigest_spark.sketch.hashing import hash_pair

__all__ = ["BloomFilter"]

_MAGIC = b"BLM1"
_MAGIC_SPARSE = b"BLMS"


@dataclass
class BloomFilter:
    n_bits: int = 1 << 20
    n_hashes: int = 7
    bits: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.bits is None:
            self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 0.01) -> "BloomFilter":
        """Size for ~n distinct items at false-positive rate fpp."""
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        k = max(1, round(m / max(n, 1) * math.log(2)))
        return cls(n_bits=m, n_hashes=min(k, 16))

    def _positions(self, values) -> np.ndarray:
        h1, h2 = hash_pair(values)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)).ravel()

    def add(self, values) -> "BloomFilter":
        """Vectorized batch insert (k x batch positions in one shot)."""
        pos = self._positions(values)
        np.bitwise_or.at(
            self.bits, (pos >> np.uint64(3)).astype(np.int64), np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8))
        )
        return self

    def might_contain(self, values) -> np.ndarray:
        """Vectorized membership probe -> bool array."""
        n = len(values)
        pos = self._positions(values).reshape(self.n_hashes, n)
        byte = (pos >> np.uint64(3)).astype(np.int64)
        bit = (pos & np.uint64(7)).astype(np.uint8)
        hit = (self.bits[byte] >> bit) & np.uint8(1)
        return np.all(hit.astype(bool), axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if self.n_bits != other.n_bits or self.n_hashes != other.n_hashes:
            raise ValueError("Bloom geometry mismatch")
        return BloomFilter(self.n_bits, self.n_hashes, np.bitwise_or(self.bits, other.bits))

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits)[: self.n_bits].mean())

    def expected_fpp(self) -> float:
        """Observed-fill estimate of current false-positive probability."""
        return float(self.fill_ratio() ** self.n_hashes)

    # ---------------- wire format ----------------

    def to_bytes(self) -> bytes:
        """Dense (magic ``BLM1``: header + packed bit array) or SPARSE
        (``BLMS``: header + count + uint32 indices of nonzero BYTES +
        their byte values), whichever is smaller — same wire-level
        idea as the HLL/CMS sparse formats. A lightly-filled filter
        (few distinct values in a group, or a large filter early in a
        stream) ships ~5 bytes per set byte instead of n_bits/8. The
        choice is a pure function of the bit STATE, so byte-parity
        invariants are unaffected; in-memory state stays dense."""
        nz = np.flatnonzero(self.bits)
        if self.bits.size < 1 << 32 and 4 + 5 * nz.size < self.bits.size:
            return (
                _MAGIC_SPARSE
                + struct.pack("<QHI", self.n_bits, self.n_hashes, nz.size)
                + nz.astype(np.uint32).tobytes()
                + self.bits[nz].tobytes()
            )
        return _MAGIC + struct.pack("<QH", self.n_bits, self.n_hashes) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        if b[:4] == _MAGIC_SPARSE:
            n_bits, k, n = struct.unpack("<QHI", b[4:18])
            idx = np.frombuffer(b[18 : 18 + 4 * n], dtype=np.uint32).astype(np.int64)
            bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)
            bits[idx] = np.frombuffer(b[18 + 4 * n : 18 + 5 * n], dtype=np.uint8)
            return cls(n_bits, k, bits)
        assert b[:4] == _MAGIC, "bad Bloom blob"
        n_bits, k = struct.unpack("<QH", b[4:14])
        return cls(n_bits, k, np.frombuffer(b[14:], dtype=np.uint8).copy())
