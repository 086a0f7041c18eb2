"""HyperLogLog distinct-count sketch — pure numpy, mergeable.

Companion sketch required by the north_rule (SURVEY.md §2.8); absent
from the reference (phadej/tdigest is quantiles-only), so the design
follows Flajolet et al. 2007 with the standard 64-bit-hash practice
from HLL++ (Heule et al. 2013): no large-range correction needed,
linear counting below the small-range threshold.

State = 2^p uint8 registers; update = scatter-max of leading-zero
ranks; merge = elementwise max (exact, associative, commutative —
the same Monoid shape as the reference digest's ``<>``,
``Tree/Internal.hs:65-77``). Standard error ~ 1.04/sqrt(2^p).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from tdigest_spark.sketch.hashing import hash64

__all__ = ["HLL"]

_MAGIC = b"HLL1"
_MAGIC_SPARSE = b"HLLS"


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@dataclass
class HLL:
    p: int = 12  # 4096 registers -> ~1.6% standard error
    registers: np.ndarray = field(default=None)  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.registers is None:
            self.registers = np.zeros(1 << self.p, dtype=np.uint8)

    @property
    def m(self) -> int:
        return 1 << self.p

    # ---------------- update / merge ----------------

    @staticmethod
    def idx_rho(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
        """(register index, rank) for pre-hashed uint64 values —
        exposed so batch-level GROUPED updates can hash a whole Arrow
        batch once and scatter per group (one hash call per batch
        instead of one per group)."""
        pp = np.uint64(p)
        idx = (h >> (np.uint64(64) - pp)).astype(np.int64)
        low = h & ((np.uint64(1) << (np.uint64(64) - pp)) - np.uint64(1))
        nbits = 64 - p
        # rank = leading zeros of the low bits + 1; float64 log2 is exact
        # for nbits <= 52 (p >= 12 keeps low < 2^52)
        bl = np.zeros_like(low, dtype=np.int64)
        nz = low > 0
        bl[nz] = np.floor(np.log2(low[nz].astype(np.float64))).astype(np.int64) + 1
        rho = (nbits - bl + 1).astype(np.uint8)
        return idx, rho

    def add(self, values) -> "HLL":
        """Vectorized batch update (never per-row Python)."""
        h = hash64(values)
        if h.size == 0:
            return self
        idx, rho = self.idx_rho(h, self.p)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HLL") -> "HLL":
        if self.p != other.p:
            raise ValueError(f"HLL precision mismatch ({self.p} vs {other.p})")
        return HLL(self.p, np.maximum(self.registers, other.registers))

    # ---------------- query ----------------

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        e = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * m and zeros > 0:
            return float(m * np.log(m / zeros))  # linear counting
        return float(e)

    def rel_error(self) -> float:
        """1-sigma relative standard error."""
        return 1.04 / np.sqrt(self.m)

    # ---------------- wire format ----------------

    def to_bytes(self) -> bytes:
        """Dense (magic ``HLL1``: p + 2^p register bytes) or SPARSE
        (``HLLS``: p + count + sorted uint32 indices + their ranks),
        whichever is smaller — the HLL++ sparse idea (Heule et al.
        2013 §5.3) applied at the wire level. Groups with few distinct
        values (the common case under a high-cardinality GROUP BY at
        100 TB: most url/host groups are tiny) ship ~5 bytes per set
        register instead of the full 4 KB array, which is what the
        partial-stage shuffle actually carries. The format choice is a
        pure function of the register STATE, so byte-parity invariants
        (streamed == batch-built tables) are unaffected; in-memory
        state stays dense either way."""
        nz = np.flatnonzero(self.registers)
        if 5 * nz.size + 4 < self.m:  # 9+5n < 5+m
            return (
                _MAGIC_SPARSE
                + struct.pack("<BI", self.p, nz.size)
                + nz.astype(np.uint32).tobytes()
                + self.registers[nz].tobytes()
            )
        return _MAGIC + struct.pack("<B", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        if b[:4] == _MAGIC_SPARSE:
            p, n = struct.unpack("<BI", b[4:9])
            idx = np.frombuffer(b[9 : 9 + 4 * n], dtype=np.uint32).astype(np.int64)
            regs = np.zeros(1 << p, dtype=np.uint8)
            regs[idx] = np.frombuffer(b[9 + 4 * n : 9 + 5 * n], dtype=np.uint8)
            return cls(p, regs)
        assert b[:4] == _MAGIC, "bad HLL blob"
        p = struct.unpack("<B", b[4:5])[0]
        return cls(p, np.frombuffer(b[5:], dtype=np.uint8).copy())
