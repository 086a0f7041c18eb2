"""Deterministic vectorized 64-bit hashing shared by all sketches.

The reference library has no hashing at all (t-digest is value-based);
HLL / count-min / Bloom (SURVEY.md §2.8) need k independent 64-bit
hash families. We build them from one vectorized base hash
(``pandas.util.hash_array`` — SipHash-derived, deterministic for a
fixed key, Arrow-friendly) remixed per-seed with the splitmix64
finalizer (Steele et al. 2014, public domain constants) — the standard
"one strong hash + independent mixes" construction (Kirsch–Mitzenmacher
2006 shows two hashes suffice for Bloom-type structures).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= _MIX1
    x ^= x >> np.uint64(27)
    x *= _MIX2
    x ^= x >> np.uint64(31)
    return x


def hash64(values, seed: int = 0) -> np.ndarray:
    """uint64 hash of an array of arbitrary scalars (str/int/float/bytes).

    Deterministic across processes/runs; independent families via
    ``seed``.
    """
    arr = values if isinstance(values, (pd.Series, pd.Index)) else pd.Series(values)
    with np.errstate(over="ignore"):
        base = pd.util.hash_array(arr.to_numpy(), categorize=False)
        return _splitmix64(base + np.uint64(np.uint64(seed) * _GOLDEN + np.uint64(1)))


def hash_pair(values) -> tuple[np.ndarray, np.ndarray]:
    """Two independent hash families (h1, h2) for double hashing:
    h_i = h1 + i*h2 (Kirsch–Mitzenmacher)."""
    with np.errstate(over="ignore"):
        h1 = hash64(values, seed=0)
        h2 = _splitmix64(h1 ^ _GOLDEN) | np.uint64(1)  # odd -> full period
    return h1, h2
