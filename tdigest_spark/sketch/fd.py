"""Frequent-directions matrix sketch: a mergeable low-rank summary of
a tall matrix of embedding rows.

Published algorithm: Liberty 2013 (KDD, "Simple and deterministic
matrix sketching") with the Ghashami–Liberty–Phillips–Woodruff 2016
analysis. State is an ``ell x d`` row buffer ``B``; when full, one SVD
shrinks the spectrum by the ell/2-th singular value squared and keeps
the non-zero rows, freeing half the buffer. Covariance guarantee::

    0 <= x^T (A^T A - B^T B) x <= 2 ||A||_F^2 / ell      (unit x)

i.e. ``B^T B`` underestimates the true Gram matrix by at most
``2/ell`` of the total mass IN EVERY DIRECTION — the matrix analog of
Misra–Gries (which it degenerates to on one-hot rows). Merging two
sketches = appending their rows and shrinking once more; the bound
composes additively over the merge tree, so the partial/merge UDAF
shape the scalar sketches use applies unchanged.

Why the engine wants it: the principal directions / spectral mass of
a 100-TB embedding corpus (PCA for whitening, drift of the dominant
subspace between crawls, intrinsic-dimension checks) in ONE pass,
shipping O(ell x d) floats per partition instead of gathering the
O(n x d) matrix — and without the numerical hazard of summing raw
Gram matrices (B^T B is PSD by construction).

Error tracking: ``shrink_total`` accumulates the per-step shrink
thresholds ``sum(delta_t)`` — each step maps the Gram ``G -> G'`` with
``G - G' ⪯ delta_t * I``, so the total Gram deficit is ⪯
``shrink_total * I`` — an A-POSTERIORI bound, usually far tighter than
the worst-case ``2||A||_F^2/ell`` (which follows because each step
removes at least ``(ell/2) * delta_t`` of Frobenius mass).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["FrequentDirections", "stack_vectors"]


def stack_vectors(values) -> np.ndarray | None:
    """Stack an iterable of vectors (Arrow list column values) into one
    (n x d) float64 block, dropping NULL and EMPTY entries — the
    single vector-ingest policy shared by every FD surface (`fd_agg`,
    the one-pass sketch kind, `fd_project`). None if nothing usable."""
    vs = [
        np.asarray(v, dtype=np.float64)
        for v in values
        if v is not None and len(v)
    ]
    if not vs:
        return None
    return np.asarray(vs)


class FrequentDirections:
    __slots__ = ("ell", "d", "rows", "n_rows", "frob_sq", "shrink_total")

    def __init__(self, ell: int, d: int):
        if ell < 2:
            raise ValueError("FrequentDirections needs ell >= 2")
        self.ell = int(ell)
        self.d = int(d)
        self.rows = np.zeros((0, d), dtype=np.float64)  # current B (<= ell rows)
        self.n_rows = 0          # rows of A absorbed
        self.frob_sq = 0.0       # ||A||_F^2 (exact running total)
        self.shrink_total = 0.0  # spectral mass removed so far

    # ------------------------------------------------------------ build

    def add(self, batch: np.ndarray) -> "FrequentDirections":
        """Absorb a batch of rows (n x d). NaN rows are dropped (the
        engine-wide NaN policy)."""
        a = np.asarray(batch, dtype=np.float64)
        if a.ndim == 1:
            a = a[None, :]
        if a.shape[1] != self.d:
            raise ValueError(f"dim mismatch: sketch d={self.d}, batch d={a.shape[1]}")
        a = a[~np.isnan(a).any(axis=1)]
        if not len(a):
            return self
        self.n_rows += len(a)
        self.frob_sq += float((a * a).sum())
        self.rows = np.vstack((self.rows, a))
        if len(self.rows) >= self.ell:
            self._shrink()
        return self

    def _shrink(self) -> None:
        """One FD step: SVD, subtract sigma_{ell/2}^2 from the squared
        spectrum, rebuild B from the surviving directions."""
        _, s, vt = np.linalg.svd(self.rows, full_matrices=False)
        half = self.ell // 2
        if len(s) <= half:
            # fewer singular values than the shrink pivot (d <= ell/2,
            # or a short buffer): nothing to shrink, but REBUILD from
            # the SVD anyway — B^T B is preserved exactly and the row
            # buffer stays bounded at rank <= min(d, ell) instead of
            # growing by every appended batch
            keep = s > 0.0
            self.rows = s[keep][:, None] * vt[keep]
            return
        delta = float(s[half] ** 2)
        s_sq = np.maximum(s**2 - delta, 0.0)
        keep = s_sq > 0.0
        # the deficit bound grows by delta per step: the step maps the
        # Gram G -> G' with G - G' ⪯ delta * I (every squared singular
        # value drops by at most delta). The REMOVED Frobenius mass is
        # >= (ell/2) * delta, which is what forces
        # sum(delta_t) <= 2 ||A||_F^2 / ell.
        self.shrink_total += delta
        self.rows = np.sqrt(s_sq[keep])[:, None] * vt[keep]

    # ------------------------------------------------------------ merge

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        if (other.ell, other.d) != (self.ell, self.d):
            raise ValueError(
                f"FD shape mismatch: (ell={self.ell}, d={self.d}) vs "
                f"(ell={other.ell}, d={other.d})"
            )
        out = FrequentDirections(self.ell, self.d)
        out.n_rows = self.n_rows + other.n_rows
        out.frob_sq = self.frob_sq + other.frob_sq
        out.shrink_total = self.shrink_total + other.shrink_total
        out.rows = np.vstack((self.rows, other.rows))
        if len(out.rows) >= out.ell:
            out._shrink()
        return out

    # ------------------------------------------------------------ query

    def gram(self) -> np.ndarray:
        """``B^T B`` — the PSD covariance estimate (uncentered)."""
        return self.rows.T @ self.rows

    def spectrum(self) -> tuple[np.ndarray, np.ndarray]:
        """(singular values of B, right singular vectors as rows) —
        the estimated principal directions, strongest first."""
        _, s, vt = np.linalg.svd(self.rows, full_matrices=False)
        return s, vt

    def error_bound(self) -> float:
        """A-posteriori uniform bound on the Gram deficit:
        ``sup_x x^T(A^T A - B^T B)x <= shrink_total`` (the summed
        per-step shrink thresholds; always <= the worst-case
        ``2 frob_sq / ell``)."""
        return self.shrink_total

    # ---------------------------------------------------------- (de)ser

    def to_bytes(self) -> bytes:
        r = np.ascontiguousarray(self.rows, dtype=np.float64)
        return (
            struct.pack("<IIIqdd", self.ell, self.d, r.shape[0], self.n_rows,
                        self.frob_sq, self.shrink_total)
            + r.tobytes()
        )

    @classmethod
    def from_bytes(cls, b: bytes) -> "FrequentDirections":
        ell, d, m, n_rows, frob_sq, shrink_total = struct.unpack_from("<IIIqdd", b, 0)
        out = cls(ell, d)
        out.n_rows = int(n_rows)
        out.frob_sq = float(frob_sq)
        out.shrink_total = float(shrink_total)
        off = struct.calcsize("<IIIqdd")
        out.rows = (
            np.frombuffer(b, dtype=np.float64, offset=off).reshape(m, d).copy()
        )
        return out
