"""Distribution-drift detection over t-digest sketches.

The training-data-pipeline use case the digest algebra was built for:
compare this crawl's feature distribution against the last one (or one
shard against the corpus) WITHOUT rescanning either side — both inputs
are digest tables (O(groups x delta) rows, from
:func:`~tdigest_spark.operators.digest_agg.tdigest_agg` or a
checkpoint/streaming-sink table), so the comparison touches no raw
data and runs in one broadcast join + one Arrow batch pass.

Three standard drift metrics, each computed EXACTLY on the digests'
interpolated CDFs (the same curve :meth:`TDigest.cdf` evaluates — the
reference's histogram-bin interpolation, ``Postprocess/Internal.hs:
153-162``), not on a lossy re-binning of them:

- ``ks``  — Kolmogorov–Smirnov statistic ``sup_x |F_a(x) - F_b(x)|``.
  Both CDFs are piecewise linear between the union of their
  interpolation nodes (with jumps only at tied-mean atoms), so the
  difference is piecewise linear too and the sup is attained at a
  node's one-sided limits: evaluating left limit, right limit and the
  mid-rank value at every union node is exhaustive — no grid, no
  approximation beyond the digests themselves.
- ``w1``  — 1-Wasserstein (earth mover's) distance
  ``∫ |F_a - F_b| dx``: closed-form trapezoid/triangle integration per
  union-node segment, splitting segments where the difference changes
  sign. Scale-aware (units of the value column), unlike KS.
- ``psi`` — Population Stability Index over ``psi_bins`` equal-mass
  bins of the REFERENCE side ``a`` (the industry drift score):
  ``sum (p_a - p_b) * ln(p_a / p_b)`` with an epsilon floor.

Pure functions (:func:`ks_distance`, :func:`w1_distance`,
:func:`psi_score`) work on two :class:`TDigest` objects driver-side;
:func:`digest_drift` is the distributed per-group form.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..sketch.tdigest import TDigest

__all__ = ["ks_distance", "w1_distance", "psi_score", "digest_drift"]


def _node_envelope(d: TDigest) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique interpolation nodes of the digest cdf with the
    normalized rank ARRIVING at each node (left limit) and LEAVING it
    (right limit). For distinct-mean digests left == right everywhere
    except the support endpoints; tied atoms make a genuine jump."""
    tw = d.total_weight
    nodes = np.concatenate(([d.vmin], d.means, [d.vmax]))
    ts = np.concatenate(([0.0], d._centers(), [tw]))
    ux, first_idx = np.unique(nodes, return_index=True)
    last_idx = np.searchsorted(nodes, ux, side="right") - 1
    return ux, ts[first_idx] / tw, ts[last_idx] / tw


def _limits_at(d: TDigest, xs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Left and right limits of the digest cdf at sorted probe points
    ``xs`` (vectorized; same interpolation as :meth:`TDigest.cdf`)."""
    ux, t_lo, t_hi = _node_envelope(d)
    n = len(ux)
    idx = np.searchsorted(ux, xs)
    at = (idx < n) & (ux[np.minimum(idx, n - 1)] == xs)
    if n >= 2:
        k = np.clip(np.searchsorted(ux, xs, side="right") - 1, 0, n - 2)
        width = ux[k + 1] - ux[k]
        frac = (xs - ux[k]) / np.where(width > 0, width, 1.0)
        interp = t_hi[k] + frac * (t_lo[k + 1] - t_hi[k])
    else:  # single-atom digest: cdf is a pure step at ux[0]
        interp = np.zeros_like(xs)
    ia = np.minimum(idx, n - 1)
    left = np.where(xs <= ux[0], 0.0, np.where(xs > ux[-1], 1.0,
                    np.where(at, t_lo[ia], interp)))
    right = np.where(xs < ux[0], 0.0, np.where(xs >= ux[-1], 1.0,
                     np.where(at, t_hi[ia], interp)))
    return left, right


def _union_nodes(a: TDigest, b: TDigest) -> np.ndarray:
    return np.unique(np.concatenate((_node_envelope(a)[0], _node_envelope(b)[0])))


def ks_distance(a: TDigest, b: TDigest) -> float | None:
    """``sup_x |F_a(x) - F_b(x)|`` of the two digest-interpolated
    CDFs — exact (the sup of a piecewise-linear difference is attained
    at a breakpoint's one-sided limits or, inside a jump, at the
    mid-rank value the cdf reports there). None if either is empty."""
    if a.is_empty() or b.is_empty():
        return None
    u = _union_nodes(a, b)
    la, ra = _limits_at(a, u)
    lb, rb = _limits_at(b, u)
    ma = a.cdf_many(u)
    mb = b.cdf_many(u)
    return float(np.max(np.abs(np.stack((la - lb, ra - rb, ma - mb)))))


def w1_distance(a: TDigest, b: TDigest) -> float | None:
    """1-Wasserstein distance ``∫ |F_a - F_b| dx`` of the
    digest-interpolated CDFs — exact closed form per union-node
    segment (trapezoid where the sign holds, split at the root where
    the linear difference crosses zero; jumps have zero width and
    contribute nothing). None if either is empty."""
    if a.is_empty() or b.is_empty():
        return None
    u = _union_nodes(a, b)
    if len(u) < 2:
        return 0.0
    la, ra = _limits_at(a, u)
    lb, rb = _limits_at(b, u)
    # segment (u[k], u[k+1]): difference runs linearly from the right
    # limits at u[k] to the left limits at u[k+1]
    d0 = (ra - rb)[:-1]
    d1 = (la - lb)[1:]
    h = np.diff(u)
    same = d0 * d1 >= 0
    area = np.where(
        same,
        h * (np.abs(d0) + np.abs(d1)) / 2.0,
        # sign change: two triangles, root at h*|d0|/(|d0|+|d1|)
        h * (d0 * d0 + d1 * d1) / np.where(same, 1.0, 2.0 * (np.abs(d0) + np.abs(d1))),
    )
    return float(area.sum())


PSI_EPS = 1e-6


def psi_score(a: TDigest, b: TDigest, bins: int = 10) -> float | None:
    """Population Stability Index with ``bins`` equal-mass bins of the
    reference ``a`` (edges = a's i/bins quantiles; open-ended first and
    last bin). Per-bin mass via cdf differences on each digest, floored
    at ``PSI_EPS``. Conventional read: <0.1 stable, 0.1–0.25 moderate
    drift, >0.25 major drift. None if either is empty."""
    if a.is_empty() or b.is_empty():
        return None
    edges = a.quantiles(np.arange(1, bins) / bins)
    ca = np.concatenate(([0.0], a.cdf_many(edges), [1.0]))
    cb = np.concatenate(([0.0], b.cdf_many(edges), [1.0]))
    pa = np.maximum(np.diff(ca), PSI_EPS)
    pb = np.maximum(np.diff(cb), PSI_EPS)
    return float(np.sum((pa - pb) * np.log(pa / pb)))


_METRIC_FNS = {
    "ks": ks_distance,
    "w1": w1_distance,
    "psi": psi_score,
}


def digest_drift(
    a: DataFrame,
    b: DataFrame,
    by: Sequence[str] = (),
    digest_col: str = "digest",
    metrics: Sequence[str] = ("ks", "w1", "psi"),
    psi_bins: int = 10,
    how: str = "inner",
) -> DataFrame:
    """Per-group drift metrics between two digest tables.

    ``a`` is the reference side (PSI bins come from it), ``b`` the
    candidate. Both are digest tables with the same ``by`` keys and a
    ``digest_col`` struct column — O(groups x delta) rows, so the join
    broadcasts ``b`` and the raw data is never touched. ``how`` is the
    join type: ``"inner"`` scores only groups present on both sides;
    ``"left"``/``"full"`` keep one-sided groups with NULL metrics
    (new or vanished groups are themselves a drift signal — surface
    them, don't silently drop them).

    Returns ``by..., <metric>...`` (one double column per requested
    metric, NULL where either side's digest is empty or absent).
    """
    by = list(by)
    bad = [m for m in metrics if m not in _METRIC_FNS]
    if bad:
        raise ValueError(f"unknown drift metric(s) {bad}; choose from {sorted(_METRIC_FNS)}")
    da, db = "__drift_a", "__drift_b"
    left = a.select(*by, F.col(digest_col).alias(da))
    right = b.select(*by, F.col(digest_col).alias(db))
    joined = (
        left.join(F.broadcast(right), on=by, how=how)
        if by
        else left.crossJoin(F.broadcast(right))
    )
    out_schema = T.StructType(
        [joined.schema[c] for c in by]
        + [T.StructField(m, T.DoubleType(), True) for m in metrics]
    )

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[by].copy() if by else pd.DataFrame(index=pdf.index)
            das = [TDigest.from_row(r) for r in pdf[da]]
            dbs = [TDigest.from_row(r) for r in pdf[db]]
            for m in metrics:
                fn = _METRIC_FNS[m]
                args = (psi_bins,) if m == "psi" else ()
                out[m] = pd.array(
                    [fn(x, y, *args) for x, y in zip(das, dbs)], dtype="float64"
                )
            yield out

    return joined.mapInPandas(evaluate, out_schema)
