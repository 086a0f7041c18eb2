"""Drift metrics (KS / W1 / PSI) over digests — exactness of the
closed forms against dense numeric evaluation, analytic accuracy on
known distributions, and the distributed per-group operator."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.digest_agg import tdigest_agg
from tdigest_spark.operators.drift import (
    digest_drift,
    ks_distance,
    psi_score,
    w1_distance,
)
from tdigest_spark.sketch.tdigest import TDigest


def _grid_probe(a: TDigest, b: TDigest, n_grid: int = 20001) -> np.ndarray:
    """Dense numeric probe set: a fine grid over the union support plus
    nextafter points on both sides of every interpolation node, so
    one-sided limits at jumps are approached numerically."""
    lo = min(a.vmin, b.vmin)
    hi = max(a.vmax, b.vmax)
    nodes = np.unique(np.concatenate((a.means, b.means, [a.vmin, a.vmax, b.vmin, b.vmax])))
    probes = np.concatenate(
        (
            np.linspace(lo - 1.0, hi + 1.0, n_grid),
            nodes,
            np.nextafter(nodes, -np.inf),
            np.nextafter(nodes, np.inf),
        )
    )
    return np.sort(probes)


def _pair(rng, n=4000, shift=0.0, delta=100):
    a = TDigest.from_values(rng.normal(0, 1, n), delta)
    b = TDigest.from_values(rng.normal(shift, 1, n), delta)
    return a, b


def test_identical_digests_zero_drift():
    rng = np.random.default_rng(7)
    d = TDigest.from_values(rng.uniform(0, 100, 5000), 100)
    assert ks_distance(d, d) == 0.0
    assert w1_distance(d, d) == 0.0
    assert psi_score(d, d) == 0.0


def test_empty_digest_gives_none():
    d = TDigest.from_values(np.arange(10.0), 100)
    e = TDigest.empty()
    for fn in (ks_distance, w1_distance, psi_score):
        assert fn(d, e) is None
        assert fn(e, d) is None


@pytest.mark.parametrize("shift", [0.0, 0.3, 2.0])
def test_ks_closed_form_equals_dense_grid(shift):
    rng = np.random.default_rng(11)
    a, b = _pair(rng, shift=shift)
    ks = ks_distance(a, b)
    probes = _grid_probe(a, b)
    grid = float(np.nanmax(np.abs(a.cdf_many(probes) - b.cdf_many(probes))))
    # closed form is the true sup: never below any sampled value, and
    # the nextafter probes bring the grid within float epsilon of it
    assert ks >= grid - 1e-12
    assert ks == pytest.approx(grid, abs=1e-9)


@pytest.mark.parametrize("shift", [0.0, 0.3, 2.0])
def test_w1_closed_form_equals_dense_integration(shift):
    rng = np.random.default_rng(13)
    a, b = _pair(rng, shift=shift)
    w1 = w1_distance(a, b)
    probes = _grid_probe(a, b)
    diffs = np.abs(a.cdf_many(probes) - b.cdf_many(probes))
    numeric = float(np.trapz(diffs, probes))
    assert w1 == pytest.approx(numeric, abs=5e-3, rel=1e-3)


def test_metrics_symmetric_and_psi_detects_direction():
    rng = np.random.default_rng(17)
    a, b = _pair(rng, shift=1.0)
    assert ks_distance(a, b) == pytest.approx(ks_distance(b, a), abs=1e-12)
    assert w1_distance(a, b) == pytest.approx(w1_distance(b, a), abs=1e-9)
    # PSI is near-symmetric in value for a location shift and must be
    # clearly above the "major drift" threshold for a 1-sigma shift
    assert psi_score(a, b) > 0.25
    assert psi_score(b, a) > 0.25


def test_analytic_accuracy_normal_shift():
    # N(0,1) vs N(0.5,1): W1 = |shift| = 0.5 exactly;
    # KS = 2*Phi(shift/2) - 1 = 0.1974
    rng = np.random.default_rng(23)
    n = 60_000
    a = TDigest.from_values(rng.normal(0, 1, n), 200)
    b = TDigest.from_values(rng.normal(0.5, 1, n), 200)
    assert w1_distance(a, b) == pytest.approx(0.5, abs=0.05)
    ks_true = 2 * (0.5 * (1 + math.erf(0.25 / math.sqrt(2)))) - 1
    assert ks_distance(a, b) == pytest.approx(ks_true, abs=0.03)
    assert psi_score(a, b) == pytest.approx(0.2377, abs=0.05)  # analytic PSI


def test_single_atom_digests():
    a = TDigest.from_values(np.full(10, 3.0), 50)
    b = TDigest.from_values(np.full(10, 5.0), 50)
    assert ks_distance(a, b) == 1.0  # disjoint atoms: full separation
    assert w1_distance(a, b) == pytest.approx(2.0)  # |5 - 3|
    assert ks_distance(a, a) == 0.0
    assert w1_distance(a, a) == 0.0


def test_digest_drift_operator_matches_core(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = tdigest_agg(events.filter("event_id % 2 = 0"), "value", by=["event_type"], delta=100)
    b = tdigest_agg(events.filter("event_id % 2 = 1"), "value", by=["event_type"], delta=100)
    got = {
        r["event_type"]: r
        for r in digest_drift(a, b, by=["event_type"]).collect()
    }
    da = {r["event_type"]: TDigest.from_row(r["digest"]) for r in a.collect()}
    db = {r["event_type"]: TDigest.from_row(r["digest"]) for r in b.collect()}
    assert set(got) == set(da) & set(db)
    for k, r in got.items():
        assert r["ks"] == pytest.approx(ks_distance(da[k], db[k]), abs=1e-12)
        assert r["w1"] == pytest.approx(w1_distance(da[k], db[k]), abs=1e-9)
        assert r["psi"] == pytest.approx(psi_score(da[k], db[k]), abs=1e-9)


def test_digest_drift_self_is_zero_and_outer_keeps_one_sided(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = tdigest_agg(events, "value", by=["event_type"], delta=100)
    self_rows = digest_drift(a, a, by=["event_type"]).collect()
    assert self_rows and all(
        r["ks"] == 0.0 and r["w1"] == 0.0 and r["psi"] == 0.0 for r in self_rows
    )
    # drop one group from b: inner omits it, full keeps it with NULLs
    b = a.filter(F.col("event_type") != self_rows[0]["event_type"])
    inner = digest_drift(a, b, by=["event_type"]).collect()
    full = digest_drift(a, b, by=["event_type"], how="full").collect()
    assert len(full) == len(inner) + 1
    missing = [r for r in full if r["ks"] is None]
    assert len(missing) == 1


def test_digest_drift_global_and_bad_metric(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = tdigest_agg(events.filter("event_id % 2 = 0"), "value", delta=100)
    b = tdigest_agg(events.filter("event_id % 2 = 1"), "value", delta=100)
    row = digest_drift(a, b, metrics=("ks", "w1")).collect()
    assert len(row) == 1 and row[0]["ks"] is not None
    with pytest.raises(ValueError, match="unknown drift metric"):
        digest_drift(a, b, metrics=("ks", "nope"))


def test_drift_sql_surface(spark, sf_dir):
    """tdigest_ks/w1/psi as registered SQL functions over joined
    digest views equal the pure core functions."""
    from tdigest_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = tdigest_agg(events.filter("event_id % 2 = 0"), "value", by=["event_type"], delta=100)
    b = tdigest_agg(events.filter("event_id % 2 = 1"), "value", by=["event_type"], delta=100)
    a.createOrReplaceTempView("drift_a")
    b.createOrReplaceTempView("drift_b")
    rows = spark.sql(
        """SELECT a.event_type,
                  tdigest_ks(a.digest, b.digest) AS ks,
                  tdigest_w1(a.digest, b.digest) AS w1,
                  tdigest_psi(a.digest, b.digest) AS psi
           FROM drift_a a JOIN drift_b b USING (event_type)"""
    ).collect()
    da = {r["event_type"]: TDigest.from_row(r["digest"]) for r in a.collect()}
    db = {r["event_type"]: TDigest.from_row(r["digest"]) for r in b.collect()}
    assert rows
    for r in rows:
        k = r["event_type"]
        assert r["ks"] == pytest.approx(ks_distance(da[k], db[k]), abs=1e-12)
        assert r["w1"] == pytest.approx(w1_distance(da[k], db[k]), abs=1e-9)
        assert r["psi"] == pytest.approx(psi_score(da[k], db[k]), abs=1e-9)


def test_drift_sql_surface_null_digest(spark, sf_dir):
    """A NULL digest struct (outer-joined views — the documented SQL
    use case) must yield NULL drift metrics, not a worker crash."""
    from tdigest_spark.functions.sql_udfs import register_sql_functions

    register_sql_functions(spark)
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = tdigest_agg(events, "value", by=["event_type"], delta=100)
    b = a.limit(0)  # empty right side: every left row joins to NULL
    a.createOrReplaceTempView("null_drift_a")
    b.createOrReplaceTempView("null_drift_b")
    rows = spark.sql(
        """SELECT a.event_type, tdigest_ks(a.digest, b.digest) AS ks,
                  tdigest_w1(a.digest, b.digest) AS w1,
                  tdigest_psi(a.digest, b.digest) AS psi
           FROM null_drift_a a LEFT JOIN null_drift_b b USING (event_type)"""
    ).collect()
    assert rows and all(
        r["ks"] is None and r["w1"] is None and r["psi"] is None for r in rows
    )
