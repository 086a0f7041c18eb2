"""Drift-detection query for the driver's oracle gate.

Follows the engine's bound-boolean oracle pattern (cf.
``sk_hll_global_events``): columns DuckDB can compute exactly
(per-group even/odd counts) hash-match directly, and the drift metrics
are pinned by DETERMINISTIC invariants — self-drift is exactly zero,
and drifting a distribution against its own +1000 translation gives
KS = 1 exactly (disjoint supports: events.value ≤ ~490) and
W1 = 1000 exactly (translation invariance of the 1-Wasserstein
distance), both emitted as values the oracle states literally. The
same-distribution halves check uses a DKW-style two-sample bound with
3x headroom (measured ks ≤ 0.068 at sf0.01 vs bound ~0.134) — all
inputs are deterministic parquet, so the comparison is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from tdigest_spark.operators.digest_agg import tdigest_agg
from tdigest_spark.operators.drift import digest_drift
from tdigest_spark.sources.tables import load

LOSSLESS = 10_000_000


def dr_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS / 1-Wasserstein / PSI over digest tables (operators/drift.py)
    through three deterministic regimes per event_type: even-vs-odd
    halves (same distribution — small KS), self (exactly zero), and a
    +1000 translation (KS exactly 1, W1 exactly 1000, PSI major)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value", "event_id")
    a = tdigest_agg(
        ev.filter("event_id % 2 = 0"), "value", by=["event_type"], delta=LOSSLESS
    )
    b = tdigest_agg(
        ev.filter("event_id % 2 = 1"), "value", by=["event_type"], delta=LOSSLESS
    )
    full = tdigest_agg(ev, "value", by=["event_type"], delta=LOSSLESS)
    shifted = tdigest_agg(
        ev.select("event_type", (F.col("value") + 1000.0).alias("value")),
        "value",
        by=["event_type"],
        delta=LOSSLESS,
    )

    counts = ev.groupBy("event_type").agg(
        F.count(F.when(F.col("event_id") % 2 == 0, 1)).alias("n_even"),
        F.count(F.when(F.col("event_id") % 2 == 1, 1)).alias("n_odd"),
    )
    halves = digest_drift(a, b, by=["event_type"])
    selfd = digest_drift(a, a, by=["event_type"]).select(
        "event_type",
        ((F.col("ks") == 0.0) & (F.col("w1") == 0.0) & (F.col("psi") == 0.0)).alias(
            "self_zero_ok"
        ),
    )
    shift = digest_drift(full, shifted, by=["event_type"]).select(
        "event_type",
        F.round("ks", 6).alias("ks_shift"),
        F.round("w1", 6).alias("w1_shift"),
        (F.col("psi") > 0.25).alias("psi_shift_major"),
    )
    out = (
        counts.join(halves, "event_type")
        .join(selfd, "event_type")
        .join(shift, "event_type")
    )
    bound = 3.0 * F.sqrt(
        (F.col("n_even") + F.col("n_odd")) / (F.col("n_even") * F.col("n_odd"))
    )
    return out.select(
        "event_type",
        "n_even",
        "n_odd",
        (F.col("ks") <= bound).alias("same_dist_ks_ok"),
        "self_zero_ok",
        "ks_shift",
        "w1_shift",
        "psi_shift_major",
    )


QUERIES = {"dr_drift_events": dr_drift_events}

ORACLES = {
    "dr_drift_events": """
        SELECT event_type,
               count(*) FILTER (WHERE event_id % 2 = 0) AS n_even,
               count(*) FILTER (WHERE event_id % 2 = 1) AS n_odd,
               TRUE AS same_dist_ks_ok,
               TRUE AS self_zero_ok,
               CAST(1.0 AS DOUBLE) AS ks_shift,
               CAST(1000.0 AS DOUBLE) AS w1_shift,
               TRUE AS psi_shift_major
        FROM events GROUP BY event_type
    """,
}
