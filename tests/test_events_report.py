"""events_report job: sections equal the operators called directly;
drift self-comparison is zero; CLI wiring is importable."""

from pyspark.sql import functions as F

from tdigest_spark.jobs.events_report import events_report
from tdigest_spark.operators.funnel import funnel_counts
from tdigest_spark.operators.retention import cohort_retention
from tdigest_spark.sources.tables import load

STEPS = ["signup", "purchase", "error"]


def test_sections_match_direct_operators(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    rep = events_report(ev, STEPS, delta=1_000_000)
    assert set(rep) == {"sessions", "session_digests", "funnel", "retention"}
    f_direct = funnel_counts(ev, "event_type", STEPS, "ts", "user_id")
    assert rep["funnel"].exceptAll(f_direct).count() == 0
    r_direct = cohort_retention(ev, "ts", period_sec=7 * 86_400)
    assert rep["retention"].exceptAll(r_direct).count() == 0
    s = rep["sessions"].collect()
    assert len(s) > 5  # one row per day
    assert all(r.p50_duration <= r.p99_duration for r in s)
    assert all(r.n_sessions > 0 for r in s)


def test_drift_gate_zero_on_self(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    base = events_report(ev, STEPS, delta=1_000_000)
    again = events_report(
        ev, STEPS, delta=1_000_000,
        prev_session_digests=base["session_digests"],
    )
    drift = again["drift"].collect()
    assert len(drift) > 5
    assert all(abs(r.ks) < 1e-12 and abs(r.w1) < 1e-9 for r in drift)
