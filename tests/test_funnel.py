"""Funnel: golden chain/break/tie cases, parity with the k-self-join
formulation, monotone counts, no-Python plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.funnel import funnel_counts, funnel_steps
from tdigest_spark.sources.tables import load

STEPS = ["signup", "purchase", "error"]


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        # u1: full chain, with the purchase tied to signup's timestamp
        (1, _ts(0), "signup"),
        (1, _ts(0), "purchase"),
        (1, _ts(5), "error"),
        # u2: purchase BEFORE signup never counts; chain stops at signup
        (2, _ts(0), "purchase"),
        (2, _ts(1), "signup"),
        # u3: only non-step events -> not in output at all
        (3, _ts(0), "view"),
        # u4: signup then a too-early error is fine (error >= purchase
        # required, purchase missing -> chain stops after step 1)
        (4, _ts(0), "signup"),
        (4, _ts(1), "error"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_steps_golden(toy):
    out = {r.user_id: r for r in funnel_steps(toy, "event_type", STEPS, "ts", "user_id").collect()}
    assert set(out) == {1, 2, 4}
    assert out[1].steps_completed == 3
    assert out[1].t_step_1 == out[1].t_step_2 == _ts(0)  # tie advances
    assert out[1].t_step_3 == _ts(5)
    assert out[2].steps_completed == 1 and out[2].t_step_2 is None
    assert out[4].steps_completed == 1 and out[4].t_step_3 is None


def test_funnel_counts_golden(toy):
    got = {r.step: (r.step_name, r.n_reached, round(r.conversion, 4)) for r in
           funnel_counts(toy, "event_type", STEPS, "ts", "user_id").collect()}
    assert got == {
        1: ("signup", 3, 1.0),
        2: ("purchase", 1, round(1 / 3, 4)),
        3: ("error", 1, 1.0),
    }


def test_parity_with_self_join_chain(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    got = funnel_steps(ev, "event_type", STEPS, "ts", "user_id")
    # independent formulation: the classic k-way self-join min chain
    s1 = ev.filter(F.col("event_type") == STEPS[0]).groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    exp = (
        s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    )
    j = got.join(exp, "user_id", "full")
    bad = j.filter(
        ~(
            F.col("t_step_1").eqNullSafe(F.col("t1"))
            & F.col("t_step_2").eqNullSafe(F.col("t2"))
            & F.col("t_step_3").eqNullSafe(F.col("t3"))
        )
        # keys with funnel events but no step-1 event exist only on
        # the fold side (self-join drops them); they must report 0
        & ~(F.col("t1").isNull() & (F.col("steps_completed") == 0))
    ).count()
    assert bad == 0
    assert got.filter(F.col("steps_completed") >= 2).count() > 0


def test_counts_monotone_and_plan(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    rows = {r.step: r.n_reached for r in
            funnel_counts(ev, "event_type", STEPS, "ts", "user_id").collect()}
    assert rows[1] >= rows[2] >= rows[3] > 0
    plan = (
        funnel_steps(ev, "event_type", STEPS, "ts", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "MapInPandas" not in plan


def test_duplicate_steps_rejected(toy):
    with pytest.raises(ValueError, match="distinct"):
        funnel_steps(toy, "event_type", ["signup", "signup", "error"], "ts", "user_id")
