"""Sessionization: golden boundaries, built-in session_window parity,
repartition invariance, single-shuffle plan, streaming parity."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.sessionize import (
    session_stats,
    session_window_stats,
    sessionize,
)
from tdigest_spark.sources.tables import load


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def toy(spark):
    # user 1: gaps 10, 30 (== gap -> NEW session), 5; user 2: one event
    rows = [
        (1, _ts(0), 1.0),
        (1, _ts(10), 2.0),
        (1, _ts(40), 3.0),
        (1, _ts(45), 4.0),
        (2, _ts(0), 9.0),
        (1, None, 99.0),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_sessionize_golden_boundaries(toy):
    out = sessionize(toy, "ts", 30.0, "user_id").collect()
    got = {(r.user_id, r.value): r.session_idx for r in out}
    assert got == {
        (1, 1.0): 1,
        (1, 2.0): 1,
        (1, 3.0): 2,  # gap == 30 starts a new session (end-exclusive)
        (1, 4.0): 2,
        (2, 9.0): 1,
        (1, 99.0): None,  # NULL ts -> no session
    }


def test_session_stats_golden(toy):
    out = session_stats(
        toy, "ts", 30.0, "user_id", aggs={"sum_value": F.sum("value")}
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_sec, r.sum_value)
        for r in out.collect()
    }
    assert got == {
        (1, 1): (2, 10.0, 3.0),
        (1, 2): (2, 5.0, 7.0),
        (2, 1): (1, 0.0, 9.0),
    }


def test_parity_with_builtin_session_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    ours = session_stats(ev, "ts", 1800.0, "user_id").select(
        "user_id", "session_start", "session_end", "n_events", "duration_sec"
    )
    builtin = session_window_stats(ev, "ts", 1800.0, "user_id").select(
        "user_id", "session_start", "session_end", "n_events", "duration_sec"
    )
    assert ours.exceptAll(builtin).count() == 0
    assert builtin.exceptAll(ours).count() == 0
    assert ours.count() == builtin.count() > 0


def test_repartition_invariance(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    a = session_stats(ev, "ts", 900.0, "user_id")
    b = session_stats(ev.repartition(13, "value"), "ts", 900.0, "user_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_session_stats_single_shuffle(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    plan = session_stats(ev, "ts", 900.0, "user_id")._jdf.queryExecution().executedPlan().toString()
    # the groupBy(user_id, session_idx) reuses the window's hash
    # partitioning on user_id (a subset of the grouping keys): exactly
    # one Exchange in the whole plan, and no Python stage
    n_exchanges = sum(
        1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 1, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    import numpy as np

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
    src = tmp_path / "src"
    for i, chunk in enumerate(np.array_split(pdf.index.to_numpy(), 3)):
        # time-ordered chunks so the watermark finalizes earlier sessions
        spark.createDataFrame(pdf.loc[chunk]).coalesce(1).write.parquet(
            str(src / f"chunk={i}")
        )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    agg = session_window_stats(
        stream, "ts", 1800.0, "user_id", watermark_sec=0
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sess_stream")
    batch = session_window_stats(ev, "ts", 1800.0, "user_id")
    # append mode only emits sessions CLOSED by the final watermark —
    # every emitted session must match the batch result exactly, and
    # most sessions must have been finalized
    assert got.exceptAll(batch).count() == 0
    assert got.count() >= 0.5 * batch.count() > 0
