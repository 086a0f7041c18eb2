"""As-of join: golden boundaries, pandas merge_asof parity both
directions, tolerance, repartition invariance, single-shuffle plan."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.asof import asof_join
from tdigest_spark.sources.tables import load


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def toy(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(5), "a"),
            (1, _ts(10), "b"),  # exact tie with right @10
            (1, _ts(3), "c"),  # before first right row
            (2, _ts(7), "d"),  # key with no right rows
            (1, None, "e"),  # NULL ts -> never matches
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 40.0), (1, _ts(10), 100.0), (1, _ts(20), 200.0)],
        "user_id long, ts timestamp, ref double",
    )
    return left, right


def test_backward_golden(toy):
    left, right = toy
    out = asof_join(left, right, "ts", by="user_id")
    got = {r.tag: (r.ref, r.matched_ts) for r in out.collect()}
    assert got == {
        "a": (40.0, _ts(4)),
        "b": (100.0, _ts(10)),  # tie matches (at-or-before)
        "c": (None, None),
        "d": (None, None),
        "e": (None, None),
    }
    assert out.count() == left.count()  # left join: nothing dropped


def test_forward_and_tolerance_golden(toy):
    left, right = toy
    fwd = asof_join(left, right, "ts", by="user_id", direction="forward")
    got = {r.tag: r.ref for r in fwd.collect()}
    assert got == {"a": 100.0, "b": 100.0, "c": 40.0, "d": None, "e": None}
    tol = asof_join(left, right, "ts", by="user_id", tolerance_sec=2.0)
    got = {r.tag: r.ref for r in tol.collect()}
    # 'a' (gap 1s) survives, 'b' (gap 0) survives, others NULL
    assert got == {"a": 40.0, "b": 100.0, "c": None, "d": None, "e": None}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_merge_asof_parity_on_events(spark, sf_dir, direction):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = (
        ev.filter(F.col("event_id") % 17 == 0)
        .select("user_id", "ts", F.col("value").alias("ref_value"))
        .dropDuplicates(["user_id", "ts"])
    )
    left = ev.filter(F.col("event_id") % 17 != 0)
    out = asof_join(left, right, "ts", by="user_id", direction=direction)
    got = (
        out.select("event_id", "ref_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    exp = (
        pd.merge_asof(lp, rp, on="ts", by="user_id", direction=direction)
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["ref_value"].equals(exp["ref_value"])
    assert got["ref_value"].notna().sum() > 0


def test_repartition_invariance(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = (
        ev.filter(F.col("event_id") % 29 == 0)
        .select("user_id", "ts", F.col("value").alias("ref_value"))
        .dropDuplicates(["user_id", "ts"])
    )
    left = ev.filter(F.col("event_id") % 29 != 0)
    a = asof_join(left, right, "ts", by="user_id")
    b = asof_join(left.repartition(13, "value"), right.repartition(7), "ts", by="user_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_single_shuffle_no_python(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    right = ev.filter(F.col("event_id") % 97 == 0).select(
        "user_id", "ts", F.col("value").alias("ref_value")
    )
    out = asof_join(ev, right, "ts", by="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchanges = sum(
        1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 1, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_null_payload_field_not_backfilled(spark):
    # the matched right row's NULL field must stay NULL — not be
    # backfilled from an older right row (fields travel as one struct)
    left = spark.createDataFrame([(1, _ts(3), "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(1), 5.0, 50.0), (1, _ts(2), None, 70.0)],
        "k long, ts timestamp, a double, b double",
    )
    r = asof_join(left, right, "ts", by="k").collect()[0]
    assert r.matched_ts == _ts(2) and r.a is None and r.b == 70.0


def test_null_ts_right_rows_never_match(spark):
    left = spark.createDataFrame([(1, _ts(1), "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k long, ts timestamp, ref double"
    )
    r = asof_join(left, right, "ts", by="k").collect()[0]
    assert r.matched_ts is None and r.ref is None


def test_streaming_enrichment_equals_batch(spark, sf_dir, tmp_path):
    import numpy as np

    from tdigest_spark.streaming.enrich_stream import asof_enrich_stream

    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    reference = (
        ev.filter(F.col("event_id") % 17 == 0)
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("ref_value"))
        .localCheckpoint(eager=True)
    )
    left = ev.filter(F.col("event_id") % 17 != 0)
    pdf = left.toPandas()
    src = tmp_path / "src"
    for i, chunk in enumerate(np.array_split(pdf.index.to_numpy(), 3)):
        spark.createDataFrame(pdf.loc[chunk]).coalesce(1).write.parquet(
            str(src / f"chunk={i}")
        )
    stream = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    q = asof_enrich_stream(
        stream, reference, "ts", "user_id",
        str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    q.awaitTermination(180)
    got = spark.read.parquet(str(tmp_path / "out")).drop("batch_id")
    batch = asof_join(left, reference, "ts", by="user_id")
    # as-of matching is per left row, so streamed enrichment must
    # equal the one-shot batch join exactly
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0
