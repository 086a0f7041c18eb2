"""Range join: half-open boundary goldens, exact parity with a
nested-loop join, long-interval broadcast path, equi-join plan."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.range_join import range_join
from tdigest_spark.sources.tables import load


@pytest.fixture(scope="module")
def toy(spark):
    points = spark.createDataFrame(
        [(1, 0.0, "a"), (1, 5.0, "b"), (1, 10.0, "c"), (2, 5.0, "d"), (1, None, "e")],
        "k long, v double, tag string",
    )
    intervals = spark.createDataFrame(
        [
            (1, 0.0, 10.0, "i1"),  # overlaps i2
            (1, 5.0, 10.001, "i2"),
            (2, 0.0, 5.0, "i3"),  # hi-exclusive: point at 5.0 out
        ],
        "k long, lo double, hi double, name string",
    )
    return points, intervals


def test_golden_half_open(toy):
    points, intervals = toy
    out = range_join(points, intervals, "v", "lo", "hi", by="k", bucket_width=2.0)
    got = sorted((r.tag, r.name) for r in out.collect())
    # a: in i1 only (0.0 >= lo); b: i1 + i2; c: 10.0 excluded from i1,
    # inside i2; d: 5.0 == i3.hi -> excluded; e: NULL never matches
    assert got == [("a", "i1"), ("b", "i1"), ("b", "i2"), ("c", "i2")]


def test_parity_with_nested_loop(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    intervals = spark.range(14).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 7.5).alias("lo"),
        (F.col("id") * 7.5 + 20.0).alias("hi"),
    )
    got = range_join(ev, intervals, "value", "lo", "hi", bucket_width=10.0)
    exp = ev.join(
        intervals,
        [ev["value"] >= intervals["lo"], ev["value"] < intervals["hi"]],
    ).select(got.columns)
    assert got.count() == exp.count() > ev.count()  # overlaps multiply
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_long_interval_broadcast_path(spark, toy):
    points, intervals = toy
    wide = intervals.union(
        spark.createDataFrame([(1, -1000.0, 1000.0, "iw")], intervals.schema)
    )
    out = range_join(
        points, wide, "v", "lo", "hi", by="k", bucket_width=2.0, max_span_buckets=4
    )
    got = sorted((r.tag, r.name) for r in out.collect())
    assert ("a", "iw") in got and ("b", "iw") in got and ("c", "iw") in got
    # short-path results unchanged
    assert [(t, n) for (t, n) in got if n != "iw"] == [
        ("a", "i1"),
        ("b", "i1"),
        ("b", "i2"),
        ("c", "i2"),
    ]


def test_default_width_from_median_span(toy):
    points, intervals = toy
    out = range_join(points, intervals, "v", "lo", "hi", by="k")
    assert out.count() == 4  # same answer, width auto-picked


def test_short_path_is_equi_join(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    intervals = spark.range(200).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 2.0).alias("lo"),
        (F.col("id") * 2.0 + 3.0).alias("hi"),
    )
    out = range_join(ev, intervals, "value", "lo", "hi", bucket_width=2.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the short side must go through a hash/sort-merge EQUI join on the
    # bucket key; the (empty) long side is the only nested-loop
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_negative_values_short_path(spark):
    # negative buckets: floor(-x/w) must agree between the point-side
    # bucket and the interval explode (no off-by-one at sign changes)
    points = spark.createDataFrame(
        [(float(v),) for v in range(-30, 31, 3)], "v double"
    )
    intervals = spark.createDataFrame(
        [(-25.0, -10.0, "neg"), (-5.0, 5.0, "straddle"), (10.0, 25.0, "pos")],
        "lo double, hi double, name string",
    )
    got = range_join(points, intervals, "v", "lo", "hi", bucket_width=4.0)
    exp = points.join(
        intervals,
        [points["v"] >= intervals["lo"], points["v"] < intervals["hi"]],
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp.select(got.columns)).count() == 0


def test_no_long_branch_when_all_short(spark, toy):
    # with no interval over the span cap, the points table must be
    # scanned once — no nested-loop union against an empty broadcast
    points, intervals = toy
    out = range_join(points, intervals, "v", "lo", "hi", by="k", bucket_width=2.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
