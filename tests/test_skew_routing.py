"""Heavy-key skew routing for sessionize and as-of join: a planted
10x-skew key must produce IDENTICAL output through the routed (time-
bucketed + boundary-stitched) path, and its rows must actually spread
over multiple window partitions (the point of the routing)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.asof import asof_join
from tdigest_spark.operators.sessionize import sessionize
from tdigest_spark.operators.skew import heavy_key_strings, key_string


def _events(spark):
    # 20 normal users x 30 events, one bot user with 10x that (300+
    # events) spanning many hours, some NULL timestamps, one NULL key
    rows = []
    for u in range(20):
        for i in range(30):
            rows.append((f"u{u}", 1_700_000_000.0 + u * 7 + i * 311.0))
    for i in range(300):
        rows.append(("bot", 1_700_000_000.0 + i * 173.0))
    rows += [("bot", None), ("u1", None), (None, 1_700_000_100.0)]
    return spark.createDataFrame(rows, "user string, ep double").select(
        "user", F.col("ep").cast("timestamp").alias("ts")
    )


def test_heavy_key_detection(spark):
    ev = _events(spark)
    heavy = heavy_key_strings(ev, ["user"], max_rows_per_key=100)
    assert heavy == ["bot"]
    assert heavy_key_strings(ev, ["user"], max_rows_per_key=1000) == []
    with pytest.raises(ValueError, match="max_rows_per_key"):
        heavy_key_strings(ev, ["user"], max_rows_per_key=0)


def test_sessionize_skew_routed_parity(spark):
    ev = _events(spark)
    gap = 300.0
    plain = sessionize(ev, "ts", gap, "user").toPandas()
    routed = sessionize(
        ev, "ts", gap, "user", max_rows_per_key=100, time_bucket_sec=1800.0
    ).toPandas()

    def norm(df):
        return (
            df.assign(ep=df["ts"].astype("int64", errors="ignore"))
            .sort_values(["user", "ts", "session_idx"], na_position="first")
            .reset_index(drop=True)[["user", "ts", "session_idx"]]
        )

    pd.testing.assert_frame_equal(norm(plain), norm(routed))
    # the bot key really spans multiple time buckets (the parallelism)
    n_buckets = (
        ev.where(F.col("user") == "bot")
        .select(F.floor(F.col("ts").cast("double") / 1800.0).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 5
    # and the routed plan windows on the bucket column for the heavy leg
    routed_df = sessionize(
        ev, "ts", gap, "user", max_rows_per_key=100, time_bucket_sec=1800.0
    )
    assert "__b" in routed_df._jdf.queryExecution().optimizedPlan().toString()


def test_sessionize_skew_routed_null_key(spark):
    """A NULL key over the budget routes correctly (null-safe summary
    join): parity with the plain path."""
    rows = [(None, 1_700_000_000.0 + i * 173.0) for i in range(300)]
    rows += [("u1", 1_700_000_000.0 + i * 311.0) for i in range(10)]
    ev = spark.createDataFrame(rows, "user string, ep double").select(
        "user", F.col("ep").cast("timestamp").alias("ts")
    )
    plain = sessionize(ev, "ts", 300.0, "user").toPandas()
    routed = sessionize(
        ev, "ts", 300.0, "user", max_rows_per_key=100, time_bucket_sec=1800.0
    ).toPandas()
    key = ["user", "ts"]
    a = plain.sort_values(key, na_position="first").reset_index(drop=True)
    b = routed.sort_values(key, na_position="first").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_skew_routed_parity(spark, direction):
    ev = _events(spark)
    quotes = spark.createDataFrame(
        [
            (u, 1_700_000_000.0 + i * 907.0, float(i))
            for u in ["bot", "u1", "u2", None]
            for i in range(40)
        ],
        "user string, ep double, px double",
    ).select("user", F.col("ep").cast("timestamp").alias("ts"), "px")
    plain = asof_join(
        ev, quotes, "ts", by="user", direction=direction
    ).toPandas()
    routed = asof_join(
        ev,
        quotes,
        "ts",
        by="user",
        direction=direction,
        max_rows_per_key=100,
        time_bucket_sec=1800.0,
    ).toPandas()

    def norm(df):
        return df.sort_values(
            ["user", "ts", "px"], na_position="first"
        ).reset_index(drop=True)

    pd.testing.assert_frame_equal(norm(plain), norm(routed))
    # matches genuinely cross bucket boundaries in the routed form
    # (quote cadence 907s > bucket width 1800s means many buckets hold
    # no quote at all and rely on the carry)
    assert routed["px"].notna().sum() > 100


def test_asof_skew_routed_keyless(spark):
    """Keyless (global) as-of: routing spreads the single global
    window over time buckets."""
    left = spark.range(500).select(
        (1_700_000_000 + F.col("id") * 100).cast("timestamp").alias("ts")
    )
    right = spark.range(50).select(
        (1_700_000_000 + F.col("id") * 997).cast("timestamp").alias("ts"),
        (F.col("id") * 2.0).alias("v"),
    )
    plain = asof_join(left, right, "ts").toPandas()
    routed = asof_join(
        left, right, "ts", max_rows_per_key=100, time_bucket_sec=1800.0
    ).toPandas()
    a = plain.sort_values("ts").reset_index(drop=True)
    b = routed.sort_values("ts").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_key_string_null_vs_empty(spark):
    """The NULL stand-in must not conflate NULL with the empty
    string."""
    df = spark.createDataFrame([(None,), ("",)], "k string")
    got = {r["s"] for r in df.select(key_string(["k"]).alias("s")).collect()}
    assert len(got) == 2


def test_session_stats_skew_routed_parity(spark):
    """session_stats passes the routing through: per-session aggregate
    rows identical with and without a forced low budget."""
    import pandas as pd

    from tdigest_spark.operators.sessionize import session_stats

    ev = _events(spark)
    plain = session_stats(ev, "ts", 300.0, "user").toPandas()
    routed = session_stats(
        ev, "ts", 300.0, "user", max_rows_per_key=100, time_bucket_sec=1800.0
    ).toPandas()
    key = ["user", "session_idx"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = routed.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
