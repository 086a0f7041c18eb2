"""hypertable_job CLI surface: manifests carry real metrics, report
sections equal the operators called directly, replay is a recorded
no-op."""

import datetime as dt

from pyspark.sql import functions as F

from tdigest_spark.jobs.hypertable_job import (
    _parse_tiers,
    ingest_batch,
    run_retention,
    window_report,
)
from tdigest_spark.operators.hypertable import hypertable_window_stats

DAY = 86_400
WEEK = 7 * DAY
LOSSLESS = 1_000_000


def _mk(spark, n_days=28):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(days=d, hours=2 * h), f"g{d % 2}", float(d + h))
        for d in range(n_days)
        for h in range(4)
    ]
    return spark.createDataFrame(rows, "ts timestamp, g string, value double")


def test_lifecycle_manifests_and_report(spark, tmp_path):
    ev = _mk(spark)
    table = str(tmp_path / "job_table")
    cut = dt.datetime(2024, 1, 15)
    m0 = ingest_batch(
        ev.filter(F.col("ts") < cut), table, "value", "ts", DAY,
        by=["g"], delta=LOSSLESS,
    )
    assert m0["action"] == "ingest" and m0["ingest_id"] == 0
    assert m0["rows_in_batch"] == 14 * 4 and not m0["replayed_noop"]
    assert m0["table"]["n_rows"] == 14 and m0["wall_sec"] > 0
    m1 = ingest_batch(
        ev.filter(F.col("ts") >= cut), table, "value", "ts", DAY,
        by=["g"], delta=LOSSLESS,
    )
    assert m1["ingest_id"] == 1 and m1["table"]["n_rows"] == 28
    # replay of id 1 is a recorded no-op
    mr = ingest_batch(
        ev.filter(F.col("ts") >= cut), table, "value", "ts", DAY,
        by=["g"], delta=LOSSLESS, ingest_id=1,
    )
    assert mr["replayed_noop"] and mr["ingest_id"] is None

    ret = run_retention(
        spark, table, DAY, "2024-01-29T00:00:00+00:00",
        tiers=[(14 * DAY, WEEK)],
    )
    assert ret["rows_after"] < ret["rows_before"]
    assert ret["widths_after"] == [DAY, WEEK]
    assert ret["committed_id"] == 2

    rep = window_report(spark, table, DAY, WEEK, by=["g"])
    direct = hypertable_window_stats(
        spark, table, DAY, WEEK,
        {"p50": ("quantile", 0.5), "p99": ("quantile", 0.99),
         "n": ("total_weight",)},
        by=["g"],
    )
    assert rep.exceptAll(direct).count() == 0 and rep.count() == direct.count()
    # sliding + gapfill composes
    sl = window_report(
        spark, table, DAY, 2 * WEEK, slide_sec=WEEK, by=["g"], gapfill="locf"
    )
    assert "gap_filled" in sl.columns and sl.count() > 0


def test_parse_tiers():
    assert _parse_tiers("1209600:604800, 5184000:2419200") == [
        (1209600.0, 604800), (5184000.0, 2419200),
    ]
    assert _parse_tiers("") == []
