"""Cohort retention: golden toy, DuckDB oracle parity on events,
invariants (retention <= 1, offset-0 == cohort size)."""

import datetime as dt

import duckdb
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.retention import cohort_retention
from tdigest_spark.sources.tables import load

DAY = 86_400


def _ts(d):
    return dt.datetime(2024, 1, 4) + dt.timedelta(days=d)  # day 0 = a period start


@pytest.fixture(scope="module")
def toy(spark):
    rows = [
        (1, _ts(0)), (1, _ts(1)),          # u1: cohort day0-period, active offsets 0,1
        (2, _ts(0)), (2, _ts(2)),          # u2: offsets 0,2
        (3, _ts(1)),                        # u3: cohort day1-period, offset 0 only
        (1, None),                          # ignored
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_golden(toy):
    out = cohort_retention(toy, "ts", period_sec=DAY)
    got = {
        (r.cohort_start.day, r.offset): (r.n_active, r.cohort_size, r.retention)
        for r in out.collect()
    }
    assert got == {
        (4, 0): (2, 2, 1.0),
        (4, 1): (1, 2, 0.5),
        (4, 2): (1, 2, 0.5),
        (5, 0): (1, 1, 1.0),
    }


def test_duckdb_oracle_parity(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    week = 7 * DAY
    got = {
        (r.cohort_start, r.offset): (r.n_active, r.cohort_size, r.retention)
        for r in cohort_retention(ev, "ts", period_sec=week).collect()
    }
    con = duckdb.connect()
    exp_rows = con.execute(
        f"""
        WITH a AS (
          SELECT DISTINCT user_id,
                 floor(epoch(ts) / {week})::BIGINT AS per
          FROM '{sf_dir}/events.parquet' WHERE ts IS NOT NULL
        ),
        f AS (SELECT user_id, min(per) AS cohort FROM a GROUP BY user_id),
        c AS (
          SELECT cohort, per - cohort AS "offset", count(*) AS n_active
          FROM a JOIN f USING (user_id) GROUP BY 1, 2
        ),
        b AS (SELECT cohort, n_active AS cohort_size FROM c WHERE "offset" = 0)
        SELECT make_timestamp(cohort * {week} * 1000000) AS cohort_start,
               "offset", n_active, cohort_size,
               round(n_active::DOUBLE / cohort_size, 6) AS retention
        FROM c JOIN b USING (cohort)
        """
    ).fetchall()
    exp = {(r[0], r[1]): (r[2], r[3], r[4]) for r in exp_rows}
    assert got == exp and len(got) > 3


def test_invariants_and_segmented(spark, sf_dir):
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    out = cohort_retention(ev, "ts", period_sec=7 * DAY, by=["event_type"]).collect()
    assert all(0 < r.retention <= 1.0 for r in out)
    assert all(
        r.n_active == r.cohort_size for r in out if r.offset == 0
    )
    assert len({r.event_type for r in out}) > 1
