"""Replicates the driver's correctness gate locally: run every
registered query at sf0.01 on Spark AND its DuckDB oracle SQL, compare
row count, column names, and order-insensitive values exactly."""

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tdigest_spark.sources.tables import TABLES


@pytest.fixture(scope="module")
def con(sf_dir_med):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir_med}/{t}.parquet'"
        )
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str):
    assert len(spark_df) == len(oracle_df), f"{name}: row count"
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), f"{name}: columns"
    a, b = normalize(spark_df), normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == pytest.approx(y, abs=1e-9), f"{name}.{c}[{i}]: {x} != {y}"
            else:
                assert str(x) == str(y), f"{name}.{c}[{i}]: {x!r} != {y!r}"


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "median_value" in df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle_parity(spark, con, sf_dir_med, name):
    sdf = QUERIES[name](spark, sf_dir_med).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check, mirroring the driver
        return
    odf = con.execute(ORACLES[name]).df()
    assert_frames_match(sdf, odf, name)
