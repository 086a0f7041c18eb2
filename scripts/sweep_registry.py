"""Full-registry oracle sweep — the pre-commit gate for registry edits.

Replicates the driver's CORRECTNESS check locally: every
``__spark_entry__.queries()`` entry runs against its
``oracle_sql()`` DuckDB twin at the given scale factor, compared by
sorted column names + order-insensitive values (timestamps normalized
to microseconds, numerics to float64 — the queries already round
floats identically on both sides).

Usage::

    python scripts/sweep_registry.py [sf_dir] [master] [shuffle_partitions]

Run it at TWO parallelism levels (local[4]/8 and local[16]/32) before
committing a registry change — no result may depend on partition
count or order.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
# Spark PYTHON WORKERS do not inherit the driver's sys.path — they
# need the env var before the session starts
os.environ["PYTHONPATH"] = "/root/repo:" + os.environ.get("PYTHONPATH", "")


def _norm(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_numeric_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[4]"
    shuffle = sys.argv[3] if len(sys.argv) > 3 else "8"
    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        try:
            sdf = _norm(fn(spark, sf_dir).toPandas())
            odf = _norm(con.execute(oracles[name]).df())
            schema_ok = list(sdf.columns) == list(odf.columns)
            ok = schema_ok and len(sdf) == len(odf) and sdf.equals(odf)
            status = "ok" if ok else "MISMATCH"
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            status, ok = f"ERROR {type(ex).__name__}: {ex}", False
        print(f"{name:32s} {status}", flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{len(qs) - len(failures)}/{len(qs)} green ({master}, shuffle={shuffle})")
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
