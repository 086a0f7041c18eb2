"""Config-gated Iceberg/Parquet table IO.

The north_rule targets Iceberg tables of web pages; this sandbox ships
no Iceberg runtime jar, so the layer probes for the ``iceberg`` data
source once and degrades to plain Parquet with IDENTICAL schema and
partitioning (SURVEY.md §7 "Iceberg in sandbox"). Code written against
:func:`write_table` / :func:`read_table` runs unchanged on a real
cluster with ``spark.jars.packages=org.apache.iceberg:...`` set — the
format decision is one probe, not a code path the caller sees.

Partitioning guidance baked in: digest/sketch checkpoint tables are
tiny (O(groups)), written unpartitioned; page-scale tables partition
by a low-cardinality derived column (e.g. ``lang`` or
``days(warc_ts)``) so partition pruning reaches the scan.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

__all__ = ["iceberg_available", "write_table", "read_table"]


@lru_cache(maxsize=1)
def _probe(app_id: str) -> bool:
    """One DataSource lookup per session: is the iceberg format loadable?"""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def iceberg_available(spark: SparkSession) -> bool:
    return _probe(spark.sparkContext.applicationId)


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> str:
    """Write ``df`` as Iceberg if the runtime is present, else Parquet.
    Returns the format used (observability/metrics)."""
    spark = df.sparkSession
    fmt = "iceberg" if iceberg_available(spark) else "parquet"
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return fmt


def read_table(
    spark: SparkSession, *paths: str, fmt: str | None = None
) -> DataFrame:
    """Read table(s) written by :func:`write_table`. ``fmt`` should be
    the format :func:`write_table` RETURNED (recorded in the caller's
    manifest/lineage): a checkpoint written by an Iceberg-enabled
    session must be read as Iceberg even if the resuming session's
    runtime probe differs (and vice versa) — re-probing here would read
    the paths with the wrong format. ``None`` falls back to the current
    session's probe (fresh reads with no manifest)."""
    if fmt is None:
        fmt = "iceberg" if iceberg_available(spark) else "parquet"
    # load() takes a single path or a LIST of paths
    return spark.read.format(fmt).load(list(paths) if len(paths) > 1 else paths[0])
