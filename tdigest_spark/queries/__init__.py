"""Central query registry backing ``__spark_entry__.py``.

Each family module exposes ``QUERIES: dict[name, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name, sql]`` (oracle omitted for
genuinely approximate / non-SQL-expressible outputs — the driver then
records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_FAMILIES = (
    "tdigest_q",
    "relational_q",
    "sketch_q",
    "webpages_q",
    "dedup_q",
    "text_q",
    "similarity_q",
    "multimodal_q",
    "pipeline_q",
)


def registry() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    import importlib

    queries: dict = {}
    oracles: dict = {}
    for fam in _FAMILIES:
        try:
            mod = importlib.import_module(f"tdigest_spark.queries.{fam}")
        except ModuleNotFoundError:
            continue
        for k, v in mod.QUERIES.items():
            assert k not in queries, f"duplicate query name {k}"
            queries[k] = v
        oracles.update(mod.ORACLES)
    return queries, oracles
