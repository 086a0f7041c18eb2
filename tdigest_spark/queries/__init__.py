"""Central query registry backing ``__spark_entry__.py``.

Each family module exposes ``QUERIES: dict[name, fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name, sql]`` (oracle omitted for
genuinely approximate / non-SQL-expressible outputs — the driver then
records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# registration order = the order the driver evaluates queries; cheap
# families first and the expensive candidate-generation families last,
# so a driver-side time budget cuts into the costliest re-runnable
# queries, not the cheap long tail (round 1 lost the last 3 rows)
_FAMILIES = (
    "tdigest_q",
    "multimodal_q",
    "streaming_q",
    "pipeline_q",
    "relational_q",
    "webpages_q",
    "text_q",
    "sketch_q",
    "similarity_q",
    "dedup_q",
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
