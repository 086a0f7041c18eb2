"""Distributed t-digest aggregation — the partial/merge UDAF shape.

PySpark has no Python UDAF with an exposed merge state, so the
partial+final aggregate the reference models as ``Monoid``/``Reducer``
(``Tree/Internal.hs:65-77``, bench parallel fold
``tdigest-bench/src/Simple.hs:289-295``) is built explicitly:

  stage 1  ``mapInPandas``  — one digest per (input partition x group),
           built per Arrow batch and merged lazily inside the partition.
           This is the map-side combine: raw rows never shuffle, only
           O(delta)-sized digest structs do.
  stage 2  ``groupBy(keys).applyInPandas`` — merge partials per group.
           For global (ungrouped) sketches or extreme partition counts,
           a salted intermediate level bounds reducer fan-in
           (tree-reduce; north_rule's explicit skew/salt handling).

Plan shape at scale: scan (column-pruned to keys+value) -> Python
partial agg (no shuffle) -> shuffle of ~n_partitions*n_groups tiny
structs -> final merge. The shuffle volume is independent of row count,
so the job scales linearly with input and the merge tree depth bounds
any single reducer's fan-in.
"""

from __future__ import annotations

import math
import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tdigest_spark.sketch.tdigest import TDigest

DIGEST_TYPE = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType()), True),
        T.StructField("weights", T.ArrayType(T.DoubleType()), True),
        T.StructField("total_weight", T.DoubleType(), True),
        T.StructField("vmin", T.DoubleType(), True),
        T.StructField("vmax", T.DoubleType(), True),
        T.StructField("delta", T.IntegerType(), True),
    ]
)

_VALUE = "__td_value"
_WEIGHT = "__td_weight"
_SALT = "__td_salt"

_NAN = float("nan")


def canon_key(key: tuple) -> tuple:
    """Canonicalize a pandas groupby key tuple for use as a dict key:
    every float NaN is replaced with ONE module-level nan instance.
    Two groupbys over the same frame materialize *distinct* nan
    objects, and ``hash(nan)`` is id-based on py3.10+, so dict lookups
    keyed on raw groupby keys silently split a NaN-keyed group into
    duplicates; a shared instance restores identity-based equality, and
    emitting it writes an ordinary NaN."""
    return tuple(_NAN if isinstance(k, float) and k != k else k for k in key)

# auto-insert an intermediate merge level once the single final reduce
# would see more than this many partial digests (one per partition for
# a global sketch): above it, the one task's deserialize-everything
# cost dominates; below it, the extra stage costs more than it saves
AUTO_SALT_PARTIALS = 512


def _auto_salt(partials: DataFrame) -> int | None:
    """Balanced two-level fan-in (sqrt of the partial count) when the
    final single-task reduce would otherwise be the bottleneck — e.g.
    1e6 input partitions become 1000-way then 1000-way merges.

    The partial count must be read WITHOUT executing anything: under
    AQE, ``.rdd`` on a plan containing an Exchange materializes the
    upstream query stages eagerly (running those shuffles twice once
    the real action fires). So ``.rdd.getNumPartitions()`` is only used
    for exchange-free lineage (narrow ops over a scan — the common
    global-sketch shape, where it plans without running a job); plans
    with an Exchange use ``spark.sql.shuffle.partitions`` as the
    post-shuffle width bound instead."""
    plan = partials._jdf.queryExecution().executedPlan().toString()
    # match Exchange as a plan-node token (line start after tree
    # prefixes), not a bare substring that could hit unrelated plan text
    if re.search(r"(?m)^[\s+*:!-]*Exchange", plan):
        try:
            n = int(partials.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            # e.g. "auto" under some AQE runtimes; .rdd would execute the
            # upstream stages, so assume wide and salt — an unnecessary
            # sqrt level costs one tiny extra stage, an absent one costs
            # a single-task reduce over every partial
            n = 4 * AUTO_SALT_PARTIALS
    else:
        n = partials.rdd.getNumPartitions()
    if n > AUTO_SALT_PARTIALS:
        return max(2, math.isqrt(n))
    return None


def _merge_rows(rows: Sequence, compress: bool = True) -> dict:
    d = TDigest.merge_all([TDigest.from_row(r) for r in rows])
    # non-final levels ship at working delta (see ship_compressed):
    # small on the wire, and strictly better accuracy than either
    # shipping the lazy concat or over-compressing to the public delta
    d = d.compressed() if compress else d.ship_compressed()
    return d.to_row()


def tdigest_agg(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    delta: int = 200,
    weight_col: str | None = None,
    digest_col: str = "digest",
    salt: int | None = None,
    merge_engine: str = "sql",
    build_engine: str = "pandas",
) -> DataFrame:
    """Aggregate ``value_col`` into one t-digest per group.

    Returns a DataFrame ``by... , digest_col struct`` with exactly one
    row per group (one row total when ``by`` is empty).

    ``salt``: intermediate merge fan-in for groups whose partial count
    is huge (e.g. 1e5 input partitions) or whose keys are skewed —
    partials are first merged within ``hash(partition) % salt``
    buckets, then across buckets (two-level tree merge). ``None``
    (default) = automatic for GLOBAL sketches: when the partial count
    exceeds ``AUTO_SALT_PARTIALS`` a balanced sqrt-fan-in level is
    inserted, so a million-partition scan never funnels a million
    structs into one final task. Pass ``0`` to force single-level.

    ``merge_engine`` (grouped only): ``"sql"`` (default — pure JVM
    expression merge, ~10x faster at thousands of groups AND measured
    unbiased at mid-quantiles: avg p50 error 0.00 vs -1.2% for the
    greedy pass over 10k uniform groups, BENCH.md §1d) or ``"pandas"``
    (the greedy vector merge in the Python worker, kept for parity with
    the reference's sequential algorithm).

    ``build_engine``: ``"pandas"`` (default — vectorized partial build,
    shuffle shrinks to O(partitions x groups) structs) or ``"sql"``
    (:func:`tdigest_agg_sql` — all-JVM, for the high-cardinality regime
    where groups ~ rows and partial aggregation reduces nothing).
    """
    if build_engine == "sql":
        return tdigest_agg_sql(
            df, value_col, by=by, delta=delta, weight_col=weight_col,
            digest_col=digest_col,
        )
    by = list(by)
    cols = [F.col(c) for c in by] + [F.col(value_col).cast("double").alias(_VALUE)]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias(_WEIGHT))
    src = df.select(*cols)

    out_schema = T.StructType(
        [src.schema[c] for c in by] + [T.StructField(digest_col, DIGEST_TYPE, True)]
    )

    def build_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[tuple, TDigest] = {}
        for pdf in batches:
            if by:
                for key, g in pdf.groupby(by, sort=False, dropna=False):
                    key = canon_key(key if isinstance(key, tuple) else (key,))
                    w = g[_WEIGHT].to_numpy() if weight_col else None
                    d = TDigest.from_values(g[_VALUE].to_numpy(), delta, weights=w)
                    accs[key] = accs[key].merge(d) if key in accs else d
            else:
                w = pdf[_WEIGHT].to_numpy() if weight_col else None
                d = TDigest.from_values(pdf[_VALUE].to_numpy(), delta, weights=w)
                accs[()] = accs[()].merge(d) if () in accs else d
        if not accs:
            return
        data: dict[str, list] = {c: [] for c in by}
        data[digest_col] = []
        for key, d in accs.items():
            for c, k in zip(by, key):
                data[c].append(k)
            # one compress to the WORKING delta before the shuffle:
            # ~LAZY_REL/WORK_MULT-fold smaller wire size AND better
            # final accuracy than shipping the lazy concat (mid-chain
            # compress passes dominate deep-chain rank error)
            data[digest_col].append(d.ship_compressed().to_row())
        yield pd.DataFrame(data)

    partials = src.mapInPandas(build_partials, out_schema)

    def merge_partials(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {c: [pdf[c].iloc[0]] for c in by}
        out[digest_col] = [_merge_rows(list(pdf[digest_col]))]
        return pd.DataFrame(out)

    if salt is None and not by:
        salt = _auto_salt(partials)
    if salt:
        salted_schema = T.StructType(
            [T.StructField(_SALT, T.IntegerType(), False)] + list(out_schema.fields)
        )
        # one partial per (input partition x key) -> spreading by source
        # partition id gives a balanced, deterministic bucket assignment
        lvl1 = partials.withColumn(
            _SALT, (F.spark_partition_id() % salt).cast("int")
        )

        def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
            out = {_SALT: [pdf[_SALT].iloc[0]]}
            for c in by:
                out[c] = [pdf[c].iloc[0]]
            out[digest_col] = [_merge_rows(list(pdf[digest_col]), compress=False)]
            return pd.DataFrame(out)

        mid = lvl1.groupBy(_SALT, *by).applyInPandas(merge_salted, salted_schema)
        partials = mid.drop(_SALT)

    if by:
        if merge_engine == "sql":
            return tdigest_merge_agg_sql(
                partials, by=by, digest_col=digest_col, delta=delta
            )
        return partials.groupBy(*by).applyInPandas(merge_partials, out_schema)
    # global sketch: single final reduce over (salted-or-not) partials
    return partials.repartition(1).mapInPandas(
        lambda it: iter(
            [
                pd.DataFrame(
                    {digest_col: [_merge_rows([r for pdf in it for r in pdf[digest_col]])]}
                )
            ]
        ),
        T.StructType([T.StructField(digest_col, DIGEST_TYPE, True)]),
    )


def tdigest_merge_agg(
    df: DataFrame,
    by: Sequence[str] = (),
    digest_col: str = "digest",
    salt: int | None = None,
) -> DataFrame:
    """Merge an existing digest column (the reference's ``<>``/``mconcat``,
    ``Tree/Internal.hs:143-153``): one merged digest per group.

    Same partial/final shape as :func:`tdigest_agg` — partition-local
    merges first, so only one digest per (partition x group) shuffles.
    ``salt`` as in :func:`tdigest_agg`: ``None`` auto-inserts a sqrt
    intermediate level for GLOBAL merges over many partitions, ``0``
    forces single-level.
    """
    by = list(by)
    out_schema = T.StructType(
        [df.schema[c] for c in by] + [T.StructField(digest_col, DIGEST_TYPE, True)]
    )
    src = df.select(*by, digest_col)

    def partial_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[tuple, TDigest] = {}
        for pdf in batches:
            groups = (
                pdf.groupby(by, sort=False, dropna=False) if by else [((), pdf)]
            )
            for key, g in groups:
                key = canon_key(key if isinstance(key, tuple) else (key,))
                d = TDigest.merge_all([TDigest.from_row(r) for r in g[digest_col]])
                accs[key] = accs[key].merge(d) if key in accs else d
        if not accs:
            return
        data: dict[str, list] = {c: [] for c in by}
        data[digest_col] = []
        for key, d in accs.items():
            for c, k in zip(by, key):
                data[c].append(k)
            data[digest_col].append(d.ship_compressed().to_row())
        yield pd.DataFrame(data)

    partials = src.mapInPandas(partial_merge, out_schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {c: [pdf[c].iloc[0]] for c in by}
        out[digest_col] = [_merge_rows(list(pdf[digest_col]))]
        return pd.DataFrame(out)

    if by:
        return partials.groupBy(*by).applyInPandas(final, out_schema)
    if salt is None:
        salt = _auto_salt(partials)
    if salt:
        # intermediate level: partial_merge is idempotent over digest
        # rows, so re-running it after a salt-width repartition merges
        # each bucket down to one struct before the final reduce
        partials = partials.repartition(salt).mapInPandas(partial_merge, out_schema)
    return partials.repartition(1).mapInPandas(
        lambda it: iter(
            [
                pd.DataFrame(
                    {digest_col: [_merge_rows([r for pdf in it for r in pdf[digest_col]])]}
                )
            ]
        ),
        T.StructType([T.StructField(digest_col, DIGEST_TYPE, True)]),
    )


def tdigest_merge_agg_sql(
    df: DataFrame,
    by: Sequence[str] = (),
    digest_col: str = "digest",
    delta: int | None = None,
) -> DataFrame:
    """Digest merge + k1 compression entirely in JVM expressions — the
    pandas-free merge stage (SURVEY.md §8 round-2 candidate, now done).

    Instead of the greedy sequential pass (``merge``,
    ``Vector/Internal.hs:142-167``), centroids get a closed-form
    cluster id ``floor(ksize(q_mid, delta))`` from their mid-rank —
    the ksize function is monotone, so clusters partition the sorted
    centroid order and every cluster's q-width is <= 1/delta: a valid
    t-digest construction with the same published rank-error bound
    (boundaries differ slightly from the greedy pass, values agree
    within bound; identical — exact — in lossless mode where every
    centroid keeps its own cluster).

    Physical plan: explode (generate) -> window cumsum per group ->
    hash-agg weighted means -> sort_array(collect_list) rebuild.
    Everything whole-stage-codegen except the window sort; no Python
    worker is involved, so this path wins when group count is large
    (no Arrow hop, no per-group pandas overhead).

    KEYLESS merges (``by=[]``) run TWO levels: the centroid rows are
    first clustered within ``spark_partition_id() % s`` salt buckets
    (k1 clustering is itself a valid re-compression, so the composition
    stays within the published bound — and is exact in lossless mode),
    then the bounded O(s x delta) survivors go through the final
    keyless pass. Without this, the final window's empty partition spec
    would sort EVERY input centroid in one task — O(groups x delta)
    rows for a cube/rollup grand total.
    """
    by = list(by)
    ex = _explode_digests(df, by, digest_col)
    if not by:
        salt = "__td_msalt"
        try:
            s = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            s = 32
        s = max(2, min(64, s))
        # intermediate level clusters at the WORKING delta (2x public,
        # same policy as ship_compressed) so the double compression
        # doesn't compound error; the final pass enforces the public
        # delta. With delta=None the working factor applies to the
        # CARRIED per-group max delta instead.
        salted = ex.withColumn(salt, F.spark_partition_id() % F.lit(s))
        if delta is None:
            mid = _k1_cluster_rebuild(
                salted, [salt], digest_col, None, carried_mult=TDigest.WORK_MULT
            )
        else:
            mid = _k1_cluster_rebuild(
                salted, [salt], digest_col, TDigest.WORK_MULT * delta
            )
        ex = _explode_digests(mid.select(digest_col), [], digest_col)
    return _k1_cluster_rebuild(ex, by, digest_col, delta)


def _explode_digests(
    df: DataFrame, by: Sequence[str], digest_col: str
) -> DataFrame:
    """Digest structs -> weighted centroid rows (``__m``, ``__w`` plus
    the ``__vmin``/``__vmax``/``__delta`` carries) per group — the input
    shape of :func:`_k1_cluster_rebuild`."""
    c = F.col
    return df.select(
        *by,
        c(f"{digest_col}.delta").alias("__delta"),
        c(f"{digest_col}.vmin").alias("__vmin"),
        c(f"{digest_col}.vmax").alias("__vmax"),
        # explode_outer, not explode: an EMPTY digest (all-null group)
        # must keep its group row — it yields one null centroid that is
        # filtered out at rebuild, preserving the NULL-stats semantics
        F.explode_outer(
            F.arrays_zip(
                c(f"{digest_col}.means").alias("m"),
                c(f"{digest_col}.weights").alias("w"),
            )
        ).alias("__c"),
    ).select(
        *by,
        "__delta",
        "__vmin",
        "__vmax",
        c("__c.m").alias("__m"),
        c("__c.w").alias("__w"),
    )


def _k1_cluster_rebuild(
    ex: DataFrame, by: Sequence[str], digest_col: str, delta: int | None,
    carried_mult: int = 1,
) -> DataFrame:
    """The JVM k1 clustering core: ``ex`` rows are weighted points
    (``__m``, ``__w``, plus ``__vmin``/``__vmax``/``__delta`` carries)
    per group; assign each its closed-form cluster id from mid-rank,
    aggregate clusters, rebuild digest structs. Shared by the digest
    MERGE (exploded centroids) and the direct SQL BUILD (raw rows as
    singletons). ``carried_mult`` scales the CARRIED delta (the
    delta=None path) for working-delta intermediate passes — the
    stamped ``delta`` field stays the carried public value."""
    by = list(by)
    c = F.col
    from pyspark.sql import Window as W

    keys = [c(k) for k in by]
    # ROWS frame, not the default RANGE: tied means must accumulate
    # row-by-row or the cumsum jumps over the whole tie group
    win = (
        W.partitionBy(*keys)
        .orderBy(c("__m"), c("__w"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy(*keys)
    d_out = (
        F.lit(delta).cast("double")
        if delta is not None
        else F.max("__delta").over(tot).cast("double") * F.lit(float(carried_mult))
    )
    cum = F.sum("__w").over(win) - c("__w") / 2.0
    tw = F.sum("__w").over(tot)
    q = F.least(F.greatest(cum / tw, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    # ksize k1 (Vector/Internal.hs:106-116): delta*(asin(2q-1)/pi + 1/2)
    kcl = F.floor(d_out * (F.asin(2.0 * q - 1.0) / math.pi + 0.5))

    clustered = ex.select(*by, "__delta", "__vmin", "__vmax", "__m", "__w", kcl.alias("__k"))
    agg = clustered.groupBy(*by, "__k").agg(
        (F.sum(c("__m") * c("__w")) / F.sum("__w")).alias("__cm"),
        F.sum("__w").alias("__cw"),
        F.min("__vmin").alias("__vmin"),
        F.max("__vmax").alias("__vmax"),
        F.min("__delta").alias("__delta"),
    )
    rebuilt = agg.groupBy(*by).agg(
        F.sort_array(F.collect_list(F.struct(c("__cm").alias("m"), c("__cw").alias("w")))).alias("__arr"),
        F.min("__vmin").alias("__vmin"),
        F.max("__vmax").alias("__vmax"),
        F.min("__delta").alias("__delta"),
    )
    # drop the null centroid an empty digest contributes (explode_outer)
    arr = F.filter("__arr", lambda x: x["m"].isNotNull() & x["w"].isNotNull())
    digest_struct = F.struct(
        F.transform(arr, lambda x: x["m"]).alias("means"),
        F.transform(arr, lambda x: x["w"]).alias("weights"),
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["w"]).alias(
            "total_weight"
        ),
        c("__vmin").alias("vmin"),
        c("__vmax").alias("vmax"),
        (F.lit(delta) if delta is not None else c("__delta")).cast("int").alias("delta"),
    )
    return rebuilt.select(*by, digest_struct.alias(digest_col))


def tdigest_agg_sql(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    delta: int = 200,
    weight_col: str | None = None,
    digest_col: str = "digest",
) -> DataFrame:
    """Build digests ENTIRELY in JVM expressions: each row is a
    singleton centroid fed straight into the k1 closed-form clustering
    (:func:`_k1_cluster_rebuild`) — no Python stage at all.

    When to use which build engine: the pandas partial build
    (:func:`tdigest_agg`) shrinks the shuffle to O(partitions x groups)
    structs — the right plan when groups are FEW relative to rows
    (map-side combining does real work). When group cardinality
    approaches the row count (e.g. 1e5+ groups, a handful of rows per
    group per partition), partial aggregation reduces nothing: the
    shuffle is O(rows) either way, and the Python stage is pure
    overhead — this path drops it and lets Tungsten sort/aggregate raw
    (key, value, weight) rows (measured ~4x faster at 1e5 groups,
    BENCH.md). Same construction validity and rank-error bound as
    ``tdigest_merge_agg_sql`` (cluster q-widths <= 1/delta); exact in
    lossless mode. NULL and NaN values are dropped, and with a
    ``weight_col`` so are NULL/NaN/non-positive weights — the exact
    filter ``TDigest.from_values`` applies, so both build engines see
    the same rows (an unfiltered NaN would sort last in the window and
    poison its cluster's weighted mean; w <= 0 would corrupt
    total_weight). A group whose values are ALL dropped is absent from
    the output (the pandas path emits an empty digest instead — the
    one semantic difference).
    """
    by = list(by)
    if not by:
        # the ungrouped window would sort EVERY raw row in one task —
        # the global regime belongs to the partial build + auto-salt
        raise ValueError(
            "tdigest_agg_sql requires grouping keys (by=...): for a "
            "global digest use the default partial build, whose merge "
            "tree auto-salts at high partition counts"
        )
    c = F.col
    v = c(value_col).cast("double")
    keep = v.isNotNull() & ~F.isnan(v)
    if weight_col is not None:
        w = c(weight_col).cast("double")
        keep = keep & w.isNotNull() & ~F.isnan(w) & (w > 0)
    else:
        w = F.lit(1.0)
    ex = df.where(keep).select(
        *by,
        F.lit(delta).alias("__delta"),
        v.alias("__vmin"),
        v.alias("__vmax"),
        v.alias("__m"),
        w.alias("__w"),
    )
    return _k1_cluster_rebuild(ex, by, digest_col, delta)


# ---------------------------------------------------------------------------
# query/stat extraction over digest rows
# ---------------------------------------------------------------------------

_STAT_ARITY = {
    "quantile": 1,
    "median": 0,
    "icdf": 1,
    "cdf": 1,
    "mean": 0,
    "variance": 0,
    "stddev": 0,
    "trimmed_mean": 2,
    "total_weight": 0,
    "vmin": 0,
    "vmax": 0,
    "size": 0,
}


def _eval_stat(d: TDigest, stat: str, args: tuple):
    if stat == "total_weight":
        return d.total_weight if not d.is_empty() else 0.0
    if stat == "vmin":
        return d.vmin if not d.is_empty() else None
    if stat == "vmax":
        return d.vmax if not d.is_empty() else None
    if stat == "size":
        return float(d.size)
    return getattr(d, stat)(*args)


def tdigest_stats(
    df: DataFrame, spec: dict[str, tuple], digest_col: str = "digest"
) -> DataFrame:
    """Evaluate rank statistics on a digest column.

    ``spec`` maps output column name -> (stat, *args), e.g.::

        {"median": ("quantile", 0.5), "p99": ("quantile", 0.99),
         "mu": ("mean",), "tm": ("trimmed_mean", 0.1, 0.9)}

    Runs as one vectorized pass per Arrow batch; digests are tiny
    (O(delta)) so this is driver-light and fully distributed.

    Digest-aware rewrite (the SURVEY §8 fusion slice): calling
    ``tdigest_stats`` on a DataFrame that IS a ``tdigest_stats`` result
    over the same digest column does not stack a second Python stage —
    the call is rebuilt from the original input with the union of both
    specs, so any chain of stats calls over one digest column collapses
    to ONE ``mapInPandas`` (each extra Python stage at 100 TB is an
    extra Arrow serialize/deserialize of every row). Output columns and
    values are identical to the unfused chain; the fusion is skipped if
    an output name would collide with a differing spec. Before/after
    plans: PLANS.md §6.
    """
    origin = getattr(df, "_td_stats_origin", None)
    if origin is not None:
        src, prev_spec, prev_digest = origin
        if prev_digest == digest_col:
            clash = [k for k, v in spec.items() if prev_spec.get(k, v) != v]
            if clash:
                raise ValueError(
                    f"tdigest_stats fusion: output column(s) {clash} already "
                    "defined with a different spec in the chained call"
                )
            return tdigest_stats(src, {**prev_spec, **spec}, digest_col)
    if digest_col not in df.columns:
        raise ValueError(
            f"tdigest_stats: no {digest_col!r} column (stats outputs drop it; "
            "chain stats calls directly on a tdigest_stats result to fuse, or "
            "evaluate all specs in one call)"
        )
    keep = [c for c in df.columns if c != digest_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField(name, T.DoubleType(), True) for name in spec]
    )

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            digests = [TDigest.from_row(r) for r in pdf[digest_col]]
            for name, (stat, *args) in spec.items():
                out[name] = [
                    _eval_stat(d, stat, tuple(args)) for d in digests
                ]
                out[name] = out[name].astype("float64")
            yield out

    out = df.mapInPandas(evaluate, out_schema)
    # remember the provenance so a chained tdigest_stats call can fuse
    # with this one instead of adding a second Python stage. NOTE: the
    # fused rebuild drops the digest column like this call does, so it
    # is only recorded when a chained call could actually reuse it
    out._td_stats_origin = (df, dict(spec), digest_col)
    return out


def tdigest_cdf_at(
    df: DataFrame,
    probe_col: str | dict[str, str],
    out_col: str = "cdf",
    digest_col: str = "digest",
) -> DataFrame:
    """cdf evaluated at per-row probe column(s) (digest and probe in
    the same row, e.g. after joining probes onto group digests).
    ``probe_col`` may be one column name (result in ``out_col``) or a
    mapping ``out_col -> probe_col`` evaluating several probes in the
    SAME pass (one Python stage, not one per probe)."""
    probes = {out_col: probe_col} if isinstance(probe_col, str) else dict(probe_col)
    keep = [c for c in df.columns if c != digest_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [T.StructField(oc, T.DoubleType(), True) for oc in probes]
    )

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            digests = [TDigest.from_row(r) for r in pdf[digest_col]]
            for oc, pc in probes.items():
                vals = pdf[pc].to_numpy()
                out[oc] = [d.cdf(float(x)) for d, x in zip(digests, vals)]
                out[oc] = out[oc].astype("float64")
            yield out

    return df.mapInPandas(evaluate, out_schema)


# Broadcast regime bound for the per-row scorers: a digest table is
# ~3 KB/group at delta=200, so 1e5 groups ~ 300 MB of driver+broadcast
# traffic — beyond this the scorers auto-route to the shuffle-join form.
MAX_BROADCAST_GROUPS = 100_000


def _digest_head(
    digests: DataFrame, by: list, digest_col: str, limit: int
) -> list | None:
    """Fetch up to ``limit + 1`` digest rows. Returns the FULL row list
    when the table fits the broadcast regime (head(n) returns all rows
    when total <= n), else None — the caller must switch to the
    shuffle-join path. The probe job short-circuits via CollectLimit's
    incremental partition scan; in the join regime the digest agg runs
    once more inside the join job (documented cost of not persisting)."""
    head = digests.select(*by, digest_col).head(limit + 1)
    return head if len(head) <= limit else None


def _digest_blob_table(digests: DataFrame, by: list, digest_col: str) -> DataFrame:
    """Digest structs -> compact blobs, computed DISTRIBUTEDLY (no
    driver collect) with prefixed key columns for a null-safe join."""
    out_schema = T.StructType(
        [
            T.StructField(f"__k_{c}", digests.schema[c].dataType, True)
            for c in by
        ]
        + [T.StructField("__blob", T.BinaryType(), True)]
    )

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({f"__k_{c}": pdf[c] for c in by})
            out["__blob"] = [
                None if d is None else TDigest.from_row(d).to_bytes()
                for d in pdf[digest_col]
            ]
            yield out

    return digests.select(*by, digest_col).mapInPandas(conv, out_schema)


def _score_joined(
    rows: DataFrame,
    digests: DataFrame,
    by: list,
    digest_col: str,
    out_col: str,
    make_scorer,
) -> DataFrame:
    """Shuffle-join scoring path (the above-regime form): the digest
    table is blob-compacted distributedly, null-safe-joined onto the
    rows (one shuffle of the rows by the group keys; AQE may split
    skewed keys since no downstream grouping exists), and scored by one
    mapInPandas whose per-task digest cache decodes each group's blob
    once. ``make_scorer()`` returns ``f(digest, values) -> ndarray``
    given the decoded TDigest."""
    import numpy as np

    blobs = _digest_blob_table(digests, by, digest_col)
    cond = None
    for c in by:
        clause = rows[c].eqNullSafe(blobs[f"__k_{c}"])
        cond = clause if cond is None else cond & clause
    joined = rows.join(blobs, cond, "left")
    orig_cols = [f.name for f in rows.schema.fields]
    out_schema = T.StructType(
        list(rows.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = make_scorer()
        cache: dict[tuple, TDigest] = {}
        for pdf in batches:
            out = pdf[orig_cols].copy()
            res = np.full(len(pdf), np.nan)
            vals = scorer.values(pdf)
            # group by the ROWS' OWN keys, not the joined __k_ columns:
            # a digest-less group's __k_ values are NULL (left-join
            # miss) and would collide with the genuine NULL-key group
            groups = pdf.groupby(by, sort=False, dropna=False).indices
            for gk, idx in groups.items():
                key = _null_nan_key(gk if isinstance(gk, tuple) else (gk,))
                dig = cache.get(key)
                if dig is None:
                    blob = pdf["__blob"].iloc[idx[0]]
                    if blob is None or (isinstance(blob, float) and blob != blob):
                        continue
                    dig = cache.setdefault(key, TDigest.from_bytes(bytes(blob)))
                res[idx] = scorer.score(dig, vals[idx])
            out[out_col] = res
            yield out

    return joined.mapInPandas(score, out_schema)


class _CdfScorer:
    """cdf_many per group digest (with_percentile_rank's kernel)."""

    def __init__(self, value_col: str, ref_blob: bytes | None = None):
        self._value_col = value_col
        self._ref = TDigest.from_bytes(ref_blob) if ref_blob is not None else None

    def values(self, pdf: pd.DataFrame):
        import numpy as np

        return pdf[self._value_col].to_numpy(dtype=np.float64, na_value=np.nan)

    def score(self, dig: TDigest, vals):
        ranks = dig.cdf_many(vals)
        return ranks if self._ref is None else self._ref.quantiles(ranks)


def with_percentile_rank(
    rows: DataFrame,
    digests: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    out_col: str = "pct_rank",
    digest_col: str = "digest",
    max_broadcast_groups: int = MAX_BROADCAST_GROUPS,
) -> DataFrame:
    """Score EVERY row with its group digest's mid-rank cdf at the
    row's value — the per-row companion of :func:`tdigest_cdf_at`, and
    the curation-filter building block ("keep documents above their
    language's p90 quality") without computing thresholds first.

    Scale shape: the digest table is O(groups x delta), so it is
    collected ONCE, serialized to compact blobs, and broadcast as plain
    data; the raw rows are then scored in place by one mapInPandas
    stage using the vectorized ``cdf_many`` kernel. The rows are never
    shuffled or joined — a broadcast JOIN + :func:`tdigest_cdf_at`
    would instead push one O(delta) digest-struct copy PER ROW through
    Arrow. Rows whose group has no digest (or a NULL digest) get NULL;
    NULL and NaN group keys are conflated for the lookup (the module's
    pandas-groupby NaN policy).

    Regime bound, AUTO-ROUTED: the broadcast is O(groups x delta) —
    ~3 KB/group at delta=200, fine to ~1e5 groups
    (``max_broadcast_groups``). A head(limit+1) probe counts the digest
    table; above the limit the scorer switches to the shuffle-join form
    (:func:`_score_joined`): digest blobs stay distributed, the rows
    shuffle ONCE by the group keys, and no executor ever materializes
    the whole digest table. Identical output either way (tested with a
    forced low threshold).
    """
    import numpy as np

    by = list(by)
    head = _digest_head(digests, by, digest_col, max_broadcast_groups)
    if head is None:
        if not by:
            raise AssertionError("keyless digest table cannot exceed one row")
        return _score_joined(
            rows, digests, by, digest_col, out_col,
            lambda: _CdfScorer(value_col),
        )
    blobs: dict[tuple, bytes] = {}
    for r in head:
        if r[digest_col] is None:
            continue
        key = _null_nan_key(tuple(r[c] for c in by))
        blobs[key] = TDigest.from_row(r[digest_col].asDict()).to_bytes()
    bc = rows.sparkSession.sparkContext.broadcast(blobs)
    out_schema = T.StructType(
        list(rows.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple, TDigest] = {}
        for pdf in batches:
            out = pdf.copy()
            res = np.full(len(pdf), np.nan)
            vals = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            if by:
                groups = pdf.groupby(by, sort=False, dropna=False).indices
            else:
                groups = {(): np.arange(len(pdf))}
            for gk, idx in groups.items():
                key = _null_nan_key(gk if isinstance(gk, tuple) else (gk,))
                blob = bc.value.get(key)
                if blob is None:
                    continue
                dig = cache.get(key)
                if dig is None:
                    dig = cache.setdefault(key, TDigest.from_bytes(blob))
                res[idx] = dig.cdf_many(vals[idx])
            out[out_col] = res
            yield out

    return rows.mapInPandas(score, out_schema)


def quantile_normalize(
    rows: DataFrame,
    value_col: str,
    by: Sequence[str],
    out_col: str = "normalized",
    delta: int = 200,
    group_digests: DataFrame | None = None,
    reference: DataFrame | None = None,
    digest_col: str = "digest",
    max_broadcast_groups: int = MAX_BROADCAST_GROUPS,
) -> DataFrame:
    """Map every row's value onto the REFERENCE distribution at the
    row's within-group rank: ``out = Q_ref(F_group(v))`` — quantile
    normalization, the batch-effect-correction move ("make every
    source's feature distribution comparable before training a filter
    on it"). After normalization each group's values follow the
    reference distribution while preserving within-group order.

    ``reference`` is a ONE-row digest table (default: a digest over
    ALL rows — normalize every group onto the pooled distribution);
    ``group_digests`` defaults to per-``by`` digests built from
    ``rows``. Same scale shape AND auto-routing as
    :func:`with_percentile_rank`: below ``max_broadcast_groups`` both
    digest tables are collected once and broadcast as blobs and the
    rows are scored in place (never shuffled); above it the group
    digests stay distributed and the rows shuffle once through the
    null-safe join form (the one-row reference is always broadcast).
    NULL/NaN values, and rows whose group has no digest, get NULL."""
    import numpy as np

    by = list(by)
    if not by:
        raise ValueError("quantile_normalize needs group keys (else it is identity)")
    if group_digests is None:
        group_digests = tdigest_agg(rows, value_col, by=by, delta=delta)
    if reference is None:
        reference = tdigest_agg(rows, value_col, by=(), delta=delta)
    ref_rows = reference.select(digest_col).collect()
    if len(ref_rows) != 1 or ref_rows[0][digest_col] is None:
        raise ValueError("reference must be a one-row digest table")
    ref_blob = TDigest.from_row(ref_rows[0][digest_col].asDict()).to_bytes()
    head = _digest_head(group_digests, by, digest_col, max_broadcast_groups)
    if head is None:
        return _score_joined(
            rows, group_digests, by, digest_col, out_col,
            lambda: _CdfScorer(value_col, ref_blob),
        )
    blobs: dict[tuple, bytes] = {}
    for r in head:
        if r[digest_col] is not None:
            key = _null_nan_key(tuple(r[c] for c in by))
            blobs[key] = TDigest.from_row(r[digest_col].asDict()).to_bytes()
    bc = rows.sparkSession.sparkContext.broadcast((blobs, ref_blob))
    out_schema = T.StructType(
        list(rows.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        group_blobs, rblob = bc.value
        ref = TDigest.from_bytes(rblob)
        cache: dict[tuple, TDigest] = {}
        for pdf in batches:
            out = pdf.copy()
            res = np.full(len(pdf), np.nan)
            vals = pdf[value_col].to_numpy(dtype=np.float64, na_value=np.nan)
            groups = pdf.groupby(by, sort=False, dropna=False).indices
            for gk, idx in groups.items():
                key = _null_nan_key(gk if isinstance(gk, tuple) else (gk,))
                blob = group_blobs.get(key)
                if blob is None:
                    continue
                dig = cache.get(key)
                if dig is None:
                    dig = cache.setdefault(key, TDigest.from_bytes(blob))
                res[idx] = ref.quantiles(dig.cdf_many(vals[idx]))
            out[out_col] = res
            yield out

    return rows.mapInPandas(score, out_schema)


def filter_percentile_range(
    rows: DataFrame,
    digests: DataFrame,
    value_col: str,
    lo: float = 0.0,
    hi: float = 1.0,
    by: Sequence[str] = (),
    keep_rank: str | None = None,
    digest_col: str = "digest",
) -> DataFrame:
    """Keep rows whose value sits inside [``lo``, ``hi``] of their OWN
    group's distribution — the quantile-trimming move of a curation
    pipeline ("drop each language's bottom 10% and top 1% by quality")
    as one operator: :func:`with_percentile_rank` scores rows in place
    against the broadcast digest table, then a codegen filter trims.
    Rows whose group has no digest score NULL and are DROPPED (no
    reference distribution = no basis to keep; surface such groups via
    a ``digest_drift(how="full")`` check, not silently here — this IS
    the documented policy, not an accident). ``keep_rank`` optionally
    retains the rank column for downstream use."""
    if not (0.0 <= lo <= hi <= 1.0):
        raise ValueError(f"need 0 <= lo <= hi <= 1, got lo={lo} hi={hi}")
    rank = keep_rank or "__pct_rank"
    scored = with_percentile_rank(
        rows, digests, value_col, by=by, out_col=rank, digest_col=digest_col
    )
    out = scored.filter(
        F.col(rank).isNotNull() & (F.col(rank) >= lo) & (F.col(rank) <= hi)
    )
    return out if keep_rank else out.drop(rank)


def with_equidepth_bucket(
    rows: DataFrame,
    value_col: str,
    n_buckets: int,
    by: Sequence[str] = (),
    digests: DataFrame | None = None,
    bucket_col: str = "bucket",
    delta: int = 200,
    digest_col: str = "digest",
    max_broadcast_groups: int = MAX_BROADCAST_GROUPS,
) -> DataFrame:
    """Equal-frequency bucket id (0..n_buckets-1) per row from its
    group's digest quantiles — the balanced-output primitive: bucket on
    a size column before ``write.partitionBy(bucket)`` and every output
    partition carries ~1/n of the rows no matter how skewed the value
    is; same trick gives a skew-free range partitioning for sorted
    writes without ``repartitionByRange``'s extra sampling scan.

    Bucket boundaries are the digest's i/n quantiles: bucket i covers
    (cut_i-1, cut_i], so ties land in one bucket (value-based split —
    equal counts up to tie mass and digest error; exact at lossless
    delta up to interpolation). NULL/NaN values, and rows whose group
    has no digest, get a NULL bucket.

    Scale shape, AUTO-ROUTED like :func:`with_percentile_rank`: below
    ``max_broadcast_groups`` the digest table is collected once,
    reduced driver-side to O(groups x n_buckets) cut arrays, and either
    inlined as a literal (global) or broadcast-joined (grouped); above
    it the cut arrays are computed DISTRIBUTEDLY (one mapInPandas over
    the digest table, never collected) and shuffle-joined onto the rows
    null-safely. Either way the assignment itself is a pure codegen
    array scan — NO Python stage touches the rows. Pass a precomputed
    ``digests`` table to skip the build scan entirely (e.g. the same
    digests already maintained by a
    :func:`~tdigest_spark.streaming.digest_stream.digest_sink`).
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    by = list(by)
    if digests is None:
        digests = tdigest_agg(rows, value_col, by=by, delta=delta, digest_col=digest_col)
    qs = [i / n_buckets for i in range(1, n_buckets)]

    v = F.col(value_col).cast("double")
    null_v = v.isNull() | F.isnan(v)

    def assign(arr):
        # arr may be NULL (group without a digest / empty cuts table);
        # size(filter(NULL)) is -1 under legacy sizeOfNull, so gate on
        # arr.isNotNull() to emit the documented NULL bucket instead.
        return F.when(
            arr.isNotNull() & ~null_v, F.size(F.filter(arr, lambda c: v > c))
        ).otherwise(F.lit(None).cast("int"))

    def join_cuts(cuts_df: DataFrame, broadcastable: bool) -> DataFrame:
        # eqNullSafe per key: a NULL-keyed group must still find its
        # cuts row (tdigest_agg DOES build a digest for the NULL
        # group), matching the _null_nan_key policy of the other
        # per-row scorers.
        cond = None
        for c in by:
            clause = rows[c].eqNullSafe(cuts_df[f"__ck_{c}"])
            cond = clause if cond is None else cond & clause
        right = F.broadcast(cuts_df) if broadcastable else cuts_df
        out = rows.join(right, cond, "left").withColumn(
            bucket_col, assign(F.col("__cuts"))
        )
        return out.drop("__cuts", *[f"__ck_{c}" for c in by])

    head = _digest_head(digests, by, digest_col, max_broadcast_groups)
    if head is None:
        if not by:
            raise AssertionError("keyless digest table cannot exceed one row")
        cut_schema = T.StructType(
            [
                T.StructField(f"__ck_{c}", digests.schema[c].dataType, True)
                for c in by
            ]
            + [T.StructField("__cuts", T.ArrayType(T.DoubleType()), True)]
        )

        def to_cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = pd.DataFrame({f"__ck_{c}": pdf[c] for c in by})
                arrs = []
                for d in pdf[digest_col]:
                    if d is None:
                        arrs.append(None)
                        continue
                    td = TDigest.from_row(d)
                    arrs.append(
                        [float(td.quantile(q)) for q in qs]
                        if td.total_weight > 0
                        else None
                    )
                out["__cuts"] = arrs
                yield out

        cuts_df = digests.select(*by, digest_col).mapInPandas(to_cuts, cut_schema)
        return join_cuts(cuts_df.where(F.col("__cuts").isNotNull()), False)

    cuts: dict[tuple, list[float]] = {}
    for r in head:
        if r[digest_col] is None:
            continue
        d = TDigest.from_row(r[digest_col].asDict())
        if d.total_weight <= 0:  # empty digest (e.g. all-NULL group)
            continue
        cuts[tuple(r[c] for c in by)] = [float(d.quantile(q)) for q in qs]

    if not by:
        arr = (
            F.array(*[F.lit(c) for c in next(iter(cuts.values()))]).cast(
                "array<double>"
            )
            if cuts
            else F.lit(None).cast("array<double>")
        )
        return rows.withColumn(bucket_col, assign(arr))

    spark = rows.sparkSession
    cut_schema = T.StructType(
        [
            T.StructField(f"__ck_{c}", rows.schema[c].dataType, True)
            for c in by
        ]
        + [T.StructField("__cuts", T.ArrayType(T.DoubleType()), False)]
    )
    cuts_df = spark.createDataFrame(
        [(*k, v_) for k, v_ in cuts.items()], cut_schema
    )
    return join_cuts(cuts_df, True)


class _NullKeySentinel:
    """Pickle-stable NULL/NaN group-key stand-in for lookup dicts that
    cross the driver->executor broadcast: ``hash(float('nan'))`` is
    id-based on py3.10+, so a nan pickled into a broadcast never
    hash-matches the executor-side nan and the lookup silently misses
    (NULL-keyed rows then score NULL despite having a digest).
    Unpickling this class returns the module singleton, so identity —
    and therefore hash — survives the hop. Lookup-only: never emitted
    into output (that is :func:`canon_key`'s float-NaN job)."""

    __slots__ = ()

    def __new__(cls):
        inst = getattr(cls, "_inst", None)
        if inst is None:
            inst = super().__new__(cls)
            cls._inst = inst
        return inst

    def __reduce__(self):
        return (_NullKeySentinel, ())

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return "<null-key>"


_NULL_KEY = _NullKeySentinel()


def _null_nan_key(key: tuple) -> tuple:
    """canon_key's lookup twin with None folded in: a NULL group key
    collects as None on the driver but surfaces as float NaN in a
    pandas batch; both must hit the same dict slot — including when
    the dict was built on the driver and broadcast (see
    :class:`_NullKeySentinel`)."""
    return tuple(
        _NULL_KEY if k is None or (isinstance(k, float) and k != k) else k
        for k in key
    )


def tdigest_histogram(
    df: DataFrame,
    digest_col: str = "digest",
    out_col: str = "histogram",
    include_density: bool = False,
) -> DataFrame:
    """Explode a digest into its midpoint bins
    (cf. ``Postprocess/Internal.hs:70-90``):
    array<struct<lo,hi,mid,weight,cum_weight[,density]>>.

    ``include_density`` adds a SECOND array column
    ``<out_col>_density`` of (lo, hi, density) structs from
    :meth:`TDigest.density_histogram` — the exact numbers behind
    tdigest-Chart's histogram render
    (``tdigest-Chart/src/.../TDigest.hs:86-89,134-147``); the series
    integrates to 1 over the bin widths. It is a separate column (not
    a field on the midpoint bins) because the density pass merges
    equal-mean centroids, so its bin count can differ."""
    bin_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
                T.StructField("mid", T.DoubleType()),
                T.StructField("weight", T.DoubleType()),
                T.StructField("cum_weight", T.DoubleType()),
            ]
        )
    )
    dens_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
                T.StructField("density", T.DoubleType()),
            ]
        )
    )
    keep = [c for c in df.columns if c != digest_col]
    out_fields = [df.schema[c] for c in keep] + [
        T.StructField(out_col, bin_type, True)
    ]
    if include_density:
        out_fields.append(T.StructField(f"{out_col}_density", dens_type, True))
    out_schema = T.StructType(out_fields)

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            bins, dens = [], []
            for r in pdf[digest_col]:
                td = TDigest.from_row(r)
                bins.append(
                    [
                        {"lo": lo, "hi": hi, "mid": mid, "weight": w,
                         "cum_weight": cw}
                        for (lo, hi, mid, w, cw) in td.histogram()
                    ]
                )
                if include_density:
                    dens.append(
                        [
                            {"lo": lo, "hi": hi, "density": d}
                            for (lo, hi, d) in td.density_histogram()
                        ]
                    )
            out[out_col] = bins
            if include_density:
                out[f"{out_col}_density"] = dens
            yield out

    return df.mapInPandas(evaluate, out_schema)


def tdigest_sliding(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    window_sec: int,
    slide_sec: int,
    by: Sequence[str] = (),
    delta: int = 200,
    digest_col: str = "digest",
) -> DataFrame:
    """Sliding event-time window digests via PANES: rows aggregate once
    into gcd(window, slide)-sized tumbling pane digests, then each pane
    digest is exploded to the window/slide sliding windows it belongs
    to and merged per (window_start, keys) — the classic pane
    optimization: raw rows are aggregated exactly once (vs the
    window/slide-fold row duplication of ``groupBy(window(ts, w, s))``),
    and only O(panes x delta) digest rows fan out.

    Windows are epoch-aligned like Spark's ``window()``. Output:
    (window_start timestamp, by..., digest). Exact in lossless mode
    (digest merge is associative), within the k1 bound otherwise.
    """
    by = list(by)
    pane_sec = math.gcd(int(window_sec), int(slide_sec))
    # cast handles TIMESTAMP_NTZ inputs (unix_micros requires TIMESTAMP;
    # session tz is UTC so the wall time is preserved)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    src = df.select(
        F.floor(t_us / (pane_sec * 1_000_000)).alias("__pane"),
        *by,
        F.col(value_col),
    )
    panes = tdigest_agg(src, value_col, by=["__pane", *by], delta=delta,
                        digest_col=digest_col)
    return panes_to_sliding(
        panes, pane_sec, window_sec, slide_sec, by=by,
        digest_col=digest_col, delta=delta,
    )


def panes_to_sliding(
    panes: DataFrame,
    pane_sec: int,
    window_sec: int,
    slide_sec: int,
    by: Sequence[str] = (),
    digest_col: str = "digest",
    pane_col: str = "__pane",
    delta: int | None = None,
) -> DataFrame:
    """Derive SLIDING-window digests from tumbling PANE digests by
    associative merge — the second half of :func:`tdigest_sliding`,
    public so a pane table built ANY way (the batch path above, or a
    streaming job emitting final pane digests into a checkpoint table,
    see ``streaming/digest_stream.py``) can be rolled into sliding
    windows without touching raw rows again. ``pane_col`` is the
    epoch-aligned pane index (floor(epoch_sec / pane_sec)); window and
    slide must be pane multiples. Output: (window_start, by..., digest)
    — exact in lossless mode (digest merge is associative)."""
    by = list(by)
    exploded = explode_panes_to_windows(
        panes, pane_sec, window_sec, slide_sec,
        payload_cols=[*by, digest_col], pane_col=pane_col,
    )
    merged = tdigest_merge_agg_sql(
        exploded, by=["__ws", *by], digest_col=digest_col, delta=delta
    )
    return merged.select(
        F.timestamp_micros((F.col("__ws") * 1_000_000).cast("long")).alias(
            "window_start"
        ),
        *by,
        digest_col,
    )


def explode_panes_to_windows(
    panes: DataFrame,
    pane_sec: int,
    window_sec: int,
    slide_sec: int,
    payload_cols: Sequence[str],
    pane_col: str = "__pane",
) -> DataFrame:
    """Fan each epoch-aligned tumbling PANE row out to every sliding
    window that fully covers it — the explode half of the pane
    optimization, shared by :func:`panes_to_sliding` (digests) and
    ``sketch_agg.panes_to_sliding_sketches`` (companion sketches; any
    associative-merge payload works). Output: ``__ws`` (window start,
    epoch seconds) + ``payload_cols``; window and slide must be pane
    multiples."""
    if window_sec % pane_sec or slide_sec % pane_sec:
        raise ValueError(
            f"explode_panes_to_windows: window ({window_sec}) and slide "
            f"({slide_sec}) must be multiples of the pane ({pane_sec})"
        )
    # a pane can be covered by up to floor((window-pane)/slide)+1
    # windows (NOT window//slide, which undercounts when window is not
    # a multiple of slide); candidates are filtered exactly below
    n_back = (window_sec - pane_sec) // slide_sec
    # windows covering pane p (pane interval [p*pane, (p+1)*pane) lies
    # fully inside the window because window/slide are pane multiples):
    # starts s = k*slide with  s <= p*pane  and  s + window >= (p+1)*pane
    pane_t = F.col(pane_col) * pane_sec
    last_start = F.floor(pane_t / slide_sec) * slide_sec
    first_start = last_start - n_back * slide_sec
    return panes.select(
        F.explode(
            F.sequence(first_start.cast("long"), last_start.cast("long"),
                       F.lit(int(slide_sec)))
        ).alias("__ws"),
        pane_t.alias("__pt"),
        *payload_cols,
    ).where(
        # pane fully inside the window; negative (pre-epoch) starts are
        # kept — Spark's window() emits them too
        F.col("__ws") + window_sec >= F.col("__pt") + pane_sec
    ).drop("__pt")


def tdigest_describe(
    df: DataFrame, digest_col: str = "digest"
) -> DataFrame:
    """Observability view of a digest column — the Spark analog of the
    reference's ``debugPrint`` (``Tree/Internal.hs:403-410``) and
    ``size``/``validate`` surface: per row, centroid count, total
    weight, value range, compression delta, max centroid weight, and a
    validity flag (sorted means / positive weights / weight
    conservation, cf. ``validate``, ``Tree/Internal.hs:417-445``)."""
    keep = [c for c in df.columns if c != digest_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep]
        + [
            T.StructField("n_centroids", T.IntegerType()),
            T.StructField("total_weight", T.DoubleType()),
            T.StructField("vmin", T.DoubleType()),
            T.StructField("vmax", T.DoubleType()),
            T.StructField("delta", T.IntegerType()),
            T.StructField("max_centroid_weight", T.DoubleType()),
            T.StructField("is_valid", T.BooleanType()),
        ]
    )

    def evaluate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            rows = []
            for r in pdf[digest_col]:
                d = TDigest.from_row(r)
                try:
                    d.validate()
                    ok = True
                except AssertionError:
                    ok = False
                rows.append(
                    (
                        int(d.size),
                        float(d.total_weight),
                        None if d.is_empty() else float(d.vmin),
                        None if d.is_empty() else float(d.vmax),
                        int(d.delta),
                        float(d.weights.max()) if d.size else None,
                        ok,
                    )
                )
            cols = [
                "n_centroids", "total_weight", "vmin", "vmax", "delta",
                "max_centroid_weight", "is_valid",
            ]
            for i, c in enumerate(cols):
                out[c] = [row[i] for row in rows]
            yield out

    return df.mapInPandas(evaluate, out_schema)


def tdigest_cube(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    delta: int = 200,
    digest_col: str = "digest",
) -> DataFrame:
    """SQL ``GROUP BY CUBE(dims...)`` over digests without rescanning:
    finest-grain digests are built once, then every one of the 2^d
    dimension subsets is derived by associative digest merge (same
    one-scan-all-levels property as :func:`tdigest_rollup`, but over
    the full subset lattice). NULL marks a rolled-up dimension, as in
    SQL CUBE output."""
    dims = list(dims)
    d = len(dims)
    full = (1 << d) - 1
    leaf = tdigest_agg(df, value_col, by=dims, delta=delta, digest_col=digest_col)
    # eager localCheckpoint, NOT persist(): computed once for all 2^d
    # levels (leaf digests are tiny, O(groups x delta)), and the blocks
    # are ContextCleaner-collectable once the result DataFrame is
    # dropped — persist() entries live in the CacheManager until the
    # session ends, leaking storage across repeated calls. Trade-off:
    # the leaf job runs at call time, and checkpoint blocks are not
    # recomputable after executor loss (lineage truncated) — acceptable
    # for this O(groups)-sized intermediate; rerun the call on loss
    raw: dict[int, DataFrame] = {full: leaf.localCheckpoint(eager=True)}
    # each subset derives from its IMMEDIATE lattice parent (one more
    # dimension — the lowest missing one), not from the leaf: the merge
    # input shrinks from O(leaf groups) to O(parent groups) per level
    # (deriving {A} from {A,B} instead of {A,B,C} cuts that level's
    # clustering input by |C|'s cardinality factor — the difference
    # between 2^d full-leaf passes and a lattice descent at 1e6+ leaf
    # groups). Derivation chains are <= d re-compressions — the same
    # depth as any d-level merge tree, exact in lossless mode. Only
    # masks some child actually derives from are checkpointed.
    parent_of = {m: m | (1 << min(i for i in range(d) if not m & (1 << i)))
                 for m in range(full)}
    needed = set(parent_of.values())
    for mask in sorted(range(full), key=lambda m: bin(m).count("1"), reverse=True):
        parent = raw[parent_of[mask]]
        keep = [dims[i] for i in range(d) if mask & (1 << i)]
        # JVM merge path: ~10x faster than the pandas merge at high
        # group counts (see BENCH.md §1d), identical in lossless mode
        lvl = tdigest_merge_agg_sql(
            parent.select(*keep, digest_col), by=keep, digest_col=digest_col
        )
        raw[mask] = lvl.localCheckpoint(eager=True) if mask in needed else lvl
    out = None
    for mask in range(full + 1):
        lvl = raw[mask]
        for i, dim in enumerate(dims):
            if not mask & (1 << i):
                lvl = lvl.withColumn(dim, F.lit(None).cast(leaf.schema[dim].dataType))
        lvl = lvl.select(*dims, digest_col)
        out = lvl if out is None else out.unionByName(lvl)
    return out


def tdigest_grouping_sets(
    df: DataFrame,
    value_col: str,
    sets: Sequence[Sequence[str]],
    dims: Sequence[str] | None = None,
    delta: int = 200,
    digest_col: str = "digest",
    gid_col: str = "grouping_id",
) -> DataFrame:
    """SQL ``GROUP BY GROUPING SETS (...)`` over digests without
    rescanning — the arbitrary-subset generalization of
    :func:`tdigest_rollup` / :func:`tdigest_cube`: finest-grain digests
    over the union of all requested dimensions are built ONCE, then
    each requested set derives by associative digest merge from its
    smallest available superset (a computed sibling set when one
    covers it, else the leaf — the same merge-input-shrinking lattice
    descent as the cube).

    Output matches SQL shape: the union of all dimensions as columns,
    NULL marking an aggregated dimension, plus ``grouping_id`` = the
    SQL GROUPING_ID bitmask (MSB = first dim, bit set when that dim is
    aggregated) so genuinely-NULL keys stay distinguishable from
    rolled-up ones. Duplicate sets emit duplicate rows, as in SQL."""
    sets = [list(s) for s in sets]
    if dims is None:
        dims = []
        for s in sets:
            for c in s:
                if c not in dims:
                    dims.append(c)
    dims = list(dims)
    for s in sets:
        if len(set(s)) != len(s):
            raise ValueError(f"duplicate column in grouping set {s}")
        unknown = set(s) - set(dims)
        if unknown:
            raise ValueError(f"grouping set columns not in dims: {sorted(unknown)}")
    if not dims:
        raise ValueError("grouping sets need at least one dimension overall")

    leaf = tdigest_agg(df, value_col, by=dims, delta=delta, digest_col=digest_col)
    # one scan for every set; localCheckpoint (not persist) — see
    # tdigest_cube for the storage-lifecycle rationale
    leaf = leaf.localCheckpoint(eager=True)

    # plan parents first (pure python): process sets largest-first so
    # a big set can serve as merge input for the small ones it covers
    order = sorted(range(len(sets)), key=lambda i: -len(sets[i]))
    avail: set[frozenset] = {frozenset(dims)}
    parent_for: dict[int, frozenset] = {}
    for i in order:
        s = frozenset(sets[i])
        supers = [a for a in avail if s <= a]
        parent_for[i] = min(supers, key=len)
        avail.add(s)
    reused = {p for i, p in parent_for.items() if p != frozenset(sets[i])}

    computed: dict[frozenset, DataFrame] = {frozenset(dims): leaf}
    results: dict[int, DataFrame] = {}
    for i in order:
        key = frozenset(sets[i])
        if key in computed:
            results[i] = computed[key]
            continue
        parent = computed[parent_for[i]]
        lvl = tdigest_merge_agg_sql(
            parent.select(*sets[i], digest_col), by=sets[i], digest_col=digest_col
        )
        if key in reused:
            lvl = lvl.localCheckpoint(eager=True)
        computed[key] = lvl
        results[i] = lvl

    out = None
    for i, s in enumerate(sets):
        lvl = results[i]
        gid = sum(
            1 << (len(dims) - 1 - j) for j, dim in enumerate(dims) if dim not in s
        )
        for dim in dims:
            if dim not in s:
                lvl = lvl.withColumn(dim, F.lit(None).cast(leaf.schema[dim].dataType))
        lvl = lvl.select(
            *dims, F.lit(gid).cast("int").alias(gid_col), digest_col
        )
        out = lvl if out is None else out.unionByName(lvl)
    return out


def tdigest_rollup(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    delta: int = 200,
    digest_col: str = "digest",
) -> DataFrame:
    """SQL ``GROUP BY ROLLUP(dims...)`` over digests WITHOUT rescanning:
    build the finest-grain digests once, then derive every coarser
    level by merging digests upward (digest merge is associative, so
    rollup levels are exact aggregations of the leaf level — the whole
    point of a mergeable sketch at 100 TB: one scan, all levels).

    Output matches SQL ROLLUP shape: coarser levels carry NULL in the
    rolled-up dimension columns, plus a grand-total row.
    """
    dims = list(dims)
    leaf = tdigest_agg(df, value_col, by=dims, delta=delta, digest_col=digest_col)
    # leaf digests are tiny (O(groups * delta)); computed once and
    # reused for every level — eager localCheckpoint instead of
    # persist() so the blocks are freed with the DataFrame (see
    # tdigest_cube)
    leaf = leaf.localCheckpoint(eager=True)
    levels = [leaf]
    cur = leaf
    for i in range(len(dims) - 1, -1, -1):
        keep = dims[:i]
        cur = tdigest_merge_agg_sql(
            cur.select(*keep, digest_col), by=keep, digest_col=digest_col
        )
        lvl = cur
        for d in dims[i:]:
            lvl = lvl.withColumn(d, F.lit(None).cast(leaf.schema[d].dataType))
        levels.append(lvl.select(*dims, digest_col))
    out = levels[0].select(*dims, digest_col)
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out
