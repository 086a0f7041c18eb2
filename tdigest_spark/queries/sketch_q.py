"""Companion-sketch query family for the driver contract.

Approximate estimates can't value-hash-match an exact oracle, so each
query emits (a) exact values computed with Spark built-ins alongside
the sketch and (b) booleans asserting the sketch estimate lies within
its published error bound (HLL 3-sigma; CMS one-sided + eps*N; Bloom
zero false negatives + fpp cap). The DuckDB oracle computes the same
exact values and literal ``true`` — so a bound violation IS a hash
mismatch. KLL runs lossless (k >= group size), exact like the
t-digest lossless queries (tdigest_q.py).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.sketch_agg import (
    bloom_probe,
    cms_probe,
    sketch_build,
    sketch_estimates,
    sketch_merge_agg,
)
from tdigest_spark.sources.tables import load

_HLL_P = 12
_HLL_3SIG = 3 * 1.04 / float(np.sqrt(1 << _HLL_P))


def sk_hll_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-check shape: estimated overlap between each lang's
    text set and a global 'benchmark' sample (docs with doc_id%5==0)
    via HLL inclusion-exclusion — two sketches instead of a distinct
    join of the corpora. Bound: overlap error propagates over three
    estimates relative to the UNION size, so the ok-boolean uses a
    5-sigma-of-union tolerance."""
    from tdigest_spark.operators.sketch_agg import hll_overlap

    docs = load(spark, sf_dir, "documents").select("lang", "text", "doc_id")
    per_lang = sketch_build(docs, {"h": ("hll", "text", _HLL_P)}, by=["lang"])
    bench = sketch_build(
        docs.where(F.col("doc_id") % 5 == 0), {"hb": ("hll", "text", _HLL_P)}
    )
    est = hll_overlap(per_lang.crossJoin(F.broadcast(bench)), "h", "hb")
    exact = (
        docs.where(F.col("doc_id") % 5 == 0)
        .groupBy("lang")
        .agg(F.countDistinct("text").alias("exact_overlap"))
    )
    tol = F.lit(5 * 1.04 / float(np.sqrt(1 << _HLL_P))) * F.col("union_est")
    return (
        est.join(exact, "lang")
        .select(
            "lang",
            "exact_overlap",
            (F.abs(F.col("overlap_est") - F.col("exact_overlap")) <= tol).alias(
                "overlap_ok"
            ),
        )
    )


def sk_kll_quantiles_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    built = sketch_build(docs, {"k": ("kll", "n_chars", 1_000_000)}, by=["lang"])
    est = sketch_estimates(
        built,
        {
            "p25": ("kll_quantile", "k", 0.25),
            "p50": ("kll_quantile", "k", 0.50),
            "p90": ("kll_quantile", "k", 0.90),
        },
    )
    for c in ("p25", "p50", "p90"):
        est = est.withColumn(c, F.round(F.col(c), 4))
    return est


def sk_bloom_membership_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    built = sketch_build(docs, {"b": ("bloom", "source", 1 << 16, 7)}, by=["lang"])
    present = docs.select("lang", "source").distinct()
    hits = bloom_probe(present, built, "source", "b", by=["lang"])
    absent = (
        docs.select("lang").distinct()
        .crossJoin(spark.range(500).select(F.concat(F.lit("absent-"), "id").alias("source")))
    )
    fps = bloom_probe(absent, built, "source", "b", by=["lang"])
    pos = hits.groupBy("lang").agg(
        F.count("*").alias("n_present"),
        F.sum(F.col("might_contain").cast("long")).alias("n_hits"),
    )
    neg = fps.groupBy("lang").agg(
        (F.avg(F.col("might_contain").cast("double")) < 0.05).alias("fpp_ok")
    )
    return pos.join(neg, "lang").select(
        "lang", "n_present", (F.col("n_hits") == F.col("n_present")).alias("no_false_neg"), "fpp_ok"
    )


def sk_cms_source_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    built = sketch_build(docs, {"c": ("cms", "source", 0.0005, 0.001)}, by=["lang"])
    exact = docs.groupBy("lang", "source").agg(F.count("*").alias("exact_count"))
    probed = cms_probe(exact, built, "source", "c", by=["lang"])
    # eps*N bound: N = per-lang total; e/width * N with width=ceil(e/eps)
    totals = docs.groupBy("lang").agg(F.count("*").alias("__n"))
    return (
        probed.join(totals, "lang")
        .select(
            "lang",
            "source",
            "exact_count",
            (
                (F.col("est_count") >= F.col("exact_count"))
                & (F.col("est_count") <= F.col("exact_count") + F.greatest(F.lit(1.0), F.lit(0.0005) * F.col("__n")))
            ).alias("cms_ok"),
        )
    )


_WKLL_PROBES = (10000.0, 30000.0, 60000.0)


def sk_kll_weighted_cdf_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted KLL (KLL± direction): l_extendedprice weighted by
    l_quantity (integer 1..50), cdf probed at fixed prices. Exact
    weighted cdf is integer-arithmetic-deterministic (sums of integer
    weights cast to long), so it value-hash-matches DuckDB; the sketch
    estimate is asserted within rank-error bound as a boolean."""
    li = load(spark, sf_dir, "lineitem")
    built = sketch_build(
        li, {"k": ("kll_w", "l_extendedprice", "l_quantity", 500)}, by=["l_returnflag"]
    )
    est = sketch_estimates(
        built,
        {f"est_cdf_{i}": ("kll_cdf", "k", x) for i, x in enumerate(_WKLL_PROBES)},
    )
    wq = F.col("l_quantity")
    exact = li.groupBy("l_returnflag").agg(
        *[
            F.round(
                (
                    2 * F.sum(F.when(F.col("l_extendedprice") < x, wq).otherwise(0.0)).cast("long")
                    + F.sum(F.when(F.col("l_extendedprice") == x, wq).otherwise(0.0)).cast("long")
                ).cast("double")
                / (2 * F.sum(wq).cast("long")).cast("double"),
                4,
            ).alias(f"exact_cdf_{i}")
            for i, x in enumerate(_WKLL_PROBES)
        ]
    )
    out = est.join(exact, "l_returnflag")
    cols = [F.col("l_returnflag")]
    for i in range(len(_WKLL_PROBES)):
        cols.append(F.col(f"exact_cdf_{i}"))
        cols.append(
            (F.abs(F.col(f"est_cdf_{i}") - F.col(f"exact_cdf_{i}")) < 0.015).alias(
                f"cdf_{i}_ok"
            )
        )
    return out.select(*cols)


def sk_hll_rollup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count rollup WITHOUT rescanning: per-(lang, source) HLL
    blobs built once, per-lang distincts derived by register-max merge
    (``sketch_merge_agg``) — the checkpoint-table rollup pattern at
    100 TB. Estimate asserted within the 3-sigma HLL bound. (Subsumes
    round-2's sk_hll_distinct_docs: the rolled-up per-lang estimate IS
    the per-group distinct, checked against the same exact counts.
    Also carries the GLOBAL ungrouped HLL over events.user_id as
    cross-joined `g_users`/`g_est_ok` columns — round-2's
    sk_hll_global_events, consolidated under the 50-row driver cap.)"""
    docs = load(spark, sf_dir, "documents")
    fine = sketch_build(docs, {"h": ("hll", "text", _HLL_P)}, by=["lang", "source"])
    rolled = sketch_merge_agg(fine, {"h": "hll"}, by=["lang"])
    est = sketch_estimates(rolled, {"nd": ("hll_estimate", "h")})
    exact = docs.groupBy("lang").agg(F.countDistinct("text").alias("exact_distinct"))
    out = est.join(exact, "lang").select(
        "lang",
        "exact_distinct",
        (F.abs(F.col("nd") / F.col("exact_distinct") - 1) < _HLL_3SIG).alias("est_ok"),
    )
    ev = load(spark, sf_dir, "events")
    built = sketch_build(ev, {"h": ("hll", "user_id", _HLL_P)})
    gest = sketch_estimates(built, {"est": ("hll_estimate", "h")})
    gexact = ev.agg(F.countDistinct("user_id").alias("g_users"))
    glob = gest.crossJoin(gexact).select(
        "g_users",
        (F.abs(F.col("est") / F.col("g_users") - 1) < _HLL_3SIG).alias("g_est_ok"),
    )
    return out.crossJoin(F.broadcast(glob))


def sk_topk_sources_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped heavy hitters: top-3 sources per lang, exact counts from
    the candidate-pruned recount (the count shuffle carries only the
    O(partitions x m) Misra-Gries candidate set, not the full domain);
    deterministic tie-break (count desc, value asc) hash-matches the
    SQL top-k. (The global ungrouped variant — round-2's
    sk_topk_sources_docs — is the same operator with by=[], covered by
    test_approx_topk_zipf_high_cardinality.)"""
    from tdigest_spark.operators.topk import approx_topk

    docs = load(spark, sf_dir, "documents")
    return approx_topk(docs, "source", k=3, by=["lang"])


def sk_cms_grouped_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wide-sketch composition at HIGH group cardinality: ONE
    global CMS over the concatenated (group, key) pair — 1e4 groups x 3
    return flags — probed back for a sample of pairs against exact SQL
    counts. est >= exact is the CMS deterministic one-sided guarantee
    (catches missed updates); est <= exact + eps*N_global is the
    published overcount bound. A per-group CMS here would cost
    3e4 x ~50 KB of blobs; this is ONE blob."""
    from tdigest_spark.operators.sketch_agg import (
        cms_grouped_build,
        cms_grouped_probe,
    )

    eps = 1e-4
    li = load(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 10_000).alias("g"), "l_returnflag"
    )
    sk = cms_grouped_build(li, "l_returnflag", by=["g"], eps=eps, delta=0.01)
    n_total = li.count()
    probes = (
        li.where(F.col("g") % 20 == 0)
        .groupBy("g", "l_returnflag")
        .agg(F.count("*").alias("exact_count"))
    )
    est = cms_grouped_probe(probes, sk, "l_returnflag", by=["g"])
    bound = F.greatest(F.lit(1.0), F.lit(eps * n_total))
    return est.select(
        "g",
        "l_returnflag",
        "exact_count",
        (
            (F.col("est_count") >= F.col("exact_count"))
            & (F.col("est_count") <= F.col("exact_count") + bound)
        ).alias("cms_ok"),
    )


QUERIES = {
    "sk_hll_overlap_docs": sk_hll_overlap_docs,
    "sk_kll_quantiles_docs": sk_kll_quantiles_docs,
    "sk_bloom_membership_docs": sk_bloom_membership_docs,
    "sk_kll_weighted_cdf_lineitem": sk_kll_weighted_cdf_lineitem,
    "sk_cms_source_counts": sk_cms_source_counts,
    "sk_cms_grouped_lineitem": sk_cms_grouped_lineitem,
    "sk_hll_rollup_docs": sk_hll_rollup_docs,
    "sk_topk_sources_by_lang": sk_topk_sources_by_lang,
}

ORACLES = {
    "sk_cms_grouped_lineitem": """
        SELECT l_orderkey % 10000 AS g, l_returnflag,
               count(*) AS exact_count, true AS cms_ok
        FROM lineitem
        WHERE (l_orderkey % 10000) % 20 = 0
        GROUP BY 1, 2
    """,
    "sk_hll_overlap_docs": """
        SELECT lang, count(DISTINCT text) AS exact_overlap, true AS overlap_ok
        FROM documents WHERE doc_id % 5 = 0 GROUP BY lang
    """,
    "sk_kll_quantiles_docs": """
        SELECT lang,
               round(quantile_cont(n_chars, 0.25), 4) AS p25,
               round(quantile_cont(n_chars, 0.50), 4) AS p50,
               round(quantile_cont(n_chars, 0.90), 4) AS p90
        FROM documents GROUP BY lang
    """,
    "sk_bloom_membership_docs": """
        SELECT lang, count(DISTINCT source) AS n_present,
               true AS no_false_neg, true AS fpp_ok
        FROM documents GROUP BY lang
    """,
    "sk_kll_weighted_cdf_lineitem": """
        SELECT l_returnflag,
               round((2 * sum(CASE WHEN l_extendedprice < 10000.0
                                   THEN l_quantity ELSE 0 END)::BIGINT
                      + sum(CASE WHEN l_extendedprice = 10000.0
                                 THEN l_quantity ELSE 0 END)::BIGINT)::DOUBLE
                     / (2 * sum(l_quantity)::BIGINT)::DOUBLE, 4) AS exact_cdf_0,
               true AS cdf_0_ok,
               round((2 * sum(CASE WHEN l_extendedprice < 30000.0
                                   THEN l_quantity ELSE 0 END)::BIGINT
                      + sum(CASE WHEN l_extendedprice = 30000.0
                                 THEN l_quantity ELSE 0 END)::BIGINT)::DOUBLE
                     / (2 * sum(l_quantity)::BIGINT)::DOUBLE, 4) AS exact_cdf_1,
               true AS cdf_1_ok,
               round((2 * sum(CASE WHEN l_extendedprice < 60000.0
                                   THEN l_quantity ELSE 0 END)::BIGINT
                      + sum(CASE WHEN l_extendedprice = 60000.0
                                 THEN l_quantity ELSE 0 END)::BIGINT)::DOUBLE
                     / (2 * sum(l_quantity)::BIGINT)::DOUBLE, 4) AS exact_cdf_2,
               true AS cdf_2_ok
        FROM lineitem GROUP BY l_returnflag
    """,
    "sk_cms_source_counts": """
        SELECT lang, source, count(*) AS exact_count, true AS cms_ok
        FROM documents GROUP BY lang, source
    """,
    "sk_hll_rollup_docs": """
        SELECT lang, count(DISTINCT text) AS exact_distinct, true AS est_ok,
               g_users, true AS g_est_ok
        FROM documents CROSS JOIN (
          SELECT count(DISTINCT user_id) AS g_users FROM events
        ) g
        GROUP BY lang, g_users
    """,
    "sk_topk_sources_by_lang": """
        SELECT lang, source, cnt, rank FROM (
          SELECT lang, source, count(*) AS cnt,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY count(*) DESC, source ASC) AS rank
          FROM documents GROUP BY lang, source
        ) WHERE rank <= 3
    """,
}
