"""Deterministic sampling operators: reproducibility, partition
invariance, cross-table key consistency, exact-k semantics, weighted
inclusion probabilities, and split disjointness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.sampling import (
    hash_sample,
    sample_k,
    split_by_hash,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_deterministic_and_partition_invariant(docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect())
    b = sorted(
        r["doc_id"]
        for r in hash_sample(docs.repartition(7), "doc_id", 0.3).select("doc_id").collect()
    )
    assert a == b and len(a) > 0
    n = docs.count()
    # binomial CI: fraction within ~5 sigma of 0.3
    sigma = (0.3 * 0.7 / n) ** 0.5
    assert abs(len(a) / n - 0.3) < 5 * sigma + 1 / n


def test_hash_sample_seed_changes_sample_and_nests(docs):
    s0 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=0).select("doc_id").collect()}
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3, seed=1).select("doc_id").collect()}
    assert s0 != s1
    # threshold monotonicity: the 10% sample nests inside the 30% one
    small = {
        r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1, seed=0).select("doc_id").collect()
    }
    assert small <= s0


def test_hash_sample_key_consistency_across_tables(docs):
    # two different projections of the same table sample the SAME keys
    a = {r["doc_id"] for r in hash_sample(docs.select("doc_id", "lang"), "doc_id", 0.25).collect()}
    b = {
        r["doc_id"]
        for r in hash_sample(docs.select("doc_id", "n_chars"), "doc_id", 0.25).collect()
    }
    assert a == b


def test_hash_sample_bounds():
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(None, "k", 1.5)


def test_stratified_sample_per_stratum_fractions(docs):
    out = stratified_sample(
        docs, "lang", {"en": 0.2, "de": 1.0}, key_cols="doc_id", default=0.0
    )
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert set(got) <= {"en", "de"}  # default=0 drops unlisted strata
    assert got["de"] == base["de"]  # fraction 1.0 keeps the stratum whole
    n = base["en"]
    sigma = (0.2 * 0.8 / n) ** 0.5
    assert abs(got.get("en", 0) / n - 0.2) < 5 * sigma + 1 / n
    # stratum filter composes with the same key hash: en-sample nests
    # inside the plain 20% hash sample
    en_ids = {r["doc_id"] for r in out.filter("lang = 'en'").select("doc_id").collect()}
    all20 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    assert en_ids <= all20


def test_split_by_hash_disjoint_exhaustive_deterministic(docs):
    out = split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = docs.count()
    assert sum(counts.values()) == n  # exhaustive
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.05
    # determinism + cross-table consistency: same split per key from a
    # different projection of the same keys
    a = {(r["doc_id"], r["split"]) for r in out.select("doc_id", "split").collect()}
    out2 = split_by_hash(
        docs.select("doc_id").repartition(5), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    b = {(r["doc_id"], r["split"]) for r in out2.collect()}
    assert a == b

    with pytest.raises(ValueError, match="sum to 1"):
        split_by_hash(docs, "doc_id", {"train": 0.8, "val": 0.1})


def test_sample_k_exact_k_and_matches_driver_rank(docs):
    out = sample_k(docs, 25, key_cols="doc_id", rank_col="u")
    rows = out.collect()
    assert len(rows) == 25
    # the distributed bounded top-k selects exactly the k smallest
    # rank keys — verify against an independently-computed driver-side
    # sort of every key (same hash expression, no sample_k machinery)
    all_u = [
        r["u"]
        for r in docs.select(
            (
                (F.xxhash64("doc_id", F.lit(0)).cast("double") + F.lit(float(1 << 63)))
                / F.lit(float(1 << 64))
            ).alias("u")
        ).collect()
    ]
    expect = sorted(all_u)[:25]
    got = sorted(r["u"] for r in rows)
    assert got == pytest.approx(expect, abs=0.0)


def test_sample_k_partition_invariant_and_grouped(docs):
    a = sorted(r["doc_id"] for r in sample_k(docs, 10, "doc_id", by=["lang"]).collect())
    b = sorted(
        r["doc_id"] for r in sample_k(docs.repartition(11), 10, "doc_id", by=["lang"]).collect()
    )
    assert a == b
    per = (
        sample_k(docs, 10, "doc_id", by=["lang"])
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for r in per:
        assert r["n"] == min(10, base[r["lang"]])  # small groups kept whole


def test_sample_k_weighted_prefers_heavy_rows(spark):
    # two strata of equal size, weight 10 vs 1: ES sampling must pick
    # heavy rows at far beyond their 50% population share
    df = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") < 1000, F.lit(10.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    heavy = 0
    for seed in range(5):
        got = sample_k(df, 100, key_cols="id", weight_col="w", seed=seed).collect()
        heavy += sum(1 for r in got if r["w"] == 10.0)
    frac = heavy / 500
    assert frac > 0.75  # expected ~0.9 for w-ratio 10:1

    # non-positive weights are excluded entirely
    df2 = spark.range(100).select(
        F.col("id"), F.when(F.col("id") < 50, F.lit(-1.0)).otherwise(F.lit(2.0)).alias("w")
    )
    got = sample_k(df2, 60, key_cols="id", weight_col="w").collect()
    assert len(got) == 50 and all(r["w"] > 0 for r in got)


def test_sample_k_validates_k(docs):
    with pytest.raises(ValueError, match="k must be positive"):
        sample_k(docs, 0, "doc_id")
