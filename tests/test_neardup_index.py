"""Persisted MinHash-LSH band index: indexed == in-memory equivalence
on planted duplicates, the append lifecycle, and the probe-time
partition-filter plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators.dedup import minhash_dedup_pairs
from tdigest_spark.operators.neardup_index import (
    append_neardup_index,
    build_neardup_index,
    neardup_pairs_indexed,
)
from tdigest_spark.sources.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").select("doc_id", "text").cache()


@pytest.fixture(scope="module")
def batch(spark, docs):
    """New-crawl batch: near-dups (one appended token) and exact dups
    of a slice of the corpus, plus fresh ids that match nothing."""
    near = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat("text", F.lit(" tail token add")).alias("text"),
    )
    exact = docs.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    return near.unionAll(exact).cache()


def test_indexed_equals_in_memory(spark, docs, batch, tmp_path):
    """Probing the persisted index must produce EXACTLY the cross
    (batch x corpus) subset of what the in-memory pipeline finds on the
    union corpus — same banding parameters -> same candidates, and the
    verify stage is exact on both paths."""
    idx = str(tmp_path / "nd_idx")
    build_neardup_index(docs, "doc_id", "text", idx, n_shards=8)
    got = {
        (r["batch_id"], r["index_id"], round(r["jaccard"], 9))
        for r in neardup_pairs_indexed(
            spark, idx, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    union = docs.unionAll(batch)
    mem = minhash_dedup_pairs(union, "doc_id", "text", threshold=0.5).collect()
    # keep only cross pairs (one side < 10k = corpus, other >= 10k =
    # batch); in-memory emits id_a < id_b so corpus id is always id_a
    expect = {
        (r["id_b"], r["id_a"], round(r["jaccard"], 9))
        for r in mem
        if r["id_a"] < 10_000 <= r["id_b"]
    }
    assert got == expect
    assert len(got) > 0
    # planted exact dups all surface at jaccard 1.0
    exact_ids = {
        r["doc_id"] for r in docs.where(F.col("doc_id") % 4 == 0).collect()
    }
    got_exact = {(b, i) for b, i, j in got if j == 1.0 and b >= 20_000}
    assert {(i + 20_000, i) for i in exact_ids} <= got_exact


def test_probe_plan_prunes_partitions(spark, docs, batch, tmp_path):
    """The band-table scan under a small probe must carry a non-empty
    PartitionFilters entry — the index reads probed shards, not the
    whole table."""
    idx = str(tmp_path / "nd_idx_plan")
    build_neardup_index(docs, "doc_id", "text", idx, n_shards=8)
    tiny = batch.where(F.col("doc_id") % 40 == 0)
    out = neardup_pairs_indexed(spark, idx, tiny, "doc_id", "text", threshold=0.5)
    # formatted explain prints every scan node untruncated (the raw
    # executedPlan string clips at maxToStringFields before the index
    # scan when the LSH explode expressions are long)
    import contextlib
    import io
    import re

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    pf = re.findall(r"PartitionFilters: \[([^\]]*)", plan)
    assert any(("band" in f or "shard" in f) and f.strip() for f in pf), plan[:4000]


def test_append_lifecycle(spark, docs, batch, tmp_path):
    """Appending a second corpus slice makes its near-dups findable by
    a later probe, without rebuilding: the crawl-day flow."""
    idx = str(tmp_path / "nd_idx_app")
    half = docs.where(F.col("doc_id") % 2 == 0)
    other = docs.where(F.col("doc_id") % 2 == 1)
    build_neardup_index(half, "doc_id", "text", idx, n_shards=8)
    before = {
        (r["batch_id"], r["index_id"])
        for r in neardup_pairs_indexed(
            spark, idx, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert all(i % 2 == 0 for _, i in before)
    append_neardup_index(other, "doc_id", "text", idx)
    after = {
        (r["batch_id"], r["index_id"])
        for r in neardup_pairs_indexed(
            spark, idx, batch, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert before < after
    assert any(i % 2 == 1 for _, i in after)


def test_build_validates_band_divisibility(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="divide"):
        build_neardup_index(
            docs, "doc_id", "text", str(tmp_path / "bad"), n_hashes=64, bands=7
        )
