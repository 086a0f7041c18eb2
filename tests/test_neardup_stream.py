"""Streaming near-dup ingest: keep-first canonicalization across
micro-batches, exactly-once replays, LSM compaction, and composition
with a pre-built batch index."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tdigest_spark.streaming.neardup_stream import (
    _load_manifest,
    _segment_tables,
    compact_neardup_segments,
    neardup_ingest_sink,
    read_neardup_pairs,
)


def _text(i: int, n_tokens: int = 20) -> str:
    return f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(n_tokens))


@pytest.fixture(scope="module")
def crawl_dirs(spark, tmp_path_factory):
    """Three crawl chunks with planted duplicates:

    chunk 0: ids 0-9 unique; 10 and 11 exact dups of EACH OTHER
             (within-batch pair — canonical 10, drop 11)
    chunk 1: ids 20-24 unique; 25 = exact dup of doc 0 (cross pair);
             26 = exact dup of the 10/11 TEXT — must match canonical
             10, never the dropped 11
    chunk 2: id 30 = near-dup of doc 20 (appended tokens)
    """
    d = tmp_path_factory.mktemp("crawl_src")
    chunks = [
        [(i, _text(i)) for i in range(10)]
        + [(10, _text(10)), (11, _text(10))],
        [(i, _text(i)) for i in range(20, 25)]
        + [(25, _text(0)), (26, _text(10))],
        [(30, _text(20) + " tail token add")],
    ]
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(d / f"chunk={i}"))
    return d


def _run_sink(spark, src_dir, index_dir, pairs_dir, ck_dir):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/chunk=*")
    )
    q = neardup_ingest_sink(
        stream, "doc_id", "text", index_dir, pairs_dir, ck_dir,
        threshold=0.6, n_shards=8,
    )
    q.awaitTermination(300)


@pytest.fixture(scope="module")
def ingested(spark, crawl_dirs, tmp_path_factory):
    root = tmp_path_factory.mktemp("nd_stream")
    idx = str(root / "index")
    pairs = str(root / "pairs")
    ck = str(root / "ck")
    _run_sink(spark, crawl_dirs, idx, pairs, ck)
    return idx, pairs, ck


def _indexed_ids(spark, index_dir) -> set:
    m = _load_manifest(index_dir)
    bands, sh = _segment_tables(spark, index_dir, m["segments"], None)
    band_ids = {r["doc_id"] for r in bands.select("doc_id").distinct().collect()}
    sh_ids = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert band_ids == sh_ids  # the two tables must cover the same docs
    return band_ids


def test_keep_first_pairs_and_survivors(spark, ingested):
    idx, pairs_dir, _ = ingested
    got = {
        (r["batch_doc"], r["matched_doc"], round(r["jaccard"], 6),
         r["matched_in_batch"])
        for r in read_neardup_pairs(spark, pairs_dir).collect()
    }
    exact = {p[:2] for p in got if p[2] == 1.0}
    # within-batch: 11 dups 10; cross: 25 dups 0; 26 must canonicalize
    # to 10 (11 was dropped and never indexed)
    assert exact == {(11, 10), (25, 0), (26, 10)}
    flags = {p[:2]: p[3] for p in got}
    assert flags[(11, 10)] is True
    assert flags[(25, 0)] is False and flags[(26, 10)] is False
    # the near-dup: verified jaccard strictly between threshold and 1
    near = [p for p in got if p[:2] == (30, 20)]
    assert len(near) == 1 and 0.6 <= near[0][2] < 1.0
    assert len(got) == 4  # nothing else crossed the threshold
    # survivors = canonicals only
    assert _indexed_ids(spark, idx) == set(range(10)) | {10} | set(range(20, 25))


def test_replay_is_exactly_once(spark, crawl_dirs, ingested, tmp_path):
    """A fresh checkpoint replays every batch; the manifest marker must
    skip them all — no doubled shingles (which would corrupt later
    Jaccards), no new segments, pairs unchanged."""
    idx, pairs_dir, _ = ingested
    m0 = _load_manifest(idx)
    _, sh = _segment_tables(spark, idx, m0["segments"], None)
    n_sh0 = sh.count()
    pairs0 = read_neardup_pairs(spark, pairs_dir).count()
    _run_sink(spark, crawl_dirs, idx, pairs_dir, str(tmp_path / "ck_replay"))
    m1 = _load_manifest(idx)
    assert m1["segments"] == m0["segments"]
    _, sh1 = _segment_tables(spark, idx, m1["segments"], None)
    assert sh1.count() == n_sh0
    assert read_neardup_pairs(spark, pairs_dir).count() == pairs0


def test_compaction_then_continued_ingest(spark, crawl_dirs, ingested):
    """Compaction folds the per-batch segments into one with identical
    contents; a LATER batch (same checkpoint, new source file) still
    dedups against the compacted index."""
    idx, pairs_dir, ck = ingested
    m0 = _load_manifest(idx)
    bands0, sh0 = _segment_tables(spark, idx, m0["segments"], None)
    rows0 = sorted(
        (r["doc_id"], r["band"], r["bh"]) for r in bands0.collect()
    )
    n_sh0 = sh0.count()
    folded = compact_neardup_segments(spark, idx)
    assert folded == len(m0["segments"]) >= 2
    m1 = _load_manifest(idx)
    assert len(m1["segments"]) == 1
    bands1, sh1 = _segment_tables(spark, idx, m1["segments"], None)
    assert sorted(
        (r["doc_id"], r["band"], r["bh"]) for r in bands1.collect()
    ) == rows0
    assert sh1.count() == n_sh0
    # continued ingest: id 40 duplicates doc 0 — found via the
    # compacted segment, and 40 stays out of the index
    spark.createDataFrame(
        [(40, _text(0)), (41, _text(41))], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{crawl_dirs}/chunk=3")
    _run_sink(spark, crawl_dirs, idx, pairs_dir, ck)
    got = {
        (r["batch_doc"], r["matched_doc"])
        for r in read_neardup_pairs(spark, pairs_dir)
        .where(F.col("jaccard") == 1.0).collect()
    }
    assert (40, 0) in got
    ids = _indexed_ids(spark, idx)
    assert 41 in ids and 40 not in ids


def test_composes_with_prebuilt_base_index(spark, tmp_path):
    """A build_neardup_index base (no manifest) enters as segment '.':
    the first streamed batch dedups against it."""
    from tdigest_spark.operators.neardup_index import build_neardup_index

    base = spark.createDataFrame(
        [(i, _text(i)) for i in range(8)], "doc_id long, text string"
    )
    idx = str(tmp_path / "base_idx")
    build_neardup_index(base, "doc_id", "text", idx, n_shards=8)
    src = tmp_path / "src"
    spark.createDataFrame(
        [(100, _text(3)), (101, _text(101))], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    _run_sink(spark, src, idx, str(tmp_path / "pairs"), str(tmp_path / "ck"))
    got = {
        (r["batch_doc"], r["matched_doc"], r["matched_in_batch"])
        for r in read_neardup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert got == {(100, 3, False)}
    ids = _indexed_ids(spark, idx)
    assert set(range(8)) | {101} == ids


def test_drop_matched_false_indexes_everything(spark, tmp_path):
    src = tmp_path / "src"
    spark.createDataFrame(
        [(0, _text(0)), (1, _text(0)), (2, _text(2))],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    idx = str(tmp_path / "idx")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk=*")
    )
    q = neardup_ingest_sink(
        stream, "doc_id", "text", idx, str(tmp_path / "pairs"),
        str(tmp_path / "ck"), n_shards=8, drop_matched=False,
    )
    q.awaitTermination(300)
    assert _indexed_ids(spark, idx) == {0, 1, 2}
    got = {
        (r["batch_doc"], r["matched_doc"])
        for r in read_neardup_pairs(spark, str(tmp_path / "pairs")).collect()
    }
    assert got == {(1, 0)}


def test_pairless_batches_read_back(spark, tmp_path):
    """A batch with no duplicates writes an EMPTY pairs table — the
    schema-bearing empty parquet must read back through
    read_neardup_pairs (0 rows, full schema), and every doc indexes."""
    src = tmp_path / "src"
    for i in range(2):
        spark.createDataFrame(
            [(10 * i + j, _text(10 * i + j)) for j in range(3)],
            "doc_id long, text string",
        ).coalesce(1).write.parquet(str(src / f"chunk={i}"))
    idx = str(tmp_path / "idx")
    _run_sink(spark, src, idx, str(tmp_path / "pairs"), str(tmp_path / "ck"))
    pairs = read_neardup_pairs(spark, str(tmp_path / "pairs"))
    assert pairs.count() == 0
    assert set(pairs.columns) == {
        "batch_doc", "matched_doc", "jaccard", "matched_in_batch"
    }
    assert _indexed_ids(spark, idx) == {0, 1, 2, 10, 11, 12}
