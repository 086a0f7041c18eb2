"""Web-pages pipeline tests: generator determinism, extraction
invariant, skew-salted sketching, checkpoint/resume semantics."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.functions.text import extract_text, with_text_features
from tdigest_spark.jobs.webpages import run_checkpointed, sketch_webpages
from tdigest_spark.sources.webpages import synth_webpages

N = 5_000


@pytest.fixture(scope="module")
def pages(spark):
    return synth_webpages(spark, N).cache()


def test_schema_matches_input_hint(pages):
    assert [(f.name, f.dataType.simpleString()) for f in pages.schema.fields] == [
        ("url", "string"),
        ("warc_ts", "timestamp"),
        ("html", "binary"),
        ("text", "string"),
        ("lang", "string"),
    ]


def test_deterministic_and_unique_urls(spark, pages):
    again = synth_webpages(spark, N)
    assert pages.exceptAll(again).count() == 0
    assert pages.select("url").distinct().count() == N


def test_extraction_invariant_byte_identical(pages):
    n_bad = pages.where(extract_text("html") != F.col("text")).count()
    assert n_bad == 0


def test_lang_skew_present(pages):
    counts = {r["lang"]: r["n"] for r in pages.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["en"] / N == pytest.approx(0.45, abs=0.03)
    assert min(counts.values()) < 0.05 * N  # a genuinely small tail group


def test_sketch_webpages_stats_accuracy(spark, pages):
    out = {r["lang"]: r for r in sketch_webpages(spark, pages, delta=100, salt=4).collect()}
    pdf = with_text_features(pages).select("lang", "n_chars").toPandas()
    for lang, g in pdf.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        r = out[lang]
        assert r["n_docs"] == len(v)
        # rank error of p50/p99 within ~2/delta
        for col, q in (("p50_chars", 0.5), ("p99_chars", 0.99)):
            rank = np.searchsorted(v, r[col]) / len(v)
            assert abs(rank - q) < 0.025, (lang, col)
        assert abs(r["distinct_urls_est"] / len(v) - 1) < 0.05


def test_checkpoint_resume(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out1 = run_checkpointed(spark, 4_000, ckpt, "job1", n_buckets=4, delta=1_000_000)
    rows1 = {r["lang"]: r for r in out1.collect()}
    manifest = json.load(open(os.path.join(ckpt, "job1.manifest.json")))
    assert len(manifest["buckets"]) == 4
    assert sum(b["rows"] for b in manifest["buckets"].values()) == 4_000
    assert all(b["docs_per_sec"] > 0 for b in manifest["buckets"].values())

    # simulate a partial failure: drop one bucket, resume recomputes it only
    del manifest["buckets"]["2"]
    json.dump(manifest, open(os.path.join(ckpt, "job1.manifest.json"), "w"))
    done_before = {k: v["wall_s"] for k, v in manifest["buckets"].items()}
    out2 = run_checkpointed(spark, 4_000, ckpt, "job1", n_buckets=4, delta=1_000_000)
    rows2 = {r["lang"]: r for r in out2.collect()}
    m2 = json.load(open(os.path.join(ckpt, "job1.manifest.json")))
    assert set(m2["buckets"]) == {"0", "1", "2", "3"}
    for k, w in done_before.items():
        assert m2["buckets"][k]["wall_s"] == w  # untouched buckets not re-run

    # resumed result identical (lossless digests -> exact equality)
    assert set(rows1) == set(rows2)
    for lang in rows1:
        assert rows1[lang]["p50_chars"] == rows2[lang]["p50_chars"]
        assert rows1[lang]["n_docs"] == rows2[lang]["n_docs"]

    # checkpointed merge equals direct single-pass (exact when lossless)
    direct = {
        r["lang"]: r
        for r in sketch_webpages(
            spark, synth_webpages(spark, 4_000), delta=1_000_000, salt=None
        ).collect()
    }
    for lang in rows1:
        assert rows1[lang]["p50_chars"] == direct[lang]["p50_chars"]


def test_catalog_gated_io_roundtrip(spark, tmp_path):
    """Iceberg-or-parquet gate: in this sandbox the probe must degrade
    to parquet, and the round trip must preserve schema + rows +
    partitioning."""
    from pyspark.sql import functions as F

    from tdigest_spark.sources.catalog import iceberg_available, read_table, write_table

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("lang"),
        (F.col("id") * 1.5).alias("v"),
    )
    fmt = write_table(df, str(tmp_path / "t"), partition_by=("lang",))
    assert fmt == ("iceberg" if iceberg_available(spark) else "parquet")
    assert fmt == "parquet"  # sandbox has no iceberg jar
    back = read_table(spark, str(tmp_path / "t"))
    assert back.count() == 100
    assert set(back.columns) == {"id", "lang", "v"}
    # partition pruning reaches the scan on the partition column
    plan = back.where(F.col("lang") == "1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back.where(F.col("lang") == "1").count() == 33
