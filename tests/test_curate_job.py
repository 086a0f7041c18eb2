"""End-to-end curation job: dedup -> quantile trim -> rebalance ->
split -> drift report, with per-stage semantics asserted at lossless
delta."""

import pytest
from pyspark.sql import functions as F

from tdigest_spark.jobs.curate import curate_webpages
from tdigest_spark.sources.webpages import synth_webpages

LOSSLESS = 10_000_000


@pytest.fixture(scope="module")
def result(spark):
    pages = synth_webpages(spark, 20_000, n_partitions=8)
    curated, report = curate_webpages(
        spark, pages, delta=LOSSLESS, trim_lo=0.05, trim_hi=0.99,
        head_lang_fraction={"en": 0.5},
    )
    return pages, curated.localCheckpoint(eager=True), report.collect()


def test_curate_splits_disjoint_exhaustive(result):
    _, curated, _ = result
    n = curated.count()
    per = dict(
        (r["split"], r["n"])
        for r in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert set(per) == {"train", "val", "test"}
    assert sum(per.values()) == n
    assert per["train"] / n == pytest.approx(0.9, abs=0.02)


def test_curate_trim_respects_raw_rank_window(spark, result):
    pages, curated, _ = result
    # every curated row's n_chars must lie within [p5, p99] of its
    # lang's RAW deduped distribution (lossless digests = exact
    # mid-rank window; compare against exact quantiles with the
    # mid-rank convention's one-atom slack)
    raw = (
        pages.withColumn("n_chars", F.length("text").cast("double"))
        .groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.05)").alias("lo"),
            F.expr("percentile(n_chars, 0.99)").alias("hi"),
        )
    )
    joined = curated.join(raw, "lang").filter(
        (F.col("n_chars") < F.col("lo") - 1) | (F.col("n_chars") > F.col("hi") + 1)
    )
    assert joined.count() == 0


def test_curate_rebalance_caps_head_language(result):
    pages, curated, _ = result
    raw_en = pages.filter("lang = 'en'").count()
    cur_en = curated.filter("lang = 'en'").count()
    # ~50% keep of the ~94% that survives trimming
    assert cur_en / raw_en == pytest.approx(0.5 * 0.94, abs=0.06)
    # non-head languages keep their whole trimmed stratum (default=1.0)
    raw_de = pages.filter("lang = 'de'").count()
    cur_de = curated.filter("lang = 'de'").count()
    assert cur_de / raw_de == pytest.approx(0.94, abs=0.04)


def test_curate_report_carries_drift(result):
    _, curated, rep = result
    langs = {r["lang"] for r in rep}
    assert langs == {r["lang"] for r in curated.select("lang").distinct().collect()}
    for r in rep:
        # curation MOVED the distribution: trimming + sampling show up
        # as nonzero drift, but nothing near a regime change
        assert r["w1"] is not None and r["w1"] > 0
        assert 0 < r["ks"] < 0.5
        assert r["n_docs"] > 0


def test_curate_preserves_unparseable_urls(spark):
    """Documents whose urls fail canonicalization (NULL from
    url_normalize) must keep DISTINCT dedup keys — not collapse into
    one corpus-wide NULL-keyed group."""
    rows = [
        ("example.com/a", "2024-01-01", b"", "alpha " * 30, "en"),
        ("example.com/b", "2024-01-01", b"", "bravo " * 30, "en"),
        ("http://ok.com/x", "2024-01-01", b"", "charlie " * 30, "en"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts string, html binary, text string, lang string"
    )
    curated, _ = curate_webpages(
        spark, df, delta=LOSSLESS, trim_lo=0.0, trim_hi=1.0,
        head_lang_fraction={},
    )
    assert curated.count() == 3  # nothing silently merged
