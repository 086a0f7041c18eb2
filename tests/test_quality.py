"""Model-based quality scorer: golden sigmoid values, a DuckDB twin of
the logistic over the same signal values, an all-codegen plan
assertion, and the curate-job wiring."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from tdigest_spark.functions.quality import (
    DEFAULT_BIAS,
    DEFAULT_WEIGHTS,
    score_quality,
    sigmoid,
)
from tdigest_spark.functions.textstats import (
    with_curation_signals,
    with_text_stats,
)
from tdigest_spark.sources.tables import load


@pytest.fixture(scope="module")
def scored(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return score_quality(with_curation_signals(with_text_stats(docs))).cache()


def test_probability_range_and_monotone_features(spark):
    """Golden rows: hand-built signal values -> exact sigmoid; spammy
    signals push the probability down, prose signals up."""
    rows = [
        # (dup, top, stop, emails, urls, numbers, n_tokens)
        (0.1, 0.05, 0.4, 0, 0, 2, 200),   # prose-like
        (0.8, 0.6, 0.05, 40, 30, 50, 200),  # link farm
    ]
    df = spark.createDataFrame(
        rows,
        "dup_token_frac double, top_token_frac double, "
        "stopword_ratio_en double, n_emails int, n_urls int, "
        "n_numbers int, n_tokens int",
    )
    got = {
        round(r["quality_prob"], 12)
        for r in score_quality(df).collect()
    }
    expect = set()
    for dup, top, stop, em, ur, num, n in rows:
        z = (
            DEFAULT_BIAS
            + DEFAULT_WEIGHTS["dup_token_frac"] * dup
            + DEFAULT_WEIGHTS["top_token_frac"] * top
            + DEFAULT_WEIGHTS["stopword_ratio_en"] * stop
            + DEFAULT_WEIGHTS["emails_per_token"] * em / n
            + DEFAULT_WEIGHTS["urls_per_token"] * ur / n
            + DEFAULT_WEIGHTS["numbers_per_token"] * num / n
            + DEFAULT_WEIGHTS["log10_n_tokens"] * math.log10(n)
        )
        expect.add(round(sigmoid(z), 12))
    assert got == expect
    probs = sorted(expect)
    assert 0.0 < probs[0] < 0.5 < probs[1] < 1.0  # farm low, prose high


def test_duckdb_twin_on_real_corpus(scored):
    """DuckDB recomputes the logistic from the SAME signal values —
    an independent engine agreeing on every document's score (the
    signal columns themselves are oracle-verified by the tx_* driver
    rows)."""
    pdf = scored.select(
        "doc_id", "dup_token_frac", "top_token_frac", "stopword_ratio_en",
        "n_emails", "n_urls", "n_numbers", "n_tokens",
        F.round("quality_prob", 9).alias("quality_prob"),
    ).toPandas()
    feats = pdf.drop(columns=["quality_prob"])
    con = duckdb.connect()
    con.register("feats", feats)
    w = DEFAULT_WEIGHTS
    q = con.execute(f"""
        SELECT doc_id, round(1.0 / (1.0 + exp(-(
            {DEFAULT_BIAS}
            + {w['dup_token_frac']} * dup_token_frac
            + {w['top_token_frac']} * top_token_frac
            + {w['stopword_ratio_en']} * stopword_ratio_en
            + {w['emails_per_token']} * n_emails / greatest(n_tokens, 1)
            + {w['urls_per_token']} * n_urls / greatest(n_tokens, 1)
            + {w['numbers_per_token']} * n_numbers / greatest(n_tokens, 1)
            + {w['log10_n_tokens']} * log10(greatest(n_tokens, 1))
        ))), 9) AS quality_prob
        FROM feats ORDER BY doc_id
    """).df()
    mine = pdf[["doc_id", "quality_prob"]].sort_values("doc_id").reset_index(drop=True)
    assert (mine["quality_prob"] == q["quality_prob"]).all()
    assert len(mine) > 0


def test_plan_is_pure_codegen(spark, sf_dir):
    """No Exchange, no Python evaluation anywhere in the scoring plan —
    the 100 TB plan is a single projection pass over the scan (built
    fresh here, NOT from the cached fixture, so the parquet scan and
    codegen spans are visible)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    fresh = score_quality(with_curation_signals(with_text_stats(docs)))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython",
                "MapInPandas", "FlatMapGroupsInPandas"):
        assert bad not in plan, f"{bad} in plan:\n{plan[:3000]}"
    # "*(n)" is the whole-stage-codegen marker in the plan string form
    assert "*(" in plan


def test_missing_signal_column_fails_loudly(spark):
    df = spark.createDataFrame([(1, "hello")], "doc_id int, text string")
    with pytest.raises(Exception, match="dup_token_frac|UNRESOLVED"):
        score_quality(df).collect()


def test_curate_job_quality_stage(spark):
    """The optional stage drops low scorers, keeps the curated schema
    plus quality_prob, and stays off by default."""
    from tdigest_spark.jobs.curate import curate_webpages
    from tdigest_spark.sources.webpages import synth_webpages

    pages = synth_webpages(spark, 3000, n_partitions=4)
    base, _ = curate_webpages(spark, pages, head_lang_fraction={})
    assert "quality_prob" not in base.columns
    # the synthetic crawl is templated text (zero stopwords, high
    # token repetition) so its absolute scores sit far below real
    # prose — use its own median as the threshold; the test verifies
    # the WIRING (filter + schema), calibration is the caller's job
    med = score_quality(
        with_curation_signals(with_text_stats(pages))
    ).agg(F.expr("percentile(quality_prob, 0.5)")).first()[0]
    cur, _ = curate_webpages(
        spark, pages, head_lang_fraction={}, quality_threshold=med
    )
    assert "quality_prob" in cur.columns
    n_base, n_cur = base.count(), cur.count()
    assert 0 < n_cur < n_base  # it filtered something, not everything
    assert cur.where(F.col("quality_prob") < med).count() == 0
    # no signal helper columns leak into the curated schema
    assert "dup_token_frac" not in cur.columns and "n_urls" not in cur.columns
