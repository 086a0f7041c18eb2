"""Streaming crawl ingest job: URL Bloom dedup -> near-dup index ->
quality gate -> exactly-once corpus + metrics commits."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from tdigest_spark.jobs.crawl_ingest import (
    crawl_ingest_sink,
    read_curated,
    read_ingest_metrics,
)
from tdigest_spark.streaming.neardup_stream import read_neardup_pairs

def _prose(tag: str) -> str:
    # shared opening + a long tag-specific tail: prose-like signals,
    # but distinct pages are NOT near-dups of each other
    return (
        "the quick brown fox and the lazy dog were out in the field "
        "while they watched the river " + " ".join(
            f"{tag}{j} and the {tag} {j}" for j in range(12)
        )
    )
SPAM = (
    "buy cheap buy cheap buy cheap http://spam.example/1 "
    "http://spam.example/2 http://spam.example/3 call 555 0199 555 "
    "0199 buy cheap buy cheap http://spam.example/4 now now now 99 99"
)

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _row(url, text):
    return (url, datetime(2026, 1, 1), bytearray(text.encode()), text, "en")


@pytest.fixture(scope="module")
def quality_split(spark):
    """Measured scores for the test texts — the threshold sits between
    the spam and prose scores, so the gate provably separates them."""
    from tdigest_spark.functions.quality import score_quality
    from tdigest_spark.functions.textstats import (
        with_curation_signals,
        with_text_stats,
    )

    df = spark.createDataFrame(
        [(0, SPAM), (1, _prose("probe"))], "i long, text string"
    )
    got = {
        r["i"]: r["quality_prob"]
        for r in score_quality(
            with_curation_signals(with_text_stats(df))
        ).collect()
    }
    assert got[0] < got[1], got  # spam must score below prose
    return (got[0] + got[1]) / 2


@pytest.fixture(scope="module")
def ingested(spark, quality_split, tmp_path_factory):
    root = tmp_path_factory.mktemp("crawl_job")
    src = root / "src"
    chunks = [
        [
            _row("http://site.example/a", _prose("alpha")),
            _row("http://site.example/b", _prose("beta")),
            _row("http://site.example/spam", SPAM),
        ],
        [
            # same canonical url as /a (tracking param stripped):
            # Bloom-dropped before the near-dup stage ever sees it
            _row("http://site.example/a?utm_source=x", _prose("gamma")),
            # different url, same TEXT as /a: near-dup drop
            _row("http://other.example/c", _prose("alpha")),
            _row("http://site.example/d", _prose("delta")),
        ],
    ]
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"chunk={i}")
        )
    dirs = {k: str(root / k) for k in ("idx", "pairs", "corpus", "ck")}

    def run(ck):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/chunk=*")
        )
        q = crawl_ingest_sink(
            stream, dirs["idx"], dirs["pairs"], dirs["corpus"], ck,
            quality_threshold=quality_split, n_shards=8,
        )
        q.awaitTermination(300)

    run(dirs["ck"])
    return spark, dirs, run


def test_end_to_end_dedup_and_quality(ingested):
    spark, dirs, _ = ingested
    cur = read_curated(spark, dirs["corpus"])
    urls = {r["url"] for r in cur.select("url").collect()}
    # /a and /b and /d survive; spam quality-rejected; the utm re-fetch
    # Bloom-dropped; the same-text other.example/c near-dup-dropped
    assert urls == {
        "http://site.example/a",
        "http://site.example/b",
        "http://site.example/d",
    }
    assert "quality_prob" in cur.columns
    assert set(cur.columns) >= {"url", "warc_ts", "html", "text", "lang"}
    pairs = {
        (r["batch_doc"], r["matched_doc"])
        for r in read_neardup_pairs(spark, dirs["pairs"]).collect()
    }
    assert len(pairs) == 1
    (a, b), = pairs
    assert a.endswith("other.example/c") and b.endswith("site.example/a")


def test_metrics_record_lineage(ingested):
    spark, dirs, _ = ingested
    m = read_ingest_metrics(dirs["corpus"])
    assert [x["batch_id"] for x in m] == [0, 1]
    assert m[0]["rows_after_neardup"] == 3
    assert m[0]["quality_rejected"] == 1 and m[0]["rows_out"] == 2
    # batch 1: utm re-fetch never reached the sink (Bloom), same-text
    # page dropped by the index probe — one row through, none rejected
    assert m[1]["rows_after_neardup"] == 1
    assert m[1]["quality_rejected"] == 0 and m[1]["rows_out"] == 1
    assert all(0.0 <= x["mean_quality"] <= 1.0 for x in m)


def test_quality_rejected_page_still_anchors_dedup(ingested):
    """The spam page is out of the corpus but IN the dedup index —
    a later re-crawl of near-identical spam must still collapse."""
    from tdigest_spark.streaming.neardup_stream import (
        _load_manifest,
        _segment_tables,
    )

    spark, dirs, _ = ingested
    man = _load_manifest(dirs["idx"])
    bands, _sh = _segment_tables(spark, dirs["idx"], man["segments"], None)
    ids = {r["canon_url"] for r in bands.select("canon_url").distinct().collect()}
    assert any(u.endswith("site.example/spam") for u in ids)


def test_adaptive_quality_gate(spark, tmp_path):
    """quality_quantile thresholds each batch against the score digest
    of PRIOR batches only: batch 0 sails through (no history), batch 1
    is gated at the history's quantile — so the spam page that would
    pass any lenient fixed floor is caught once real prose has set the
    bar. Replay applies identical thresholds (metrics equality)."""
    from tdigest_spark.jobs.crawl_ingest import read_score_digest

    root = tmp_path / "adaptive"
    src = root / "src"
    chunks = [
        [_row(f"http://q.example/{i}", _prose(f"tag{i}")) for i in range(4)],
        [
            _row("http://q.example/spam", SPAM),
            _row("http://q.example/good", _prose("fresh")),
        ],
    ]
    for i, rows in enumerate(chunks):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"chunk={i}")
        )
    dirs = {k: str(root / k) for k in ("idx", "pairs", "corpus", "ck")}

    def run(ck):
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/chunk=*")
        )
        crawl_ingest_sink(
            stream, dirs["idx"], dirs["pairs"], dirs["corpus"], ck,
            quality_quantile=0.25, n_shards=8,
        ).awaitTermination(300)

    run(dirs["ck"])
    m = read_ingest_metrics(dirs["corpus"])
    assert m[0]["applied_quality_threshold"] is None  # no history yet
    assert m[0]["quality_rejected"] == 0 and m[0]["rows_out"] == 4
    # batch 1's bar = p25 of the four prose scores; spam scores far
    # below every prose page, so it lands under the bar
    assert m[1]["applied_quality_threshold"] is not None
    assert m[1]["quality_rejected"] == 1 and m[1]["rows_out"] == 1
    urls = {
        r["url"] for r in read_curated(spark, dirs["corpus"]).select("url").collect()
    }
    assert "http://q.example/spam" not in urls
    assert "http://q.example/good" in urls
    # cumulative digest covers all six scored pages
    dig = read_score_digest(dirs["corpus"])
    assert dig is not None and dig.total_weight == 6.0
    # fresh-checkpoint replay: skipped batches leave state + metrics
    # byte-identical, including the applied thresholds
    run(dirs["ck"] + "_replay")
    assert read_ingest_metrics(dirs["corpus"]) == m
    assert read_score_digest(dirs["corpus"]).total_weight == 6.0


def test_decontamination_at_ingest(spark, tmp_path):
    """A heldout eval set blocks corpus admission on both legs: exact
    (byte-identical text) and near (LSH + Jaccard >= decon_threshold);
    clean pages pass through and the lineage metrics count the drops."""
    root = tmp_path / "decon"
    src = root / "src"
    keep = _prose("keepA")
    leak_exact = _prose("leakX")
    leak_near = _prose("leakY") + " zz yy xx"
    spark.createDataFrame(
        [
            _row("http://d.example/keep", keep),
            _row("http://d.example/exact", leak_exact),
            _row("http://d.example/near", leak_near),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    heldout = spark.createDataFrame(
        [(100, _prose("leakX")), (101, _prose("leakY"))],
        "doc_id long, text string",
    )
    dirs = {k: str(root / k) for k in ("idx", "pairs", "corpus", "ck")}
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/chunk=*")
    crawl_ingest_sink(
        stream, dirs["idx"], dirs["pairs"], dirs["corpus"], dirs["ck"],
        heldout=heldout, decon_threshold=0.8, n_shards=8,
    ).awaitTermination(300)
    urls = {
        r["url"] for r in read_curated(spark, dirs["corpus"]).select("url").collect()
    }
    assert urls == {"http://d.example/keep"}
    (m,) = read_ingest_metrics(dirs["corpus"])
    assert m["rows_after_neardup"] == 3
    assert m["decontaminated"] == 2
    assert m["quality_rejected"] == 0 and m["rows_out"] == 1


def test_decon_rows_excluded_from_adaptive_digest(spark, tmp_path):
    """Stage order matters: decontamination runs BEFORE scoring, so a
    leaked page never enters the adaptive gate's score digest — eval
    contamination must not move the corpus quality bar."""
    from tdigest_spark.jobs.crawl_ingest import read_score_digest

    root = tmp_path / "compose"
    src = root / "src"
    spark.createDataFrame(
        [
            _row("http://c.example/a", _prose("alpha")),
            _row("http://c.example/b", _prose("beta")),
            _row("http://c.example/leak", _prose("leaked")),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    heldout = spark.createDataFrame(
        [(7, _prose("leaked"))], "doc_id long, text string"
    )
    dirs = {k: str(root / k) for k in ("idx", "pairs", "corpus", "ck")}
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/chunk=*")
    crawl_ingest_sink(
        stream, dirs["idx"], dirs["pairs"], dirs["corpus"], dirs["ck"],
        heldout=heldout, quality_quantile=0.25, n_shards=8,
    ).awaitTermination(300)
    (m,) = read_ingest_metrics(dirs["corpus"])
    assert m["decontaminated"] == 1
    # digest holds the two clean pages only
    assert read_score_digest(dirs["corpus"]).total_weight == 2.0


def test_null_score_pages_rejected_and_counted(spark, tmp_path, quality_split):
    """A page whose text yields a NULL quality score (failed
    extraction) is unquantifiable: any active bar must reject it AND
    count it — the lineage metrics must match the written corpus."""
    root = tmp_path / "nullscore"
    src = root / "src"
    spark.createDataFrame(
        [
            _row("http://n.example/good", _prose("fine")),
            ("http://n.example/empty", datetime(2026, 1, 1), bytearray(b""), None, "en"),
        ],
        SCHEMA,
    ).coalesce(1).write.parquet(str(src / "chunk=0"))
    dirs = {k: str(root / k) for k in ("idx", "pairs", "corpus", "ck")}
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/chunk=*")
    crawl_ingest_sink(
        stream, dirs["idx"], dirs["pairs"], dirs["corpus"], dirs["ck"],
        quality_threshold=quality_split, n_shards=8,
    ).awaitTermination(300)
    (m,) = read_ingest_metrics(dirs["corpus"])
    urls = {
        r["url"] for r in read_curated(spark, dirs["corpus"]).select("url").collect()
    }
    assert urls == {"http://n.example/good"}
    assert m["quality_rejected"] == 1 and m["rows_out"] == 1  # metrics == corpus


def test_read_ingest_metrics_zero_batches(tmp_path):
    from tdigest_spark.jobs.crawl_ingest import read_ingest_metrics

    assert read_ingest_metrics(str(tmp_path / "nowhere")) == []


def test_cli_smoke(spark, tmp_path):
    import json
    import os
    import subprocess
    import sys

    src = tmp_path / "src"
    rows = [
        _row("http://cli.example/a", _prose("cliA")),
        _row("http://cli.example/b", _prose("cliB")),
        _row("http://dup.example/a2", _prose("cliA")),  # near-dup of /a
    ]
    for i, r in enumerate(rows):
        spark.createDataFrame([r], SCHEMA).coalesce(1).write.parquet(
            str(src / f"chunk={i}")
        )
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [
            sys.executable, "-m", "tdigest_spark.jobs.crawl_ingest",
            "--src", f"{src}/chunk=*",
            "--work-dir", str(tmp_path / "work"),
            "--max-files-per-trigger", "1",
            "--compact",
        ],
        capture_output=True, text=True, timeout=420, cwd="/root/repo", env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    summary = lines[-1]
    assert summary["batches"] == 3
    assert summary["rows_out"] == 2  # the near-dup re-crawl collapsed
    assert summary["quality_rejected"] == 0
    assert summary["segments_compacted"] == 2  # dup batch added no segment


def test_replay_is_exactly_once(ingested):
    spark, dirs, run = ingested
    before = sorted(
        (r["url"],) for r in read_curated(spark, dirs["corpus"]).collect()
    )
    m_before = read_ingest_metrics(dirs["corpus"])
    run(dirs["ck"] + "_replay")  # fresh checkpoint replays every batch
    after = sorted(
        (r["url"],) for r in read_curated(spark, dirs["corpus"]).collect()
    )
    assert after == before
    assert read_ingest_metrics(dirs["corpus"]) == m_before
