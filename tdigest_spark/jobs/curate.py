"""End-to-end curation job over the web-pages table: the composition a
training-data pipeline actually runs, built entirely from this
engine's operators — runnable via ``spark-submit --py-files``.

Stages (each a narrow/one-shuffle step; no raw-row collect anywhere):

 1. canonical keys     ``url_normalize`` (pure codegen)
 2. exact dedup        ``exact_dedup`` on the canonical url — variant
                       urls of one document collapse first
 3. quality trimming   per-lang lossless/δ digests of text length ->
                       ``filter_percentile_range`` drops each
                       language's bottom ``trim_lo`` tail (boilerplate
                       stubs) and top ``trim_hi`` tail (concatenation
                       junk)
 3b. model scoring     (optional, ``quality_threshold``) the broadcast
                       logistic scorer ``score_quality`` over the
                       curation-signal columns — the fastText-
                       classifier slot; pure codegen, same stage as
                       the trim filter, no extra shuffle
 4. rebalance          ``stratified_sample`` caps the head language
                       ('en' is ~45% of the crawl by design)
 5. splits             ``split_by_hash`` train/val/test on the
                       canonical url — leakage-proof across any table
                       keyed the same way
 6. drift gate         ``digest_drift`` of the CURATED text-length
                       distribution vs the RAW one per lang — curation
                       is supposed to move the distribution (trimming
                       shows up in W1); the report quantifies it, and
                       on a later crawl the same call against the
                       previous snapshot is the regression gate
 7. report             one JSON line per lang x split + drift metrics

The job writes the curated table partitioned by split (parquet /
Iceberg via sources.catalog) and prints the report; nothing here is
sf-specific — at 100 TB only the input DataFrame changes.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from tdigest_spark.functions.text import with_text_features
from tdigest_spark.functions.urls import url_normalize
from tdigest_spark.operators.dedup import exact_dedup
from tdigest_spark.operators.digest_agg import (
    filter_percentile_range,
    tdigest_agg,
)
from tdigest_spark.operators.drift import digest_drift
from tdigest_spark.operators.sampling import split_by_hash, stratified_sample
from tdigest_spark.sources.webpages import synth_webpages

__all__ = ["curate_webpages", "main"]


def curate_webpages(
    spark: SparkSession,
    pages: DataFrame,
    delta: int = 200,
    trim_lo: float = 0.05,
    trim_hi: float = 0.99,
    head_lang_fraction: dict | None = None,
    splits: dict | None = None,
    seed: int = 0,
    quality_threshold: float | None = None,
    quality_weights: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation pipeline over ``pages`` (the input_hint table:
    url/warc_ts/html/text/lang). Returns ``(curated, report)`` —
    curated rows carry ``canon_url``/``n_chars``/``split`` (plus
    ``quality_prob`` when the model stage is on); the report has one
    row per (lang, split) with counts plus the per-lang raw-vs-curated
    drift metrics. ``quality_threshold`` switches on the model-based
    quality stage (3b): rows scoring below it are dropped;
    ``quality_weights`` overrides the default heuristic fit."""
    # explicit {} means "no rebalance" — only None selects the default
    if head_lang_fraction is None:
        head_lang_fraction = {"en": 0.5}
    if splits is None:
        splits = {"train": 0.9, "val": 0.05, "test": 0.05}

    # url_normalize yields NULL for unparseable urls; fall back to the
    # raw url so such documents keep DISTINCT dedup keys — otherwise
    # every malformed-url document corpus-wide would share one NULL key
    # and exact_dedup would keep a single survivor
    staged = with_text_features(
        pages.withColumn(
            "canon_url", F.coalesce(url_normalize("url"), F.col("url"))
        )
    )
    deduped = exact_dedup(staged, ["canon_url"], id_col="url")
    raw_digests = tdigest_agg(
        deduped, "n_chars", by=["lang"], delta=delta
    ).localCheckpoint(eager=True)
    trimmed = filter_percentile_range(
        deduped, raw_digests, "n_chars", trim_lo, trim_hi, by=["lang"]
    )
    if quality_threshold is not None:
        from tdigest_spark.functions.quality import score_quality
        from tdigest_spark.functions.textstats import (
            with_curation_signals,
            with_text_stats,
        )

        # all-projection stage: signals + score + filter fuse into the
        # same whole-stage-codegen pass as the trim filter above; the
        # helper columns are dropped again so the curated schema only
        # gains quality_prob
        scored = score_quality(
            with_curation_signals(with_text_stats(trimmed)),
            weights=quality_weights,
        )
        added = [
            c for c in scored.columns
            if c not in trimmed.columns and c != "quality_prob"
        ]
        trimmed = scored.where(
            F.col("quality_prob") >= quality_threshold
        ).drop(*added)
    balanced = stratified_sample(
        trimmed, "lang", head_lang_fraction, key_cols="canon_url",
        default=1.0, seed=seed,
    )
    # pin the curated table: three consumers follow (the caller's
    # write, the count report, the drift digests) — without this the
    # whole dedup+trim+sample chain re-executes per consumer
    curated = split_by_hash(balanced, "canon_url", splits, seed=seed + 1).localCheckpoint(
        eager=False
    )

    cur_digests = tdigest_agg(curated, "n_chars", by=["lang"], delta=delta)
    drift = digest_drift(raw_digests, cur_digests, by=["lang"], how="left")
    counts = curated.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))
    report = counts.join(F.broadcast(drift), "lang", "left").orderBy("lang", "split")
    return curated, report


def main() -> None:
    """spark-submit --py-files tdigest_spark.zip -m tdigest_spark.jobs.curate"""
    import argparse

    from tdigest_spark.session import get_spark
    from tdigest_spark.sources.catalog import write_table

    ap = argparse.ArgumentParser(description="web-pages curation job")
    ap.add_argument("--n-docs", type=int, default=1_000_000)
    ap.add_argument("--out-dir", default="/tmp/curated_webpages")
    ap.add_argument("--delta", type=int, default=200)
    ap.add_argument("--trim-lo", type=float, default=0.05)
    ap.add_argument("--trim-hi", type=float, default=0.99)
    ap.add_argument(
        "--quality-threshold", type=float, default=None,
        help="enable the model-based quality stage; drop rows whose "
             "logistic keep-probability is below this",
    )
    args = ap.parse_args()

    spark = get_spark("curate_webpages")
    t0 = time.perf_counter()
    pages = synth_webpages(
        spark, args.n_docs, n_partitions=spark.sparkContext.defaultParallelism * 2
    )
    curated, report = curate_webpages(
        spark, pages, delta=args.delta, trim_lo=args.trim_lo,
        trim_hi=args.trim_hi, quality_threshold=args.quality_threshold,
    )
    write_table(
        curated.select("canon_url", "lang", "n_chars", "split", "text"),
        args.out_dir,
        partition_by=("split",),
    )
    for r in report.collect():
        print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v) for k, v in r.asDict().items()}))
    dt = time.perf_counter() - t0
    print(json.dumps({"total_wall_s": round(dt, 2), "docs_per_sec": round(args.n_docs / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
