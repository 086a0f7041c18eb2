"""Multimodal query family: REAL binary decode / resize / frame-sample
pipelines over the deterministic synthetic media table.

Payloads are genuine PNG/WAV files; the Spark side must decode the
container (zlib inflate + scanline unfilter / RIFF walk + PCM unpack)
to produce these features. The ORACLE never decodes: the generator
draws pixel/sample values from closed-form formulas of
(media_id, index), so DuckDB recomputes the expected decoded-domain
features from the formulas alone — agreement proves the decode is
faithful, not echoed."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.multimodal import (
    PIXEL_SQL,
    SAMPLE_SQL,
    decode_features,
    media_dims_duckdb,
    resize_media,
    sample_frames,
    synth_media,
)

N_MEDIA = 2_000
_DIMS = media_dims_duckdb(N_MEDIA)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, N_MEDIA)
    out = decode_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_units",
        "n_channels",
        F.round("mean_val", 4).alias("mean_val"),
        "min_val",
        "max_val",
        F.round("ch0_mean", 4).alias("ch0_mean"),
        F.round("ch1_mean", 4).alias("ch1_mean"),
        F.round("ch2_mean", 4).alias("ch2_mean"),
    )


def mm_transform_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both decoded-domain transform operators in one driver row set
    (consolidated under the 50-row budget): image rows go through
    ``resize_media`` (decode -> drop every 2nd column -> re-encode PNG;
    the pixel checksum is then recovered by DECODING THE RE-ENCODED
    payload via ``sample_frames(frame_len=1)``, so the row checks the
    full decode->transform->encode->decode cycle), audio rows through
    ``sample_frames`` (every-2nd-frame of decoded samples kept)."""
    media = synth_media(spark, N_MEDIA)
    resized = resize_media(media.where(F.col("kind") == "image"), scale=2)
    px = sample_frames(resized, frame_len=1, every=1).select(
        "media_id", F.col("kept_checksum").alias("px_sum")
    )
    small = (
        resized.select(
            "media_id",
            F.col("meta.width").alias("new_width"),
            F.col("meta.height").alias("new_height"),
        )
        .join(px, "media_id")
        .select(
            "media_id",
            "new_width",
            "new_height",
            "px_sum",
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("n_kept"),
            F.lit(None).cast("long").alias("kept_checksum"),
        )
    )
    frames = sample_frames(
        media.where(F.col("kind") == "audio"), frame_len=16, every=2
    ).select(
        "media_id",
        F.lit(None).cast("int").alias("new_width"),
        F.lit(None).cast("int").alias("new_height"),
        F.lit(None).cast("long").alias("px_sum"),
        "n_frames",
        "n_kept",
        "kept_checksum",
    )
    return small.unionByName(frames)




def mm_decode_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 consolidation of mm_decode_features + mm_transform_meta
    into ONE driver row (join on media_id — the 50-row cap discipline,
    SURVEY.md §8.3): every column of both former rows survives in the
    hash, so the evidence strength is unchanged. Decoded-domain
    features AND the decode->transform->encode->decode cycle checks in
    a single row set."""
    feats = mm_decode_features(spark, sf_dir)
    meta = mm_transform_meta(spark, sf_dir)
    return feats.join(meta, "media_id")

QUERIES = {
    "mm_decode_transform": mm_decode_transform,
}

ORACLES = {
    "mm_decode_transform": f"""
        WITH feats AS (
        WITH dims AS ({_DIMS}),
        vals AS (
          SELECT media_id, kind, n_units, channels,
            CASE WHEN kind = 'image'
              THEN [{PIXEL_SQL} FOR i IN range(0, n_units)]
              ELSE [{SAMPLE_SQL} FOR i IN range(0, n_units)]
            END AS v,
            -- channel c = flat index i % channels (pixel-interleaved
            -- RGB / frame-interleaved stereo, matching the containers)
            CASE WHEN kind = 'image'
              THEN [{PIXEL_SQL} FOR i IN range(0, n_units)
                    IF i % channels = 0]
              ELSE [{SAMPLE_SQL} FOR i IN range(0, n_units)
                    IF i % channels = 0]
            END AS v0,
            CASE WHEN channels < 2 THEN NULL
                 WHEN kind = 'image'
              THEN [{PIXEL_SQL} FOR i IN range(0, n_units)
                    IF i % channels = 1]
              ELSE [{SAMPLE_SQL} FOR i IN range(0, n_units)
                    IF i % channels = 1]
            END AS v1,
            CASE WHEN channels < 3 THEN NULL
              ELSE [{PIXEL_SQL} FOR i IN range(0, n_units)
                    IF i % channels = 2]
            END AS v2
          FROM dims)
        SELECT media_id, kind,
               n_units::BIGINT AS n_units,
               channels::INT AS n_channels,
               round(list_sum(v) / n_units, 4) AS mean_val,
               list_min(v)::INT AS min_val,
               list_max(v)::INT AS max_val,
               round(list_sum(v0) / (n_units // channels), 4) AS ch0_mean,
               round(list_sum(v1) / (n_units // channels), 4) AS ch1_mean,
               round(list_sum(v2) / (n_units // channels), 4) AS ch2_mean
        FROM vals
    ),
        meta AS (
        WITH dims AS ({_DIMS})
        SELECT media_id,
               cast((width + 1) // 2 AS INT) AS new_width,
               cast(height AS INT) AS new_height,
               -- resize keeps even COLUMNS: flat index i belongs to
               -- column (i // channels) % width (all channels of a
               -- kept pixel survive together)
               list_sum(
                 [{PIXEL_SQL} FOR i IN range(0, n_units)
                  IF ((i // channels) % width) % 2 = 0]
               )::BIGINT AS px_sum,
               cast(NULL AS INT) AS n_frames,
               cast(NULL AS INT) AS n_kept,
               cast(NULL AS BIGINT) AS kept_checksum
        FROM dims WHERE kind = 'image'
        UNION ALL
        SELECT media_id,
               cast(NULL AS INT), cast(NULL AS INT), cast(NULL AS BIGINT),
               -- sample_frames windows the FLAT decoded sequence
               -- (n_units values; stereo interleaved), frame_len=16
               cast(n_units // 16 AS INT) AS n_frames,
               cast((n_units // 16 + 1) // 2 AS INT) AS n_kept,
               coalesce(list_sum(
                 [{SAMPLE_SQL} FOR i IN range(0, (n_units // 16) * 16)
                  IF (i // 16) % 2 = 0]
               ), 0)::BIGINT AS kept_checksum
        FROM dims WHERE kind = 'audio'
    )
        SELECT f.*, m.new_width, m.new_height, m.px_sum,
               m.n_frames, m.n_kept, m.kept_checksum
        FROM feats f JOIN meta m USING (media_id)
    """,
}
