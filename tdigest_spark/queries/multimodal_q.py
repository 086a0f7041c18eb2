"""Multimodal query family: binary payload decode / resize /
frame-sample pipelines over the deterministic synthetic media table.
The fake decode is pure byte arithmetic, so DuckDB reproduces every
feature from the same generated payload string (ascii() comprehension
over the regenerated payload)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tdigest_spark.operators.multimodal import (
    decode_features,
    media_sql_duckdb,
    resize_media,
    sample_frames,
    synth_media,
)

N_MEDIA = 2_000
_DUCK = media_sql_duckdb(N_MEDIA)

# ascii codes of the payload string, 1-indexed slice helpers
_CODES = "[ascii(p[i]) FOR i IN range(1, length(p)+1)]"


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synth_media(spark, N_MEDIA)
    out = decode_features(media)
    return out.select(
        "media_id",
        "kind",
        "n_bytes",
        F.round("mean_byte", 4).alias("mean_byte"),
        "min_byte",
        "max_byte",
    )


def mm_transform_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both Arrow-batched transform operators in one driver row set
    (consolidates round-2's mm_resize_meta + mm_frame_sample under the
    50-row budget): image rows go through ``resize_media`` (payload +
    metadata updated consistently), audio rows through
    ``sample_frames`` (every-2nd-frame kept, checksum of kept bytes);
    the union carries NULLs in the other operator's columns."""
    media = synth_media(spark, N_MEDIA)
    small = resize_media(media.where(F.col("kind") == "image"), scale=2).select(
        "media_id",
        F.col("meta.width").alias("new_width"),
        F.col("meta.height").alias("new_height"),
        F.length("payload").alias("n_bytes"),
        F.lit(None).cast("int").alias("n_frames"),
        F.lit(None).cast("int").alias("n_kept"),
        F.lit(None).cast("long").alias("kept_checksum"),
    )
    frames = sample_frames(
        media.where(F.col("kind") == "audio"), frame_bytes=16, every=2
    ).select(
        "media_id",
        F.lit(None).cast("int").alias("new_width"),
        F.lit(None).cast("int").alias("new_height"),
        F.lit(None).cast("int").alias("n_bytes"),
        "n_frames",
        "n_kept",
        "kept_checksum",
    )
    return small.unionByName(frames)


QUERIES = {
    "mm_decode_features": mm_decode_features,
    "mm_transform_meta": mm_transform_meta,
}

ORACLES = {
    "mm_decode_features": f"""
        WITH media AS ({_DUCK}),
        codes AS (SELECT media_id, kind, decode(payload) AS p FROM media)
        SELECT media_id, kind,
               length(p)::BIGINT AS n_bytes,
               round(list_avg({_CODES}), 4) AS mean_byte,
               list_min({_CODES}) AS min_byte,
               list_max({_CODES}) AS max_byte
        FROM codes
    """,
    "mm_transform_meta": f"""
        WITH media AS ({_DUCK}),
        f AS (SELECT media_id, decode(payload) AS p,
                     octet_length(payload) // 16 AS n_full
              FROM media WHERE kind = 'audio')
        SELECT media_id,
               cast((width + 1) // 2 AS INT) AS new_width,
               cast(height AS INT) AS new_height,
               cast(((width + 1) // 2) * height AS INT) AS n_bytes,
               cast(NULL AS INT) AS n_frames,
               cast(NULL AS INT) AS n_kept,
               cast(NULL AS BIGINT) AS kept_checksum
        FROM media WHERE kind = 'image'
        UNION ALL
        SELECT media_id,
               cast(NULL AS INT), cast(NULL AS INT), cast(NULL AS INT),
               cast(n_full AS INT) AS n_frames,
               cast((n_full + 1) // 2 AS INT) AS n_kept,
               coalesce(list_sum(
                 [ascii(p[i]) FOR i IN range(1, n_full * 16 + 1)
                  IF ((i - 1) // 16) % 2 = 0]
               ), 0)::BIGINT AS kept_checksum
        FROM f
    """,
}
