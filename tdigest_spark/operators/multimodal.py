"""Multimodal column handling: image/audio/video as opaque ``binary``
payloads with typed metadata structs, processed by Arrow-batched
``mapInPandas`` stages.

The sandbox has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (bytes -> uint8 "pixels"); swap
``_decode_bytes`` for PIL/librosa in production (the try-import is in
place). Everything around it — schema, metadata propagation,
partitioning, UDF signatures, Arrow batch shapes — is the real
pipeline and is tested + oracle-checked (the fake features are pure
byte arithmetic, reproducible in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

__all__ = ["synth_media", "media_sql_duckdb", "decode_features", "resize_media", "sample_frames"]

META_TYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

# LCG-derived payload: a shifted slice of a repeating 16-char alphabet,
# length exactly width*height bytes. Identical SQL renders in Spark and
# DuckDB (same trick as sources/webpages.py).
_TEMPLATE = """
WITH g AS (
  SELECT id, (id * 1103515245 + 12345) % 2147483648 AS u1 FROM {src}
), g2 AS (
  SELECT id, u1, (u1 * 69069 + 1) % 2147483648 AS u2 FROM g
), dims AS (
  SELECT id, u1, u2,
         cast(4 + u1 % 13 AS {INT}) AS width,
         cast(3 + u2 % 9 AS {INT}) AS height,
         cast(1 + (u1 * 69069 + 1) % 2147483648 % 16 AS {INT}) AS off
  FROM g2
)
SELECT id AS media_id,
  CASE WHEN id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
  {BINO}substr(repeat('abcdefghijklmnop', cast(width * height / 16 + 2 AS {INT})),
         off, width * height){BINC} AS payload,
  width, height,
  CASE WHEN id % 2 = 1 THEN 8000 ELSE 0 END AS sample_rate
FROM dims
"""


def media_sql_spark(n: int) -> str:
    return _TEMPLATE.format(src=f"range({n})", INT="INT", BINO="cast(", BINC=" AS BINARY)")


def media_sql_duckdb(n: int) -> str:
    return _TEMPLATE.format(src=f"range({n}) t(id)", INT="BIGINT", BINO="encode(", BINC=")")


def synth_media(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic media table: (media_id, kind, payload binary,
    metadata struct)."""
    flat = spark.sql(media_sql_spark(n))
    return flat.select(
        "media_id",
        "kind",
        "payload",
        F.struct(
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.col("sample_rate").cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _decode_bytes(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: bytes -> uint8 (height, width) array. Replace with
    PIL.Image.open for real images (``_HAS_PIL`` gate above)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return arr[: width * height].reshape(height, width)


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + per-item features, one Arrow batch at a time: n_bytes,
    mean/min/max byte value. Output keeps the metadata struct."""
    out_schema = T.StructType(
        [df.schema[c] for c in ("media_id", "kind", "meta")]
        + [
            T.StructField("n_bytes", T.LongType()),
            T.StructField("mean_byte", T.DoubleType()),
            T.StructField("min_byte", T.IntegerType()),
            T.StructField("max_byte", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["media_id", "kind", "meta"]].copy()
            n, mean, lo, hi = [], [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                img = _decode_bytes(
                    bytes(payload), int(meta["width"]), int(meta["height"])
                )
                n.append(img.size)
                mean.append(float(img.mean()))
                lo.append(int(img.min()))
                hi.append(int(img.max()))
            out["n_bytes"], out["mean_byte"] = n, mean
            out["min_byte"], out["max_byte"] = lo, hi
            yield out

    return df.mapInPandas(run, out_schema)


def resize_media(df: DataFrame, scale: int = 2) -> DataFrame:
    """Fake resize: keep every ``scale``-th column of the decoded
    array; payload + metadata updated consistently (the real pipeline
    shape for image downscaling)."""
    out_schema = T.StructType(
        [
            df.schema["media_id"],
            df.schema["kind"],
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", META_TYPE),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                img = _decode_bytes(bytes(payload), w, h)
                small = img[:, ::scale]
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "payload": small.tobytes(),
                        "meta": {
                            "width": small.shape[1],
                            "height": small.shape[0],
                            "sample_rate": int(meta["sample_rate"]),
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, frame_bytes: int = 16, every: int = 2) -> DataFrame:
    """Treat the payload as a frame sequence; keep every ``every``-th
    frame (video frame-sampling shape): outputs n_frames kept + a
    deterministic checksum of kept bytes."""
    out_schema = T.StructType(
        [
            df.schema["media_id"],
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("n_kept", T.IntegerType()),
            T.StructField("kept_checksum", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_full = len(b) // frame_bytes
                frames = b[: n_full * frame_bytes].reshape(n_full, frame_bytes)
                kept = frames[::every]
                rows.append(
                    {
                        "media_id": mid,
                        "n_frames": n_full,
                        "n_kept": int(kept.shape[0]),
                        "kept_checksum": int(kept.sum()),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)
