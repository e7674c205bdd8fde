"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Not present in the reference (its only non-text payloads are the unused
PDFs in ``data/``); this is the north star's multimodal surface. Design:

- media is an opaque ``binary`` column plus a typed metadata struct
  (modality, mime, width/height/duration, sha256) — the pattern that scales
  to 100 TB because Spark never interprets the bytes except inside
  explicitly-chosen Arrow-batched stages;
- decode / feature-extract / resize / frame-sample run via ``mapInPandas``
  (arrow batches of bytes → numpy), partition-parallel;
- the actual codec work is STUBBED (``NotImplementedError`` or a
  deterministic fake) because image/audio libs aren't in this container —
  the Spark-side plumbing (schema, batch shape, partitioning, UDF
  signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("sha256", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 24) -> DataFrame:
    """Deterministic fake media: payload bytes are seeded by media_id, so
    every stage downstream is reproducible."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(
            hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 5)
        )
        meta = {
            "width": 64 + i if modality != "audio" else None,
            "height": 48 + i if modality != "audio" else None,
            "duration_ms": 1000 * (i + 1) if modality != "image" else None,
            "sha256": hashlib.sha256(payload).hexdigest(),
        }
        mime = {
            "image": "image/png",
            "audio": "audio/wav",
            "video": "video/mp4",
        }[modality]
        rows.append((i, modality, mime, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB: real decode needs an image lib not present in this container.
    The mapInPandas plumbing around it is real; swap this body for
    PIL/cv2 in production."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/cv2); "
        "use fake_feature() for deterministic tests"
    )


def fake_feature(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature: byte-histogram folded to ``dim``
    buckets, L2-normalized. Exercises the same batch shapes as a real
    decoder+encoder without any codec dependency."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
    n = np.sqrt(hist @ hist)
    return (hist / n if n else hist).astype(np.float32)


def extract_features(
    media: DataFrame, *, dim: int = 16, batch_hint: int = 64
) -> DataFrame:
    """Decode/feature-extract via mapInPandas: Arrow batches of payload
    bytes → fixed-dim feature vectors. The iterator-of-batches signature
    is the real production shape (model loads once per partition, batches
    stream through)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # (real decoders initialize their model/codec HERE, once)
        for pdf in batches:
            feats = [
                fake_feature(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": [
                        len(bytes(p)) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (the decode itself is stubbed). Demonstrates the explode pattern that
    turns one video row into N frame rows without touching the payload."""
    frames = media.where(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames
