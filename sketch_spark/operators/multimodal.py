"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED (no image/audio libs in this container): it
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (seeded from the payload bytes) exercises the
full Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — which IS real and tested (tests/test_multimodal.py).

Schema convention:
  media(media_id long, kind string, payload binary, meta struct<
        width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature extractor: SHA-256 of payload -> seeded
    uniform feature vector.  Stands in for a real decode+embed step."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=dim).astype(np.float32)


def extract_features(
    media: DataFrame,
    fake: bool = True,
    dim: int = FEATURE_DIM,
    batch_note_col: str | None = "batch_rows",
) -> DataFrame:
    """media -> (media_id, kind, features array<float>, batch_rows int).

    Real deployment replaces _fake_decode with PIL/torchaudio/decord decode
    inside the same mapInPandas generator; the Spark plan is identical.
    batch_rows records the Arrow batch size each row was processed in
    (observable evidence of vectorized batching, used by tests).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; pass fake=True for the plumbing path"
                )
            feats = [
                _fake_decode(bytes(p), dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )
            out["batch_rows"] = len(pdf)
            yield out

    return media.mapInPandas(
        gen,
        schema="media_id long, kind string, features array<float>, batch_rows int",
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-JVM metadata transform: target dimensions after a bounded
    resize (the control-plane half of an image resize; the pixel half lives
    in the decode UDF)."""
    w = F.col("meta.width")
    h = F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side,
        F.lit(max_side) / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "kind",
        F.round(w * scale).cast("int").alias("target_width"),
        F.round(h * scale).cast("int").alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per selected frame index —
    a JVM sequence/explode, no decode needed to plan the work."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_idx"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.integers(0, 64)))
        meta = (
            int(rng.integers(64, 4096)),
            int(rng.integers(64, 4096)),
            16000 if kind == "audio" else 0,
            int(rng.integers(1, 300)) if kind == "video" else 0,
        )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
