"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched pandas UDFs.

Decode support is tiered by what this environment can actually do:

  * image — REAL decode for binary netpbm (P5 grayscale / P6 RGB): header
    parse + numpy frombuffer, features = 4x4 grid-mean pooling (16-dim).
  * audio — REAL decode for PCM WAV via the stdlib `wave` module:
    features = 16 windowed RMS energies.
  * video (and compressed image/audio codecs: JPEG/PNG/MP4/…) — STUB:
    no codec libs exist in this container, so those rows yield null
    features on the real path, or a deterministic fake (seeded from the
    payload bytes) when fake=True.  A deployment swaps _decode_* for
    PIL/torchaudio/decord inside the SAME mapInPandas generator; the Spark
    plan (schema, Arrow batching, partitioning) is identical and is what
    the tests pin (tests/test_sketches.py::test_multimodal_plumbing,
    test_multimodal_real_decode).

Schema convention:
  media(media_id long, kind string, payload binary, meta struct<
        width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
import io
import wave
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


# ---------------------------------------------------------------------------
# real decoders (stdlib + numpy only)
# ---------------------------------------------------------------------------


def _decode_netpbm(payload: bytes) -> np.ndarray | None:
    """Binary netpbm P5 (grayscale) / P6 (RGB) -> (H, W) luma in [0, 1]."""
    if payload[:2] not in (b"P5", b"P6"):
        return None
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comment lines starting with '#' allowed), then one whitespace byte,
    # then raw samples.
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(payload):
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        w, h, maxval = (int(t) for t in toks)
    except (ValueError, TypeError):
        return None
    nch = 3 if payload[:2] == b"P6" else 1
    need = w * h * nch * (2 if maxval > 255 else 1)
    raw = payload[i : i + need]
    # w/h <= 0 must fail decode here: a zero-width header parses "cleanly"
    # (need = 0) but the empty axis crashes np.pad in _image_features
    if len(raw) < need or maxval <= 0 or w <= 0 or h <= 0:
        return None
    dt = ">u2" if maxval > 255 else np.uint8
    arr = np.frombuffer(raw, dtype=dt).astype(np.float64) / maxval
    arr = arr.reshape(h, w, nch)
    return arr.mean(axis=2)


def _image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """4x4 grid-mean pooling (a real, deterministic visual fingerprint)."""
    g = int(dim ** 0.5)
    h, w = img.shape
    if h < g or w < g:
        img = np.pad(img, ((0, max(0, g - h)), (0, max(0, g - w))), mode="edge")
        h, w = img.shape
    img = img[: h // g * g, : w // g * g]
    pool = img.reshape(g, h // g, g, w // g).mean(axis=(1, 3))
    return pool.flatten().astype(np.float32)


def _decode_wav(payload: bytes) -> np.ndarray | None:
    """PCM WAV -> mono float waveform in [-1, 1] (stdlib wave module)."""
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sw = wf.getsampwidth()
            nch = wf.getnchannels()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError):
        return None
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    else:
        return None
    if nch > 1:
        x = x[: len(x) // nch * nch].reshape(-1, nch).mean(axis=1)
    return x


def _audio_features(x: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Windowed RMS energies over `dim` equal time slices."""
    if x.size < dim:
        x = np.pad(x, (0, dim - x.size))
    x = x[: x.size // dim * dim].reshape(dim, -1)
    return np.sqrt((x * x).mean(axis=1)).astype(np.float32)


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake feature extractor: SHA-256 of payload -> seeded
    uniform feature vector.  Stands in for codec formats this container
    cannot decode (JPEG/PNG/MP4)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1.0, 1.0, size=dim).astype(np.float32)


def decode_features(payload: bytes, kind: str, dim: int = FEATURE_DIM):
    """Real decode dispatch; None when the payload isn't a supported
    container (netpbm image / PCM WAV audio)."""
    if kind == "image":
        img = _decode_netpbm(payload)
        return None if img is None else _image_features(img, dim)
    if kind == "audio":
        x = _decode_wav(payload)
        return None if x is None else _audio_features(x, dim)
    return None  # video: no stdlib container format


def extract_features(
    media: DataFrame,
    fake: bool = False,
    dim: int = FEATURE_DIM,
    batch_note_col: str | None = "batch_rows",
) -> DataFrame:
    """media -> (media_id, kind, features array<float>, batch_rows int).

    fake=False (default): REAL decode for netpbm images and PCM WAV audio;
    rows whose payload isn't one of those (video, compressed codecs) get
    null features.  fake=True: the deterministic payload-seeded stand-in
    for every row (plumbing tests / codec-less pipelines).  batch_rows
    records the Arrow batch size each row was processed in (observable
    evidence of vectorized batching, used by tests)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, kind in zip(pdf["payload"], pdf["kind"]):
                if p is None:
                    feats.append(None)
                    continue
                if fake:
                    feats.append(_fake_decode(bytes(p), dim).tolist())
                    continue
                f = decode_features(bytes(p), kind, dim)
                feats.append(None if f is None else f.tolist())
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
    # each side clamps to >= 1: an extreme aspect ratio (1 x 4096 at
    # max_side 256) would otherwise round the thin side to 0
    return media.select(
        "media_id",
        "kind",
        F.greatest(F.round(w * scale).cast("int"), F.lit(1)).alias("target_width"),
        F.greatest(F.round(h * scale).cast("int"), F.lit(1)).alias("target_height"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: one row per selected frame index —
    a JVM sequence/explode, no decode needed to plan the work."""
    # n_frames <= 0 yields NO rows (the greatest(n-1, 0) floor otherwise
    # scheduled a phantom frame 0 of a zero-frame video); NULL n_frames
    # already drops through the null sequence + explode
    return media.where(
        (F.col("kind") == "video") & (F.col("meta.n_frames") > 0)
    ).select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def make_ppm(width: int, height: int, rng: np.random.Generator) -> bytes:
    """A real binary P6 image payload."""
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + rng.integers(0, 256, size=width * height * 3, dtype=np.uint8).tobytes()


def make_wav(n_samples: int, rng: np.random.Generator, rate: int = 16000) -> bytes:
    """A real 16-bit mono PCM WAV payload."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            rng.integers(-32768, 32768, size=n_samples, dtype=np.int16).tobytes()
        )
    return buf.getvalue()


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL P6 images and PCM WAVs,
    plus opaque video payloads (the stubbed modality)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            payload = make_ppm(w, h, rng)
            meta = (w, h, 0, 0)
        elif kind == "audio":
            ns = int(rng.integers(200, 2000))
            payload = make_wav(ns, rng)
            meta = (0, 0, 16000, 0)
        else:
            payload = rng.bytes(64 + int(rng.integers(0, 64)))
            meta = (
                int(rng.integers(64, 4096)),
                int(rng.integers(64, 4096)),
                0,
                int(rng.integers(1, 300)),
            )
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
