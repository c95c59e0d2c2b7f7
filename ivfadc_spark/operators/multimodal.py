"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's native row shape is "aux columns + quantized payload"
(`.feat`: m float aux + d uint8 payload per row, /root/reference/IO.h:92-121
documented at /root/reference/config.h:11-15) — the same pattern as a media
table: typed metadata columns + an opaque ``binary`` payload.

Decode is REAL for self-describing formats the stdlib can parse — PNG and
24-bit BMP images, 16-bit PCM WAV audio — via
:mod:`ivfadc_spark.functions.media_codecs` (zlib/wave + numpy, no external
codec libraries). Formats that genuinely require codec libraries absent
from this container (JPEG, MP3, video containers) fall back to a
deterministic fingerprint feature and ``resize_images`` raises for them;
plug a real decoder into ``_decode_payload`` when the libs exist.

All operators are Arrow-batched ``mapInPandas`` — one pandas batch in/out,
numpy per batch, no per-row Spark round trips (north input_hint: no per-row
Python at the Spark boundary; the per-payload decode inside a batch is the
unavoidable per-object work every media pipeline pays).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ivfadc_spark.functions.media_codecs import (
    bmp_decode,
    png_decode,
    png_encode,
    resize_nearest,
    sniff_kind,
    wav_decode,
    wav_encode,
)

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_s double"
)

FEATURE_DIM = 32


def synth_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic media table with REAL payloads: PNG images (random
    RGB), 16-bit PCM WAVs (two-tone sine mix), and opaque `video` blobs
    (no stdlib-decodable video container exists — stays a fingerprint
    payload, honestly)."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        k = kinds[i]
        if k == "image":
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, k, png_encode(img), w, h, 0, 0.0))
        elif k == "audio":
            rate, dur = 8000, float(rng.uniform(0.05, 0.4))
            t = np.arange(int(rate * dur)) / rate
            f1, f2 = rng.uniform(100, 1500, size=2)
            sig = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
            rows.append(
                (i, k, wav_encode((sig * 20000).astype(np.int16), rate), 0, 0, rate, dur)
            )
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8)
            rows.append(
                (
                    i,
                    k,
                    payload.tobytes(),
                    int(rng.integers(16, 1024)),
                    int(rng.integers(16, 1024)),
                    16000,
                    float(rng.uniform(0.5, 30.0)),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "payload", "width", "height", "sample_rate", "duration_s"],
    )


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_media_pdf(n, seed), schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """One payload -> FEATURE_DIM float32 feature vector.

    - PNG/BMP: decoded pixels -> 32-bin normalized intensity histogram
      (resolution-independent).
    - WAV: decoded samples -> 32-bin mean-|amplitude| envelope (in [0, 1]).
    - anything else (video blobs, codec-library formats): deterministic
      md5-expansion fingerprint — the documented fallback, NOT a decode.
    """
    fmt = sniff_kind(payload)
    if fmt in ("png", "bmp"):
        img = png_decode(payload) if fmt == "png" else bmp_decode(payload)
        hist = np.bincount(
            (img.reshape(-1).astype(np.int64) * FEATURE_DIM) >> 8, minlength=FEATURE_DIM
        )
        return (hist / max(img.size, 1)).astype(np.float32)
    if fmt == "wav":
        samples, _rate = wav_decode(payload)
        mono = np.abs(samples.astype(np.float64)).mean(axis=1) / 32768.0
        # FEATURE_DIM equal time bins; ragged tail handled by bincount weights
        bins = (np.arange(mono.size) * FEATURE_DIM) // max(mono.size, 1)
        sums = np.bincount(bins, weights=mono, minlength=FEATURE_DIM)
        cnts = np.maximum(np.bincount(bins, minlength=FEATURE_DIM), 1)
        return (sums / cnts).astype(np.float32)
    h = hashlib.md5(payload).digest()
    reps = (FEATURE_DIM + len(h) - 1) // len(h)
    return np.frombuffer((h * reps)[:FEATURE_DIM], dtype=np.uint8).astype(np.float32) / 255.0


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, kind, feature array<float>) via mapInPandas.

    Arrow-batched: one pandas batch in, one out; per-batch numpy stacking,
    no per-row Spark round trips. Output feeds the similarity operators
    (knn_* work on any array<float> column)."""

    def gen(batches):
        for pdf in batches:
            feats = [
                _decode_payload(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(gen, "media_id long, kind string, feature array<float>")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize: decode (PNG/BMP) -> nearest-neighbor resample ->
    re-encode PNG, metadata updated. Raises for payloads that are not a
    stdlib-decodable image format (JPEG etc. need codec libraries)."""

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            payloads = []
            for p in pdf["payload"]:
                data = bytes(p)
                fmt = sniff_kind(data)
                if fmt == "png":
                    img = png_decode(data)
                elif fmt == "bmp":
                    img = bmp_decode(data)
                else:
                    raise NotImplementedError(
                        "resize: payload is not a PNG/BMP; other image codecs "
                        "are not available in this container"
                    )
                payloads.append(png_encode(resize_nearest(img, width, height)))
            out["payload"] = payloads
            out["width"] = np.int32(width)
            out["height"] = np.int32(height)
            yield out

    imgs = media.filter(media.kind == "image")
    return imgs.mapInPandas(gen, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_idx, ts_s) per sampled
    frame from metadata alone — no decode needed, fully functional."""
    from pyspark.sql import functions as F

    vids = media.filter(media.kind == "video")
    n_frames = F.greatest(F.floor(F.col("duration_s") / every_s).cast("int"), F.lit(1))
    return vids.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_s).alias("ts_s"),
    )
