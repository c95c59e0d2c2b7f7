"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's native row shape is "aux columns + quantized payload"
(`.feat`: m float aux + d uint8 payload per row, /root/reference/IO.h:92-121
documented at /root/reference/config.h:11-15) — the same pattern as a media
table: typed metadata columns + an opaque ``binary`` payload.

The Spark-side plumbing here is real and tested (schema, Arrow batch shape,
mapInPandas partitioning, feature vectors sized for the similarity
operators); the actual image/audio decode is STUBBED — the decode libraries
(PIL/torchaudio/av) are not in this container. ``decode_media`` raises
NotImplementedError unless a deterministic fake is requested; plug a real
decoder into ``_decode_payload`` when the libs exist.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_s double"
)

FEATURE_DIM = 32

_HAVE_PIL = False
try:  # pragma: no cover - not in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    pass


def synth_media_pdf(n: int = 64, seed: int = 42) -> pd.DataFrame:
    """Deterministic fake media table (binary payloads, typed metadata)."""
    rng = np.random.default_rng(seed)
    kinds = np.asarray(["image", "audio", "video"])[rng.integers(0, 3, n)]
    rows = []
    for i in range(n):
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kinds[i],
                payload,
                int(rng.integers(16, 1024)) if kinds[i] != "audio" else 0,
                int(rng.integers(16, 1024)) if kinds[i] != "audio" else 0,
                16000 if kinds[i] != "image" else 0,
                float(rng.uniform(0.5, 30.0)) if kinds[i] != "image" else 0.0,
            )
        )
    return pd.DataFrame(
        rows,
        columns=["media_id", "kind", "payload", "width", "height", "sample_rate", "duration_s"],
    )


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(synth_media_pdf(n, seed), schema=MEDIA_SCHEMA)


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Decode one payload to pixels/samples. REAL DECODE IS STUBBED —
    deterministic md5-expansion stands in so downstream plumbing is testable."""
    if _HAVE_PIL and kind == "image":  # pragma: no cover
        raise NotImplementedError("wire PIL decode here when the lib exists")
    # deterministic fake: expand md5(payload) into FEATURE_DIM bytes
    h = hashlib.md5(payload).digest()
    reps = (FEATURE_DIM + len(h) - 1) // len(h)
    return np.frombuffer((h * reps)[:FEATURE_DIM], dtype=np.uint8).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """media -> (media_id, kind, feature array<float>) via mapInPandas.

    Arrow-batched: one pandas batch in, one out; per-batch numpy stacking,
    no per-row Spark round trips. Output feeds the similarity operators
    (knn_* work on any array<float> column)."""

    def gen(batches):
        for pdf in batches:
            feats = [
                (_decode_payload(bytes(p), k) / 255.0).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(gen, "media_id long, kind string, feature array<float>")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator. Plumbing real (filter + mapInPandas shape);
    pixel work stubbed — raises on execution unless a decoder exists."""

    def gen(batches):
        for pdf in batches:
            raise NotImplementedError(
                "image decode/resize requires PIL; not available in this container"
            )
            yield pdf  # pragma: no cover

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
