"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual codec work is stubbed behind
``_decode_image_stub`` because no image/audio libraries exist in this
container — swap the stub for PIL/torchvision/ffmpeg in production.
Pattern: ``mapInPandas`` so one Arrow batch of binary payloads is
processed per call (bounded memory regardless of blob size skew).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("media_id long, kind string, feat array<float>, "
                  "decode_ok boolean, err string")


def make_fake_media(df: DataFrame, id_col: str, kind: str = "image",
                    width: int = 64, height: int = 64) -> DataFrame:
    """Deterministic fake media blobs (seeded by id) for plumbing tests."""
    @F.pandas_udf("binary")
    def _blob(ids: pd.Series) -> pd.Series:
        # Seed = sha256 of the DECIMAL-STRING id (not packed bytes): any
        # engine with sha256(VARCHAR) — e.g. the DuckDB oracle — can
        # recompute the stub pipeline end-to-end.
        out = []
        for i in ids:
            h = hashlib.sha256(str(int(i)).encode()).digest()
            out.append(h * 16)  # 512-byte deterministic payload
        return pd.Series(out)

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        _blob(F.col(id_col)).alias("payload"),
        F.lit(width).alias("width"), F.lit(height).alias("height"),
        # deterministic per-id frame count (1..7) so video sampling
        # plumbing has real variation to chew on
        (F.col(id_col).cast("long") % 7 + 1).cast("int").alias("n_frames")
        if kind == "video" else F.lit(1).alias("n_frames"))


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode: deterministic fake pixels from payload bytes.

    Production: replace with a real decoder (PIL.Image.open etc.);
    raises NotImplementedError for kinds we don't fake.
    """
    if payload is None:
        raise NotImplementedError("no payload")
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raise ValueError("empty payload")
    reps = int(np.ceil(width * height / raw.size))
    return np.tile(raw, reps)[: width * height].reshape(height, width)


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode → pooled feature vector, one Arrow batch at a time.

    The feature here is a deterministic per-block mean of the (stubbed)
    decoded pixels — stands in for a CNN embedding; the partitioning,
    error handling and output schema are the production shape.
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                try:
                    img = _decode_image_stub(payload, int(w), int(h))
                    if img.size < feat_dim:
                        # fewer pixels than feature dims would yield
                        # NaN block means with decode_ok=True —
                        # poisoning downstream distance math
                        raise ValueError(
                            f"{img.size} pixels < feat_dim {feat_dim}")
                    blocks = np.array_split(img.astype(np.float32).ravel(), feat_dim)
                    feats.append(np.array([b.mean() for b in blocks], dtype=np.float32))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — a corrupt blob
                    # must mark THIS row failed, not kill the task: real
                    # decoders raise OSError/ValueError on bad media
                    feats.append(np.zeros(feat_dim, dtype=np.float32))
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({
                "media_id": pdf["media_id"], "kind": pdf["kind"],
                "feat": [f.tolist() for f in feats],
                "decode_ok": oks, "err": errs,
            })

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling plumbing: expands n_frames into sampled frame
    indices JVM-side (the decode of each frame is the same stub)."""
    return (media
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0),
                                             F.greatest(F.col("n_frames") - 1, F.lit(0)),
                                             F.lit(every_n))))
            .select("media_id", "kind", "frame_idx", "payload"))
