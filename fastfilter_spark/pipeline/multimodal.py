"""Multimodal column plumbing: image/audio/video as opaque binary.

Images and audio are decoded for REAL — zero-dependency pure-numpy
codecs for the two formats that need no external library:

* ``decode_bmp`` / ``encode_bmp`` — uncompressed 24-bpp Windows BMP
  (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte row
  padding, BGR byte order).
* ``decode_wav`` / ``encode_wav`` — RIFF/WAVE with 16-bit little-endian
  PCM (the canonical `fmt `/`data` chunk layout).

``make_fake_media`` emits real, deterministic BMP/WAV payloads (pixel /
sample bytes derived from sha256 of the id), so ``extract_features``
exercises genuine header parsing, row de-padding and sample decoding
end-to-end. Only **video** remains a stub (``_decode_video_stub``):
every mainstream video codec requires a real decoder library that does
not exist in this container — swap it for ffmpeg/torchvision in
production.

Pattern: ``mapInPandas`` so one Arrow batch of binary payloads is
processed per call (bounded memory regardless of blob size skew);
per-row try/except so one corrupt blob marks THAT row failed instead of
killing the task.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("media_id long, kind string, feat array<float>, "
                  "decode_ok boolean, err string")


# ---------------------------------------------------------------------------
# BMP (24-bpp uncompressed) — pure numpy
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bpp uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp needs (H, W, 3) uint8")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR on disk, rows bottom-up, each row padded to a 4-byte boundary
    bgr = pixels[::-1, :, ::-1]
    rows = bgr.reshape(h, row_bytes)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 54)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bpp uncompressed BMP bytes → (H, W, 3) uint8 RGB (top-down)."""
    if payload is None or len(payload) < 54:
        raise ValueError("truncated BMP header")
    magic, _fsize, _r1, _r2, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"bad BMP magic {magic!r}")
    hsize, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if hsize < 40 or planes != 1:
        raise ValueError("unsupported BMP info header")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0                      # positive height ⇒ bottom-up rows
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP pixel data ({len(payload)} < {need})")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    if flip:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])   # BGR → RGB


# ---------------------------------------------------------------------------
# WAV (16-bit PCM) — pure numpy
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """1-D int16 mono samples → RIFF/WAVE (PCM 16-bit LE) bytes."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav needs 1-D int16 samples")
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> Tuple[int, np.ndarray]:
    """RIFF/WAVE bytes → (sample_rate, 1-D int16 samples). Walks the
    chunk list (a real WAV may carry LIST/fact chunks before data)."""
    if payload is None or len(payload) < 12:
        raise ValueError("truncated WAV header")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("bad RIFF/WAVE magic")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8: pos + 8 + clen]
        if len(body) < clen:
            # a declared chunk length past the buffer is corruption —
            # decoding the short slice would silently yield wrong
            # features with decode_ok=True (decode_bmp enforces the
            # equivalent truncated-pixel-data check)
            raise ValueError(
                f"truncated WAV chunk {cid!r}: declares {clen} bytes, "
                f"{len(body)} present")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("short fmt chunk")
            audio_fmt, channels, rate, _br, _ba, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format {audio_fmt} "
                                 "(only PCM)")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen % 2)      # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    samples = np.frombuffer(data, dtype="<i2")
    if channels and channels > 1:
        samples = samples[: len(samples) - len(samples) % channels]
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return int(rate), samples


# ---------------------------------------------------------------------------
# deterministic fixtures (real payloads, seeded by id)
# ---------------------------------------------------------------------------

def make_fake_media(df: DataFrame, id_col: str, kind: str = "image",
                    width: int = 64, height: int = 64,
                    n_samples: int = 3072) -> DataFrame:
    """Deterministic media blobs (seeded by id): REAL encoded payloads
    for image (24-bpp BMP) and audio (16-bit PCM WAV); video keeps an
    opaque 512-byte payload (no video codec exists in this sandbox —
    frame sampling is structural plumbing over n_frames).

    Seed = sha256 of the DECIMAL-STRING id (not packed bytes): any
    engine with sha256(VARCHAR) — e.g. the DuckDB oracle — can recompute
    the pixel/sample statistics end-to-end.
    """
    @F.pandas_udf("binary")
    def _blob(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            digest = hashlib.sha256(str(int(i)).encode()).digest()
            if kind == "image":
                n = width * height * 3
                px = np.frombuffer(digest * (n // 32 + 1), dtype=np.uint8)
                out.append(encode_bmp(
                    px[:n].reshape(height, width, 3).copy()))
            elif kind == "audio":
                raw = digest * (n_samples * 2 // 32 + 1)
                samples = np.frombuffer(raw, dtype="<i2")[:n_samples].copy()
                out.append(encode_wav(samples))
            else:                         # video: opaque deterministic blob
                out.append(digest * 16)
        return pd.Series(out)

    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        _blob(F.col(id_col)).alias("payload"),
        (F.lit(width) if kind == "image" else F.lit(0)).alias("width"),
        (F.lit(height) if kind == "image" else F.lit(0)).alias("height"),
        # deterministic per-id frame count (1..7) so video sampling
        # plumbing has real variation to chew on
        (F.col(id_col).cast("long") % 7 + 1).cast("int").alias("n_frames")
        if kind == "video" else F.lit(1).alias("n_frames"))


def _decode_video_stub(payload: bytes) -> np.ndarray:
    """STUB: video needs a codec library (ffmpeg etc.) that this
    container doesn't have. Deterministic fake frame from payload bytes
    keeps the plumbing testable; production swaps this single function."""
    if payload is None:
        raise ValueError("no payload")
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raise ValueError("empty payload")
    return np.tile(raw, int(np.ceil(4096 / raw.size)))[:4096].reshape(64, 64)


def _decode_any(kind: str, payload: bytes) -> np.ndarray:
    """kind-dispatched decode → 1-D numeric array for pooling."""
    if kind == "image":
        return decode_bmp(payload).ravel()
    if kind == "audio":
        return decode_wav(payload)[1]
    if kind == "video":
        return _decode_video_stub(payload).ravel()
    raise ValueError(f"unknown media kind {kind!r}")


def extract_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode → pooled feature vector, one Arrow batch at a time.

    Real decode for image (BMP) and audio (WAV); the pooled feature is
    the per-block mean of the decoded pixels/samples — stands in for a
    CNN embedding; partitioning, per-row error isolation and output
    schema are the production shape.
    """
    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, errs = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    arr = _decode_any(kind, payload)
                    if arr.size < feat_dim:
                        # fewer samples than feature dims would yield
                        # NaN block means with decode_ok=True —
                        # poisoning downstream distance math
                        raise ValueError(
                            f"{arr.size} samples < feat_dim {feat_dim}")
                    blocks = np.array_split(
                        arr.astype(np.float32).ravel(), feat_dim)
                    feats.append(np.array([b.mean() for b in blocks],
                                          dtype=np.float32))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — a corrupt blob
                    # must mark THIS row failed, not kill the task: the
                    # codecs raise ValueError on truncated/garbage media
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
    indices JVM-side (decoding each frame still needs the video stub)."""
    return (media
            .withColumn("frame_idx",
                        F.explode(F.sequence(F.lit(0),
                                             F.greatest(F.col("n_frames") - 1, F.lit(0)),
                                             F.lit(every_n))))
            .select("media_id", "kind", "frame_idx", "payload"))
