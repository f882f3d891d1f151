"""Multimodal column plumbing: image/audio/video as opaque binary.

All three modalities are decoded for REAL — zero-dependency pure-numpy
codecs for the formats that need no external library:

* ``decode_bmp`` / ``encode_bmp`` — uncompressed 24-bpp Windows BMP
  (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte row
  padding, BGR byte order).
* ``decode_wav`` / ``encode_wav`` — RIFF/WAVE with 16-bit little-endian
  PCM (the canonical `fmt `/`data` chunk layout).
* ``decode_avi`` / ``encode_avi`` — uncompressed RIFF/AVI ('DIB '
  video stream: avih/strh/strf headers, one '00db' chunk of bottom-up
  padded BGR rows per frame — the same DIB pixel layout as BMP).
  Compressed codecs (H.264 etc.) still need an external library; this
  decoder raises a clear error on a non-'DIB ' stream so production
  can swap in ffmpeg behind the same function.

``make_fake_media`` emits real, deterministic BMP/WAV/AVI payloads
(pixel / sample bytes derived from sha256 of the id), so
``extract_features`` and ``frame_sample`` exercise genuine header
parsing, chunk walking, row de-padding and frame extraction end-to-end.

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
# DIB pixel array (shared by BMP and uncompressed AVI) — pure numpy
# ---------------------------------------------------------------------------

def _pack_dib(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → DIB pixel array bytes: BGR byte order, rows
    bottom-up, each row padded to a 4-byte boundary."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    rows = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    if pad:
        rows = np.concatenate(
            [rows, np.zeros((h, pad), dtype=np.uint8)], axis=1)
    return rows.tobytes()


def _unpack_dib(data: bytes, w: int, h: int, offset: int = 0,
                bottom_up: bool = True, what: str = "DIB") -> np.ndarray:
    """DIB pixel array bytes → (H, W, 3) uint8 RGB (top-down). Raises on
    short pixel data — decoding a short slice would silently yield wrong
    pixels with decode_ok=True."""
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise ValueError(
            f"truncated {what} pixel data ({len(data)} < {need})")
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=stride * h, offset=offset).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return np.ascontiguousarray(bgr[:, :, ::-1])   # BGR → RGB


# ---------------------------------------------------------------------------
# BMP (24-bpp uncompressed) — pure numpy
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bpp uncompressed BMP bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp needs (H, W, 3) uint8")
    h, w, _ = pixels.shape
    data = _pack_dib(pixels)
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
    return _unpack_dib(payload, w, h, offset=offset, bottom_up=flip,
                       what="BMP")


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
# AVI (uncompressed 'DIB ' 24-bpp video) — pure numpy
# ---------------------------------------------------------------------------

def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd-length bodies get a pad byte
    return cid + struct.pack("<I", len(body)) + body + \
        (b"\x00" if len(body) % 2 else b"")


def _riff_list(subtype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", subtype + body)


def _riff_walk(buf: bytes, pos: int, end: int):
    """Yield (chunk_id, body) over a RIFF chunk sequence with the same
    truncation discipline as decode_wav: a declared length past the
    buffer is corruption, not a short read."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body_end = pos + 8 + clen
        if body_end > end:
            raise ValueError(
                f"truncated AVI chunk {cid!r}: declares {clen} bytes, "
                f"{end - pos - 8} present")
        yield cid, buf[pos + 8:body_end]
        pos = body_end + (clen % 2)


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 RGB frames → uncompressed RIFF/AVI bytes
    ('vids'/'DIB ' stream, one '00db' DIB chunk per frame)."""
    frames = np.asarray(frames)
    if frames.ndim != 4 or frames.shape[3] != 3 or \
            frames.dtype != np.uint8 or frames.shape[0] < 1:
        raise ValueError("encode_avi needs (N>=1, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    stride = w * 3 + ((-(w * 3)) % 4)
    frame_bytes = stride * h
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0,
                       0x10, n, 0, 1, frame_bytes, w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIiIhhhh", b"vids", b"DIB ", 0, 0, 0,
                       0, 1, fps, 0, n, frame_bytes, -1, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl", _riff_chunk(b"avih", avih)
                      + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                                   + _riff_chunk(b"strf", strf)))
    movi = _riff_list(b"movi", b"".join(
        _riff_chunk(b"00db", _pack_dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(payload: bytes) -> np.ndarray:
    """Uncompressed RIFF/AVI bytes → (N, H, W, 3) uint8 RGB frames.

    Walks the real chunk structure (hdrl for geometry, strf for the
    codec check, movi for frames — including frames nested in 'rec '
    grouping lists, which real muxers emit for interleaving). Raises on
    compressed streams, truncated chunks, and a frame count that
    disagrees with the avih header (a silently-dropped tail would
    otherwise pass as a shorter video)."""
    if payload is None or len(payload) < 12:
        raise ValueError("truncated AVI header")
    if payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("bad RIFF/AVI magic")
    (declared,) = struct.unpack_from("<I", payload, 4)
    end = 8 + declared
    if len(payload) < end:
        raise ValueError(
            f"truncated AVI file ({len(payload)} < {end} declared)")
    n_declared = w = h = None
    bpp, comp = 24, 0
    frames: list = []

    def _movi_frames(body: bytes, depth: int = 0) -> None:
        if depth > 32:      # crafted nesting must fail cleanly, not blow
            raise ValueError("AVI 'rec ' lists nested too deeply")
        for cid, sub in _riff_walk(body, 0, len(body)):
            if cid == b"LIST" and sub[:4] == b"rec ":
                _movi_frames(sub[4:], depth + 1)
            elif cid[2:4] == b"db":       # uncompressed DIB frame
                frames.append(sub)
            elif cid[2:4] == b"dc":
                raise ValueError("compressed AVI frame ('##dc') — only "
                                 "uncompressed 'DIB ' streams supported")

    for cid, body in _riff_walk(payload, 12, end):
        if cid != b"LIST":
            continue                      # idx1/JUNK etc. — not needed
        subtype = body[:4]
        if subtype == b"hdrl":
            for c2, b2 in _riff_walk(body, 4, len(body)):
                if c2 == b"avih":
                    if len(b2) < 56:
                        raise ValueError("short avih chunk")
                    vals = struct.unpack_from("<14I", b2, 0)
                    n_declared, w, h = vals[4], vals[8], vals[9]
                elif c2 == b"LIST" and b2[:4] == b"strl":
                    # adopt strf only from the VIDEO stream's strl — a
                    # real AVI interleaves an audio strl whose strf is
                    # a WAVEFORMAT, not a BITMAPINFOHEADER
                    is_vids = False
                    for c3, b3 in _riff_walk(b2, 4, len(b2)):
                        if c3 == b"strh":
                            is_vids = b3[:4] == b"vids"
                        elif c3 == b"strf" and is_vids:
                            if len(b3) < 40:
                                raise ValueError("short strf chunk")
                            _, _, _, _, bpp, comp = \
                                struct.unpack_from("<IiiHHI", b3, 0)
        elif subtype == b"movi":
            _movi_frames(body[4:])
    if n_declared is None or w is None:
        raise ValueError("missing avih header")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported AVI (bpp={bpp}, compression={comp})"
                         " — only uncompressed 24-bpp DIB")
    if w <= 0 or h <= 0 or n_declared < 1:
        raise ValueError("bad AVI geometry")
    if len(frames) != n_declared:
        raise ValueError(f"AVI frame count mismatch: header declares "
                         f"{n_declared}, movi holds {len(frames)}")
    return np.stack([_unpack_dib(f, w, h, what="AVI frame")
                     for f in frames])


# ---------------------------------------------------------------------------
# deterministic fixtures (real payloads, seeded by id)
# ---------------------------------------------------------------------------

VIDEO_W = VIDEO_H = 16          # fixture frame geometry: 16×16×3 = 768 B
                                # = 24 whole sha256 digests per frame, so
                                # per-frame pixel means stay oracle-exact


def make_fake_media(df: DataFrame, id_col: str, kind: str = "image",
                    width: int = 64, height: int = 64,
                    n_samples: int = 3072) -> DataFrame:
    """Deterministic media blobs (seeded by id): REAL encoded payloads
    for image (24-bpp BMP), audio (16-bit PCM WAV) and video
    (uncompressed DIB AVI, id%7+1 frames of 16×16).

    Seed = sha256 of the DECIMAL-STRING id (not packed bytes): any
    engine with sha256(VARCHAR) — e.g. the DuckDB oracle — can recompute
    the pixel/sample statistics end-to-end. Video frames tile the digest
    across all frames; 768 B/frame is a whole number of digest copies,
    so every frame's pixel mean equals mean(digest bytes) exactly.
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
            else:                         # video: real uncompressed AVI
                nf = int(i) % 7 + 1
                n = nf * VIDEO_H * VIDEO_W * 3
                px = np.frombuffer(digest * (n // 32 + 1), dtype=np.uint8)
                out.append(encode_avi(
                    px[:n].reshape(nf, VIDEO_H, VIDEO_W, 3).copy(), fps=4))
        return pd.Series(out)

    if kind == "video":
        width, height = VIDEO_W, VIDEO_H
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        _blob(F.col(id_col)).alias("payload"),
        (F.lit(width) if kind != "audio" else F.lit(0)).alias("width"),
        (F.lit(height) if kind != "audio" else F.lit(0)).alias("height"),
        # deterministic per-id frame count (1..7) so video sampling
        # plumbing has real variation to chew on. pmod, not %: Spark's
        # remainder follows the dividend's sign, so a negative id would
        # make this column disagree with the payload built via Python's
        # floored `int(i) % 7` (n_frames 0 or negative vs a real ≥1
        # frame count in the AVI header)
        (F.pmod(F.col(id_col).cast("long"), F.lit(7)) + 1)
        .cast("int").alias("n_frames")
        if kind == "video" else F.lit(1).alias("n_frames"))


def _decode_any(kind: str, payload: bytes) -> np.ndarray:
    """kind-dispatched decode → 1-D numeric array for pooling."""
    if kind == "image":
        return decode_bmp(payload).ravel()
    if kind == "audio":
        return decode_wav(payload)[1]
    if kind == "video":
        return decode_avi(payload).ravel()
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


SAMPLED_FRAME_SCHEMA = ("media_id long, kind string, frame_idx int, "
                        "payload_bytes int, frame_mean double, "
                        "decode_ok boolean")


def frame_sample(media: DataFrame, every_n: int = 2,
                 decode: bool = False) -> DataFrame:
    """Video frame sampling, two shapes:

    * ``decode=False`` (default): pure-JVM plumbing — explode the
      sampled frame-index sequence from the ``n_frames`` metadata
      column; no Python, no decode. Emits (media_id, kind, frame_idx)
      work items ONLY — the payload is deliberately NOT carried, or the
      explode would duplicate every video's bytes n_frames/every_n
      times through downstream shuffles; join it back by media_id at
      the point of actual decode.
    * ``decode=True``: REAL decode — one Arrow batch of AVI payloads at
      a time, each video decoded once (``decode_avi``), every
      ``every_n``-th frame emitted with its pixel mean. Sampling is
      driven by the DECODED frame count (decode_avi verifies it against
      the avih header), not the metadata column. Per-row error
      isolation: a corrupt payload yields one row with
      ``decode_ok=false`` / ``frame_idx=-1`` instead of killing the
      task."""
    # caller bugs fail LOUD at plan time: inside the decode try/except
    # a bad step would be misreported as per-row data corruption
    # (decode_ok=False on every video), and the decode=False JVM path
    # would likewise fail per-task — validate once here for both.
    # np.integer accepted (steps often come from numpy config math);
    # bool rejected (isinstance(True, int) is True but True is a flag
    # typo, not a step of 1).
    if (isinstance(every_n, bool)
            or not isinstance(every_n, (int, np.integer)) or every_n < 1):
        raise ValueError(f"every_n must be a positive int, got {every_n!r}")
    every_n = int(every_n)
    if not decode:
        return (media
                .withColumn("frame_idx",
                            F.explode(F.sequence(
                                F.lit(0),
                                F.greatest(F.col("n_frames") - 1, F.lit(0)),
                                F.lit(every_n))))
                .select("media_id", "kind", "frame_idx"))

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, kinds, idxs, nbytes, means, oks = [], [], [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                pb = 0 if payload is None else len(payload)
                # buffer this payload's rows and commit them only after
                # the whole video sampled cleanly — a mid-loop failure
                # must not leave one media_id with both decode_ok=True
                # frame rows AND a failure row
                rows = []
                try:
                    frames = decode_avi(payload)
                    for fi in range(0, frames.shape[0], every_n):
                        rows.append((fi, round(
                            float(frames[fi].mean(dtype=np.float64)), 6),
                            True))
                except Exception:  # noqa: BLE001 — isolate THIS row
                    rows = [(-1, None, False)]
                for fi, mean, ok in rows:
                    mids.append(mid)
                    kinds.append(kind)
                    idxs.append(fi)
                    nbytes.append(pb)
                    means.append(mean)
                    oks.append(ok)
            yield pd.DataFrame({
                "media_id": mids, "kind": kinds, "frame_idx": idxs,
                "payload_bytes": nbytes, "frame_mean": means,
                "decode_ok": oks})

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(_sample, SAMPLED_FRAME_SCHEMA))
