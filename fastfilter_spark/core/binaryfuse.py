"""Binary fuse filters (8/16/32-bit fingerprints), from scratch in numpy.

Implements the construction and query of Graf & Lemire, *Binary Fuse
Filters: Fast and Smaller Than Xor Filters*, ACM JEA 27, 2022 [BFF22]
(the algorithm behind the reference's `src/binaryfusefilter.zig`,
SURVEY.md §2.1 #1–#4). Geometry formulas follow [BFF22 §4.1]; the
segment addressing follows [BFF22 §3]; peeling is the vectorized
batch variant in :mod:`.peel` (semantically equivalent to the
reference's sequential singleton queue).

Properties (asserted by tests, gated by BASELINE.md):
  * zero false negatives, all n;
  * FPP ≈ 2^-w (≈0.39% for w=8);
  * bits/entry ≈ 9.0 for w=8 at n ≥ 1e6 (sizeFactor ≥ 1.125 · 8 bits).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import numpy as np

from . import serde
from .hashing import U64, SplitMix64, fingerprint64, mix_split, mulhi64
from .peel import MAX_ITERATIONS, PeelFailure, peel_and_assign

_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}


def _segment_length(arity: int, size: int) -> int:
    """[BFF22 §4.1]: arity-3 segment length, capped at 2^18."""
    if size == 0:
        return 4
    if arity == 3:
        sl = 1 << int(math.floor(math.log(size) / math.log(3.33) + 2.25))
    elif arity == 4:
        sl = 1 << int(math.floor(math.log(size) / math.log(2.91) - 0.5))
    else:
        raise ValueError("arity must be 3 or 4")
    return max(4, min(sl, 1 << 18))


def _size_factor(arity: int, size: int) -> float:
    """[BFF22 §4.1]: space overhead factor (≥1.125 for arity 3)."""
    if size <= 1:
        return 0.0
    if arity == 3:
        return max(1.125, 0.875 + 0.25 * math.log(1e6) / math.log(size))
    if arity == 4:
        return max(1.075, 0.77 + 0.305 * math.log(6e5) / math.log(size))
    raise ValueError("arity must be 3 or 4")


@dataclass(frozen=True)
class FuseGeometry:
    size: int
    segment_length: int
    segment_length_mask: int
    segment_count: int
    segment_count_length: int
    array_length: int

    @staticmethod
    def for_size(size: int, arity: int = 3) -> "FuseGeometry":
        seg_len = _segment_length(arity, size)
        size_factor = _size_factor(arity, size)
        capacity = int(round(size * size_factor)) if size > 1 else 0
        init_segments = max(
            1, (capacity + seg_len - 1) // seg_len - (arity - 1)
        )
        array_length = (init_segments + arity - 1) * seg_len
        segment_count = (array_length + seg_len - 1) // seg_len
        segment_count = 1 if segment_count <= arity - 1 else segment_count - (arity - 1)
        array_length = (segment_count + arity - 1) * seg_len
        return FuseGeometry(
            size=size,
            segment_length=seg_len,
            segment_length_mask=seg_len - 1,
            segment_count=segment_count,
            segment_count_length=segment_count * seg_len,
            array_length=array_length,
        )


class BinaryFuseFilter:
    """An immutable binary fuse filter over a set of uint64 keys."""

    kind = serde.KIND_BINARY_FUSE

    def __init__(self, width: int, geometry: FuseGeometry, seed: int,
                 fingerprints: np.ndarray, n_keys: int,
                 attempts: int = 1, peel_rounds: int = 0) -> None:
        self.width = width
        self.geometry = geometry
        self.seed = seed
        self.fingerprints = fingerprints
        self.n_keys = n_keys
        self.attempts = attempts          # seed rotations used (metric)
        self.peel_rounds = peel_rounds    # batch peel rounds (metric)

    # ---- hashing / addressing ([BFF22 §3]) --------------------------------
    def _positions(self, hashes: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        g = self.geometry
        with np.errstate(over="ignore"):
            h0 = mulhi64(hashes, g.segment_count_length)
            h1 = h0 + U64(g.segment_length)
            h2 = h1 + U64(g.segment_length)
            mask = U64(g.segment_length_mask)
            h1 = h1 ^ ((hashes >> U64(18)) & mask)
            h2 = h2 ^ (hashes & mask)
        return h0, h1, h2

    # ---- construction ------------------------------------------------------
    @classmethod
    def populate(cls, keys: np.ndarray, width: int = 8, arity: int = 3,
                 rng_state: int = 0x726B2B9D438B9D4D,
                 assume_unique: bool = False) -> "BinaryFuseFilter":
        """Build from uint64 keys (duplicates tolerated: deduped upfront;
        pass assume_unique=True to skip the sort when the caller already
        deduped, e.g. the Spark partition builder).

        Deterministic for a given (key set, width, rng_state).
        """
        if width not in _DTYPES:
            raise ValueError("width must be 8, 16 or 32")
        keys = np.asarray(keys, dtype=U64)
        if not assume_unique:
            keys = np.unique(keys)
        n = int(keys.size)
        geom = FuseGeometry.for_size(n, arity)
        if geom.array_length > 2**31 - 1:       # n ≳ 1.9e9 single-partition
            # the peel kernel's slot positions are int32 (element width
            # sets DRAM-bound multi-core throughput); past 2^31 slots
            # they would wrap and the build would die deep in bincount.
            # A single partition this big is a sharding mistake anyway —
            # the distributed builders split keys across pids precisely
            # so per-partition n stays cache-friendly.
            raise ValueError(
                f"{n} keys need {geom.array_length} slots > int32 range; "
                "split the build across more partitions "
                "(e.g. build_partitioned_filter/build_filter_sidecar "
                "with a larger num_partitions)")
        dtype = _DTYPES[width]
        rng = SplitMix64(rng_state)

        if n == 0:
            return cls(width, geom, rng.next(),
                       np.zeros(geom.array_length, dtype=dtype), 0)

        filt = cls(width, geom, 0, np.zeros(geom.array_length, dtype=dtype), n)
        for attempt in range(1, MAX_ITERATIONS + 1):
            filt.seed = rng.next()
            hashes = mix_split(keys, filt.seed)
            # distinct keys colliding post-mix (prob ~n²/2^64) simply
            # fail the peel → next seed. No pre-check sort needed.
            filt.fingerprints[:] = 0
            ok, rounds, _ = peel_and_assign(
                hashes, filt._positions, geom.array_length, filt.fingerprints
            )
            if ok:
                filt.attempts = attempt
                filt.peel_rounds = rounds
                return filt
        raise PeelFailure(f"binary fuse construction failed after {MAX_ITERATIONS} seeds")

    # ---- query ([BFF22 §3]) -------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        if self.n_keys == 0:
            return np.zeros(keys.shape, dtype=bool)
        hashes = mix_split(keys, self.seed)
        f = fingerprint64(hashes).astype(self.fingerprints.dtype)
        h0, h1, h2 = self._positions(hashes)
        fp = self.fingerprints
        f = f ^ fp[h0.astype(np.int64)] ^ fp[h1.astype(np.int64)] ^ fp[h2.astype(np.int64)]
        return f == 0

    # ---- metrics / serde ----------------------------------------------------
    def size_in_bytes(self) -> int:
        return self.fingerprints.nbytes

    def bits_per_entry(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        g = self.geometry
        params = {
            "w": self.width, "seed": self.seed, "n": self.n_keys,
            "size": g.size, "seg_len": g.segment_length,
            "seg_cnt": g.segment_count, "arr_len": g.array_length,
            "attempts": self.attempts, "peel_rounds": self.peel_rounds,
        }
        return serde.pack(self.kind, params, self.fingerprints.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BinaryFuseFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        geom = FuseGeometry(
            size=p["size"], segment_length=p["seg_len"],
            segment_length_mask=p["seg_len"] - 1, segment_count=p["seg_cnt"],
            segment_count_length=p["seg_cnt"] * p["seg_len"],
            array_length=p["arr_len"],
        )
        fps = np.frombuffer(payload, dtype=_DTYPES[p["w"]]).copy()
        return cls(p["w"], geom, p["seed"], fps, p["n"],
                   p.get("attempts", 1), p.get("peel_rounds", 0))
