"""Fuse filters (the ORIGINAL segmented-window design), from scratch
in numpy.

Implements the fuse filter of Dietzfelbinger & Walzer, *Dense Peelable
Random Uniform Hypergraphs*, ESA 2019 [DW19], as shipped (and later
deprecated in favor of binary fuse) by the reference
(`[U src/fusefilter.zig]`, SURVEY.md §2.1 #8) and by the companion C
library's `fuse8.h`: capacity ``n / 0.879`` rounded to a multiple of
``SEGMENT_COUNT + ARITY - 1 = 102`` slot groups, each key hashed to one
*window* of 3 consecutive segments (segment picked by one reduction of
the mixed hash, in-segment offsets by reductions of three rotations),
peeled construction, and the familiar ``f == fp[h0]^fp[h1]^fp[h2]``
membership test. Fingerprint widths 8/16/32 like the reference's
generic ``Fuse(T)``.

Upstream deprecated this filter because construction FAILS outright
for small key sets (the 102-segment geometry needs roughly n ≳ 1e5 for
the peel to succeed; the reference simply errors — the documented
reason binary fuse replaced it). A total operator is more useful in an
engine, so this implementation keeps the published geometry for the
first seed attempts and then *deterministically grows the segment
length* every ``GROW_EVERY`` failed seeds. At scale (n ≥ ~1e5) the
first attempt succeeds w.h.p. and the layout is byte-for-byte the
published one (≈9.1 bits/entry at w=8 = 8 bits × 1/0.879 overhead);
only small builds pay extra slack. FPP stays ≈2^-w regardless of
capacity (it depends only on the fingerprint width).

Shares the vectorized batch-peel engine (:mod:`.peel`) and the
bit-exact hash kernels (:mod:`.hashing`) with the xor / binary-fuse
implementations.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from . import serde
from .hashing import U64, SplitMix64, fingerprint64, mix_split, reduce32, rotl64
from .peel import MAX_ITERATIONS, PeelFailure, peel_and_assign

_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}

SEGMENT_COUNT = 100
ARITY = 3
SLOTS = SEGMENT_COUNT + ARITY - 1  # windows of 3 segments over 102 total

# grow the (otherwise published) geometry after this many failed seeds —
# the deterministic escape hatch for the small-n construction failures
# that got the original fuse design deprecated upstream
GROW_EVERY = 10


def _segment_length(n: int) -> int:
    """Published geometry: capacity = n/0.879 rounded DOWN to a multiple
    of SLOTS (the C library's ``capacity / FUSE_SLOTS * FUSE_SLOTS``),
    floored so tiny builds still get a real array."""
    capacity = int(math.ceil(n / 0.879))
    return max(1, capacity // SLOTS)


class FuseFilter:
    """Immutable fuse filter over a set of uint64 keys ([DW19])."""

    kind = serde.KIND_FUSE

    def __init__(self, width: int, segment_length: int, seed: int,
                 fingerprints: np.ndarray, n_keys: int,
                 attempts: int = 1, peel_rounds: int = 0) -> None:
        self.width = width
        self.segment_length = segment_length
        self.seed = seed
        self.fingerprints = fingerprints
        self.n_keys = n_keys
        self.attempts = attempts
        self.peel_rounds = peel_rounds

    # ---- addressing ([DW19 §2]: window of ARITY consecutive segments) ----
    def _positions(self, hashes: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Segment from the hash's low bits, in-segment offsets from the
        21/42 rotations plus a multiply-shift for the third (the C
        library's r3). The third offset MUST NOT be a ±1-bit rotation:
        its low 32 bits would nearly coincide with the segment
        selector's, clustering h2 within each window and collapsing the
        peel (measured: rotl 63 needed 20-40 seed attempts at n=1e6
        where the multiply-shift peels on the first)."""
        sl = self.segment_length
        with np.errstate(over="ignore"):
            seg = reduce32(hashes, SEGMENT_COUNT) * U64(sl)
            r3 = (hashes * U64(0xBF58476D1CE4E5B9)) >> U64(32)
            h0 = seg + reduce32(rotl64(hashes, 21), sl)
            h1 = seg + U64(sl) + reduce32(rotl64(hashes, 42), sl)
            h2 = seg + U64(2 * sl) + reduce32(r3, sl)
        return h0, h1, h2

    @classmethod
    def populate(cls, keys: np.ndarray, width: int = 8,
                 rng_state: int = 0x726B2B9D438B9D4D,
                 assume_unique: bool = False) -> "FuseFilter":
        if width not in _DTYPES:
            raise ValueError("width must be 8, 16 or 32")
        keys = np.asarray(keys, dtype=U64)
        if not assume_unique:
            keys = np.unique(keys)
        n = int(keys.size)
        sl = _segment_length(n)
        dtype = _DTYPES[width]
        rng = SplitMix64(rng_state)
        if n == 0:
            return cls(width, sl, rng.next(),
                       np.zeros(SLOTS * sl, dtype=dtype), 0)

        filt = cls(width, sl, 0, np.zeros(SLOTS * sl, dtype=dtype), n)
        for attempt in range(1, MAX_ITERATIONS + 1):
            filt.seed = rng.next()
            hashes = mix_split(keys, filt.seed)
            filt.fingerprints[:] = 0
            ok, rounds, _ = peel_and_assign(
                hashes, filt._positions, len(filt.fingerprints),
                filt.fingerprints)
            if ok:
                filt.attempts = attempt
                filt.peel_rounds = rounds
                return filt
            if attempt % GROW_EVERY == 0:
                # deterministic capacity growth (documented deviation:
                # upstream fails outright here). int32 slot guard as in
                # the xor/binary-fuse builders.
                sl = max(sl + 1, int(sl * 1.25))
                if SLOTS * sl > 2**31 - 1:
                    raise PeelFailure(
                        f"fuse{width} capacity {SLOTS * sl} exceeds int32 "
                        "slots; split the build across more partitions")
                filt.segment_length = sl
                filt.fingerprints = np.zeros(SLOTS * sl, dtype=dtype)
        raise PeelFailure(
            f"fuse{width} construction failed after {MAX_ITERATIONS} seeds")

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        if self.n_keys == 0:
            return np.zeros(keys.shape, dtype=bool)
        hashes = mix_split(keys, self.seed)
        f = fingerprint64(hashes).astype(self.fingerprints.dtype)
        h0, h1, h2 = self._positions(hashes)
        fp = self.fingerprints
        f = f ^ fp[h0.astype(np.int64)] ^ fp[h1.astype(np.int64)] \
              ^ fp[h2.astype(np.int64)]
        return f == 0

    def size_in_bytes(self) -> int:
        return self.fingerprints.nbytes

    def bits_per_entry(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        params = {"w": self.width, "seed": self.seed, "n": self.n_keys,
                  "sl": self.segment_length,
                  "attempts": self.attempts, "peel_rounds": self.peel_rounds}
        return serde.pack(self.kind, params, self.fingerprints.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FuseFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        fps = np.frombuffer(payload, dtype=_DTYPES[p["w"]]).copy()
        return cls(p["w"], p["sl"], p["seed"], fps, p["n"],
                   p.get("attempts", 1), p.get("peel_rounds", 0))
