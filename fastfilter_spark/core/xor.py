"""Xor and xor+ filters, from scratch in numpy.

Implements Graf & Lemire, *Xor Filters: Faster and Smaller Than Bloom
and Cuckoo Filters*, ACM JEA 25, 2020 [XOR20] (the algorithm behind the
reference's `src/xorfilter.zig`, SURVEY.md §2.1 #5–#7): capacity
1.23·n + 32 split into three equal blocks, three block-local hashes via
rotation + multiply-shift reduction, peeled construction (shared batch
peel engine in :mod:`.peel`), fingerprint test f == fp[h0]^fp[h1]^fp[h2].

Xor+ ([XOR20 §5]) compresses away never-assigned slots: peeling leaves
array_length − n slots unassigned (fingerprint 0); a rank-select bitmap
over occupancy plus a dense array of only the occupied fingerprints
drops bits/entry from ≈9.84 toward ≈9.0 at the cost of one popcount-rank
per probe.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from . import serde
from .hashing import (
    U64,
    SplitMix64,
    fingerprint64,
    mix_split,
    popcount64,
    reduce32,
    rotl64,
)
from .peel import MAX_ITERATIONS, PeelFailure, peel_and_assign

_DTYPES = {8: np.uint8, 16: np.uint16, 32: np.uint32}


def _xor_capacity(n: int) -> Tuple[int, int]:
    capacity = 32 + int(math.ceil(1.23 * n))
    capacity = capacity - (capacity % 3)
    return capacity, capacity // 3


class XorFilter:
    """Immutable xor filter over a set of uint64 keys ([XOR20])."""

    kind = serde.KIND_XOR

    def __init__(self, width: int, block_length: int, seed: int,
                 fingerprints: np.ndarray, n_keys: int,
                 attempts: int = 1, peel_rounds: int = 0) -> None:
        self.width = width
        self.block_length = block_length
        self.seed = seed
        self.fingerprints = fingerprints
        self.n_keys = n_keys
        self.attempts = attempts
        self.peel_rounds = peel_rounds

    # ---- addressing ([XOR20 §3.2]) -----------------------------------------
    def _positions(self, hashes: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        bl = self.block_length
        with np.errstate(over="ignore"):
            h0 = reduce32(hashes, bl)
            h1 = U64(bl) + reduce32(rotl64(hashes, 21), bl)
            h2 = U64(2 * bl) + reduce32(rotl64(hashes, 42), bl)
        return h0, h1, h2

    @classmethod
    def populate(cls, keys: np.ndarray, width: int = 8,
                 rng_state: int = 0x726B2B9D438B9D4D,
                 assume_unique: bool = False) -> "XorFilter":
        if width not in _DTYPES:
            raise ValueError("width must be 8, 16 or 32")
        keys = np.asarray(keys, dtype=U64)
        if not assume_unique:
            keys = np.unique(keys)
        n = int(keys.size)
        capacity, bl = _xor_capacity(n)
        if capacity > 2**31 - 1:                # n ≳ 1.7e9 single-partition
            # the shared peel kernel uses int32 slot positions — see the
            # matching guard in BinaryFuseFilter.populate
            raise ValueError(
                f"{n} keys need {capacity} slots > int32 range; split the "
                "build across more partitions (larger num_partitions)")
        dtype = _DTYPES[width]
        rng = SplitMix64(rng_state)
        if n == 0:
            empty = cls(width, bl, rng.next(), np.zeros(capacity, dtype=dtype), 0)
            empty._occupied = np.zeros(capacity, dtype=bool)
            return empty

        filt = cls(width, bl, 0, np.zeros(capacity, dtype=dtype), n)
        for attempt in range(1, MAX_ITERATIONS + 1):
            filt.seed = rng.next()
            hashes = mix_split(keys, filt.seed)
            filt.fingerprints[:] = 0
            ok, rounds, occupied = peel_and_assign(
                hashes, filt._positions, capacity, filt.fingerprints
            )
            if ok:
                filt.attempts = attempt
                filt.peel_rounds = rounds
                filt._occupied = occupied  # reused by XorPlusFilter.compress
                return filt
        raise PeelFailure(f"xor construction failed after {MAX_ITERATIONS} seeds")

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

    def size_in_bytes(self) -> int:
        return self.fingerprints.nbytes

    def bits_per_entry(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        params = {"w": self.width, "seed": self.seed, "n": self.n_keys,
                  "bl": self.block_length,
                  "attempts": self.attempts, "peel_rounds": self.peel_rounds}
        return serde.pack(self.kind, params, self.fingerprints.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "XorFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        fps = np.frombuffer(payload, dtype=_DTYPES[p["w"]]).copy()
        return cls(p["w"], p["bl"], p["seed"], fps, p["n"],
                   p.get("attempts", 1), p.get("peel_rounds", 0))


class XorPlusFilter:
    """Rank-compressed xor filter ([XOR20 §5], SURVEY.md §2.1 #7).

    Stores: occupancy bitmap (1 bit/slot), per-256-slot superblock rank
    prefix (u32 → 0.125 bits/slot), dense fingerprints of occupied slots
    only (exactly n of them). Probe: slot unoccupied → fingerprint 0;
    else dense[rank]. Net ≈ w + 1.23 + 0.15 bits/entry (≈9.4 at w=8 vs
    9.84 uncompressed; the win grows with w).
    """

    SUPER = 4  # 64-bit words per rank superblock (256 slots)

    kind = serde.KIND_XOR_PLUS

    def __init__(self, width: int, block_length: int, seed: int, n_keys: int,
                 bitmap: np.ndarray, rank_prefix: np.ndarray,
                 dense: np.ndarray) -> None:
        self.width = width
        self.block_length = block_length
        self.seed = seed
        self.n_keys = n_keys
        self.bitmap = bitmap            # uint64 words
        self.rank_prefix = rank_prefix  # uint32 per word: occupied before word
        self.dense = dense              # fingerprints of occupied slots

    @classmethod
    def compress(cls, xf: XorFilter) -> "XorPlusFilter":
        occupied = getattr(xf, "_occupied", None)
        if occupied is None:
            # Reconstructed filter: unassigned slots hold fingerprint 0.
            # Slot with fp==0 that WAS assigned (fingerprint collided to
            # 0) must stay dense, but we cannot distinguish — keep all
            # nonzero plus none; assigned-with-zero slots are preserved
            # correctly because dense stores 0 for them only if marked.
            raise ValueError("compress() needs a freshly populated XorFilter")
        capacity = len(xf.fingerprints)
        n_words = (capacity + 63) // 64
        bitmap = np.zeros(n_words, dtype=U64)
        idx = np.flatnonzero(occupied)
        np.bitwise_or.at(bitmap, idx >> 6, U64(1) << (idx & 63).astype(U64))
        counts = popcount64(bitmap)
        n_super = (n_words + cls.SUPER - 1) // cls.SUPER
        per_super = np.add.reduceat(counts, np.arange(0, n_words, cls.SUPER))
        rank_prefix = np.zeros(n_super, dtype=np.uint32)
        if n_super > 1:
            rank_prefix[1:] = np.cumsum(per_super[:-1]).astype(np.uint32)
        dense = xf.fingerprints[idx].copy()
        return cls(xf.width, xf.block_length, xf.seed, xf.n_keys,
                   bitmap, rank_prefix, dense)

    @classmethod
    def populate(cls, keys: np.ndarray, width: int = 8,
                 rng_state: int = 0x726B2B9D438B9D4D,
                 assume_unique: bool = False) -> "XorPlusFilter":
        return cls.compress(XorFilter.populate(keys, width, rng_state,
                                               assume_unique=assume_unique))

    def _positions(self, hashes: np.ndarray):
        return XorFilter._positions(self, hashes)  # same addressing

    def _lookup(self, slots: np.ndarray) -> np.ndarray:
        """Fingerprint at each slot via bitmap + rank (vectorized)."""
        slots = slots.astype(np.int64)
        word = slots >> 6
        bit = (slots & 63).astype(U64)
        w = self.bitmap[word]
        occupied = ((w >> bit) & U64(1)).astype(bool)
        below = popcount64(w & ((U64(1) << bit) - U64(1)))
        super_idx = word >> 2  # word // SUPER
        rank = self.rank_prefix[super_idx].astype(np.int64) + below
        base = super_idx << 2
        for j in range(self.SUPER - 1):
            wj = base + j
            sel = wj < word
            if sel.any():
                rank[sel] += popcount64(self.bitmap[wj[sel]])
        out = np.zeros(slots.shape, dtype=self.dense.dtype)
        if self.dense.size:
            out[occupied] = self.dense[rank[occupied]]
        return out

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        if self.n_keys == 0:
            return np.zeros(keys.shape, dtype=bool)
        hashes = mix_split(keys, self.seed)
        f = fingerprint64(hashes).astype(self.dense.dtype)
        h0, h1, h2 = self._positions(hashes)
        f = f ^ self._lookup(h0) ^ self._lookup(h1) ^ self._lookup(h2)
        return f == 0

    def size_in_bytes(self) -> int:
        return self.bitmap.nbytes + self.rank_prefix.nbytes + self.dense.nbytes

    def bits_per_entry(self) -> float:
        return 8.0 * self.size_in_bytes() / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        params = {"w": self.width, "seed": self.seed, "n": self.n_keys,
                  "bl": self.block_length, "n_words": len(self.bitmap),
                  "n_dense": len(self.dense)}
        payload = self.bitmap.tobytes() + self.rank_prefix.tobytes() + self.dense.tobytes()
        return serde.pack(self.kind, params, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "XorPlusFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        nw = p["n_words"]
        ns = (nw + cls.SUPER - 1) // cls.SUPER
        bitmap = np.frombuffer(payload, dtype=U64, count=nw).copy()
        off = nw * 8
        rank = np.frombuffer(payload, dtype=np.uint32, count=ns, offset=off).copy()
        off += ns * 4
        dense = np.frombuffer(payload, dtype=_DTYPES[p["w"]], count=p["n_dense"],
                              offset=off).copy()
        return cls(p["w"], p["bl"], p["seed"], p["n"], bitmap, rank, dense)
