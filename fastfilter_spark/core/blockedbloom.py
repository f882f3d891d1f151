"""Register-blocked Bloom filter — one 64-byte cache line per key.

Not in the reference library; in scope as the classic Bloom variant the
published filter-comparison literature benchmarks the xor/fuse family
against (Putze–Sanders–Singler 2007 "Cache-, Hash- and Space-Efficient
Bloom Filters"; the `fastfilter_cpp` suite's blocked-bloom rows that
XOR20 §6 compares to). Every key's k bits live inside ONE 512-bit
block, so a probe touches exactly one cache line instead of k random
ones — the membership-serve-side trade the plain Bloom (`bloom.py`)
cannot make. The price is a dispersion penalty: blocks are Poisson-
loaded, overfull blocks dominate FPP, so the same target fpp costs
~15-30% more bits than an unblocked Bloom (PSS07 §3, Table 1).

Merge stays bitwise OR over identical geometry (same algebraic
contract as `BloomFilter`) — partial filters built over disjoint key
subsets combine associatively, which is what the distributed two-phase
build path relies on.

Layout: words is uint64[n_blocks * 8]; block b owns words[8b : 8b+8].

Hashing: block index via 32-bit fastrange on the top bits of
mix_split(key, seed) (multiply-shift, no modulo bias at any n_blocks
< 2^32); in-block bit positions are consecutive 9-bit slices of two
further murmur64 avalanches (9 bits address 512 positions exactly, 7
slices per 63-bit word, so k ≤ 14 needs two words).
"""

from __future__ import annotations

import math

import numpy as np

from . import serde
from .hashing import U64, mix_split, murmur64

_BLOCK_BITS = 512
_BLOCK_WORDS = _BLOCK_BITS // 64
# bits-per-key multiplier vs the unblocked geometry at the same target
# fpp — the PSS07 dispersion penalty for 512-bit blocks at k≈7 loads.
# Measured sweep at n=2e5, target fpp=0.01: pad 1.05 → 0.95%,
# 1.10 → 0.76%, 1.20 → 0.50%. 1.10 keeps the measured rate under the
# target with margin at 10.5 bits/key (test_blockedbloom gates ≤ 1.5×
# target).
_BLOCK_PAD = 1.10


class BlockedBloomFilter:
    kind = serde.KIND_BLOCKED_BLOOM

    def __init__(self, m_bits: int, k: int, seed: int, words: np.ndarray,
                 n_keys: int = 0) -> None:
        if m_bits % _BLOCK_BITS:
            raise ValueError("m_bits must be a multiple of 512")
        self.m_bits = m_bits
        self.k = k
        self.seed = seed
        self.words = words  # uint64[m_bits/64], 8-word blocks
        self.n_keys = n_keys

    # -- geometry -------------------------------------------------------------
    @staticmethod
    def geometry(n: int, fpp: float = 0.01):
        n = max(1, n)
        # k from the UNpadded per-key budget: extra pad bits fight
        # block dispersion; more hashes into one block would not. The
        # two 63-bit position words cap k at 14, and optimal k is
        # -log2(fpp), so targets tighter than ~2^-14.5 ≈ 4e-5 are
        # refused LOUDLY instead of silently under-hashing to a
        # worse-than-asked real rate.
        ideal_k = -math.log(fpp) / math.log(2)
        if round(ideal_k) > 14:
            raise ValueError(
                f"blockedbloom supports k <= 14 hashes (target fpp >= "
                f"~4e-5); asked fpp={fpp} needs k~{round(ideal_k)} — "
                "use kind='bloom' (unblocked) or a fingerprint filter "
                "(bf16/bf32) for tighter targets")
        m = -n * math.log(fpp) / (math.log(2) ** 2) * _BLOCK_PAD
        m = max(_BLOCK_BITS,
                int(math.ceil(m / _BLOCK_BITS)) * _BLOCK_BITS)
        k = max(1, min(14, int(round(m / _BLOCK_PAD / n * math.log(2)))))
        return m, k

    @classmethod
    def empty(cls, n_expected: int, fpp: float = 0.01,
              seed: int = 0xB10CB100F) -> "BlockedBloomFilter":
        m, k = cls.geometry(n_expected, fpp)
        return cls(m, k, seed, np.zeros(m // 64, dtype=U64), 0)

    # -- hashing --------------------------------------------------------------
    def _positions(self, keys: np.ndarray):
        """(block, (n, k) in-block bit index) — fully vectorized."""
        keys = np.asarray(keys, dtype=U64)
        h1 = mix_split(keys, self.seed)
        n_blocks = U64(self.m_bits // _BLOCK_BITS)
        # 32-bit fastrange on the avalanched top bits: unbiased for
        # n_blocks < 2^32 (a 10^12-key table is sharded across pids
        # long before one blob reaches 2^32 blocks = 256 GiB).
        with np.errstate(over="ignore"):
            block = ((h1 >> U64(32)) * n_blocks) >> U64(32)
        h2 = murmur64(h1)
        h3 = murmur64(h2 ^ U64(self.seed & 0xFFFFFFFFFFFFFFFF))
        j = np.arange(self.k, dtype=np.uint64)
        src = np.where(j < 7, h2[:, None], h3[:, None])
        shift = ((j % 7) * U64(9))[None, :]
        pos = ((src >> shift) & U64(_BLOCK_BITS - 1)).astype(np.int64)
        return block.astype(np.int64), pos

    # -- mutate / probe -------------------------------------------------------
    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        block, pos = self._positions(keys)
        widx = (block[:, None] * _BLOCK_WORDS + (pos >> 6)).ravel()
        np.bitwise_or.at(self.words, widx,
                         U64(1) << (pos & 63).astype(U64).ravel())
        self.n_keys += int(len(keys))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        block, pos = self._positions(keys)
        # one gather per key of its WHOLE 8-word block (the cache-line
        # access pattern), then bit tests against the local copy
        blk = self.words.reshape(-1, _BLOCK_WORDS)[block]     # (n, 8)
        w = np.take_along_axis(blk, pos >> 6, axis=1)          # (n, k)
        bits = (w >> (pos & 63).astype(U64)) & U64(1)
        return bits.all(axis=1)

    # -- algebra --------------------------------------------------------------
    def _check(self, other: "BlockedBloomFilter") -> None:
        if (self.m_bits, self.k, self.seed) != (other.m_bits, other.k,
                                                other.seed):
            raise ValueError("blocked-bloom geometry/seed mismatch")

    def merge(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        """Associative, commutative OR-merge (same geometry + seed)."""
        self._check(other)
        return BlockedBloomFilter(self.m_bits, self.k, self.seed,
                                  self.words | other.words,
                                  self.n_keys + other.n_keys)

    def intersect(self, other: "BlockedBloomFilter") -> "BlockedBloomFilter":
        """Bitwise AND — superset of the true intersection (ε degrades)."""
        self._check(other)
        return BlockedBloomFilter(self.m_bits, self.k, self.seed,
                                  self.words & other.words,
                                  min(self.n_keys, other.n_keys))

    # -- introspection / serde ------------------------------------------------
    def size_in_bytes(self) -> int:
        return self.words.nbytes

    def bits_per_entry(self) -> float:
        return self.m_bits / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        params = {"m": self.m_bits, "k": self.k, "seed": self.seed,
                  "n": self.n_keys}
        return serde.pack(self.kind, params, self.words.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BlockedBloomFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        words = np.frombuffer(payload, dtype=U64).copy()
        return cls(p["m"], p["k"], p["seed"], words, p["n"])
