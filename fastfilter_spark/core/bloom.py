"""Baseline Bloom filter — the one truly algebraic (OR-mergeable) filter.

Not in the reference library; in scope per BASELINE.json north_star
("a baseline Bloom filter as mergeable UDAFs"). Classic partitioned-
double-hashing Bloom: m = -n·ln(p)/ln(2)^2 bits, k = m/n·ln2 hashes,
h_i = h1 + i·h2 (Kirsch–Mitzenmacher). Partial filters built over
disjoint key subsets merge by bitwise OR — the associative merge the
distributed build uses for its map-side combine.
"""

from __future__ import annotations

import math

import numpy as np

from . import serde
from .hashing import U64, murmur64, mix_split


class BloomFilter:
    kind = serde.KIND_BLOOM

    def __init__(self, m_bits: int, k: int, seed: int, words: np.ndarray,
                 n_keys: int = 0) -> None:
        self.m_bits = m_bits
        self.k = k
        self.seed = seed
        self.words = words  # uint64[ceil(m/64)]
        self.n_keys = n_keys

    @staticmethod
    def geometry(n: int, fpp: float = 0.01):
        n = max(1, n)
        m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        m = max(64, (m + 63) // 64 * 64)
        k = max(1, int(round(m / n * math.log(2))))
        return m, k

    @classmethod
    def empty(cls, n_expected: int, fpp: float = 0.01, seed: int = 0xB100F) -> "BloomFilter":
        m, k = cls.geometry(n_expected, fpp)
        return cls(m, k, seed, np.zeros(m // 64, dtype=U64), 0)

    def _bit_positions(self, keys: np.ndarray) -> np.ndarray:
        """(n, k) bit indices via double hashing — fully vectorized."""
        keys = np.asarray(keys, dtype=U64)
        h1 = mix_split(keys, self.seed)
        h2 = murmur64(h1) | U64(1)  # odd step
        i = np.arange(self.k, dtype=U64)[None, :]
        with np.errstate(over="ignore"):
            hi = h1[:, None] + i * h2[:, None]
        return (hi % U64(self.m_bits)).astype(np.int64)

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._bit_positions(keys).ravel()
        np.bitwise_or.at(self.words, pos >> 6, U64(1) << (pos & 63).astype(U64))
        self.n_keys += int(len(keys))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._bit_positions(keys)
        w = self.words[pos >> 6]
        bits = (w >> (pos & 63).astype(U64)) & U64(1)
        return bits.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """Associative, commutative OR-merge (same geometry + seed)."""
        if (self.m_bits, self.k, self.seed) != (other.m_bits, other.k, other.seed):
            raise ValueError("bloom geometry/seed mismatch")
        return BloomFilter(self.m_bits, self.k, self.seed,
                           self.words | other.words,
                           self.n_keys + other.n_keys)

    def intersect(self, other: "BloomFilter") -> "BloomFilter":
        """Bitwise AND — superset of the true intersection (ε degrades)."""
        if (self.m_bits, self.k, self.seed) != (other.m_bits, other.k, other.seed):
            raise ValueError("bloom geometry/seed mismatch")
        return BloomFilter(self.m_bits, self.k, self.seed,
                           self.words & other.words, min(self.n_keys, other.n_keys))

    def size_in_bytes(self) -> int:
        return self.words.nbytes

    def bits_per_entry(self) -> float:
        return self.m_bits / max(1, self.n_keys)

    def to_bytes(self) -> bytes:
        params = {"m": self.m_bits, "k": self.k, "seed": self.seed, "n": self.n_keys}
        return serde.pack(self.kind, params, self.words.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        words = np.frombuffer(payload, dtype=U64).copy()
        return cls(p["m"], p["k"], p["seed"], words, p["n"])
