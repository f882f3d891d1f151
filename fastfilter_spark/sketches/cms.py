"""Count-min sketch from scratch (Cormode & Muthukrishnan 2005).

Geometry: width w = ceil(e/eps), depth d = ceil(ln(1/delta)).
Guarantee: est(x) >= true(x), and est(x) <= true(x) + eps·N with
probability >= 1 - delta (N = total added weight). Merge = elementwise
counter addition — associative and commutative.

Rows are addressed with independent seeded splitmix hashes +
multiply-shift reduction (no modulo), fully vectorized.
"""

from __future__ import annotations

import math

import numpy as np

from ..core import serde
from ..core.hashing import U64, mix_split, reduce32


class CountMinSketch:
    kind = serde.KIND_CMS

    def __init__(self, eps: float = 1e-4, delta: float = 0.01,
                 table: np.ndarray | None = None, seed: int = 0xC0117,
                 total: int = 0) -> None:
        self.eps = eps
        self.delta = delta
        self.width = int(math.ceil(math.e / eps))
        self.depth = int(math.ceil(math.log(1.0 / delta)))
        self.seed = seed
        self.table = (table if table is not None
                      else np.zeros((self.depth, self.width), dtype=np.int64))
        self.total = total

    def _cols(self, keys: np.ndarray, row: int) -> np.ndarray:
        h = mix_split(keys, self.seed + 0x9E3779B9 * (row + 1))
        # use the high 32 bits for reduction (independent across rows via seed)
        return reduce32(h >> U64(32), self.width).astype(np.int64)

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return self
        if counts is None:
            counts = np.ones(keys.shape, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        for r in range(self.depth):
            np.add.at(self.table[r], self._cols(keys, r), counts)
        self.total += int(counts.sum())
        return self

    def query(self, keys: np.ndarray) -> np.ndarray:
        """Point estimates (>= true count) for a batch of keys."""
        keys = np.asarray(keys, dtype=U64)
        est = np.full(keys.shape, np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            est = np.minimum(est, self.table[r, self._cols(keys, r)])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth, self.seed) != (other.width, other.depth, other.seed):
            raise ValueError("CMS geometry/seed mismatch")
        return CountMinSketch(self.eps, self.delta, self.table + other.table,
                              self.seed, self.total + other.total)

    def to_bytes(self) -> bytes:
        params = {"eps": self.eps, "delta": self.delta, "seed": self.seed,
                  "total": self.total}
        return serde.pack(self.kind, params, self.table.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CountMinSketch":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        c = cls(p["eps"], p["delta"], None, p["seed"], p["total"])
        c.table = np.frombuffer(payload, dtype=np.int64).reshape(
            c.depth, c.width).copy()
        return c
