"""HyperLogLog (dense, 64-bit-hash variant) from scratch.

Flajolet et al. 2007 + the 64-bit-hash simplification (no large-range
correction needed) of Heule et al. 2013. Relative standard error
≈ 1.04/sqrt(m). Merge = elementwise register max — associative,
commutative, idempotent (the model mergeable UDAF per BASELINE.json
north_rule). Registers are uint8[m=2^p].

Tests cross-check estimates against exact counts and against Spark's
built-in ``hll_sketch_agg``/``approx_count_distinct`` as oracles
(oracles only — this implementation is self-contained).
"""

from __future__ import annotations

import math

import numpy as np

from ..core import serde
from ..core.hashing import U64, clz64, mix_split


class HyperLogLog:
    kind = serde.KIND_HLL

    def __init__(self, p: int = 14, registers: np.ndarray | None = None,
                 seed: int = 0x5EEDA11) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    # ---- update --------------------------------------------------------------
    def add(self, keys: np.ndarray) -> "HyperLogLog":
        """Add a batch of uint64 keys (vectorized)."""
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return self
        h = mix_split(keys, self.seed)
        idx = (h >> U64(64 - self.p)).astype(np.int64)
        w = h << U64(self.p)  # remaining 64-p bits shifted to the top
        # rho = leading zeros of w within (64-p) bits, +1; w==0 → 64-p+1
        rho = np.minimum(clz64(w), 64 - self.p) + 1
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))
        return self

    # ---- estimate --------------------------------------------------------------
    @staticmethod
    def _alpha(m: int) -> float:
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1 + 1.079 / m)

    def estimate(self) -> float:
        reg = self.registers.astype(np.float64)
        raw = self._alpha(self.m) * self.m * self.m / np.sum(np.exp2(-reg))
        if raw <= 2.5 * self.m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return self.m * math.log(self.m / zeros)  # linear counting
        return raw

    def rel_std_error(self) -> float:
        return 1.04 / math.sqrt(self.m)

    # ---- merge --------------------------------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.seed) != (other.p, other.seed):
            raise ValueError("HLL p/seed mismatch")
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers),
                           self.seed)

    # ---- serde --------------------------------------------------------------
    def to_bytes(self) -> bytes:
        return serde.pack(self.kind, {"p": self.p, "seed": self.seed},
                          self.registers.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HyperLogLog":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        return cls(p["p"], np.frombuffer(payload, dtype=np.uint8).copy(), p["seed"])
