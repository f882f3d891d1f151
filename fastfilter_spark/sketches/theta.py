"""Theta (KMV — k minimum values) sketch from scratch.

Beyer et al. 2007 / the DataSketches theta formulation: keep the k
smallest 64-bit hash values; theta = the k-th smallest (or 1.0 ≡ 2^64
while unsaturated). Distinct-count estimate = (|retained|)/theta_frac
(unbiased (k−1)/theta_frac at saturation). Unlike HLL, theta supports
full *set algebra* with bounded error:

    union(A, B)      : theta = min(θa, θb), retain smallest k
    intersect(A, B)  : theta = min(θa, θb), retain common values < θ
    a_not_b(A, B)    : retain values of A < θ not in B

Merge is associative and commutative on the retained-set semantics.
Relative std err ≈ 1/sqrt(k−1) for union-only workloads.

Spark 4.1 ships theta_sketch_agg — used ONLY as a test oracle; this
implementation is self-contained numpy (BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np

from ..core import serde
from ..core.hashing import U64, mix_split

_FULL = float(2**64)


class ThetaSketch:
    kind = serde.KIND_THETA

    def __init__(self, k: int = 4096, values: np.ndarray | None = None,
                 theta: int = 2**64, seed: int = 0x7E7A) -> None:
        self.k = k
        self.seed = seed
        self.theta = theta  # exclusive upper bound on retained hash values
        self.values = (values if values is not None
                       else np.empty(0, dtype=U64))  # sorted, unique, < theta

    # ---- update ---------------------------------------------------------------
    def add(self, keys: np.ndarray) -> "ThetaSketch":
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return self
        h = mix_split(keys, self.seed)
        h = h[h < U64(min(self.theta, 2**64 - 1))] if self.theta < 2**64 else h
        merged = np.unique(np.concatenate([self.values, h]))
        self._trim(merged)
        return self

    def _trim(self, merged: np.ndarray) -> None:
        if merged.size > self.k:
            self.theta = int(merged[self.k])  # (k+1)-th smallest, exclusive
            merged = merged[: self.k]
        self.values = merged

    # ---- estimate ---------------------------------------------------------------
    def estimate(self) -> float:
        if self.theta >= 2**64:
            return float(self.values.size)
        return self.values.size / (self.theta / _FULL)

    def rel_std_error(self) -> float:
        return 1.0 / np.sqrt(max(self.k - 1, 1))

    # ---- set algebra ---------------------------------------------------------------
    def _common(self, other: "ThetaSketch") -> int:
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("theta k/seed mismatch")
        return min(self.theta, other.theta)

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        theta = self._common(other)
        merged = np.unique(np.concatenate([self.values, other.values]))
        merged = merged[merged < U64(min(theta, 2**64 - 1))] \
            if theta < 2**64 else merged
        out = ThetaSketch(self.k, None, theta, self.seed)
        out._trim(merged)
        return out

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        theta = self._common(other)
        vals = np.intersect1d(self.values, other.values)
        if theta < 2**64:
            vals = vals[vals < U64(theta)]
        return ThetaSketch(self.k, vals, theta, self.seed)

    def a_not_b(self, other: "ThetaSketch") -> "ThetaSketch":
        theta = self._common(other)
        vals = np.setdiff1d(self.values, other.values)
        if theta < 2**64:
            vals = vals[vals < U64(theta)]
        return ThetaSketch(self.k, vals, theta, self.seed)

    merge = union  # the mergeable-UDAF merge is set union

    # ---- serde ---------------------------------------------------------------
    def to_bytes(self) -> bytes:
        params = {"k": self.k, "seed": self.seed, "theta": str(self.theta)}
        return serde.pack(self.kind, params, self.values.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ThetaSketch":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        vals = np.frombuffer(payload, dtype=U64).copy()
        return cls(p["k"], vals, int(p["theta"]), p["seed"])
