"""Merging t-digest from scratch (Dunning & Ertl, "Computing Extremely
Accurate Quantiles Using t-Digests", 2019).

The merging variant: incoming values are buffered, then merged with the
existing centroids in one sorted sweep, greedily growing each centroid
until the k1 scale-function budget is exhausted:

    k1(q) = (delta / 2π) · asin(2q − 1)

which concentrates small centroids at the tails (relative accuracy at
extreme quantiles). Deterministic: no randomness anywhere, so the same
input order yields byte-identical digests. Merge of two digests =
concatenate centroids as a buffer and re-merge; estimates from any
merge order agree within the digest's accuracy (tests assert bounds,
not byte equality).
"""

from __future__ import annotations

import math

import numpy as np

from ..core import serde


class TDigest:
    kind = serde.KIND_TDIGEST

    BUFFER_FACTOR = 5  # buffer holds BUFFER_FACTOR * delta points before merging

    def __init__(self, delta: float = 200.0) -> None:
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_n = 0
        self.n = 0
        self.min = math.inf
        self.max = -math.inf

    # ---- scale function -------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 0.0, 1.0)
        return (self.delta / (2 * math.pi)) * np.arcsin(2 * q - 1)

    def _k1(self, q: float) -> float:
        """Scalar k1 — math.asin is ~30× cheaper than spinning up the
        vectorized path for one value, and the merge sweep calls this
        once per centroid per buffer merge (the sketch's hot path)."""
        q = 0.0 if q < 0.0 else (1.0 if q > 1.0 else q)
        return (self.delta / (2 * math.pi)) * math.asin(2 * q - 1)

    # ---- update ----------------------------------------------------------------
    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        mask = ~np.isnan(values)
        values = values[mask]
        if values.size == 0:
            return self
        if weights is None:
            w = np.ones(values.size, dtype=np.float64)
        else:
            w = np.asarray(weights, dtype=np.float64)[mask]
        self._buf.append(np.stack([values, w]))
        self._buf_n += values.size
        self.n += int(w.sum())
        self.min = min(self.min, float(values.min()))
        self.max = max(self.max, float(values.max()))
        if self._buf_n >= self.BUFFER_FACTOR * self.delta:
            self._merge_buffer()
        return self

    def _merge_buffer(self) -> None:
        if not self._buf:
            return
        bv = np.concatenate([b[0] for b in self._buf])
        bw = np.concatenate([b[1] for b in self._buf])
        self._buf = []
        self._buf_n = 0
        means = np.concatenate([self.means, bv])
        weights = np.concatenate([self.weights, bw])
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()

        # single greedy sweep: grow the current centroid while the merged
        # q-range stays within one unit of the k1 scale
        out_means: list[float] = []
        out_weights: list[float] = []
        cum = 0.0  # weight before current centroid
        cur_m = means[0]
        cur_w = weights[0]
        k_lo = self._k1(0.0)
        for i in range(1, means.size):
            proposed = cur_w + weights[i]
            q_hi = (cum + proposed) / total
            if self._k1(q_hi) - k_lo <= 1.0:
                # merge into current centroid (weighted mean)
                cur_m += (means[i] - cur_m) * (weights[i] / proposed)
                cur_w = proposed
            else:
                out_means.append(cur_m)
                out_weights.append(cur_w)
                cum += cur_w
                cur_m = means[i]
                cur_w = weights[i]
                k_lo = self._k1(cum / total)
        out_means.append(cur_m)
        out_weights.append(cur_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    # ---- query ----------------------------------------------------------------
    def quantile(self, q: float) -> float:
        self._merge_buffer()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        q = min(max(q, 0.0), 1.0)
        total = self.weights.sum()
        target = q * total
        # centroid centers at cumulative weight (w_i/2 + sum of previous)
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.min + (self.means[0] - self.min) * max(target, 0.0) / max(cum[0], 1e-12))
        if target >= cum[-1]:
            span = total - cum[-1]
            frac = (target - cum[-1]) / max(span, 1e-12)
            return float(self.means[-1] + (self.max - self.means[-1]) * min(frac, 1.0))
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / max(cum[i + 1] - cum[i], 1e-12)
        return float(self.means[i] + (self.means[i + 1] - self.means[i]) * frac)

    def rank(self, x: float) -> float:
        self._merge_buffer()
        if self.means.size == 0:
            return float("nan")
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        r = float(np.interp(x, self.means, cum, left=0.0, right=total))
        return r / total

    # ---- merge ----------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("t-digest delta mismatch")
        self._merge_buffer()
        other._merge_buffer()
        out = TDigest(self.delta)
        out.n = self.n + other.n
        out.min = min(self.min, other.min)
        out.max = max(self.max, other.max)
        # concatenated centroids go straight through the merge sweep as
        # one buffer entry
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        if means.size:
            out._buf = [np.stack([means, weights])]
            out._buf_n = means.size
            out._merge_buffer()
        return out

    # ---- serde ----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._merge_buffer()
        params = {"delta": self.delta, "n": self.n,
                  "min": None if math.isinf(self.min) else self.min,
                  "max": None if math.isinf(self.max) else self.max}
        payload = self.means.tobytes() + self.weights.tobytes()
        return serde.pack(self.kind, params, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        td = cls(p["delta"])
        td.n = p["n"]
        td.min = math.inf if p["min"] is None else p["min"]
        td.max = -math.inf if p["max"] is None else p["max"]
        half = len(payload) // 2
        td.means = np.frombuffer(payload[:half], dtype=np.float64).copy()
        td.weights = np.frombuffer(payload[half:], dtype=np.float64).copy()
        return td
