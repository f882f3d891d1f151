"""Misra-Gries mergeable heavy-hitters summary, from scratch.

Misra & Gries 1982 ("Finding repeated elements"); mergeability per
Agarwal, Cormode, Huang, Phillips, Wei & Yi 2012 ("Mergeable
summaries"). Complements the count-min sketch: CMS answers point
queries over ALL keys (overestimates), MG maintains the ≤ k candidate
heavy hitters with a DETERMINISTIC two-sided bound and no hashing
noise — the right tool for vocabulary/top-terms accounting in a
training-data pipeline.

With ``k`` counters over total added weight n:

* every key with true frequency f(x) > n/(k+1) is IN the summary;
* a stored count satisfies c(x) ≤ f(x) ≤ c(x) + deficit, where
  ``deficit`` is tracked exactly per instance and ≤ n/(k+1).

Merge = pointwise counter addition, then one decrement step (subtract
the (k+1)-largest count, drop non-positives). Deficits add across
merges, so the bound certificate survives arbitrary merge trees —
associative and commutative, the UDAF contract.

The batch fold aggregates each batch with np.unique + bincount and
applies ONE decrement step — mathematically the ACHPWY12 merge of the
summary with the batch's exact (tiny) histogram, fully vectorized.
"""

from __future__ import annotations

import numpy as np

from ..core import serde
from ..core.hashing import U64


class MisraGries:
    kind = serde.KIND_MG

    def __init__(self, k: int = 64,
                 keys: np.ndarray | None = None,
                 counts: np.ndarray | None = None,
                 n_total: int = 0, deficit: int = 0) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.keys = (np.asarray(keys, dtype=U64) if keys is not None
                     else np.empty(0, dtype=U64))  # kept sorted
        self.counts = (np.asarray(counts, dtype=np.int64)
                       if counts is not None
                       else np.empty(0, dtype=np.int64))
        self.n_total = int(n_total)
        self.deficit = int(deficit)

    # -- core combine ---------------------------------------------------------
    def _combine(self, keys: np.ndarray, counts: np.ndarray) -> None:
        """Pointwise-add (keys, counts) into the summary, then shrink to
        ≤ k entries via one decrement step."""
        allk = np.concatenate([self.keys, keys])
        allc = np.concatenate([self.counts, counts])
        uk, inv = np.unique(allk, return_inverse=True)
        uc = np.bincount(inv, weights=allc.astype(np.float64)).astype(np.int64)
        if uk.size > self.k:
            # subtract the (k+1)-th largest count: ≤ k stay positive
            d = int(np.partition(uc, uk.size - self.k - 1)[uk.size - self.k - 1])
            uc = uc - d
            keep = uc > 0
            uk, uc = uk[keep], uc[keep]
            self.deficit += d
        self.keys, self.counts = uk, uc

    def add(self, keys: np.ndarray,
            counts: np.ndarray | None = None) -> "MisraGries":
        keys = np.asarray(keys, dtype=U64)
        if keys.size == 0:
            return self
        if counts is None:
            counts = np.ones(keys.shape, dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        uc = np.bincount(inv, weights=counts.astype(np.float64)).astype(np.int64)
        self._combine(uk, uc)
        self.n_total += int(counts.sum())
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("MG k mismatch")
        out = MisraGries(self.k, self.keys, self.counts,
                         self.n_total + other.n_total,
                         self.deficit + other.deficit)
        out._combine(other.keys, other.counts)
        return out

    # -- queries --------------------------------------------------------------
    def query(self, keys: np.ndarray) -> np.ndarray:
        """Lower-bound counts (0 for absent keys): c(x) ≤ f(x) ≤
        c(x) + self.deficit."""
        keys = np.asarray(keys, dtype=U64)
        if self.keys.size == 0:
            return np.zeros(keys.shape, dtype=np.int64)
        idx = np.searchsorted(self.keys, keys)
        idx = np.clip(idx, 0, self.keys.size - 1)
        hit = self.keys[idx] == keys
        return np.where(hit, self.counts[idx], 0).astype(np.int64)

    def heavy_hitters(self, threshold: float) -> tuple[np.ndarray, np.ndarray]:
        """(keys, lower-bound counts) of all candidates whose true
        frequency COULD be ≥ threshold·n_total (no false negatives:
        any key with f ≥ threshold·n and threshold > 1/(k+1) is here)."""
        bar = threshold * self.n_total - self.deficit
        m = self.counts >= max(bar, 1)
        order = np.argsort(-self.counts[m], kind="stable")
        return self.keys[m][order], self.counts[m][order]

    # -- serde ---------------------------------------------------------------
    def to_bytes(self) -> bytes:
        params = {"k": self.k, "n": self.n_total, "d": self.deficit,
                  "m": int(self.keys.size)}
        payload = self.keys.tobytes() + self.counts.tobytes()
        return serde.pack(self.kind, params, payload)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "MisraGries":
        kind, p, payload = serde.unpack(blob)
        if kind != cls.kind:
            raise ValueError("kind mismatch")
        m = p["m"]
        keys = np.frombuffer(payload, dtype=U64, count=m).copy()
        counts = np.frombuffer(payload, dtype=np.int64, offset=8 * m,
                               count=m).copy()
        return cls(p["k"], keys, counts, p["n"], p["d"])
