"""Cuckoo filter, from scratch in numpy — the deletable complement to
the static xor/binary-fuse filters.

Partial-key cuckoo hashing (Fan, Andersen, Kaminsky, Mitzenmacher,
*Cuckoo Filter: Practically Better Than Bloom*, CoNEXT 2014): m buckets
× 4 slots of w-bit nonzero fingerprints; a key's two candidate buckets
are i1 = h(key) mod m and i2 = i1 ⊕ h(fp) — self-inverse, so an entry
can be relocated knowing only its fingerprint. Supports DELETE (remove
one matching fingerprint copy), which no xor/fuse/bloom variant does —
this is what the reference family lacks for streaming membership with
retractions (SURVEY.md §2.2 Streaming; the rebuild-on-trigger sink
covers inserts only).

Construction is vectorized in two bulk phases (place everyone who fits
in i1, then the spill in i2 — pure argsort/cumcount numpy) with a
sequential kick loop only for the tiny remainder (~2–4% at the default
0.84 load factor; classic cuckoo eviction, bounded at 500 kicks).

FPP ≈ 2·b/2^w (≈3.1% at w=8, ≈0.012% at w=16); bits/entry =
w/α ≈ 9.5 at w=8, α=0.84 — between bloom and binary fuse, buying
deletability. Zero false negatives for present keys, as always.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import serde
from .hashing import U64, SplitMix64, mix_split, murmur64

_B = 4                # slots per bucket
_ALPHA = 0.84         # target load factor for 4-way cuckoo
_MAX_KICKS = 500
_MAX_ATTEMPTS = 8     # seed rotations before giving up

_DTYPES = {8: np.uint8, 16: np.uint16}


def _geometry(n: int) -> int:
    """Number of buckets (power of two)."""
    need = max(1, int(np.ceil(n / (_B * _ALPHA))))
    return 1 << int(np.ceil(np.log2(need)))


def _fp_and_buckets(keys: np.ndarray, seed: int, m: int, w: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    h = mix_split(keys.astype(U64, copy=False), U64(seed))
    # nonzero w-bit fingerprint from the high bits
    fp = ((h >> U64(64 - w)) % U64((1 << w) - 1) + U64(1))
    i1 = (h & U64(m - 1)).astype(np.int64)
    i2 = _alt_bucket(i1, fp, m)
    return fp, i1, i2


def _alt_bucket(i: np.ndarray, fp: np.ndarray, m: int) -> np.ndarray:
    fph = murmur64(fp.astype(U64))
    return ((i.astype(np.uint64) ^ fph) & U64(m - 1)).astype(np.int64)


def _bulk_place(table: np.ndarray, counts: np.ndarray, buckets: np.ndarray,
                fps: np.ndarray) -> np.ndarray:
    """Place as many (bucket, fp) pairs as capacity allows, vectorized.
    Returns the boolean mask of PLACED entries. Stable: first-come wins
    within a bucket (after the argsort by bucket)."""
    if len(buckets) == 0:
        return np.zeros(0, dtype=bool)
    order = np.argsort(buckets, kind="stable")
    sb = buckets[order]
    # rank of each entry within its bucket run: position − run start
    new_run = np.empty(len(sb), dtype=bool)
    new_run[0] = True
    new_run[1:] = sb[1:] != sb[:-1]
    run_starts = np.flatnonzero(new_run)
    start_of_run = np.repeat(run_starts,
                             np.diff(np.append(run_starts, len(sb))))
    rank = np.arange(len(sb)) - start_of_run
    slot = counts[sb] + rank
    placed_sorted = slot < _B
    tb, ts = sb[placed_sorted], slot[placed_sorted]
    table[tb, ts] = fps[order][placed_sorted]
    np.add.at(counts, sb[placed_sorted], 1)
    placed = np.zeros(len(buckets), dtype=bool)
    placed[order] = placed_sorted
    return placed


_STASH_MAX = 8


class CuckooFilter:
    def __init__(self, width: int, seed: int, table: np.ndarray,
                 n_items: int, stash=None):
        self.width = width
        self.seed = seed
        self.table = table          # (m, 4) of uint8/16; 0 = empty
        self.m = table.shape[0]
        self.n_items = n_items
        # stash of homeless (bucket, fp) pairs — a failed kick chain
        # would otherwise DROP the evicted resident's fingerprint,
        # turning a previously-inserted key into a false negative. A
        # tiny stash makes that outcome impossible until the stash
        # itself fills (_STASH_MAX), at which point add() fails; add()
        # snapshots table+stash up front and restores them on failure,
        # so a failed batch leaves no phantom fingerprints behind.
        self.stash: list = list(stash) if stash else []  # [(bucket, fp)]

    # -- construction -------------------------------------------------------
    @classmethod
    def empty(cls, capacity: int, width: int = 8, rng_state: int = 1
              ) -> "CuckooFilter":
        """Pre-sized empty filter for incremental `add`/`delete` use
        (streaming): cuckoo tables cannot grow in place (the alt-bucket
        xor trick fixes m), so size for the expected key count up front."""
        m = _geometry(max(1, capacity))
        seed = int(SplitMix64(rng_state).next())
        return cls(width, seed, np.zeros((m, _B), dtype=_DTYPES[width]), 0)

    @classmethod
    def populate(cls, keys: np.ndarray, width: int = 8,
                 rng_state: int = 1, assume_unique: bool = False
                 ) -> "CuckooFilter":
        keys = np.asarray(keys, dtype=U64)
        if not assume_unique:
            keys = np.unique(keys)
        n = len(keys)
        m = _geometry(max(1, n))
        rng = SplitMix64(rng_state)
        for _ in range(_MAX_ATTEMPTS):
            seed = int(rng.next())
            f = cls(width, seed, np.zeros((m, _B), dtype=_DTYPES[width]), 0)
            if f._insert_all(keys):
                f.n_items = n
                return f
            m *= 2  # extremely rare at α=0.84; grow and retry
        raise RuntimeError("cuckoo construction failed after retries")

    def _insert_all(self, keys: np.ndarray) -> bool:
        fp, i1, i2 = _fp_and_buckets(keys, self.seed, self.m, self.width)
        counts = np.count_nonzero(self.table, axis=1).astype(np.int64)
        placed = _bulk_place(self.table, counts, i1, fp)
        rem = ~placed
        placed2 = _bulk_place(self.table, counts, i2[rem], fp[rem])
        # sequential kick loop for the tail
        rem_idx = np.flatnonzero(rem)[~placed2]
        rng = SplitMix64(self.seed ^ 0xC0FFEE)
        for j in rem_idx:
            if not self._kick_insert(int(i1[j]), int(fp[j]), rng):
                return False
        return True

    def _kick_insert(self, i: int, f: int, rng: SplitMix64) -> bool:
        # Kicking is only safe while the stash has room: a failed chain
        # ends holding some PREVIOUSLY INSERTED key's fingerprint, and
        # the stash is where it survives (dropping it would be a false
        # negative). With a full stash, try both buckets non-evictively
        # and otherwise reject the NEW key — residents stay intact.
        if len(self.stash) >= _STASH_MAX:
            for b in (i, int(_alt_bucket(np.asarray([i]),
                                         np.asarray([f], dtype=U64),
                                         self.m)[0])):
                row = self.table[b]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    row[empty[0]] = f
                    return True
            return False
        for _ in range(_MAX_KICKS):
            row = self.table[i]
            empty = np.flatnonzero(row == 0)
            if empty.size:
                row[empty[0]] = f
                return True
            # evict a pseudo-random resident
            s = int(rng.next()) & (_B - 1)
            f, row[s] = int(row[s]), f
            i = int(_alt_bucket(np.asarray([i]), np.asarray([f], dtype=U64),
                                self.m)[0])
        # chain exhausted: stash the carried (previously inserted)
        # fingerprint; contains/delete consult the stash.
        self.stash.append((int(i), int(f)))
        return True

    def _stash_contains(self, fp: np.ndarray, i1: np.ndarray,
                        i2: np.ndarray) -> np.ndarray:
        out = np.zeros(len(fp), dtype=bool)
        for b, f in self.stash:
            # a stashed (b, f) answers for keys whose fp == f and whose
            # candidate buckets include b (i2 = i1 ^ h(fp) is symmetric)
            out |= (fp == f) & ((i1 == b) | (i2 == b))
        return out

    # -- query / mutate ------------------------------------------------------
    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=U64)
        fp, i1, i2 = _fp_and_buckets(keys, self.seed, self.m, self.width)
        fpc = fp.astype(self.table.dtype)
        hit1 = (self.table[i1] == fpc[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fpc[:, None]).any(axis=1)
        out = hit1 | hit2
        if self.stash:
            out |= self._stash_contains(fp, i1, i2)
        return out

    def add(self, keys: np.ndarray) -> None:
        """Insert a batch, ATOMICALLY: _insert_all may place part of the
        batch before a stash-full failure, so table+stash are snapshotted
        up front and restored on failure — a caller that catches and
        retries on a bigger filter inherits no phantom fingerprints.
        Multiset semantics: re-adding a present key stores another
        fingerprint copy (one delete() removes one copy)."""
        keys = np.unique(np.asarray(keys, dtype=U64))
        snap_table = self.table.copy()
        snap_stash = list(self.stash)
        if not self._insert_all(keys):
            self.table = snap_table
            self.stash = snap_stash
            raise RuntimeError("cuckoo filter full (add)")
        self.n_items += len(keys)

    def delete(self, keys: np.ndarray) -> int:
        """Remove ONE fingerprint copy per key (keys must have been
        inserted, per the cuckoo-filter contract — deleting a never-
        inserted key can evict a colliding entry's fingerprint).
        Sequential over the batch: two deletes may race for one slot,
        and correctness beats vectorization on the (rare) delete path.
        Returns the number of keys whose fingerprint was found+removed."""
        keys = np.asarray(keys, dtype=U64)
        fp, i1, i2 = _fp_and_buckets(keys, self.seed, self.m, self.width)
        removed = 0
        for j in range(len(keys)):
            f = self.table.dtype.type(fp[j])
            # stash first: a stashed copy is as real as a table copy
            hit_stash = next((t for t in self.stash
                              if t[1] == int(f)
                              and t[0] in (int(i1[j]), int(i2[j]))), None)
            if hit_stash is not None:
                self.stash.remove(hit_stash)
                removed += 1
                continue
            for i in (int(i1[j]), int(i2[j])):
                row = self.table[i]
                hits = np.flatnonzero(row == f)
                if hits.size:
                    row[hits[0]] = 0
                    # keep occupied slots contiguous (bulk insertion
                    # writes at slot == count and assumes no holes)
                    nz = row[row != 0]
                    row[:] = 0
                    row[: len(nz)] = nz
                    removed += 1
                    break
        self.n_items = max(0, self.n_items - removed)
        return removed

    # -- metrics / serde ----------------------------------------------------
    def size_in_bytes(self) -> int:
        return self.table.nbytes

    def bits_per_entry(self) -> float:
        return 8.0 * self.table.nbytes / max(1, self.n_items)

    def to_bytes(self) -> bytes:
        params = {"w": self.width, "m": self.m, "seed": self.seed,
                  "n": self.n_items, "stash": self.stash}
        return serde.pack(serde.KIND_CUCKOO, params, self.table.tobytes())

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        kind, p, payload = serde.unpack(blob)
        if kind != serde.KIND_CUCKOO:
            raise ValueError("not a cuckoo blob")
        table = np.frombuffer(payload, dtype=_DTYPES[p["w"]]) \
            .reshape(p["m"], _B).copy()
        stash = [tuple(t) for t in p.get("stash", [])]
        return cls(p["w"], p["seed"], table, p["n"], stash=stash)
