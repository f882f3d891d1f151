"""Vectorized hypergraph peeling shared by xor and binary-fuse filters.

The reference builds these filters with a sequential singleton queue
(`[U src/binaryfusefilter.zig ≈L130–330]`, [BFF22 §4.2–4.3];
`[U src/xorfilter.zig ≈L60–230]`, [XOR20 §3.3]). This module is a
deliberate Spark-first redesign: **batch (round-synchronous) peeling**.
Each round finds *all* currently-singleton slots at once and peels them
with whole-array numpy ops.

Why this is equivalent: 2-core peeling of a hypergraph is confluent —
the set of peelable keys is independent of peel order, so batch rounds
peel exactly what the sequential queue peels (success iff all keys
peel). Batch peeling finishes in O(log n) rounds w.h.p. (the classic
parallel-peeling result), so the per-key work stays vectorized numpy
instead of a per-key Python loop — this is what makes a pure-Python
implementation fast enough to saturate an executor core.

Correctness of the round-batched *assignment* (reverse order): if slot
s is the found-slot of key C peeled in round r, then no key peeled in
round > r can hash to s (count[s] was 1 at round r), and no key peeled
in the same round hashes to s either. Hence a key's other-slots are
found-slots only of keys from strictly later rounds, which are assigned
earlier when rounds are processed in reverse — exactly the invariant
the sequential reverse-stack walk relies on.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

from .hashing import U64

MAX_ITERATIONS = 100  # same bound as the reference (XOR_MAX_ITERATIONS)


class PeelFailure(Exception):
    """Construction failed after MAX_ITERATIONS seed rotations."""


def _xor_scatter_u64(target: np.ndarray, idx: np.ndarray, val: np.ndarray) -> None:
    np.bitwise_xor.at(target, idx, val)


def peel_and_assign(
    hashes: np.ndarray,
    positions: Callable[[np.ndarray], Tuple[np.ndarray, np.ndarray, np.ndarray]],
    array_length: int,
    fingerprints: np.ndarray,
) -> Tuple[bool, int, np.ndarray]:
    """One peeling attempt + fingerprint assignment.

    Parameters
    ----------
    hashes : uint64[n] — seeded hashes of the (deduplicated) keys.
    positions : maps uint64 hashes → (h0, h1, h2) slot indices.
    array_length : number of slots.
    fingerprints : zeroed output array (uint8/16/32), len == array_length.
        Fingerprint values are derived from each hash as
        (h ^ (h >> 32)) truncated to the array dtype.

    Returns (success, n_rounds, occupied_mask) where occupied_mask marks
    slots that received an assignment (used by xor+ compression).
    """
    n = len(hashes)
    if n == 0:
        return True, 0, np.zeros(array_length, dtype=bool)

    h0, h1, h2 = positions(hashes)
    all_pos = np.concatenate([h0, h1, h2]).astype(np.int64)
    all_hash = np.concatenate([hashes, hashes, hashes])
    all_j = np.concatenate(
        [
            np.zeros(n, dtype=np.uint8),
            np.ones(n, dtype=np.uint8),
            np.full(n, 2, dtype=np.uint8),
        ]
    )

    cnt = np.bincount(all_pos, minlength=array_length).astype(np.int64)
    txor = np.zeros(array_length, dtype=U64)
    jxor = np.zeros(array_length, dtype=np.uint8)
    _xor_scatter_u64(txor, all_pos, all_hash)
    np.bitwise_xor.at(jxor, all_pos, all_j)

    # ---- batch peel rounds -------------------------------------------------
    stack_hash = np.empty(n, dtype=U64)
    stack_found = np.empty(n, dtype=np.uint8)
    rounds: List[Tuple[int, int]] = []
    sp = 0

    singles = np.flatnonzero(cnt == 1)
    while singles.size:
        hs = txor[singles]
        js = jxor[singles]
        # A key that is the lone occupant of 2–3 slots appears multiple
        # times; keep the first occurrence per hash (deterministic —
        # np.unique returns first-occurrence indices of the sorted uniques).
        uniq, first = np.unique(hs, return_index=True)
        hs = hs[first]
        js = js[first]
        k = hs.size

        start = sp
        stack_hash[sp : sp + k] = hs
        stack_found[sp : sp + k] = js
        sp += k
        rounds.append((start, sp))

        p0, p1, p2 = positions(hs)
        rm_pos = np.concatenate([p0, p1, p2]).astype(np.int64)
        rm_hash = np.concatenate([hs, hs, hs])
        rm_j = np.concatenate(
            [
                np.zeros(k, dtype=np.uint8),
                np.ones(k, dtype=np.uint8),
                np.full(k, 2, dtype=np.uint8),
            ]
        )
        np.subtract.at(cnt, rm_pos, 1)
        _xor_scatter_u64(txor, rm_pos, rm_hash)
        np.bitwise_xor.at(jxor, rm_pos, rm_j)

        touched = np.unique(rm_pos)
        singles = touched[cnt[touched] == 1]

    if sp != n:
        return False, len(rounds), np.zeros(array_length, dtype=bool)

    # ---- reverse-round fingerprint assignment ------------------------------
    occupied = np.zeros(array_length, dtype=bool)
    fdtype = fingerprints.dtype
    for start, end in reversed(rounds):
        hs = stack_hash[start:end]
        js = stack_found[start:end].astype(np.int64)
        p0, p1, p2 = positions(hs)
        pstack = np.stack([p0, p1, p2])  # (3, k)
        found_pos = pstack[js, np.arange(hs.size)].astype(np.int64)
        # fingerprint source value for these hashes
        fval = (hs ^ (hs >> U64(32))).astype(fdtype)
        acc = (
            fval
            ^ fingerprints[p0.astype(np.int64)]
            ^ fingerprints[p1.astype(np.int64)]
            ^ fingerprints[p2.astype(np.int64)]
        )
        # fingerprints[found_pos] is still 0 here, so it contributed
        # nothing to acc; writing acc satisfies f == fp[h0]^fp[h1]^fp[h2].
        fingerprints[found_pos] = acc
        occupied[found_pos] = True

    return True, len(rounds), occupied
