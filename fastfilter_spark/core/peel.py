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

Implementation notes (profiled at n=1e6):
* slot positions h0/h1/h2 are computed ONCE per attempt; every round
  *gathers* them by key index instead of recomputing the hash mix
  (tracking xor-of-indices per slot instead of xor-of-hashes);
* per-slot state is cnt:int32 + ixor:uint32 — half the memory traffic
  of hash-xor tracking, which matters at 32 concurrent builders per box;
* a single errstate block wraps the whole attempt (numpy's per-call
  seterr was ~10% of build time).

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
        Distinct keys colliding to one hash simply fail the peel →
        caller rotates the seed (same recovery as the reference).
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

    with np.errstate(over="ignore"):
        p0, p1, p2 = positions(hashes)
        # int32 positions: the peel is DRAM-bound at high core counts
        # (random scatter/gather over >L3-sized arrays), so element
        # width directly sets multi-core throughput.
        pos3 = np.stack([np.asarray(p0).astype(np.int32),
                         np.asarray(p1).astype(np.int32),
                         np.asarray(p2).astype(np.int32)])  # (3, n)
        flat_pos = pos3.reshape(-1)

        # single packed per-slot state: (degree << 40) | sum_of_key_idx.
        # Removing key i from slot s is then ONE scatter:
        #   state[s] -= (1 << 40) + i
        # and a slot is singleton iff state>>40 == 1, with the remaining
        # key's index in the low 40 bits. Index sums fit: deg ≤ 250
        # (checked), n < 2^31 → sum < 2^39 < 2^40, exact in the float64
        # bincount weights (< 2^53).
        deg = np.bincount(flat_pos, minlength=array_length)
        if deg.max(initial=0) > 250:
            # absurd slot degree (adversarial hash) → seed rotation
            return False, 0, np.zeros(array_length, dtype=bool)
        idx3 = np.tile(np.arange(n, dtype=np.int64), 3)
        isum = np.bincount(flat_pos, weights=idx3, minlength=array_length)
        state = (deg.astype(np.uint64) << U64(40)) + isum.astype(np.uint64)
        del deg, isum, idx3
        ONE = U64(1) << U64(40)
        LOWMASK = ONE - U64(1)

        # ---- batch peel rounds ------------------------------------------
        stack_idx = np.empty(n, dtype=np.int64)
        stack_found = np.empty(n, dtype=np.int64)  # found SLOT per key
        rounds: List[Tuple[int, int]] = []
        sp = 0

        singles = np.flatnonzero(state >> U64(40) == U64(1))
        while singles.size:
            cand = (state[singles] & LOWMASK).astype(np.int64)
            # one key may be the lone occupant of 2–3 slots → dedupe by
            # key index (int sort, cheap)
            u = np.unique(cand)
            # find each key's singleton slot: the one (lowest j wins)
            # whose state says "1 occupant, and it is u"
            s0, s1, s2 = pos3[0, u], pos3[1, u], pos3[2, u]
            target = ONE + u.astype(np.uint64)
            m0 = state[s0] == target
            m1 = state[s1] == target
            found = np.where(m0, s0, np.where(m1, s1, s2))
            k = u.size
            stack_idx[sp:sp + k] = u
            stack_found[sp:sp + k] = found
            rounds.append((sp, sp + k))
            sp += k

            rm_pos = np.concatenate([s0, s1, s2])
            rm_val = np.tile(target, 3)
            np.subtract.at(state, rm_pos, rm_val)

            touched = np.unique(rm_pos)
            singles = touched[state[touched] >> U64(40) == U64(1)]

        if sp != n:
            return False, len(rounds), np.zeros(array_length, dtype=bool)

        # ---- reverse-round fingerprint assignment ------------------------
        occupied = np.zeros(array_length, dtype=bool)
        fdtype = fingerprints.dtype
        for start, end in reversed(rounds):
            u = stack_idx[start:end]
            found_pos = stack_found[start:end]
            hs = hashes[u]
            fval = (hs ^ (hs >> U64(32))).astype(fdtype)
            acc = (fval
                   ^ fingerprints[pos3[0, u]]
                   ^ fingerprints[pos3[1, u]]
                   ^ fingerprints[pos3[2, u]])
            # fingerprints[found_pos] is still 0 here, so it contributed
            # nothing to acc; writing acc satisfies f == fp[h0]^fp[h1]^fp[h2].
            fingerprints[found_pos] = acc
            occupied[found_pos] = True

    return True, len(rounds), occupied
