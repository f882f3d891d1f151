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

Implementation notes (profiled at n=1e6 and n=1e7):
* slot positions h0/h1/h2 are computed ONCE per attempt; every round
  *gathers* them by key index instead of recomputing the hash mix;
* per-slot state is ONE packed uint64 (degree<<40 | sum-of-key-idx),
  built by a single weighted bincount — one random touch per incidence;
* binary fuse peels in two regimes — a few avalanche rounds covering
  ~35% of keys, then ~2000 small "wavefront" rounds (~0.03% each, a
  structural property of the segmented layout, NOT O(log n) like a
  uniform 3-hypergraph) — so removal is hybrid: dense O(L) bincount
  for big rounds, scatter-subtract + unique-touched for small ones
  (measured: ufunc.at on millions of positions and unique() on small
  tails are each the wrong tool for the other regime);
* sorting keys by h0 to localize slot access was tried and MEASURED
  SLOWER end-to-end on this host (argsort cost + no loop win) — the
  wavefront's slot set is already spread across all segments;
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
        # Removing key i from slot s is then a subtraction of
        #   (1 << 40) + i
        # and a slot is singleton iff state>>40 == 1, with the remaining
        # key's index in the low 40 bits. Built with ONE weighted
        # bincount: weight per (slot, key) incidence = (1<<40) + key_idx,
        # so the per-slot float64 sum IS state. Exactness: with every
        # slot degree ≤ 250 each sum ≤ 250·(2^40 + 2^31) < 2^53 — exact;
        # a degenerate hash that pushes a sum past 2^53 yields a float
        # still ≥ 2^52, so state>>40 ≫ 250 and the degree check fires
        # (seed rotation) either way.
        w3 = np.tile(np.arange(n, dtype=np.float64) + float(1 << 40), 3)
        wsum = np.bincount(flat_pos, weights=w3, minlength=array_length)
        del w3
        # guard BEFORE the uint64 cast: a float sum ≥ 2^64 would WRAP in
        # the cast and could sneak past the degree check below. Any such
        # slot needs degree ≥ ~2^24 — legit builds top out near
        # 250·(2^40 + n) < 2^49, so 2^62 is a safe adversarial cutoff.
        if wsum.max(initial=0.0) >= float(1 << 62):
            return False, 0, np.zeros(array_length, dtype=bool)
        state = wsum.astype(np.uint64)
        del wsum
        if (state >> U64(40)).max(initial=U64(0)) > 250:
            # absurd slot degree (adversarial hash) → seed rotation
            return False, 0, np.zeros(array_length, dtype=bool)
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
            # whose state says "1 occupant, and it is u". One (3, k)
            # fancy-gather instead of three 1-D ones — the ~2000-round
            # wavefront tail is dispatch-bound, so call count matters.
            pos_u = pos3[:, u]
            target = ONE + u.astype(np.uint64)
            m = state[pos_u] == target[None, :]
            found = np.where(m[0], pos_u[0], np.where(m[1], pos_u[1],
                                                      pos_u[2]))
            k = u.size
            stack_idx[sp:sp + k] = u
            stack_found[sp:sp + k] = found
            rounds.append((sp, sp + k))
            sp += k

            # remove the peeled keys from all their slots. Two regimes
            # (profiled at n=1e7: binary fuse peels ~35% of keys in a
            # handful of avalanche rounds, the rest in ~2000 small
            # wavefront rounds of ~0.03% each):
            # * avalanche rounds: one dense weighted bincount over the
            #   whole slot array — O(L) beats sorting millions of
            #   positions; per-slot sums stay < 2^53 (≤ 250 removals ×
            #   (2^40 + n)) → exact. Every singleton's occupant is
            #   peeled this round, so count==1 after subtraction means
            #   NEWLY single — a full rescan is correct.
            # * wavefront rounds: scatter-subtract at the (few) touched
            #   positions (ufunc.at handles repeated slots) and rescan
            #   only those.
            rm_pos = pos_u.reshape(-1)
            if rm_pos.size > array_length >> 4:
                dec = np.bincount(rm_pos, weights=np.tile(
                    target.astype(np.float64), 3), minlength=array_length)
                state -= dec.astype(np.uint64)
                singles = np.flatnonzero(state >> U64(40) == U64(1))
            else:
                np.subtract.at(state, rm_pos, np.tile(target, 3))
                touched = np.unique(rm_pos)
                singles = touched[state[touched] >> U64(40) == U64(1)]

        if sp != n:
            return False, len(rounds), np.zeros(array_length, dtype=bool)

        # ---- reverse-round fingerprint assignment ------------------------
        occupied = np.zeros(array_length, dtype=bool)
        fdtype = fingerprints.dtype
        fall = (hashes ^ (hashes >> U64(32))).astype(fdtype)  # one pass
        for start, end in reversed(rounds):
            u = stack_idx[start:end]
            found_pos = stack_found[start:end]
            fp_u = fingerprints[pos3[:, u]]          # one (3, k) gather
            acc = fall[u] ^ fp_u[0] ^ fp_u[1] ^ fp_u[2]
            # fingerprints[found_pos] is still 0 here, so it contributed
            # nothing to acc; writing acc satisfies f == fp[h0]^fp[h1]^fp[h2].
            fingerprints[found_pos] = acc
            occupied[found_pos] = True

    return True, len(rounds), occupied
