"""Bit-exact vectorized hash kernels shared by every filter/sketch.

These reimplement, in numpy uint64 wrapping arithmetic, the small hash
utility surface of the reference library (hexops/fastfilter,
`src/util.zig` — splitmix64 finalizer, mixSplit, rotl, multiply-shift
range reduction, fingerprint; see SURVEY.md §2.1 #10–#13 and the
published algorithm papers: Graf & Lemire, "Xor Filters", ACM JEA 2020
[XOR20] and "Binary Fuse Filters", ACM JEA 2022 [BFF22]).

Everything here operates on numpy arrays (vectorized, C-speed) so the
kernels can run inside Arrow-fed pandas UDFs without per-row Python.
"""

from __future__ import annotations

import hashlib

import numpy as np

U64 = np.uint64
_M1 = U64(0xFF51AFD7ED558CCD)
_M2 = U64(0xC4CEB9FE1A85EC53)
_S33 = U64(33)


def murmur64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (a.k.a. murmur64 mixer). uint64 in/out.

    Reference: `[U src/util.zig ≈L5–15]`, [XOR20 §3.2].
    """
    h = np.asarray(h, dtype=U64)
    with np.errstate(over="ignore"):
        h = h ^ (h >> _S33)
        h = h * _M1
        h = h ^ (h >> _S33)
        h = h * _M2
        h = h ^ (h >> _S33)
    return h


def mix_split(keys: np.ndarray, seed: int) -> np.ndarray:
    """murmur64(key +wrap seed) — the filter's private seeded hash.

    Reference: `[U src/util.zig ≈L17–20]`.
    """
    with np.errstate(over="ignore"):
        return murmur64(np.asarray(keys, dtype=U64) + U64(seed & 0xFFFFFFFFFFFFFFFF))


def rotl64(x: np.ndarray, r: int) -> np.ndarray:
    """64-bit rotate left. Reference: `[U src/util.zig ≈L22–25]`."""
    x = np.asarray(x, dtype=U64)
    r &= 63
    if r == 0:
        return x
    with np.errstate(over="ignore"):
        return (x << U64(r)) | (x >> U64(64 - r))


def reduce32(h: np.ndarray, n: int) -> np.ndarray:
    """Lemire multiply-shift range reduction: (uint32(h) * n) >> 32.

    Maps a 32-bit hash uniformly onto [0, n) without modulo.
    Reference: `[U src/util.zig ≈L30]`, [XOR20 §3.2].
    """
    h = np.asarray(h, dtype=U64) & U64(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        return (h * U64(n)) >> U64(32)


def fingerprint64(h: np.ndarray) -> np.ndarray:
    """fingerprint(hash) = hash ^ (hash >> 32), truncated by caller to T.

    Reference: `[U src/util.zig ≈L37–40]`.
    """
    h = np.asarray(h, dtype=U64)
    return h ^ (h >> U64(32))


def mulhi64(a: np.ndarray, b: int) -> np.ndarray:
    """High 64 bits of the 128-bit product a * b (b scalar).

    numpy has no uint128, so split into 32-bit halves. Used by the
    binary-fuse segment addressing ([BFF22 §3]).
    """
    a = np.asarray(a, dtype=U64)
    b = int(b) & 0xFFFFFFFFFFFFFFFF
    m32 = U64(0xFFFFFFFF)
    ah = a >> U64(32)
    al = a & m32
    bh = U64(b >> 32)
    bl = U64(b & 0xFFFFFFFF)
    with np.errstate(over="ignore"):
        lo_lo = al * bl
        hi_lo = ah * bl
        lo_hi = al * bh
        hi_hi = ah * bh
        cross = (lo_lo >> U64(32)) + (hi_lo & m32) + lo_hi
        return (hi_lo >> U64(32)) + (cross >> U64(32)) + hi_hi


class SplitMix64:
    """Scalar splitmix64 RNG used for seed rotation during construction.

    Deterministic: same initial state → same seed sequence → same filter
    bytes for a given key set (construction reproducibility gate).
    """

    __slots__ = ("state",)

    def __init__(self, state: int = 0x726B2B9D438B9D4D) -> None:
        self.state = state & 0xFFFFFFFFFFFFFFFF

    def next(self) -> int:
        self.state = (self.state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = self.state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return (z ^ (z >> 31)) & 0xFFFFFFFFFFFFFFFF


def clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (exact, no float round)."""
    x = np.asarray(x, dtype=U64)
    n = np.full(x.shape, 64, dtype=np.int64)
    cur = x.copy()
    for bits in (32, 16, 8, 4, 2, 1):
        b = U64(bits)
        mask = (cur >> b) != 0
        n = np.where(mask, n - bits, n)
        cur = np.where(mask, cur >> b, cur)
    n = np.where(x != 0, n - 1, n)  # n currently counts zeros above MSB + 1
    return n.astype(np.int64)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized population count for uint64 (SWAR; numpy<2 lacks it)."""
    x = np.asarray(x, dtype=U64).copy()
    with np.errstate(over="ignore"):
        x = x - ((x >> U64(1)) & U64(0x5555555555555555))
        x = (x & U64(0x3333333333333333)) + ((x >> U64(2)) & U64(0x3333333333333333))
        x = (x + (x >> U64(4))) & U64(0x0F0F0F0F0F0F0F0F)
        x = (x * U64(0x0101010101010101)) >> U64(56)
    return x.astype(np.int64)


_XXP1 = U64(0x9E3779B185EBCA87)
_XXP2 = U64(0xC2B2AE3D27D4EB4F)
_XXP3 = U64(0x165667B19E3779F9)
_XXP4 = U64(0x85EBCA77C2B2AE63)
_XXP5 = U64(0x27D4EB2F165667C5)


def xxhash64_long(x: np.ndarray, seed) -> np.ndarray:
    """Vectorized XXH64 of a single 8-byte (long) input — the exact
    arithmetic Spark's ``xxhash64(col)`` applies per long column
    (XxHash64.hashLong). uint64 in/out; ``seed`` may be a scalar or a
    per-element uint64 array (for chaining multi-column hashes).

    Public algorithm (Collet's xxHash, BSD); needed so Python-side
    readers (sidecar source, driver-local probes) can route keys to
    the same pid Spark's route_expr = xxhash64(key, salt) computes.
    """
    x = np.asarray(x, dtype=U64)
    seed = np.asarray(seed, dtype=U64)
    with np.errstate(over="ignore"):
        acc = seed + _XXP5 + U64(8)
        k1 = x * _XXP2
        k1 = rotl64(k1, 31)
        k1 = k1 * _XXP1
        acc = acc ^ k1
        acc = rotl64(acc, 27) * _XXP1 + _XXP4
        acc = acc ^ (acc >> U64(33))
        acc = acc * _XXP2
        acc = acc ^ (acc >> U64(29))
        acc = acc * _XXP3
        acc = acc ^ (acc >> U64(32))
    return acc


def xxhash64_int(x: np.ndarray, seed) -> np.ndarray:
    """Vectorized XXH64 of a single 4-byte (int) input — Spark's
    XxHash64.hashInt. ``x`` is masked to its low 32 bits."""
    x = np.asarray(x, dtype=U64) & U64(0xFFFFFFFF)
    seed = np.asarray(seed, dtype=U64)
    with np.errstate(over="ignore"):
        acc = seed + _XXP5 + U64(4)
        acc = acc ^ (x * _XXP1)
        acc = rotl64(acc, 23) * _XXP2 + _XXP3
        acc = acc ^ (acc >> U64(33))
        acc = acc * _XXP2
        acc = acc ^ (acc >> U64(29))
        acc = acc * _XXP3
        acc = acc ^ (acc >> U64(32))
    return acc


def spark_route(keys: np.ndarray, salt: int) -> np.ndarray:
    """Replicates ``route_expr(key, salt)`` = Spark xxhash64(key, lit(salt)):
    hashLong(key, seed=42) chained into the salt literal. A Python int
    literal within int32 range becomes IntegerType (hashInt, 4 bytes);
    otherwise LongType (hashLong). Returns uint64 (``.view(np.int64)``
    for signed comparison with Spark output)."""
    h = xxhash64_long(np.asarray(keys, dtype=U64), U64(42))
    if -(1 << 31) <= salt < (1 << 31):
        salt_arr = np.broadcast_to(U64(salt & 0xFFFFFFFF), h.shape)
        return xxhash64_int(salt_arr, h)
    salt_arr = np.broadcast_to(U64(salt & 0xFFFFFFFFFFFFFFFF), h.shape)
    return xxhash64_long(salt_arr, h)


def route_pid(keys: np.ndarray, salt: int, P: int) -> np.ndarray:
    """pid = pmod(xxhash64(key, salt), P) — identical to
    keys.partition_id(..., routing='xxhash_pmod'), in numpy."""
    r = spark_route(keys, salt).view(np.int64)
    return (r % np.int64(P)).astype(np.int32)


def sha256_key_py(content: bytes) -> int:
    """First 8 bytes (big-endian) of sha256(content) as unsigned int.

    The per-row invariant vs the reference corpus is content-sha256
    equality (BASELINE.json input_hint); this is the scalar oracle for
    the Spark-side JVM derivation in fastfilter_spark.spark.keys.
    """
    return int.from_bytes(hashlib.sha256(content).digest()[:8], "big")


def sha256_keys(contents) -> np.ndarray:
    """Vector of sha256-derived uint64 keys for an iterable of strings.

    Test/fixture helper (hashlib loop); production derivation happens
    JVM-side via sha2() so no Python touches the hot path.
    """
    out = np.empty(len(contents), dtype=U64)
    for i, c in enumerate(contents):
        if isinstance(c, str):
            c = c.encode("utf-8")
        out[i] = sha256_key_py(c)
    return out


def xxhash64_bytes(data: bytes, seed: int = 42) -> int:
    """Scalar XXH64 over a byte string — the exact arithmetic Spark's
    ``xxhash64(string_col)`` applies (XXH64.hashUnsafeBytes over the
    UTF-8 bytes, default seed 42). Returns the UNSIGNED 64-bit hash;
    ``.view``/two's-complement to compare with Spark's signed output.

    Public algorithm (Collet's xxHash, BSD). Driver-side use only
    (per-file-name fids for the skip index — replacing a Spark
    collect() job of a few thousand rows); parity with the JVM is
    pinned by test_hashing, and a drift would surface as a LOUD
    fid2name KeyError in the builder task, never silent corruption.
    """
    M = 0xFFFFFFFFFFFFFFFF
    P1, P2, P3, P4, P5 = (int(_XXP1), int(_XXP2), int(_XXP3),
                          int(_XXP4), int(_XXP5))

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def rnd(acc, lane):
        return (rotl((acc + lane * P2) & M, 31) * P1) & M

    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M,
             (seed - P1) & M]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8],
                                      "little")
                v[j] = rnd(v[j], lane)
            i += 32
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12)
             + rotl(v[3], 18)) & M
        for vj in v:
            h = ((h ^ rnd(0, vj)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i:i + 8], "little")
        k = (rotl((lane * P2) & M, 31) * P1) & M
        h = ((rotl(h ^ k, 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i:i + 4], "little")
        h = ((rotl(h ^ ((lane * P1) & M), 23) * P2) + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h
