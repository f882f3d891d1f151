"""Kernel bit-exactness (SURVEY.md §5: everything downstream depends on
these being exact)."""

import hashlib

import numpy as np
import pytest

from fastfilter_spark.core.hashing import (
    U64, SplitMix64, clz64, fingerprint64, mix_split, mulhi64, murmur64,
    popcount64, reduce32, rotl64, sha256_key_py, sha256_keys,
)

M1 = 0xFF51AFD7ED558CCD
M2 = 0xC4CEB9FE1A85EC53
MASK = (1 << 64) - 1


def _murmur64_ref(h: int) -> int:
    h ^= h >> 33
    h = (h * M1) & MASK
    h ^= h >> 33
    h = (h * M2) & MASK
    h ^= h >> 33
    return h


def test_murmur64_matches_scalar_reference():
    xs = np.array([0, 1, 42, 2**63, 2**64 - 1, 0xDEADBEEF], dtype=U64)
    got = murmur64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert g == _murmur64_ref(int(x))


def test_mix_split_wraps():
    keys = np.array([2**64 - 1], dtype=U64)
    assert mix_split(keys, 5)[0] == _murmur64_ref((2**64 - 1 + 5) & MASK)


def test_mulhi64_exact():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    b = int(rng.integers(0, 2**64, dtype=np.uint64))
    got = mulhi64(a, b)
    for ai, gi in zip(a.tolist(), got.tolist()):
        assert gi == (int(ai) * b) >> 64


def test_rotl64():
    x = np.array([0x8000000000000001], dtype=U64)
    assert rotl64(x, 1)[0] == 0x3
    assert rotl64(x, 0)[0] == 0x8000000000000001


def test_reduce32_range_and_formula():
    rng = np.random.default_rng(2)
    h = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    n = 12345
    got = reduce32(h, n)
    assert (got < n).all()
    for hi, gi in zip(h.tolist(), got.tolist()):
        assert gi == ((int(hi) & 0xFFFFFFFF) * n) >> 32


def test_fingerprint64():
    x = np.array([0x1234567890ABCDEF], dtype=U64)
    assert fingerprint64(x)[0] == (0x1234567890ABCDEF ^ (0x1234567890ABCDEF >> 32))


def test_clz64_exact():
    rng = np.random.default_rng(3)
    xs = np.concatenate([
        np.array([0, 1, 2, 2**63, 2**64 - 1], dtype=U64),
        rng.integers(0, 2**64, size=1000, dtype=np.uint64),
    ])
    got = clz64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        expect = 64 if x == 0 else 64 - int(x).bit_length()
        assert g == expect


def test_popcount64_exact():
    rng = np.random.default_rng(4)
    xs = rng.integers(0, 2**64, size=1000, dtype=np.uint64)
    got = popcount64(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert g == bin(int(x)).count("1")


def test_splitmix64_deterministic():
    a, b = SplitMix64(), SplitMix64()
    seq_a = [a.next() for _ in range(10)]
    seq_b = [b.next() for _ in range(10)]
    assert seq_a == seq_b
    assert len(set(seq_a)) == 10


def test_sha256_key():
    assert sha256_key_py(b"abc") == int.from_bytes(
        hashlib.sha256(b"abc").digest()[:8], "big")
    ks = sha256_keys(["abc", "def"])
    assert ks[0] == sha256_key_py(b"abc")
    assert ks[1] == sha256_key_py(b"def")


def test_xxhash64_bytes_parity_with_spark(spark):
    """Driver-side XXH64-over-bytes replica (skip-index fid map) must
    match Spark's xxhash64(string) bit-for-bit across every length
    regime: empty, <4, 4-7, 8-31, exactly 32, >32 (stripe loop), and
    multi-byte UTF-8."""
    from pyspark.sql import functions as F

    from fastfilter_spark.core.hashing import xxhash64_bytes

    strs = ["", "a", "abc", "1234", "1234567", "12345678",
            "file:///tmp/ffsk/data.parquet/part-00000-abc.parquet",
            "x" * 31, "y" * 32, "z" * 33, "w" * 100,
            "ünïcødé-路径/文件.parquet"]
    df = (spark.createDataFrame([(s,) for s in strs], "s string")
          .select("s", F.xxhash64("s").alias("h")))
    jvm = {r.s: r.h for r in df.collect()}
    for s in strs:
        mine = xxhash64_bytes(s.encode("utf-8"), 42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == jvm[s], s
