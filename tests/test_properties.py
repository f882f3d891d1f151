"""Hypothesis property suite over the pure-numpy core (no Spark).

Mirrors the reference's inline-`test`-block strategy (SURVEY.md §5)
but with generated inputs: arbitrary key sets (any size, any u64
values, duplicates allowed after dedupe) must build with zero false
negatives, round-trip serde byte-exactly, and stay deterministic.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastfilter_spark.core.binaryfuse import BinaryFuseFilter
from fastfilter_spark.core.bloom import BloomFilter
from fastfilter_spark.core.hashing import (
    U64, murmur64, rotl64, route_pid, xxhash64_long,
)
from fastfilter_spark.core.xor import XorFilter, XorPlusFilter
from fastfilter_spark.workerside import load_filter

key_arrays = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=400,
).map(lambda xs: np.unique(np.array(xs, dtype=U64)))


@settings(max_examples=25, deadline=None)
@given(keys=key_arrays, w=st.sampled_from([8, 16, 32]))
def test_binaryfuse_zero_fn_any_keyset(keys, w):
    f = BinaryFuseFilter.populate(keys, w, assume_unique=True)
    assert f.contains(keys).all()
    assert load_filter(f.to_bytes()).contains(keys).all()


@settings(max_examples=25, deadline=None)
@given(keys=key_arrays, w=st.sampled_from([8, 16]))
def test_xor_and_xorplus_zero_fn_any_keyset(keys, w):
    for cls in (XorFilter, XorPlusFilter):
        f = cls.populate(keys, w, assume_unique=True)
        assert f.contains(keys).all()
        rt = load_filter(f.to_bytes())
        assert rt.to_bytes() == f.to_bytes()
        assert rt.contains(keys).all()


@settings(max_examples=25, deadline=None)
@given(keys=key_arrays)
def test_bloom_zero_fn_and_or_merge(keys):
    n = max(16, len(keys))
    f = BloomFilter.empty(n, 0.01)
    f.add(keys)
    assert f.contains(keys).all()
    half = len(keys) // 2
    a = BloomFilter.empty(n, 0.01)
    a.add(keys[:half])
    b = BloomFilter.empty(n, 0.01)
    b.add(keys[half:])
    assert a.merge(b).to_bytes() == f.to_bytes()


@settings(max_examples=50, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**64 - 1),
       r=st.integers(min_value=0, max_value=63))
def test_rotl_matches_python_int(x, r):
    got = int(rotl64(np.array([x], dtype=U64), r)[0])
    want = ((x << r) | (x >> (64 - r))) & (2**64 - 1) if r else x
    assert got == want


@settings(max_examples=50, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**64 - 1))
def test_murmur64_bijective_nonzero(x):
    # splitmix finalizer is a bijection: equal outputs ⇒ equal inputs
    a = int(murmur64(np.array([x], dtype=U64))[0])
    b = int(murmur64(np.array([(x + 1) % 2**64], dtype=U64))[0])
    assert a != b


@settings(max_examples=50, deadline=None)
@given(x=st.integers(min_value=0, max_value=2**64 - 1),
       seed=st.integers(min_value=0, max_value=2**64 - 1))
def test_xxhash64_long_scalar_reference(x, seed):
    M = 2**64 - 1
    P1, P2 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F
    P3, P4, P5 = 0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5
    h = (seed + P5 + 8) & M
    k1 = (x * P2) & M
    k1 = ((k1 << 31) | (k1 >> 33)) & M
    k1 = (k1 * P1) & M
    h ^= k1
    h = ((((h << 27) | (h >> 37)) & M) * P1 + P4) & M
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    got = int(xxhash64_long(np.array([x], dtype=U64), U64(seed))[0])
    assert got == h


@settings(max_examples=25, deadline=None)
@given(keys=key_arrays, salt=st.integers(min_value=-2**31, max_value=2**31 - 1),
       p=st.integers(min_value=1, max_value=64))
def test_route_pid_in_range_and_deterministic(keys, salt, p):
    if len(keys) == 0:
        return
    pids = route_pid(keys, salt, p)
    assert ((pids >= 0) & (pids < p)).all()
    assert (pids == route_pid(keys, salt, p)).all()


# ---------------------------------------------------------------------------
# r3: simhash segment-reduce kernel + pure-numpy media codecs
# ---------------------------------------------------------------------------

doc_lists = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.integers(min_value=-2**63, max_value=2**63 - 1),
                 min_size=0, max_size=30),
    ),
    min_size=0, max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(docs=doc_lists)
def test_simhash_segments_matches_per_doc_reference(docs):
    """The flattened segment-reduce kernel is bit-identical to the
    per-doc majority-vote definition for ANY doc structure — including
    empty docs, null docs, and either at the batch boundary (the
    trailing-empty clamp bug class)."""
    from fastfilter_spark.pipeline.dedup import _simhash_segments

    bitw = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    exp = np.zeros(len(docs), dtype=np.int64)
    for i, hs in enumerate(docs):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.int64).view(np.uint64)
        score = ((h[:, None] & bitw[None, :]) != 0).sum(axis=0) * 2 - len(h)
        exp[i] = np.int64((bitw[score > 0]).sum(dtype=np.uint64)
                          .astype(np.uint64).view(np.int64))

    lens = np.array([0 if d is None else len(d) for d in docs],
                    dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    flat = (np.concatenate(
        [np.asarray(d, dtype=np.int64) for d in docs
         if d is not None and len(d)])
        if lens.sum() else np.empty(0, np.int64))
    valid = np.array([d is not None for d in docs], dtype=bool)
    got = _simhash_segments(flat, offs, valid)
    assert np.array_equal(got, exp)


@settings(max_examples=40, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12), seed=st.integers(0, 2**31))
def test_bmp_roundtrip_any_dims(h, w, seed):
    from fastfilter_spark.pipeline import decode_bmp, encode_bmp
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(0, 500), rate=st.sampled_from([8000, 16000, 44100]),
       seed=st.integers(0, 2**31))
def test_wav_roundtrip_any_length(n, rate, seed):
    from fastfilter_spark.pipeline import decode_wav, encode_wav
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n, dtype=np.int16)
    r, back = decode_wav(encode_wav(s, rate))
    assert r == rate and np.array_equal(back, s)


@settings(max_examples=40, deadline=None)
@given(n=st.integers(1, 9), h=st.integers(1, 10), w=st.integers(1, 10),
       fps=st.sampled_from([1, 4, 30]), seed=st.integers(0, 2**31))
def test_avi_roundtrip_any_dims(n, h, w, fps, seed):
    from fastfilter_spark.pipeline import decode_avi, encode_avi
    rng = np.random.default_rng(seed)
    fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_avi(encode_avi(fr, fps=fps)), fr)


@settings(max_examples=60, deadline=None)
@given(pos=st.integers(0, 1 << 30), val=st.integers(0, 255),
       trunc=st.integers(0, 1 << 30), seed=st.integers(0, 2**31))
def test_avi_decode_mutation_never_crashes(pos, val, trunc, seed):
    """A flipped byte / truncated tail must either decode (pixel-area
    mutations are format-valid) or raise ValueError — never any other
    exception type: extract_features/frame_sample rely on that contract
    for per-row corruption isolation."""
    from fastfilter_spark.pipeline import decode_avi, encode_avi
    rng = np.random.default_rng(seed)
    buf = bytearray(encode_avi(
        rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)))
    buf[pos % len(buf)] = val
    payload = bytes(buf[:len(buf) - trunc % len(buf)])
    try:
        decode_avi(payload)
    except ValueError:
        pass


@given(keys=key_arrays, w=st.sampled_from([8, 16]),
       data=st.data())
def test_cuckoo_insert_delete_survivors_zero_fn(keys, w, data):
    """Cuckoo contract under any keyset: after deleting a subset of the
    INSERTED keys (each exactly once), every survivor is still
    contained — deletes never strip a survivor's fingerprint."""
    from fastfilter_spark.core.cuckoo import CuckooFilter

    ks = np.unique(np.asarray(keys, dtype=np.uint64))
    cf = CuckooFilter.populate(ks, w, rng_state=7, assume_unique=True)
    assert cf.contains(ks).all()
    if len(ks) == 0:
        return
    n_del = data.draw(st.integers(0, len(ks)))
    victims = ks[:n_del]
    assert cf.delete(victims) == n_del
    survivors = ks[n_del:]
    assert cf.contains(survivors).all()


@given(n=st.integers(1, 6), h=st.integers(1, 10), w=st.integers(1, 10),
       seed=st.integers(0, 2**31))
def test_avi_roundtrip_any_dims(n, h, w, seed):
    """encode_avi → decode_avi is identity for any (frames, h, w)."""
    from fastfilter_spark.pipeline.multimodal import decode_avi, encode_avi

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
    out = decode_avi(encode_avi(frames, fps=7))
    assert out.shape == frames.shape
    assert np.array_equal(out, frames)


@given(keys=key_arrays, data=st.data())
def test_sketch_merge_associativity_any_split(keys, data):
    """north_rule merge associativity, randomized: folding the keyset
    through ANY partitioning and merge grouping yields byte-identical
    HLL/CMS blobs (register max / counter addition are exactly
    associative+commutative) and identical theta estimates."""
    from fastfilter_spark.sketches import (CountMinSketch, HyperLogLog,
                                           ThetaSketch)

    ks = np.asarray(keys, dtype=np.uint64)
    cut1 = data.draw(st.integers(0, len(ks)))
    cut2 = data.draw(st.integers(0, len(ks)))
    lo, hi = min(cut1, cut2), max(cut1, cut2)
    parts = [ks[:lo], ks[lo:hi], ks[hi:]]

    def fold(mk, merge_order):
        sks = []
        for p in parts:
            s = mk()
            s.add(p)
            sks.append(s)
        a, b, c = (sks[i] for i in merge_order)
        m = a.merge(b) if hasattr(a, "merge") else a.union(b)
        return m.merge(c) if hasattr(m, "merge") else m.union(c)

    direct_h = HyperLogLog(10); direct_h.add(ks)
    assert fold(lambda: HyperLogLog(10), (0, 1, 2)).to_bytes() \
        == fold(lambda: HyperLogLog(10), (2, 0, 1)).to_bytes() \
        == direct_h.to_bytes()
    direct_c = CountMinSketch(1e-2, 0.05); direct_c.add(ks)
    assert fold(lambda: CountMinSketch(1e-2, 0.05), (0, 1, 2)).to_bytes() \
        == fold(lambda: CountMinSketch(1e-2, 0.05), (1, 2, 0)).to_bytes() \
        == direct_c.to_bytes()
    direct_t = ThetaSketch(256); direct_t.add(ks)
    assert fold(lambda: ThetaSketch(256), (0, 1, 2)).estimate() \
        == fold(lambda: ThetaSketch(256), (2, 1, 0)).estimate() \
        == direct_t.estimate()
