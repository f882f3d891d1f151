"""Executor-side kernels — deliberately light import graph.

Everything a pandas UDF closure references gets its defining module
imported inside every Python worker process. This module therefore
imports ONLY numpy/pandas + the pure-numpy core (no pyspark), so the
32-worker first-use import cost stays milliseconds, not seconds —
measured 6s+ of the cold `contains` path before this split.
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from .core import serde
from .core.binaryfuse import BinaryFuseFilter
from .core.bloom import BloomFilter
from .core.hashing import U64, murmur64
from .core.xor import XorFilter, XorPlusFilter

_LOADERS = {
    serde.KIND_BINARY_FUSE: BinaryFuseFilter.from_bytes,
    serde.KIND_XOR: XorFilter.from_bytes,
    serde.KIND_XOR_PLUS: XorPlusFilter.from_bytes,
    serde.KIND_BLOOM: BloomFilter.from_bytes,
}

_BUILDERS = {
    "bf8": lambda k, r: BinaryFuseFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "bf16": lambda k, r: BinaryFuseFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "bf32": lambda k, r: BinaryFuseFilter.populate(k, 32, rng_state=r, assume_unique=True),
    "xor8": lambda k, r: XorFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "xor16": lambda k, r: XorFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "xorplus8": lambda k, r: XorPlusFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "xorplus16": lambda k, r: XorPlusFilter.populate(k, 16, rng_state=r, assume_unique=True),
}


def load_filter(blob: bytes):
    import struct
    _, kind, _ = struct.unpack_from("<HHI", blob, 4)  # peek FFSK header
    return _LOADERS[kind](blob)


def pd_to_u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)


def part_rng_state(base: int, pid: int) -> int:
    x = np.asarray([(base ^ (pid * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF],
                   dtype=U64)
    return int(murmur64(x)[0])


def bloom_builder(n_expected_per_part: int, fpp: float):
    def build(keys: np.ndarray, rng_state: int) -> BloomFilter:
        bf = BloomFilter.empty(n_expected_per_part, fpp)
        bf.add(keys)
        return bf
    return build


def build_partition_arrow(tbl: "pa.Table", kind: str, base_rng_state: int,
                          bloom_args=None) -> "pa.Table":
    """Partition builder body (runs under groupBy(pid).applyInArrow —
    measured ~3× faster end-to-end than applyInPandas at 10M keys:
    the key column transfers as one Arrow buffer, viewed zero-copy).

    Dedupes in-partition (all copies of a key hash to the same pid, so
    np.unique here is a *global* dedupe — saves the upstream exchange).
    """
    pid = int(tbl.column("pid")[0].as_py())
    raw = tbl.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
    keys = np.unique(raw)
    t0 = time.time()
    if kind == "bloom":
        build = bloom_builder(*bloom_args)
    else:
        build = _BUILDERS[kind]
    filt = build(keys, part_rng_state(base_rng_state, pid))
    dt = time.time() - t0
    return pa.table({
        "pid": pa.array([pid], pa.int32()),
        "kind": pa.array([kind], pa.string()),
        "blob": pa.array([filt.to_bytes()], pa.binary()),
        "n_keys": pa.array([int(keys.size)], pa.int64()),
        "keys_ingested": pa.array([int(raw.size)], pa.int64()),
        "attempts": pa.array([int(getattr(filt, "attempts", 1))], pa.int32()),
        "peel_rounds": pa.array([int(getattr(filt, "peel_rounds", 0))], pa.int32()),
        "build_secs": pa.array([dt], pa.float64()),
        "bits_per_entry": pa.array([float(filt.bits_per_entry())], pa.float64()),
    })


_FILTER_CACHE: Dict[str, List] = {}


def contains_kernel(bc_value, key: pd.Series, pid: pd.Series) -> pd.Series:
    token, blobs = bc_value
    filters = _FILTER_CACHE.get(token)
    if filters is None:
        filters = [load_filter(b) for b in blobs]
        _FILTER_CACHE[token] = filters
        while len(_FILTER_CACHE) > 8:  # bound worker memory
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
    keys = pd_to_u64(key)
    pids = pid.to_numpy(dtype=np.int32, na_value=0)
    out = np.zeros(len(keys), dtype=bool)
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    bounds = np.searchsorted(sorted_pids, np.arange(len(filters) + 1))
    for p in range(len(filters)):
        lo, hi = bounds[p], bounds[p + 1]
        if hi > lo:
            idx = order[lo:hi]
            out[idx] = filters[p].contains(keys[idx])
    return pd.Series(out)
