"""Executor-side kernels — deliberately light import graph.

Everything a pandas UDF closure references gets its defining module
imported inside every Python worker process. This module therefore
imports ONLY numpy/pandas/pyarrow + the pure-numpy core at module
level — no pyspark, so the 32-worker first-use import cost stays
milliseconds, not seconds (measured 6s+ of the cold `contains` path
before this split). One documented exception: build_partitions_map
does a FUNCTION-LEVEL `from pyspark import TaskContext`, which
resolves against the already-loaded worker runtime at call time and
costs nothing at import time.
"""

from __future__ import annotations

import time
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa

from .core import serde
from .core.binaryfuse import BinaryFuseFilter
from .core.cuckoo import CuckooFilter
from .core.blockedbloom import BlockedBloomFilter
from .core.bloom import BloomFilter
from .core.fuse import FuseFilter
from .core.hashing import U64, murmur64
from .core.xor import XorFilter, XorPlusFilter

_LOADERS = {
    serde.KIND_BINARY_FUSE: BinaryFuseFilter.from_bytes,
    serde.KIND_FUSE: FuseFilter.from_bytes,
    serde.KIND_XOR: XorFilter.from_bytes,
    serde.KIND_XOR_PLUS: XorPlusFilter.from_bytes,
    serde.KIND_BLOOM: BloomFilter.from_bytes,
    serde.KIND_BLOCKED_BLOOM: BlockedBloomFilter.from_bytes,
    serde.KIND_CUCKOO: CuckooFilter.from_bytes,
}

# OR-mergeable kinds whose geometry derives from (n_expected, fpp)
# rather than the exact key set; they share the bloom_args plumbing
BLOOM_KINDS = ("bloom", "blockedbloom")

_BUILDERS = {
    "bf8": lambda k, r: BinaryFuseFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "bf16": lambda k, r: BinaryFuseFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "bf32": lambda k, r: BinaryFuseFilter.populate(k, 32, rng_state=r, assume_unique=True),
    "xor8": lambda k, r: XorFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "xor16": lambda k, r: XorFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "xorplus8": lambda k, r: XorPlusFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "xorplus16": lambda k, r: XorPlusFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "fuse8": lambda k, r: FuseFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "fuse16": lambda k, r: FuseFilter.populate(k, 16, rng_state=r, assume_unique=True),
    "cuckoo8": lambda k, r: CuckooFilter.populate(k, 8, rng_state=r, assume_unique=True),
    "cuckoo16": lambda k, r: CuckooFilter.populate(k, 16, rng_state=r, assume_unique=True),
}


def load_filter(blob: bytes):
    import struct
    _, kind, _ = struct.unpack_from("<HHI", blob, 4)  # peek FFSK header
    return _LOADERS[kind](blob)


def pd_to_u64(s: pd.Series) -> np.ndarray:
    """int64 pandas Series → uint64 view (NULLs → 0; callers mask).

    GUARD: an int64 column that contains ANY NULL arrives from Arrow as
    float64+NaN, and every NON-NULL value above 2^53 has already lost
    low bits in that conversion — silently probing/folding those keys
    yields false negatives on true members (zero-FN violation). Keys
    here are hash-derived (uniform 64-bit), so magnitudes >2^53 are the
    norm. When the float values happen to all be exactly representable
    the conversion is provably lossless and we proceed; otherwise fail
    LOUD with the JVM-side fix (filter/coalesce NULLs before the UDF —
    every in-repo call site does; this guard is for user-composed
    probes, e.g. raw SQL over a null-able key column)."""
    if not pd.api.types.is_integer_dtype(s.dtype):
        vals = s.to_numpy(dtype=np.float64, na_value=0.0)
        if (np.abs(vals).max(initial=0.0) <= float(1 << 53)
                and np.array_equal(vals, np.trunc(vals))):
            return vals.astype(np.int64).view(np.uint64)
        if not np.array_equal(vals, np.trunc(vals)):
            raise TypeError(
                "pd_to_u64: received genuinely fractional DOUBLE keys — "
                "membership keys must be integers (astype would floor "
                "toward zero and answer for the wrong key). Cast or "
                "derive an integral key column before probing.")
        raise TypeError(
            "pd_to_u64: received a float batch with values beyond 2^53 "
            "— an int64 key column with NULLs was degraded to float64 "
            "at the Arrow boundary and large keys have already lost "
            "bits (silent false negatives). Filter or coalesce NULL "
            "keys JVM-side before the UDF (e.g. "
            "WHERE key IS NOT NULL, or coalesce(key, 0) with an "
            "IS NOT NULL mask on the result).")
    return s.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)


def part_rng_state(base: int, pid: int) -> int:
    x = np.asarray([(base ^ (pid * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF],
                   dtype=U64)
    return int(murmur64(x)[0])


def bloom_builder(kind, *args):
    """bloom_args is either (n_expected_per_part, fpp) — geometry derived
    — or ("exact", m_bits, k, seed) — geometry copied verbatim from an
    existing blob so incremental rebuilds stay OR-merge-compatible.
    ``kind`` picks the class: "bloom" (unblocked) or "blockedbloom"
    (one-cache-line probes); both share the ctor/empty signatures."""
    cls = BlockedBloomFilter if kind == "blockedbloom" else BloomFilter
    if args and args[0] == "exact":
        _, m_bits, k, seed = args

        def build(keys: np.ndarray, rng_state: int):
            bf = cls(m_bits, k, seed, np.zeros(m_bits // 64, dtype=U64), 0)
            bf.add(keys)
            return bf
        return build
    n_expected_per_part, fpp = args

    def build(keys: np.ndarray, rng_state: int):
        bf = cls.empty(n_expected_per_part, fpp)
        bf.add(keys)
        return bf
    return build


def _group_slices(groups: np.ndarray, payload: np.ndarray):
    """(group_value, payload_slice) pairs via ONE stable sort — the
    shared group-split idiom of pack_by_pid / build_routed_map /
    build_file_blobs_scan (was copy-pasted three times; r6 review)."""
    order = np.argsort(groups, kind="stable")
    sg = groups[order]
    sp = payload[order]
    present = np.unique(sg)
    bounds = np.searchsorted(sg, present)
    bounds = np.append(bounds, len(sg))
    for i, g in enumerate(present):
        yield g, sp[bounds[i]:bounds[i + 1]]


def pack_by_pid(batches, P: int):
    """Stage 1 of the pack-shuffle build (mapInArrow over raw input).

    Buckets this input partition's keys by pid = pmod(route, P) in
    numpy and emits ONE fat binary row per (input partition, pid):
    the shuffle then moves ~M·P chunk rows instead of n key rows —
    row-shuffle overhead was ~60% of build wall-time even at 2 cores.
    Matches the JVM query-routing expression pmod(xxhash64(key,salt),P)
    (numpy signed % has the same non-negative semantics as Spark pmod).
    """
    accum: Dict[int, List[np.ndarray]] = {}
    for b in batches:
        k = b.column("key").to_numpy(zero_copy_only=False)
        r = b.column("route").to_numpy(zero_copy_only=False)
        pid = np.mod(r, P)
        for p, sk in _group_slices(pid, k):
            accum.setdefault(int(p), []).append(sk)
    if not accum:
        return
    pids = sorted(accum)
    chunks = [np.concatenate(accum[p]).tobytes() for p in pids]
    yield pa.RecordBatch.from_arrays(
        [pa.array(pids, pa.int32()), pa.array(chunks, pa.binary())],
        names=["pid", "chunk"])


def build_from_chunks(tbl: "pa.Table", kind: str, base_rng_state: int,
                      bloom_args=None) -> "pa.Table":
    """Stage 2: groupBy(pid).applyInArrow over packed chunks."""
    pid = int(tbl.column("pid")[0].as_py())
    raw = np.concatenate([
        np.frombuffer(c.as_py(), dtype=np.int64)
        for c in tbl.column("chunk")
    ]).view(np.uint64)
    batch = _build_one(pid, raw, kind, base_rng_state, bloom_args)
    return pa.Table.from_batches([batch])


def build_partitions_map(batches, kind: str, base_rng_state: int,
                         bloom_args=None):
    """Partition builder body for repartition(P, route).mapInArrow —
    sort-free: unlike groupBy().applyIn*, the exchange does no
    within-partition grouping sort, and the partition index IS the pid
    (Spark HashPartitioning == pmod(hash(route), P), mirrored JVM-side
    by keys.partition_id for query routing).

    TaskContext is part of the worker runtime, so this import adds no
    executor cold-start cost (pyspark.sql is what must stay out).
    """
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    chunks = [b.column("key").to_numpy(zero_copy_only=False)
              for b in batches]
    if not chunks:
        return
    raw = np.concatenate(chunks).view(np.uint64)
    yield _build_one(pid, raw, kind, base_rng_state, bloom_args)


def build_routed_map(batches, kind: str, salt: int, P: int,
                     base_rng_state: int, bloom_args=None):
    """Partition builder for the bare-key packed exchange
    (repartition(B, pmod(route, P)).mapInArrow): the exchange moves
    ONLY the 8-byte key (the routed-probe lesson — shipping a
    precomputed pid/route column doubles the shuffled bytes), the
    worker recomputes pid = pmod(xxhash64(key, salt), P) with the
    bit-exact numpy replica (core.hashing.route_pid) and builds one
    blob per pid present in the task. Co-location is guaranteed by the
    exchange keying on the SAME pid expression JVM-side.

    Replaces the two-Python-pass chunk-pack shuffle as the default
    "packed" physical plan: the pack pass cost a full extra JVM->Python
    round trip of every key (measured 1.69 s of a 2.55 s 1e7/P=32
    build; the bare-key JVM exchange itself is 0.54 s). Blobs are
    byte-identical — same per-pid key sets, same per-pid RNG seeds.
    """
    from .core.hashing import route_pid

    chunks = [b.column("key").to_numpy(zero_copy_only=False)
              for b in batches]
    if not chunks:
        return
    raw = np.concatenate(chunks).view(U64)
    pids = route_pid(raw, salt, P)
    for p, sk in _group_slices(pids, raw):
        yield _build_one(int(p), sk, kind, base_rng_state, bloom_args)


def build_partition_arrow(tbl: "pa.Table", kind: str, base_rng_state: int,
                          bloom_args=None) -> "pa.Table":
    """groupBy(pid).applyInArrow variant (kept for the incremental
    add_keys path, where only a few pids rebuild)."""
    pid = int(tbl.column("pid")[0].as_py())
    raw = tbl.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
    batch = _build_one(pid, raw, kind, base_rng_state, bloom_args)
    return pa.Table.from_batches([batch])


def _build_one(pid: int, raw: np.ndarray, kind: str, base_rng_state: int,
               bloom_args=None) -> "pa.RecordBatch":
    """Dedupes in-partition (all copies of a key hash to the same pid,
    so np.unique here is a *global* dedupe — no upstream exchange) and
    builds one filter blob + its lineage/metrics row."""
    keys = np.unique(raw)
    t0 = time.time()
    if kind in BLOOM_KINDS:
        build = bloom_builder(kind, *bloom_args)
    else:
        build = _BUILDERS[kind]
    filt = build(keys, part_rng_state(base_rng_state, pid))
    dt = time.time() - t0
    return pa.RecordBatch.from_arrays([
        pa.array([pid], pa.int32()),
        pa.array([kind], pa.string()),
        pa.array([filt.to_bytes()], pa.binary()),
        pa.array([int(keys.size)], pa.int64()),
        pa.array([int(raw.size)], pa.int64()),
        pa.array([int(getattr(filt, "attempts", 1))], pa.int32()),
        pa.array([int(getattr(filt, "peel_rounds", 0))], pa.int32()),
        pa.array([dt], pa.float64()),
        pa.array([float(filt.bits_per_entry())], pa.float64()),
    ], names=["pid", "kind", "blob", "n_keys", "keys_ingested", "attempts",
              "peel_rounds", "build_secs", "bits_per_entry"])


def contains_routed(blobs, salt: int, P: int, keys: np.ndarray) -> np.ndarray:
    """Pure-numpy routed membership: pid = pmod(xxhash64(key, salt), P)
    (bit-exact Spark replica), each key probes only its own blob —
    production FPP with no JVM. Used by contains_local and the
    ffsk_membership data source."""
    from .core.hashing import route_pid
    keys = np.asarray(keys, dtype=np.uint64)
    pids = route_pid(keys, salt, P)
    out = np.zeros(keys.shape, dtype=bool)
    order = np.argsort(pids, kind="stable")
    bounds = np.searchsorted(pids[order], np.arange(P + 1))
    loaded: Dict[int, object] = {}
    for p in range(P):
        lo, hi = bounds[p], bounds[p + 1]
        if hi > lo:
            f = loaded.get(p)
            if f is None:
                # executor-written sidecars omit zero-key pids (their
                # slot is b""): that pid's set is empty → non-member
                # (read_filter_sidecar synthesizes the same semantics)
                f = loaded[p] = (load_filter(blobs[p]) if blobs[p]
                                 else False)
            if f is not False:
                idx = order[lo:hi]
                out[idx] = f.contains(keys[idx])
    return out


def group_rng_state(base: int, gkey: str) -> int:
    """Deterministic per-group RNG seed: depends only on (base, group
    values), so grouped builds are reproducible regardless of task
    placement — the same property part_rng_state gives pids."""
    import hashlib
    h = int.from_bytes(hashlib.sha256(gkey.encode("utf-8")).digest()[:8],
                       "little")
    return part_rng_state(base, h)


def build_group_arrow(tbl: "pa.Table", kind: str, base_rng_state: int,
                      bloom_args=None) -> "pa.Table":
    """groupBy(gkey).applyInArrow body: one filter blob per group key.
    Same in-partition np.unique global dedupe as the pid builders (all
    copies of a (group, key) pair land in the same group task)."""
    gkey = tbl.column("gkey")[0].as_py()
    raw = tbl.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
    keys = np.unique(raw)
    t0 = time.time()
    build = (bloom_builder(kind, *bloom_args) if kind in BLOOM_KINDS
             else _BUILDERS[kind])
    filt = build(keys, group_rng_state(base_rng_state, gkey))
    dt = time.time() - t0
    batch = pa.RecordBatch.from_arrays([
        pa.array([gkey], pa.string()),
        pa.array([kind], pa.string()),
        pa.array([filt.to_bytes()], pa.binary()),
        pa.array([int(keys.size)], pa.int64()),
        pa.array([int(raw.size)], pa.int64()),
        pa.array([int(getattr(filt, "attempts", 1))], pa.int32()),
        pa.array([int(getattr(filt, "peel_rounds", 0))], pa.int32()),
        pa.array([dt], pa.float64()),
        pa.array([float(filt.bits_per_entry())], pa.float64()),
    ], names=["gkey", "kind", "blob", "n_keys", "keys_ingested", "attempts",
              "peel_rounds", "build_secs", "bits_per_entry"])
    return pa.Table.from_batches([batch])


def build_file_blob(tbl: "pa.Table", kind: str, base_rng_state: int,
                    fid2name: Dict[int, str]) -> "pa.Table":
    """groupBy(fid).applyInArrow body for the per-file skip index
    (skipindex._INDEX_SCHEMA): one filter blob per FILE. Same
    np.unique in-task dedupe as build_group_arrow; the RNG seed
    derives from the file NAME, so blobs are independent of the
    8-byte-fid grouping scheme that keeps the shuffle thin."""
    fid = tbl.column("fid")[0].as_py()
    name = fid2name[fid]   # KeyError = loud task failure, by design
    raw = tbl.column("key").to_numpy(zero_copy_only=False).view(np.uint64)
    keys = np.unique(raw)
    filt = _BUILDERS[kind](keys, group_rng_state(base_rng_state, name))
    return pa.Table.from_arrays([
        pa.array([name], pa.string()),
        pa.array([kind], pa.string()),
        pa.array([filt.to_bytes()], pa.binary()),
        pa.array([int(keys.size)], pa.int64()),
        pa.array([int(raw.size)], pa.int64()),
        pa.array([float(filt.bits_per_entry())], pa.float64()),
    ], names=["file", "kind", "blob", "n_keys", "keys_ingested",
              "bits_per_entry"])


def build_file_blobs_scan(batches, kind: str, base_rng_state: int,
                          fid2name: Dict[int, str]):
    """Zero-shuffle skip-index builder: mapInArrow body running INSIDE
    the scan stage (no groupBy exchange). Valid only when no input
    file is split across tasks — the caller proves task-atomicity from
    the file listing before choosing this path; then every file's rows
    are contiguous within exactly one task and per-file accumulation
    across the task's batches is a complete group. Blobs are
    byte-identical to the grouped path's (seeds derive from the file
    NAME, independent of grouping). The shuffle this removes moved
    16 B/row (fid + key) for every corpus row."""
    accum: Dict[int, List[np.ndarray]] = {}
    for b in batches:
        fids = b.column("fid").to_numpy(zero_copy_only=False)
        keys = b.column("key").to_numpy(zero_copy_only=False)
        for f, sk in _group_slices(fids, keys):
            accum.setdefault(int(f), []).append(sk)
    for fid, chunks in accum.items():
        name = fid2name[fid]   # KeyError = loud task failure, by design
        raw = np.concatenate(chunks).view(U64)
        keys = np.unique(raw)
        filt = _BUILDERS[kind](keys, group_rng_state(base_rng_state, name))
        yield pa.RecordBatch.from_arrays([
            pa.array([name], pa.string()),
            pa.array([kind], pa.string()),
            pa.array([filt.to_bytes()], pa.binary()),
            pa.array([int(keys.size)], pa.int64()),
            pa.array([int(raw.size)], pa.int64()),
            pa.array([float(filt.bits_per_entry())], pa.float64()),
        ], names=["file", "kind", "blob", "n_keys", "keys_ingested",
                  "bits_per_entry"])


def match_skip_blobs(it, probe_bytes: bytes):
    """mapInArrow body for skip-index pruning: yield the names of the
    blobs matching ≥1 broadcast probe key (vectorized contains per
    blob — ~1e9 probes/s-core at point-lookup sizes)."""
    probe = np.frombuffer(probe_bytes, dtype=np.uint64)
    for tbl in it:
        hits = [name for name, blob
                in zip(tbl.column("file").to_pylist(),
                       tbl.column("blob").to_pylist())
                if bool(load_filter(bytes(blob)).contains(probe).any())]
        yield pa.RecordBatch.from_arrays(
            [pa.array(hits, pa.string())], names=["file"])


def contains_grouped_kernel(bc_value, key: pd.Series,
                            gkey: pd.Series) -> pd.Series:
    """Vectorized per-group membership: factorize the batch's group
    column, one numpy contains() per distinct group present. A group
    with no filter (unseen at build time) yields all-False — 'key in
    empty set'."""
    token, blob_map = bc_value
    cache = _FILTER_CACHE.get(token)
    if cache is None:
        cache = {}
        _FILTER_CACHE[token] = cache
        while len(_FILTER_CACHE) > 8:
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
    keys = pd_to_u64(key)
    out = np.zeros(len(keys), dtype=bool)
    codes, uniques = pd.factorize(gkey, use_na_sentinel=True)
    for ci, g in enumerate(uniques):
        filt = cache.get(g)
        if filt is None and g not in cache:
            blob = blob_map.get(g)
            filt = load_filter(blob) if blob is not None else None
            cache[g] = filt
        if filt is None:
            continue
        mask = codes == ci
        out[mask] = filt.contains(keys[mask])
    # NULL keys are not members (the grouped build drops them) — same
    # mask as contains_kernel; belt-and-braces behind the caller's
    # JVM-side isNotNull guard
    na = key.isna().to_numpy()
    if na.any():
        out[na] = False
    return pd.Series(out)


def sidecar_cache_token(sidecar_path: str) -> tuple:
    """Cache key for a sidecar generation: the manifest's (mtime_ns,
    size, inode). A filter REBUILT at the same path changes at least one
    of them, so a long-lived worker never answers from stale blobs (the
    1 s resolution of plain mtime could miss a same-tick rebuild).
    Single source of truth — also used by sources/membership_source."""
    import os
    st = os.stat(os.path.join(sidecar_path, "filter_manifest.json"))
    return (sidecar_path, st.st_mtime_ns, st.st_size, st.st_ino)


def _probe_sidecar_batch(b, key_name: str, salt: int, P: int, filter_for):
    """Shared per-batch probe body for both sidecar query paths: routes
    keys with the bit-exact numpy replica of the JVM route expression
    and appends a `contained` column. ``filter_for(pid)`` returns a
    loaded filter or a falsy value for a pid with no blob (zero keys ⇒
    definite non-member)."""
    from .core.hashing import route_pid

    kcol = b.column(key_name)
    # NULL-safe: to_numpy on an int64 column WITH nulls yields float64
    # (+NaN), and .view(uint64) would then reinterpret float bit
    # patterns — corrupting EVERY key in the batch (false negatives).
    # fill_null keeps the column int64; null rows are masked afterwards.
    null_mask = (kcol.is_null().to_numpy(zero_copy_only=False)
                 if kcol.null_count else None)
    if null_mask is not None:
        kcol = kcol.fill_null(0)
    keys = kcol.to_numpy(zero_copy_only=False).view(np.uint64)
    pids = route_pid(keys, salt, P)
    out = np.zeros(len(keys), dtype=bool)
    for pid in np.unique(pids):
        filt = filter_for(int(pid))
        if filt:
            m = pids == pid
            out[m] = filt.contains(keys[m])
    if null_mask is not None:
        out[null_mask] = False
    return pa.RecordBatch.from_arrays(
        list(b.columns) + [pa.array(out, pa.bool_())],
        names=b.schema.names + ["contained"])


_SIDECAR_ROUTE_CACHE: Dict[tuple, Dict] = {}
_ROUTE_LRU_BYTES = 48 << 20   # cross-task blob reuse budget per process


def contains_sidecar_route(batches, sidecar_path: str, P: int, salt: int,
                           key_name: str = "key"):
    """Probe-side routed lookup for large P (mapInArrow after
    repartition on the pid expression): a task deserializes ONLY the
    blobs of the pids routed to it (~P/num_tasks of them) by reading
    them from the sidecar parquet — per-worker memory is a few blobs
    instead of all P (broadcast-all was >100 MB/worker at P=256).
    Emits the input rows + a `contained` column.

    The pid is recomputed worker-side from the key (route_pid is the
    bit-exact numpy replica of the JVM route expression) — shipping a
    precomputed __route column through the exchange doubled the
    shuffled bytes of a bare-key probe for nothing.

    Caching (r6, revised after review): the pyarrow dataset handle
    (file listing + schema) is cached per PROCESS keyed by the sidecar
    generation token — a rebuild at the same path changes the token
    and is never answered stale. Loaded filters live in a per-TASK
    dict (a task touches each of its pids once no matter how many
    batches it gets — never thrashes, freed with the task, the pre-r6
    memory shape) PLUS a small per-process LRU bounded by BLOB BYTES
    (not pid count) for cross-task/repeat-probe reuse: for big-blob
    sidecars the budget admits only a few blobs, so the per-worker
    O(few blobs) contract holds at the 1e9+ tier where an unbounded
    process cache would re-accumulate the broadcast-all footprint.
    """
    import os
    import pyarrow.dataset as pads

    token = sidecar_cache_token(sidecar_path)
    state = _SIDECAR_ROUTE_CACHE.get(token)
    if state is None:
        path = os.path.join(sidecar_path, "partials.parquet")
        # list files + open footers ONCE per process per generation —
        # per-pid loads then prune to one row group via parquet stats
        # (pq.read_table(filters=...) per pid re-listed the whole
        # directory: O(files) metadata work per pid)
        state = {"ds": pads.dataset(path, format="parquet"),
                 "lru": {}, "lru_bytes": 0}
        _SIDECAR_ROUTE_CACHE[token] = state
        while len(_SIDECAR_ROUTE_CACHE) > 2:
            _SIDECAR_ROUTE_CACHE.pop(next(iter(_SIDECAR_ROUTE_CACHE)))
    ds = state["ds"]
    task_cache: Dict[int, object] = {}

    def _filter_for(pid: int):
        f = task_cache.get(pid)
        if f is not None:
            return f
        hit = state["lru"].get(pid)
        if hit is not None:
            f, _nb = hit
            task_cache[pid] = f
            return f
        tbl = ds.to_table(columns=["pid", "blob"],
                          filter=pads.field("pid") == pid)
        if tbl.num_rows:
            blob = tbl.column("blob")[0].as_py()
            f, nb = load_filter(blob), len(blob)
        else:
            f, nb = False, 64
        task_cache[pid] = f
        state["lru"][pid] = (f, nb)
        state["lru_bytes"] += nb
        while state["lru_bytes"] > _ROUTE_LRU_BYTES and state["lru"]:
            _p, (_f, _nb) = next(iter(state["lru"].items()))
            del state["lru"][_p]
            state["lru_bytes"] -= _nb
        return f

    for b in batches:
        yield _probe_sidecar_batch(b, key_name, salt, P, _filter_for)


_SIDECAR_FILTERS: Dict[tuple, List] = {}


def _sidecar_filters(sidecar_path: str, P: int) -> List:
    """Per-PROCESS cache of a whole sidecar's deserialized filters.

    Python workers are reused across tasks, so each worker process pays
    the parquet read + deserialize once per sidecar generation, not once
    per task. Keyed by ``sidecar_cache_token`` — a rebuild at the same
    path is never answered from stale blobs."""
    import os

    import pyarrow.parquet as pq

    ckey = sidecar_cache_token(sidecar_path)
    filters = _SIDECAR_FILTERS.get(ckey)
    if filters is None:
        tbl = pq.read_table(os.path.join(sidecar_path, "partials.parquet"),
                            columns=["pid", "blob"], memory_map=True)
        filters = [None] * P            # missing pid ⇒ zero keys ⇒ False
        for pid, blob in zip(tbl.column("pid").to_pylist(),
                             tbl.column("blob").to_pylist()):
            filters[int(pid)] = load_filter(blob)
        _SIDECAR_FILTERS[ckey] = filters
        while len(_SIDECAR_FILTERS) > 2:    # bound worker memory
            _SIDECAR_FILTERS.pop(next(iter(_SIDECAR_FILTERS)))
    return filters


_SIDECAR_PARAMS: Dict[tuple, tuple] = {}


def sidecar_params(sidecar_path: str) -> tuple:
    """(P, salt) of the sidecar's CURRENT manifest, cached per
    generation (same token as the blob cache). One os.stat per call —
    cheap enough for long-lived closures (the SQL UDF surface) to
    verify their captured params against every batch, so a rebuild at
    the same path with different P/salt raises instead of routing keys
    to the wrong pid (silent false negatives)."""
    import json
    import os

    token = sidecar_cache_token(sidecar_path)
    params = _SIDECAR_PARAMS.get(token)
    if params is None:
        with open(os.path.join(sidecar_path, "filter_manifest.json")) as fh:
            m = json.load(fh)
        params = (int(m["P"]), int(m["salt"]))
        _SIDECAR_PARAMS[token] = params
        while len(_SIDECAR_PARAMS) > 8:
            _SIDECAR_PARAMS.pop(next(iter(_SIDECAR_PARAMS)))
    return params


def contains_sidecar_series(sidecar_path: str, P: int, salt: int,
                            key: pd.Series) -> pd.Series:
    """Series-shaped sidecar probe for the SQL-function surface: same
    process-cached whole-sidecar load as contains_sidecar_local, same
    NULL semantics as contains_kernel (NULL key ⇒ False). Raises if the
    sidecar was rebuilt with different (P, salt) after registration."""
    from .core.hashing import route_pid

    if sidecar_params(sidecar_path) != (P, salt):
        raise ValueError(
            f"sidecar at {sidecar_path} was rebuilt with different "
            "partitioning since the SQL function was registered — "
            "re-run register_sql_sidecar")
    filters = _sidecar_filters(sidecar_path, P)
    keys = pd_to_u64(key)
    pids = route_pid(keys, salt, P)
    out = np.zeros(len(keys), dtype=bool)
    for pid in np.unique(pids):
        f = filters[int(pid)]
        if f is not None:
            m = pids == pid
            out[m] = f.contains(keys[m])
    na = key.isna().to_numpy()
    if na.any():
        out[na] = False
    return pd.Series(out)


def contains_sidecar_local(batches, sidecar_path: str, P: int, salt: int,
                           key_name: str = "key"):
    """No-shuffle sidecar probe (mapInArrow directly on the input
    partitioning): every worker process loads ALL the sidecar's filters
    once (process-level cache) and routes each batch's keys in numpy.

    This is the small-blob fast path — `contains_via_sidecar` picks it
    when the manifest's total blob_bytes fits comfortably in a worker
    (default ≤128 MB): it skips the 8-16 B/row exchange + Arrow
    round-trip of the routed path, which dominates probe wall time at
    P≲10³ (measured ~4 s of a 5.4 s 1e7-probe). The routed path stays
    the 10¹²-key shape where per-worker memory must be O(few blobs).
    """
    filters = None
    for b in batches:
        if filters is None:             # resolve lazily: empty tasks free
            filters = _sidecar_filters(sidecar_path, P)
        yield _probe_sidecar_batch(b, key_name, salt, P,
                                   filters.__getitem__)


_FILTER_CACHE: Dict[str, List] = {}


def _contains_impl(bc_value, key: pd.Series, keys: np.ndarray,
                   pids: np.ndarray) -> pd.Series:
    """Shared probe body over pre-converted arrays (the two public
    kernels differ only in where the pid comes from)."""
    token, blobs = bc_value
    filters = _FILTER_CACHE.get(token)
    if filters is None:
        filters = [load_filter(b) for b in blobs]
        _FILTER_CACHE[token] = filters
        while len(_FILTER_CACHE) > 8:  # bound worker memory
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
    out = np.zeros(len(keys), dtype=bool)
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    bounds = np.searchsorted(sorted_pids, np.arange(len(filters) + 1))
    for p in range(len(filters)):
        lo, hi = bounds[p], bounds[p + 1]
        if hi > lo:
            idx = order[lo:hi]
            out[idx] = filters[p].contains(keys[idx])
    # NULL keys (pd_to_u64 maps them to 0) are NOT members: key 0 can
    # be a legitimate member or false-positive of some blob, and the
    # build path drops NULLs — SQL-consistent answer is False
    na = key.isna().to_numpy()
    if na.any():
        out[na] = False
    return pd.Series(out)


def contains_kernel(bc_value, key: pd.Series, pid: pd.Series) -> pd.Series:
    keys = pd_to_u64(key)
    pids = pid.to_numpy(dtype=np.int32, na_value=0)
    return _contains_impl(bc_value, key, keys, pids)


def contains_routed_kernel(bc_value, key: pd.Series, salt: int,
                           P: int) -> pd.Series:
    """One-argument broadcast probe: the uint64 conversion happens ONCE
    and feeds both the numpy pid routing and the blob probes (the
    two-step route_pid(pd_to_u64(...)) + contains_kernel shape paid the
    Series->uint64 conversion and the NULL scan twice per batch)."""
    from .core.hashing import route_pid
    keys = pd_to_u64(key)
    pids = route_pid(keys, salt, P)
    return _contains_impl(bc_value, key, keys, pids)
