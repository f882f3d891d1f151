"""Distributed construction of membership filters as mergeable aggregates.

Design (SURVEY.md §3 "Planned Spark lifecycle"):

1. *derive*  — JVM-side sha256→uint64 key column (:mod:`.keys`).
2. *dedupe*  — ``dropDuplicates`` (peeling provably fails on duplicate
   keys — the reference sorts+dedupes on retry; we dedupe upfront via
   Catalyst's exchange, which is the scalable place to do it).
3. *place*   — explicit salted repartition by pmod(xxhash64(key), P);
   never by a natural (Zipf-skewed) column.
4. *partial build* — ``groupBy(pid).applyInPandas``: each partition's
   key set streams through Arrow into numpy and is built into one
   filter blob (the vectorized batch-peel in core/). Emits a
   lineage+metrics row per partition — this row is the checkpoint unit.
5. *merge*   — Bloom partials OR-merge into one global blob
   (algebraic). xor/binary-fuse are holistic: the scalable serve shape
   is the *partitioned filter* (P blobs + route-by-hash lookup), with
   an explicit union-keys-and-rebuild path for re-partitioning.
6. *publish* — blobs broadcast; ``with_contains`` is a DataFrame
   predicate (3 numpy gathers per probe inside a pandas UDF).

Why a partitioned filter scales: each blob covers n/P keys, build
memory per task is O(n/P), query routing is one xxhash64+pmod (JVM)
plus one vectorized lookup in the right blob. At 10^12 keys, P grows
with the cluster; no single node ever materializes the full key set —
exactly the property the reference's ``populateIter`` exists for.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.binaryfuse import BinaryFuseFilter
from ..core.bloom import BloomFilter
from ..core.hashing import U64
from ..core.xor import XorFilter, XorPlusFilter
from .keys import partition_id, pd_to_u64

PARTIAL_SCHEMA = (
    "pid int, kind string, blob binary, n_keys long, attempts int, "
    "peel_rounds int, build_secs double, bits_per_entry double"
)

# kind name → (builder(keys, rng_state) -> filter, loader(blob) -> filter)
FILTER_KINDS: Dict[str, Dict] = {
    "bf8": dict(build=lambda k, r: BinaryFuseFilter.populate(k, 8, rng_state=r),
                load=BinaryFuseFilter.from_bytes),
    "bf16": dict(build=lambda k, r: BinaryFuseFilter.populate(k, 16, rng_state=r),
                 load=BinaryFuseFilter.from_bytes),
    "bf32": dict(build=lambda k, r: BinaryFuseFilter.populate(k, 32, rng_state=r),
                 load=BinaryFuseFilter.from_bytes),
    "xor8": dict(build=lambda k, r: XorFilter.populate(k, 8, rng_state=r),
                 load=XorFilter.from_bytes),
    "xor16": dict(build=lambda k, r: XorFilter.populate(k, 16, rng_state=r),
                  load=XorFilter.from_bytes),
    "xorplus8": dict(build=lambda k, r: XorPlusFilter.populate(k, 8, rng_state=r),
                     load=XorPlusFilter.from_bytes),
    "xorplus16": dict(build=lambda k, r: XorPlusFilter.populate(k, 16, rng_state=r),
                      load=XorPlusFilter.from_bytes),
}


def _bloom_kind(n_expected_per_part: int, fpp: float):
    def build(keys: np.ndarray, rng_state: int) -> BloomFilter:
        # geometry from *expected* per-partition n so all partials share
        # shape (→ OR-mergeable); seed fixed (not rotated) for the same
        # reason.
        bf = BloomFilter.empty(n_expected_per_part, fpp)
        bf.add(keys)
        return bf
    return dict(build=build, load=BloomFilter.from_bytes)


def _part_rng_state(base: int, pid: int) -> int:
    """Per-partition deterministic RNG seed, independent of build order."""
    x = np.asarray([(base ^ (pid * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF],
                   dtype=U64)
    from ..core.hashing import murmur64
    return int(murmur64(x)[0])


@dataclass
class PartitionedFilter:
    """P filter blobs routed by pmod(xxhash64(key, salt), P)."""

    kind: str
    num_partitions: int
    salt: int
    blobs: List[bytes]                     # indexed by pid
    metrics: pd.DataFrame                  # one row per pid
    token: str = field(default_factory=lambda: uuid.uuid4().hex)

    # -- query ---------------------------------------------------------------
    def with_contains(self, df: DataFrame, key_col: str,
                      out_col: str = "contained") -> DataFrame:
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((self.token, self.kind, self.blobs))

        @F.pandas_udf("boolean")
        def _contains(key: pd.Series, pid: pd.Series) -> pd.Series:
            token, kind, blobs = bc.value
            filters = _deserialize_cached(token, kind, blobs)
            keys = pd_to_u64(key)
            pids = pid.to_numpy(dtype=np.int32, na_value=0)
            out = np.zeros(len(keys), dtype=bool)
            for p in np.unique(pids):
                m = pids == p
                out[m] = filters[p].contains(keys[m])
            return pd.Series(out)

        pid_expr = partition_id(key_col, self.num_partitions, self.salt)
        return df.withColumn(out_col, _contains(F.col(key_col), pid_expr))

    def contains_local(self, keys: np.ndarray) -> np.ndarray:
        """Driver-side probe without a Spark job (tests/bench).

        Routing uses Spark's xxhash64, which we do not reimplement in
        numpy; instead this ORs membership across all P blobs. Zero
        false negatives is preserved (a member is in its routed blob);
        false positives grow to ≤ P·2^−w. Use ``with_contains`` for the
        production FPP.
        """
        keys = np.asarray(keys, dtype=U64)
        out = np.zeros(keys.shape, dtype=bool)
        filters = [_load_filter(self.kind, b) for b in self.blobs]
        for f in filters:
            out |= f.contains(keys)
        return out

    # -- merge ---------------------------------------------------------------
    def merge_bloom(self, other: "PartitionedFilter") -> "PartitionedFilter":
        """Algebraic OR-merge (Bloom only): same P, salt, geometry."""
        if not self.kind.startswith("bloom") or not other.kind.startswith("bloom"):
            raise ValueError("blob-level merge is only algebraic for Bloom; "
                             "use union-keys-and-rebuild for xor/fuse kinds")
        if (self.num_partitions, self.salt) != (other.num_partitions, other.salt):
            raise ValueError("partitioning mismatch")
        blobs = [
            BloomFilter.from_bytes(a).merge(BloomFilter.from_bytes(b)).to_bytes()
            for a, b in zip(self.blobs, other.blobs)
        ]
        return PartitionedFilter(self.kind, self.num_partitions, self.salt,
                                 blobs, self.metrics)

    def to_global_bloom(self) -> BloomFilter:
        """Collapse Bloom partials to one filter (tree OR)."""
        if not self.kind.startswith("bloom"):
            raise ValueError("only Bloom collapses blob-level")
        acc = BloomFilter.from_bytes(self.blobs[0])
        for b in self.blobs[1:]:
            acc = acc.merge(BloomFilter.from_bytes(b))
        return acc

    # -- metrics ---------------------------------------------------------------
    @property
    def n_keys(self) -> int:
        return int(self.metrics["n_keys"].sum())

    def bits_per_entry(self) -> float:
        total_bytes = sum(len(b) for b in self.blobs)
        return 8.0 * total_bytes / max(1, self.n_keys)


_FILTER_CACHE: Dict[str, List] = {}


def _load_filter(kind: str, blob: bytes):
    if kind.startswith("bloom"):
        return BloomFilter.from_bytes(blob)
    return FILTER_KINDS[kind]["load"](blob)


def _deserialize_cached(token: str, kind: str, blobs: List[bytes]) -> List:
    cached = _FILTER_CACHE.get(token)
    if cached is None:
        cached = [_load_filter(kind, b) for b in blobs]
        _FILTER_CACHE[token] = cached
        if len(_FILTER_CACHE) > 8:  # bound worker memory
            _FILTER_CACHE.pop(next(iter(_FILTER_CACHE)))
    return cached


def build_partitioned_filter(
    keys_df: DataFrame,
    key_col: str = "key",
    kind: str = "bf8",
    num_partitions: int = 32,
    salt: int = 0,
    checkpoint_dir: Optional[str] = None,
    base_rng_state: int = 0x726B2B9D438B9D4D,
    bloom_fpp: float = 0.01,
    bloom_n_expected: Optional[int] = None,
) -> PartitionedFilter:
    """Stages 1–6 of the lifecycle; returns the queryable handle.

    Resumable: with ``checkpoint_dir``, finished partitions are read
    back and skipped; only missing pids are built and appended. The
    per-pid RNG seed depends only on (base_rng_state, pid), so a
    resumed build produces byte-identical blobs to an uninterrupted one.
    """
    spark = keys_df.sparkSession
    P = num_partitions

    deduped = (keys_df.select(F.col(key_col).alias("key"))
               .where(F.col("key").isNotNull())
               .dropDuplicates(["key"])
               .withColumn("pid", partition_id("key", P, salt)))

    if kind == "bloom":
        n_exp = bloom_n_expected
        if n_exp is None:
            n_exp = deduped.count()
        per_part = max(16, int(1.2 * n_exp / P))
        kind_impl = _bloom_kind(per_part, bloom_fpp)
        kind_name = "bloom"
    else:
        if kind not in FILTER_KINDS:
            raise ValueError(f"unknown filter kind {kind!r}")
        kind_impl = FILTER_KINDS[kind]
        kind_name = kind

    done_pids: List[int] = []
    partials_path = None
    if checkpoint_dir:
        partials_path = os.path.join(checkpoint_dir, "partials")
        manifest_path = os.path.join(checkpoint_dir, "manifest.json")
        manifest = {"kind": kind_name, "P": P, "salt": salt,
                    "base_rng_state": base_rng_state}
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                prev = json.load(fh)
            if prev != manifest:
                raise ValueError(
                    f"checkpoint manifest mismatch: {prev} vs {manifest}")
        else:
            os.makedirs(checkpoint_dir, exist_ok=True)
            with open(manifest_path, "w") as fh:
                json.dump(manifest, fh)
        if _parquet_exists(partials_path):
            done = spark.read.parquet(partials_path).select("pid").distinct()
            done_pids = [r.pid for r in done.collect()]

    todo = deduped
    if done_pids:
        todo = deduped.where(~F.col("pid").isin(done_pids))

    build_fn = kind_impl["build"]

    def _build_partition(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["pid"].iloc[0])
        keys = pd_to_u64(pdf["key"])
        t0 = time.time()
        filt = build_fn(keys, _part_rng_state(base_rng_state, pid))
        dt = time.time() - t0
        blob = filt.to_bytes()
        return pd.DataFrame({
            "pid": [pid], "kind": [kind_name], "blob": [blob],
            "n_keys": [int(keys.size)],
            "attempts": [int(getattr(filt, "attempts", 1))],
            "peel_rounds": [int(getattr(filt, "peel_rounds", 0))],
            "build_secs": [dt],
            "bits_per_entry": [float(filt.bits_per_entry())],
        })

    partials = todo.groupBy("pid").applyInPandas(_build_partition, PARTIAL_SCHEMA)

    if partials_path:
        partials.write.mode("append").parquet(partials_path)
        all_rows = spark.read.parquet(partials_path).toPandas()
    else:
        all_rows = partials.toPandas()

    all_rows = (all_rows.sort_values("pid")
                .drop_duplicates(subset=["pid"], keep="first")
                .reset_index(drop=True))
    blobs: List[bytes] = [b"" for _ in range(P)]
    for _, row in all_rows.iterrows():
        blobs[int(row["pid"])] = bytes(row["blob"])
    # pids with zero keys never appear in the grouped build; give them
    # an empty filter of the right kind so routing stays total.
    for pid in range(P):
        if not blobs[pid]:
            empty = build_fn(np.empty(0, dtype=U64),
                             _part_rng_state(base_rng_state, pid))
            blobs[pid] = empty.to_bytes()

    metrics = all_rows.drop(columns=["blob"])
    return PartitionedFilter(kind_name, P, salt, blobs, metrics)


def _parquet_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
