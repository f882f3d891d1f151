"""Distributed construction of membership filters as mergeable aggregates.

Design (SURVEY.md §3 "Planned Spark lifecycle"):

1. *derive*  — JVM-side sha256→uint64 key column (:mod:`.keys`).
2. *place*   — explicit salted repartition by pmod(xxhash64(key), P);
   never by a natural (Zipf-skewed) column.
3. *dedupe*  — in-partition ``np.unique`` inside the builder. Because
   every copy of a key hashes to the same pid, this is a *global*
   dedupe without its own exchange (peeling provably fails on
   duplicates — the reference sorts+dedupes on retry). One shuffle
   total for the whole build.
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
import uuid
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.bloom import BloomFilter
from ..core.hashing import U64
from .keys import partition_id

PARTIAL_SCHEMA = (
    "pid int, kind string, blob binary, n_keys long, keys_ingested long, "
    "attempts int, peel_rounds int, build_secs double, bits_per_entry double"
)

# valid non-bloom kinds (builders live in fastfilter_spark.workerside so
# executors never import pyspark-heavy modules)
FILTER_KINDS = ("bf8", "bf16", "bf32", "xor8", "xor16", "xorplus8", "xorplus16")


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
        from .. import workerside  # lean import graph for executors
        bc = spark.sparkContext.broadcast((self.token, self.blobs))

        @F.pandas_udf("boolean")
        def _contains(key: pd.Series, pid: pd.Series) -> pd.Series:
            return workerside.contains_kernel(bc.value, key, pid)

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
        from .. import workerside
        filters = [workerside.load_filter(b) for b in self.blobs]
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
    from .. import workerside

    spark = keys_df.sparkSession
    P = num_partitions

    # NOTE: no dropDuplicates exchange — all copies of a key hash to the
    # same pid, so the in-partition np.unique in the builder is a global
    # dedupe. One shuffle total (the groupBy below).
    placed = (keys_df.select(F.col(key_col).alias("key"))
              .where(F.col("key").isNotNull())
              .withColumn("pid", partition_id("key", P, salt)))

    bloom_args = None
    if kind == "bloom":
        n_exp = bloom_n_expected
        if n_exp is None:
            n_exp = placed.select("key").dropDuplicates().count()
        bloom_args = (max(16, int(1.2 * n_exp / P)), bloom_fpp)
        kind_name = "bloom"
    else:
        if kind not in FILTER_KINDS:
            raise ValueError(f"unknown filter kind {kind!r}")
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

    todo = placed
    if done_pids:
        todo = placed.where(~F.col("pid").isin(done_pids))

    def _build_partition(tbl):
        return workerside.build_partition_arrow(
            tbl, kind_name, base_rng_state, bloom_args)

    partials = todo.groupBy("pid").applyInArrow(_build_partition, PARTIAL_SCHEMA)

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
            builder = (workerside.bloom_builder(*bloom_args)
                       if kind_name == "bloom"
                       else workerside._BUILDERS[kind_name])
            empty = builder(np.empty(0, dtype=U64),
                            workerside.part_rng_state(base_rng_state, pid))
            blobs[pid] = empty.to_bytes()

    metrics = all_rows.drop(columns=["blob"])
    return PartitionedFilter(kind_name, P, salt, blobs, metrics)


def _parquet_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
