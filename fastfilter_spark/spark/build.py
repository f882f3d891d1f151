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
4. *partial build* — packed-chunk shuffle + ``applyInArrow`` (or
   repartition + ``mapInArrow`` in rows mode): each partition's key
   set lands in numpy and is built into one filter blob (the
   vectorized batch-peel in core/). Emits a lineage+metrics row per
   partition — this row is the checkpoint unit.
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
from .keys import ROUTING_SPARK_HASH, ROUTING_XXHASH_PMOD, partition_id

PARTIAL_SCHEMA = (
    "pid int, kind string, blob binary, n_keys long, keys_ingested long, "
    "attempts int, peel_rounds int, build_secs double, bits_per_entry double"
)

# valid non-bloom kinds (builders live in fastfilter_spark.workerside so
# executors never import pyspark-heavy modules)
FILTER_KINDS = ("bf8", "bf16", "bf32", "xor8", "xor16", "xorplus8",
                "xorplus16", "fuse8", "fuse16", "cuckoo8", "cuckoo16")


@dataclass
class PartitionedFilter:
    """P filter blobs routed by pmod(xxhash64(key, salt), P)."""

    kind: str
    num_partitions: int
    salt: int
    blobs: List[bytes]                     # indexed by pid
    metrics: pd.DataFrame                  # one row per pid
    routing: str = ROUTING_XXHASH_PMOD     # how keys were placed (query must mirror)
    token: str = field(default_factory=lambda: uuid.uuid4().hex)

    # -- query ---------------------------------------------------------------
    def with_contains(self, df: DataFrame, key_col: str,
                      out_col: str = "contained") -> DataFrame:
        spark = df.sparkSession
        from .keys import require_long_key
        require_long_key(df, key_col, "with_contains")
        from .. import workerside  # lean import graph for executors
        bc = spark.sparkContext.broadcast((self.token, self.blobs))

        if self.routing == ROUTING_XXHASH_PMOD:
            # one-argument kernel: the pid is recomputed worker-side
            # with the bit-exact numpy route replica (the register_sql
            # kernel shape) instead of being computed by a JVM
            # expression and shipped per row through Arrow — ~20%
            # faster at 1e7 probes (r6, A/B same window) and one less
            # expression in the plan. Routing parity is pinned by the
            # contains_local tests and the driver oracle.
            P, salt = self.num_partitions, self.salt

            @F.pandas_udf("boolean")
            def _contains(key: pd.Series) -> pd.Series:
                return workerside.contains_routed_kernel(
                    bc.value, key, salt, P)

            args = None
        else:
            @F.pandas_udf("boolean")
            def _contains(key: pd.Series, pid: pd.Series) -> pd.Series:
                return workerside.contains_kernel(bc.value, key, pid)

            args = partition_id(key_col, self.num_partitions, self.salt,
                                self.routing)
        # coalesce JVM-side: one NULL in a batch degrades the whole
        # int64 column to float64 at the Arrow boundary and keys >2^53
        # lose bits — false negatives for the batch's REAL keys. The
        # null-free substitute rows are masked back to False here.
        key_safe = F.coalesce(F.col(key_col), F.lit(0).cast("bigint"))
        probe = (_contains(key_safe) if args is None
                 else _contains(key_safe, args))
        return df.withColumn(
            out_col,
            F.when(F.col(key_col).isNotNull(),
                   probe).otherwise(F.lit(False)))

    def register_sql(self, spark, name: str = "ffsk_contains") -> str:
        """Expose membership as a SQL function: after
        ``pf.register_sql(spark, "ffsk_contains")``, plain
        ``spark.sql("SELECT * FROM t WHERE ffsk_contains(key)")`` probes
        this filter — the same broadcast blobs + vectorized kernel as
        :meth:`with_contains`, packaged for SQL-only users. The pid is
        recomputed inside the kernel from the key (numpy route replica),
        so the UDF takes ONE argument and composes anywhere a boolean
        expression can. Only valid for xxhash_pmod routing (the numpy
        replica); raises otherwise. Returns ``name``."""
        if self.routing != ROUTING_XXHASH_PMOD:
            raise ValueError("register_sql requires xxhash_pmod routing "
                             "(rows-mode filters have no numpy pid replica)")
        from .. import workerside
        bc = spark.sparkContext.broadcast((self.token, self.blobs))
        P, salt = self.num_partitions, self.salt

        @F.pandas_udf("boolean")
        def _contains_sql(key: pd.Series) -> pd.Series:
            # the routed kernel masks NULL keys to False itself and
            # converts the batch to uint64 exactly once
            return workerside.contains_routed_kernel(bc.value, key,
                                                     salt, P)

        # the public name is a SQL-defined wrapper that coalesces NULLs
        # JVM-side BEFORE the kernel: one NULL in a batch otherwise
        # degrades the int64 column to float64 at the Arrow boundary
        # and real keys >2^53 lose bits (false negatives). The AND
        # masks the substitute rows back to False.
        spark.udf.register(f"{name}__kernel", _contains_sql)
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(k BIGINT) "
            f"RETURNS BOOLEAN RETURN k IS NOT NULL AND "
            f"{name}__kernel(coalesce(k, 0))")
        return name

    def contains_local(self, keys: np.ndarray) -> np.ndarray:
        """Driver-side probe without a Spark job (tests/bench/sources).

        xxhash_pmod routing is replicated bit-exactly in numpy
        (core.hashing.route_pid), so each key probes only its own blob —
        identical FPP to ``with_contains``. spark_hash routing (rows
        shuffle mode) has no numpy replica of Murmur3; there membership
        ORs across all P blobs (zero FN preserved, FPP ≤ P·2^−w).
        """
        keys = np.asarray(keys, dtype=U64)
        from .. import workerside
        if self.routing == ROUTING_XXHASH_PMOD:
            return workerside.contains_routed(
                self.blobs, self.salt, self.num_partitions, keys)
        out = np.zeros(keys.shape, dtype=bool)
        for b in self.blobs:
            out |= workerside.load_filter(b).contains(keys)
        return out

    # -- merge ---------------------------------------------------------------
    def merge_bloom(self, other: "PartitionedFilter") -> "PartitionedFilter":
        """Algebraic OR-merge (Bloom only): same P, salt, geometry AND
        routing — a packed-built (xxhash_pmod) and a rows-built
        (spark_hash) filter place the same key in DIFFERENT pids, so
        OR-merging them would lose other's keys (false negatives)."""
        from .. import workerside
        if (self.kind not in workerside.BLOOM_KINDS
                or self.kind != other.kind):
            raise ValueError("blob-level merge is only algebraic for the "
                             "bloom kinds (same kind both sides); use "
                             "union-keys-and-rebuild for xor/fuse kinds")
        if (self.num_partitions, self.salt) != (other.num_partitions, other.salt):
            raise ValueError("partitioning mismatch")
        if self.routing != other.routing:
            raise ValueError("routing mismatch: keys were placed by "
                             "different pid functions — rebuild instead")
        blobs = [
            workerside.load_filter(a).merge(
                workerside.load_filter(b)).to_bytes()
            for a, b in zip(self.blobs, other.blobs)
        ]
        # per-pid n_keys adds (an upper bound when key sets overlap —
        # documented Bloom-merge semantics). Metrics rows exist only for
        # built pids, so union on pid (outer): a pid present only on
        # other's side must survive the merge — reindexing on self's
        # pids alone would drop it and undercount n_keys. Geometry
        # columns come from whichever side has the row (same geometry
        # on both sides by construction).
        sm = self.metrics.set_index("pid")
        om = other.metrics.set_index("pid")
        merged = sm.combine_first(om)
        merged["n_keys"] = (
            sm["n_keys"].reindex(merged.index, fill_value=0)
            + om["n_keys"].reindex(merged.index, fill_value=0)
        ).astype(sm["n_keys"].dtype if len(sm) else "int64")
        merged = merged.reset_index().sort_values("pid").reset_index(drop=True)
        return PartitionedFilter(self.kind, self.num_partitions, self.salt,
                                 blobs, merged, self.routing)

    def to_global_bloom(self):
        """Collapse bloom-kind partials to one filter (tree OR)."""
        from .. import workerside
        if self.kind not in workerside.BLOOM_KINDS:
            raise ValueError("only the bloom kinds collapse blob-level")
        acc = workerside.load_filter(self.blobs[0])
        for b in self.blobs[1:]:
            acc = acc.merge(workerside.load_filter(b))
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
    shuffle_mode: str = "packed",
) -> PartitionedFilter:
    """Stages 1–6 of the lifecycle; returns the queryable handle.

    Resumable: with ``checkpoint_dir``, finished partitions are read
    back and skipped; only missing pids are built and appended. The
    per-pid RNG seed depends only on (base_rng_state, pid), so a
    resumed build produces byte-identical blobs to an uninterrupted one.

    ``shuffle_mode``:
      * ``"packed"`` (default) — ONE bare-key JVM exchange keyed on the
        pid expression pmod(xxhash64(key, salt), P); the builder task
        recomputes each key's pid with the bit-exact numpy replica and
        builds every pid present in the task. One Python pass total.
        (r6: previously this mode packed per-pid chunks map-side in a
        FIRST Python pass to halve the exchange bytes; measured, that
        pass cost ~3x the bytes it saved — every key crossed the
        JVM/Python boundary twice. Blobs and routing are byte-identical
        across both plans.)
      * ``"chunks"`` — the map-side chunk-pack exchange (one fat binary
        row per input-partition × pid, ~8.2 B/key on the wire vs ~16
        B/key for Tungsten rows). Same xxhash_pmod routing and
        byte-identical blobs; for clusters where the network, not the
        Python boundary, is the binding constraint.
      * ``"rows"`` — repartition(P, xxhash64(key,salt)) + mapInArrow,
        reading the pid from TaskContext (spark_hash routing — no numpy
        routing replica, so no sidecar/SQL/local probes). Single-box
        fast path kept for comparison benchmarks.
    """
    from .. import workerside

    spark = keys_df.sparkSession
    P = num_partitions

    # NOTE: no dropDuplicates exchange — all copies of a key hash to the
    # same pid, so the in-partition np.unique in the builder is a global
    # dedupe. The one shuffle moves PACKED per-pid key chunks (one fat
    # binary row per input-partition × pid) instead of n key rows —
    # row-shuffle overhead was ~60% of wall time even at low parallelism.
    from .keys import require_long_key, route_expr
    require_long_key(keys_df, key_col, "build_partitioned_filter")
    placed = (keys_df.select(F.col(key_col).alias("key"))
              .where(F.col("key").isNotNull())
              .withColumn("route", route_expr("key", salt)))

    bloom_args = None
    if kind in workerside.BLOOM_KINDS:
        n_exp = bloom_n_expected
        if n_exp is None:
            n_exp = placed.select("key").dropDuplicates().count()
        bloom_args = (max(16, int(1.2 * n_exp / P)), bloom_fpp)
        kind_name = kind
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
                    "base_rng_state": base_rng_state,
                    "shuffle_mode": shuffle_mode}
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

    routing = (ROUTING_SPARK_HASH if shuffle_mode == "rows"
               else ROUTING_XXHASH_PMOD)
    todo = placed
    if done_pids:
        todo = placed.where(
            ~partition_id("key", P, salt, routing).isin(done_pids))

    partials = partials_dataframe(todo, kind_name, P, salt, base_rng_state,
                                  bloom_args, shuffle_mode)

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
            blobs[pid] = _empty_blob(
                kind_name, all_rows["n_keys"].sum(), P,
                workerside.part_rng_state(base_rng_state, pid), bloom_args)

    metrics = all_rows.drop(columns=["blob"])
    return PartitionedFilter(kind_name, P, salt, blobs, metrics, routing)


def _empty_blob(kind: str, n_total: int, P: int, rng_state: int,
                bloom_args=None) -> bytes:
    """Deterministic empty-filter blob for a pid that received no keys.

    Cuckoo kinds get an average-pid-sized table (a cuckoo table cannot
    grow in place, so a 1-bucket empty blob would make cuckoo_update's
    incremental add fail on exactly the pids with the most free
    capacity); the static kinds build their natural empty shape.
    """
    from .. import workerside
    if kind.startswith("cuckoo"):
        from ..core.cuckoo import CuckooFilter
        cap = max(16, int(np.ceil(1.2 * n_total / max(1, P))))
        return CuckooFilter.empty(cap, int(kind[len("cuckoo"):]),
                                  rng_state).to_bytes()
    builder = (workerside.bloom_builder(kind, *bloom_args)
               if kind in workerside.BLOOM_KINDS
               else workerside._BUILDERS[kind])
    return builder(np.empty(0, dtype=U64), rng_state).to_bytes()


def cuckoo_update(
    pf: PartitionedFilter,
    add_df: Optional[DataFrame] = None,
    delete_df: Optional[DataFrame] = None,
    key_col: str = "key",
    max_batch: int = 50_000_000,
) -> PartitionedFilter:
    """Functional insert/delete on a partitioned cuckoo filter — the
    mutation surface the static xor/fuse family lacks (retractions in a
    streaming membership set; cf. SURVEY.md §2.2 Streaming).

    Keys are routed to their pid with the bit-exact numpy replica of
    the build placement, each touched blob is updated in isolation, and
    a NEW PartitionedFilter is returned (blobs are immutable values —
    same functional style as add_keys). Batches are collected to the
    driver (deletes/increments are small relative to the build by
    nature; ``max_batch`` guards misuse — bulk changes should rebuild).
    Deleting a never-inserted key is rejected by contract (it can evict
    a colliding entry's fingerprint): delete only what you added.
    Semantics — per-batch set, cross-batch multiset: WITHIN one batch
    duplicate keys collapse (the batch is deduplicated before insert,
    so the n_keys delta is the batch's DISTINCT count), but re-adding a
    key in a LATER batch stores another fingerprint copy — add in two
    batches, delete once ⇒ still contained, and one delete removes one
    copy. Never delete more times than you added across batches: a
    surplus delete can strip a colliding entry's fingerprint and create
    a false negative on an unrelated member (the cuckoo-filter
    contract). Deduplicate against the membership set upstream if pure
    set semantics are needed. NULL keys are dropped before collection,
    matching the build path's isNotNull filter.
    """
    if not pf.kind.startswith("cuckoo"):
        raise ValueError("cuckoo_update requires a cuckoo-kind filter")
    from .keys import require_long_key
    for side, d in (("add_df", add_df), ("delete_df", delete_df)):
        if d is not None:
            require_long_key(d, key_col, f"cuckoo_update({side})")
    if pf.routing != ROUTING_XXHASH_PMOD:
        raise ValueError("cuckoo_update requires xxhash_pmod routing")
    from .. import workerside
    from ..core.cuckoo import CuckooFilter
    from ..core.hashing import route_pid

    def _collect(df: Optional[DataFrame]) -> np.ndarray:
        if df is None:
            return np.empty(0, dtype=np.uint64)
        # ONE job with a bounded collect: limit(max_batch+1) both guards
        # driver memory and avoids the count()-then-collect() double
        # scan (which also races on non-deterministic sources)
        rows = (df.where(F.col(key_col).isNotNull())
                .select(key_col).limit(max_batch + 1).collect())
        if len(rows) > max_batch:
            raise ValueError(f"batch exceeds {max_batch} keys: "
                             "rebuild instead")
        arr = np.array([r[0] for r in rows],
                       dtype=np.int64).view(np.uint64)
        return np.unique(arr)

    adds, dels = _collect(add_df), _collect(delete_df)
    blobs = list(pf.blobs)
    metrics = pf.metrics.set_index("pid")
    for keys, op in ((adds, "add"), (dels, "delete")):
        if not keys.size:
            continue
        pids = route_pid(keys, pf.salt, pf.num_partitions)
        for pid in np.unique(pids):
            f = CuckooFilter.from_bytes(blobs[int(pid)])
            batch = keys[pids == pid]
            if op == "add":
                f.add(batch)
                delta = len(batch)
            else:
                delta = -f.delete(batch)
            blobs[int(pid)] = f.to_bytes()
            if int(pid) not in metrics.index:  # pid had zero keys at build
                seed_row = {c: 0 for c in metrics.columns}
                if "kind" in seed_row:   # keep the string column string
                    seed_row["kind"] = pf.kind
                metrics.loc[int(pid)] = seed_row
            metrics.loc[int(pid), "n_keys"] += delta
    return PartitionedFilter(pf.kind, pf.num_partitions, pf.salt, blobs,
                             metrics.sort_index().reset_index(), pf.routing)


def _spark_hash_int32(vals: np.ndarray) -> np.ndarray:
    """Bit-exact numpy replica of Spark's ``hash()`` (Murmur3_x86_32,
    seed 42) over IntegerType values — used ONLY to pre-search balanced
    exchange tokens driver-side. If it ever drifted from Spark the
    build would stay CORRECT (co-location keys on a function of pid);
    only the task balance would degrade — and the parity test pins it.
    """
    M = np.uint32(0xFFFFFFFF)
    k1 = vals.astype(np.int64).astype(np.uint32)
    k1 = (k1 * np.uint32(0xcc9e2d51)) & M
    k1 = ((k1 << np.uint32(15)) | (k1 >> np.uint32(17))) & M
    k1 = (k1 * np.uint32(0x1b873593)) & M
    h1 = np.uint32(42) ^ k1
    h1 = ((h1 << np.uint32(13)) | (h1 >> np.uint32(19))) & M
    h1 = (h1 * np.uint32(5) + np.uint32(0xe6546b64)) & M
    h1 ^= np.uint32(4)                      # fmix(h1, len=4)
    h1 ^= h1 >> np.uint32(16)
    h1 = (h1 * np.uint32(0x85ebca6b)) & M
    h1 ^= h1 >> np.uint32(13)
    h1 = (h1 * np.uint32(0xc2b2ae35)) & M
    h1 ^= h1 >> np.uint32(16)
    return h1.view(np.int32)


_PID_TOKEN_CAP = 4096
_PID_TOKEN_CACHE: dict = {}


def _pid_tokens(B: int) -> Optional[List[int]]:
    """For each exchange bucket 0..B-1, an int token with
    pmod(hash(token), B) == bucket. Exchanging on
    ``tokens[pid % B]`` places pid group g in EXACTLY partition g —
    perfectly round-robin-balanced ⌈P/B⌉ pids per task. Hashing the
    pid directly instead leaves ~1/e of tasks empty and the fullest
    with 3-4 pid groups (guide §2.5, synthetic-key collisions): a 3-4x
    build straggler whenever P ~ parallelism. None above
    _PID_TOKEN_CAP — the literal array would bloat the plan, and at
    that scale collision imbalance self-averages across task waves."""
    if B > _PID_TOKEN_CAP:
        return None
    toks = _PID_TOKEN_CACHE.get(B)
    if toks is None:
        toks = [None] * B
        found, start = 0, 0
        while found < B:
            cand = np.arange(start, start + 16384, dtype=np.int64)
            buckets = np.mod(_spark_hash_int32(cand).astype(np.int64), B)
            for t, b in zip(cand, buckets):
                if toks[b] is None:
                    toks[b] = int(t)
                    found += 1
                    if found == B:
                        break
            start += 16384
        _PID_TOKEN_CACHE[B] = toks
    return toks


def partials_dataframe(placed: DataFrame, kind_name: str, P: int, salt: int,
                       base_rng_state: int, bloom_args, shuffle_mode: str
                       ) -> DataFrame:
    """The partial-build DataFrame (PARTIAL_SCHEMA, one row per non-empty
    pid). `placed` must carry columns (key, route). Shared by the
    in-driver handle path (`build_partitioned_filter`) and the
    driver-bypass sidecar path (`io.build_filter_sidecar`)."""
    from .. import workerside
    from .keys import route_expr

    if shuffle_mode == "packed":
        # Bare-key exchange keyed on the pid EXPRESSION pmod(route, P):
        # all rows of a pid land in one task, the worker recomputes the
        # pid with the bit-exact numpy route replica and builds one
        # blob per pid present (workerside.build_routed_map). One
        # Python pass + one JVM exchange of 8-byte keys — the previous
        # chunk-pack plan (kept as shuffle_mode="chunks") paid an extra
        # full JVM->Python round trip of every key to halve the
        # exchange bytes; measured on this engine the pack pass costs
        # ~3x what it saves (guide §4.1: every Python boundary crossing
        # moves the same bytes the exchange would, plus a transpose).
        # Blobs are byte-identical across both plans (same per-pid key
        # sets, same per-pid seeds), so the routing stays xxhash_pmod
        # and every probe/serde path is unaffected.
        #
        def _build_routed(batches):
            return workerside.build_routed_map(
                batches, kind_name, salt, P, base_rng_state, bloom_args)

        # recompute the pid expression from the bare key rather than
        # referencing the `route` column: an exchange keyed on a column
        # SHIPS that column (24 B/row instead of 8 — the same lesson as
        # the routed probe), while an exchange keyed on an expression
        # of `key` evaluates it map-side and moves only the key.
        pid_expr = F.pmod(route_expr("key", salt), F.lit(P))
        # B exchange partitions = min(P, cluster parallelism): each
        # task builds ~P/B pids sequentially. MORE post-shuffle Python
        # tasks are strictly worse here — the per-task mapInArrow
        # setup dominates (identity pass over the same 1e7-row
        # exchange measured 0.84 s at 32 tasks vs 2.9 s at 128), and
        # B > parallelism buys nothing a wave can't.
        spark = placed.sparkSession
        par = spark.sparkContext.defaultParallelism
        B = max(1, min(P, par))
        toks = _pid_tokens(B)
        if toks is not None:
            # perfect balance: pid group g = pid % B is exchanged on a
            # searched token whose Spark hash lands exactly in
            # partition g — the balance rows-mode gets from
            # TaskContext, with xxhash_pmod pids. (F.lit(list) and
            # F.array(*lits) produce the IDENTICAL constant-folded
            # array literal in the optimized plan — verified on
            # Spark 4.1.2 — so the choice here is brevity, not perf.)
            part_key = F.lit(toks)[F.pmod(pid_expr, F.lit(B))]
        else:
            # huge-B fallback: hash the pid expression itself;
            # collision imbalance self-averages at that task count.
            part_key = pid_expr
        return (placed.select("key").repartition(B, part_key)
                .mapInArrow(_build_routed, PARTIAL_SCHEMA))
    if shuffle_mode == "chunks":
        def _pack(batches):
            return workerside.pack_by_pid(batches, P)

        def _build(tbl):
            return workerside.build_from_chunks(
                tbl, kind_name, base_rng_state, bloom_args)

        packed = placed.mapInArrow(_pack, "pid int, chunk binary")
        return packed.groupBy("pid").applyInArrow(_build, PARTIAL_SCHEMA)
    if shuffle_mode == "rows":
        def _build_rows(batches):
            return workerside.build_partitions_map(
                batches, kind_name, base_rng_state, bloom_args)

        return (placed.drop("route")
                .repartition(P, route_expr("key", salt))
                .mapInArrow(_build_rows, PARTIAL_SCHEMA))
    raise ValueError(f"unknown shuffle_mode {shuffle_mode!r}")


def _parquet_exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def add_keys(
    pf: PartitionedFilter,
    old_keys_df: DataFrame,
    new_keys_df: DataFrame,
    key_col: str = "key",
    checkpoint_dir: Optional[str] = None,
    base_rng_state: int = 0x726B2B9D438B9D4D,
) -> PartitionedFilter:
    """Union-keys-and-rebuild merge path for the holistic filters.

    xor/binary-fuse cannot merge at the blob level (peeling needs the
    complete key set — SURVEY.md §2.2 Aggregations), so incremental
    ingest rebuilds ONLY the partitions that received new keys: the
    anti-join below finds genuinely-new keys, their pids are rebuilt
    from the union, all other blobs are reused verbatim. At 10^12 keys
    with a daily increment touching k of P partitions, this is k/P of
    the full build cost. Associativity: the result depends only on the
    final key set (per-pid RNG seeds are fixed), so any ingest order
    yields byte-identical blobs.
    """
    from .. import workerside

    from .keys import require_long_key
    require_long_key(old_keys_df, key_col, "add_keys(old)")
    require_long_key(new_keys_df, key_col, "add_keys(new)")
    P, salt = pf.num_partitions, pf.salt
    # NULL filter matches the build path (build.py:231) and cuckoo_update:
    # a NULL surviving into the union would make pyarrow hand the worker
    # kernel a float64-with-NaN column whose uint64 reinterpretation
    # garbles EVERY key of the touched pid — false negatives on
    # previously-member keys, a zero-FN contract violation.
    old = (old_keys_df.select(F.col(key_col).alias("key"))
           .where(F.col("key").isNotNull()))
    new = (new_keys_df.select(F.col(key_col).alias("key"))
           .where(F.col("key").isNotNull()))
    genuinely_new = new.join(old, "key", "left_anti")
    touched = (genuinely_new
               .withColumn("pid", partition_id("key", P, salt, pf.routing))
               .select("pid").distinct())
    touched_pids = [r.pid for r in touched.collect()]
    if not touched_pids:
        return pf

    union = old.unionByName(new) \
               .withColumn("pid", partition_id("key", P, salt, pf.routing)) \
               .where(F.col("pid").isin(touched_pids))

    bloom_args = None
    if pf.kind in workerside.BLOOM_KINDS:
        # reuse the EXACT geometry (m, k, seed) of an existing blob so
        # OR-merge with untouched blobs stays valid — re-deriving an
        # (n_expected, fpp) pair reconstructs the same m but a
        # different k whenever the original fpp wasn't the default
        b0 = workerside.load_filter(pf.blobs[0])
        bloom_args = ("exact", b0.m_bits, b0.k, b0.seed)

    def _build(tbl):
        return workerside.build_partition_arrow(
            tbl, pf.kind, base_rng_state, bloom_args)

    rebuilt = union.groupBy("pid").applyInArrow(_build, PARTIAL_SCHEMA)
    rows = rebuilt.toPandas()

    blobs = list(pf.blobs)
    for _, r in rows.iterrows():
        blobs[int(r["pid"])] = bytes(r["blob"])
    metrics = (pd.concat([pf.metrics[~pf.metrics["pid"].isin(touched_pids)],
                          rows.drop(columns=["blob"])])
               .sort_values("pid").reset_index(drop=True))
    out = PartitionedFilter(pf.kind, P, salt, blobs, metrics, pf.routing)
    if checkpoint_dir:
        _rewrite_checkpoint(out, checkpoint_dir, base_rng_state)
    return out


def _rewrite_checkpoint(pf: PartitionedFilter, checkpoint_dir: str,
                        base_rng_state: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(checkpoint_dir, "partials"), exist_ok=True)
    manifest_path = os.path.join(checkpoint_dir, "manifest.json")
    # identical key set to build_partitioned_filter's manifest — a
    # missing shuffle_mode key would fail the next build's manifest
    # comparison and break resume after incremental ingest. Preserve
    # the ORIGINAL build's mode when the existing manifest records one
    # compatible with the filter's routing (r6: "chunks" shares
    # xxhash_pmod with "packed"; hardcoding "packed" here would make a
    # chunks-built checkpoint unresumable after add_keys).
    shuffle_mode = ("packed" if pf.routing == ROUTING_XXHASH_PMOD
                    else "rows")
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as fh:
                prev_mode = json.load(fh).get("shuffle_mode")
        except (OSError, ValueError):
            prev_mode = None
        if (pf.routing == ROUTING_XXHASH_PMOD
                and prev_mode in ("packed", "chunks")):
            shuffle_mode = prev_mode
    with open(manifest_path, "w") as fh:
        json.dump({"kind": pf.kind, "P": pf.num_partitions, "salt": pf.salt,
                   "base_rng_state": base_rng_state,
                   "shuffle_mode": shuffle_mode}, fh)
    tbl = pf.metrics.copy()
    tbl["blob"] = [pf.blobs[int(p)] for p in tbl["pid"]]
    for f in os.listdir(os.path.join(checkpoint_dir, "partials")):
        os.remove(os.path.join(checkpoint_dir, "partials", f))
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                   os.path.join(checkpoint_dir, "partials", "rebuilt.parquet"))
