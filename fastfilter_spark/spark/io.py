"""Sources and sinks.

* ``read_corpus`` — the Iceberg-shaped corpus table. Uses an Iceberg
  catalog table when the runtime has the Iceberg Spark extension (the
  production deployment per BASELINE.json input_hint); this sandbox
  ships no Iceberg jar, so a parquet directory with the identical
  schema is the tested path. Either way the result is a plain
  DataFrame and everything downstream is source-agnostic.
* ``write_filter_sidecar`` / ``read_filter_sidecar`` — persist a built
  PartitionedFilter as a parquet sidecar table (one row per pid with
  blob + lineage metrics + a table-level manifest row), so a filter
  built once can be re-loaded and queried by later jobs without a
  rebuild. This is the publishable artifact of SURVEY.md §3 stage 6.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .build import PartitionedFilter

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def read_corpus(spark: SparkSession, location: str,
                table: Optional[str] = None) -> DataFrame:
    """Load the corpus from an Iceberg table if a catalog is configured,
    else from parquet at ``location``."""
    if table is not None:
        from pyspark.errors import AnalysisException
        try:
            return spark.read.table(table)
        except AnalysisException as e:
            # only the table-missing/catalog-missing shapes may fall
            # back; anything else (permission/access failures in HMS or
            # Glue also surface as AnalysisException) must RAISE — a
            # broad fallback would silently read (possibly stale)
            # parquet instead of failing the denied catalog read
            cls = e.getErrorClass() or ""
            if not ("TABLE_OR_VIEW_NOT_FOUND" in cls
                    or "CATALOG_NOT_FOUND" in cls
                    or "REQUIRES_SINGLE_PART_NAMESPACE" in cls):
                raise
            import warnings
            warnings.warn(f"read_corpus: catalog table {table!r} "
                          f"unavailable ({cls or e}); "
                          f"falling back to parquet at {location}")
    return spark.read.parquet(location)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 64, sort_col: Optional[str] = None,
                   mode: str = "overwrite") -> None:
    """Bucketed parquet sink: pay the shuffle once at write time.

    Rows are hash-clustered into ``num_buckets`` files by ``bucket_col``
    (Spark's HashPartitioning), so every later join or aggregation on
    that column between bucketed tables runs **without an Exchange** —
    at 100 TB the dominant cost of a key-key join is the shuffle, and
    bucketing amortizes it across every downstream query. Sorted
    buckets additionally skip the sort of a sort-merge join.
    (Analog of the reference's block counting-sort scatter: pre-cluster
    by hash once, then every probe is local.)
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # with a non-persistent catalog (local in-memory metastore) the
        # warehouse directory can outlive the table entry — clear it, or
        # saveAsTable fails with LOCATION_ALREADY_EXISTS. Resolve the
        # REAL location from the catalog BEFORE dropping (a string-joined
        # warehouse_dir/<table> is wrong for db-qualified names or tables
        # created under another warehouse dir); fall back to the default
        # db-aware layout only when the table isn't in the catalog.
        loc = None
        try:
            rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
            loc = next((r.data_type for r in rows
                        if r.col_name == "Location"), None)
        except Exception:
            pass
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        cands = [loc] if loc is not None else []
        if loc is None:
            # table absent from the catalog (fresh in-memory metastore):
            # clear every default layout the files could live under —
            # <wh>/<tbl> for the default db, <wh>/<db>.db/<tbl> otherwise
            # (use the LAST two name parts: "cat.db.tbl" ends db.tbl)
            wh = spark.conf.get("spark.sql.warehouse.dir")
            parts = table.split(".")
            tbl = parts[-1]
            db = parts[-2] if len(parts) >= 2 else "default"
            if db == "default":
                cands.append(os.path.join(wh, tbl))
            cands.append(os.path.join(wh, db + ".db", tbl))
        for c in cands:
            c = c.removeprefix("file:")
            if os.path.isdir(c):
                import shutil
                shutil.rmtree(c)
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(num_buckets, bucket_col))
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_filter_sidecar(pf: PartitionedFilter, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    # one row per pid — including pids that received no keys (their
    # synthesized empty-filter blobs must survive the round trip, or a
    # probe routed to them would have nothing to load)
    tbl = (pd.DataFrame({"pid": range(pf.num_partitions)})
           .merge(pf.metrics, on="pid", how="left"))
    tbl["blob"] = [pf.blobs[int(p)] for p in tbl["pid"]]
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                   os.path.join(path, "partials.parquet"))
    with open(os.path.join(path, "filter_manifest.json"), "w") as fh:
        json.dump({"kind": pf.kind, "P": pf.num_partitions,
                   "salt": pf.salt, "routing": pf.routing,
                   "n_keys": pf.n_keys}, fh)


def build_filter_sidecar(keys_df: DataFrame, sidecar_path: str,
                         key_col: str = "key", kind: str = "bf8",
                         num_partitions: int = 256, salt: int = 0,
                         base_rng_state: int = 0x726B2B9D438B9D4D,
                         shuffle_mode: str = "packed",
                         batches: int = 1, resume: bool = False,
                         _stop_after: Optional[int] = None) -> Optional[dict]:
    """Build a filter of ANY size without the driver ever holding a
    blob: the per-partition partial filters are written straight from
    the executors to ``sidecar_path/partials.parquet`` (a parquet
    directory — `contains_via_sidecar`'s pyarrow dataset read and
    `read_filter_sidecar` both accept it), and only the aggregate
    metrics come back to the driver for the manifest.

    This is the 10^12-key path: `build_partitioned_filter` collects all
    P blobs driver-side for broadcast querying, which hits
    spark.driver.maxResultSize around 10^9 keys (~1.1 GB of bf8 blobs);
    here driver memory stays O(1) and querying routes probes to their
    pid's blob (`contains_via_sidecar`). Per-pid RNG seeds depend only
    on (base_rng_state, pid), so the blobs are byte-identical to the
    in-driver path's. pids that received no keys have no row; the
    routed query treats missing pids as definite non-membership —
    identical semantics to the empty-filter blobs the in-driver path
    synthesizes.

    Resumability (north_rule: resumable from per-partition checkpoints):
    with ``batches > 1`` the pid space is built in that many
    independently-committed write jobs (each scans the input but
    shuffles only its pid range — the standard recompute-vs-checkpoint
    trade: a driver crash loses at most one batch instead of the whole
    build). ``resume=True`` reads the pids already committed to the
    sidecar and skips them; per-pid RNG seeds depend only on
    (base_rng_state, pid), so a resumed build is byte-identical to a
    one-shot build. The manifest is written LAST and is required by the
    readers — an interrupted build is never mistaken for a complete one.
    ``_stop_after`` (test hook) aborts after that many batches to
    simulate a driver crash; no manifest is written and None returned.

    Returns the manifest dict (with n_keys and partition count).
    """
    from pyspark.sql import functions as F
    from pyspark.errors import AnalysisException

    from .build import FILTER_KINDS, partials_dataframe
    from .keys import route_expr

    if kind not in FILTER_KINDS:
        raise ValueError(f"unknown filter kind {kind!r} (bloom: use "
                         "build_partitioned_filter — its blobs are tiny)")
    if shuffle_mode not in ("packed", "chunks"):
        raise ValueError("sidecar build requires packed/chunks shuffle "
                         "(xxhash_pmod routing — the routed query mirrors it)")
    spark = keys_df.sparkSession
    P = num_partitions
    from .keys import require_long_key
    require_long_key(keys_df, key_col, "build_filter_sidecar")
    placed = (keys_df.select(F.col(key_col).alias("key"))
              .where(F.col("key").isNotNull())
              .withColumn("route", route_expr("key", salt)))
    os.makedirs(sidecar_path, exist_ok=True)
    parts_dir = os.path.join(sidecar_path, "partials.parquet")

    # Params pre-manifest, written BEFORE the first batch: the real
    # manifest lands last, so a crashed build leaves only partials —
    # resuming with different kind/P/salt/rng would silently mix
    # incompatible blobs into one sidecar. Mirrors the in-driver
    # checkpoint path's up-front manifest comparison.
    params = {"kind": kind, "P": P, "salt": salt,
              "routing": "xxhash_pmod", "base_rng_state": base_rng_state}
    params_path = os.path.join(sidecar_path, "build_params.json")
    if resume and os.path.exists(params_path):
        with open(params_path) as fh:
            prev = json.load(fh)
        if prev != params:
            raise ValueError(
                "resume=True with incompatible build params: sidecar was "
                f"started with {prev}, this call passed {params}; resuming "
                "would mix incompatible partial blobs — use resume=False "
                "to rebuild from scratch")
    elif resume and os.path.isdir(parts_dir):
        # partials exist but no params pre-manifest (a crashed build
        # from before the guard existed): their parameters are
        # unverifiable, and adopting the NEW params would produce
        # exactly the mixed-blob corruption the guard prevents
        raise ValueError(
            "resume=True but the sidecar has committed partials and no "
            "build_params.json to verify them against — rebuild with "
            "resume=False")
    else:
        # fresh build: drop the OLD manifest first, then stale partials,
        # THEN write the new params. Manifest first: a crash after
        # rmtree but before the new manifest would otherwise leave a
        # complete-looking manifest (old P/salt/blob_bytes) next to
        # new-generation partials, and every reader would happily probe
        # new blobs with old params — silent false negatives. With the
        # manifest gone, readers reject the sidecar until the rebuild
        # completes (manifest is written LAST). Partials before params
        # for the same reason as before: new params next to old
        # partials would let a resume adopt them as done_pids.
        if not resume:
            manifest_path = os.path.join(sidecar_path,
                                         "filter_manifest.json")
            if os.path.exists(manifest_path):
                os.remove(manifest_path)
            if os.path.isdir(parts_dir):
                import shutil
                shutil.rmtree(parts_dir)
        with open(params_path, "w") as fh:
            json.dump(params, fh)

    done_pids: set = set()
    if resume:
        try:
            done_pids = {r.pid for r in spark.read.parquet(parts_dir)
                         .select("pid").distinct().collect()}
        except AnalysisException:
            done_pids = set()  # nothing committed yet

    pid_col = F.pmod(F.col("route"), F.lit(P))
    bounds = [round(b * P / batches) for b in range(batches + 1)]
    for b in range(batches):
        if _stop_after is not None and b >= _stop_after:
            return None  # simulated crash: no manifest, readers reject
        lo, hi = bounds[b], bounds[b + 1]
        if lo == hi:
            continue
        todo = [p for p in range(lo, hi) if p not in done_pids]
        if not todo:
            continue
        sub = placed.where(pid_col.between(lo, hi - 1))
        if len(todo) < hi - lo:
            sub = sub.where(~pid_col.isin(sorted(done_pids & set(range(lo, hi)))))
        partials = partials_dataframe(sub, kind, P, salt,
                                      base_rng_state, None, shuffle_mode)
        # few pid-sorted files (~64 pids each) with SMALL row groups and
        # no compression: a routed probe task reads one ~4 MB row group
        # per pid (a 1 MB blob inside a default 128 MB snappy row group
        # made every pid load decompress the whole group — measured
        # 0.26 M probes/s; filter blobs are high-entropy, compression
        # buys nothing). File grouping is a DETERMINISTIC hash
        # repartition on pid//64 — repartitionByRange samples its child,
        # which re-executes the whole build reduce stage a second time
        # (measured 3.80 s → 2.87 s at 1e7/P=128; the waste scales with
        # the build). Hash collisions may put two pid ranges in one
        # file; sortWithinPartitions keeps each file one sorted run, so
        # row-group stat pruning is unaffected.
        (partials.withColumn("__fg", (F.col("pid") / 64).cast("int"))
         .repartition(max(1, (hi - lo) // 64), "__fg").drop("__fg")
         .sortWithinPartitions("pid")
         .write.mode("append")
         .option("parquet.block.size", str(4 * 1024 * 1024))
         .option("compression", "none")
         .parquet(parts_dir))
    agg = (spark.read.parquet(parts_dir)
           .agg(F.sum("n_keys").alias("n"),
                F.count("*").alias("pids"),
                F.sum(F.length("blob")).alias("blob_bytes"),
                F.max("attempts").alias("max_attempts")).collect()[0])
    manifest = {"kind": kind, "P": num_partitions, "salt": salt,
                "routing": "xxhash_pmod",
                "base_rng_state": base_rng_state,
                "n_keys": int(agg.n or 0), "pids_built": int(agg.pids),
                "blob_bytes": int(agg.blob_bytes or 0),
                "max_attempts": int(agg.max_attempts or 0)}
    with open(os.path.join(sidecar_path, "filter_manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    return manifest


def contains_via_sidecar(probes: DataFrame, sidecar_path: str,
                         key_col: str = "key",
                         num_tasks: Optional[int] = None,
                         max_local_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Membership query against a sidecar filter, two physical shapes:

    * **local** (total blob bytes ≤ ``max_local_bytes``): no shuffle —
      mapInArrow on the input partitioning; every worker PROCESS loads
      the whole sidecar once (cached across tasks) and routes keys in
      numpy. Skips the per-row exchange + Arrow round-trip that
      dominates routed-probe wall time at small/medium P (measured ~4 s
      of a 5.4 s 1e7-row probe at P=128). Differs from the
      ``with_contains`` broadcast path in that blobs never transit the
      driver — workers read the sidecar directly.
    * **routed** (big P / big blobs): shuffle probes to their pid and
      let each task read only its own blobs from the sidecar — constant
      per-worker memory; the 10¹²-key serve shape. ``num_tasks``
      decouples task count from P: repartitioning on the pid expression
      into fewer tasks gives each task a handful of pids (the kernel
      routes per-row and caches each pid's blob). Default: min(P, 16 ×
      defaultParallelism).

    ``max_local_bytes=0`` forces the routed path. Only valid for
    filters built with the default packed shuffle (routing =
    pmod(xxhash64(key, salt), P)).
    """
    import pyspark.sql.functions as F

    from .. import workerside
    from .keys import ROUTING_XXHASH_PMOD, partition_id

    from .keys import require_long_key
    require_long_key(probes, key_col, "contains_via_sidecar")
    with open(os.path.join(sidecar_path, "filter_manifest.json")) as fh:
        m = json.load(fh)
    if m["routing"] != ROUTING_XXHASH_PMOD:
        raise ValueError("sidecar query requires xxhash_pmod routing")
    P, salt = m["P"], m["salt"]

    if 0 < m.get("blob_bytes", 1 << 62) <= max_local_bytes:
        def _probe_local(batches):
            return workerside.contains_sidecar_local(
                batches, sidecar_path, P, salt, key_name=key_col)

        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            for f in probes.schema.fields) + ", contained boolean"
        return probes.mapInArrow(_probe_local, out_schema)

    if num_tasks is None:
        # 2x the cluster parallelism (was 16x): every post-shuffle
        # Python task pays a fixed mapInArrow setup cost that dominated
        # the routed probe at high task counts (identity pass over the
        # same 1e7-row exchange: 0.84 s at 32 tasks, 2.9 s at 128), and
        # the kernel routes per-row regardless of how many pids share a
        # task. Per-task memory stays bounded: ~P/num_tasks blobs,
        # loaded lazily and count-capped in the worker cache.
        par = probes.sparkSession.sparkContext.defaultParallelism
        num_tasks = min(P, max(1, 2 * par))

    # repartition on the pid expression: all rows of one pid land in one
    # task; a task holds ~P/num_tasks pids (kernel routes per-row and
    # caches blobs per pid). Only the probe's own columns transit the
    # exchange — the kernel recomputes the pid from the key with the
    # bit-exact numpy route replica (a precomputed __route column
    # doubled the shuffled bytes of a bare-key probe).
    routed = probes.repartition(num_tasks, partition_id(key_col, P, salt))

    def _probe(batches):
        return workerside.contains_sidecar_route(
            batches, sidecar_path, P, salt, key_name=key_col)

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in routed.schema.fields) + ", contained boolean"
    return routed.mapInArrow(_probe, out_schema)


def register_sql_sidecar(spark: SparkSession, sidecar_path: str,
                         name: str = "ffsk_contains_sidecar",
                         max_local_bytes: int = 2 << 30) -> str:
    """SQL-only membership over a SIDECAR filter — the ≥10⁹-key tier,
    where blobs never transit the driver. After
    ``register_sql_sidecar(spark, path, "f")``, plain
    ``spark.sql("SELECT * FROM t WHERE f(key)")`` probes the sidecar.

    Unlike :meth:`PartitionedFilter.register_sql` (broadcast blobs,
    requires the driver to hold the filter), the workers read the
    sidecar directly from shared storage: driver memory stays O(1)
    regardless of filter size, and each worker PROCESS pays one load
    per sidecar generation (the mtime/size/inode cache token — a
    rebuild at the same path is never answered from stale blobs, and a
    rebuild with different P/salt raises instead of silently routing to
    wrong pids). The pid is recomputed in-kernel (bit-exact numpy
    replica of the JVM route expression), so the UDF takes ONE argument
    and composes anywhere a boolean can.

    A scalar UDF cannot shuffle, so this is the LOCAL probe shape:
    every worker holds all blobs. ``max_local_bytes`` (default 2 GB —
    a fat-executor budget, vs the 128 MB auto-threshold of
    ``contains_via_sidecar``) guards against registering a sidecar too
    big for worker memory; beyond it, use ``contains_via_sidecar``'s
    routed path and join its output instead. Requires the sidecar path
    to be visible to every executor (shared FS / object store — the
    same requirement the probe paths already have)."""
    import pyspark.sql.functions as F

    from .. import workerside
    from .keys import ROUTING_XXHASH_PMOD

    with open(os.path.join(sidecar_path, "filter_manifest.json")) as fh:
        m = json.load(fh)
    if m["routing"] != ROUTING_XXHASH_PMOD:
        raise ValueError("sidecar SQL function requires xxhash_pmod routing")
    blob_bytes = m.get("blob_bytes")
    if blob_bytes is None:
        # driver-written sidecars (write_filter_sidecar) predate the
        # blob_bytes manifest field — size the guard from the partials
        # files themselves (blobs are high-entropy, so file size ≈ blob
        # bytes). Defaulting to 0 would silently bypass the guard in
        # exactly the too-big case it exists for.
        parts = os.path.join(sidecar_path, "partials.parquet")
        if os.path.isdir(parts):
            blob_bytes = sum(os.path.getsize(os.path.join(r, f))
                             for r, _, fs in os.walk(parts) for f in fs)
        elif os.path.exists(parts):
            blob_bytes = os.path.getsize(parts)
        else:
            raise ValueError(
                f"sidecar at {sidecar_path} has a manifest but no "
                "partials.parquet — incomplete or partially copied; "
                "rebuild with build_filter_sidecar/write_filter_sidecar")
    if blob_bytes > max_local_bytes:
        raise ValueError(
            f"sidecar blobs total {blob_bytes} bytes > max_local_bytes="
            f"{max_local_bytes}: too big to hold per-worker for a scalar "
            "SQL UDF — probe via contains_via_sidecar (routed path) and "
            "join, or raise max_local_bytes for fat executors")
    P, salt = m["P"], m["salt"]

    @F.pandas_udf("boolean")
    def _contains_sidecar_sql(key: pd.Series) -> pd.Series:
        return workerside.contains_sidecar_series(sidecar_path, P, salt, key)

    # SQL-defined wrapper coalesces NULLs JVM-side before the kernel
    # (a NULL-containing batch degrades int64→float64 at the Arrow
    # boundary; keys >2^53 lose bits → false negatives) and masks the
    # substitute rows back to False.
    spark.udf.register(f"{name}__kernel", _contains_sidecar_sql)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(k BIGINT) "
        f"RETURNS BOOLEAN RETURN k IS NOT NULL AND "
        f"{name}__kernel(coalesce(k, 0))")
    return name


def read_filter_sidecar(path: str) -> PartitionedFilter:
    import pyarrow.parquet as pq
    with open(os.path.join(path, "filter_manifest.json")) as fh:
        m = json.load(fh)
    rows = pq.read_table(os.path.join(path, "partials.parquet")).to_pandas()
    rows = rows.sort_values("pid").reset_index(drop=True)
    blobs: list = [b"" for _ in range(m["P"])]
    for _, r in rows.iterrows():
        blobs[int(r["pid"])] = bytes(r["blob"])
    # executor-written sidecars omit zero-key pids; synthesize their
    # empty filters (deterministic: per-pid RNG) so queries stay total
    missing = [pid for pid in range(m["P"]) if not blobs[pid]]
    from .. import workerside
    if missing and m["kind"] not in workerside.BLOOM_KINDS:
        from .build import _empty_blob
        rng_base = m.get("base_rng_state", 0x726B2B9D438B9D4D)
        n_total = m.get("n_keys", int(rows["n_keys"].sum()))
        for pid in missing:
            blobs[pid] = _empty_blob(
                m["kind"], n_total, m["P"],
                workerside.part_rng_state(rng_base, pid))
    return PartitionedFilter(m["kind"], m["P"], m["salt"], blobs,
                             rows.drop(columns=["blob"]), m["routing"])
