"""Per-file data-skipping filter index: point lookups that read only
the files that can contain the key.

The 100 TB serve shape this exists for: a corpus laid out as ~100k
parquet files of ~1 GB. A point lookup (``WHERE key IN (...)``, a few
thousand probe keys) through a plain scan reads every file; parquet
row-group statistics only help if the key column is clustered. A
binary-fuse filter per FILE (~9 bits/key → ~1.1 MB blob per 1M-key
file) answers "can this file contain any probe key?" with zero false
negatives, so the scan list shrinks to the files that actually match —
the same contains() kernel the membership queries use (SURVEY.md §2.1
#4, upstream's `contain`), applied as a scan pruner instead of a row
predicate.

Scale shape, each side bounded:

* **Build** is one groupBy(file) shuffle; each file's blob is built in
  the task that owns the group and written STRAIGHT from the executors
  to ``<index>/files.parquet`` — the driver never holds a blob (the
  same driver-bypass argument as `io.build_filter_sidecar`; a 100k-file
  × 1.1 MB index is 110 GB, driver-collecting it is exactly the
  maxResultSize failure the sidecar path exists to avoid).
* **Prune** is a distributed scan of the index table with the probe
  keys broadcast (point-lookup sets are small by definition); only the
  MATCHED FILE NAMES come back to the driver. 100k files × 10k probe
  keys is ~1e9 vectorized filter probes spread over the cluster —
  milliseconds per index row.
* **Lookup** reads only the matched files and applies the exact
  ``IN`` confirm, so false positives cost I/O (one extra file per FP),
  never correctness: filters have no false negatives, hence the pruned
  scan's result is row-identical to the full scan.

For LARGE probe sets (semi-join scale rather than point-lookup scale)
this is the wrong tool — use the partitioned filter / sidecar
membership path, which routes probes to filter partitions instead of
broadcasting them.

Crash protocol (house style, same as the filter/sketch sidecars): the
manifest is written LAST — readers refuse an index without one, so an
interrupted build is never mistaken for a complete index.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Iterable, List, Optional, Sequence, Union

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_SCHEMA = (
    "file string, kind string, blob binary, n_keys long, "
    "keys_ingested long, bits_per_entry double"
)
_MANIFEST = "skipindex_manifest.json"
_FILES = "files.parquet"


def _as_u64(keys) -> np.ndarray:
    """Probe keys -> uint64 array (signed int64 reinterpreted, the key
    convention everywhere in this repo)."""
    arr = np.asarray(list(keys) if not isinstance(keys, np.ndarray)
                     else keys)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.dtype == np.uint64:
        return arr
    return arr.astype(np.int64).view(np.uint64)


def _write_file_blobs(spark, df, names, key_expr, kind: str,
                      base_rng_state: int, files_path: str,
                      mode: str) -> None:
    """One blob row per file of ``df``, written executor-side.

    Groups on an 8-byte xxhash64(file) fid, NOT the file-name string:
    the per-row shuffle payload is what dominates the build (the
    string variant shuffled ~110 B/row of path — measured 17.2 s vs
    4.1 s at 1e7 keys). The fid→name map is built driver-side from
    the file listing with Spark's own hash (no replica to drift); a
    name collision — which would silently merge two files' filters —
    is detected by the length check and refused. Seeds derive from the
    file NAME, so blobs are independent of the grouping scheme."""
    from .. import workerside

    names = sorted(names)
    fid_rows = (spark.createDataFrame([(n,) for n in names],
                                      "file string")
                .select("file", F.xxhash64("file").alias("fid"))
                .collect())
    fid2name = {r.fid: r.file for r in fid_rows}
    if len(fid2name) != len(names):   # pragma: no cover - 2^-64 event
        raise RuntimeError("xxhash64 collision across file names; "
                           "cannot build a per-file index safely")
    bc = spark.sparkContext.broadcast(fid2name)

    placed = (df.select(F.xxhash64(F.input_file_name()).alias("fid"),
                        key_expr.cast("long").alias("key"))
              .where(F.col("key").isNotNull()))

    def _build(tbl):
        import pyarrow as pa
        fid = tbl.column("fid")[0].as_py()
        name = bc.value[fid]   # KeyError = loud task failure, by design
        raw = (tbl.column("key").to_numpy(zero_copy_only=False)
               .view(np.uint64))
        keys = np.unique(raw)
        filt = workerside._BUILDERS[kind](
            keys, workerside.group_rng_state(base_rng_state, name))
        return pa.Table.from_arrays([
            pa.array([name], pa.string()),
            pa.array([kind], pa.string()),
            pa.array([filt.to_bytes()], pa.binary()),
            pa.array([int(keys.size)], pa.int64()),
            pa.array([int(raw.size)], pa.int64()),
            pa.array([float(filt.bits_per_entry())], pa.float64()),
        ], names=["file", "kind", "blob", "n_keys", "keys_ingested",
                  "bits_per_entry"])

    (placed.groupBy("fid").applyInArrow(_build, _INDEX_SCHEMA)
     .write.mode(mode).parquet(files_path))

    # files whose key column is empty/all-NULL produce no group — give
    # them an (empty-filter, n_keys=0) row anyway so every listed file
    # has exactly one index row (otherwise an incremental update would
    # see them as "missing" and rebuild them forever). The empty blob
    # is deterministic (seed from the name) and ~140 B.
    got = {r.file for r in spark.read.parquet(files_path)
           .select("file").distinct().collect()} if names else set()
    missing = [n for n in names if n not in got]
    if missing:
        empty = np.empty(0, dtype=np.uint64)
        rows = []
        for n in missing:
            filt = workerside._BUILDERS[kind](
                empty, workerside.group_rng_state(base_rng_state, n))
            rows.append((n, kind, bytearray(filt.to_bytes()), 0, 0,
                         float("nan")))
        (spark.createDataFrame(rows, _INDEX_SCHEMA)
         .coalesce(1).write.mode("append").parquet(files_path))


def _index_agg(spark, files_path: str):
    """Manifest aggregates; dropDuplicates makes a re-run after a
    crashed incremental append count each file once (duplicate rows
    carry the same deterministic blob)."""
    return (spark.read.parquet(files_path).dropDuplicates(["file"])
            .agg(F.count("*").alias("files"),
                 F.sum("n_keys").alias("keys"),
                 F.sum(F.length("blob")).alias("blob_bytes"))
            .collect()[0])


def build_file_skipping_index(
        spark: SparkSession, data_path: str, index_path: str,
        key: Union[str, Column], kind: str = "bf8",
        base_rng_state: int = 0x726B2B9D438B9D4D) -> dict:
    """One filter blob per parquet file of ``data_path``, keyed by
    ``key`` (a column name or Column expression evaluating to the
    bigint key — e.g. ``content_key("text")``). Blobs are written
    executor-side; returns the manifest dict.

    Determinism: each file's RNG seed depends only on
    (base_rng_state, file name), so rebuilds are byte-identical
    regardless of parallelism — same contract as the grouped build.
    """
    from .. import workerside

    if kind not in workerside._BUILDERS:
        raise ValueError(f"unknown filter kind {kind!r}; one of "
                         f"{sorted(workerside._BUILDERS)}")
    key_expr = F.col(key) if isinstance(key, str) else key
    df = spark.read.parquet(data_path)

    os.makedirs(index_path, exist_ok=True)
    manifest_path = os.path.join(index_path, _MANIFEST)
    files_path = os.path.join(index_path, _FILES)
    # fresh build: drop the manifest FIRST so a crash mid-write can
    # never leave a complete-looking index over mixed-generation blobs
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    shutil.rmtree(files_path, ignore_errors=True)
    _write_file_blobs(spark, df, df.inputFiles(), key_expr, kind,
                      base_rng_state, files_path, mode="overwrite")

    agg = _index_agg(spark, files_path)
    manifest = {"kind": kind, "base_rng_state": int(base_rng_state),
                "data_path": data_path, "n_files": int(agg.files),
                "n_keys": int(agg.keys or 0),
                "blob_bytes": int(agg.blob_bytes or 0)}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, manifest_path)
    return manifest


def update_file_skipping_index(spark: SparkSession, data_path: str,
                               index_path: str,
                               key: Union[str, Column]) -> dict:
    """Incrementally maintain the index against an append-mostly
    corpus: build blobs ONLY for files not yet indexed, drop rows for
    files that no longer exist, leave everything else byte-untouched.
    At the 100 TB tier this is the only affordable maintenance mode —
    a day's appended files re-index in minutes while a full rebuild
    re-reads the corpus.

    Resumable by construction: the manifest is dropped first and
    re-written last, and the set-difference against the rows already
    in ``files.parquet`` makes a re-run after a crash skip whatever
    committed — duplicate rows (same deterministic blob) are deduped
    at read time, so a crashed append never corrupts the index.
    ``key`` must be the same expression the index was built with
    (per-file blobs are a pure function of (file, key values))."""
    manifest = read_skipping_manifest(index_path)
    kind = manifest["kind"]
    base_rng_state = int(manifest["base_rng_state"])
    files_path = os.path.join(index_path, _FILES)
    manifest_path = os.path.join(index_path, _MANIFEST)

    current = set(spark.read.parquet(data_path).inputFiles())
    idx = spark.read.parquet(files_path)
    indexed = {r.file for r in idx.select("file").distinct().collect()}
    new, orphans = current - indexed, indexed - current
    if not new and not orphans:
        return manifest

    os.remove(manifest_path)   # readers refuse until the update commits
    if orphans:
        # rewrite the (tiny, index-sized) table without orphan rows
        keep = idx.where(~F.col("file").isin(sorted(orphans)))
        tmp_dir = files_path + ".rewrite"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        keep.write.mode("overwrite").parquet(tmp_dir)
        shutil.rmtree(files_path)
        os.rename(tmp_dir, files_path)
    if new:
        key_expr = F.col(key) if isinstance(key, str) else key
        _write_file_blobs(spark, spark.read.parquet(*sorted(new)),
                          new, key_expr, kind, base_rng_state,
                          files_path, mode="append")

    agg = _index_agg(spark, files_path)
    out = dict(manifest, n_files=int(agg.files),
               n_keys=int(agg.keys or 0),
               blob_bytes=int(agg.blob_bytes or 0))
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh)
    os.replace(tmp, manifest_path)
    return out


def read_skipping_manifest(index_path: str) -> dict:
    manifest_path = os.path.join(index_path, _MANIFEST)
    if not os.path.exists(manifest_path):
        raise ValueError(
            f"no {_MANIFEST} under {index_path!r}: the index build is "
            "incomplete or crashed — rebuild with "
            "build_file_skipping_index")
    with open(manifest_path) as fh:
        return json.load(fh)


def prune_files(spark: SparkSession, index_path: str,
                keys) -> List[str]:
    """Files whose filter matches ≥1 probe key (superset of the files
    holding any probe key: no false negatives, FP-rate extra files).
    Distributed over the index table; only matched names are collected."""
    from .. import workerside

    manifest = read_skipping_manifest(index_path)  # refuse partial index
    ku = _as_u64(keys)
    if ku.size == 0:
        return []
    sc = spark.sparkContext
    bc = sc.broadcast(ku.tobytes())

    def _match(it):
        import pyarrow as pa
        probe = np.frombuffer(bc.value, dtype=np.uint64)
        for tbl in it:
            hits = []
            blobs = tbl.column("blob").to_pylist()
            names = tbl.column("file").to_pylist()
            for name, blob in zip(names, blobs):
                filt = workerside.load_filter(bytes(blob))
                if bool(filt.contains(probe).any()):
                    hits.append(name)
            yield pa.RecordBatch.from_arrays(
                [pa.array(hits, pa.string())], names=["file"])

    idx = spark.read.parquet(os.path.join(index_path, _FILES))
    matched = {r.file for r in
               idx.select("file", "blob").mapInArrow(
                   _match, "file string").collect()}
    del manifest
    # set: duplicate index rows (crashed-append replay) dedupe here, so
    # a file is never scanned twice by pruned_lookup
    return sorted(matched)


def pruned_lookup(spark: SparkSession, data_path: str, index_path: str,
                  keys, key: Union[str, Column]) -> DataFrame:
    """Exact point lookup: scan ONLY the index-matched files, then the
    exact ``IN`` confirm — row-identical to the full scan (filters have
    no false negatives; positives are eliminated by the confirm)."""
    key_expr = F.col(key) if isinstance(key, str) else key
    ku = _as_u64(keys)
    signed = [int(x) for x in ku.view(np.int64)]
    files = prune_files(spark, index_path, ku)
    if not files:
        return (spark.read.parquet(data_path)
                .where(F.lit(False)))   # schema-only, zero rows read
    return (spark.read.parquet(*files)
            .where(key_expr.cast("long").isin(signed)))


def skip_stats(spark: SparkSession, index_path: str, keys) -> dict:
    """Pruning telemetry: how much of the corpus a probe set touches."""
    manifest = read_skipping_manifest(index_path)
    matched = prune_files(spark, index_path, keys)
    return {"files_total": manifest["n_files"],
            "files_matched": len(matched),
            "keys_indexed": manifest["n_keys"],
            "index_bytes": manifest["blob_bytes"]}
