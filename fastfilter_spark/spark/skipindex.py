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

    # Group on an 8-byte xxhash64(file) fid, NOT the file-name string:
    # the per-row shuffle payload is what dominates the build (the
    # string variant shuffled ~110 B/row of path — measured 17.2 s vs
    # ~5 s at 1e7 keys). The fid→name map is built driver-side from
    # inputFiles() with Spark's own hash (no replica to drift), and a
    # name collision — which would silently merge two files' filters —
    # is detected by the length check and refused.
    names = df.inputFiles()
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

    os.makedirs(index_path, exist_ok=True)
    manifest_path = os.path.join(index_path, _MANIFEST)
    files_path = os.path.join(index_path, _FILES)
    # fresh build: drop the manifest FIRST so a crash mid-write can
    # never leave a complete-looking index over mixed-generation blobs
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    shutil.rmtree(files_path, ignore_errors=True)
    (placed.groupBy("fid").applyInArrow(_build, _INDEX_SCHEMA)
     .write.mode("overwrite").parquet(files_path))

    agg = (spark.read.parquet(files_path)
           .agg(F.count("*").alias("files"),
                F.sum("n_keys").alias("keys"),
                F.sum(F.length("blob")).alias("blob_bytes")).collect()[0])
    manifest = {"kind": kind, "base_rng_state": int(base_rng_state),
                "data_path": data_path, "n_files": int(agg.files),
                "n_keys": int(agg.keys or 0),
                "blob_bytes": int(agg.blob_bytes or 0)}
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, manifest_path)
    return manifest


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
    matched = [r.file for r in
               idx.select("file", "blob").mapInArrow(
                   _match, "file string").collect()]
    del manifest
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
