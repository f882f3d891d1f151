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
interrupted build is never mistaken for a complete index. Incremental
updates never delete the manifest: new-file blobs APPEND to the live
table (extra committed rows are correct filters for real files, and a
re-run dedupes), and orphan removal writes a NEW generation directory
that the manifest is atomically repointed to — a crash at any
instruction leaves the previous complete index readable and the
update resumable, never a forced full rebuild.
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


def _commit_manifest(manifest_path: str, manifest: dict) -> dict:
    """The ONE manifest commit protocol (tmp write + atomic os.replace)
    — build, no-op key re-record and update all route here, so a fix to
    the crash-safety story (fsync, encoding, tmp naming) lands once."""
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, manifest_path)
    return manifest


def _files_path(index_path: str, manifest: dict) -> str:
    """The index table's CURRENT generation dir (orphan-removal
    rewrites repoint ``files_dir``; older manifests predate the field)."""
    return os.path.join(index_path, manifest.get("files_dir", _FILES))


def _key_repr(key_expr: Column) -> str:
    """Stable fingerprint of the key expression, persisted in the
    manifest so an update with a DIFFERENT key (whose blobs would
    silently produce false negatives) is refused, not applied."""
    return str(key_expr)


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


def _conf_bytes(spark, key: str, default: int) -> int:
    """A byte-valued Spark conf ("134217728", "128m", "4mb", ...)."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[:-len(suf)], m
            break
    return int(float(raw) * mult)


def _file_sizes(spark, names) -> Optional[List[int]]:
    """Byte sizes of the listed files, or None when fetching them
    cheaply isn't possible. Local paths stat directly; remote
    filesystems pay one driver RPC per file, so they are only worth it
    for small write sets (the incremental-update shape)."""
    local = [n for n in names if n.startswith("file:")]
    if len(local) == len(names):
        try:
            return [os.path.getsize(n[len("file:"):]) for n in names]
        except OSError:
            return None
    if len(names) > 512:
        return None
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        out = []
        for n in names:
            p = jvm.org.apache.hadoop.fs.Path(n)
            out.append(p.getFileSystem(conf).getFileStatus(p).getLen())
        return out
    except Exception:
        return None


def _files_task_atomic(spark, names) -> bool:
    """True iff Spark's scan planner will NOT split any of these files
    across tasks, with a 2x safety margin. Replicates
    FilePartition.maxSplitBytes (stable across Spark 3.x/4.x):
    min(maxPartitionBytes, max(openCostInBytes, totalBytes/minPartNum)).
    When every file is task-atomic the per-file blobs can be built
    INSIDE the scan stage — the groupBy exchange of every corpus row
    is removed outright (guide §2.4). A wrong answer here cannot
    corrupt the index: the builder path verifies post-write that no
    file produced two distinct blobs and fails loudly."""
    if not names or len(names) > 16384:
        return False
    sizes = _file_sizes(spark, names)
    if sizes is None:
        return False
    max_pb = _conf_bytes(spark, "spark.sql.files.maxPartitionBytes",
                         128 << 20)
    open_cost = _conf_bytes(spark, "spark.sql.files.openCostInBytes",
                            4 << 20)
    try:
        min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:
        min_pn = spark.sparkContext.defaultParallelism
    total = sum(sizes) + len(sizes) * open_cost
    bytes_per_core = total / max(1, min_pn)
    max_split = min(max_pb, max(open_cost, bytes_per_core))
    return max(sizes) <= max_split / 2


def _write_file_blobs(spark, df, names, key_expr, kind: str,
                      base_rng_state: int, files_path: str,
                      mode: str) -> Optional[dict]:
    """One blob row per file of ``df``, written executor-side.

    Groups on an 8-byte xxhash64(file) fid, NOT the file-name string:
    the per-row shuffle/Arrow payload is what dominates the build (the
    string variant shuffled ~110 B/row of path — measured 17.2 s vs
    4.1 s at 1e7 keys). The fid→name map is computed DRIVER-side with
    the bit-exact XXH64 replica (r6: the previous createDataFrame +
    collect round trip cost a 0.35 s Spark job for 32 names; a replica
    drift would surface as a loud fid2name KeyError in the builder
    task, and parity is pinned by test_hashing). A name collision —
    which would silently merge two files' filters — is detected by the
    length check and refused. Seeds derive from the file NAME, so
    blobs are independent of the grouping scheme.

    Returns a summary dict {files, keys, blob_bytes} over THIS write's
    rows when the zero-shuffle path ran (its split-detection job sees
    every row anyway — a fresh build can derive the manifest from it
    without re-scanning the index table), else None."""
    from ..core.hashing import xxhash64_bytes
    from .. import workerside

    names = sorted(names)
    fid2name = {}
    for n in names:
        h = xxhash64_bytes(n.encode("utf-8"), 42)
        fid2name[h - (1 << 64) if h >= (1 << 63) else h] = n
    if len(fid2name) != len(names):   # pragma: no cover - 2^-64 event
        raise RuntimeError("xxhash64 collision across file names; "
                           "cannot build a per-file index safely")
    bc = spark.sparkContext.broadcast(fid2name)

    placed = (df.select(F.xxhash64(F.input_file_name()).alias("fid"),
                        key_expr.cast("long").alias("key"))
              .where(F.col("key").isNotNull()))

    atomic = _files_task_atomic(spark, names)
    if atomic:
        # zero-shuffle build (guide §2.4): every file is task-atomic,
        # so each scan task holds whole files and the per-file blobs
        # are built inside the scan stage — the groupBy exchange of
        # (fid, key) for every corpus row is gone (measured 2.8 s ->
        # ~1.5 s at 1e7 keys / 32 files). Blobs are byte-identical
        # (seeds derive from the file name, not the grouping).
        def _build_scan(batches):
            return workerside.build_file_blobs_scan(
                batches, kind, base_rng_state, bc.value)

        (placed.mapInArrow(_build_scan, _INDEX_SCHEMA)
         .write.mode(mode).parquet(files_path))
    else:
        def _build(tbl):
            return workerside.build_file_blob(tbl, kind, base_rng_state,
                                              bc.value)

        (placed.groupBy("fid").applyInArrow(_build, _INDEX_SCHEMA)
         .write.mode(mode).parquet(files_path))

    # files whose key column is empty/all-NULL produce no group — give
    # them an (empty-filter, n_keys=0) row anyway so every listed file
    # has exactly one index row (otherwise an incremental update would
    # see them as "missing" and rebuild them forever). The empty blob
    # is deterministic (seed from the name) and ~140 B. For a small
    # write set (the daily-update shape) push the name filter into the
    # scan so the check touches this write's rows, not the whole index
    # table; a fresh build (names = everything) keeps the plain
    # column-pruned distinct — a 100k-literal IN would bloat the plan.
    chk = spark.read.parquet(files_path)
    if 0 < len(names) <= 1024:
        chk = chk.where(F.col("file").isin(names))
    summary = None
    if atomic:
        # hard guard behind the split prediction: a file that WAS
        # split across scan tasks yields 2+ DISTINCT partial blobs —
        # fail loudly instead of committing an index with partial
        # filters (benign duplicate rows from a crashed re-run are
        # byte-identical and pass). One job, shared with the
        # missing-file check below AND (fresh builds) the manifest
        # aggregates — no extra scan of the index table.
        per = (chk.groupBy("file")
               .agg(F.count_distinct(F.xxhash64("blob")).alias("nb"),
                    F.first("n_keys").alias("n_keys"),
                    F.first(F.length("blob")).alias("blob_bytes"))
               .collect())
        split = [r.file for r in per if r.nb > 1]
        if split:
            raise RuntimeError(
                "skip-index scan-stage build produced partial blobs for "
                f"split files {split[:3]}... — the task-atomicity "
                "prediction disagreed with Spark's scan planner on this "
                "version; rebuild with build_file_skipping_index (the "
                "grouped path) and report the Spark version")
        got = {r.file for r in per} if names else set()
        summary = {"files": len(per),
                   "keys": int(sum(r.n_keys for r in per)),
                   "blob_bytes": int(sum(r.blob_bytes for r in per))}
    else:
        got = ({r.file for r in chk.select("file").distinct().collect()}
               if names else set())
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
        if summary is not None:
            summary["files"] += len(rows)
            summary["blob_bytes"] += sum(len(r[2]) for r in rows)
    return summary


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
    # (incremental updates never delete it; a full rebuild is the one
    # operation that starts from nothing), then clear every generation
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    for d in os.listdir(index_path):
        if d == _FILES or d.startswith(_FILES + ".g"):
            shutil.rmtree(os.path.join(index_path, d),
                          ignore_errors=True)
    summary = _write_file_blobs(spark, df, df.inputFiles(), key_expr, kind,
                                base_rng_state, files_path,
                                mode="overwrite")
    if summary is None:
        # grouped-path build: one agg scan of the (small) index table
        agg = _index_agg(spark, files_path)
        summary = {"files": int(agg.files), "keys": int(agg.keys or 0),
                   "blob_bytes": int(agg.blob_bytes or 0)}
    manifest = {"kind": kind, "base_rng_state": int(base_rng_state),
                "data_path": data_path, "files_dir": _FILES,
                "key_repr": _key_repr(key_expr),
                "n_files": summary["files"],
                "n_keys": summary["keys"],
                "blob_bytes": summary["blob_bytes"]}
    return _commit_manifest(manifest_path, manifest)


def update_file_skipping_index(spark: SparkSession, data_path: str,
                               index_path: str,
                               key: Union[str, Column],
                               allow_key_mismatch: bool = False) -> dict:
    """Incrementally maintain the index against an append-mostly
    corpus: build blobs ONLY for files not yet indexed, drop rows for
    files that no longer exist, leave everything else byte-untouched.
    At the 100 TB tier this is the only affordable maintenance mode —
    a day's appended files re-index in minutes while a full rebuild
    re-reads the corpus.

    Resumable by construction — the manifest is NEVER deleted, so a
    crash at any instruction leaves a complete, readable index and the
    next call picks up where the crash left off:

    * new files APPEND to the live table. A crashed append commits
      either nothing or correct blobs for real files (benign to
      readers); the re-run's set-difference skips whatever committed,
      and duplicate rows (same deterministic blob) dedupe at read.
    * orphan removal writes a NEW generation directory and atomically
      repoints the manifest's ``files_dir`` at it; a crash mid-write
      leaves the old generation (with stale-but-harmless orphan rows —
      the lookup path ignores missing files) as the live one.
    * superseded generations are NOT deleted at commit time — a reader
      that resolved the manifest just before the repoint can still
      finish its scan. They are swept at the START of the next update
      (anything under ``files.parquet*`` other than the manifest's
      current ``files_dir`` is garbage by then), so the grace period
      is one full update interval and crashed updates never leak
      generations permanently.

    ``key`` must be the same expression the index was built with
    (per-file blobs are a pure function of (file, key values)) — a
    mismatched expression is refused via the manifest's ``key_repr``
    fingerprint instead of silently poisoning new files' blobs. The
    fingerprint is ``str(Column)``, which can legitimately change
    across Spark versions (expression repr formatting) — pass
    ``allow_key_mismatch=True`` after verifying the expression really
    is the build's to accept and re-record it. Manifests written
    before the fingerprint existed can't be verified: the first
    update records the caller's key unchecked, so on a legacy index
    make sure that first call passes the true build key."""
    manifest = read_skipping_manifest(index_path)
    kind = manifest["kind"]
    base_rng_state = int(manifest["base_rng_state"])
    key_expr = F.col(key) if isinstance(key, str) else key
    want = manifest.get("key_repr")
    if (want is not None and _key_repr(key_expr) != want
            and not allow_key_mismatch):
        raise ValueError(
            f"update key {_key_repr(key_expr)!r} does not match the "
            f"index's build key {want!r}: blobs built over a different "
            "expression would silently produce false negatives — pass "
            "the build's key (or allow_key_mismatch=True if the repr "
            "changed across Spark versions and you have verified the "
            "expression), or rebuild with build_file_skipping_index")
    files_path = _files_path(index_path, manifest)
    manifest_path = os.path.join(index_path, _MANIFEST)

    # sweep generations superseded (or orphaned by a crash) before the
    # previous update — the one-interval grace period readers get
    live_dir = os.path.basename(files_path)
    for d in os.listdir(index_path):
        if ((d == _FILES or d.startswith(_FILES + ".g"))
                and d != live_dir):
            shutil.rmtree(os.path.join(index_path, d),
                          ignore_errors=True)

    current = set(spark.read.parquet(data_path).inputFiles())
    idx = spark.read.parquet(files_path)
    indexed = {r.file for r in idx.select("file").distinct().collect()}
    new, orphans = current - indexed, indexed - current
    if not new and not orphans:
        # still re-record the key fingerprint on a quiescent corpus:
        # the escape-hatch migration (and the legacy backfill) must
        # take effect even when there is no blob work, or the next
        # unflagged update re-raises the mismatch it just accepted
        if manifest.get("key_repr") != _key_repr(key_expr):
            return _commit_manifest(
                manifest_path, dict(manifest, key_repr=_key_repr(key_expr)))
        return manifest

    files_dir = manifest.get("files_dir", _FILES)
    if new:
        _write_file_blobs(
            spark,
            spark.read.option("basePath", data_path)
            .parquet(*sorted(new)),
            new, key_expr, kind, base_rng_state, files_path,
            mode="append")
    if orphans:
        # rewrite the (tiny, index-sized) table without orphan rows
        # into the NEXT generation dir; the manifest repoint below is
        # the atomic commit, after which the old generation is garbage.
        # Anti-join, NOT isin: a mass-deletion day orphans ~100k files
        # and a 100k-literal IN bloats the plan to MBs (the same cap
        # _write_file_blobs enforces at 1024 literals).
        orphan_df = spark.createDataFrame(
            [(o,) for o in sorted(orphans)], "file string")
        keep = (spark.read.parquet(files_path)
                .join(F.broadcast(orphan_df), "file", "left_anti"))
        gen = int(files_dir.rsplit(".g", 1)[1]) + 1 \
            if ".g" in files_dir else 1
        new_dir = f"{_FILES}.g{gen}"
        new_path = os.path.join(index_path, new_dir)
        shutil.rmtree(new_path, ignore_errors=True)
        keep.write.mode("overwrite").parquet(new_path)
        files_path, files_dir = new_path, new_dir

    agg = _index_agg(spark, files_path)
    out = dict(manifest, files_dir=files_dir,
               key_repr=_key_repr(key_expr),
               n_files=int(agg.files), n_keys=int(agg.keys or 0),
               blob_bytes=int(agg.blob_bytes or 0))
    _commit_manifest(manifest_path, out)   # atomic commit of the update
    # the generation superseded by this commit is intentionally NOT
    # deleted here: in-flight readers that resolved the manifest
    # pre-repoint may still be scanning it. The next update's
    # start-of-run sweep collects it — the grace-period contract.
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

    # loaded for its refuse-partial-index guard AND the current
    # generation dir (orphan rewrites repoint files_dir)
    manifest = read_skipping_manifest(index_path)
    ku = _as_u64(keys)
    if ku.size == 0:
        return []
    bc = spark.sparkContext.broadcast(ku.tobytes())

    def _match(it):
        return workerside.match_skip_blobs(it, bc.value)

    idx = spark.read.parquet(_files_path(index_path, manifest))
    matched = {r.file for r in
               idx.select("file", "blob").mapInArrow(
                   _match, "file string").collect()}
    # set: duplicate index rows (crashed-append replay) dedupe here, so
    # a file is never scanned twice by pruned_lookup
    return sorted(matched)


def pruned_lookup(spark: SparkSession, data_path: str, index_path: str,
                  keys, key: Union[str, Column],
                  files: Optional[List[str]] = None) -> DataFrame:
    """Exact point lookup: scan ONLY the index-matched files, then the
    exact ``IN`` confirm — row-identical to the full scan of the
    CURRENT corpus (filters have no false negatives; positives are
    eliminated by the confirm). ``basePath`` keeps hive partition
    columns resolvable on the per-file read, and missing files are
    ignored: a matched file can have been deleted from the corpus
    after indexing (the orphan window before the next incremental
    update), and the full scan would not read it either. Pass
    ``files`` (from :func:`prune_files`) to reuse an already-computed
    match list — :func:`skip_stats` + lookup is the natural pairing
    and should pay the distributed prune once."""
    key_expr = F.col(key) if isinstance(key, str) else key
    ku = _as_u64(keys)
    signed = [int(x) for x in ku.view(np.int64)]
    if files is None:
        files = prune_files(spark, index_path, ku)
    files = _existing_files(spark, files)
    if not files:
        return (spark.read.parquet(data_path)
                .where(F.lit(False)))   # schema-only, zero rows read
    return (spark.read.option("basePath", data_path).parquet(*files)
            .where(key_expr.cast("long").isin(signed)))


def _existing_files(spark: SparkSession, files: List[str]) -> List[str]:
    """Drop matched files that no longer exist (deleted from the
    corpus after indexing — the orphan window before the next
    incremental update closes it). Spark refuses an explicit missing
    path at read resolution (PATH_NOT_FOUND; the ignoreMissingFiles
    option only covers deletion AFTER the DataFrame is built), so the
    check runs here via the Hadoop FileSystem API — portable across
    file:/hdfs:/s3 URIs, one driver-side exists() per MATCHED file
    (point-lookup match lists are small by definition)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    out = []
    for f in files:
        p = jvm.org.apache.hadoop.fs.Path(f)
        if p.getFileSystem(conf).exists(p):
            out.append(f)
    return out


def skip_stats(spark: SparkSession, index_path: str, keys,
               matched: Optional[List[str]] = None) -> dict:
    """Pruning telemetry: how much of the corpus a probe set touches.
    Pass ``matched`` (from :func:`prune_files`) to avoid re-running
    the distributed prune when the caller also does the lookup.

    ``files_total`` is ``max(manifest n_files, files_matched)``:
    between a crashed new-file append and the next successful update
    the manifest's n_files lags the live table, and a stale total
    would let files_matched exceed files_total and flip pruned-ratio
    monitors — the clamp closes that window WITHOUT launching a
    per-call count job over the index table (telemetry must stay
    cheaper than the prune it describes). keys_indexed / index_bytes
    stay manifest-sourced (approximate until the next committed
    update, documented)."""
    manifest = read_skipping_manifest(index_path)
    if matched is None:
        matched = prune_files(spark, index_path, keys)
    return {"files_total": max(int(manifest["n_files"]), len(matched)),
            "files_matched": len(matched),
            "keys_indexed": manifest["n_keys"],
            "index_bytes": manifest["blob_bytes"]}
