"""Resumable, driver-bypass sketch builds with per-partition lineage.

The sketch analog of :func:`fastfilter_spark.spark.io.build_filter_sidecar`
(north_rule: mergeable sketch UDAFs "resumable from checkpoint with
per-partition lineage + metrics"). `sketch_agg`'s two-phase aggregation
is the right shape for interactive queries, but its map-side partials
are per-Arrow-batch — batch boundaries differ run to run, so an
interrupted job can only restart from zero. Here the partial-sketch
unit is a DETERMINISTIC key range instead:

  pid = pmod(xxhash64(value, salt), P)

Each pid's rows are folded into one partial sketch blob — values sorted
inside the fold, so the blob is a pure function of (pid's multiset,
sketch params) even for order-dependent sketches (KLL compaction,
t-digest buffering, MG decrements) — and committed straight from the
executors to ``<sidecar>/partials.parquet``. A resumed build skips the
pids already on disk and is byte-identical to an uninterrupted one
(`tests/test_sketch_sidecar.py` kills a build mid-flight and checks
exactly that). The driver never holds more than the final P-blob merge
(sketch blobs are KBs: P=256 HLL p=14 partials ≈ 4 MB), so the build
side scales to the 10^12-row corpus the same way the filter sidecar
does.

Crash protocol (same as the filter sidecar, same reasoning):
``build_params.json`` is written FIRST (resume refuses mismatched
params — mixing partials built under different sketch geometry would
silently corrupt the merge), the manifest is written LAST (readers
require it, so an interrupted build is never mistaken for a complete
one), and a fresh rebuild removes the old manifest before anything
else (a crash mid-rebuild must not leave a complete-looking manifest
next to new-generation partials).

Lineage: one row per non-empty pid — (pid, n_rows, blob) — queryable
via :func:`sketch_sidecar_lineage`; the manifest aggregates
rows_ingested / pids_built / blob_bytes.

Reference parity: fastfilter's populateIter + checkpointed construction
(SURVEY.md §2.1 #14) applied to the sketch family instead of filters.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sketches import (
    CountMinSketch, HyperLogLog, KLLSketch, MisraGries, TDigest, ThetaSketch,
)
from ..workerside import pd_to_u64

# kind -> (class, value kind). "u64" folds the column as uint64 keys
# (int64 bit-reinterpret, the content-sha256 key convention); "f64"
# folds it as float64 values (quantile sketches).
SKETCH_SIDECAR_KINDS = {
    "hll": (HyperLogLog, "u64"),
    "cms": (CountMinSketch, "u64"),
    "theta": (ThetaSketch, "u64"),
    "mg": (MisraGries, "u64"),
    "kll": (KLLSketch, "f64"),
    "tdigest": (TDigest, "f64"),
}


def _merge(kind: str, a, b):
    return a.union(b) if kind == "theta" else a.merge(b)


def _has_partials(parts_dir: str) -> bool:
    """True iff the partials dir holds at least one committed part file
    (distinguishes 'nothing written yet' from a real read failure — the
    two must not share an exception handler)."""
    return (os.path.isdir(parts_dir)
            and any(f.startswith("part-") for f in os.listdir(parts_dir)))


# r6 negative result, kept so it is not re-tried: a map-side partial
# fold for the order-free kinds (hll/theta — exact commutative monoids,
# byte-identical merge) was implemented and measured SLOWER end-to-end
# at 1e7/P=128 on local[32]: 2.9-3.2 s vs 1.3-1.6 s for the row
# exchange (A/B in one calm window, host control 0.098-0.113). The
# per-(Arrow batch x pid) overhead — pandas groupby, one sketch
# allocation + small-batch fold + serialization per group, ~4096
# groups/run — costs more than shuffling the 16 B rows through the
# RAM-backed local dir it was saving. On a genuinely network-bound
# cluster the trade could reverse (the blobs are ~16 KB x batches x
# pids vs 16 B x rows); revisit only with a real network measurement.
def _fold_pid(kind: str, sketch_kwargs: dict, pdf: pd.DataFrame
              ) -> pd.DataFrame:
    """One pid's rows -> one (pid, n_rows, blob) lineage row. Sorting
    first makes the blob a function of the multiset, not the arrival
    order — the property resume byte-identity rests on."""
    cls, vk = SKETCH_SIDECAR_KINDS[kind]
    sk = cls(**sketch_kwargs)
    if vk == "u64":
        arr = np.sort(pd_to_u64(pdf["__v"]))
    else:
        arr = np.sort(pdf["__v"].to_numpy(dtype=np.float64))
        arr = arr[~np.isnan(arr)]  # sort parks NaN last; add() drops them
    sk.add(arr)
    return pd.DataFrame({"pid": [int(pdf["pid"].iloc[0])],
                         "n_rows": [len(arr)],
                         "blob": [sk.to_bytes()]})


def build_sketch_sidecar(df: DataFrame, sidecar_path: str,
                         kind: str = "hll", col: str = "key",
                         num_partitions: int = 64, salt: int = 0,
                         batches: int = 1, resume: bool = False,
                         _stop_after: Optional[int] = None,
                         **sketch_kwargs) -> Optional[dict]:
    """Build one global sketch over ``df[col]`` as P deterministic
    per-pid partials committed executor-side (module docstring has the
    crash/resume protocol). ``batches > 1`` splits the pid space into
    that many independently-committed write jobs — each rescans the
    input but shuffles only its pid range, so a crash loses at most one
    batch (the recompute-vs-checkpoint trade the filter sidecar makes).
    Size ``num_partitions`` so rows/P fits one task's memory — the same
    knob as the filter build. Returns the manifest dict (None if
    ``_stop_after`` aborted the build — the crash-simulation test hook).
    """
    if kind not in SKETCH_SIDECAR_KINDS:
        raise ValueError(f"unknown sketch kind {kind!r}; one of "
                         f"{sorted(SKETCH_SIDECAR_KINDS)}")
    # fail at plan time, not per-task: the u64 fold bit-reinterprets an
    # int64 key column; the f64 fold casts numerics. A wrong-typed
    # column would otherwise surface as P opaque executor tracebacks.
    vk = SKETCH_SIDECAR_KINDS[kind][1]
    dt = dict((f.name, f.dataType.simpleString())
              for f in df.schema.fields).get(col)
    if vk == "u64" and dt != "bigint":
        raise ValueError(
            f"{kind} sidecar folds uint64 keys: column {col!r} must be "
            f"bigint (got {dt!r}) — derive keys with content_key()")
    if vk == "f64" and dt not in ("double", "float", "bigint", "int",
                                  "smallint", "tinyint") \
            and not (dt or "").startswith("decimal"):
        raise ValueError(
            f"{kind} sidecar folds float64 values: column {col!r} must "
            f"be numeric (got {dt!r})")
    spark = df.sparkSession
    P = int(num_partitions)
    sel = (df.select(F.col(col).alias("__v"))
           .where(F.col("__v").isNotNull()))
    if vk == "f64":
        # drop NaN at INGEST (NaN is not NULL in Spark): the fold skips
        # NaN anyway, so filtering here keeps routing and lineage in
        # agreement — sum(lineage.n_rows) == rows actually folded.
        sel = (sel.withColumn("__v", F.col("__v").cast("double"))
               .where(~F.isnan("__v")))
    sel = sel.withColumn("pid", F.pmod(F.xxhash64("__v", F.lit(salt)),
                                       F.lit(P)).cast("int"))
    os.makedirs(sidecar_path, exist_ok=True)
    parts_dir = os.path.join(sidecar_path, "partials.parquet")
    manifest_path = os.path.join(sidecar_path, "sketch_manifest.json")
    params = {"kind": kind, "P": P, "salt": salt,
              "routing": "xxhash_pmod",
              "sketch_kwargs": dict(sorted(sketch_kwargs.items()))}
    params_path = os.path.join(sidecar_path, "build_params.json")
    if resume and os.path.exists(params_path):
        with open(params_path) as fh:
            prev = json.load(fh)
        if prev != params:
            raise ValueError(
                "resume=True with incompatible build params: sidecar was "
                f"started with {prev}, this call passed {params}; resuming "
                "would merge partials built under different sketch "
                "geometry — use resume=False to rebuild from scratch")
    elif resume and os.path.isdir(parts_dir):
        raise ValueError(
            "resume=True but the sidecar has committed partials and no "
            "build_params.json to verify them against — rebuild with "
            "resume=False")
    else:
        # fresh build: manifest first, then stale partials, then params
        # (ordering rationale: io.build_filter_sidecar, same protocol)
        if os.path.exists(manifest_path):
            os.remove(manifest_path)
        if os.path.isdir(parts_dir):
            shutil.rmtree(parts_dir)
        with open(params_path, "w") as fh:
            json.dump(params, fh)

    done_pids: set = set()
    if resume and _has_partials(parts_dir):
        # deliberately NO try/except: a transient read failure here must
        # abort, not silently mean "nothing committed" — that would
        # re-append every pid and double-fold the merge.
        done_pids = {r.pid for r in spark.read.parquet(parts_dir)
                     .select("pid").distinct().collect()}

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        return _fold_pid(kind, sketch_kwargs, pdf)

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
        sub = sel.where(F.col("pid").between(lo, hi - 1))
        if len(todo) < hi - lo:
            sub = sub.where(
                ~F.col("pid").isin(sorted(done_pids & set(range(lo, hi)))))
        (sub.groupBy("pid")
         .applyInPandas(_fold, "pid int, n_rows long, blob binary")
         .write.mode("append").parquet(parts_dir))

    if _has_partials(parts_dir):
        # NO try/except: a read failure must NOT fall through to a
        # complete-looking manifest claiming 0 rows over real partials.
        agg = (spark.read.parquet(parts_dir)
               .agg(F.sum("n_rows").alias("n"),
                    F.count("*").alias("pids"),
                    F.sum(F.length("blob")).alias("blob_bytes"))
               .collect()[0])
        n_rows, pids, blob_bytes = int(agg.n or 0), int(agg.pids), int(
            agg.blob_bytes or 0)
    else:
        n_rows = pids = blob_bytes = 0  # empty input: no partials written
    manifest = dict(params, rows_ingested=n_rows, pids_built=pids,
                    blob_bytes=blob_bytes)
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    return manifest


def read_sketch_sidecar(sidecar_path: str):
    """-> (merged sketch, manifest dict). Requires the manifest (written
    last), so an interrupted build is rejected rather than returning a
    sketch missing pid ranges — a silent undercount. Partials merge in
    ascending-pid order: with a fixed fold order the merged blob is
    deterministic, which is what the resume-equals-one-shot and
    P-invariance tests assert byte-for-byte."""
    manifest_path = os.path.join(sidecar_path, "sketch_manifest.json")
    if not os.path.exists(manifest_path):
        raise ValueError(
            f"no sketch_manifest.json in {sidecar_path}: build incomplete "
            "or crashed — re-run build_sketch_sidecar(resume=True)")
    with open(manifest_path) as fh:
        m = json.load(fh)
    cls, _ = SKETCH_SIDECAR_KINDS[m["kind"]]
    import pyarrow.dataset as ds
    acc = cls(**m.get("sketch_kwargs", {}))
    parts = os.path.join(sidecar_path, "partials.parquet")
    if os.path.isdir(parts):
        tbl = (ds.dataset(parts, format="parquet")
               .to_table(columns=["pid", "blob"])
               .to_pandas().sort_values("pid"))
        for b in tbl["blob"]:
            acc = _merge(m["kind"], acc, cls.from_bytes(bytes(b)))
    return acc, m


def sketch_sidecar_lineage(spark, sidecar_path: str) -> DataFrame:
    """Per-partition lineage as a DataFrame: (pid, n_rows, blob_bytes).
    The audit surface the north_rule asks for — which key ranges are
    committed, how many rows each ingested, how big each partial is."""
    parts = os.path.join(sidecar_path, "partials.parquet")
    return (spark.read.parquet(parts)
            .select("pid", "n_rows", F.length("blob").alias("blob_bytes"))
            .orderBy("pid"))
