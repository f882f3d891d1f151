"""Structured Streaming integration for the sketch engine.

The reference's only streaming-flavored surface is ``populateIter``
(build from an iterator, `[U src/binaryfusefilter.zig ≈L200]`); a
static xor/fuse filter cannot be updated in place. The streaming
shapes that ARE sound:

* ``incremental_sketch_sink`` — foreachBatch: every micro-batch's keys
  fold into mergeable sketch state (HLL / CMS / Bloom are algebraic, so
  batch-partial ⊕ state is exact). State lives in a parquet blob table
  next to the stream checkpoint — restart-safe because foreachBatch
  gives exactly-once batch ids (idempotent overwrite keyed by batch id).
* ``windowed_distinct_hll`` — event-time windows + watermark, custom
  stateful operator via ``applyInPandasWithState``: per-window HLL
  registers as GroupState, emitting running distinct estimates; late
  data beyond the watermark is dropped by Spark's state eviction.
* xor/binary-fuse over a stream — rebuild-on-trigger: accumulate keys
  (append sink), rebuild the partitioned filter periodically via the
  batch builder (documented SURVEY.md §2.2; true sliding-window
  membership needs a deletable structure — out of scope, as upstream).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sketches import HyperLogLog
from ..workerside import pd_to_u64


def _guard_marker_without_checkpoint(marker_path: str,
                                     checkpoint_dir: str | None) -> None:
    """Fail fast on the silent-data-loss restart shape: the sinks dedup
    replays by comparing foreachBatch's batch_id against a persisted
    marker, but WITHOUT a checkpoint a fresh run restarts batch ids at
    0 — every new batch would compare <= the old marker and be skipped,
    so new data silently never folds. Reusing existing sink state
    therefore requires the checkpoint that gave those batch ids."""
    if checkpoint_dir is None and os.path.exists(marker_path):
        raise ValueError(
            f"existing sink state at {marker_path} but no checkpoint_dir: "
            "batch ids restart at 0 without a checkpoint and the applied-"
            "batch marker would silently skip all new data. Pass the "
            "original checkpoint_dir or clear the state directory.")


def incremental_sketch_sink(stream_keys: DataFrame, state_dir: str,
                            key_col: str = "key", p: int = 14,
                            checkpoint_dir: str | None = None,
                            trigger_available_now: bool = True):
    """foreachBatch sink folding each micro-batch into one HLL blob —
    the original HLL-specific entry point, now a thin wrapper over
    :func:`incremental_any_sketch_sink` (kind="hll"). A pre-existing
    legacy state layout ({state_dir}/hll.bin + {state_dir}/state.json
    batch marker) is read once, migrated into the atomic
    hll.state.bin on the first fold, and the stale legacy files are
    deleted — read state via :func:`read_incremental_estimate`, never
    from hll.bin directly."""
    return incremental_any_sketch_sink(
        stream_keys, state_dir, kind="hll", key_col=key_col,
        checkpoint_dir=checkpoint_dir,
        trigger_available_now=trigger_available_now,
        _marker_name="state.json", p=p)


def read_incremental_estimate(state_dir: str) -> float:
    return read_incremental_sketch(state_dir, "hll").estimate()


_OUT_SCHEMA = T.StructType([
    T.StructField("window_start", T.StringType()),
    T.StructField("n_est", T.DoubleType()),
    T.StructField("n_events", T.LongType()),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("blob", T.BinaryType()),
    T.StructField("n_events", T.LongType()),
])


_DUR_UNITS = {"second": 1_000, "seconds": 1_000,
              "minute": 60_000, "minutes": 60_000,
              "hour": 3_600_000, "hours": 3_600_000,
              "day": 86_400_000, "days": 86_400_000}


def _duration_ms(s: str) -> int:
    n, unit = s.strip().split()
    return int(n) * _DUR_UNITS[unit.lower()]


def windowed_distinct_hll(stream: DataFrame, ts_col: str, key_col: str,
                          window: str = "1 hour",
                          watermark: str = "2 hours", p: int = 12) -> DataFrame:
    """Custom stateful streaming aggregation: per event-time window, a
    HyperLogLog register set as GroupState; emits updated estimates.

    The HLL registers ARE the state (mergeable, bounded 2^p bytes), so
    state size is constant per window regardless of stream volume — and
    state COUNT is bounded too: each window's state carries an
    event-time timeout at window_end + watermark, past which the
    watermark clock evicts it (NoTimeout would accumulate one state
    entry per window forever on an unbounded stream).
    """
    evict_after_ms = _duration_ms(window) + _duration_ms(watermark)
    # watermarks require TIMESTAMP (tz-aware); parquet often yields NTZ
    keyed = (stream
             .withColumn("__ts", F.col(ts_col).cast("timestamp"))
             .withWatermark("__ts", watermark)
             # keep the watermarked __ts column: event-time timeout
             # requires the watermark to reach the stateful operator
             .select(F.window(F.col("__ts"), window).start.cast("string")
                     .alias("window_start"),
                     # epoch ms travels as a DATA column (not a group
                     # key — adding a grouping column would change the
                     # state-store key schema and break restarts from
                     # existing checkpoints): parsing the session-tz-
                     # formatted string driver-side (pd.Timestamp treats
                     # it as naive UTC) shifts the eviction timestamp by
                     # the zone offset under a non-UTC
                     # spark.sql.session.timeZone — state would evict
                     # early and late rows re-create it
                     F.unix_millis(F.window(F.col("__ts"), window).start)
                     .alias("window_ms"),
                     F.col(key_col).alias("key"),
                     "__ts"))

    def _update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # window closed past the lateness horizon: final estimate
            # was already emitted in update mode — just evict (no rows
            # here, and none needed: window_ms is only read on the
            # with-rows path below)
            state.remove()
            return
        h = (HyperLogLog.from_bytes(bytes(state.get[0]))
             if state.exists else HyperLogLog(p))
        n = state.get[1] if state.exists else 0
        start_ms = None
        for pdf in pdfs:
            if len(pdf):
                if start_ms is None:
                    # exact epoch ms, timezone-proof (constant per group)
                    start_ms = int(pdf["window_ms"].iloc[0])
                h.add(pd_to_u64(pdf["key"]))
                n += len(pdf)
        state.update((h.to_bytes(), n))
        if start_ms is not None:
            state.setTimeoutTimestamp(
                max(start_ms + evict_after_ms,
                    state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame({"window_start": [key[0]],
                            "n_est": [float(h.estimate())],
                            "n_events": [int(n)]})

    return keyed.groupBy("window_start").applyInPandasWithState(
        _update, _OUT_SCHEMA, _STATE_SCHEMA, "update",
        GroupStateTimeout.EventTimeTimeout)


def filter_rebuild_sink(stream_keys: DataFrame, work_dir: str,
                        key_col: str = "key", kind: str = "bf8",
                        num_partitions: int = 8, salt: int = 0,
                        checkpoint_dir: str | None = None,
                        trigger_available_now: bool = True):
    """Rebuild-on-trigger membership filter over a key stream.

    xor/binary-fuse are holistic (a static filter cannot be updated in
    place), so each micro-batch (a) appends its deduped keys to a
    per-batch parquet dir (idempotent overwrite keyed by batch id →
    exactly-once under retries), then (b) refreshes the published
    sidecar: the FIRST batch builds from scratch, later batches take
    the ``add_keys`` incremental path — only partitions that received
    genuinely-new keys rebuild (k/P of full cost), everything else is
    reused verbatim. Because per-pid RNG seeds are fixed, the streamed
    result is byte-identical to a one-shot batch build over the same
    key set (tested), and any reader (with_contains, contains_via_
    sidecar, the ffsk_membership source) can consume the sidecar
    between triggers.

    Bloom kinds ("bloom"/"blockedbloom") also work — ``add_keys``
    reuses the exact first-build geometry so OR-merge stays valid and
    zero FN holds — but their geometry is SIZED FROM BATCH 1's key
    count: a stream that grows far beyond the first batch saturates
    the fixed bit array (FPP degrades toward 1 while FN stays 0).
    Byte-identity with a one-shot build over the full key set does NOT
    hold for them (the one-shot sizes from the full count). Prefer the
    static kinds here unless the final cardinality is known up front.
    """
    from ..spark.build import add_keys, build_partitioned_filter
    from ..spark.io import read_filter_sidecar, write_filter_sidecar

    keys_dir = os.path.join(work_dir, "keys")
    sidecar_dir = os.path.join(work_dir, "sidecar")
    state_path = os.path.join(work_dir, "state.json")
    os.makedirs(keys_dir, exist_ok=True)
    _guard_marker_without_checkpoint(state_path, checkpoint_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        applied = -1
        if os.path.exists(state_path):
            with open(state_path) as fh:
                applied = json.load(fh)["applied"]
        if batch_id <= applied:
            return  # replayed batch after restart — already folded
        new = batch_df.select(F.col(key_col).alias("key")).dropDuplicates()
        new.write.mode("overwrite").parquet(
            os.path.join(keys_dir, f"batch={batch_id}"))
        prev_dirs = [os.path.join(keys_dir, d) for d in os.listdir(keys_dir)
                     if d.startswith("batch=")
                     and int(d.split("=")[1]) != batch_id]
        if prev_dirs and os.path.exists(
                os.path.join(sidecar_dir, "filter_manifest.json")):
            old = spark.read.parquet(*prev_dirs).select("key")
            pf = add_keys(read_filter_sidecar(sidecar_dir), old, new)
        else:
            # no sidecar yet (first batch, or crash before publish):
            # full build over every accumulated batch dir
            all_dirs = prev_dirs + [os.path.join(keys_dir,
                                                 f"batch={batch_id}")]
            pf = build_partitioned_filter(
                spark.read.parquet(*all_dirs).select("key"), kind=kind,
                num_partitions=num_partitions, salt=salt)
        # publish via tmp + swap (same scheme as cuckoo_mutation_sink):
        # an in-place rewrite would let a between-trigger reader see a
        # torn sidecar, and a mid-write crash would leave a valid
        # manifest over corrupt partials
        import shutil
        tmp = sidecar_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_filter_sidecar(pf, tmp)
        shutil.rmtree(sidecar_dir, ignore_errors=True)
        os.rename(tmp, sidecar_dir)
        with open(state_path, "w") as fh:
            json.dump({"applied": batch_id}, fh)

    writer = stream_keys.writeStream.foreachBatch(_fold) \
                        .outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cuckoo_mutation_sink(stream_ops: DataFrame, work_dir: str,
                         key_col: str = "key", op_col: str = "op",
                         width: int = 16, num_partitions: int = 8,
                         salt: int = 0,
                         capacity_per_partition: int = 200_000,
                         base_rng_state: int = 0x726B2B9D438B9D4D,
                         checkpoint_dir: str | None = None,
                         trigger_available_now: bool = True):
    """Streaming membership WITH retractions — the semantic the
    rebuild-on-trigger sink cannot give (xor/fuse are static; deleting
    a key there means a full rebuild without it). Each micro-batch
    carries (key, op) rows with op > 0 = insert, op < 0 = delete; the
    sink folds them into a partitioned cuckoo filter persisted as the
    standard sidecar, readable between triggers by any query path.

    Cuckoo tables cannot grow in place, so each partition's filter is
    pre-sized for ``capacity_per_partition`` keys. Replay safety: the
    applied-batch marker is published inside the sidecar swap, so a
    crash between publish and marker cannot double-apply (the marker
    travels with the state it describes).

    SEMANTICS — batch-wise set delta, NOT an ordered op log: within one
    micro-batch the (key, op) rows are collapsed to a deduped add set
    and a deduped delete set, applied adds-then-deletes. A same-key
    sequence like [delete, insert, delete] inside ONE batch therefore
    does not replay in order (net effect here: one add then one
    delete). Encode per-key NET intent per batch upstream (e.g. keep
    only each key's last op per trigger) if op order within a batch
    matters.
    """
    import shutil

    from .. import workerside
    from ..core.cuckoo import CuckooFilter
    from ..spark.build import PartitionedFilter, cuckoo_update
    from ..spark.io import read_filter_sidecar, write_filter_sidecar

    sidecar_dir = os.path.join(work_dir, "sidecar")
    kind = f"cuckoo{width}"
    _guard_marker_without_checkpoint(
        os.path.join(sidecar_dir, "applied.json"), checkpoint_dir)

    def _fresh_pf() -> PartitionedFilter:
        blobs = [CuckooFilter.empty(
            capacity_per_partition, width,
            workerside.part_rng_state(base_rng_state, pid)).to_bytes()
            for pid in range(num_partitions)]
        metrics = pd.DataFrame({
            "pid": range(num_partitions),
            "n_keys": [0] * num_partitions,
        })
        return PartitionedFilter(kind, num_partitions, salt, blobs, metrics)

    def _recover() -> None:
        """Heal the one non-atomic window: a crash between removing the
        old sidecar and renaming the finished tmp leaves only tmp on
        disk. tmp is complete by construction (it is written, marked,
        THEN the old dir is removed), so adopt it."""
        tmp = sidecar_dir + ".tmp"
        if (not os.path.exists(os.path.join(sidecar_dir, "applied.json"))
                and os.path.exists(os.path.join(tmp, "applied.json"))):
            shutil.rmtree(sidecar_dir, ignore_errors=True)
            os.rename(tmp, sidecar_dir)

    def _applied() -> int:
        p = os.path.join(sidecar_dir, "applied.json")
        if os.path.exists(p):
            with open(p) as fh:
                return json.load(fh)["applied"]
        return -1

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        _recover()
        if batch_id <= _applied():
            return  # replayed batch — marker travels with the sidecar
        adds = batch_df.where(F.col(op_col) > 0) \
                       .select(F.col(key_col).alias("key")).dropDuplicates()
        dels = batch_df.where(F.col(op_col) < 0) \
                       .select(F.col(key_col).alias("key")).dropDuplicates()
        pf = (read_filter_sidecar(sidecar_dir)
              if os.path.exists(os.path.join(sidecar_dir,
                                             "filter_manifest.json"))
              else _fresh_pf())
        # pass through unconditionally: cuckoo_update's bounded collect
        # handles empty frames, and each isEmpty() here was an extra
        # Spark job per trigger
        pf = cuckoo_update(pf, add_df=adds, delete_df=dels)
        tmp = sidecar_dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        write_filter_sidecar(pf, tmp)
        with open(os.path.join(tmp, "applied.json"), "w") as fh:
            json.dump({"applied": batch_id}, fh)
        shutil.rmtree(sidecar_dir, ignore_errors=True)
        os.rename(tmp, sidecar_dir)

    writer = stream_ops.writeStream.foreachBatch(_fold) \
                       .outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivfpq_ingest_sink(stream_vecs: DataFrame, index_dir: str,
                      centroids, codebooks,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      checkpoint_dir: str | None = None,
                      trigger_available_now: bool = True):
    """Streaming ANN ingest: each micro-batch of vectors is coarse-
    assigned + PQ-encoded (the shared ``pipeline.ann.ivfpq_encode``
    kernel) and appended to a servable IVF-PQ index — the shape a
    continuously-arriving embedding corpus needs (a full
    ``write_ivfpq_index`` rebuild per trigger would re-encode
    everything ever seen).

    Layout: ``index_dir/{_ivf_centroids.npy, _pq_codebooks.npy,
    _state.json, batch=N/cell=K/*.parquet}`` — every sidecar and
    marker is underscore-prefixed so Spark's reader ignores them, and
    ``ivfpq_topk_from_index(spark, index_dir, ...)`` serves the live
    index directly between triggers: partition discovery exposes
    (batch, cell) and the probe's cell predicate still prunes cell
    directories inside every batch. Exactly-once under replays via the
    per-batch idempotent overwrite + applied-batch marker (the
    ``filter_rebuild_sink`` scheme). Seal a finished epoch into the
    canonical one-file-per-cell layout with
    ``pipeline.ann.compact_ivfpq_index`` (a long-running ingest
    otherwise accretes ≤ n_cells files per trigger).

    The quantizer is FROZEN for the sink's life — centroids/codebooks
    are written before the first batch and every batch encodes against
    them (retraining mid-stream would mix two quantizers in one index;
    to retrain, compact + rebuild offline). Upstream must dedup ids
    (compose with :func:`dedup_stream`): appended rows are never
    reconciled, so a re-ingested id would serve twice."""
    import numpy as np

    from ..pipeline.ann import (IVF_CENTROIDS_FILE, IVFPQ_CODEBOOKS_FILE,
                                _write_ivfpq_sidecars, ivfpq_encode)

    state_path = os.path.join(index_dir, "_state.json")
    _guard_marker_without_checkpoint(state_path, checkpoint_dir)
    os.makedirs(index_dir, exist_ok=True)
    for fname, arr in ((IVF_CENTROIDS_FILE, centroids),
                       (IVFPQ_CODEBOOKS_FILE, codebooks)):
        dst = os.path.join(index_dir, fname)
        if os.path.exists(dst):
            # restart guard: batches already encoded under the OLD
            # quantizer — appending rows encoded under a different one
            # would silently mix two code spaces in one index
            old = np.load(dst)
            if old.shape != np.shape(arr) or not np.array_equal(
                    old, np.asarray(arr, dtype=old.dtype)):
                raise ValueError(
                    f"{dst} already holds a DIFFERENT quantizer than the "
                    "one passed — an IVF-PQ index cannot mix encodings. "
                    "Resume with the original centroids/codebooks, or "
                    "compact + rebuild offline to retrain.")
    if not os.path.exists(os.path.join(index_dir, IVFPQ_CODEBOOKS_FILE)):
        _write_ivfpq_sidecars(index_dir, centroids, codebooks)

    drift_path = os.path.join(index_dir, "_drift.jsonl")

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation
        applied = -1
        if os.path.exists(state_path):
            with open(state_path) as fh:
                applied = json.load(fh)["applied"]
        if batch_id <= applied:
            return  # replayed batch after restart — already appended
        # drift telemetry rides the write action via observe() — zero
        # extra passes: coarse_dist (1 − cos to the assigned centroid)
        # measures how well the FROZEN quantizer still fits arriving
        # data; a rising mean vs the first epochs means the corpus has
        # drifted and the index needs a retrain + compact cycle.
        obs = Observation()
        enc = ivfpq_encode(batch_df, centroids, codebooks, vec_col,
                           id_col, with_coarse_dist=True)
        enc = enc.observe(obs,
                          F.count(F.lit(1)).alias("n"),
                          F.avg("coarse_dist").alias("mean_coarse_dist"),
                          F.max("coarse_dist").alias("max_coarse_dist"))
        (enc.drop("coarse_dist")
         .repartition(F.col("cell"))
         .write.mode("overwrite")
         .partitionBy("cell")
         .parquet(os.path.join(index_dir, f"batch={batch_id}")))
        row = obs.get
        with open(drift_path, "a") as fh:
            fh.write(json.dumps({"batch": batch_id,
                                 "n": int(row["n"] or 0),
                                 "mean_coarse_dist":
                                     row["mean_coarse_dist"],
                                 "max_coarse_dist":
                                     row["max_coarse_dist"]}) + "\n")
        with open(state_path, "w") as fh:
            json.dump({"applied": batch_id}, fh)

    writer = stream_vecs.writeStream.foreachBatch(_fold) \
                        .outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingest_drift(index_dir: str) -> list:
    """Per-batch quantizer-fit telemetry appended by
    :func:`ivfpq_ingest_sink` -> list of {batch, n, mean_coarse_dist,
    max_coarse_dist} dicts in batch order. The operational alert: a
    sustained rise of ``mean_coarse_dist`` over the first epochs means
    arriving vectors no longer fit the frozen quantizer — schedule a
    retrain + ``compact_ivfpq_index`` cycle.

    Deduped by batch id (last line wins): a crash between the drift
    append and the applied-batch marker replays the batch, whose
    parquet overwrite is idempotent but whose drift line appends
    again — the duplicate must not double-count here."""
    path = os.path.join(index_dir, "_drift.jsonl")
    if not os.path.exists(path):
        return []
    by_batch: dict = {}
    with open(path) as fh:
        for line in fh:
            if line.strip():
                d = json.loads(line)
                by_batch[d["batch"]] = d
    return [by_batch[b] for b in sorted(by_batch)]


def dedup_stream(stream: DataFrame, key_col: str,
                 event_time_col: str | None = None,
                 watermark: str | None = None) -> DataFrame:
    """Streaming exact dedup (dedup-at-ingest): emit each key's FIRST
    row, drop every later duplicate across micro-batches.

    Plain ``dropDuplicates`` keeps unbounded state (all keys ever seen)
    — correct, and fine when the distinct-key working set fits the
    state store (RocksDB-backed at scale). Pass ``event_time_col`` +
    ``watermark`` to bound the state instead:
    ``dropDuplicatesWithinWatermark`` expires seen-keys older than the
    watermark — the standard shape for time-windowed ingest dedup at
    10^12 scale, where "duplicate" means "re-delivered within the
    lateness horizon" (at-least-once sources) rather than "ever seen".
    """
    if (event_time_col is None) != (watermark is None):
        # fail fast: a silent fallback to unbounded state here is an
        # OOM days into a long-running ingest job
        raise ValueError("dedup_stream: pass BOTH event_time_col and "
                         "watermark (bounded state) or NEITHER "
                         "(unbounded dropDuplicates state)")
    if event_time_col is not None:
        return (stream.withWatermark(event_time_col, watermark)
                .dropDuplicatesWithinWatermark([key_col]))
    return stream.dropDuplicates([key_col])


def _stream_sketches() -> dict:
    """kind -> (factory, filename, allowed kwargs, fold). Every entry
    is a MERGEABLE sketch, so batch-partial ⊕ state is exact regardless
    of micro-batch boundaries (the invariant the generic sink relies
    on). ``fold`` says what the column means: "keys" folds uint64 key
    hashes (distinct/frequency sketches), "values" folds float64
    measurements (quantile sketches — streaming p99 latency etc.).
    Function-level import: this module keeps a lean import graph (only
    HyperLogLog loads at module import, for the legacy estimate reader)."""
    from ..sketches import (CountMinSketch, KLLSketch, MisraGries,
                            TDigest, ThetaSketch)
    return {
        "hll": (lambda **kw: HyperLogLog(kw.get("p", 14)),
                "hll.bin", {"p"}, "keys"),
        "cms": (lambda **kw: CountMinSketch(kw.get("eps", 1e-4),
                                            kw.get("delta", 0.01)),
                "cms.bin", {"eps", "delta"}, "keys"),
        "theta": (lambda **kw: ThetaSketch(kw.get("k", 4096)),
                  "theta.bin", {"k"}, "keys"),
        "mg": (lambda **kw: MisraGries(kw.get("k", 64)),
               "mg.bin", {"k"}, "keys"),
        "kll": (lambda **kw: KLLSketch(kw.get("k", 200)),
                "kll.bin", {"k"}, "values"),
        "tdigest": (lambda **kw: TDigest(kw.get("delta", 200.0)),
                    "tdigest.bin", {"delta"}, "values"),
    }


_STATE_MAGIC = b"FFS1"


def _write_sink_state(path: str, last_batch: int, blob: bytes) -> None:
    """Marker + blob in ONE file, published by a single os.replace: a
    crash can never leave a new blob next to an old marker (the replayed
    batch would be folded AGAIN — double-counting for non-idempotent
    sketches like CMS/MG) or vice versa."""
    import struct
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(_STATE_MAGIC + struct.pack("<q", last_batch) + blob)
    os.replace(tmp, path)


def _read_sink_state(path: str):
    """-> (last_batch, blob bytes) or None if absent/foreign."""
    import struct
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        raw = fh.read()
    if len(raw) < 12 or raw[:4] != _STATE_MAGIC:
        raise ValueError(f"corrupt sink state file {path!r}")
    (last_batch,) = struct.unpack_from("<q", raw, 4)
    return last_batch, raw[12:]


def incremental_any_sketch_sink(stream_keys: DataFrame, state_dir: str,
                                kind: str = "hll", key_col: str = "key",
                                checkpoint_dir: str | None = None,
                                trigger_available_now: bool = True,
                                _marker_name: str | None = None,
                                **sketch_kwargs):
    """Generalized :func:`incremental_sketch_sink`: fold each
    micro-batch's keys into ANY mergeable sketch (hll / cms / theta /
    mg over uint64 keys; kll / tdigest over float64 VALUES — streaming
    quantiles) — same exactly-once batch-id marker, same distributed
    partial-per-partition → driver-merge shape (the shuffle-free
    streaming analogue of the batch two-phase aggregation).

    State is per-kind (``{kind}.state.bin``): different kinds can
    coexist in one ``state_dir``, each fed by its own checkpoint — a
    shared marker would make the second kind's fresh batch ids compare
    ≤ the first's and silently fold nothing. The batch marker and the
    blob live in ONE file committed by a single atomic os.replace, so
    exactly-once holds for every kind: with a separate marker written
    after the blob, a crash between the two would fold the replayed
    batch again — harmless for idempotent HLL/theta register merges,
    but a double-count for CMS and MG."""
    sketches = _stream_sketches()
    if kind not in sketches:
        raise ValueError(f"unknown sketch kind {kind!r}: "
                         f"{sorted(sketches)}")
    make, fname, allowed, fold_as = sketches[kind]
    unknown = set(sketch_kwargs) - allowed
    if unknown:
        # silently falling back to defaults would hand the user e.g. a
        # 100× looser CMS than the epsilon= typo intended
        raise TypeError(f"unknown kwargs for sketch kind {kind!r}: "
                        f"{sorted(unknown)} (accepted: {sorted(allowed)})")
    os.makedirs(state_dir, exist_ok=True)
    state_path = os.path.join(state_dir, f"{kind}.state.bin")
    # legacy (pre-atomic) layout: separate blob + json marker. Read for
    # migration; never written again.
    legacy_blob = os.path.join(state_dir, fname)
    legacy_meta = os.path.join(state_dir,
                               _marker_name or f"{kind}.state.json")
    _guard_marker_without_checkpoint(state_path, checkpoint_dir)
    _guard_marker_without_checkpoint(legacy_meta, checkpoint_dir)
    cls = type(make(**sketch_kwargs))

    def _load_state():
        st = _read_sink_state(state_path)
        if st is not None:
            return st
        if os.path.exists(legacy_meta):            # migrate old layout
            with open(legacy_meta) as fh:
                last = json.load(fh).get("last_batch", -1)
            blob = (open(legacy_blob, "rb").read()
                    if os.path.exists(legacy_blob) else b"")
            return last, blob
        return -1, b""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        last_batch, blob = _load_state()
        if last_batch >= batch_id:
            return  # replayed batch — already folded

        def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sk = make(**sketch_kwargs)
            seen = False
            for pdf in batches:
                if len(pdf):
                    col = pdf[key_col].dropna()
                    if fold_as == "values":
                        import numpy as _np
                        sk.add(col.to_numpy(dtype=_np.float64))
                    else:
                        sk.add(pd_to_u64(col))
                    seen = True
            if seen:
                yield pd.DataFrame({"blob": [sk.to_bytes()]})

        partials = (batch_df.select(key_col)
                    .where(F.col(key_col).isNotNull())
                    .mapInPandas(_partial, "blob binary").collect())
        acc = cls.from_bytes(blob) if blob else make(**sketch_kwargs)
        for row in partials:
            acc = acc.merge(cls.from_bytes(bytes(row.blob)))
        _write_sink_state(state_path, batch_id, acc.to_bytes())
        # the migrated legacy files are now strictly BEHIND the atomic
        # state: delete them, or (a) a reader of the old layout gets
        # silently stale estimates forever and (b) a rollback to the
        # pre-atomic code would resume from the stale legacy marker and
        # re-fold already-applied batches (the double-count the atomic
        # file exists to prevent)
        for stale in (legacy_blob, legacy_meta):
            try:
                os.remove(stale)
            except FileNotFoundError:
                pass

    writer = stream_keys.writeStream.foreachBatch(_fold)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_incremental_sketch(state_dir: str, kind: str):
    """Load the folded sketch object back (estimate/query on it)."""
    make, fname, _allowed, _fold = _stream_sketches()[kind]
    cls = type(make())
    st = _read_sink_state(os.path.join(state_dir, f"{kind}.state.bin"))
    if st is not None:
        return cls.from_bytes(st[1])
    with open(os.path.join(state_dir, fname), "rb") as fh:  # legacy layout
        return cls.from_bytes(fh.read())
