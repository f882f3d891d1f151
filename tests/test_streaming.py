"""Structured Streaming: incremental sketch folding (foreachBatch) and
custom stateful windowed HLL (applyInPandasWithState)."""

import glob
import os
import time

import pytest
from pyspark.sql import functions as F

from fastfilter_spark.streaming.incremental import (
    incremental_sketch_sink, read_incremental_estimate, windowed_distinct_hll,
)


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """Split sf0.001 events into 3 parquet files to force multiple
    micro-batches via maxFilesPerTrigger."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = str(tmp_path / "stream_src")
    src.repartition(3).write.parquet(out)
    return out


def test_incremental_hll_foreachbatch(spark, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    exact = batch.select("user_id").distinct().count()

    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(events_stream_dir)
              .select(F.xxhash64("user_id").alias("key")))
    state_dir = str(tmp_path / "state")
    q = incremental_sketch_sink(stream, state_dir,
                                checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)
    est = read_incremental_estimate(state_dir)
    assert abs(est - exact) / exact < 0.05

    # restart with no new data: estimate unchanged (idempotent replay)
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1)
               .parquet(events_stream_dir)
               .select(F.xxhash64("user_id").alias("key")))
    q2 = incremental_sketch_sink(stream2, state_dir,
                                 checkpoint_dir=str(tmp_path / "ck"))
    q2.awaitTermination(120)
    assert read_incremental_estimate(state_dir) == est


def test_windowed_distinct_hll_state(spark, events_stream_dir, tmp_path):
    batch = spark.read.parquet(events_stream_dir)
    exact = {r.w: r.c for r in
             (batch.select(F.window("ts", "1 day").start.cast("string")
                           .alias("w"), "user_id")
              .groupBy("w").agg(F.countDistinct("user_id").alias("c"))
              .collect())}

    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(events_stream_dir)
              .select("ts", F.xxhash64("user_id").alias("key")))
    # the random 3-way file split delivers rows up to ~30 days late, so
    # the watermark must cover that lateness (the operator's eviction
    # honors the watermark CONTRACT: state older than window+watermark
    # is dropped, and such late rows would lose their state)
    out = windowed_distinct_hll(stream, "ts", "key", window="1 day",
                                watermark="40 days", p=12)
    q = (out.writeStream.format("memory").queryName("win_hll")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    # last update per window wins
    res = spark.sql("SELECT window_start, n_est, n_events FROM win_hll").toPandas()
    last = res.groupby("window_start").last()
    assert len(last) == len(exact)
    for w, c in exact.items():
        est = last.loc[w, "n_est"]
        assert abs(est - c) / c < 0.08, (w, est, c)


def test_windowed_hll_state_eviction(spark, tmp_path):
    """With time-ordered input honoring the watermark contract, closed
    windows' state must be EVICTED (event-time timeout) — NoTimeout
    would accumulate one state row per window forever."""
    import json as _json

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ordered = str(tmp_path / "ordered")
    # three sequential time ranges → lateness ≤ one trigger, << watermark
    src.repartitionByRange(3, "ts").sortWithinPartitions("ts") \
       .write.parquet(ordered)
    n_windows = src.select(
        F.window("ts", "1 day").start).distinct().count()

    stream = (spark.readStream.schema(src.schema)
              .option("maxFilesPerTrigger", 1).parquet(ordered)
              .select("ts", F.xxhash64("user_id").alias("key")))
    out = windowed_distinct_hll(stream, "ts", "key", window="1 day",
                                watermark="1 day", p=12)
    q = (out.writeStream.format("memory").queryName("win_evict")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "cke"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    state_rows = [
        op["numRowsTotal"]
        for p in q.recentProgress
        for op in _json.loads(p.json).get("stateOperators", [])
        if "numRowsTotal" in op
    ]
    assert state_rows, "no state-operator progress recorded"
    # without eviction the last trigger would hold ~n_windows state
    # rows; with it, only the unexpired tail survives
    assert min(state_rows[-2:]) < n_windows


def test_filter_rebuild_sink_byte_identical_to_batch(spark, events_stream_dir,
                                                     tmp_path):
    from fastfilter_spark.spark import build_partitioned_filter
    from fastfilter_spark.spark.io import read_filter_sidecar
    from fastfilter_spark.streaming import filter_rebuild_sink

    batch = spark.read.parquet(events_stream_dir)
    schema = batch.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(events_stream_dir)
              .select(F.xxhash64("user_id").alias("key")))
    work = str(tmp_path / "rebuild")
    q = filter_rebuild_sink(stream, work, kind="bf8", num_partitions=8,
                            checkpoint_dir=str(tmp_path / "ck2"))
    q.awaitTermination(180)
    streamed = read_filter_sidecar(os.path.join(work, "sidecar"))

    keys = batch.select(F.xxhash64("user_id").alias("key"))
    oneshot = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    assert streamed.blobs == oneshot.blobs  # byte-identical publish
    # and it answers membership with zero FN
    probed = streamed.with_contains(keys, "key")
    assert probed.where("NOT contained").count() == 0
    # multiple micro-batches actually happened (incremental path ran)
    assert len(glob.glob(os.path.join(work, "keys", "batch=*"))) >= 2


def test_cuckoo_mutation_sink_insert_and_delete(spark, tmp_path):
    """Streaming membership with retractions: batch 1 inserts A∪B,
    batch 2 deletes B and inserts C → final sidecar contains exactly
    A∪C (zero FN) with B removed (only hash-collision residue)."""
    import numpy as np

    from fastfilter_spark.spark.io import read_filter_sidecar
    from fastfilter_spark.streaming import cuckoo_mutation_sink

    src = tmp_path / "ops_src"
    src.mkdir()
    A = list(range(1000, 2000))
    B = list(range(5000, 5500))
    C = list(range(9000, 9250))
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(
        {"key": A + B, "op": [1] * (len(A) + len(B))})),
        str(src / "b1.parquet"))

    work = str(tmp_path / "work")
    stream = (spark.readStream.schema("key long, op long")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = cuckoo_mutation_sink(stream, work, width=16, num_partitions=4,
                             capacity_per_partition=4096,
                             checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)

    pq.write_table(pa.Table.from_pandas(pd.DataFrame(
        {"key": B + C, "op": [-1] * len(B) + [1] * len(C)})),
        str(src / "b2.parquet"))
    stream2 = (spark.readStream.schema("key long, op long")
               .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q2 = cuckoo_mutation_sink(stream2, work, width=16, num_partitions=4,
                              capacity_per_partition=4096,
                              checkpoint_dir=str(tmp_path / "ck"))
    q2.awaitTermination(120)

    pf = read_filter_sidecar(work + "/sidecar")
    present = np.array(A + C, dtype=np.uint64)
    gone = np.array(B, dtype=np.uint64)
    assert pf.contains_local(present).all()          # zero FN
    assert pf.contains_local(gone).mean() < 0.01     # residue = collisions


def test_dedup_stream_across_microbatches(spark, tmp_path):
    """dedup_stream must drop duplicates ACROSS micro-batches (state
    survives the trigger): 3 files with overlapping keys → exactly one
    emitted row per distinct key, first-seen wins."""
    import uuid

    from fastfilter_spark.streaming import dedup_stream

    src = str(tmp_path / "dsrc")
    # file i carries keys [10*i .. 10*i + 14] → overlap between files
    for i in range(3):
        spark.createDataFrame(
            [(10 * i + j, f"batch{i}") for j in range(15)],
            "key long, origin string").coalesce(1).write.mode(
            "append").parquet(src)
    batch = spark.read.parquet(src)
    n_distinct = batch.select("key").distinct().count()

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    qname = "dd_" + uuid.uuid4().hex[:8]
    q = (dedup_stream(stream, "key").writeStream.format("memory")
         .queryName(qname).outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(f"SELECT key, origin FROM {qname}")
    assert got.count() == n_distinct
    assert got.select("key").distinct().count() == n_distinct

    # watermark-bounded variant compiles to the state-expiring operator
    ts_stream = (spark.readStream.schema(batch.schema)
                 .option("maxFilesPerTrigger", 1).parquet(src)
                 .withColumn("ts", F.current_timestamp()))
    wm = dedup_stream(ts_stream, "key", event_time_col="ts",
                      watermark="10 minutes")
    qn2 = "ddw_" + uuid.uuid4().hex[:8]
    q2 = (wm.writeStream.format("memory").queryName(qn2)
          .outputMode("append")
          .option("checkpointLocation", str(tmp_path / "ck2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert spark.sql(f"SELECT COUNT(*) c FROM {qn2}").collect()[0].c \
        == n_distinct


def test_windowed_hll_non_utc_session_timezone(spark, events_stream_dir,
                                               tmp_path):
    """Eviction timestamps now come from unix_millis(window.start) on the
    JVM, travelling with the group key — a non-UTC session timezone must
    not shift eviction or the estimates (the old driver-side
    pd.Timestamp parse of the session-tz-formatted window string treated
    it as naive UTC, evicting early by the zone offset)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        batch = spark.read.parquet(events_stream_dir)
        # mirror the operator: it casts NTZ→timestamp, whose windows
        # split at UTC-epoch multiples, not naive midnight
        exact = {r.w: r.c for r in
                 (batch.select(F.window(F.col("ts").cast("timestamp"),
                                        "1 day").start.cast("string")
                               .alias("w"), "user_id")
                  .groupBy("w").agg(F.countDistinct("user_id").alias("c"))
                  .collect())}
        stream = (spark.readStream.schema(batch.schema)
                  .option("maxFilesPerTrigger", 1)
                  .parquet(events_stream_dir)
                  .select("ts", F.xxhash64("user_id").alias("key")))
        out = windowed_distinct_hll(stream, "ts", "key", window="1 day",
                                    watermark="40 days", p=12)
        q = (out.writeStream.format("memory").queryName("win_hll_tz")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck_tz"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        res = spark.sql(
            "SELECT window_start, n_est FROM win_hll_tz").toPandas()
        last = res.groupby("window_start").last()
        assert len(last) == len(exact)
        for w, c in exact.items():
            assert abs(last.loc[w, "n_est"] - c) / c < 0.08
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_windowed_hll_restart_from_checkpoint(spark, tmp_path):
    """A windowed_distinct_hll stream stopped and RESTARTED from its own
    checkpoint must keep its accumulated state (the grouping-column set
    defines the state-store key schema — adding window_ms as a group key
    would make every existing checkpoint unreadable, which is why it
    travels as a data column)."""
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    half1 = str(tmp_path / "h1")
    src.where("event_id % 2 = 0").coalesce(1).write.parquet(half1)
    sink = str(tmp_path / "sink")

    def run_once():
        stream = (spark.readStream
                  .schema(src.schema).option("maxFilesPerTrigger", 1)
                  .parquet(half1)
                  .select("ts", F.xxhash64("user_id").alias("key")))
        out = windowed_distinct_hll(stream, "ts", "key", window="1 day",
                                    watermark="40 days", p=12)
        # memory sink can't recover from a checkpoint; foreachBatch can
        q = (out.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(sink))
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck_r"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    run_once()
    assert spark.read.parquet(sink).count() > 0
    # second half arrives; restart from the SAME checkpoint
    src.where("event_id % 2 = 1").coalesce(1).write.mode("append") \
       .parquet(half1)
    run_once()  # must not raise StateSchemaNotCompatible

    exact = {r.w: r.c for r in
             (src.select(F.window(F.col("ts").cast("timestamp"), "1 day")
                         .start.cast("string").alias("w"), "user_id")
              .groupBy("w").agg(F.countDistinct("user_id").alias("c"))
              .collect())}
    res = spark.read.parquet(sink).toPandas()
    # HLL only grows: max n_est per window is the final estimate
    last = res.groupby("window_start")["n_est"].max()
    # state survived the restart: estimates reflect BOTH halves
    for w, c in exact.items():
        assert abs(last[w] - c) / c < 0.1, (w, c)


def test_incremental_any_sketch_sink_kinds(spark, events_stream_dir,
                                           tmp_path):
    """The generic sink folds any mergeable sketch across micro-batch
    boundaries exactly: theta distinct ≈ exact; MG totals are exact and
    bounds hold; replay (restart, no new data) changes nothing."""
    from fastfilter_spark.streaming import (incremental_any_sketch_sink,
                                            read_incremental_sketch)

    batch = spark.read.parquet(events_stream_dir)
    exact_users = batch.select("user_id").distinct().count()
    n_rows = batch.count()

    def mkstream():
        return (spark.readStream.schema(batch.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_stream_dir)
                .select(F.xxhash64("user_id").alias("key")))

    st = str(tmp_path / "theta_state")
    q = incremental_any_sketch_sink(mkstream(), st, kind="theta",
                                    checkpoint_dir=str(tmp_path / "ckt"))
    q.awaitTermination(120)
    theta = read_incremental_sketch(st, "theta")
    assert abs(theta.estimate() - exact_users) / exact_users < 0.1

    sm = str(tmp_path / "mg_state")
    q2 = incremental_any_sketch_sink(mkstream(), sm, kind="mg", k=32,
                                     checkpoint_dir=str(tmp_path / "ckm"))
    q2.awaitTermination(120)
    mg = read_incremental_sketch(sm, "mg")
    assert mg.n_total == n_rows            # totals exact across batches

    # replay: restart over the same checkpoint, sketch unchanged
    q3 = incremental_any_sketch_sink(mkstream(), sm, kind="mg", k=32,
                                     checkpoint_dir=str(tmp_path / "ckm"))
    q3.awaitTermination(120)
    assert read_incremental_sketch(sm, "mg").to_bytes() == mg.to_bytes()

    # two kinds coexist in ONE state_dir: per-kind markers mean the
    # second kind's fresh batch ids are not shadowed by the first's
    q4 = incremental_any_sketch_sink(mkstream(), sm, kind="theta",
                                     checkpoint_dir=str(tmp_path / "ckc"))
    q4.awaitTermination(120)
    th2 = read_incremental_sketch(sm, "theta")
    assert abs(th2.estimate() - exact_users) / exact_users < 0.1

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown sketch kind"):
        incremental_any_sketch_sink(mkstream(), st, kind="nope")
    with _pytest.raises(TypeError, match="unknown kwargs"):
        incremental_any_sketch_sink(mkstream(), st, kind="cms",
                                    epsilon=1e-6)


def test_sink_state_atomic_and_legacy_migration(spark, events_stream_dir,
                                                tmp_path):
    """ADVICE r3: the blob and the applied-batch marker must commit in
    ONE atomic replace — a separate marker written after the blob left a
    crash window where a replayed batch double-folds into CMS/MG. The
    state file round-trips, rejects corruption, and a pre-atomic
    (separate blob + json marker) layout is migrated on resume."""
    import json
    import os

    from fastfilter_spark.sketches import MisraGries
    from fastfilter_spark.streaming import (incremental_any_sketch_sink,
                                            read_incremental_sketch)
    from fastfilter_spark.streaming.incremental import (_read_sink_state,
                                                        _write_sink_state)

    # unit: round-trip + corruption rejection
    p = str(tmp_path / "s.bin")
    _write_sink_state(p, 7, b"\x01\x02\x03")
    assert _read_sink_state(p) == (7, b"\x01\x02\x03")
    assert _read_sink_state(str(tmp_path / "absent.bin")) is None
    with open(p, "wb") as fh:
        fh.write(b"JUNK")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="corrupt sink state"):
        _read_sink_state(p)

    # legacy layout (separate blob + marker): the sink must adopt the
    # old state — replayed batches ≤ the legacy marker are skipped and
    # the legacy blob seeds the fold — then write the atomic layout
    batch = spark.read.parquet(events_stream_dir)
    st = str(tmp_path / "legacy_state")
    os.makedirs(st)
    seeded = MisraGries(32)
    seeded.add(__import__("numpy").arange(100, dtype="uint64"))
    with open(os.path.join(st, "mg.bin"), "wb") as fh:
        fh.write(seeded.to_bytes())
    with open(os.path.join(st, "mg.state.json"), "w") as fh:
        json.dump({"last_batch": -1}, fh)     # nothing applied yet

    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(events_stream_dir)
              .select(F.xxhash64("user_id").alias("key")))
    q = incremental_any_sketch_sink(stream, st, kind="mg", k=32,
                                    checkpoint_dir=str(tmp_path / "ckl"))
    q.awaitTermination(120)
    mg = read_incremental_sketch(st, "mg")
    # folded on TOP of the legacy blob: totals = seeded 100 + stream rows
    assert mg.n_total == 100 + batch.count()
    assert os.path.exists(os.path.join(st, "mg.state.bin"))
    # migrated legacy files must be GONE: a reader of the old layout
    # would otherwise see frozen pre-migration state forever, and a
    # rollback to pre-atomic code would resume from the stale legacy
    # marker and double-fold already-applied batches
    assert not os.path.exists(os.path.join(st, "mg.bin"))
    assert not os.path.exists(os.path.join(st, "mg.state.json"))


def test_incremental_quantile_sink(spark, events_stream_dir, tmp_path):
    """Value-folding kinds: KLL and t-digest accumulate float
    measurements across micro-batches — streaming quantiles with the
    same exactly-once marker as the key sketches."""
    import numpy as np
    from fastfilter_spark.streaming import (incremental_any_sketch_sink,
                                            read_incremental_sketch)

    batch = spark.read.parquet(events_stream_dir)
    vals = np.sort(batch.select("value").toPandas()["value"]
                   .dropna().to_numpy())
    exact_med = vals[len(vals) // 2]
    spread = vals[-1] - vals[0]

    def mkstream():
        return (spark.readStream.schema(batch.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(events_stream_dir)
                .select(F.col("value").cast("double").alias("key")))

    sk = str(tmp_path / "kll_state")
    q = incremental_any_sketch_sink(mkstream(), sk, kind="kll", k=200,
                                    checkpoint_dir=str(tmp_path / "ckk"))
    q.awaitTermination(120)
    kll = read_incremental_sketch(sk, "kll")
    assert kll.n == len(vals)              # every value folded, once
    assert abs(kll.quantile(0.5) - exact_med) <= 0.02 * spread

    q2 = incremental_any_sketch_sink(mkstream(), sk, kind="tdigest",
                                     checkpoint_dir=str(tmp_path / "ckd"))
    q2.awaitTermination(120)
    td = read_incremental_sketch(sk, "tdigest")
    assert abs(td.quantile(0.5) - exact_med) <= 0.02 * spread

    # replay over the same checkpoint: byte-identical state
    blob = kll.to_bytes()
    q3 = incremental_any_sketch_sink(mkstream(), sk, kind="kll", k=200,
                                     checkpoint_dir=str(tmp_path / "ckk"))
    q3.awaitTermination(120)
    assert read_incremental_sketch(sk, "kll").to_bytes() == blob


def test_ivfpq_ingest_sink_serves_and_compacts(spark, tmp_path):
    """Streaming ANN ingest: vectors arriving across micro-batches are
    PQ-encoded against a frozen quantizer and appended to a LIVE
    servable index — top-k from the streamed index must equal top-k
    from a one-shot write_ivfpq_index over the same corpus with the
    same quantizer, replays must not double-append, and compaction
    must preserve answers while collapsing the batch=* accretion."""
    import numpy as np

    from fastfilter_spark.pipeline import (compact_ivfpq_index,
                                           ivfpq_topk_from_index,
                                           train_ivf_centroids,
                                           train_pq_codebooks,
                                           write_ivfpq_index)
    from fastfilter_spark.streaming import ivfpq_ingest_sink

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
               .select("vec_id", "embedding")
    src = str(tmp_path / "src")
    emb.repartition(3).write.parquet(src)
    cents = train_ivf_centroids(emb, n_cells=8)
    books = train_pq_codebooks(emb, cents, m=8)

    def mkstream():
        return (spark.readStream.schema(emb.schema)
                .option("maxFilesPerTrigger", 1).parquet(src))

    idx = str(tmp_path / "pq_stream")
    q = ivfpq_ingest_sink(mkstream(), idx, cents, books,
                          checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(180)
    batches = glob.glob(os.path.join(idx, "batch=*"))
    assert len(batches) >= 2                  # multi-trigger really ran

    batch_idx = str(tmp_path / "pq_batch")
    write_ivfpq_index(emb, batch_idx, centroids=cents, codebooks=books)
    queries = emb.where("vec_id < 5")

    def pairs(path):
        pdf = ivfpq_topk_from_index(spark, path, queries, k=3,
                                    nprobe=8).toPandas()
        return sorted(zip(pdf.query_id, pdf.neighbor_id, pdf["rank"]))

    want = pairs(batch_idx)
    assert pairs(idx) == want

    # replay: restart on the same (exhausted) checkpoint — no new
    # batch dirs, identical answers
    q2 = ivfpq_ingest_sink(mkstream(), idx, cents, books,
                           checkpoint_dir=str(tmp_path / "ck"))
    q2.awaitTermination(180)
    assert sorted(glob.glob(os.path.join(idx, "batch=*"))) \
        == sorted(batches)
    assert pairs(idx) == want

    # compaction: canonical layout (cell=* at top level), same answers
    comp = str(tmp_path / "pq_compact")
    compact_ivfpq_index(spark, idx, comp)
    assert not glob.glob(os.path.join(comp, "batch=*"))
    assert glob.glob(os.path.join(comp, "cell=*"))
    assert pairs(comp) == want
    # total row count preserved through the whole chain
    n = emb.count()
    assert spark.read.parquet(comp).count() == n

    # restart with a DIFFERENT quantizer must fail loudly (appending
    # rows encoded under new centroids would mix two code spaces)
    with pytest.raises(ValueError, match="DIFFERENT quantizer"):
        ivfpq_ingest_sink(mkstream(), idx, cents * 0.5, books,
                          checkpoint_dir=str(tmp_path / "ck"))
    # in-place compaction would delete its own input mid-scan
    with pytest.raises(ValueError, match="in place"):
        compact_ivfpq_index(spark, idx, idx)

    # deletion rides the compaction rewrite: dropped ids are gone from
    # the index and can never be served
    dele = str(tmp_path / "pq_deleted")
    gone = emb.where("vec_id < 3").select("vec_id")
    compact_ivfpq_index(spark, idx, dele, delete_ids=gone)
    left = spark.read.parquet(dele)
    assert left.count() == n - 3
    assert left.where("vec_id < 3").count() == 0
    served = ivfpq_topk_from_index(spark, dele, queries, k=3,
                                   nprobe=8).toPandas()
    assert not set(served.neighbor_id) & {0, 1, 2}


def test_ivfpq_ingest_drift_telemetry(spark, tmp_path):
    """Quantizer-fit drift: every ingested batch appends a
    {batch, n, mean_coarse_dist, max_coarse_dist} row (n sums to the
    rows ingested), and a planted out-of-distribution epoch (vectors
    collapsed onto one axis the quantizer never trained on) must read
    a clearly worse mean fit than the in-distribution epochs."""
    import numpy as np

    from fastfilter_spark.pipeline import (train_ivf_centroids,
                                           train_pq_codebooks)
    from fastfilter_spark.streaming import (ivfpq_ingest_sink,
                                            read_ingest_drift)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
               .select("vec_id", "embedding")
    n = emb.count()
    cents = train_ivf_centroids(emb, n_cells=8)
    books = train_pq_codebooks(emb, cents, m=8)
    src = str(tmp_path / "src")
    emb.repartition(2).write.parquet(src)

    idx = str(tmp_path / "drift_idx")
    ck = str(tmp_path / "ck")
    q = ivfpq_ingest_sink(
        (spark.readStream.schema(emb.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)),
        idx, cents, books, checkpoint_dir=ck)
    q.awaitTermination(180)
    drift = read_ingest_drift(idx)
    assert len(drift) >= 2
    assert sum(d["n"] for d in drift) == n
    base_mean = max(d["mean_coarse_dist"] for d in drift)

    # planted drift epoch: new files whose vectors all point down one
    # axis (scaled + shifted) — nowhere near any trained centroid
    shifted = emb.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: (x * F.lit(0.01) + F.lit(5.0))
                    .cast("float")).alias("embedding"))
    shifted.repartition(1).write.mode("append").parquet(src)
    q2 = ivfpq_ingest_sink(
        (spark.readStream.schema(emb.schema)
         .option("maxFilesPerTrigger", 1).parquet(src)),
        idx, cents, books, checkpoint_dir=ck)
    q2.awaitTermination(180)
    drift2 = read_ingest_drift(idx)
    assert sum(d["n"] for d in drift2) == 2 * n
    assert drift2[-1]["mean_coarse_dist"] > base_mean
