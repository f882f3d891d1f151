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
    out = windowed_distinct_hll(stream, "ts", "key", window="1 day",
                                watermark="10 days", p=12)
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
