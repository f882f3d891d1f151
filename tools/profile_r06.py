"""Round-6 optimization profiler — NOT the driver bench.

Isolates the expensive bench entries into sub-phases (guide §1.1/§1.4:
noop-sink timing, labelled jobs) so optimization targets the component
that actually burns the time. Interleaves the same single-core numpy
host control as bench.py before every section because the sandbox host
throttles 3-10x in multi-second windows — absolute seconds are only
comparable within one calm window; the control says which window we
were in.

Usage: python tools/profile_r06.py [section ...]
Sections: build sidecar skipindex probe dedup ann
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

RESULTS: dict = {}


def host_control() -> float:
    import numpy as np
    a = np.random.default_rng(0).random(1 << 23)
    best = None
    for _ in range(3):
        t0 = time.time()
        np.sort(a)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def timed(name, fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    RESULTS[name] = round(best, 3)
    print(f"    {name:44s} {best:7.3f} s", flush=True)
    return best


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import get_spark
    from fastfilter_spark.spark.build import partials_dataframe
    from fastfilter_spark.spark.keys import route_expr

    sections = set(sys.argv[1:]) or {"build", "sidecar", "skipindex",
                                     "probe", "dedup"}
    spark = get_spark("profile_r06", cpus=CPUS, shuffle_partitions=CPUS)
    sc = spark.sparkContext

    def synth_keys(n):
        return spark.range(0, n, 1, CPUS).select(
            F.xxhash64("id").alias("key"))

    # warm
    from fastfilter_spark.spark import build_partitioned_filter
    warm = synth_keys(10_000)
    wf = build_partitioned_filter(warm, kind="bf8", num_partitions=CPUS)
    wf.with_contains(warm, "key").count()

    big = synth_keys(10_000_000).cache()
    big.count()

    print(f"host_control: {host_control()}", flush=True)

    if "build" in sections:
        print("== build decomposition (1e7, P=CPUS) ==", flush=True)
        placed = (big.select(F.col("key"))
                  .where(F.col("key").isNotNull())
                  .withColumn("route", route_expr("key", 0)))

        from fastfilter_spark import workerside

        def _pack(batches):
            return workerside.pack_by_pid(batches, CPUS)

        sc.setJobDescription("pack-only")
        timed("pack_only_noop", lambda: noop(
            placed.mapInArrow(_pack, "pid int, chunk binary")))
        sc.setJobDescription("packed-full")
        timed("packed_build_full", lambda: build_partitioned_filter(
            big, kind="bf8", num_partitions=CPUS))
        sc.setJobDescription("rows-full")
        timed("rows_build_full", lambda: build_partitioned_filter(
            big, kind="bf8", num_partitions=CPUS, shuffle_mode="rows"))
        # partials only (no toPandas collect) for packed
        sc.setJobDescription("packed-partials-noop")
        timed("packed_partials_noop", lambda: noop(partials_dataframe(
            placed, "bf8", CPUS, 0, 0x726B2B9D438B9D4D, None, "packed")))
        sc.setJobDescription("rows-partials-noop")
        timed("rows_partials_noop", lambda: noop(partials_dataframe(
            placed, "bf8", CPUS, 0, 0x726B2B9D438B9D4D, None, "rows")))
        # raw shuffle cost: repartition on route expr + count via noop
        sc.setJobDescription("bare-key-shuffle")
        timed("bare_key_shuffle_noop", lambda: noop(
            placed.drop("route").repartition(CPUS, route_expr("key", 0))))
        print(f"host_control: {host_control()}", flush=True)

    if "sidecar" in sections:
        import shutil
        import tempfile

        from fastfilter_spark.spark import (build_filter_sidecar,
                                            contains_via_sidecar)
        print("== sidecar build decomposition (1e7, P=128) ==", flush=True)
        placed = (big.select(F.col("key"))
                  .where(F.col("key").isNotNull())
                  .withColumn("route", route_expr("key", 0)))
        P = 4 * CPUS
        sc.setJobDescription("sidecar-partials-noop")
        timed("sidecar_partials_noop", lambda: noop(partials_dataframe(
            placed, "bf8", P, 0, 0x726B2B9D438B9D4D, None, "packed")))

        def full_build():
            d = tempfile.mkdtemp(prefix="ffsk_prof_sc_")
            try:
                build_filter_sidecar(big, d + "/s", kind="bf8",
                                     num_partitions=P)
            finally:
                shutil.rmtree(d, ignore_errors=True)
        sc.setJobDescription("sidecar-build-full")
        timed("sidecar_build_full", full_build)

        # keep one sidecar for probe timing
        global SC_DIR
        SC_DIR = tempfile.mkdtemp(prefix="ffsk_prof_keep_") + "/s"
        build_filter_sidecar(big, SC_DIR, kind="bf8", num_partitions=P)
        print(f"host_control: {host_control()}", flush=True)

        if "probe" in sections:
            print("== routed probe decomposition ==", flush=True)
            from fastfilter_spark.spark.keys import partition_id
            sc.setJobDescription("probe-shuffle-only")
            timed("probe_shuffle_only_noop", lambda: noop(
                big.repartition(128, partition_id("key", P, 0))))
            sc.setJobDescription("probe-local")
            timed("probe_local", lambda: contains_via_sidecar(
                big, SC_DIR).where("contained").count())
            sc.setJobDescription("probe-routed")
            timed("probe_routed", lambda: contains_via_sidecar(
                big, SC_DIR, max_local_bytes=0).where("contained").count())
            shutil.rmtree(os.path.dirname(SC_DIR), ignore_errors=True)
            print(f"host_control: {host_control()}", flush=True)

    if "skipindex" in sections:
        import shutil
        import tempfile

        from fastfilter_spark.spark import (build_file_skipping_index,
                                            pruned_lookup)
        print("== skipindex decomposition (1e7, CPUS files) ==", flush=True)
        si_base = tempfile.mkdtemp(prefix="ffsk_prof_si_")
        si_data, si_idx = f"{si_base}/data.parquet", f"{si_base}/index"
        (big.repartitionByRange(CPUS, "key")
         .write.mode("overwrite").parquet(si_data))
        # scan-only cost of the data
        sc.setJobDescription("skipindex-scan-only")
        timed("skipindex_scan_noop", lambda: noop(
            spark.read.parquet(si_data)))
        sc.setJobDescription("skipindex-build")
        timed("skipindex_build", lambda: build_file_skipping_index(
            spark, si_data, si_idx, key="key"))
        probe_keys = [r.key for r in big.limit(100).collect()]
        sc.setJobDescription("skipindex-lookup")
        timed("skipindex_lookup", lambda: pruned_lookup(
            spark, si_data, si_idx, probe_keys, "key").count())
        shutil.rmtree(si_base, ignore_errors=True)
        print(f"host_control: {host_control()}", flush=True)

    if "dedup" in sections:
        print("== dedup entries (sf docs) ==", flush=True)
        from fastfilter_spark.pipeline import dup_span_stats, minhash_dedup
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()
        n_docs = docs.count()
        print(f"    docs: {n_docs}")
        sc.setJobDescription("minhash-dedup")
        timed("minhash_dedup", lambda: minhash_dedup(
            docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=8,
            shingle_k=3).count())
        sc.setJobDescription("span-dedup")
        timed("span_dedup", lambda: dup_span_stats(
            docs, "text", "doc_id", g=8).agg(F.sum("dup_tokens")).collect())
        docs.unpersist()
        print(f"host_control: {host_control()}", flush=True)

    big.unpersist()
    print(json.dumps(RESULTS))
    spark.stop()


if __name__ == "__main__":
    main()
