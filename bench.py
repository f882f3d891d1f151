"""Headline benchmark — prints ONE JSON line for the driver.

Covers the BASELINE.md metrics: filter-construction throughput (keys/s)
at the 10^6 tier for bf8/xor8/fuse8/bloom, query (contains) throughput, and
the end-to-end flagship patterns at $SPARK_GRAFT_SF_DIR (default
sf0.1): filter semi-join, HLL/KLL aggregation, MinHash dedup.

Scaling evidence (local[8] vs local[32]) lives in bench_scaling.py →
BENCH/BASELINE.md; this script stays single-config so the driver's
per-round number is comparable across rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
N_KEYS = int(os.environ.get("BENCH_KEYS", 1_000_000))


def synth_keys(spark, n):
    from pyspark.sql import functions as F
    return spark.range(0, n, 1, CPUS).select(F.xxhash64("id").alias("key"))


def _host_control() -> float:
    """Fixed single-core numpy workload (sort 8.4M doubles, min-of-3):
    a host-speed index measured in the SAME process right before the
    suite. The sandbox host throttles 3-10× in multi-second windows
    (BENCH/BASELINE.md), so round-over-round query comparisons are only
    meaningful relative to this control — a round whose control is 2×
    slower ran on a 2×-slower host, not on 2×-slower code. Deterministic
    input, no Spark, no allocation surprises (np.sort returns a fresh
    sorted copy each rep)."""
    import numpy as np
    a = np.random.default_rng(0).random(1 << 23)
    best = None
    for _ in range(3):
        t0 = time.time()
        np.sort(a)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 4)


def main() -> None:
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import (
        build_partitioned_filter, content_key, get_spark, hll_agg, kll_agg,
    )

    spark = get_spark("bench", cpus=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    def timed(name, fn, reps=2):
        # min-of-2 by default: the sandbox host throttles in multi-second
        # windows (documented 3-10× swings — a single-shot minhash sample
        # once read 29.5 s vs a 5.4 s min-of-3), and the driver runs this
        # script once per round, so one bad window would masquerade as a
        # regression in BENCH_r{N}. The 1e8 tier below keeps min-of-3.
        best, out = None, None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    # warm the JVM, python workers and the worker-side module once (not
    # timed) — a real mini build+probe so timed numbers are steady-state
    warm = synth_keys(spark, 10_000)
    wf = build_partitioned_filter(warm, kind="bf8", num_partitions=CPUS)
    wf.with_contains(warm, "key").count()

    keys = synth_keys(spark, N_KEYS).cache()
    keys.count()

    for kind in ("bf8", "xor8", "fuse8", "bloom", "blockedbloom"):
        name = f"build_{kind}_1e6"
        pf = timed(name, lambda k=kind: build_partitioned_filter(
            keys, kind=k, num_partitions=CPUS,
            bloom_n_expected=N_KEYS))
        extra[f"{kind}_keys_per_sec"] = round(N_KEYS / timings[name])
        extra[f"{kind}_bits_per_entry"] = round(pf.bits_per_entry(), 2)
        if kind == "bf8":
            bf8 = pf
        elif kind == "blockedbloom":
            # probe-side: the blocked variant's one-cache-line gather vs
            # bf8's 3 scattered segment reads (contains_1e6 below)
            nbb = timed("contains_blockedbloom_1e6",
                        lambda p=pf: p.with_contains(keys, "key")
                        .where("contained").count())
            extra["blockedbloom_contains_keys_per_sec"] = round(
                N_KEYS / timings["contains_blockedbloom_1e6"])
            assert nbb >= N_KEYS * 0.9

    probes = synth_keys(spark, N_KEYS)
    n_hits = timed("contains_1e6", lambda: bf8.with_contains(probes, "key")
                   .where("contained").count())
    extra["contains_keys_per_sec"] = round(N_KEYS / timings["contains_1e6"])
    assert n_hits >= N_KEYS * 0.9  # members must all hit (minus hash dup noise)

    # 10^7 tier: amortizes per-task overhead — the throughput headline
    n_big = 10 * N_KEYS
    big = synth_keys(spark, n_big).cache()
    big.count()
    timed("build_bf8_1e7", lambda: build_partitioned_filter(
        big, kind="bf8", num_partitions=CPUS))
    extra["bf8_1e7_keys_per_sec"] = round(n_big / timings["build_bf8_1e7"])
    # rows shuffle mode: single-box fast path (one python pass; packed
    # stays the default because per-row shuffle cost explodes multi-node)
    timed("build_bf8_1e7_rows", lambda: build_partitioned_filter(
        big, kind="bf8", num_partitions=CPUS, shuffle_mode="rows"))
    extra["bf8_1e7_rows_keys_per_sec"] = round(
        n_big / timings["build_bf8_1e7_rows"])
    # .where("contained") keeps Catalyst from pruning the UDF column away
    timed("contains_1e7", lambda: bf8.with_contains(big, "key")
          .where("contained").count())
    extra["contains_1e7_keys_per_sec"] = round(n_big / timings["contains_1e7"])

    # driver-bypass scale path: executor-written sidecar + routed probe
    # (the 10^9+/10^12 serve shape; driver memory O(1))
    import shutil
    import tempfile

    from fastfilter_spark.spark import build_filter_sidecar, contains_via_sidecar
    sc_dir = tempfile.mkdtemp(prefix="ffsk_bench_sc_") + "/sidecar"
    timed("sidecar_build_1e7", lambda: build_filter_sidecar(
        big, sc_dir, kind="bf8", num_partitions=4 * CPUS))
    extra["sidecar_1e7_keys_per_sec"] = round(
        n_big / timings["sidecar_build_1e7"])
    n_in = timed("sidecar_probe_1e7", lambda: contains_via_sidecar(big, sc_dir)
                 .where("contained").count())
    extra["sidecar_probe_keys_per_sec"] = round(
        n_big / timings["sidecar_probe_1e7"])
    assert n_in >= n_big * 0.9
    # ROUTED probe shape (max_local_bytes=0 forces the shuffle):
    # this is the ≥1e9-tier serve path — regression-gate it explicitly
    # instead of only the small-sidecar local path (VERDICT r3 #8)
    n_rt = timed("sidecar_probe_routed_1e7",
                 lambda: contains_via_sidecar(big, sc_dir, max_local_bytes=0)
                 .where("contained").count())
    extra["sidecar_probe_routed_keys_per_sec"] = round(
        n_big / timings["sidecar_probe_routed_1e7"])
    assert n_rt >= n_big * 0.9
    shutil.rmtree(os.path.dirname(sc_dir), ignore_errors=True)

    # resumable sketch sidecar (north_rule checkpointed build path):
    # same driver-bypass shape as the filter sidecar, HLL p=14
    from fastfilter_spark.spark import build_sketch_sidecar
    sk_dir = tempfile.mkdtemp(prefix="ffsk_bench_sk_") + "/sketch"
    timed("sketch_sidecar_1e7", lambda: build_sketch_sidecar(
        big, sk_dir, kind="hll", col="key",
        num_partitions=4 * CPUS, p=14))
    extra["sketch_sidecar_keys_per_sec"] = round(
        n_big / timings["sketch_sidecar_1e7"])
    shutil.rmtree(os.path.dirname(sk_dir), ignore_errors=True)

    # per-file data-skipping index: build one bf8 per file over a
    # CPUS-file layout, then a 100-key point lookup that scans only
    # matched files (the 100 TB point-lookup serve shape)
    from fastfilter_spark.spark import (build_file_skipping_index,
                                        pruned_lookup)
    si_base = tempfile.mkdtemp(prefix="ffsk_bench_si_")
    si_data, si_idx = f"{si_base}/data.parquet", f"{si_base}/index"
    (big.repartitionByRange(CPUS, "key")
     .write.mode("overwrite").parquet(si_data))
    timed("skipindex_build_1e7", lambda: build_file_skipping_index(
        spark, si_data, si_idx, key="key"))
    probe_keys = [r.key for r in big.limit(100).collect()]
    n_pl = timed("skipindex_lookup_1e7", lambda: pruned_lookup(
        spark, si_data, si_idx, probe_keys, "key").count())
    assert n_pl >= 100
    shutil.rmtree(si_base, ignore_errors=True)
    big.unpersist()

    # 10^8 tier — the BASELINE.md sampled tier, captured per-round in
    # BENCH_r* (VERDICT r1 #6). rows shuffle mode + P=8·CPUS (measured
    # fastest single-box config); BENCH_SKIP_1E8=1 opts out on slow hosts.
    if not os.environ.get("BENCH_SKIP_1E8"):
        n_huge = 100 * N_KEYS
        huge = synth_keys(spark, n_huge).cache()
        huge.count()
        # min of 3 reps: the sandbox host throttles in multi-second
        # windows (3-10x swings documented in BENCH/BASELINE.md), and a
        # single 19-85 s sample of the headline tier is a coin flip
        # (measured same-code spread; best observed 18.9 s = 5.30 M/s).
        reps = []
        for _ in range(3):
            t0 = time.time()
            build_partitioned_filter(huge, kind="bf8",
                                     num_partitions=8 * CPUS,
                                     shuffle_mode="rows")
            reps.append(time.time() - t0)
        timings["build_bf8_1e8"] = round(min(reps), 3)
        extra["bf8_1e8_keys_per_sec"] = round(
            n_huge / timings["build_bf8_1e8"])
        huge.unpersist()

    # end-to-end patterns at the sf tier --------------------------------------
    import __spark_entry__ as entry

    timed("semijoin_docs", lambda: entry.q_bf16_semijoin(spark, SF_DIR).count())

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    timed("hll_by_type", lambda: hll_agg(
        events.select("event_type", F.xxhash64("user_id").alias("key")),
        ["event_type"], "key").count())
    timed("kll_value", lambda: kll_agg(
        events, [], "value", quantiles=[0.5, 0.99]).count())

    from fastfilter_spark.pipeline import minhash_dedup
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_dedup_docs", lambda: minhash_dedup(
        docs, "text", "doc_id", threshold=0.5, num_hashes=32, bands=8,
        shingle_k=3).count())

    # span-level dedup (repeated 8-gram spans, interval-union coverage):
    # agg(sum) forces the full gram groupBy + join + per-doc fold, not
    # just the row count of the outer left join
    from fastfilter_spark.pipeline import dup_span_stats
    timed("span_dedup_docs", lambda: dup_span_stats(
        docs, "text", "doc_id", g=8).agg(F.sum("dup_tokens")).collect())

    # ANN serve shape (VERDICT r3 called the ANN family perf-weak; the
    # partial top-k reduction is now regression-gated here): 100 queries
    # vs a 200k×64 synthetic corpus — brute-force baseline + IVF
    # (trains its coarse quantizer inside the timed call, the cold-serve
    # shape). sf embeddings are too small (2k rows) to measure anything
    # but fixed overhead.
    from fastfilter_spark.pipeline import brute_force_topk, ivf_topk
    dim = 64
    emb = (spark.range(0, 200_000, 1, CPUS)
           .select(F.col("id").alias("vec_id"),
                   F.array(*[((F.pmod(F.xxhash64("id", F.lit(i)),
                                      F.lit(2000)) - 1000)
                              .cast("float") / 1000.0)
                             for i in range(dim)]).alias("embedding"))
           .cache())
    n_emb = emb.count()
    ann_q = emb.where("vec_id < 100")
    timed("ann_brute_200k_q100",
          lambda: brute_force_topk(emb, ann_q, k=5).count())
    extra["ann_brute_dots_per_sec"] = round(
        n_emb * 100 / timings["ann_brute_200k_q100"])
    timed("ann_ivf_200k_q100",
          lambda: ivf_topk(emb, ann_q, k=5, n_cells=64, nprobe=8).count())

    # WARM IVF serve (VERDICT r4 #2: the cold entry above pays quantizer
    # training + full-corpus assignment inside the timed call — that is
    # the build cost, not the serve cost IVF exists to amortize). Build
    # the cell-partitioned index ONCE outside the timed region, with the
    # executor-side trainer at an at-scale cell count, then gate the
    # partition-pruned ivf_topk_from_index path: a probe reads
    # ~nprobe/n_cells of the corpus and matmuls only the queries that
    # probed each cell.
    import shutil
    import tempfile
    from fastfilter_spark.pipeline import (ivf_topk_from_index,
                                           train_ivf_centroids_distributed,
                                           write_ivf_index)
    ivf_dir = tempfile.mkdtemp(prefix="ffsk_bench_ivf_")
    try:
        t0 = time.time()
        cents = train_ivf_centroids_distributed(emb, n_cells=256, iters=3)
        write_ivf_index(emb, ivf_dir + "/idx", centroids=cents)
        extra["ann_ivf_index_build_sec"] = round(time.time() - t0, 3)
        timed("ann_ivf_warm_200k_q100",
              lambda: ivf_topk_from_index(spark, ivf_dir + "/idx", ann_q,
                                          k=5, nprobe=16).count())
        # IVF-PQ warm serve: same centroids, corpus stored as m=8 uint8
        # codes (32× fewer bytes than 64 float32) — the serve tier whose
        # scan cost the plain-IVF entry showed is parquet-list-decode
        # bound (BENCH/BASELINE.md r5: warm IVF ties brute at saturated
        # nq·nprobe because decoding float lists dominates; codes make
        # the pruned bytes actually small).
        from fastfilter_spark.pipeline import (ivfpq_topk_from_index,
                                               write_ivfpq_index)
        t0 = time.time()
        write_ivfpq_index(emb, ivf_dir + "/pq", centroids=cents, m=8)
        extra["ann_ivfpq_index_build_sec"] = round(time.time() - t0, 3)
        timed("ann_ivfpq_warm_200k_q100",
              lambda: ivfpq_topk_from_index(spark, ivf_dir + "/pq", ann_q,
                                            k=5, nprobe=16).count())
        raw_b = n_emb * dim * 4
        code_b = sum(os.path.getsize(os.path.join(r, f))
                     for r, _, fs in os.walk(ivf_dir + "/pq") for f in fs)
        extra["ann_ivfpq_disk_compression"] = round(raw_b / code_b, 1)
    finally:
        shutil.rmtree(ivf_dir, ignore_errors=True)
    emb.unpersist()

    total = round(sum(timings.values()), 3)
    ctrl = _host_control()
    print(json.dumps({
        # "min-of-2" in the label: since r3 each query's timing is the
        # best of 2 runs (host-throttle hardening), so `value` is the
        # sum of per-query minima, NOT elapsed wall clock (~2× it) and
        # not directly comparable to the single-shot r1/r2 totals
        "metric": "filter-construction + query suite time "
                  "(sum of min-of-2 per query)",
        "reps_per_query": 2,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "throughput": extra,
        "host_control_sec": ctrl,
        "regressions": _regressions(timings, ctrl),
    }))
    spark.stop()


def _regressions(timings: dict, ctrl: float | None = None,
                 factor: float = 1.3) -> list:
    """Per-query regression gate vs the PREVIOUS round's committed
    BENCH_r*.json: any shared query >1.3× slower is listed in the
    artifact itself, so a regression is visible without a human diffing
    rounds. Purely informational (the sandbox host throttles 3-10×
    between runs — see BENCH/BASELINE.md — so treat single-run entries
    here as a prompt to re-measure min-of-3, not as proof)."""
    import glob
    import re
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = []
        for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
            m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
            if m:                      # ignore stray BENCH_r*-named files
                cands.append((int(m.group(1)), p))
        if not cands:
            return []
        with open(max(cands)[1]) as fh:
            doc = json.load(fh)
        # the driver's BENCH_r*.json wraps this script's JSON line
        # under "parsed"; accept both the raw and the wrapped shape
        prev = (doc.get("queries")
                or doc.get("parsed", {}).get("queries") or {})
        # host_ratio: how much slower THIS host window is than the
        # previous round's (fixed numpy control). A flagged query whose
        # ratio ≈ host_ratio regressed with the host, not the code.
        prev_ctrl = (doc.get("host_control_sec")
                     or doc.get("parsed", {}).get("host_control_sec"))
        host_ratio = (round(float(ctrl) / float(prev_ctrl), 2)
                      if ctrl and prev_ctrl else None)
    except Exception:
        # the gate is informational — it must never cost the run its
        # one-line JSON after the whole suite has already executed
        # (a malformed artifact can raise Attribute/TypeError too, not
        # just OSError/ValueError — e.g. "parsed" captured as a string)
        return []
    out = []
    for q, t in timings.items():
        p = prev.get(q)
        if p and t > factor * p:
            entry = {"query": q, "prev_sec": p, "now_sec": t,
                     "ratio": round(t / p, 2)}
            if host_ratio is not None:
                entry["host_ratio"] = host_ratio
            out.append(entry)
    return out


if __name__ == "__main__":
    main()
