"""1e6-doc scale-tier evidence for the text-dedup operators.

The headline bench gates span dedup and minhash dedup only at the
sf0.1 corpus (~5k docs) — fixed overhead, not throughput (VERDICT r4
next-round #6). This tool measures the SAME operators, same plan
shapes, on a deterministic Spark-GENERATED corpus of N docs (default
10^6, ~60 tokens each, 10% exact duplicates, ~9% planted 54/60-token
near-duplicates, ~5% of docs carrying one of 4096 planted 12-token
spans shared by ~11 docs each), and reports docs/s plus the ACTUAL
shuffle volume parsed from the Spark event log — the number that
decides whether the shape survives a 100× scale-up.

Usage:  python tools/bench_text_dedup.py [n_docs] [op ...]
        op ∈ {span, minhash, paragraph, fork}; default span+minhash
        at 1e6.
`paragraph` re-chunks the same corpus into 10-token paragraphs and
runs paragraph_dedup; `fork` synthesizes n FILES across n/50 repos
(every 10th repo has a planted fork keeping 43/50 files, J=0.86)
and runs the repo-level set-MinHash fork detector.
Prints one JSON line per op. Results are recorded in
BENCH/BASELINE.md §text-dedup-tier.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
N_TOKENS = 60
NEAR_SHARE = 54          # tokens shared with the neighbor doc in a near-dup
VOCAB = 4096
SPAN_VARIANTS = 4096
SPAN_LEN = 12


def synth_docs(spark, n: int):
    """Deterministic (doc_id, text) corpus, generated executor-side —
    no driver materialization at any N. base = doc_id % 0.9n gives 10%
    exact duplicate texts; docs with base%11==0 share their first 54
    tokens with doc base+1 (shingle-Jaccard ≈ 0.8 — a true NEAR dup,
    not collapsed by the exact-dedup prepass); docs with base%20==0
    append one of 4096 12-token spans (~11 docs share each span)."""
    from pyspark.sql import functions as F
    base = (F.col("id") % F.lit(max(1, (9 * n) // 10))).alias("base")
    df = spark.range(0, n, 1, CPUS).select(F.col("id").alias("doc_id"), base)
    near = (F.col("base") % 11 == 0)
    toks = []
    for i in range(N_TOKENS):
        src = (F.when(near, F.col("base") + 1).otherwise(F.col("base"))
               if i < NEAR_SHARE else F.col("base"))
        toks.append(F.concat(F.lit("w"), F.pmod(F.xxhash64(src, F.lit(i)),
                                                F.lit(VOCAB))))
    body = F.concat_ws(" ", *toks)
    v = F.pmod(F.col("base"), F.lit(SPAN_VARIANTS)).cast("string")
    span_tokens = F.transform(
        F.sequence(F.lit(0), F.lit(SPAN_LEN - 1)),
        lambda j: F.concat(F.lit("sp"), v, F.lit("_"), j))
    text = F.when(F.col("base") % 20 == 0,
                  F.concat(body, F.lit(" "),
                           F.array_join(span_tokens, " "))) \
            .otherwise(body)
    return df.select("doc_id", text.alias("text"))


def synth_repo_files(spark, n: int):
    """Deterministic (repo, key) file corpus for the fork detector:
    n files across n/50 repos of 50 files each (key = xxhash64(repo,
    slot), distinct per repo); every 10th repo also has a planted fork
    'f<k>' keeping the 43 slots with slot%8!=0 (exact Jaccard 43/50
    = 0.86 against the base — above the 0.5 threshold, below
    exact-copy, so banding recall is exercised for real)."""
    from pyspark.sql import functions as F
    n_repos = max(1, n // 50)
    df = spark.range(0, n, 1, CPUS)
    k = F.col("id") % n_repos
    slot = (F.col("id") / n_repos).cast("long")
    key = F.xxhash64(k, slot)
    base = df.select(F.concat(F.lit("r"), k.cast("string")).alias("repo"),
                     key.alias("key"))
    fork = (df.where((k % 10 == 0) & (slot % 8 != 0))
            .select(F.concat(F.lit("f"), k.cast("string")).alias("repo"),
                    key.alias("key")))
    return base.unionByName(fork)


def _shuffle_bytes(log_dir: str) -> tuple:
    """(write, read) bytes summed over SparkListenerTaskEnd events of
    every app log in log_dir — the listener store is not reachable from
    PySpark with the UI off, but the event log carries the same task
    metrics."""
    w = r = 0
    for name in os.listdir(log_dir):
        p = os.path.join(log_dir, name)
        if not os.path.isfile(p):
            continue
        with open(p) as fh:
            for line in fh:
                if '"SparkListenerTaskEnd"' not in line:
                    continue
                ev = json.loads(line)
                m = (ev.get("Task Metrics") or {})
                w += (m.get("Shuffle Write Metrics") or {}) \
                    .get("Shuffle Bytes Written", 0)
                r += ((m.get("Shuffle Read Metrics") or {})
                      .get("Local Bytes Read", 0)
                      + (m.get("Shuffle Read Metrics") or {})
                      .get("Remote Bytes Read", 0))
    return w, r


def main(n_docs: int = 1_000_000, *ops: str) -> None:
    ops = tuple(ops) or ("span", "minhash")
    from pyspark.sql import functions as F

    from fastfilter_spark.pipeline import (dup_span_stats, fork_candidates,
                                           minhash_dedup, paragraph_dedup)
    from fastfilter_spark.spark import get_spark

    for op in ops:
        log_dir = tempfile.mkdtemp(prefix=f"ffsk_evlog_{op}_")
        spark = get_spark(
            f"textdedup_{op}", cpus=CPUS, shuffle_partitions=CPUS,
            extra_conf={"spark.eventLog.enabled": "true",
                        "spark.eventLog.dir": f"file://{log_dir}",
                        # rolling (v2) logs are zstd directories even
                        # with compress=false — keep the single-file v1
                        # log so plain-json parsing works
                        "spark.eventLog.rolling.enabled": "false",
                        "spark.eventLog.compress": "false"})
        if op == "fork":
            docs = synth_repo_files(spark, n_docs).cache()
        else:
            docs = synth_docs(spark, n_docs).cache()
        docs.count()                      # narrow: no shuffle in the log
        if op == "fork":
            fn = lambda: fork_candidates(docs, num_hashes=64, bands=16,
                                         threshold=0.5,
                                         max_bucket=2000).count()
        elif op == "paragraph":
            # let-bound (the shingles() per-element re-eval hazard);
            # dynamic chunk count so the planted 12-token spans become
            # real duplicate paragraphs
            para = F.transform(
                F.array(F.split("text", " ", -1)), lambda tk:
                F.array_join(
                    F.transform(
                        F.sequence(F.lit(0),
                                   F.greatest(F.ceil(F.size(tk) / 10.0),
                                              F.lit(1)).cast("int") - 1),
                        lambda j: F.array_join(
                            F.slice(tk, j * F.lit(10) + F.lit(1),
                                    F.lit(10)), " ")),
                    "\n\n"))[0]
            pdocs = docs.select("doc_id", para.alias("text"))
            fn = lambda: paragraph_dedup(pdocs, "text", "doc_id") \
                .agg(F.sum("n_dropped")).collect()[0][0]
        elif op == "span":
            fn = lambda: dup_span_stats(docs, "text", "doc_id", g=8) \
                .agg(F.sum("dup_tokens")).collect()[0][0]
        elif op == "minhash":
            fn = lambda: minhash_dedup(docs, "text", "doc_id",
                                       threshold=0.5, num_hashes=32,
                                       bands=8, shingle_k=3,
                                       max_bucket=2000).count()
        else:
            raise SystemExit(f"unknown op {op!r} (span|minhash|paragraph|fork)")
        reps, out = [], None
        for _ in range(2):                # min-of-2: host-throttle guard
            t0 = time.time()
            out = fn()
            reps.append(time.time() - t0)
        docs.unpersist()
        spark.stop()                      # flush the event log
        sw, sr = _shuffle_bytes(log_dir)
        best = min(reps)
        print(json.dumps({
            "op": op, "n_docs": n_docs, "secs": round(best, 2),
            "reps": [round(x, 2) for x in reps],
            "docs_per_sec": round(n_docs / best),
            "result": int(out),
            # 2 reps ran; per-run volume is half the log total
            "shuffle_write_bytes_per_run": sw // 2,
            "shuffle_read_bytes_per_run": sr // 2,
            "cpus": CPUS}), flush=True)
        for name in os.listdir(log_dir):
            try:
                os.unlink(os.path.join(log_dir, name))
            except OSError:
                pass


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000,
         *sys.argv[2:])
