"""Scaling-efficiency evidence: same job at two parallelism levels.

The BASELINE.json north_rule requires throughput scaling efficiency
≥ 0.8 going from N to 4N executors; no real cluster exists in this
sandbox, so (per driver instruction) we run the identical job — same
input, same partition count P — on local[N_LO] and local[N_HI] in
fresh subprocess JVMs and report throughput at both plus

    efficiency = T(N_LO) / (T(N_HI) * (N_HI / N_LO))
               = throughput(N_HI) / (throughput(N_LO) * N_HI/N_LO)

Only the build job is timed (session startup, input synthesis and
caching excluded — a cluster amortizes those). Results → BENCH/BASELINE.md.

Two modes:

* default — the isolated build job over pre-cached keys (peel-bound;
  on one box this saturates shared DRAM bandwidth, see BENCH/BASELINE.md).
* ``--pipeline`` — the full north-rule job: parquet corpus scan →
  JVM-side sha256(content) key derivation → dropDuplicates → salted
  repartition → partial builds. This is what a 100 TB run actually
  spends its time on (scan + sha256 + shuffle dominate the peel), it is
  compute-bound rather than memory-bandwidth-bound, and is therefore
  the representative scaling-efficiency measurement. The corpus parquet
  is synthesized once (untimed) and shared by both runs.

* ``--fleet`` — the most faithful in-sandbox model of "N vs 4N
  executors": K vs 4K *separate JVM processes* (each ``local[4]``,
  like a 4-core executor), barrier-started, each running the identical
  pipeline job on the shared corpus. Going N→4N executors on a real
  cluster multiplies JVMs, not threads inside one JVM — and that
  distinction is load-bearing here: Spark's ``sha2`` expression takes
  a JCA ``MessageDigest`` provider lookup per row whose lock contends
  across threads of ONE JVM (measured: the same 8M-row sha2 job is
  ~3× slower on local[32] than local[8]), but separate executor JVMs
  share nothing. Weak-scaling efficiency = t(K)/t(4K) with fixed
  per-JVM work — exactly "4× executors chew 4× data in the same time".

Usage: python bench_scaling.py [n_keys] [lo] [hi] [P]
       python bench_scaling.py --pipeline [n_rows] [lo] [hi] [P]
       python bench_scaling.py --fleet [n_rows_per_jvm] [K] [4K] [cores_per_jvm]
"""

from __future__ import annotations

import json
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); n = int(sys.argv[2]); P = int(sys.argv[3])
from fastfilter_spark.spark import get_spark, build_partitioned_filter
from pyspark.sql import functions as F
spark = get_spark("scale", cpus=cpus, shuffle_partitions=P)
keys = spark.range(0, n, 1, P).select(F.xxhash64("id").alias("key")).cache()
keys.count()
# warm workers + module (untimed)
w = build_partitioned_filter(keys.limit(10000), kind="bf8", num_partitions=P)
w.with_contains(keys.limit(10000), "key").count()
reps = []
for _ in range(3):
    t0 = time.time()
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=P)
    reps.append(time.time() - t0)
t_build = min(reps)
t0 = time.time()
n_hits = pf.with_contains(keys, "key").where("contained").count()
t_query = time.time() - t0
assert n_hits >= 0.99 * pf.n_keys
print(json.dumps({"cpus": cpus, "n": n, "P": P,
                  "build_secs": t_build, "query_secs": t_query,
                  "build_keys_per_sec": n / t_build,
                  "query_keys_per_sec": n / t_query}))
spark.stop()
"""


GEN_CORPUS = r"""
import sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1]); path = sys.argv[2]
from fastfilter_spark.spark import get_spark
from pyspark.sql import functions as F
spark = get_spark("gen", cpus=32, shuffle_partitions=64)
# Deterministic corpus-shaped rows, all JVM-side. ~3% exact duplicate
# contents (id % 33 == 0 collapses onto id+1) exercises the dedupe stage.
base = spark.range(0, n, 1, 64).withColumn(
    "did", F.when(F.col("id") % 33 == 0, F.col("id") + 1).otherwise(F.col("id")))
df = base.select(
    F.concat(F.lit("org"), (F.col("id") % 17).cast("string"), F.lit("/repo"),
             (F.col("id") % 997).cast("string")).alias("repo"),
    F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
    F.sha2(F.concat(F.lit("c"), F.col("id").cast("string")), 256).alias("commit"),
    (F.col("id") % 8).cast("string").alias("lang"),
    # ~320-byte deterministic content per row
    F.repeat(F.sha2(F.col("did").cast("string"), 256), 5).alias("content"))
df.write.mode("overwrite").parquet(path)
spark.stop()
"""

PIPELINE_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); n = int(sys.argv[2]); P = int(sys.argv[3]); path = sys.argv[4]
from fastfilter_spark.spark import get_spark, build_partitioned_filter
from fastfilter_spark.spark.keys import keys_from_content
from pyspark.sql import functions as F
spark = get_spark("scale-pipe", cpus=cpus, shuffle_partitions=P)
corpus = spark.read.parquet(path)
# warm workers + modules (untimed, tiny slice)
w = build_partitioned_filter(
    keys_from_content(corpus.limit(20000)).dropDuplicates(["key"]),
    kind="bf8", num_partitions=P)
reps = []
for _ in range(3):
    t0 = time.time()
    keys = keys_from_content(corpus).dropDuplicates(["key"])
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=P)
    reps.append(time.time() - t0)
t_job = min(reps)
print(json.dumps({"cpus": cpus, "n": n, "P": P, "job_secs": t_job,
                  "rows_per_sec": n / t_job, "n_keys": pf.n_keys}))
spark.stop()
"""


def run(cpus: int, n: int, P: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n), str(P)],
        capture_output=True, text=True, timeout=1800, cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_pipeline(cpus: int, n: int, P: int, path: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", PIPELINE_CHILD, str(cpus), str(n), str(P), path],
        capture_output=True, text=True, timeout=1800, cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


FLEET_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["SPARK_DRIVER_MEM"] = "6g"   # executor-sized heap — K JVMs must co-exist in RAM
# Pre-fault the heap during the untimed warmup: without this, each JVM's
# heap growth during the timed rep shows up as kernel page-zeroing (40-65%
# system time observed fleet-wide) — work a long-lived executor does once.
os.environ["SPARK_DRIVER_JAVA_OPTS"] = "-Xms6g -XX:+AlwaysPreTouch"
cpus = int(sys.argv[1]); n = int(sys.argv[2]); P = int(sys.argv[3]); path = sys.argv[4]
from fastfilter_spark.spark import get_spark, build_partitioned_filter
from fastfilter_spark.spark.keys import keys_from_content
spark = get_spark("fleet", cpus=cpus, shuffle_partitions=P)
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(path)
def job():
    keys = keys_from_content(corpus).dropDuplicates(["key"])
    return build_partitioned_filter(keys, kind="bf8", num_partitions=P)
job()  # warm (page cache, JIT, python workers) — untimed
print("READY", flush=True)
sys.stdin.readline()  # barrier: parent releases all children together
reps = []
for _ in range(3):    # fleet stays concurrent through all reps (uniform times)
    t0 = time.time()
    pf = job()
    reps.append(time.time() - t0)
print(json.dumps({"job_secs": min(reps), "reps": [round(r, 2) for r in reps],
                  "n_keys": pf.n_keys}), flush=True)
spark.stop()
"""


def run_fleet(k: int, n: int, cores: int, path: str) -> dict:
    """Start k barrier-synchronized single-JVM pipeline jobs; return agg stats.

    Each child (JVM + its Python workers, via inherited affinity) is pinned
    to its own disjoint ``cores``-wide CPU set — a real 4-core executor is
    *constrained* to 4 cores by the resource manager, and without pinning
    the lo fleet would borrow the whole box's idle cores and fake a low
    efficiency. Disjoint pinning leaves shared DRAM/page-cache as the only
    cross-executor coupling, same as co-located executors on a real node.
    """
    import os
    import tempfile
    errfiles = [tempfile.NamedTemporaryFile("w+", prefix=f"fleet_err_{i}_",
                                            suffix=".log", delete=False)
                for i in range(k)]
    try:
        return _run_fleet(k, n, cores, path, errfiles)
    finally:
        # success path: close + remove the stderr logs (a scaling run is
        # reps × tiers of these — leaking them grows /tmp and fds). The
        # failure path re-raises with the relevant tail already read, so
        # nothing diagnostic is lost by unlinking here.
        for f in errfiles:
            try:
                f.close()
                os.unlink(f.name)
            except OSError:
                pass


def _run_fleet(k: int, n: int, cores: int, path: str, errfiles) -> dict:
    procs = [subprocess.Popen(
        ["taskset", "-c", f"{i * cores}-{i * cores + cores - 1}",
         sys.executable, "-c", FLEET_CHILD, str(cores), str(n), str(cores * 2), path],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=errfiles[i],
        text=True, cwd="/root/repo") for i in range(k)]
    for i, p in enumerate(procs):        # wait until every JVM is warm
        line = p.stdout.readline().strip()
        if line != "READY":
            # a child that dies pre-barrier (OOM kill, taskset range
            # beyond the host's cores) must surface WHY, not a bare
            # AssertionError with DEVNULL'd stderr
            errfiles[i].flush()
            with open(errfiles[i].name) as fh:
                tail = fh.read()[-2000:]
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"fleet child {i} failed before READY (got {line!r}); "
                f"stderr tail:\n{tail}")
    t0 = __import__("time").time()
    for p in procs:                      # release the barrier
        p.stdin.write("\n")
        p.stdin.flush()
    childs = [json.loads(p.stdout.readline()) for p in procs]
    wall = __import__("time").time() - t0
    for p in procs:
        p.wait(timeout=120)
    # per-JVM min-of-3 is the noise-robust stat (the sandbox host throttles
    # unpredictably); wall covers all 3 reps of every JVM.
    best = [c["job_secs"] for c in childs]
    t_rep = sum(best) / len(best)
    return {"jvms": k, "cores_per_jvm": cores, "rows_per_jvm": n,
            "wall_secs_3reps": round(wall, 2),
            "per_jvm_reps": [c["reps"] for c in childs],
            "per_jvm_best_secs": round(t_rep, 3),
            "agg_rows_per_sec": k * n / t_rep}


def main_fleet(argv: list[str]) -> None:
    n = int(argv[0]) if len(argv) > 0 else 4_000_000
    lo = int(argv[1]) if len(argv) > 1 else 2
    hi = int(argv[2]) if len(argv) > 2 else 8
    cores = int(argv[3]) if len(argv) > 3 else 4
    path = f"/tmp/ffsk_scale_corpus_{n}"
    import os
    if not os.path.exists(path + "/_SUCCESS"):
        out = subprocess.run([sys.executable, "-c", GEN_CORPUS, str(n), path],
                             capture_output=True, text=True, timeout=1800,
                             cwd="/root/repo")
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
    r_lo = run_fleet(lo, n, cores, path)
    r_hi = run_fleet(hi, n, cores, path)
    # weak scaling: per-JVM work fixed, so ideal is equal per-JVM time
    eff = r_lo["per_jvm_best_secs"] / r_hi["per_jvm_best_secs"]
    print(json.dumps({"mode": "fleet-weak-scaling", "lo": r_lo, "hi": r_hi,
                      "scaling_efficiency": round(eff, 3)}, indent=2))


def main_pipeline(argv: list[str]) -> None:
    n = int(argv[0]) if len(argv) > 0 else 8_000_000
    lo = int(argv[1]) if len(argv) > 1 else 8
    hi = int(argv[2]) if len(argv) > 2 else 32
    P = int(argv[3]) if len(argv) > 3 else 2 * hi
    path = f"/tmp/ffsk_scale_corpus_{n}"
    import os
    if not os.path.exists(path + "/_SUCCESS"):
        out = subprocess.run([sys.executable, "-c", GEN_CORPUS, str(n), path],
                             capture_output=True, text=True, timeout=1800,
                             cwd="/root/repo")
        if out.returncode != 0:
            raise RuntimeError(out.stderr[-2000:])
    r_lo = run_pipeline(lo, n, P, path)
    r_hi = run_pipeline(hi, n, P, path)
    ratio = hi / lo
    eff = r_hi["rows_per_sec"] / (r_lo["rows_per_sec"] * ratio)
    print(json.dumps({"mode": "pipeline", "n_rows": n, "P": P,
                      "lo": r_lo, "hi": r_hi,
                      "scaling_efficiency_pipeline": round(eff, 3)}, indent=2))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline":
        main_pipeline(sys.argv[2:])
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--fleet":
        main_fleet(sys.argv[2:])
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    P = int(sys.argv[4]) if len(sys.argv) > 4 else 2 * hi  # fixed task count both runs
    r_lo = run(lo, n, P)
    r_hi = run(hi, n, P)
    ratio = hi / lo
    eff_build = r_hi["build_keys_per_sec"] / (r_lo["build_keys_per_sec"] * ratio)
    eff_query = r_hi["query_keys_per_sec"] / (r_lo["query_keys_per_sec"] * ratio)
    report = {
        "n_keys": n, "P": P, "lo": r_lo, "hi": r_hi,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query": round(eff_query, 3),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
