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

Usage: python bench_scaling.py [n_keys] [lo] [hi]
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


def run(cpus: int, n: int, P: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n), str(P)],
        capture_output=True, text=True, timeout=1800, cwd="/root/repo")
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
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
