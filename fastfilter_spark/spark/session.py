"""SparkSession factory tuned for this engine.

Local-mode defaults match the sandbox (local[N], one JVM); the configs
that matter at cluster scale (AQE, Arrow, shuffle partitions) are the
same ones a 1000-executor deployment would set via spark-submit.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "fastfilter_spark", cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """``extra_conf`` entries are applied last (override the defaults);
    note getOrCreate only honors configs when it CREATES the session —
    callers needing special configs (event log, etc.) should run in
    their own process, as the bench tools do."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    # Shuffle/spill scratch space: Spark's guidance is the fastest
    # LOCAL storage available. When nothing is configured (standard
    # SPARK_LOCAL_DIRS env unset, no explicit spark.local.dir) and a
    # RAM-backed /dev/shm with ample headroom exists, use it — the
    # 1e8-key build's 1.6 GB exchange measured 16.6 s -> 10.4 s on
    # this box (disk-bound shuffle files). Deployment-safe: YARN/K8s
    # inject their own LOCAL_DIRS which OVERRIDE spark.local.dir (so
    # clusters are unaffected), any explicit env/conf wins below, and
    # a small /dev/shm (<32 GiB free) falls back to the default.
    local_dir = None
    if not os.environ.get("SPARK_LOCAL_DIRS"):
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 32 << 30:
                cand = "/dev/shm/ffsk-local"
                # prove writability NOW: an unwritable dir would fail
                # every session at first shuffle, not just run slower
                os.makedirs(cand, exist_ok=True)
                probe = os.path.join(cand, f".probe-{os.getpid()}")
                with open(probe, "w") as fh:
                    fh.write("ok")
                os.remove(probe)
                # sweep leftovers of CRASHED sessions (a SIGKILLed JVM
                # never deletes its spark-*/blockmgr-* scratch, and in
                # tmpfs that is leaked RAM until reboot). Only entries
                # untouched for >24 h are removed — a live session's
                # shuffle files are recent by construction, and
                # concurrent sessions each own uuid'd subdirs.
                import shutil
                import time as _time
                cutoff = _time.time() - 24 * 3600
                for d in os.listdir(cand):
                    p = os.path.join(cand, d)
                    try:
                        if os.path.getmtime(p) < cutoff:
                            shutil.rmtree(p, ignore_errors=True)
                    except OSError:
                        pass
                local_dir = cand
        except (OSError, AttributeError):
            local_dir = None
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1048576")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_DRIVER_JAVA_OPTS", ""))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/ffsk_warehouse"))
        # the in-driver filter handle collects P blobs (~1.1 GB at 1e9
        # keys, bf8) — default 1g maxResultSize breaks first; the true
        # 10^12 path is io.build_filter_sidecar (driver never holds blobs)
        .config("spark.driver.maxResultSize", "8g")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if local_dir is not None and "spark.local.dir" not in (extra_conf or {}):
        builder = (
            builder.config("spark.local.dir", local_dir)
            # Paired with the RAM-backed dir, not with core count:
            # shuffle checksums exist to diagnose silent DISK
            # corruption of shuffle files — tmpfs has no such failure
            # mode, and the CRC pass costs ~0.5 s per 1.6 GB exchange;
            # the bigger write buffer batches syscalls into tmpfs
            # (another ~0.5 s on the same exchange). Cluster deploys
            # (YARN/K8s LOCAL_DIRS, or SPARK_LOCAL_DIRS set) never
            # reach this branch and keep Spark's defaults.
            .config("spark.shuffle.checksum.enabled", "false")
            .config("spark.shuffle.file.buffer", "1m"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
