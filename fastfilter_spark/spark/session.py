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
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
