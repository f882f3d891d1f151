#!/usr/bin/env bash
# spark-submit deployment evidence (north_rule: "run via spark-submit
# --py-files on a multi-executor cluster"). Packages the library as a
# zip and submits bench.py exactly as a cluster deployment would —
# in the sandbox the master is local[N]; on a real cluster swap
# --master for yarn/k8s and the same artifact works unchanged.
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${SPARK_GRAFT_CPUS:-32}"
rm -f /tmp/fastfilter_spark.zip
zip -qr /tmp/fastfilter_spark.zip fastfilter_spark fixtures __spark_entry__.py
exec spark-submit \
  --master "local[${CPUS}]" \
  --py-files /tmp/fastfilter_spark.zip \
  --conf spark.sql.shuffle.partitions="${CPUS}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.driver.memory="${SPARK_DRIVER_MEM:-24g}" \
  bench.py
