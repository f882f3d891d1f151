"""Sources and sinks.

* ``read_corpus`` — the Iceberg-shaped corpus table. Uses an Iceberg
  catalog table when the runtime has the Iceberg Spark extension (the
  production deployment per BASELINE.json input_hint); this sandbox
  ships no Iceberg jar, so a parquet directory with the identical
  schema is the tested path. Either way the result is a plain
  DataFrame and everything downstream is source-agnostic.
* ``write_filter_sidecar`` / ``read_filter_sidecar`` — persist a built
  PartitionedFilter as a parquet sidecar table (one row per pid with
  blob + lineage metrics + a table-level manifest row), so a filter
  built once can be re-loaded and queried by later jobs without a
  rebuild. This is the publishable artifact of SURVEY.md §3 stage 6.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .build import PartitionedFilter

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def read_corpus(spark: SparkSession, location: str,
                table: Optional[str] = None) -> DataFrame:
    """Load the corpus from an Iceberg table if a catalog is configured,
    else from parquet at ``location``."""
    if table is not None:
        try:
            return spark.read.table(table)
        except Exception:
            pass  # no catalog/extension in this runtime → parquet path
    return spark.read.parquet(location)


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int = 64, sort_col: Optional[str] = None,
                   mode: str = "overwrite") -> None:
    """Bucketed parquet sink: pay the shuffle once at write time.

    Rows are hash-clustered into ``num_buckets`` files by ``bucket_col``
    (Spark's HashPartitioning), so every later join or aggregation on
    that column between bucketed tables runs **without an Exchange** —
    at 100 TB the dominant cost of a key-key join is the shuffle, and
    bucketing amortizes it across every downstream query. Sorted
    buckets additionally skip the sort of a sort-merge join.
    (Analog of the reference's block counting-sort scatter: pre-cluster
    by hash once, then every probe is local.)
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # with a non-persistent catalog (local in-memory metastore) the
    # warehouse directory can outlive the table entry — clear it, or
    # saveAsTable fails with LOCATION_ALREADY_EXISTS
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), table)
    if os.path.isdir(loc):
        import shutil
        shutil.rmtree(loc)
    w = (df.write.format("parquet").mode(mode)
         .bucketBy(num_buckets, bucket_col))
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_filter_sidecar(pf: PartitionedFilter, path: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    # one row per pid — including pids that received no keys (their
    # synthesized empty-filter blobs must survive the round trip, or a
    # probe routed to them would have nothing to load)
    tbl = (pd.DataFrame({"pid": range(pf.num_partitions)})
           .merge(pf.metrics, on="pid", how="left"))
    tbl["blob"] = [pf.blobs[int(p)] for p in tbl["pid"]]
    pq.write_table(pa.Table.from_pandas(tbl, preserve_index=False),
                   os.path.join(path, "partials.parquet"))
    with open(os.path.join(path, "filter_manifest.json"), "w") as fh:
        json.dump({"kind": pf.kind, "P": pf.num_partitions,
                   "salt": pf.salt, "routing": pf.routing,
                   "n_keys": pf.n_keys}, fh)


def contains_via_sidecar(probes: DataFrame, sidecar_path: str,
                         key_col: str = "key") -> DataFrame:
    """Large-P membership query: shuffle probes to their pid and let
    each task read only its own blob from the sidecar (constant memory
    per worker; the broadcast path in ``with_contains`` ships all P
    blobs to every worker, which stops scaling past P≈64).

    Only valid for filters built with the default packed shuffle
    (routing = pmod(xxhash64(key, salt), P)).
    """
    import pyspark.sql.functions as F

    from .. import workerside
    from .keys import ROUTING_XXHASH_PMOD, partition_id, route_expr

    with open(os.path.join(sidecar_path, "filter_manifest.json")) as fh:
        m = json.load(fh)
    if m["routing"] != ROUTING_XXHASH_PMOD:
        raise ValueError("sidecar query requires xxhash_pmod routing")
    P, salt = m["P"], m["salt"]

    # repartition on the pid expression: Spark places each pid wholly in
    # one task (a task may hold a few pids — handled in the kernel).
    routed = probes.withColumn("__route", route_expr(key_col, salt)) \
                   .repartition(P, partition_id(key_col, P, salt))

    def _probe(batches):
        return workerside.contains_sidecar_route(
            batches, sidecar_path, P, key_name=key_col)

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in routed.schema.fields) + ", contained boolean"
    return routed.mapInArrow(_probe, out_schema).drop("__route")


def read_filter_sidecar(path: str) -> PartitionedFilter:
    import pyarrow.parquet as pq
    with open(os.path.join(path, "filter_manifest.json")) as fh:
        m = json.load(fh)
    rows = pq.read_table(os.path.join(path, "partials.parquet")).to_pandas()
    rows = rows.sort_values("pid").reset_index(drop=True)
    blobs: list = [b"" for _ in range(m["P"])]
    for _, r in rows.iterrows():
        blobs[int(r["pid"])] = bytes(r["blob"])
    return PartitionedFilter(m["kind"], m["P"], m["salt"], blobs,
                             rows.drop(columns=["blob"]), m["routing"])
