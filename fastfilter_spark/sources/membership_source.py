"""Custom Python DataSource: membership-filtered parquet scan.

``spark.read.format("ffsk_membership")`` reads a parquet dataset and
applies a persisted PartitionedFilter (a sidecar written by
``write_filter_sidecar``) INSIDE the scan, so downstream operators only
ever see the candidate (or definitely-absent) rows. This is the
DataSourceV2 runtime-filter pushdown described in SURVEY.md §4 —
Spark's internal ``InjectRuntimeFilter``/``might_contain`` is the JVM
precedent — implemented with the public Spark 4 Python DataSource API
instead of a custom Catalyst rule.

Scale shape:

* one :class:`InputPartition` per parquet row group — the natural
  distributed unit; at 100 TB each task reads one row group and its
  routed filter blobs only (blobs cache per executor process);
* key routing is the bit-exact numpy replica of Spark's
  ``xxhash64(key, salt)`` (core.hashing.route_pid), so the scan probes
  the same blob ``with_contains`` would — production FPP, zero FN;
* simple comparison predicates Spark pushes via ``pushFilters`` are
  evaluated on each Arrow batch *before* the membership probe
  (cheapest first), everything else stays in Catalyst.

Options: ``path`` (parquet file/dir), ``sidecar`` (sidecar dir),
``key_col`` (default ``key``), ``mode`` = ``semi`` (keep candidate
members; FP rate ε — follow with an exact confirm join for exactness)
or ``anti`` (keep definite non-members; exact thanks to zero FN).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource, DataSourceReader, EqualTo, Filter, GreaterThan,
    GreaterThanOrEqual, In, InputPartition, IsNotNull, LessThan,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType

_SUPPORTED = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan,
              LessThanOrEqual, In, IsNotNull)

# per-process cache: sidecar path -> (manifest dict, list[blob bytes])
_SIDECAR_CACHE: dict = {}


def _load_sidecar(sidecar: str):
    # cache key includes the manifest's identity: a filter REBUILT at
    # the same path must not be answered from a long-lived worker's
    # stale blobs (false negatives for newly added keys). Token logic
    # shared with the query-side caches in workerside.
    from ..workerside import sidecar_cache_token
    manifest_path = os.path.join(sidecar, "filter_manifest.json")
    ckey = sidecar_cache_token(sidecar)
    ent = _SIDECAR_CACHE.get(ckey)
    if ent is None:
        import pyarrow.parquet as pq
        with open(manifest_path) as fh:
            manifest = json.load(fh)
        tbl = pq.read_table(os.path.join(sidecar, "partials.parquet"),
                            columns=["pid", "blob"])
        blobs: List[bytes] = [b""] * manifest["P"]
        for pid, blob in zip(tbl.column("pid").to_pylist(),
                             tbl.column("blob").to_pylist()):
            blobs[int(pid)] = blob
        ent = _SIDECAR_CACHE[ckey] = (manifest, blobs)
        while len(_SIDECAR_CACHE) > 4:
            _SIDECAR_CACHE.pop(next(iter(_SIDECAR_CACHE)))
    return ent


def _list_fragments(path: str) -> List[tuple]:
    """(file, row_group_index) pairs — the partition units."""
    import pyarrow.dataset as ds
    dataset = ds.dataset(path, format="parquet")
    out = []
    for frag in dataset.get_fragments():
        n_rg = frag.metadata.num_row_groups if frag.metadata else 1
        out.extend((frag.path, rg) for rg in range(n_rg))
    return out


@dataclass
class _RowGroupPartition(InputPartition):
    file: str
    row_group: int


class FFSKMembershipReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.path = options.get("path")
        self.sidecar = options.get("sidecar")
        if not self.path or not self.sidecar:
            raise ValueError("ffsk_membership needs options path= and sidecar=")
        self.key_col = options.get("key_col", "key")
        self.mode = options.get("mode", "semi")
        if self.mode not in ("semi", "anti"):
            raise ValueError(f"mode must be semi|anti, got {self.mode!r}")
        self.columns = [f.name for f in schema.fields]
        self.pushed: List[Filter] = []

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, _SUPPORTED) and len(f.attribute) == 1:
                self.pushed.append(f)
            else:
                yield f  # unsupported → Catalyst keeps it

    def partitions(self):
        return [_RowGroupPartition(f, rg)
                for f, rg in _list_fragments(self.path)]

    def read(self, partition: _RowGroupPartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..workerside import contains_routed

        manifest, blobs = _load_sidecar(self.sidecar)
        if manifest["routing"] != "xxhash_pmod":
            raise ValueError("ffsk_membership needs xxhash_pmod routing "
                             "(packed-shuffle build)")
        P, salt = manifest["P"], manifest["salt"]

        pf = pq.ParquetFile(partition.file)
        for batch in pf.iter_batches(row_groups=[partition.row_group],
                                     columns=self.columns):
            mask = None
            for f in self.pushed:  # comparison predicates first (cheap)
                col = batch.column(f.attribute[0])
                if isinstance(f, EqualTo):
                    m = pc.equal(col, f.value)
                elif isinstance(f, GreaterThan):
                    m = pc.greater(col, f.value)
                elif isinstance(f, GreaterThanOrEqual):
                    m = pc.greater_equal(col, f.value)
                elif isinstance(f, LessThan):
                    m = pc.less(col, f.value)
                elif isinstance(f, LessThanOrEqual):
                    m = pc.less_equal(col, f.value)
                elif isinstance(f, In):
                    m = pc.is_in(col, value_set=pa.array(list(f.values)))
                else:  # IsNotNull
                    m = pc.is_valid(col)
                m = pc.fill_null(m, False)
                mask = m if mask is None else pc.and_(mask, m)
            if mask is not None:
                batch = batch.filter(mask)
            if batch.num_rows == 0:
                continue
            kcol = batch.column(self.key_col)
            # NULL-safe: to_numpy on an int64 column WITH nulls yields
            # float64 (+NaN) and astype(int64) of NaN is undefined —
            # fill to keep the int64 path, then answer False for nulls
            # (matching contains_kernel: a NULL key is not a member)
            null_mask = (pc.is_null(kcol).to_numpy(zero_copy_only=False)
                         if kcol.null_count else None)
            if null_mask is not None:
                kcol = pc.fill_null(kcol, 0)
            keys = kcol.to_numpy(zero_copy_only=False) \
                       .astype(np.int64, copy=False).view(np.uint64)
            member = contains_routed(blobs, salt, P, keys)
            if null_mask is not None:
                member[null_mask] = False
            keep = member if self.mode == "semi" else ~member
            if keep.any():
                yield batch.filter(pa.array(keep))


class FFSKMembershipDataSource(DataSource):
    """format("ffsk_membership") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "ffsk_membership"

    def schema(self) -> str:
        import pyarrow.dataset as ds
        from pyspark.sql.pandas.types import from_arrow_schema
        dataset = ds.dataset(self.options.get("path"), format="parquet")
        return from_arrow_schema(dataset.schema)

    def reader(self, schema: StructType) -> FFSKMembershipReader:
        return FFSKMembershipReader(schema, self.options)


def register_sources(spark) -> None:
    # pushFilters() requires the (off-by-default) python pushdown flag
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FFSKMembershipDataSource)
