"""Per-group membership filters: one filter blob per group key.

Two shapes for "is key k a member of group g's set", picked by the
group domain:

* **Bounded group domains** (lang, source, date partition, tenant —
  up to ~10^4 groups): :func:`build_grouped_filters` builds one blob
  per group via ``groupBy(group_cols).applyInArrow`` and queries route
  by the group value. Each group's key set must fit one task (the same
  bound a GROUP BY aggregation state has); per-group FPP/size metrics
  come out per row, and a single group's filter can be exported and
  shipped on its own (:meth:`GroupedFilters.filter_for`).

* **Unbounded / Zipf-skewed group domains** (repo at 10^12-file scale):
  do NOT build per-group blobs — fold the group into the key instead:
  ``xxhash64(group..., key)`` and build ONE salted-partitioned filter
  over the composite keys (`build_partitioned_filter`). Membership of
  (g, k) is `contains(xxhash64(g, k))`; skew is defused because
  placement hashes the composite, never the group. The driver query
  ``bf8_grouped_membership`` demonstrates the first shape and
  ``bf8_composite_grouped`` the second, against the same exact oracle.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_SEP = "\x1f"
GROUP_ESC = "\x1e"


def _esc_py(v: str) -> str:
    """Escape a group value so GROUP_SEP inside values cannot alias two
    distinct multi-column groups onto one gkey (mirrors _gkey_expr)."""
    return v.replace(GROUP_ESC, GROUP_ESC + GROUP_ESC) \
            .replace(GROUP_SEP, GROUP_ESC + GROUP_SEP)

_GROUPED_SCHEMA = (
    "gkey string, kind string, blob binary, n_keys long, keys_ingested long, "
    "attempts int, peel_rounds int, build_secs double, bits_per_entry double"
)


def _gkey_expr(group_cols: Sequence[str]):
    # escape GROUP_ESC then GROUP_SEP per value (same scheme as _esc_py)
    # so ('a\x1fb','c') and ('a','b\x1fc') cannot collide on one gkey
    def esc(c):
        s = F.col(c).cast("string")
        s = F.replace(s, F.lit(GROUP_ESC), F.lit(GROUP_ESC + GROUP_ESC))
        return F.replace(s, F.lit(GROUP_SEP), F.lit(GROUP_ESC + GROUP_SEP))
    return F.concat_ws(GROUP_SEP, *[esc(c) for c in group_cols])


@dataclass
class GroupedFilters:
    """group value(s) -> filter blob; queryable as a DataFrame predicate."""

    kind: str
    group_cols: List[str]
    blob_map: Dict[str, bytes]
    metrics: pd.DataFrame                  # one row per group (no blob)
    token: str = field(default_factory=lambda: uuid.uuid4().hex)

    def with_contains(self, df: DataFrame, key_col: str,
                      out_col: str = "contained") -> DataFrame:
        """contained := key ∈ filter[group cols of the row]. Rows whose
        group had no filter at build time get False (empty set) — and
        so do rows with a NULL group value (the build excludes NULL
        groups; without this guard concat_ws would silently alias a
        NULL group onto the empty-string group's filter)."""
        spark = df.sparkSession
        from .. import workerside
        bc = spark.sparkContext.broadcast((self.token, self.blob_map))

        @F.pandas_udf("boolean")
        def _contains(key: pd.Series, gkey: pd.Series) -> pd.Series:
            return workerside.contains_grouped_kernel(bc.value, key, gkey)

        # the guard covers the KEY too: (a) the build drops NULL keys so
        # the SQL-consistent answer is False, and (b) one NULL in a
        # batch degrades the int64 key column to float64 at the Arrow
        # boundary — keys >2^53 lose bits and the batch's REAL keys get
        # false negatives. coalesce keeps the batch int64; the mask
        # discards the substitute rows.
        all_non_null = F.col(key_col).isNotNull()
        for c in self.group_cols:
            all_non_null = all_non_null & F.col(c).isNotNull()
        key_safe = F.coalesce(F.col(key_col), F.lit(0).cast("bigint"))
        return df.withColumn(
            out_col,
            F.when(all_non_null,
                   _contains(key_safe, _gkey_expr(self.group_cols)))
             .otherwise(F.lit(False)))

    def filter_for(self, *values):
        """Load one group's filter driver-side (export / unit probes).

        Group keys were rendered by Spark's cast-to-string at build
        time, which disagrees with Python's str() for some types
        (bool: 'true' vs 'True'; doubles: Java '1.0E-7' vs Python
        '1e-07') — so after an exact-string miss, bools are mapped to
        Spark's lowercase form and numeric values fall back to a
        value-equality scan over the (bounded, ≤max_groups) key set."""
        def _canon(v):
            if isinstance(v, bool):
                return "true" if v else "false"
            return str(v)

        def _k(vals):
            return GROUP_SEP.join(_esc_py(s) for s in vals)

        from .. import workerside
        key = _k([_canon(v) for v in values])
        if key not in self.blob_map and any(
                isinstance(v, float) for v in values):
            for gkey in self.blob_map:
                # split on bare SEP: numeric renderings never contain
                # it, and a string value that does (escaped ESC+SEP)
                # inflates the part count, failing the length check —
                # such groups are only reachable by exact match above
                parts = gkey.split(GROUP_SEP)
                if len(parts) != len(values):
                    continue
                try:
                    if all((float(p) == float(v))
                           if isinstance(v, float) else (p == _canon(v))
                           for p, v in zip(parts, values)):
                        key = gkey
                        break
                except ValueError:
                    continue
        return workerside.load_filter(self.blob_map[key])

    @property
    def n_groups(self) -> int:
        return len(self.blob_map)


def build_grouped_filters(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str = "key",
    kind: str = "bf8",
    base_rng_state: int = 0x726B2B9D438B9D4D,
    bloom_n_expected_per_group: Optional[int] = None,
    bloom_fpp: float = 0.01,
    max_groups: int = 100_000,
) -> GroupedFilters:
    """One filter per distinct (group_cols) value — for BOUNDED group
    domains (lang, event_type, region…), enforced by ``max_groups``.

    The exchange is the groupBy shuffle only; dedupe is the in-task
    np.unique (global per group, same argument as the pid build). The
    per-group RNG seed depends only on (base_rng_state, group values),
    so rebuilds are byte-identical regardless of parallelism.
    NULL group values are excluded (concat_ws drops NULLs, which would
    alias groups) — filter them upstream if they are meaningful.

    ``max_groups``: every group's blob is collected to the driver for
    broadcast querying, so a mistakenly-unbounded group column (user_id,
    doc_id…) would OOM the driver exactly the way the ungrouped build
    did at 1e9 keys before the sidecar path. The cap is enforced on the
    build output itself — ``limit(max_groups+1)`` above the grouped
    build, checked before any blob beyond the cap reaches the driver —
    so the happy path pays NO extra scan (a separate
    distinct().limit() probe job would re-read the whole input before
    the build reads it again; limits above an aggregate don't
    short-circuit the partial aggregation). On the error path the
    executors may build the over-cap groups before the driver refuses —
    the rare case pays, not the common one. For genuinely
    high-cardinality group domains use the composite-key path (module
    docstring): hash the group INTO the key and build ONE partitioned
    filter — no per-group blob.
    """
    from .. import workerside

    bloom_args = None
    if kind in workerside.BLOOM_KINDS:
        if bloom_n_expected_per_group is None:
            raise ValueError("bloom grouped build needs "
                             "bloom_n_expected_per_group")
        bloom_args = (max(16, int(1.2 * bloom_n_expected_per_group)),
                      bloom_fpp)

    from .keys import require_long_key
    require_long_key(df, key_col, "build_grouped_filters")
    all_non_null = F.lit(True)
    for c in group_cols:
        all_non_null = all_non_null & F.col(c).isNotNull()
    placed = (df.where(all_non_null)
              .select(_gkey_expr(group_cols).alias("gkey"),
                      F.col(key_col).alias("key"))
              .where(F.col("key").isNotNull()))

    def _build(tbl):
        return workerside.build_group_arrow(tbl, kind, base_rng_state,
                                            bloom_args)

    # cap enforced ON the build output: at most max_groups+1 blob rows
    # ever reach the driver (bounded memory even for an unbounded
    # domain), and the happy path pays zero extra input scans
    rows = (placed.groupBy("gkey").applyInArrow(_build, _GROUPED_SCHEMA)
            .limit(max_groups + 1).toPandas())
    if len(rows) > max_groups:
        raise ValueError(
            f"build_grouped_filters: group domain exceeds max_groups="
            f"{max_groups} (every group's blob is collected driver-side "
            "— an unbounded domain OOMs the driver). For high-cardinality"
            " group columns fold the group INTO the key instead: "
            "build_partitioned_filter over xxhash64(group..., key) "
            "composite keys (the bf8_composite_grouped query shape, see "
            "module docstring), or raise max_groups deliberately.")
    blob_map = {r["gkey"]: bytes(r["blob"]) for _, r in rows.iterrows()}
    return GroupedFilters(kind, list(group_cols), blob_map,
                          rows.drop(columns=["blob"]))
