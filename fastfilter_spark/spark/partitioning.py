"""Sketch-driven partitioning: one-pass range repartition and
heavy-hitter-targeted salted joins (north_rule: "partitioning /
shuffle / skew handled explicitly").

Both operators close the loop between the sketch library and the
engine's own shuffle planning — the sketches stop being read-only
estimates and start steering physical layout:

``kll_range_repartition``
    Spark's ``repartitionByRange`` launches a SEPARATE sampling job to
    find range bounds, re-executing everything upstream of the last
    shuffle (measured here: the sidecar writer re-ran its whole build
    reduce stage; 1e9-key build 378→283 s after removing it — see
    CLAUDE.md). This operator computes the bounds from the mergeable
    KLL aggregation instead: ONE pass, map-side partial sketches, a
    KB-sized blob shuffle — then assigns buckets with an O(log P)-deep
    Catalyst CASE tree and lands each bucket on its own partition via
    carrier values chosen so ``pmod(hash(carrier), P) == bucket``. No
    sampling job, no lineage re-execution, deterministic bounds
    (KLLSketch is seeded), and the bounds are a reusable artifact: the
    same list range-partitions every future frame of the table
    identically, which is what keeps a layout stable ACROSS stages and
    writes at 100 TB.

``auto_salted_join``
    :func:`fastfilter_spark.spark.skew.salted_join` defuses skew by
    replicating the whole dim side ``salt_n`` times — correct, but the
    replication cost is paid for every key even though only the hot
    few need it. Here a Misra-Gries pass over the fact side's join key
    (two-phase, tiny blob shuffle) detects the hot keys first — MG's
    deterministic guarantee: any key with frequency > threshold·n is
    in the candidate set, so no hot key is ever missed; false
    positives merely salt a cold key, never affect correctness. The
    join then splits: hot fact rows join a salt_n-replicated hot-only
    dim slice; cold rows join the dim untouched. Result is row-for-row
    identical to the plain join; dim replication shrinks from
    |dim|·salt_n to |hot|·salt_n.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_CARRIER_CACHE: dict = {}
_BUCKET = "__ffsk_bucket"
_CARRIER = "__ffsk_carrier"
_KH = "__ffsk_keyhash"
_SALT = "__ffsk_salt"


# ---------------------------------------------------------------------------
# KLL-driven range repartition
# ---------------------------------------------------------------------------

def string_prefix_key(col) -> Column:
    """Order-preserving 48-bit key for a string column: the first 6
    UTF-8 bytes, zero-padded, as a bigint. Spark's default collation
    compares strings byte-lexicographically and UTF-8 byte order equals
    code-point order, so ``prefix(a) < prefix(b) ⇒ a <= b`` — integer
    order is a coarsening of string order (strings sharing a 6-byte
    prefix compare equal and therefore CO-LOCATE in any bucketing of
    this key). 48 bits so every value is exactly representable as a
    double (the KLL sketch's value type). For domains with a long
    shared prefix (URLs all starting ``https://``) strip it first —
    otherwise all mass lands on few key values and ranges collapse."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.rpad(F.hex(F.encode(c, "UTF-8")), 12, "0"),
                  16, 10).cast("long")


def _order_expr(df: DataFrame, col: str):
    """(ordering expression, is_string) — strings order by their
    48-bit prefix key, numerics by themselves."""
    if dict(df.dtypes).get(col) == "string":
        return string_prefix_key(col).cast("double"), True
    return F.col(col), False


def kll_partition_bounds(df: DataFrame, col: str, num_partitions: int,
                         k: int = 200) -> List[float]:
    """P-1 ascending split points for ``col`` from one mergeable-KLL
    pass (no sampling job — module docstring). Duplicate quantiles
    (a value heavier than 1/P collapses neighbouring splits) are
    dropped, so fewer than P-1 bounds means the data genuinely cannot
    fill P distinct ranges. String columns are supported via
    :func:`string_prefix_key` (bounds are then prefix-key values)."""
    from .sketch_agg import kll_agg
    from ..sketches import KLLSketch
    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    if num_partitions == 1:
        return []
    expr, _ = _order_expr(df, col)
    rows = kll_agg(df.select(expr.alias("__ffsk_ord")), [],
                   "__ffsk_ord", k=k).collect()
    if not rows:
        return []   # empty / all-NULL input: one partition, no splits
    sk = KLLSketch.from_bytes(bytes(rows[0].sketch))
    bounds: List[float] = []
    for i in range(1, num_partitions):
        q = float(sk.quantile(i / num_partitions))
        if np.isnan(q):
            continue   # empty sketch (all values NaN-dropped)
        if not bounds or q > bounds[-1]:
            bounds.append(q)
    return bounds


def range_bucket(col, bounds: Sequence[float]) -> Column:
    """Bucket index in [0, len(bounds)] for a value against ascending
    ``bounds`` — a BALANCED ``when`` tree, so each row evaluates
    O(log P) comparisons inside whole-stage codegen (a flat bounds-array
    scan would be O(P)/row; Spark's own RangePartitioner does the same
    binary search JVM-side). NULLs land in bucket 0, matching
    range-partitioning's nulls-first order. Semantics: bucket i holds
    bounds[i-1] <= v < bounds[i]."""
    col = F.col(col) if isinstance(col, str) else col
    if not bounds:
        return F.lit(0)
    if list(bounds) != sorted(set(bounds)):
        raise ValueError("bounds must be strictly ascending")

    def _bs(lo: int, hi: int) -> Column:
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return (F.when(col < F.lit(float(bounds[mid])), _bs(lo, mid))
                .otherwise(_bs(mid + 1, hi)))

    return F.when(col.isNull(), F.lit(0)).otherwise(_bs(0, len(bounds)))


def _carriers(spark, num_partitions: int) -> List[int]:
    """carriers[b] = an int with pmod(hash(carrier), P) == b, so
    ``repartition(P, carrier_col)`` lands bucket b EXACTLY on partition
    b (plain ``repartition(P, bucket)`` would pmod-hash the bucket id —
    collisions merge buckets and leave other partitions empty).
    ``F.hash`` is the same Murmur3(seed=42) HashPartitioning uses, so
    the mapping is computed with Spark's own hash, not a replica.
    Carriers are a pure function of P — cached, so the tiny discovery
    job runs once per P per process, not once per repartition call."""
    P = int(num_partitions)
    if P in _CARRIER_CACHE:
        return _CARRIER_CACHE[P]
    found: dict = {}
    lo = 0
    while len(found) < P:
        hi = lo + 64 * P
        rows = (spark.range(lo, hi)
                .select(F.col("id").cast("int").alias("c"),
                        F.pmod(F.hash(F.col("id").cast("int")), F.lit(P))
                        .alias("b"))
                .groupBy("b").agg(F.min("c").alias("c")).collect())
        for r in rows:
            found.setdefault(int(r.b), int(r.c))
        lo = hi
        if lo > 64 * P * 32:   # pragma: no cover - astronomically unlikely
            raise RuntimeError(f"no carrier found for all {P} partitions")
    _CARRIER_CACHE[P] = [found[b] for b in range(P)]
    return _CARRIER_CACHE[P]


def kll_range_repartition(df: DataFrame, col: str, num_partitions: int,
                          k: int = 200,
                          bounds: Optional[Sequence[float]] = None,
                          sort_within: bool = False) -> DataFrame:
    """Range-repartition ``df`` on ``col`` into ``num_partitions``
    without Spark's bound-sampling job (module docstring): partition i
    holds exactly the rows of bucket i, buckets ascending in ``col``,
    sizes balanced to the KLL rank error (~1.7/sqrt(k) per split).
    Pass ``bounds`` (from :func:`kll_partition_bounds`, possibly of
    another frame of the same table) to reuse a layout across stages;
    ``sort_within=True`` adds a shuffle-free per-partition sort — the
    pair is a global sort at one exchange. String columns range on
    their 48-bit prefix key (:func:`string_prefix_key`) — ties
    co-locate, so per-partition ranges stay disjoint in FULL string
    order; the within-partition sort uses the full string."""
    if bounds is None:
        bounds = kll_partition_bounds(df, col, num_partitions, k=k)
    elif len(bounds) + 1 > num_partitions:
        raise ValueError(
            f"{len(bounds)} explicit bounds imply {len(bounds) + 1} "
            f"partitions > num_partitions={num_partitions}; pass "
            "num_partitions=len(bounds)+1")
    P = len(bounds) + 1
    carriers = _carriers(df.sparkSession, P)
    order_expr, _ = _order_expr(df, col)
    out = (df.withColumn(_BUCKET, range_bucket(order_expr, bounds))
           .withColumn(_CARRIER, F.element_at(
               F.array(*[F.lit(c) for c in carriers]),
               F.col(_BUCKET) + 1))
           .repartition(P, F.col(_CARRIER))
           .drop(_BUCKET, _CARRIER))
    if sort_within:
        out = out.sortWithinPartitions(col)
    return out


def sorted_write(df: DataFrame, col: str, path: str,
                 num_partitions: int, k: int = 200,
                 bounds: Optional[Sequence[float]] = None,
                 mode: str = "overwrite") -> List[float]:
    """Write ``df`` as a range-clustered parquet layout ordered by
    ``col``: file i covers a disjoint ascending value range and is
    sorted within — the layout parquet min/max row-group statistics
    (and :mod:`.skipindex`) prune against. Exactly the effect of
    ``orderBy(col).write`` but WITHOUT the range-sampling job that
    re-executes upstream lineage (module docstring), and with
    reusable ``bounds``: pass the returned list to later writes of
    the same table family for a byte-stable cross-write layout.
    NULLs land first in file 0 (SQL NULLS FIRST order). Returns the
    bounds used."""
    if bounds is None:
        bounds = kll_partition_bounds(df, col, num_partitions, k=k)
    out = kll_range_repartition(df, col, max(len(bounds) + 1, 1),
                                bounds=list(bounds), sort_within=True)
    out.write.mode(mode).parquet(path)
    return list(bounds)


# ---------------------------------------------------------------------------
# Z-order (Morton) multi-column clustering
# ---------------------------------------------------------------------------

_Z = "__ffsk_z"


def zorder_bounds(df: DataFrame, cols: Sequence[str], bits: int = 8,
                  k: int = 200) -> dict:
    """Per-column equi-depth bucket bounds at resolution ``2**bits``,
    for ALL columns in ONE input pass: the order expressions are
    stacked via ``posexplode`` into (cid, value) rows and aggregated
    with the grouped mergeable KLL — one scan and a KB-sized blob
    shuffle whatever the column count, where per-column passes would
    re-scan the input C times (the cost that matters at 100 TB).
    Columns whose quantiles collapse (heavy values) get fewer bounds;
    all-NULL columns get none (their bucket is constant 0). String
    columns bucket on :func:`string_prefix_key`."""
    from .sketch_agg import kll_agg
    from ..sketches import KLLSketch
    if not cols:
        raise ValueError("zorder_bounds needs at least one column")
    R = 1 << bits
    exprs = [_order_expr(df, c)[0].cast("double") for c in cols]
    stacked = df.select(F.posexplode(F.array(*exprs))
                        .alias("__ffsk_cid", "__ffsk_ord"))
    rows = kll_agg(stacked, ["__ffsk_cid"], "__ffsk_ord", k=k).collect()
    sk_by_cid = {int(r["__ffsk_cid"]): KLLSketch.from_bytes(bytes(r.sketch))
                 for r in rows}
    out: dict = {}
    for i, c in enumerate(cols):
        sk = sk_by_cid.get(i)
        bounds: List[float] = []
        if sk is not None:
            for j in range(1, R):
                q = float(sk.quantile(j / R))
                if np.isnan(q):
                    continue
                if not bounds or q > bounds[-1]:
                    bounds.append(q)
        out[c] = bounds
    return out


def zorder_key(bucket_cols: Sequence[Column], bits: int) -> Column:
    """Morton interleave of per-column bucket ids (each < 2**bits)
    into one long: bit i of column c lands at position i·C + c. Pure
    Catalyst arithmetic (shiftright / bitwiseAND / multiply-add), so
    the whole interleave runs inside WholeStageCodegen — no UDF, no
    Python. bits·C is capped at 48 so the z-value is exactly
    representable as a double (the KLL value type downstream)."""
    C = len(bucket_cols)
    if C < 1:
        raise ValueError("zorder_key needs at least one bucket column")
    if bits * C > 48:
        raise ValueError(
            f"bits*len(cols) = {bits * C} > 48: the z-value must stay "
            "double-exact for KLL range bounds — lower bits or cols")
    terms = []
    for ci, b in enumerate(bucket_cols):
        b = b.cast("long")
        for i in range(bits):
            terms.append(F.shiftright(b, i).bitwiseAND(F.lit(1))
                         * F.lit(1 << (i * C + ci)))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def zorder_write(df: DataFrame, cols: Sequence[str], path: str,
                 num_partitions: int, bits: int = 8, k: int = 200,
                 layout: Optional[dict] = None,
                 mode: str = "overwrite") -> dict:
    """Write ``df`` as a Z-order-clustered parquet layout on ``cols``:
    rows are ordered by the Morton interleave of per-column equi-depth
    bucket ids, so each file covers a small HYPER-RECTANGLE of the
    multi-column space — per-file min/max stays tight on EVERY
    clustering column, and a filter on any one of them prunes ~
    P^(1-1/C) of the files (a single-column sort only ever prunes on
    its one column). This is the multi-dimensional generalisation of
    :func:`sorted_write`, with the same no-sampling-job discipline:

    * pass 1 — per-column bounds, all columns in ONE scan
      (:func:`zorder_bounds`);
    * pass 2 — z-value range bounds (mergeable KLL, KB shuffle);
    * pass 3 — the carrier hash repartition + partition-local sort +
      write (ONE exchange; no RangePartitioning anywhere).

    Pass the returned ``layout`` dict to later writes of the same
    table family: both sketch passes are skipped (single-scan append)
    and the file ranges line up byte-stably across writes. NULLs
    bucket to 0 on their column (SQL NULLS FIRST per dimension)."""
    cols = list(cols)
    if layout is not None:
        cb, z_bounds, bits = (layout["bounds"], layout["z_bounds"],
                              layout["bits"])
        # ORDER-sensitive: the Morton interleave assigns bit positions
        # by column order, so a permuted list z-orders differently and
        # the reused z_bounds would silently mis-partition the append
        if list(cb) != cols:
            raise ValueError(
                f"layout was built for columns {list(cb)} (in that "
                f"order), not {cols}")
    else:
        zorder_key([F.lit(0)] * len(cols), bits)   # validate bits*C early
        cb = zorder_bounds(df, cols, bits=bits, k=k)
        z_bounds = None
    bucket_exprs = [range_bucket(_order_expr(df, c)[0], cb[c])
                    for c in cols]
    withz = df.withColumn(_Z, zorder_key(bucket_exprs, bits))
    if z_bounds is None:
        z_bounds = kll_partition_bounds(
            withz.select(F.col(_Z).cast("double").alias(_Z)), _Z,
            num_partitions, k=k)
    out = kll_range_repartition(withz, _Z, len(z_bounds) + 1,
                                bounds=list(z_bounds), sort_within=True)
    out.drop(_Z).write.mode(mode).parquet(path)
    return {"bounds": cb, "z_bounds": list(z_bounds), "bits": bits}


# ---------------------------------------------------------------------------
# Misra-Gries-driven skew join
# ---------------------------------------------------------------------------

def detect_hot_keys(df: DataFrame, on: str, threshold: float = 0.01,
                    k: Optional[int] = None) -> dict:
    """One MG pass over ``df[on]`` → the xxhash64 hashes of every join
    key whose frequency COULD exceed ``threshold`` of the rows (MG
    no-false-negative guarantee; k is auto-sized to ceil(2/threshold)
    so the bound threshold > 1/(k+1) always holds). Returns
    {"hashes": [int64...], "counts": [lower bounds...], "n_total": n}.
    Hashes, not raw keys: the hot test downstream is
    xxhash64(key) ∈ hashes, so no reverse lookup and any key type
    works."""
    from .sketch_agg import mg_agg
    from ..sketches import MisraGries
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    if k is None:
        k = int(np.ceil(2.0 / threshold))
    elif k + 1 <= 1.0 / threshold:
        raise ValueError(f"k={k} cannot guarantee detection at "
                         f"threshold={threshold}: need k > 1/threshold - 1")
    # NULL keys are excluded: xxhash64(NULL) is 42 (the seed), NOT NULL,
    # so a NULL-heavy column would otherwise promote hash-42 into the
    # hot set — and a NULL key never equi-joins anything, so salting it
    # is pure wasted dim replication. NULLs also must not burn an MG
    # counter slot that a real hot key needs.
    keyed = (df.where(F.col(on).isNotNull())
             .select(F.xxhash64(F.col(on)).alias(_KH)))
    row = mg_agg(keyed, [], _KH, k=k).collect()[0]
    mg = MisraGries.from_bytes(bytes(row.sketch))
    hh, counts = mg.heavy_hitters(threshold)
    return {"hashes": [int(h) for h in hh.view(np.int64)],
            "counts": [int(c) for c in counts],
            "n_total": int(mg.n_total)}


def auto_salted_join(fact: DataFrame, dim: DataFrame, on: str,
                     salt_n: int = 16, threshold: float = 0.01,
                     k: Optional[int] = None, how: str = "inner",
                     salt_by: Optional[List[str]] = None) -> DataFrame:
    """Skew-defusing equi-join that salts ONLY the detected hot keys
    (module docstring). Row-identical to ``fact.join(dim, on, how)``
    for how ∈ {inner, left, left_semi}; dim replication cost is
    |dim ⋉ hot| · salt_n instead of |dim| · salt_n."""
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"auto_salted_join does not support how={how!r}")
    if salt_by is None:
        salt_by = [c for c in fact.columns if c != on]
    if not salt_by:
        raise ValueError("need at least one non-key column to salt by")
    # xxhash64 is TYPE-sensitive where an equi-join is not: int vs
    # bigint key columns would implicit-cast in a plain join but hash
    # differently here, classifying every hot dim row as cold — the
    # hot fact slice then joins nothing and rows silently vanish.
    ft = dict(fact.dtypes).get(on)
    dt = dict(dim.dtypes).get(on)
    if ft != dt:
        raise ValueError(
            f"join key {on!r} has different types on the two sides "
            f"(fact {ft!r}, dim {dt!r}); hot-key hashes would not line "
            "up — cast both sides to one type first")
    hot = detect_hot_keys(fact, on, threshold=threshold, k=k)["hashes"]
    if not hot:
        return fact.join(dim, on, how)
    # NULL keys always take the cold path: xxhash64(NULL) is 42 (never
    # NULL), so without the isNotNull conjunct a NULL-heavy fact side
    # could match a hot hash and replicate dim NULLs salt_n times for
    # zero matches. The conjunction is non-NULL by construction
    # (x AND FALSE = FALSE), so ~is_hot stays TRUE for NULL keys and
    # how="left" keeps them via the cold branch.
    is_hot = (F.xxhash64(F.col(on)).isin(hot) & F.col(on).isNotNull())
    f_hot = (fact.where(is_hot)
             .withColumn(_SALT, F.pmod(F.xxhash64(*salt_by),
                                       F.lit(salt_n)).cast("int")))
    d_hot = (dim.where(is_hot)
             .withColumn(_SALT, F.explode(
                 F.array(*[F.lit(i) for i in range(salt_n)]))))
    hot_join = f_hot.join(d_hot, [on, _SALT], how).drop(_SALT)
    cold_join = fact.where(~is_hot).join(dim, on, how)
    return hot_join.unionByName(cold_join)
