"""Mergeable sketch aggregation over DataFrames — map-side combine.

PySpark has no Python UDAF with partial aggregation, so the scalable
two-phase shape is built explicitly:

  stage 1 (map side): ``mapInPandas`` — every Arrow batch is grouped in
      pandas and folded into one partial sketch blob per (batch, group).
      The shuffle then moves O(#batches × #groups) tiny blobs instead of
      all rows — the same partial-aggregate push-down Catalyst does for
      built-in aggregates.
  stage 2 (reduce side): ``groupBy(groups).applyInPandas`` — partials
      merge associatively into the final sketch + its estimate columns.

All sketches come from :mod:`fastfilter_spark.sketches` (from scratch);
Spark's built-in hll_sketch_agg / count_min_sketch / kll_sketch_agg /
approx_percentile serve only as test oracles.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.hashing import U64
from ..sketches import (
    CountMinSketch, HyperLogLog, KLLSketch, MisraGries, TDigest, ThetaSketch,
)
from .keys import pd_to_u64

def _group_schema(df: DataFrame, groups: Sequence[str]) -> str:
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    parts = [f"`{g}` {by_name[g]}" for g in groups]
    return ", ".join(parts)


def _two_phase(df: DataFrame, groups: Sequence[str], value_col: str,
               make_sketch: Callable[[], object],
               fold: Callable[[object, pd.Series], object],
               to_blob: Callable[[object], bytes],
               from_blob: Callable[[bytes], object],
               merge: Callable[[object, object], object],
               finalize_schema: str,
               finalize: Callable[[object], dict]) -> DataFrame:
    """Generic 2-phase sketch aggregation (see module docstring)."""
    gschema = _group_schema(df, groups) if groups else ""
    mid_schema = (gschema + ", " if gschema else "") + "partial binary"
    out_schema = (gschema + ", " if gschema else "") + finalize_schema
    groups = list(groups)
    sel = df.select(*groups, value_col) if groups else df.select(value_col)
    # Drop NULL values JVM-side, BEFORE Arrow transfer: a batch containing
    # any NULL delivers an int64 column to pandas as float64+NaN, and keys
    # >2^53 then round before the fold (same key hashes differently in
    # null-free vs null-containing batches). Filtering here keeps the
    # column exact int64; the per-sketch dropna() stays as belt-and-braces.
    sel = sel.where(F.col(value_col).isNotNull())

    def _map_partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if groups:
                for gvals, sub in pdf.groupby(groups, dropna=False, sort=False):
                    if not isinstance(gvals, tuple):
                        gvals = (gvals,)
                    sk = fold(make_sketch(), sub[value_col])
                    row = {g: [v] for g, v in zip(groups, gvals)}
                    row["partial"] = [to_blob(sk)]
                    yield pd.DataFrame(row)
            else:
                sk = fold(make_sketch(), pdf[value_col])
                yield pd.DataFrame({"partial": [to_blob(sk)]})

    partials = sel.mapInPandas(_map_partial, mid_schema)

    # A group whose values are ALL NULL must still emit a row (SQL
    # GROUP BY keeps it with e.g. COUNT(DISTINCT v) = 0; the JVM-side
    # null filter above would otherwise drop the whole group): seed one
    # EMPTY partial per group THAT HAS NULL ROWS — a group needs a seed
    # iff it has null values (non-null rows already produce partials),
    # so the distinct runs over the null-filtered slice (empty in the
    # common no-null case thanks to pushdown) instead of scanning the
    # whole input and shipping an empty blob per group. Merging an
    # empty sketch is the identity; the global variant seeds a single
    # empty partial so an empty/all-null input still yields the one row
    # SQL's global aggregate does.
    empty_blob = to_blob(make_sketch())
    if groups:
        seed = (df.where(F.col(value_col).isNull())
                .select(*groups).distinct()
                .withColumn("partial", F.lit(bytes(empty_blob))))
    else:
        seed = df.sparkSession.range(1).select(
            F.lit(bytes(empty_blob)).alias("partial"))
    partials = partials.unionByName(seed)

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = from_blob(pdf["partial"].iloc[0])
        for b in pdf["partial"].iloc[1:]:
            acc = merge(acc, from_blob(b))
        out = {g: [pdf[g].iloc[0]] for g in groups}
        for k, v in finalize(acc).items():
            out[k] = [v]
        return pd.DataFrame(out)

    if groups:
        return partials.groupBy(*groups).applyInPandas(_reduce, out_schema)
    # global aggregate: single group
    return (partials.withColumn("__g", F.lit(1)).groupBy("__g")
            .applyInPandas(lambda p: _reduce(p.drop(columns="__g")), out_schema))


# ---------------------------------------------------------------------------
# public aggregates
# ---------------------------------------------------------------------------

def hll_agg(df: DataFrame, groups: Sequence[str], key_col: str,
            p: int = 14) -> DataFrame:
    """Distinct-count sketch per group → columns (…groups, n_est double,
    sketch binary). ``key_col`` must be int64 (use keys.content_key or
    xxhash64 upstream for arbitrary columns)."""
    return _two_phase(
        df, groups, key_col,
        make_sketch=lambda: HyperLogLog(p),
        fold=lambda sk, s: sk.add(pd_to_u64(s.dropna())),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=HyperLogLog.from_bytes,
        merge=lambda a, b: a.merge(b),
        finalize_schema="n_est double, sketch binary",
        finalize=lambda sk: {"n_est": float(sk.estimate()),
                             "sketch": sk.to_bytes()},
    )


def cms_agg(df: DataFrame, groups: Sequence[str], key_col: str,
            eps: float = 1e-4, delta: float = 0.01) -> DataFrame:
    """Count-min sketch per group → (…groups, total long, sketch binary)."""
    return _two_phase(
        df, groups, key_col,
        make_sketch=lambda: CountMinSketch(eps, delta),
        fold=lambda sk, s: sk.add(pd_to_u64(s.dropna())),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=CountMinSketch.from_bytes,
        merge=lambda a, b: a.merge(b),
        finalize_schema="total long, sketch binary",
        finalize=lambda sk: {"total": int(sk.total), "sketch": sk.to_bytes()},
    )


def kll_agg(df: DataFrame, groups: Sequence[str], value_col: str,
            k: int = 200, quantiles: Optional[List[float]] = None) -> DataFrame:
    """KLL quantile sketch per group → (…groups, q_* double…, sketch)."""
    qs = quantiles or [0.5]
    qcols = ", ".join(f"q_{str(q).replace('.', '_')} double" for q in qs)

    def _fin(sk: KLLSketch) -> dict:
        out = {f"q_{str(q).replace('.', '_')}": float(sk.quantile(q)) for q in qs}
        out["sketch"] = sk.to_bytes()
        return out

    return _two_phase(
        df, groups, value_col,
        make_sketch=lambda: KLLSketch(k),
        fold=lambda sk, s: sk.add(s.to_numpy(dtype=np.float64, na_value=np.nan)),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=KLLSketch.from_bytes,
        merge=lambda a, b: a.merge(b),
        finalize_schema=qcols + ", sketch binary",
        finalize=_fin,
    )


def tdigest_agg(df: DataFrame, groups: Sequence[str], value_col: str,
                delta: float = 200.0,
                quantiles: Optional[List[float]] = None) -> DataFrame:
    """t-digest per group → (…groups, q_* double…, sketch binary)."""
    qs = quantiles or [0.5]
    qcols = ", ".join(f"q_{str(q).replace('.', '_')} double" for q in qs)

    def _fin(sk: TDigest) -> dict:
        out = {f"q_{str(q).replace('.', '_')}": float(sk.quantile(q)) for q in qs}
        out["sketch"] = sk.to_bytes()
        return out

    return _two_phase(
        df, groups, value_col,
        make_sketch=lambda: TDigest(delta),
        fold=lambda sk, s: sk.add(s.to_numpy(dtype=np.float64, na_value=np.nan)),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=TDigest.from_bytes,
        merge=lambda a, b: a.merge(b),
        finalize_schema=qcols + ", sketch binary",
        finalize=_fin,
    )


def theta_agg(df: DataFrame, groups: Sequence[str], key_col: str,
              k: int = 4096) -> DataFrame:
    """Theta/KMV distinct sketch per group → (…groups, n_est double,
    sketch binary). Unlike HLL the blobs support set algebra
    (union / intersect / a_not_b) — see sketches.theta."""
    return _two_phase(
        df, groups, key_col,
        make_sketch=lambda: ThetaSketch(k),
        fold=lambda sk, s: sk.add(pd_to_u64(s.dropna())),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=ThetaSketch.from_bytes,
        merge=lambda a, b: a.union(b),
        finalize_schema="n_est double, sketch binary",
        finalize=lambda sk: {"n_est": float(sk.estimate()),
                             "sketch": sk.to_bytes()},
    )


def mg_agg(df: DataFrame, groups: Sequence[str], key_col: str,
           k: int = 64) -> DataFrame:
    """Misra-Gries heavy-hitters summary per group → (…groups,
    n_total long, deficit long, sketch binary). Deterministic bound:
    for every key, mg.query(x) ≤ f(x) ≤ mg.query(x) + deficit, and any
    key with f(x) > n_total/(k+1) is guaranteed present."""
    return _two_phase(
        df, groups, key_col,
        make_sketch=lambda: MisraGries(k),
        fold=lambda sk, s: sk.add(pd_to_u64(s.dropna())),
        to_blob=lambda sk: sk.to_bytes(),
        from_blob=MisraGries.from_bytes,
        merge=lambda a, b: a.merge(b),
        finalize_schema="n_total long, deficit long, sketch binary",
        finalize=lambda sk: {"n_total": int(sk.n_total),
                             "deficit": int(sk.deficit),
                             "sketch": sk.to_bytes()},
    )


def cms_query(spark, sketch_blob: bytes, keys_df: DataFrame, key_col: str,
              out_col: str = "cms_est") -> DataFrame:
    """Point-query a CMS blob for every key in keys_df (broadcast blob)."""
    bc = spark.sparkContext.broadcast(sketch_blob)

    @F.pandas_udf("long")
    def _q(key: pd.Series) -> pd.Series:
        sk = CountMinSketch.from_bytes(bc.value)
        return pd.Series(sk.query(pd_to_u64(key)))

    # coalesce JVM-side so a NULL in the batch can't degrade the int64
    # column to float64 (keys >2^53 would lose bits); NULL keys get a
    # NULL estimate rather than key-0's count
    key_safe = F.coalesce(F.col(key_col), F.lit(0).cast("bigint"))
    return keys_df.withColumn(
        out_col,
        F.when(F.col(key_col).isNotNull(), _q(key_safe))
         .otherwise(F.lit(None).cast("long")))


def hll_sliding(df: DataFrame, bucket_col: str, key_col: str,
                window: int, p: int = 14) -> DataFrame:
    """Trailing-window distinct-count estimates from per-bucket HLL
    partials: for every observed integer bucket ``b``, the estimate
    over buckets ``b-window+1 .. b`` → (bucket_end BIGINT, n_est,
    sketch) — bucket_end is widened because ends reach past the input
    type's max.

    The 100 TB shape for "distinct users over the trailing W hours,
    per hour": every raw row is folded into its bucket's sketch ONCE
    (the :func:`hll_agg` two-phase path — the only data-sized shuffle);
    the window overlap is then resolved by exploding each bucket's
    ~2^p-byte blob to the ≤W window ends it contributes to and merging
    blobs per end. The alternative — aggregating raw rows per window —
    re-scans and re-shuffles the corpus W times. Register-max merging
    makes the result EXACTLY the sketch that a direct build over the
    window's raw rows would produce (HLL merge is lossless), so
    accuracy never degrades with W.

    Window ends are every bucket COVERED by some observed bucket's
    window — a quiet bucket with no rows of its own still gets its
    trailing-window estimate (join to your bucket spine if you want
    observed-only ends; an inner join drops the extras). This keeps the
    operator a single pass: deriving "observed" ends from the partials
    would plan the raw aggregation subtree twice (Spark re-executes
    shared unpersisted subtrees), doubling the only data-sized stage.
    NULL buckets are excluded from every window. The
    bucket column must be integral (floor-divide a timestamp upstream:
    ``F.col("ts").cast("long") / 3600`` → hour index). Expansion cost
    is #buckets × window × 2^p bytes of blob shuffle — for time buckets
    this is KBs·1e5 even at decade scale, independent of corpus size;
    lower ``p`` if window × bucket-count is extreme.
    """
    per = _bucket_blobs(hll_agg(df, [bucket_col], key_col, p=p),
                        df, bucket_col, window)
    return _sliding_merge(per, window, HyperLogLog.from_bytes,
                          lambda a, b: a.merge(b),
                          lambda sk: {"n_est": float(sk.estimate()),
                                      "sketch": sk.to_bytes()},
                          "n_est double, sketch binary")


def mg_sliding(df: DataFrame, bucket_col: str, key_col: str,
               window: int, k: int = 64) -> DataFrame:
    """Trailing-window heavy hitters (trending keys over the last W
    buckets): per-bucket Misra-Gries summaries merged across each
    window → (bucket_end BIGINT, n_total, deficit, sketch).

    Same single-pass shape as :func:`hll_sliding` (raw rows fold once,
    the overlap is resolved on k-entry blobs). MG merge keeps the
    deterministic two-sided bound per window: for every key,
    mg.query(x) ≤ f_window(x) ≤ mg.query(x) + deficit, and any key with
    f_window(x) > n_total/(k+1) is guaranteed present — so "top
    event_types of the trailing 24 h" comes with provable error bars,
    not sampling hope. ``n_total`` is the EXACT row count of the
    window (MG totals are exact under merge)."""
    per = _bucket_blobs(mg_agg(df, [bucket_col], key_col, k=k),
                        df, bucket_col, window)
    return _sliding_merge(per, window, MisraGries.from_bytes,
                          lambda a, b: a.merge(b),
                          lambda sk: {"n_total": int(sk.n_total),
                                      "deficit": int(sk.deficit),
                                      "sketch": sk.to_bytes()},
                          "n_total long, deficit long, sketch binary")


def _bucket_blobs(agg: DataFrame, df: DataFrame, bucket_col: str,
                  window: int) -> DataFrame:
    """(…agg over [bucket_col]) → (__b bigint, sketch) with the shared
    sliding-window validations."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    btype = dict((f.name, f.dataType.simpleString())
                 for f in df.schema.fields)[bucket_col]
    if btype not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"bucket column {bucket_col!r} must be integral, got {btype} "
            "(derive an index upstream, e.g. floor(epoch_seconds/3600))")
    # bucket_end is always BIGINT: ends reach b + window - 1, which can
    # overflow the input's narrower type (tinyint bucket 127, window 4
    # → end 130 — declaring the input type makes the Arrow cast throw)
    return agg.select(F.col(bucket_col).cast("bigint").alias("__b"),
                      "sketch")


def _sliding_merge(per: DataFrame, window: int, from_bytes, merge_fn,
                   finalize, out_cols: str) -> DataFrame:
    """Explode per-bucket blobs to their ≤window covered ends and merge
    per end — the shared tail of every *_sliding operator."""
    ends = per.select(
        F.explode(F.sequence(F.col("__b"),
                             F.col("__b") + F.lit(window - 1)))
        .alias("bucket_end"), "sketch")
    out_schema = "bucket_end bigint, " + out_cols

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = from_bytes(pdf["sketch"].iloc[0])
        for b in pdf["sketch"].iloc[1:]:
            acc = merge_fn(acc, from_bytes(b))
        row = {"bucket_end": [pdf["bucket_end"].iloc[0]]}
        for c, v in finalize(acc).items():
            row[c] = [v]
        return pd.DataFrame(row)

    return ends.groupBy("bucket_end").applyInPandas(_merge, out_schema)
