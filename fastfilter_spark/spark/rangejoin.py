"""Point-in-interval (range) join — bucket-explode composition.

Spark plans a plain inequality join (`p.k = i.k AND i.lo <= p.ts <= i.hi`)
as BroadcastNestedLoopJoin or a cartesian per key group — O(|points| ×
|intervals|) per key, unusable when both sides are large. The standard
scalable rewrite buckets time:

1. each point lands in exactly ONE bucket: ``floor(ts / W)``;
2. each interval is exploded to EVERY bucket it overlaps
   (``sequence(floor(lo/W), floor(hi/W))`` — JVM-side, no Python);
3. equi-join on (key, bucket) — a normal shuffled hash join;
4. filter ``lo <= ts <= hi``.

A (point, interval) pair can only meet in the point's single bucket, so
no dedup is needed; a point overlapping k intervals yields k rows, same
as the logical inequality join. Cost: the interval side grows by
~len/W rows — pick ``bucket_width`` near the typical interval length so
the blow-up is a small constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BKT = "__ffsk_bucket"
_R = "__r_"   # interval-side rename prefix: makes self-joins (both sides
              # derived from the same scan) unambiguous to the analyzer


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  ts: str, lo: str, hi: str,
                  bucket_width: float, how: str = "inner") -> DataFrame:
    """Join each point row to every interval row of the same ``on`` key
    with ``lo <= ts <= hi``. ``ts``/``lo``/``hi`` must be numeric
    columns (cast timestamps to epoch seconds first). ``how`` ∈
    {inner, left_semi}. Interval payload columns come back with their
    own names (they must not collide with point columns).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"interval_join does not support how={how!r}")
    w = F.lit(float(bucket_width))
    p = points.withColumn(_BKT, F.floor(F.col(ts) / w))
    i = intervals.select(
        *[F.col(c).alias(_R + c) for c in intervals.columns])
    i = i.withColumn(
        _BKT, F.explode(F.sequence(F.floor(F.col(_R + lo) / w),
                                   F.floor(F.col(_R + hi) / w))))
    cond = ((p[on] == i[_R + on]) & (p[_BKT] == i[_BKT])
            & (i[_R + lo] <= p[ts]) & (p[ts] <= i[_R + hi]))
    if how == "left_semi":
        return p.join(i, cond, "left_semi").drop(_BKT)
    out = p.join(i, cond, "inner").drop(_BKT, i[_BKT], _R + on)
    for c in intervals.columns:
        if c != on:
            out = out.withColumnRenamed(_R + c, c)
    return out
