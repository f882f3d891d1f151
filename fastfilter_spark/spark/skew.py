"""Explicit skew handling for joins (north_rule: "partitioning /
shuffle / skew handled explicitly").

The build path already defuses skew by never partitioning on a natural
key (`keys.partition_id` routes on xxhash64(key, salt)). This module
covers the other skew surface: an equi-join whose key is Zipf-skewed
(e.g. joining a corpus on `repo` — one repo can hold a large share of
all rows, so one shuffle partition receives it all and the stage runs
at the speed of that straggler).

``salted_join`` splits every hot key across ``salt_n`` shuffle
partitions: the fact side gets a deterministic per-row salt in
[0, salt_n) derived from its *payload* columns (NOT the join key —
salting by the key would put all copies of the hot key back in one
partition), and the dim side is replicated once per salt value. The
join runs on (key, salt), so a key with M rows occupies min(M, salt_n)
partitions instead of 1. Cost: dim side × salt_n — use it fact⋈dim,
which is exactly where key skew lives.

Spark's AQE skew-join splitting (`spark.sql.adaptive.skewJoin`) is the
engine-native runtime analog (enabled in our session factory); this
operator is the *explicit, plannable* variant that also works when AQE
cannot help (e.g. the skewed side feeds a mapInArrow stage, or
thresholds aren't met but the straggler still dominates).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__ffsk_salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                salt_n: int = 16, how: str = "inner",
                salt_by: Optional[list[str]] = None) -> DataFrame:
    """Skew-defusing equi-join of a (possibly skewed) fact side with a
    small dim side. Result is identical to ``fact.join(dim, on, how)``
    for how ∈ {inner, left, left_semi}; the dim side is replicated
    ``salt_n`` times, so keep it the small side.

    ``salt_by``: columns whose per-row variation spreads a hot key
    (default: every fact column except the join key). Rows identical in
    all salt_by columns land in the same salt — interchangeable anyway.
    """
    if how not in ("inner", "left", "left_semi"):
        raise ValueError(f"salted_join does not support how={how!r}")
    if salt_n < 1:
        # salt_n=0 would explode ZERO dim copies: inner joins silently
        # return nothing and left joins all-NULL dim columns — diverging
        # from the documented plain-join identity instead of erroring
        raise ValueError(f"salt_n must be >= 1, got {salt_n}")
    if salt_by is None:
        salt_by = [c for c in fact.columns if c != on]
    if not salt_by:
        raise ValueError("need at least one non-key column to salt by")
    f = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*salt_by), F.lit(salt_n)).cast("int"))
    d = dim.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    out = f.join(d, [on, _SALT], how)
    return out.drop(_SALT)
