"""As-of (time-travel) join — a composition of built-in DataFrame ops.

Spark has no ASOF JOIN operator (DuckDB/Pandas/kdb do); the classic
range-join rewrite (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` + window
to keep the max) explodes to O(|l|·|r|) per key before pruning. This
implementation is the scalable union trick, entirely inside Catalyst
(SURVEY.md brief: custom operators as compositions of existing
DataFrame ops where semantics allow):

1. union left and right rows on (key, ts), right rows tagged;
2. one window per key ordered by (ts, tag) carries the *latest
   preceding* right payload forward via last(..., ignorenulls=True);
3. keep left rows.

The payload travels as ONE struct column (never per-column fills):
a right row whose payload column is NULL must still win the as-of
match and attach that NULL — filling each column independently would
mix fields from different right rows.

Cost: one shuffle on the key (same as any join) + one in-partition
sort — no row explosion, no Python. Ties (r.ts == l.ts) match, like
DuckDB's ``ASOF LEFT JOIN ... ON l.ts >= r.ts``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TAG = "__ffsk_is_left"
_PAY = "__ffsk_payload"


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: Optional[list[str]] = None,
              tolerance: Optional[float] = None,
              suffix: str = "_asof") -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts`` <= left's ``ts`` within the same ``on`` group (backward
    as-of, left-outer: unmatched left rows keep nulls).

    ``right_cols``: right payload columns to attach (default: all
    except ``on``/``ts``), each renamed with ``suffix``. The right
    row's timestamp is always attached as ``ts + suffix``.
    ``tolerance``: if set, matches older than ``tolerance`` (in the
    ts column's own units — use seconds for timestamps cast to long)
    are nulled out, like pandas ``merge_asof(tolerance=...)``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, ts)]
    payload = [c + suffix for c in right_cols] + [ts + suffix]
    left_only = [c for c in left.columns if c not in (on, ts)]

    # NULL-ts right rows sort FIRST in the ascending window (Spark NULLS
    # FIRST), so unfiltered they'd become a universal "preceding" match
    # — and tolerance can't repair it (ts - NULL is NULL). NULL-key
    # right rows would likewise attach to NULL-key left rows, where
    # join semantics say NULL never equals NULL. Both are non-matches
    # under pandas merge_asof / DuckDB ASOF, the cited references.
    right = right.where(F.col(ts).isNotNull() & F.col(on).isNotNull())

    # All right payload fields travel together in one struct: the struct
    # itself is non-null for every right row, so last(ignorenulls=True)
    # picks the nearest preceding right ROW even when some of its payload
    # fields are NULL (per-column fills would splice older rows in).
    pay_type = T.StructType(
        [T.StructField(c + suffix, right.schema[c].dataType)
         for c in right_cols]
        + [T.StructField(ts + suffix, right.schema[ts].dataType)])
    l = left.select(
        on, ts, F.lit(True).alias(_TAG), *left_only,
        F.lit(None).cast(pay_type).alias(_PAY))
    r = right.select(
        on, ts, F.lit(False).alias(_TAG),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_only],
        F.struct(
            *[F.col(c).alias(c + suffix) for c in right_cols],
            F.col(ts).alias(ts + suffix)).cast(pay_type).alias(_PAY))

    # right rows sort BEFORE left rows at equal ts (False < True), so a
    # tie matches; the window is cumulative within the key.
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col(_TAG).asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = l.unionByName(r).select(
        on, ts, _TAG, *left_only,
        F.last(_PAY, ignorenulls=True).over(w).alias(_PAY))
    out = (filled.where(F.col(_TAG))
           .select(on, ts, *left_only,
                   *[F.col(f"{_PAY}.{c}").alias(c) for c in payload]))

    if tolerance is not None:
        stale = F.col(ts) - F.col(ts + suffix) > F.lit(tolerance)
        out = out.select(
            on, ts, *left_only,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in payload])
    return out
