"""Key derivation and skew-defusing placement — all JVM-side Catalyst
expressions (no Python in the hot path).

The per-row invariant vs the reference corpus is sha256(content)
equality (BASELINE.json input_hint): the filter key is the first 8
bytes (big-endian) of sha256(content), reinterpreted as int64. The
derivation below stays entirely inside whole-stage codegen:
sha2 → hex substrings → conv → shift/or. The numpy side views the
signed int64 back as uint64 (two's-complement reinterpretation, exact).

Placement: partitions are assigned by pmod(xxhash64(key, salt), P) —
*never* by a natural column like repo (Zipf-skewed); xxhash64 of an
already-uniform key gives balanced partitions at any scale, and `salt`
lets two independent builds decorrelate their placement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def require_long_key(df: DataFrame, key_col: str, ctx: str) -> None:
    """Fail LOUD if the key column is not bigint. Two silent-corruption
    paths otherwise: (a) the packed build serializes the column's raw
    bytes, so an int32 key emits 4 bytes and the int64 frombuffer in
    build_from_chunks fuses key PAIRS into bogus values — the filter is
    built over garbage and every real member probes False (zero-FN
    violation); (b) JVM xxhash64 hashes int columns with hashInt while
    the numpy route replica always hashes 8-byte longs, so routing
    disagrees even at matching widths. Cast upstream: the caller chose
    the widening semantics, not the library."""
    t = dict(df.dtypes).get(key_col)
    if t != "bigint":
        raise TypeError(
            f"{ctx}: key column {key_col!r} must be bigint, got {t!r} — "
            f"cast it upstream (F.col({key_col!r}).cast('long')); "
            "narrower ints serialize at the wrong byte width and hash "
            "differently in JVM xxhash64 vs the numpy route replica")


def content_key(col: str | Column) -> Column:
    """uint64 (as int64) key = first 8 bytes of sha256(content), JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    hexd = F.sha2(c.cast("string"), 256)
    hi = F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def content_key_arrow(col: str | Column) -> Column:
    """Same key via an Arrow-batched pandas UDF (hashlib sha256).

    Why this exists: Spark's ``sha2``/``md5`` expressions fetch a JCA
    ``MessageDigest`` per row, and the provider lookup contends across
    threads sharing one JVM — measured in this sandbox, the identical
    8M-row sha2 job takes 2.1 s on local[8] but 6.2 s on local[32]
    (xxhash64, pure codegen, scales fine). Real clusters run many
    4–8-core executor JVMs, so the JVM path (`content_key`) stays the
    default there; on fat executors (≥16 cores/JVM) this Arrow path —
    hashlib in per-core Python worker *processes*, no shared lock —
    is the scalable variant. Byte-identical output (parity-tested).
    """
    c = F.col(col) if isinstance(col, str) else col

    @F.pandas_udf("long")
    def _sha_key(s: pd.Series) -> pd.Series:
        import hashlib
        sha = hashlib.sha256
        out = np.empty(len(s), dtype=np.uint64)
        null = s.isna().to_numpy()
        for i, v in enumerate(s):
            if not null[i]:
                out[i] = int.from_bytes(sha(str(v).encode()).digest()[:8],
                                        "big")
        res = pd.array(out.view(np.int64), dtype="Int64")
        res[null] = pd.NA          # JVM sha2(null) is null — keep parity
        return pd.Series(res)

    return _sha_key(c.cast("string"))


def route_expr(key_col: str | Column, salt: int = 0) -> Column:
    """The column the build repartitions on: xxhash64(key, salt)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.xxhash64(c, F.lit(salt))


ROUTING_XXHASH_PMOD = "xxhash_pmod"   # packed shuffle: pid = pmod(xxhash64(key,salt), P)
ROUTING_SPARK_HASH = "spark_hash"     # rows shuffle: pid = Spark HashPartitioning
                                      #   = pmod(hash(xxhash64(key,salt)), P)


def partition_id(key_col: str | Column, num_partitions: int, salt: int = 0,
                 routing: str = ROUTING_XXHASH_PMOD) -> Column:
    """Skew-proof partition assignment, pure-Catalyst (used for query
    routing and resume filtering; must mirror how the build placed keys).

    * ``xxhash_pmod``: pmod(xxhash64(key, salt), P) — the packed-shuffle
      build buckets with the same arithmetic in numpy (signed % has
      identical non-negative semantics).
    * ``spark_hash``: pmod(hash(xxhash64(key, salt)), P) — exactly where
      ``repartition(P, xxhash64(key, salt))`` places a row (Spark's
      HashPartitioning = pmod(Murmur3 ``hash``, P); verified on 100k keys).

    The salt decorrelates independent builds and defuses any
    key-distribution pathology.
    """
    r = route_expr(key_col, salt)
    if routing == ROUTING_SPARK_HASH:
        r = F.hash(r)
    elif routing != ROUTING_XXHASH_PMOD:
        raise ValueError(f"unknown routing {routing!r}")
    return F.pmod(r, F.lit(num_partitions)).cast("int")


def keys_from_content(df: DataFrame, content_col: str = "content",
                      key_name: str = "key", method: str = "jvm") -> DataFrame:
    """Project a corpus DataFrame down to its derived key column.

    ``method``: "jvm" (codegen sha2 — default, right for normal-width
    executors) or "arrow" (pandas-UDF hashlib — right for fat
    many-core JVMs; see `content_key_arrow`). Identical output.
    """
    expr = {"jvm": content_key, "arrow": content_key_arrow}[method]
    return df.select(expr(content_col).alias(key_name))


# single definition in workerside (the executor-side module) — a
# duplicate here once diverged on NULL handling
from ..workerside import pd_to_u64  # noqa: E402,F401


def u64_to_i64(a: np.ndarray) -> np.ndarray:
    """numpy uint64 → int64 bit reinterpretation (for Spark LongType)."""
    return a.astype(np.uint64, copy=False).view(np.int64)
