"""Deterministic hash-based sampling — the reproducible-at-scale
alternative to ``DataFrame.sample``.

``df.sample(fraction, seed)`` draws per-partition from a seeded RNG
keyed by partition index: the SAME rows sample differently after a
repartition, an AQE coalesce, or a cluster resize — which silently
breaks train/eval splits and incremental pipelines. Hash sampling
decides per ROW from a stable key column::

    keep  ⇔  xxhash64(key, salt) mod DENOM < fraction · DENOM

so membership is a pure function of (key, salt, fraction): independent
of partitioning, executor count, and run order; re-running yields the
identical sample; and samples are NESTED (fraction 0.1 ⊆ fraction 0.2
at the same salt — grow a training subset without resampling). All
JVM-side Catalyst expressions — no Python, no shuffle, pushdown-safe.

Disjoint deterministic splits (train/val/test) come from
``hash_split``: bucket = pmod(xxhash64(key, salt), Σweights) binned by
cumulative weights.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# denominator for the fraction threshold: big enough that fraction
# resolution (1e-6) dwarfs rounding, small enough that the threshold
# comparison stays in exact int64 arithmetic
_DENOM = 1_000_000


def hash_sample_pred(key_col, fraction: float, salt: int = 0) -> Column:
    """Boolean Column: row is in the deterministic ``fraction`` sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    bucket = F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(_DENOM))
    return bucket < F.lit(int(round(fraction * _DENOM)))


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: int = 0) -> DataFrame:
    """Keep a deterministic, partitioning-independent ``fraction`` of
    rows by key hash. Nested: the fraction-f sample is a subset of any
    larger-fraction sample at the same salt."""
    return df.where(hash_sample_pred(key_col, fraction, salt))


def hash_split(df: DataFrame, key_col: str, weights: Sequence[float],
               salt: int = 0) -> list[DataFrame]:
    """Disjoint, exhaustive, deterministic splits (e.g. train/val/test
    at (0.8, 0.1, 0.1)). Every row lands in exactly one split, decided
    by key hash — stable across partitioning, runs and cluster sizes.
    Rows with equal keys land in the same split (leak-safe: duplicate
    contents cannot straddle train and test)."""
    if not weights or any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative and non-empty")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to > 0")
    c = F.col(key_col)
    bucket = F.pmod(F.xxhash64(c, F.lit(salt)), F.lit(_DENOM))
    cuts = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cuts.append(int(round(acc * _DENOM)))
    cuts[-1] = _DENOM  # exhaustive despite float rounding
    out = []
    lo = 0
    for hi in cuts:
        out.append(df.where((bucket >= F.lit(lo)) & (bucket < F.lit(hi))))
        lo = hi
    return out


def sample_priority(id_col, seed: int = 0, weight_col=None) -> Column:
    """Deterministic per-row sampling priority (smaller = selected
    first): u from the first 52 bits (13 hex chars) of
    sha256(str(id) || '#' || seed) scaled to [0, 1).

    52 bits keep every arithmetic step exactly float64-representable
    (conv → decimal string → double is exact below 2^53, and /2^52 is
    a power-of-two scale), so ANY engine with sha256(VARCHAR) — e.g.
    the DuckDB oracle — reproduces the priorities bit-for-bit; cross-
    engine order comparisons can never flip on a ulp.

    ``weight_col`` gives an Efraimidis–Spirakis weighted priority
    -ln(u)/w (P(key_i < key_j) = w_i/(w_i+w_j)): principled weighted
    sampling without replacement, but ln() is libm-dependent — use it
    in single-engine pipelines, not where bit-exact cross-engine
    parity is required.
    """
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.sha2(F.concat(c.cast("string"), F.lit(f"#{seed}")), 256)
    v = F.conv(F.substring(hx, 1, 13), 16, 10).cast("double")
    u = v / F.lit(float(1 << 52))
    if weight_col is None:
        return u
    w = (F.col(weight_col) if isinstance(weight_col, str)
         else weight_col).cast("double")
    # NULL / non-positive weights mean "never sample this row": their
    # priority is +inf so they sort LAST. Without this, a NULL weight
    # (e.g. after a left join) gives a NULL priority — and Spark's ASC
    # NULLS FIRST would return exactly the garbage-weight rows as the
    # sample; a negative weight would flip the E-S key's sign likewise.
    return F.when(w.isNotNull() & (w > 0), -F.log(u) / w) \
            .otherwise(F.lit(float("inf")))


def deterministic_sample(df: DataFrame, k: int, id_col: str,
                         seed: int = 0, weight_col=None) -> DataFrame:
    """Exactly-k deterministic sample without replacement: order by
    :func:`sample_priority` (ties broken by id) and take k. Plans as
    TakeOrderedAndProject — per-partition top-k then a driver merge of
    P·k candidate rows, never a full sort shuffle — so it holds at any
    input scale for the small k a sample implies. Re-running, and
    re-running after ANY repartition, yields the identical sample
    (contrast ``DataFrame.sample``'s partition-seeded RNG)."""
    pri = sample_priority(id_col, seed, weight_col).alias("__pri")
    return (df.select("*", pri)
            .orderBy(F.col("__pri"), F.col(id_col))
            .limit(k)
            .drop("__pri"))


def stratified_sample(df: DataFrame, k_per_group: int, group_col: str,
                      id_col: str, seed: int = 0,
                      weight_col=None) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank rows within each
    group by :func:`sample_priority` (ties by id) and keep the top k.
    One shuffle keyed on the group column; same partitioning-independent
    reproducibility as :func:`deterministic_sample`, with the same
    cross-engine-exact priorities when ``weight_col`` is None."""
    from pyspark.sql import Window
    pri = sample_priority(id_col, seed, weight_col)
    w = Window.partitionBy(group_col).orderBy(pri, F.col(id_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k_per_group).drop("__rn"))


def pack_into_shards(df: DataFrame, size_col: str, budget: int,
                     group_col: str, id_col: str, seed: int = 0) -> DataFrame:
    """Greedy sequence packing for training-data prep: within each
    group, order rows deterministically (:func:`sample_priority`, ties
    by id) and assign shard ids so consecutive rows accumulate until the
    size budget is crossed — ``shard = floor((cumsum - size) / budget)``,
    i.e. a row starts a new shard when the RUNNING TOTAL before it has
    passed a budget boundary.

    The running sum is a window over (group, deterministic order): the
    shuffle keys on ``group_col``, so scale requires bounded groups —
    pack per (lang, hash-bucket) or per date partition, never globally
    (a global window is a single-task sort). Oversized single rows
    occupy their own shard(s) rather than erroring — filter by
    ``size_col > budget`` first if that matters.
    """
    from pyspark.sql import Window
    pri = sample_priority(id_col, seed)
    w = (Window.partitionBy(group_col).orderBy(pri, F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(size_col)).over(w)
    return df.withColumn(
        "shard",
        F.floor((cum - F.col(size_col)) / F.lit(float(budget)))
        .cast("long"))


def epoch_shuffle(df: DataFrame, id_col: str, num_shards: int,
                  seed: int = 0) -> DataFrame:
    """Deterministic global training-order shuffle (one epoch's
    permutation): every row gets a ``shard`` and a ``pos`` within it,
    and reading shards 0..num_shards-1 each in ``pos`` order visits the
    corpus in a pseudorandom order that is a pure function of
    (id, seed) — independent of partitioning, executor count, and run
    order. A new ``seed`` (e.g. the epoch number) yields an independent
    permutation, so per-epoch reshuffles never rewrite upstream data.

    Both decisions derive from DISJOINT bit ranges of one
    sha256(str(id) || '#' || seed): bits 1-52 (hex chars 1-13) give the
    within-shard order (the same 52-bit float64-exact priority as
    :func:`sample_priority`), hex chars 14-26 give the shard — so shard
    placement and within-shard order are independent, and any engine
    with sha256(VARCHAR) reproduces the full permutation bit-for-bit
    (the driver oracle does).

    Scale shape: ONE exchange keyed on ``shard`` (the row_number
    window); each shard sorts in its own task, so pick ``num_shards``
    ≈ corpus_bytes / target_shard_bytes to bound task memory — shard
    sizes concentrate tightly (binomial) because the shard hash is
    uniform. No global sort, no RangePartitioning sampling job. NULL
    ids get NULL shard/priority (filter or coalesce upstream).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    c = F.col(id_col)
    # within-shard order IS sample_priority's 52-bit contract (shared
    # helper, not a re-derivation — Catalyst CSE dedupes the sha2);
    # the shard takes the NEXT 52 bits of the same digest
    hx = F.sha2(F.concat(c.cast("string"), F.lit(f"#{seed}")), 256)
    pri = sample_priority(id_col, seed)
    shard = F.pmod(F.conv(F.substring(hx, 14, 13), 16, 10).cast("long"),
                   F.lit(num_shards))
    from pyspark.sql import Window
    w = Window.partitionBy("shard").orderBy(F.col("__pri"), c)
    return (df.withColumn("shard", shard)
            .withColumn("__pri", pri)
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("__pri"))


def upsample(df: DataFrame, factor, id_col: str, seed: int = 0,
             copy_col: str = "copy") -> DataFrame:
    """Deterministic resampling WITH replacement: every row is emitted
    ``floor(factor)`` times plus one more with probability
    ``frac(factor)`` — so the expected copy count is exactly ``factor``
    per row, factors > 1 upsample (temperature-weighted domain mixing:
    rare domains get factor > 1, dominant ones < 1), factors in (0, 1)
    downsample, and the whole decision is a pure function of
    (id, seed): stable across partitioning, executor count and reruns,
    with a new independent draw per seed (epoch).

    ``factor`` is a Column (or column name) of per-row expected counts;
    NULL or non-positive factors emit zero copies, and so do NULL ids
    (no id → no deterministic coin; a silent floor(factor) fallback
    would mis-weight NULL-id corpora, so they drop loudly-by-contract
    instead — coalesce a surrogate id upstream). Output rows carry
    ``copy_col`` = 0..reps-1 so downstream keys stay unique via
    (id, copy). The fractional coin is the 52-bit sha256 priority of
    :func:`sample_priority` — float64-exact, so any engine reproduces
    the exact copy counts (the DuckDB oracle does; keep the factor
    expression to IEEE-exact ops — +,-,*,/,sqrt — for cross-engine
    bit-parity; pow/exp are libm-dependent).

    Scale shape: pure narrow Catalyst — floor + one explode(sequence),
    ZERO exchanges and no UDF; output partitioning inherits the input
    (follow with :func:`epoch_shuffle` to re-mix if factors correlate
    with layout). Per-row memory is the copy array: bound factors
    (cap at e.g. 1e4) upstream — one row exploding to millions means
    the mixture math is wrong, not that the engine should absorb it.
    """
    fac = (F.col(factor) if isinstance(factor, str) else factor) \
        .cast("double")
    u = sample_priority(id_col, seed)
    base = F.floor(fac).cast("long")
    reps = F.when(fac.isNotNull() & (fac > 0)
                  & F.col(id_col).isNotNull(),
                  base + F.when(u < fac - base.cast("double"), 1)
                  .otherwise(0)).otherwise(F.lit(0))
    # sequence(0, -1) would DESCEND (Spark auto-negates the step), so
    # rows with reps == 0 must drop before the sequence is built.
    # Bounds stay BIGINT: casting (__reps - 1) to int would silently
    # wrap a factor ≥ 2^31 and the wrapped negative bound would
    # auto-descend into bogus negative copy ids — instead an in-plan
    # assert_true fails loudly above Spark's own array-length ceiling
    # (per-row copy arrays that size mean the mixture math is wrong).
    cap = (1 << 31) - 16
    guarded = F.when(
        F.assert_true(
            F.col("__reps") <= F.lit(cap),
            F.lit(f"upsample: a row's copy count exceeds {cap} — "
                  "cap factors upstream; the mixture weights are "
                  "wrong, the engine cannot absorb this")).isNull(),
        F.col("__reps") - 1)
    return (df.withColumn("__reps", reps)
            .where(F.col("__reps") > 0)
            .withColumn(copy_col,
                        F.explode(F.sequence(F.lit(0).cast("long"),
                                             guarded)))
            .drop("__reps"))


def mixture_sample(df: DataFrame, group_col: str, fractions: dict,
                   id_col: str, seed: int = 0,
                   default_fraction: float = 0.0) -> DataFrame:
    """Domain-mixture sampling: keep each group at its own fraction
    (upweight curated domains, downweight crawl) — row kept ⇔
    priority(id) < fraction[group]. Priorities are the 52-bit
    sha256-derived uniforms of :func:`sample_priority`, so the decision
    is a pure per-row function of (id, seed, group fraction):
    partitioning-independent, reproducible, NESTED across fractions
    (raising a group's fraction only ADDS rows — mixtures can be grown
    without resampling), and bit-exactly recomputable by any engine
    with sha256. Pure Catalyst: one broadcast join against the tiny
    fractions table, no shuffle of ``df``.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0,1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], "
                         f"got {default_fraction}")
    spark = df.sparkSession
    # the fractions table uses df's OWN group dtype: a hardcoded string
    # key against e.g. an int domain-id column would equi-join through
    # implicit casts (precision loss past 2^53, or ANSI mismatches) and
    # silently drop groups to the default fraction
    gtype = df.schema[group_col].dataType.simpleString()
    frac_df = spark.createDataFrame(
        [(g, float(f)) for g, f in fractions.items()],
        f"`{group_col}` {gtype}, __frac double")
    pri = sample_priority(id_col, seed)
    return (df.join(F.broadcast(frac_df), group_col, "left")
            .withColumn("__frac",
                        F.coalesce("__frac", F.lit(float(default_fraction))))
            .where(pri < F.col("__frac"))
            .drop("__frac"))
