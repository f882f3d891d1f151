"""Sketch-driven partitioning (spark/partitioning.py): the KLL range
repartitioner and the MG-targeted salted join. Load-bearing claims:

* kll_range_repartition: rows preserved exactly, partitions are
  DISJOINT ASCENDING ranges (max of partition i < min of i+1), sizes
  balanced within the KLL rank-error bound, NULLs land in partition 0,
  and the plan contains NO RangePartitioning/Sample (the whole point —
  no sampling job).
* range_bucket: bit-exact vs np.searchsorted on the same bounds.
* auto_salted_join: result row-identical to the plain join for
  inner/left/left_semi incl. NULL keys; the Zipf-head key is detected;
  dim replication is hot-only.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import (
    auto_salted_join, detect_hot_keys, kll_partition_bounds,
    kll_range_repartition, range_bucket,
)


@pytest.fixture(scope="module")
def corpus(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    df.cache().count()
    return df


# ---------------------------------------------------------------------------
# range_bucket / bounds
# ---------------------------------------------------------------------------

def test_range_bucket_matches_searchsorted(spark):
    rng = np.random.default_rng(7)
    vals = np.round(rng.normal(0, 100, size=2000), 3)
    bounds = [-80.0, -10.0, 0.5, 55.0]
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = (df.withColumn("b", range_bucket("v", bounds))
           .toPandas().sort_values("v"))
    want = np.searchsorted(np.array(bounds), got["v"].to_numpy(),
                           side="right")
    assert (got["b"].to_numpy() == want).all()


def test_range_bucket_rejects_unsorted():
    with pytest.raises(ValueError):
        range_bucket("v", [1.0, 1.0, 2.0])
    with pytest.raises(ValueError):
        range_bucket("v", [2.0, 1.0])


def test_bounds_collapse_on_heavy_tie(spark):
    # one value holds 90% of rows -> neighbouring quantiles collapse;
    # bounds must stay strictly ascending and shorter than P-1
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(42.0))
        .otherwise(F.col("id").cast("double")).alias("v"))
    bounds = kll_partition_bounds(df, "v", 8)
    assert bounds == sorted(set(bounds))
    assert len(bounds) < 7


# ---------------------------------------------------------------------------
# kll_range_repartition
# ---------------------------------------------------------------------------

def test_range_repartition_disjoint_balanced(spark, corpus):
    df = corpus.select(F.length("content").cast("double").alias("v"))
    n = df.count()
    P = 8
    out = kll_range_repartition(df, "v", P, k=200)
    per = (out.withColumn("pid", F.spark_partition_id())
           .groupBy("pid").agg(F.count("*").alias("n"),
                               F.min("v").alias("lo"),
                               F.max("v").alias("hi"))
           .orderBy("pid").collect())
    assert sum(r.n for r in per) == n                     # nothing lost
    for a, b in zip(per, per[1:]):                        # disjoint ranges
        assert a.hi <= b.lo
    # balance: each partition within 1/P ± (2*rank_err + slack)
    err = 2 * 1.7 / np.sqrt(200) + 0.05
    for r in per:
        assert r.n / n <= 1 / len(per) + err


def test_range_repartition_rows_preserved_exactly(spark, corpus):
    df = corpus.select("repo", "path",
                       F.length("content").cast("double").alias("v"))
    out = kll_range_repartition(df, "v", 4)
    a = df.toPandas().sort_values(["repo", "path", "v"]).reset_index(drop=True)
    b = out.toPandas().sort_values(["repo", "path", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_range_repartition_nulls_first_and_sorted(spark):
    pdf = pd.DataFrame({"v": [None, 5.0, 1.0, None, 9.0, 3.0, 7.0, 2.0] * 50})
    df = spark.createDataFrame(pdf)
    out = kll_range_repartition(df, "v", 4, sort_within=True)
    per = (out.withColumn("pid", F.spark_partition_id())
           .groupBy("pid").agg(F.count("*").alias("n"),
                               F.sum(F.col("v").isNull().cast("int"))
                               .alias("nulls")).collect())
    by_pid = {r.pid: r for r in per}
    assert sum(r.nulls for r in per) == 100
    assert by_pid[0].nulls == 100                          # nulls -> bucket 0
    # sort_within: per-partition ascending
    parts = out.rdd.glom().collect()
    for p in parts:
        vs = [r.v for r in p if r.v is not None]
        assert vs == sorted(vs)


def test_range_repartition_no_sampling_in_plan(spark, corpus):
    df = corpus.select(F.length("content").cast("double").alias("v"))
    bounds = kll_partition_bounds(df, "v", 8)
    plan = (kll_range_repartition(df, "v", 8, bounds=bounds)
            ._jdf.queryExecution().executedPlan().toString())
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()


def test_bounds_reuse_identical_layout(spark, corpus):
    df = corpus.select(F.length("content").cast("double").alias("v"))
    bounds = kll_partition_bounds(df, "v", 8)
    a = kll_range_repartition(df, "v", 8, bounds=bounds)
    b = kll_range_repartition(df, "v", 8, bounds=bounds)
    pa = sorted(map(sorted, (([r.v for r in p]) for p in a.rdd.glom().collect())))
    pb = sorted(map(sorted, (([r.v for r in p]) for p in b.rdd.glom().collect())))
    assert pa == pb


def test_range_repartition_single_partition(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    out = kll_range_repartition(df, "v", 1)
    assert out.count() == 100
    assert out.rdd.getNumPartitions() == 1


# ---------------------------------------------------------------------------
# detect_hot_keys / auto_salted_join
# ---------------------------------------------------------------------------

def test_detect_hot_keys_finds_zipf_head(spark, corpus):
    # fixture guarantees the top repo holds >=20% of rows
    top = (corpus.groupBy("repo").count().orderBy(F.desc("count"))
           .first())
    n = corpus.count()
    assert top["count"] / n > 0.1
    hot = detect_hot_keys(corpus, "repo", threshold=0.1)
    top_hash = (corpus.where(F.col("repo") == top["repo"])
                .select(F.xxhash64("repo")).first()[0])
    assert top_hash in hot["hashes"]
    assert hot["n_total"] == n


def test_detect_hot_keys_guards():
    with pytest.raises(ValueError):
        detect_hot_keys(None, "x", threshold=0.0)
    with pytest.raises(ValueError):
        detect_hot_keys(None, "x", threshold=0.01, k=10)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi"])
def test_auto_salted_join_identical_to_plain(spark, corpus, how):
    fact = corpus.select("repo", "path")
    dim = (corpus.groupBy("repo").agg(F.count("*").alias("repo_files"))
           .where("repo_files >= 5"))
    plain = fact.join(dim, "repo", how).toPandas()
    salted = auto_salted_join(fact, dim, "repo", salt_n=8,
                              threshold=0.05, how=how).toPandas()
    cols = sorted(plain.columns)
    a = plain[cols].sort_values(cols).reset_index(drop=True)
    b = salted[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_auto_salted_join_null_keys_survive_left(spark):
    fact = spark.createDataFrame(
        pd.DataFrame({"k": ["a"] * 90 + ["b"] * 9 + [None],
                      "x": list(range(100))}))
    dim = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"],
                                              "y": [1, 2]}))
    out = auto_salted_join(fact, dim, "k", salt_n=4, threshold=0.2,
                           how="left").toPandas()
    assert len(out) == 100
    assert out[out["k"].isna()]["y"].isna().all()


def test_auto_salted_join_cold_only_falls_through(spark):
    # uniform keys, high threshold -> no hot keys -> plain join path
    fact = spark.range(1000).select(
        (F.col("id") % 100).cast("string").alias("k"), F.col("id").alias("x"))
    dim = spark.range(100).select(F.col("id").cast("string").alias("k"),
                                  (F.col("id") * 2).alias("y"))
    out = auto_salted_join(fact, dim, "k", threshold=0.5)
    assert out.count() == 1000


# ---------------------------------------------------------------------------
# review-fix regressions (r4): type guard, empty bounds, bounds overflow,
# carrier cache
# ---------------------------------------------------------------------------

def test_auto_salted_join_type_mismatch_raises(spark):
    """xxhash64 is type-sensitive where an equi-join is not: int vs
    bigint keys would silently classify every hot dim row as cold and
    drop the hot rows. Must refuse instead."""
    fact = spark.range(100).select(F.col("id").cast("int").alias("k"),
                                   F.lit(1).alias("x"))
    dim = spark.range(10).select(F.col("id").alias("k"),
                                 F.lit(2).alias("y"))
    with pytest.raises(ValueError, match="different types"):
        auto_salted_join(fact, dim, "k")


def test_kll_bounds_empty_and_all_null_inputs(spark):
    empty = spark.createDataFrame([], "v double")
    assert kll_partition_bounds(empty, "v", 8) == []
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    assert kll_partition_bounds(nulls, "v", 8) == []
    # and the repartitioner degrades to a single partition, not a crash
    out = kll_range_repartition(nulls, "v", 8)
    assert out.count() == 2


def test_kll_range_repartition_too_many_bounds_raises(spark):
    df = spark.range(10).select(F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError, match="bounds imply"):
        kll_range_repartition(df, "v", 2, bounds=[1.0, 2.0, 3.0])


def test_carriers_cached_per_process(spark):
    from fastfilter_spark.spark.partitioning import _CARRIER_CACHE, _carriers
    _CARRIER_CACHE.pop(5, None)
    a = _carriers(spark, 5)
    assert 5 in _CARRIER_CACHE
    assert _carriers(spark, 5) is a   # second call: no Spark job


# ---------------------------------------------------------------------------
# sorted_write: range-clustered layout without a sampling job
# ---------------------------------------------------------------------------

def test_sorted_write_layout(spark, corpus, tmp_path):
    from fastfilter_spark.spark import sorted_write
    src = corpus.select(F.length("content").cast("double").alias("v"),
                        "path")
    p = str(tmp_path / "sorted")
    bounds = sorted_write(src, "v", p, num_partitions=8)
    assert bounds == sorted(bounds)
    back = spark.read.parquet(p)
    assert back.count() == src.count()
    # per-file ranges disjoint ascending, rows sorted within each file
    pdf = (back.select(F.input_file_name().alias("f"), "v")
           .toPandas())
    stats = (pdf.groupby("f")["v"].agg(["min", "max"])
             .sort_values("min"))
    for (_, a), (_, b) in zip(stats.iterrows(), stats.iloc[1:].iterrows()):
        assert a["max"] <= b["min"]
    for _, grp in pdf.groupby("f"):
        assert grp["v"].is_monotonic_increasing or \
            grp["v"].reset_index(drop=True).equals(
                grp["v"].sort_values().reset_index(drop=True))


def test_sorted_write_bounds_reuse_stable(spark, tmp_path):
    from fastfilter_spark.spark import sorted_write
    df = spark.range(10_000).select(
        (F.col("id") % 997).cast("double").alias("v"))
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    bounds = sorted_write(df, "v", a, num_partitions=4)
    bounds2 = sorted_write(df, "v", b, num_partitions=4, bounds=bounds)
    assert bounds2 == bounds
    fa = sorted(spark.read.parquet(a).select(
        F.input_file_name()).distinct().count()
        for _ in (0,))[0]
    fb = spark.read.parquet(b).select(
        F.input_file_name()).distinct().count()
    assert fa == fb == 4


def test_sorted_write_string_column(spark, corpus, tmp_path):
    """String ranges: per-file min/max disjoint ascending in FULL
    string order (ties co-locate on the 48-bit prefix key), sorted
    within each file."""
    from fastfilter_spark.spark import sorted_write
    src = corpus.select("path", "repo")
    p = str(tmp_path / "sorted_str")
    bounds = sorted_write(src, "path", p, num_partitions=8)
    assert len(bounds) >= 3
    back = spark.read.parquet(p)
    assert back.count() == src.count()
    pdf = back.select(F.input_file_name().alias("f"), "path").toPandas()
    stats = (pdf.groupby("f")["path"].agg(["min", "max"])
             .sort_values("min"))
    prev_max = None
    for _, row in stats.iterrows():
        if prev_max is not None:
            assert prev_max <= row["min"]
        prev_max = row["max"]
    for _, grp in pdf.groupby("f"):
        assert grp["path"].is_monotonic_increasing


def test_string_prefix_key_order_preserving(spark):
    from fastfilter_spark.spark import string_prefix_key
    vals = ["", "a", "aa", "ab", "abcdefgh", "abcdefzz", "b",
            "zzzzzzz", "éclair", "中文"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    rows = df.select("s", string_prefix_key("s").alias("k")).collect()
    by_string = sorted(rows, key=lambda r: r.s.encode("utf-8"))
    keys_in_string_order = [r.k for r in by_string]
    assert keys_in_string_order == sorted(keys_in_string_order)
    assert all(0 <= r.k < 2 ** 48 for r in rows)


def test_null_heavy_fact_never_hot(spark):
    """xxhash64(NULL) is 42, not NULL: a NULL-majority fact column must
    NOT promote the NULL 'key' into the hot set (a NULL key never
    equi-joins, so salting it is pure wasted dim replication), and the
    join stays row-identical to the plain join."""
    from fastfilter_spark.spark import auto_salted_join, detect_hot_keys
    fact = spark.createDataFrame(
        pd.DataFrame({"k": [None] * 80 + ["a"] * 15 + ["b"] * 5,
                      "x": list(range(100))}))
    hot = detect_hot_keys(fact, "k", threshold=0.1)
    # hash-42 (the NULL seed hash) absent; 'a' present (15% > 10%)
    assert 42 not in hot["hashes"]
    assert hot["n_total"] == 20          # NULLs excluded from the total
    dim = spark.createDataFrame(pd.DataFrame({"k": ["a", "b"],
                                              "y": [1, 2]}))
    got = (auto_salted_join(fact, dim, "k", salt_n=4, threshold=0.1,
                            how="left").toPandas()
           .sort_values(["x"]).reset_index(drop=True))
    want = (fact.join(dim, "k", "left").toPandas()
            .sort_values(["x"]).reset_index(drop=True))
    assert (got["x"] == want["x"]).all()
    assert got["y"].fillna(-1).tolist() == want["y"].fillna(-1).tolist()


def test_asof_join_ignores_null_right_rows(spark):
    """A right row with NULL ts sorts FIRST in the ascending window and
    would match every left row as its 'preceding' value; NULL-key right
    rows would attach to NULL-key left rows. Both are non-matches under
    pandas merge_asof / DuckDB ASOF semantics."""
    from fastfilter_spark.spark import asof_join

    left = spark.createDataFrame([(1, 5.0), (1, 20.0)], "u long, ts double")
    right = spark.createDataFrame(
        [(1, None, 111), (1, 10.0, 222), (None, 1.0, 333)],
        "u long, ts double, payload long")
    out = {r.ts: (r.payload_asof, r.ts_asof)
           for r in asof_join(left, right, "u", "ts").collect()}
    assert out[5.0] == (None, None)          # nothing precedes ts=5
    assert out[20.0] == (222, 10.0)          # real row, not the NULL one


def test_salted_join_rejects_zero_salt(spark):
    from fastfilter_spark.spark import salted_join
    fact = spark.createDataFrame([("a", 1)], "k string, x long")
    dim = spark.createDataFrame([("a", 2)], "k string, y long")
    with pytest.raises(ValueError, match="salt_n"):
        salted_join(fact, dim, "k", salt_n=0)
