"""ffsk_membership Python DataSource + numpy route replica tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.core.hashing import route_pid, spark_route
from fastfilter_spark.spark import (
    build_partitioned_filter, content_key, get_spark,
)
from fastfilter_spark.spark.io import write_filter_sidecar
from fastfilter_spark.spark.keys import partition_id, route_expr
from fastfilter_spark.sources import register_sources


@pytest.fixture(scope="module")
def source_env(spark, tmp_path_factory):
    register_sources(spark)
    tmp = tmp_path_factory.mktemp("ffsk_src")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
                .withColumn("key", content_key("text"))
    en = docs.where("lang = 'en'").select("key")
    pf = build_partitioned_filter(en, kind="bf16", num_partitions=8)
    write_filter_sidecar(pf, str(tmp / "sidecar"))
    docs.write.parquet(str(tmp / "probe"))
    return docs, en, pf, tmp


def _read(spark, tmp, mode):
    return (spark.read.format("ffsk_membership")
            .option("path", str(tmp / "probe"))
            .option("sidecar", str(tmp / "sidecar"))
            .option("key_col", "key").option("mode", mode).load())


def test_route_replica_bit_exact(spark):
    rng = np.random.default_rng(11)
    keys = rng.integers(-2**63, 2**63, size=2000, dtype=np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "key long")
    for salt in (0, 42, -7, 2**40):
        jvm = np.array([r[0] for r in df.select(route_expr("key", salt))
                        .collect()], dtype=np.int64)
        mine = spark_route(keys.view(np.uint64), salt).view(np.int64)
        assert (jvm == mine).all(), salt
        jpid = np.array([r[0] for r in
                         df.select(partition_id("key", 16, salt)).collect()],
                        dtype=np.int32)
        assert (jpid == route_pid(keys.view(np.uint64), salt, 16)).all()


def test_source_semi_anti_partition_exactness(spark, source_env):
    docs, en, pf, tmp = source_env
    semi = _read(spark, tmp, "semi")
    anti = _read(spark, tmp, "anti")
    n_semi, n_anti, n_all = semi.count(), anti.count(), docs.count()
    # anti is exact (zero FN); semi = exact members + FPs
    exact = docs.join(en.distinct(), "key", "left_semi").count()
    assert n_semi + n_anti == n_all
    assert exact <= n_semi <= exact + max(5, int(n_all * 1e-3))
    # zero FN: every true member row comes through the semi scan
    members = docs.join(en.distinct(), "key", "left_semi") \
                  .select("doc_id")
    missed = members.join(semi.select("doc_id"), "doc_id", "left_anti")
    assert missed.count() == 0


def test_source_pushdown_and_residual_filters(spark, source_env):
    docs, en, pf, tmp = source_env
    semi = _read(spark, tmp, "semi")
    exact_en = docs.join(en.distinct(), "key", "left_semi") \
                   .where("lang = 'en' AND n_chars > 100")
    got = semi.where((F.col("lang") == "en") & (F.col("n_chars") > 100))
    # pushed (EqualTo, GreaterThan) and any residuals must agree with
    # the plain-DataFrame answer on true members
    assert got.join(exact_en.select("doc_id"), "doc_id", "left_anti") \
              .join(en.distinct(), "key", "left_semi").count() == 0
    assert exact_en.join(got.select("doc_id"), "doc_id", "left_anti") \
                   .count() == 0
    # an unsupported predicate (contains) still yields correct results
    sub = semi.where(F.col("text").contains("the"))
    base = docs.where(F.col("text").contains("the")) \
               .join(en.distinct(), "key", "left_semi")
    assert base.join(sub.select("doc_id"), "doc_id", "left_anti").count() == 0


def test_contains_local_routed_parity(spark, source_env):
    docs, en, pf, tmp = source_env
    pdf = docs.select("key").toPandas()
    keys = pdf["key"].to_numpy(np.int64).view(np.uint64)
    local = pf.contains_local(keys)
    via_spark = pf.with_contains(docs.select("key"), "key") \
                  .toPandas()["contained"].to_numpy(bool)
    assert (local == via_spark).all()


def test_bucketed_sink_colocated_join(spark):
    """write_bucketed pays the join shuffle once at write time: the
    sort-merge join over two tables bucketed on the same key must plan
    with ZERO Exchange, and the joined result must equal the plain
    (shuffling) join."""
    import io as _io
    import re
    from contextlib import redirect_stdout

    from fastfilter_spark.spark import write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
                .withColumn("key", content_key("text"))
    en = docs.where("lang = 'en'").select("key").distinct()
    write_bucketed(docs.select("doc_id", "lang", "key"),
                   "ffsk_test_docs_bkt", "key", 8)
    write_bucketed(en, "ffsk_test_en_bkt", "key", 8)
    a, b = spark.table("ffsk_test_docs_bkt"), spark.table("ffsk_test_en_bkt")
    joined = a.hint("merge").join(b, "key")

    buf = _io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0

    expect = sorted(r.doc_id for r in
                    docs.join(en, "key").select("doc_id").collect())
    got = sorted(r.doc_id for r in joined.select("doc_id").collect())
    assert got == expect
    spark.sql("DROP TABLE IF EXISTS ffsk_test_docs_bkt")
    spark.sql("DROP TABLE IF EXISTS ffsk_test_en_bkt")


def test_membership_source_sparse_sidecar_and_nulls(spark, source_env,
                                                    tmp_path):
    """A scan over an executor-written sidecar whose zero-key pids have
    no row must not crash (their slot is an empty blob -> definite
    non-member), and NULL keys must answer not-member in semi mode
    without corrupting their batch."""
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import build_filter_sidecar

    corpus = str(tmp_path / "corpus_pq")
    docs = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 == 0, None)
         .otherwise(F.xxhash64("id")).alias("key"))
    docs.write.parquet(corpus)

    members = docs.where("key IS NOT NULL AND doc_id % 2 = 0").select("key")
    sc = str(tmp_path / "sparse_sc2")
    # P >> n so many pids provably receive zero keys
    m = build_filter_sidecar(members, sc, kind="bf8", num_partitions=4096)
    assert m["pids_built"] < 4096

    got = (spark.read.format("ffsk_membership")
           .option("path", corpus).option("sidecar", sc)
           .option("key_col", "key").option("mode", "semi").load())
    ids = {r.doc_id for r in got.collect()}
    # every even (member) id present, no NULL-key id ever present
    assert all(i % 2 == 0 for i in ids if i % 7 != 0)
    assert set(i for i in range(0, 300, 2) if i % 7 != 0) <= ids
    assert not any(i % 7 == 0 for i in ids)
