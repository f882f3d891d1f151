"""Register-blocked Bloom filter (core/blockedbloom.py): zero FN, FPP
within 1.5× target (the padded geometry absorbs the PSS07 block-
dispersion penalty), exact OR-merge associativity, serde roundtrip,
and the full Spark build/probe/merge surface via kind="blockedbloom".
"""

import numpy as np
import pytest

from fastfilter_spark.core import BlockedBloomFilter


def test_properties(member_keys, non_member_probes):
    b = BlockedBloomFilter.empty(len(member_keys), fpp=0.01)
    b.add(member_keys)
    assert b.contains(member_keys).all()
    rate = b.contains(non_member_probes[:200_000]).sum() / 200_000
    assert rate < 0.015  # ≤1.5× the 1% target
    assert b.bits_per_entry() < 11.5  # 1.10-padded geometry + 512-bit rounding


def test_probe_touches_one_block(member_keys):
    """Every bit of a key lives inside one 512-bit block — the defining
    cache-line-locality property."""
    b = BlockedBloomFilter.empty(len(member_keys), fpp=0.01)
    block, pos = b._positions(member_keys[:10_000])
    assert pos.min() >= 0 and pos.max() < 512
    assert block.min() >= 0 and block.max() < b.m_bits // 512


def test_merge_or_exact(member_keys):
    n = len(member_keys)
    fa = BlockedBloomFilter.empty(n, 0.01)
    fa.add(member_keys[: n // 2])
    fb = BlockedBloomFilter.empty(n, 0.01)
    fb.add(member_keys[n // 2:])
    m = fa.merge(fb)
    full = BlockedBloomFilter.empty(n, 0.01)
    full.add(member_keys)
    assert (m.words == full.words).all()  # exact associativity
    assert m.n_keys == n


def test_geometry_mismatch_rejected():
    a = BlockedBloomFilter.empty(1000, 0.01)
    b = BlockedBloomFilter.empty(100_000, 0.01)
    with pytest.raises(ValueError):
        a.merge(b)


def test_serde_roundtrip(member_keys):
    b = BlockedBloomFilter.empty(len(member_keys), 0.01)
    b.add(member_keys)
    rt = BlockedBloomFilter.from_bytes(b.to_bytes())
    assert (rt.words == b.words).all()
    assert (rt.m_bits, rt.k, rt.seed, rt.n_keys) == (
        b.m_bits, b.k, b.seed, b.n_keys)
    # dispatch via the shared loader too
    from fastfilter_spark import workerside
    lf = workerside.load_filter(b.to_bytes())
    assert isinstance(lf, BlockedBloomFilter)
    assert lf.contains(member_keys[:1000]).all()


def test_intersect_superset(member_keys):
    n = len(member_keys)
    fa = BlockedBloomFilter.empty(n, 0.01)
    fa.add(member_keys[: 2 * n // 3])
    fb = BlockedBloomFilter.empty(n, 0.01)
    fb.add(member_keys[n // 3:])
    inter = fa.intersect(fb)
    common = member_keys[n // 3: 2 * n // 3]
    assert inter.contains(common).all()  # true intersection always hits


# ---- Spark surface ----------------------------------------------------------

@pytest.fixture()
def corpus_df(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    df.cache().count()
    return df


def test_spark_build_probe_and_collapse(spark, corpus_df):
    from fastfilter_spark.spark import build_partitioned_filter
    from fastfilter_spark.spark.keys import keys_from_content

    keys = keys_from_content(corpus_df, "content").dropDuplicates(["key"])
    pf = build_partitioned_filter(keys, kind="blockedbloom",
                                  num_partitions=4)
    n = keys.count()
    hits = pf.with_contains(keys, "key").where("contained").count()
    assert hits == n  # zero FN through the partitioned route
    g = pf.to_global_bloom()
    assert isinstance(g, BlockedBloomFilter)
    sample = np.array([r.key for r in keys.limit(2000).collect()],
                      dtype=np.int64).view(np.uint64)
    assert g.contains(sample).all()


def test_spark_merge_bloom_and_add_keys(spark, corpus_df):
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import build_partitioned_filter
    from fastfilter_spark.spark.build import add_keys
    from fastfilter_spark.spark.keys import keys_from_content

    keys = keys_from_content(corpus_df, "content") \
        .dropDuplicates(["key"]).cache()
    n = keys.count()
    a = keys.where(F.xxhash64("key") % 2 == 0)
    b = keys.where(F.xxhash64("key") % 2 != 0)
    # both halves built with the SAME n_expected → same geometry per pid
    fa = build_partitioned_filter(a, kind="blockedbloom", num_partitions=4,
                                  bloom_n_expected=n)
    fb = build_partitioned_filter(b, kind="blockedbloom", num_partitions=4,
                                  bloom_n_expected=n)
    m = fa.merge_bloom(fb)
    assert m.with_contains(keys, "key").where("contained").count() == n
    # kind mismatch with plain bloom is rejected
    fp = build_partitioned_filter(a, kind="bloom", num_partitions=4,
                                  bloom_n_expected=n)
    with pytest.raises(ValueError):
        fa.merge_bloom(fp)
    # incremental add preserves exact geometry (OR-merge compatible)
    inc = add_keys(fa, a, b)
    assert inc.with_contains(keys, "key").where("contained").count() == n


def test_spark_grouped_blockedbloom(spark, corpus_df):
    """Per-group blocked-bloom blobs through the shared bloom_args
    plumbing (grouped.py BLOOM_KINDS dispatch)."""
    import numpy as np

    from fastfilter_spark.spark import build_grouped_filters
    from fastfilter_spark.spark.keys import content_key

    docs = corpus_df.withColumn("key", content_key("content"))
    gf = build_grouped_filters(docs.select("lang", "key"), ["lang"],
                               kind="blockedbloom",
                               bloom_n_expected_per_group=2000)
    assert gf.n_groups == docs.select("lang").distinct().count()
    own = gf.with_contains(docs.select("lang", "key"), "key")
    assert own.where("NOT contained").count() == 0
    some_lang = docs.select("lang").first().lang
    filt = gf.filter_for(some_lang)
    assert isinstance(filt, BlockedBloomFilter)
    keys = (docs.where(f"lang = '{some_lang}'").select("key")
            .limit(100).toPandas()["key"].to_numpy(np.int64)
            .view(np.uint64))
    assert filt.contains(keys).all()


def test_tight_fpp_refused():
    """k is capped at 14 (two 63-bit position words) and optimal k is
    -log2(fpp): targets tighter than ~4e-5 must fail loud, not
    silently under-hash."""
    BlockedBloomFilter.empty(10_000, 5e-5)  # k=14 — allowed
    for bad in (1e-5, 1e-6, 1e-9):
        with pytest.raises(ValueError, match="k <= 14"):
            BlockedBloomFilter.empty(10_000, bad)


def test_streaming_rebuild_sink_blockedbloom(spark, tmp_path):
    """filter_rebuild_sink composes with the blocked-bloom kind: zero
    FN over all streamed batches via the exact-geometry add_keys path.
    (Byte-identity with a one-shot build does NOT hold for bloom kinds
    — geometry is sized from batch 1; documented in the sink.)"""
    import glob
    import os

    from pyspark.sql import functions as F

    from fastfilter_spark.spark.io import read_filter_sidecar
    from fastfilter_spark.streaming import filter_rebuild_sink

    src = str(tmp_path / "bb_src")
    spark.range(0, 3000).select(F.xxhash64("id").alias("key")) \
        .repartition(3).write.parquet(src)
    stream = (spark.readStream.schema("key long")
              .option("maxFilesPerTrigger", 1).parquet(src))
    work = str(tmp_path / "bb_rebuild")
    q = filter_rebuild_sink(stream, work, kind="blockedbloom",
                            num_partitions=8,
                            checkpoint_dir=str(tmp_path / "bb_ck"))
    q.awaitTermination(180)
    streamed = read_filter_sidecar(os.path.join(work, "sidecar"))
    assert streamed.kind == "blockedbloom"
    all_keys = spark.range(0, 3000).select(F.xxhash64("id").alias("key"))
    probed = streamed.with_contains(all_keys, "key")
    assert probed.where("NOT contained").count() == 0  # zero FN
    assert len(glob.glob(os.path.join(work, "keys", "batch=*"))) >= 2
