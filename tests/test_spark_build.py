"""Distributed build lifecycle tests (SURVEY.md §3, FIXTURES.md F3):
key invariant, zero-FN through the Spark path, resume determinism,
merge associativity across partitionings, skew balance."""

import glob
import hashlib
import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import (
    build_partitioned_filter, content_key, keys_from_content, partition_id,
)


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    df.cache().count()
    return df


def test_key_invariant_sha256(spark, corpus_df):
    """Per-row invariant: derived key == first 8 bytes of sha256(content)."""
    rows = corpus_df.select("content", content_key("content").alias("key")) \
                    .limit(50).collect()
    for r in rows:
        expect = int.from_bytes(hashlib.sha256(r.content.encode()).digest()[:8], "big")
        got = r.key if r.key >= 0 else r.key + (1 << 64)
        assert got == expect


def test_key_derivation_arrow_jvm_parity(spark, corpus_df):
    """content_key_arrow (hashlib pandas UDF — the fat-executor path that
    sidesteps the JVM MessageDigest provider-lock contention) must be
    byte-identical to the codegen sha2 path on every corpus row."""
    a = keys_from_content(corpus_df, "content", method="jvm")
    b = keys_from_content(corpus_df, "content", method="arrow")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_build_zero_fn_and_dedup_metric(spark, corpus_df):
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    n_distinct = keys.distinct().count()
    assert pf.n_keys == n_distinct  # dupes removed before peeling
    probed = pf.with_contains(keys, "key")
    assert probed.where("NOT contained").count() == 0


@pytest.mark.parametrize("kind", ["bf16", "xor8", "xorplus8", "fuse8", "bloom"])
def test_all_kinds_zero_fn(spark, corpus_df, kind):
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind=kind, num_partitions=4)
    assert pf.with_contains(keys, "key").where("NOT contained").count() == 0


def test_fpp_through_spark_path(spark, corpus_df):
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    probes = spark.range(1, 200_001).select(
        F.xxhash64(F.col("id") * 2654435761).alias("key"))
    hits = pf.with_contains(probes, "key").where("contained").count()
    assert hits / 200_000 < 2**-8 * 1.6 + 0.002


def test_resume_reproduces_identical_blobs(spark, corpus_df, tmp_path):
    keys = keys_from_content(corpus_df, "content")
    ck_full = str(tmp_path / "full")
    pf_ref = build_partitioned_filter(keys, kind="bf8", num_partitions=8,
                                      checkpoint_dir=ck_full)
    # simulate a crash: keep only partials for pid < 4, then resume
    import pyarrow.parquet as pq
    import pyarrow as pa
    files = glob.glob(ck_full + "/partials/*.parquet")
    rows = pd.concat([pq.read_table(f).to_pandas() for f in files])
    kept = rows[rows.pid < 4]
    shutil.rmtree(ck_full + "/partials")
    os.makedirs(ck_full + "/partials")
    pq.write_table(pa.Table.from_pandas(kept, preserve_index=False),
                   ck_full + "/partials/kept.parquet")
    pf_res = build_partitioned_filter(keys, kind="bf8", num_partitions=8,
                                      checkpoint_dir=ck_full)
    assert all(a == b for a, b in zip(pf_ref.blobs, pf_res.blobs))
    assert pf_res.metrics["n_keys"].sum() == pf_ref.metrics["n_keys"].sum()


def test_manifest_mismatch_rejected(spark, corpus_df, tmp_path):
    keys = keys_from_content(corpus_df, "content")
    ck = str(tmp_path / "ck")
    build_partitioned_filter(keys, kind="bf8", num_partitions=4,
                             checkpoint_dir=ck)
    with pytest.raises(ValueError, match="manifest mismatch"):
        build_partitioned_filter(keys, kind="xor8", num_partitions=4,
                                 checkpoint_dir=ck)


def test_merge_associativity_partition_counts(spark, corpus_df):
    """F3 `repart_variants`: equivalent membership answers at P=1/4/16."""
    keys = keys_from_content(corpus_df, "content")
    probes = spark.range(0, 50_000).select(F.xxhash64("id").alias("key"))
    results = []
    for P in (1, 4, 16):
        pf = build_partitioned_filter(keys, kind="bf8", num_partitions=P)
        fn = pf.with_contains(keys, "key").where("NOT contained").count()
        assert fn == 0, f"P={P}"
        fpp = pf.with_contains(probes, "key").where("contained").count() / 50_000
        results.append(fpp)
    for fpp in results:
        assert fpp < 2**-8 * 1.6 + 0.003


def test_skew_defused_by_salted_placement(spark, corpus_path, tmp_path):
    """F3 `skew_extreme`: 90% of rows in one repo must still give
    balanced partitions because placement hashes the key, not the repo."""
    from fixtures.gen import gen_corpus
    df = gen_corpus(20_000, seed=7, skew=3.0)  # extreme repo skew
    top = df.groupby("repo").size().max() / len(df)
    assert top > 0.3  # fixture really is skewed
    sdf = spark.createDataFrame(df)
    keys = keys_from_content(sdf, "content").dropDuplicates(["key"])
    sizes = (keys.withColumn("pid", partition_id("key", 16))
             .groupBy("pid").count().toPandas()["count"])
    assert len(sizes) == 16
    assert sizes.max() <= 1.5 * sizes.median()


def test_bloom_global_collapse(spark, corpus_df):
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="bloom", num_partitions=4)
    g = pf.to_global_bloom()
    import numpy as np
    sample = np.array([r.key for r in keys.limit(2000).collect()],
                      dtype=np.int64).view(np.uint64)
    assert g.contains(sample).all()


def test_metrics_lineage_columns(spark, corpus_df):
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=4)
    for col in ("pid", "n_keys", "attempts", "peel_rounds", "build_secs",
                "bits_per_entry"):
        assert col in pf.metrics.columns
    assert (pf.metrics["attempts"] >= 1).all()


def test_add_keys_incremental_rebuild(spark, corpus_df):
    """Union-keys-and-rebuild: result identical to a from-scratch build
    over the union, and untouched partitions' blobs are reused."""
    from fastfilter_spark.spark import add_keys
    keys = keys_from_content(corpus_df, "content").cache()
    half_a = keys.where(F.col("key") % 2 == 0)
    half_b = keys.where(F.col("key") % 2 != 0)
    pf_a = build_partitioned_filter(half_a, kind="bf8", num_partitions=8)
    pf_inc = add_keys(pf_a, half_a, half_b)
    pf_full = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    assert all(x == y for x, y in zip(pf_inc.blobs, pf_full.blobs))
    assert pf_inc.with_contains(keys, "key").where("NOT contained").count() == 0
    # no-op increment returns the same object state
    pf_same = add_keys(pf_full, keys, keys.limit(5))
    assert all(x == y for x, y in zip(pf_same.blobs, pf_full.blobs))


def test_filter_sidecar_roundtrip(spark, corpus_df, tmp_path):
    """Persist a built filter as a parquet sidecar; reload answers the
    same membership queries (SURVEY.md §3 stage 6 publish artifact)."""
    from fastfilter_spark.spark import (
        read_filter_sidecar, write_filter_sidecar,
    )
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="xorplus8", num_partitions=8)
    side = str(tmp_path / "sidecar")
    write_filter_sidecar(pf, side)
    pf2 = read_filter_sidecar(side)
    assert pf2.kind == pf.kind and pf2.routing == pf.routing
    assert all(a == b for a, b in zip(pf.blobs, pf2.blobs))
    assert pf2.with_contains(keys, "key").where("NOT contained").count() == 0


def test_contains_via_sidecar_routes_correctly(spark, corpus_df, tmp_path):
    from fastfilter_spark.spark import contains_via_sidecar, write_filter_sidecar
    keys = keys_from_content(corpus_df, "content")
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=16)
    side = str(tmp_path / "side")
    write_filter_sidecar(pf, side)
    out = contains_via_sidecar(keys, side)
    assert out.where("NOT contained").count() == 0
    probes = spark.range(0, 30_000).select(F.xxhash64("id").alias("key"))
    fpp = contains_via_sidecar(probes, side).where("contained").count() / 30_000
    assert fpp < 2**-8 * 1.6 + 0.004


def test_grouped_filters_zero_fn_and_exactness(spark, corpus_df):
    from fastfilter_spark.spark import build_grouped_filters
    docs = corpus_df.withColumn("key", content_key("content"))
    gf = build_grouped_filters(docs.select("lang", "key"), ["lang"],
                               kind="bf8")
    assert gf.n_groups == docs.select("lang").distinct().count()
    # zero FN: probing each row against its own group is always true
    own = gf.with_contains(docs.select("lang", "key"), "key")
    assert own.where("NOT contained").count() == 0
    # per-group metrics rows carry lineage
    assert set(gf.metrics.columns) >= {"gkey", "n_keys", "attempts",
                                       "bits_per_entry"}
    # a group's filter is individually exportable + probes correctly
    some_lang = docs.select("lang").first().lang
    filt = gf.filter_for(some_lang)
    keys = (docs.where(F.col("lang") == some_lang).select("key")
            .limit(100).toPandas()["key"].to_numpy(np.int64)
            .view(np.uint64))
    assert filt.contains(keys).all()


def test_grouped_filters_max_groups_guard(spark, corpus_df):
    """VERDICT r3 #3: an unbounded group column (doc_id-like) must fail
    fast with guidance instead of collecting one blob per row to the
    driver (the exact OOM shape the ungrouped build had at 1e9 pre-
    sidecar). The probe is bounded (limit max_groups+1), so the guard
    itself cannot become the expensive part."""
    import pytest as _pytest

    from fastfilter_spark.spark import build_grouped_filters
    docs = corpus_df.withColumn("key", content_key("content"))
    # group by path = one group per row — the misuse shape
    with _pytest.raises(ValueError, match="exceeds max_groups"):
        build_grouped_filters(docs.select("path", "key"), ["path"],
                              kind="bf8", max_groups=10)
    # raising the bound deliberately still works
    gf = build_grouped_filters(docs.select("lang", "key"), ["lang"],
                               kind="bf8", max_groups=100)
    assert gf.n_groups == docs.select("lang").distinct().count()


def test_grouped_filters_unknown_group_and_determinism(spark, corpus_df):
    from fastfilter_spark.spark import build_grouped_filters
    docs = corpus_df.withColumn("key", content_key("content"))
    gf = build_grouped_filters(docs.select("lang", "key"), ["lang"],
                               kind="bf8")
    # unknown group at probe time == empty set
    probe = docs.select("key").withColumn("lang", F.lit("__nope__"))
    assert gf.with_contains(probe.select("lang", "key"), "key") \
             .where("contained").count() == 0
    # determinism: rebuild at different parallelism → identical blobs
    gf2 = build_grouped_filters(
        docs.repartition(3).select("lang", "key"), ["lang"], kind="bf8")
    assert gf.blob_map == gf2.blob_map


def test_grouped_filters_cross_group_fpp_bounded(spark, corpus_df):
    from fastfilter_spark.spark import build_grouped_filters
    docs = corpus_df.withColumn("key", content_key("content"))
    gf = build_grouped_filters(docs.select("lang", "key"), ["lang"],
                               kind="bf16")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    # probe every key against a DIFFERENT group: hits must be only true
    # cross-group overlaps plus a ~2^-16 FP rate
    other = {langs[i]: langs[(i + 1) % len(langs)] for i in range(len(langs))}
    mapping = F.create_map(*[F.lit(x) for kv in other.items() for x in kv])
    probe = (docs.select("lang", "key")
             .withColumn("plang", mapping[F.col("lang")])
             .select(F.col("plang").alias("lang"), "key"))
    got = gf.with_contains(probe, "key").where("contained").count()
    truth = (probe.join(docs.select("lang", "key").dropDuplicates(),
                        ["lang", "key"], "left_semi").count())
    n = probe.count()
    assert truth <= got <= truth + max(10, int(n * 3e-4))


def test_salted_join_exactness_and_spread(spark):
    """salted_join must equal the plain join, and a hot key's rows must
    spread across multiple (key, salt) groups instead of one."""
    from pyspark.sql import functions as F

    from fastfilter_spark.spark.skew import salted_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    hot = (ev.groupBy("user_id").agg(F.count("*").alias("n"))
           .where("n >= 10").select("user_id"))
    plain = ev.join(hot, "user_id").groupBy("user_id") \
              .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    salted = salted_join(ev, hot, "user_id", salt_n=8).groupBy("user_id") \
              .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    a = {(r.user_id, r.n, round(r.s, 9)) for r in plain.collect()}
    b = {(r.user_id, r.n, round(r.s, 9)) for r in salted.collect()}
    assert a == b and a

    # spread: the hottest key occupies >1 salt bucket
    top = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()
    n_salts = (ev.where(F.col("user_id") == top.user_id)
               .select(F.pmod(F.xxhash64(*[c for c in ev.columns
                                           if c != "user_id"]), F.lit(8)))
               .distinct().count())
    assert n_salts > 1

    # left join preserves unmatched fact rows exactly
    lp = ev.join(hot, "user_id", "left").count()
    ls = salted_join(ev, hot, "user_id", salt_n=8, how="left").count()
    assert lp == ls == ev.count()


def test_asof_join_semantics(spark):
    """Backward as-of: greatest right ts <= left ts per key; ties match;
    unmatched left rows survive with nulls; tolerance nulls stale matches."""
    from fastfilter_spark.spark.asof import asof_join

    a = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, "B"), (2, 15, "C"), (3, 9, "D")],
        "k int, ts int, lbl string")
    b = spark.createDataFrame(
        [(1, 5, "x"), (1, 18, "y"), (1, 20, "t"), (2, 99, "z")],
        "k int, ts int, v string")
    got = {(r.k, r.ts): (r.lbl, r.v_asof, r.ts_asof)
           for r in asof_join(a, b, "k", "ts").collect()}
    assert got == {(1, 10): ("A", "x", 5), (1, 20): ("B", "t", 20),
                   (2, 15): ("C", None, None), (3, 9): ("D", None, None)}
    tol = {(r.k, r.ts): r.v_asof
           for r in asof_join(a, b, "k", "ts", tolerance=3).collect()}
    assert tol == {(1, 10): None, (1, 20): "t", (2, 15): None, (3, 9): None}


def test_asof_join_null_payload(spark):
    """A matched right row with a NULL payload column must attach that
    NULL — not splice the column from an OLDER right row (all payload
    columns must come from the SAME matched row)."""
    from fastfilter_spark.spark.asof import asof_join

    a = spark.createDataFrame([(1, 30)], "k int, ts int")
    b = spark.createDataFrame([(1, 10, "old"), (1, 20, None)],
                              "k int, ts int, v string")
    rows = asof_join(a, b, "k", "ts").collect()
    assert len(rows) == 1
    r = rows[0]
    # DuckDB ASOF semantics: match is ts=20, whose v is NULL.
    assert (r.ts_asof, r.v_asof) == (20, None)


def test_asof_join_matches_exact_rewrite(spark):
    """On real events data the composition must equal the naive
    range-join + keep-latest rewrite."""
    from fastfilter_spark.spark.asof import asof_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    left = ev.where("event_type = 'purchase'").select("user_id", "ts", "value")
    right = (ev.where("event_type = 'view'")
             .groupBy("user_id", "ts").agg(F.max("value").alias("rv")))
    got = asof_join(left, right, "user_id", "ts") \
        .select("user_id", "ts", "rv_asof")

    from pyspark.sql import Window
    r2 = right.withColumnRenamed("ts", "rts").withColumnRenamed(
        "user_id", "r_user_id")
    naive = left.join(
        r2, (left.user_id == r2.r_user_id) & (r2.rts <= left.ts), "left")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc_nulls_last("rts"))
    expect = (naive.withColumn("rn", F.row_number().over(w)).where("rn = 1")
              .select("user_id", "ts", F.col("rv").alias("rv_asof")))
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0


def test_interval_join_matches_inequality_join(spark):
    """Bucket-explode range join must equal the naive inequality join
    (which Spark plans as a nested loop), including multi-overlap and
    boundary inclusivity; left_semi must equal distinct point matches."""
    from fastfilter_spark.spark.rangejoin import interval_join

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    epoch = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(1e6)
    pts = ev.where("event_type = 'click'") \
            .select("user_id", "event_id", epoch.alias("t"))
    iv = (ev.where("event_type = 'error'")
          .select("user_id", epoch.alias("lo"))
          .withColumn("hi", F.col("lo") + 3600.0))
    got = interval_join(pts, iv, "user_id", "t", "lo", "hi", 3600.0) \
        .select("user_id", "event_id", "lo")

    iv2 = iv.select(F.col("user_id").alias("u2"), "lo", "hi")
    expect = (pts.join(iv2, (pts.user_id == iv2.u2)
                       & (iv2.lo <= pts.t) & (pts.t <= iv2.hi))
              .select("user_id", "event_id", "lo"))
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    assert got.count() > 0

    semi = interval_join(pts, iv, "user_id", "t", "lo", "hi", 3600.0,
                         how="left_semi")
    assert semi.count() == expect.select("event_id").distinct().count()


def test_build_filter_sidecar_driver_bypass(spark, corpus_df, tmp_path):
    """The 10^12-key path: partials written executor-side, driver never
    holds a blob. Blobs must be byte-identical to the in-driver build
    (same per-pid RNG), the routed query must have zero FN, and missing
    pids must read as definite non-membership."""
    import pyarrow.parquet as pq

    from fastfilter_spark.spark import (
        build_filter_sidecar, contains_via_sidecar,
    )

    keys = keys_from_content(corpus_df, "content")
    sc = str(tmp_path / "sc")
    m = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=8)
    assert m["n_keys"] == keys.distinct().count()

    assert contains_via_sidecar(keys, sc).where("NOT contained").count() == 0

    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    tbl = pq.read_table(sc + "/partials.parquet",
                        columns=["pid", "blob"]).to_pandas()
    assert all(bytes(r.blob) == pf.blobs[int(r.pid)]
               for r in tbl.itertuples())

    probes = spark.range(0, 50_000).select(
        F.xxhash64(F.col("id") * 77 + 13).alias("key"))
    fp = contains_via_sidecar(probes, sc).where("contained").count()
    assert fp / 50_000 < 2**-8 * 1.6 + 0.003


def test_sparse_sidecar_readback_total(spark, corpus_df, tmp_path):
    """An executor-written sidecar omits zero-key pids; reading it back
    into a driver handle must synthesize their empty filters so every
    probe routes to a real blob."""
    from fastfilter_spark.spark import build_filter_sidecar, read_filter_sidecar

    keys = keys_from_content(corpus_df, "content")
    sc = str(tmp_path / "sparse_sc")
    P = 8192  # >> n_distinct, so some pids provably get no keys
    m = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=P)
    assert m["pids_built"] < P  # genuinely sparse
    pf = read_filter_sidecar(sc)
    assert all(len(b) > 0 for b in pf.blobs)
    assert pf.with_contains(keys, "key").where("NOT contained").count() == 0


def test_sidecar_batched_resume(spark, corpus_df, tmp_path):
    """north_rule resumability on the 10^12 path: a batched sidecar
    build killed mid-way (simulated via _stop_after) must leave no
    manifest (readers reject the incomplete build), and resume=True must
    complete only the missing pid ranges, ending byte-identical to a
    one-shot build."""
    import pyarrow.parquet as pq

    from fastfilter_spark.spark import build_filter_sidecar, contains_via_sidecar

    keys = keys_from_content(corpus_df, "content")
    one_shot = str(tmp_path / "sc_oneshot")
    build_filter_sidecar(keys, one_shot, kind="bf8", num_partitions=16)

    # batched build equals one-shot byte-for-byte
    batched = str(tmp_path / "sc_batched")
    m = build_filter_sidecar(keys, batched, kind="bf8", num_partitions=16,
                             batches=4)
    ref = pq.read_table(one_shot + "/partials.parquet",
                        columns=["pid", "blob"]).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    got = pq.read_table(batched + "/partials.parquet",
                        columns=["pid", "blob"]).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    assert list(ref.pid) == list(got.pid)
    assert all(bytes(a) == bytes(b) for a, b in zip(ref.blob, got.blob))

    # crash after 2 of 4 batches: no manifest, partial pids committed
    crashed = str(tmp_path / "sc_crashed")
    out = build_filter_sidecar(keys, crashed, kind="bf8", num_partitions=16,
                               batches=4, _stop_after=2)
    assert out is None
    import os
    assert not os.path.exists(crashed + "/filter_manifest.json")
    n_partial = len(pq.read_table(crashed + "/partials.parquet",
                                  columns=["pid"]))
    assert 0 < n_partial < len(ref)

    # resume completes the missing ranges; byte-identical to one-shot
    m2 = build_filter_sidecar(keys, crashed, kind="bf8", num_partitions=16,
                              batches=4, resume=True)
    assert m2["n_keys"] == m["n_keys"]
    res = pq.read_table(crashed + "/partials.parquet",
                        columns=["pid", "blob"]).to_pandas() \
        .sort_values("pid").reset_index(drop=True)
    assert list(res.pid) == list(ref.pid)
    assert all(bytes(a) == bytes(b) for a, b in zip(ref.blob, res.blob))
    assert contains_via_sidecar(keys, crashed) \
        .where("NOT contained").count() == 0

    # resuming a COMPLETE build is an idempotent no-op
    m3 = build_filter_sidecar(keys, crashed, kind="bf8", num_partitions=16,
                              batches=4, resume=True)
    assert m3 == m2


def test_cuckoo_distributed_build_and_delete(spark, corpus_df):
    """Deletable partitioned membership: distributed cuckoo build has
    zero FN; cuckoo_update(delete) removes exactly the requested keys,
    keeps every survivor (zero FN), and is functional (the original
    handle is untouched)."""
    from fastfilter_spark.spark import cuckoo_update

    keys = keys_from_content(corpus_df, "content").distinct().cache()
    evens = keys.where(F.col("key") % 2 == 0)
    odds = keys.where(F.col("key") % 2 != 0)
    pf = build_partitioned_filter(keys, kind="cuckoo16", num_partitions=8)
    assert pf.with_contains(keys, "key").where("NOT contained").count() == 0

    pf2 = cuckoo_update(pf, delete_df=evens)
    assert pf2.with_contains(odds, "key").where("NOT contained").count() == 0
    resid = pf2.with_contains(evens, "key").where("contained").count()
    assert resid <= max(2, 0.01 * evens.count())   # collisions only @w16
    # original untouched; add-back restores full membership
    assert pf.with_contains(evens, "key").where("NOT contained").count() == 0
    pf3 = cuckoo_update(pf2, add_df=evens)
    assert pf3.with_contains(keys, "key").where("NOT contained").count() == 0


def test_hash_sample_deterministic_and_nested(spark):
    """hash_sample: identical membership across partitionings (what
    df.sample cannot promise), nested fractions, binomial-accurate
    rate; hash_split: disjoint + exhaustive + leak-safe on equal keys."""
    from fastfilter_spark.spark import hash_sample, hash_split

    df = spark.range(0, 20_000).select(F.col("id").alias("k"))
    a = set(r.k for r in hash_sample(df.repartition(1), "k", 0.2).collect())
    b = set(r.k for r in hash_sample(df.repartition(16), "k", 0.2).collect())
    assert a == b                                   # partitioning-independent
    small = set(r.k for r in hash_sample(df, "k", 0.05).collect())
    assert small <= a                               # nested at same salt
    assert abs(len(a) - 4000) < 4 * (20_000 * 0.2 * 0.8) ** 0.5

    tr, va, te = hash_split(df, "k", (0.8, 0.1, 0.1))
    st, sv, se = (set(r.k for r in d.collect()) for d in (tr, va, te))
    assert st | sv | se == set(range(20_000))       # exhaustive
    assert not (st & sv) and not (st & se) and not (sv & se)  # disjoint
    assert abs(len(st) - 16_000) < 4 * (20_000 * 0.8 * 0.2) ** 0.5

    # duplicate keys land in the same split (no train/test leak)
    dup = spark.createDataFrame([(7,), (7,), (7,)], "k long")
    parts = hash_split(dup, "k", (0.5, 0.5))
    counts = [p.count() for p in parts]
    assert sorted(counts) == [0, 3]


def test_null_key_probes_are_not_members(spark, corpus_df, tmp_path):
    """NULL keys must answer contained=False on BOTH probe paths — and
    must not corrupt the other keys in their Arrow batch (a null int64
    column round-trips via float64, and viewing THAT as uint64 garbles
    every key in the batch)."""
    from fastfilter_spark.spark import build_filter_sidecar, contains_via_sidecar

    keys = keys_from_content(corpus_df, "content")
    probes = keys.unionByName(
        spark.createDataFrame([(None,)], "key long")).repartition(2)

    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    got = pf.with_contains(probes, "key")
    assert got.where("key IS NULL AND contained").count() == 0
    assert got.where("key IS NOT NULL AND NOT contained").count() == 0

    sc = str(tmp_path / "null_sc")
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=8)
    got2 = contains_via_sidecar(probes, sc)
    assert got2.where("key IS NULL AND contained").count() == 0
    assert got2.where("key IS NOT NULL AND NOT contained").count() == 0


def test_merge_bloom_guards_and_metrics(spark, corpus_df):
    """merge_bloom must reject mismatched routing (keys placed by
    different pid functions -> OR-merge would drop keys) and must sum
    per-pid n_keys in the merged metrics."""
    import pytest as _pytest
    keys = keys_from_content(corpus_df, "content").distinct().cache()
    a = keys.where(F.col("key") % 2 == 0)
    b = keys.where(F.col("key") % 2 != 0)
    n = keys.count()
    pf_a = build_partitioned_filter(a, kind="bloom", num_partitions=4,
                                    bloom_n_expected=n)
    pf_b = build_partitioned_filter(b, kind="bloom", num_partitions=4,
                                    bloom_n_expected=n)
    merged = pf_a.merge_bloom(pf_b)
    assert merged.with_contains(keys, "key").where("NOT contained").count() == 0
    assert merged.n_keys == pf_a.n_keys + pf_b.n_keys

    pf_rows = build_partitioned_filter(b, kind="bloom", num_partitions=4,
                                       bloom_n_expected=n,
                                       shuffle_mode="rows")
    with _pytest.raises(ValueError, match="routing mismatch"):
        pf_a.merge_bloom(pf_rows)


def test_add_keys_bloom_preserves_geometry(spark, corpus_df, tmp_path):
    """Incremental bloom rebuilds must copy the EXACT (m, k, seed) of
    existing blobs — deriving (n, fpp) reconstructs a different k at
    non-default fpp, breaking OR-merge and inflating FPP. Also: the
    rewritten checkpoint manifest must still satisfy a later
    checkpointed build (same key set incl. shuffle_mode)."""
    from fastfilter_spark.core.bloom import BloomFilter
    from fastfilter_spark.spark import add_keys

    keys = keys_from_content(corpus_df, "content").distinct().cache()
    half_a = keys.where(F.col("key") % 2 == 0)
    half_b = keys.where(F.col("key") % 2 != 0)
    n = keys.count()
    ck = str(tmp_path / "ck_bloom")
    pf = build_partitioned_filter(half_a, kind="bloom", num_partitions=4,
                                  bloom_n_expected=n, bloom_fpp=0.001,
                                  checkpoint_dir=ck)
    g0 = BloomFilter.from_bytes(pf.blobs[0])
    pf2 = add_keys(pf, half_a, half_b, checkpoint_dir=ck)
    for blob in pf2.blobs:
        g = BloomFilter.from_bytes(blob)
        assert (g.m_bits, g.k, g.seed) == (g0.m_bits, g0.k, g0.seed)
    assert pf2.with_contains(keys, "key").where("NOT contained").count() == 0
    # to_global_bloom mixes rebuilt and original blobs — must not raise
    pf2.to_global_bloom()
    # resume path still accepts the rewritten manifest
    pf3 = build_partitioned_filter(half_a, kind="bloom", num_partitions=4,
                                   bloom_n_expected=n, bloom_fpp=0.001,
                                   checkpoint_dir=ck)
    assert pf3.num_partitions == 4


def test_grouped_filters_null_and_separator_safety(spark):
    """A NULL group value must answer False (not alias the ''-group's
    filter), and group values containing the separator must not merge
    distinct groups."""
    from fastfilter_spark.spark import build_grouped_filters

    df = spark.createDataFrame(
        [("", "x", 1), ("a\x1fb", "c", 2), ("a", "b\x1fc", 3)],
        "g1 string, g2 string, key long")
    gf = build_grouped_filters(df, ["g1", "g2"])
    assert gf.n_groups == 3  # separator values did not alias groups

    probe = spark.createDataFrame(
        [(None, "x", 1), ("", "x", 1), ("a\x1fb", "c", 3)],
        "g1 string, g2 string, key long")
    rows = {(r.g1, r.g2): r.contained
            for r in gf.with_contains(probe, "key").collect()}
    assert rows[(None, "x")] is False        # NULL group: empty set
    assert rows[("", "x")] is True           # ''-group keeps its own key
    assert rows[("a\x1fb", "c")] is False    # key 3 belongs to ('a','b\x1fc')
    assert gf.filter_for("a\x1fb", "c").contains(
        __import__("numpy").array([2], dtype="uint64"))[0]


def test_merge_bloom_keeps_other_side_only_pids(spark, corpus_df):
    """Metrics rows exist only for BUILT pids: a pid with keys only on
    other's side must survive the metrics merge (reindexing on self's
    pids dropped it and undercounted n_keys)."""
    keys = keys_from_content(corpus_df, "content").distinct().cache()
    one = keys.limit(1)                       # builds ~1 of 8 pids
    rest = keys.subtract(one)
    n = keys.count()
    pf_small = build_partitioned_filter(one, kind="bloom", num_partitions=8,
                                        bloom_n_expected=n)
    pf_big = build_partitioned_filter(rest, kind="bloom", num_partitions=8,
                                      bloom_n_expected=n)
    assert len(pf_small.metrics) < len(pf_big.metrics)  # the asymmetry
    merged = pf_small.merge_bloom(pf_big)
    assert merged.n_keys == pf_small.n_keys + pf_big.n_keys
    assert sorted(merged.metrics["pid"]) == sorted(
        set(pf_small.metrics["pid"]) | set(pf_big.metrics["pid"]))
    # and the reverse order agrees (associativity of the union)
    assert pf_big.merge_bloom(pf_small).n_keys == merged.n_keys
    assert merged.with_contains(keys, "key").where("NOT contained").count() == 0


def test_sidecar_resume_params_guard(spark, corpus_df, tmp_path):
    """resume=True with different build params must be rejected: the
    manifest lands last, so a crashed build is only identifiable by the
    params pre-manifest — resuming with a different kind/P/salt would
    silently mix incompatible blobs."""
    import pytest as _pytest

    from fastfilter_spark.spark import build_filter_sidecar

    keys = keys_from_content(corpus_df, "content")
    sc = str(tmp_path / "sc_params")
    # simulate a crash: params written, partials committed, no manifest
    out = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16,
                               batches=4, _stop_after=2)
    assert out is None
    for bad in (dict(kind="bf16"), dict(num_partitions=32), dict(salt=7),
                dict(base_rng_state=123)):
        kw = dict(kind="bf8", num_partitions=16, batches=4, resume=True)
        kw.update(bad)
        with _pytest.raises(ValueError, match="incompatible build params"):
            build_filter_sidecar(keys, sc, **kw)
    # matching params resume fine
    m = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16,
                             batches=4, resume=True)
    assert m is not None and m["pids_built"] > 0


def test_sidecar_local_and_routed_paths_agree(spark, corpus_df, tmp_path):
    """contains_via_sidecar picks a no-shuffle local path for small
    sidecars; it must agree row-for-row with the routed (shuffled) path
    and add no Exchange to the plan."""
    from fastfilter_spark.spark import build_filter_sidecar, contains_via_sidecar

    keys = keys_from_content(corpus_df, "content").cache()
    sc = str(tmp_path / "sc_lr")
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16)
    probes = keys.union(keys.select((F.col("key") + 1).alias("key")))

    local = contains_via_sidecar(probes, sc)           # blob_bytes small
    routed = contains_via_sidecar(probes, sc, max_local_bytes=0)
    lp = local.toPandas().sort_values("key").reset_index(drop=True)
    rp = routed.toPandas().sort_values("key").reset_index(drop=True)
    assert lp.equals(rp)
    assert lp.contained.sum() >= keys.count()          # zero FN

    plan_local = local._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_local                # truly shuffle-free
    plan_routed = routed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_routed


def test_sidecar_resume_refuses_unverifiable_partials(spark, corpus_df,
                                                      tmp_path):
    """Partials without a build_params.json (a crash predating the
    guard) cannot be verified — resume must refuse rather than adopt
    the new params and mix incompatible blobs."""
    import os

    import pytest as _pytest

    from fastfilter_spark.spark import build_filter_sidecar

    keys = keys_from_content(corpus_df, "content")
    sc = str(tmp_path / "sc_legacy")
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16,
                         batches=4, _stop_after=2)
    os.remove(os.path.join(sc, "build_params.json"))   # legacy crash shape
    with _pytest.raises(ValueError, match="no build_params.json"):
        build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16,
                             batches=4, resume=True)


def test_sidecar_fresh_rebuild_removes_stale_manifest(spark, corpus_df,
                                                      tmp_path):
    """A fresh (resume=False) rebuild over a COMPLETED sidecar must
    drop the old filter_manifest.json before anything else: a crash
    mid-rebuild would otherwise leave a complete-looking manifest (old
    P/salt/blob_bytes) next to new-generation partials, and readers
    would silently probe new blobs with old params (ADVICE r3)."""
    import os

    import pytest as _pytest

    from fastfilter_spark.spark import build_filter_sidecar, read_filter_sidecar

    keys = keys_from_content(corpus_df, "content")
    sc = str(tmp_path / "sc_rebuild")
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16)
    assert os.path.exists(os.path.join(sc, "filter_manifest.json"))

    # rebuild with DIFFERENT params, crashed before any batch commits:
    # the old manifest must already be gone — readers reject the sidecar
    out = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=32,
                               batches=4, _stop_after=1)
    assert out is None
    assert not os.path.exists(os.path.join(sc, "filter_manifest.json"))
    with _pytest.raises(FileNotFoundError):
        read_filter_sidecar(sc)

    # completing the rebuild restores a consistent sidecar at the NEW P
    m = build_filter_sidecar(keys, sc, kind="bf8", num_partitions=32,
                             batches=4, resume=True)
    assert m["P"] == 32
    pf = read_filter_sidecar(sc)
    assert pf.with_contains(keys, "key").where("NOT contained").count() == 0


def test_register_sql_sidecar(spark, corpus_df, tmp_path):
    """register_sql_sidecar exposes SIDECAR membership to SQL-only
    users (VERDICT r3 #9): zero FN on members, NULL → False, oversize
    guard raises, and a rebuild with different P/salt after
    registration raises instead of silently probing wrong pids."""
    import pytest as _pytest

    from fastfilter_spark.spark import (build_filter_sidecar,
                                        register_sql_sidecar)

    keys = keys_from_content(corpus_df, "content").cache()
    sc = str(tmp_path / "sc_sql")
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=16)
    name = register_sql_sidecar(spark, sc, "ffsk_sc_t")
    assert name == "ffsk_sc_t"
    keys.createOrReplaceTempView("sc_sql_probe")
    n_keys = keys.count()
    row = spark.sql(
        "SELECT SUM(CASE WHEN ffsk_sc_t(key) THEN 1 ELSE 0 END) AS hit, "
        "SUM(CASE WHEN ffsk_sc_t(CAST(NULL AS BIGINT)) THEN 1 ELSE 0 END) "
        "AS null_hit FROM sc_sql_probe").collect()[0]
    assert row.hit == n_keys                 # zero FN through SQL
    assert row.null_hit == 0                 # NULL is never a member

    # oversize sidecars must be refused for the scalar-UDF (local) shape
    with _pytest.raises(ValueError, match="max_local_bytes"):
        register_sql_sidecar(spark, sc, "nope", max_local_bytes=1)

    # rebuild with different partitioning → captured params are stale;
    # the kernel must raise, not probe wrong pids (silent FN)
    build_filter_sidecar(keys, sc, kind="bf8", num_partitions=32)
    with _pytest.raises(Exception, match="re-run register_sql_sidecar"):
        spark.sql("SELECT SUM(CASE WHEN ffsk_sc_t(key) THEN 1 ELSE 0 END) "
                  "FROM sc_sql_probe").collect()
    # re-registering against the rebuilt sidecar works again
    register_sql_sidecar(spark, sc, "ffsk_sc_t")
    row2 = spark.sql(
        "SELECT SUM(CASE WHEN ffsk_sc_t(key) THEN 1 ELSE 0 END) AS hit "
        "FROM sc_sql_probe").collect()[0]
    assert row2.hit == n_keys


def test_deterministic_sample_partitioning_independent(spark):
    """deterministic_sample must select the SAME rows regardless of
    partitioning (the failure mode of DataFrame.sample's
    partition-seeded RNG), support nested-seed reproducibility, and
    plan as TakeOrderedAndProject (no full sort shuffle)."""
    from fastfilter_spark.spark import deterministic_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = deterministic_sample(docs, 20, "doc_id", seed=1)
    b = deterministic_sample(docs.repartition(17), 20, "doc_id", seed=1)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) == 20

    # different seed → (almost surely) different sample
    c = deterministic_sample(docs, 20, "doc_id", seed=2)
    assert sorted(r.doc_id for r in c.select("doc_id").collect()) != ids_a

    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    # weighted: heavier rows dominate the selection
    w = docs.withColumn("w", (F.col("doc_id") < 50).cast("int") * 1000 + 1)
    heavy = deterministic_sample(w, 20, "doc_id", seed=3, weight_col="w")
    n_heavy = heavy.where("doc_id < 50").count()
    assert n_heavy >= 15   # 1000x weight on 50 of ~1200 rows


def test_stratified_sample_and_pack_shards(spark):
    from fastfilter_spark.spark import pack_into_shards, stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = stratified_sample(docs, 5, "lang", "doc_id", seed=0)
    per = s.groupBy("lang").count().toPandas()
    assert (per["count"] <= 5).all() and len(per) >= 2
    # partitioning-independent
    s2 = stratified_sample(docs.repartition(13), 5, "lang", "doc_id", seed=0)
    assert sorted(r.doc_id for r in s.collect()) == \
        sorted(r.doc_id for r in s2.collect())

    from fastfilter_spark.spark import sample_priority
    sized = docs.withColumn("n", (F.length("text") / 4).cast("long") + 1)
    packed = pack_into_shards(sized, "n", 500, "lang", "doc_id") \
        .withColumn("pri", sample_priority("doc_id", 0))
    pdf = packed.toPandas()
    # recompute the greedy packing in pandas over the SAME deterministic
    # order — shards must match exactly
    exp = pdf.sort_values(["lang", "pri", "doc_id"]).copy()
    exp["cum"] = exp.groupby("lang")["n"].cumsum()
    exp["exp_shard"] = ((exp["cum"] - exp["n"]) // 500).astype(int)
    assert (exp["shard"] == exp["exp_shard"]).all()


def test_mixture_sample_nested_and_partitioning_independent(spark):
    from fastfilter_spark.spark import mixture_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lo = mixture_sample(docs, "lang", {"en": 0.2}, "doc_id",
                        default_fraction=0.1)
    hi = mixture_sample(docs, "lang", {"en": 0.6}, "doc_id",
                        default_fraction=0.1)
    ids_lo = {r.doc_id for r in lo.select("doc_id").collect()}
    ids_hi = {r.doc_id for r in hi.select("doc_id").collect()}
    assert ids_lo <= ids_hi              # nested: raising a fraction only adds
    assert len(ids_hi) > len(ids_lo)
    # partitioning-independent
    again = mixture_sample(docs.repartition(11), "lang", {"en": 0.2},
                           "doc_id", default_fraction=0.1)
    assert {r.doc_id for r in again.select("doc_id").collect()} == ids_lo
    # rough rate sanity per group
    n_en = docs.where("lang = 'en'").count()
    k_en = lo.where("lang = 'en'").count()
    assert abs(k_en / n_en - 0.2) < 0.08
    import pytest as _pytest
    with _pytest.raises(ValueError, match="must be in"):
        mixture_sample(docs, "lang", {"en": 1.5}, "doc_id")


def test_register_sql_contains_udf(spark, corpus_df):
    """pf.register_sql exposes membership to SQL-only users: same
    zero-FN semantics as with_contains, NULL keys not members, and
    rows-mode filters (no numpy pid replica) are rejected."""
    import pytest as _pytest

    keys = keys_from_content(corpus_df, "content").cache()
    pf = build_partitioned_filter(keys, kind="bf16", num_partitions=8)
    name = pf.register_sql(spark, "ffsk_contains_t")
    keys.union(spark.createDataFrame([(None,)], "key long")) \
        .createOrReplaceTempView("probe_t")
    res = spark.sql(
        f"SELECT COUNT(*) AS n, "
        f"SUM(CASE WHEN {name}(key) THEN 1 ELSE 0 END) AS n_in, "
        f"SUM(CASE WHEN key IS NULL AND {name}(key) THEN 1 ELSE 0 END) "
        f"AS null_in FROM probe_t").collect()[0]
    assert res.n_in == res.n - 1          # all real keys in, zero FN
    assert res.null_in == 0               # NULL is never a member

    pf_rows = build_partitioned_filter(keys, kind="bf8", num_partitions=8,
                                       shuffle_mode="rows")
    with _pytest.raises(ValueError, match="xxhash_pmod"):
        pf_rows.register_sql(spark, "nope")


def test_epoch_shuffle(spark):
    from fastfilter_spark.spark import epoch_shuffle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    out = epoch_shuffle(docs, "doc_id", 8, seed=1)
    pdf = out.select("doc_id", "shard", "pos").toPandas()
    assert len(pdf) == n
    # a true permutation: (shard, pos) unique, pos contiguous per shard
    assert not pdf.duplicated(["shard", "pos"]).any()
    for _, g in pdf.groupby("shard"):
        assert sorted(g["pos"]) == list(range(1, len(g) + 1))
    assert pdf["shard"].between(0, 7).all()
    assert pdf["shard"].nunique() == 8
    # partitioning-independent determinism
    m1 = pdf.sort_values("doc_id").reset_index(drop=True)
    m2 = (epoch_shuffle(docs.repartition(13), "doc_id", 8, seed=1)
          .select("doc_id", "shard", "pos").toPandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert (m1[["shard", "pos"]].values == m2[["shard", "pos"]].values).all()
    # a different seed (epoch) is a different permutation
    m3 = (epoch_shuffle(docs, "doc_id", 8, seed=2)
          .select("doc_id", "shard", "pos").toPandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert (m1[["shard", "pos"]].values != m3[["shard", "pos"]].values).any()
    with pytest.raises(ValueError):
        epoch_shuffle(docs, "doc_id", 0)


def test_upsample(spark):
    from fastfilter_spark.spark import upsample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    # integral factor: exactly 2 copies per row, copy ids 0 and 1
    two = upsample(docs, F.lit(2.0), "doc_id", seed=1)
    assert two.count() == 2 * n
    assert (two.groupBy("doc_id").count().where("count != 2").count() == 0)
    assert {r.copy for r in two.select("copy").distinct().collect()} == {0, 1}
    # fractional factor: per-row copies in {floor, floor+1}, mean ≈ factor
    frac = upsample(docs, F.lit(2.5), "doc_id", seed=1)
    per = frac.groupBy("doc_id").count().toPandas()
    assert set(per["count"]) <= {2, 3}
    assert abs(per["count"].mean() - 2.5) < 0.25
    # factor < 1 downsamples: kept rows have exactly one copy
    down = upsample(docs, F.lit(0.4), "doc_id", seed=1)
    k = down.count()
    assert 0 < k < n and down.select("doc_id").distinct().count() == k
    # partitioning-independence: identical multiset after repartition
    a = sorted((r.doc_id, r.copy) for r in frac.collect())
    b = sorted((r.doc_id, r.copy) for r in
               upsample(docs.repartition(13), F.lit(2.5), "doc_id",
                        seed=1).collect())
    assert a == b
    # a different seed flips some fractional coins
    c = sorted((r.doc_id, r.copy) for r in
               upsample(docs, F.lit(2.5), "doc_id", seed=2).collect())
    assert a != c
    # NULL / zero / negative factors emit nothing
    assert upsample(docs, F.lit(None).cast("double"), "doc_id").count() == 0
    assert upsample(docs, F.lit(0.0), "doc_id").count() == 0
    assert upsample(docs, F.lit(-1.5), "doc_id").count() == 0


def test_upsample_null_ids_drop(spark):
    """NULL ids have no deterministic coin: zero copies, loudly
    documented — never a silent floor(factor) fallback."""
    from fastfilter_spark.spark import upsample
    df = spark.createDataFrame([(1,), (None,), (None,)], "id long")
    out = upsample(df, F.lit(2.5), "id", seed=1)
    assert out.where("id IS NULL").count() == 0
    assert out.where("id IS NOT NULL").count() in (2, 3)


def test_add_keys_null_keys_filtered(spark):
    """A NULL key in either side of add_keys must not poison a rebuilt
    partition: pyarrow would deliver int64-with-null as float64 and the
    uint64 reinterpretation garbles EVERY key of the touched pid —
    false negatives on previously-member keys. NULLs are filtered like
    the build path; result is byte-identical to the null-free merge."""
    from fastfilter_spark.spark import add_keys, build_partitioned_filter

    old = spark.range(2000).select(F.xxhash64("id").alias("key"))
    new_clean = spark.range(2000, 2400).select(
        F.xxhash64("id").alias("key"))
    new_dirty = new_clean.unionByName(
        spark.createDataFrame([(None,)], "key long"))
    pf = build_partitioned_filter(old, kind="bf8", num_partitions=8)
    merged_dirty = add_keys(pf, old, new_dirty)
    merged_clean = add_keys(pf, old, new_clean)
    assert merged_dirty.blobs == merged_clean.blobs
    # zero FN on the union
    union = old.unionByName(new_clean)
    assert (merged_dirty.with_contains(union, "key")
            .where("NOT contained").count() == 0)


def test_grouped_filter_for_nonstring_groups(spark):
    """Build renders group keys with Spark's cast-to-string; filter_for
    must find them for bool ('true' vs Python 'True') and float
    (Java scientific form vs Python repr) group values."""
    from fastfilter_spark.spark import build_grouped_filters

    df = spark.createDataFrame(
        [(True, 0.0000001, i) for i in range(50)]
        + [(False, 2.5, i) for i in range(50, 90)],
        "flag boolean, w double, id long") \
        .select("flag", "w", F.xxhash64("id").alias("key"))
    gf = build_grouped_filters(df, ["flag", "w"], "key")
    probe = gf.filter_for(True, 0.0000001)
    assert probe.contains(
        __import__("numpy").uint64(
            spark.createDataFrame([(0,)], "id long")
            .select(F.xxhash64("id")).collect()[0][0]
            & 0xFFFFFFFFFFFFFFFF)) in (True, __import__("numpy").True_)
    import pytest as _pt
    with _pt.raises(KeyError):
        gf.filter_for(True, 123.456)     # genuinely absent group


def test_probe_null_keys_no_corruption(spark):
    """One NULL in a probe batch degrades the int64 key column to
    float64 at the Arrow boundary — keys >2^53 lose bits and the
    batch's REAL members probe False. The JVM-side coalesce+mask must
    keep every true member contained (single-partition input forces
    the NULL into the same batch as real keys)."""
    from fastfilter_spark.spark import build_partitioned_filter

    keys = spark.range(5000).select(F.xxhash64("id").alias("key"))
    pf = build_partitioned_filter(keys, kind="bf8", num_partitions=8)
    dirty = keys.unionByName(
        spark.createDataFrame([(None,)], "key long")).coalesce(1)
    got = pf.with_contains(dirty, "key").toPandas()
    assert not got[got["key"].notna()]["contained"].eq(False).any()
    assert (got[got["key"].isna()]["contained"] == False).all()  # noqa: E712
    # SQL surface: same guard via the SQL-defined wrapper function
    pf.register_sql(spark, "ffsk_nulltest")
    dirty.createOrReplaceTempView("ffsk_nulltest_probe")
    row = spark.sql(
        "SELECT SUM(CASE WHEN ffsk_nulltest(key) THEN 1 ELSE 0 END) AS c "
        "FROM ffsk_nulltest_probe").collect()[0]
    assert row.c == 5000


def test_build_rejects_narrow_key_type(spark):
    """int32 keys would serialize 4 bytes into the packed chunks (the
    int64 frombuffer then fuses key pairs) and JVM xxhash64 hashes int
    with hashInt vs the numpy replica's hashLong — both silent
    corruption. The boundary guard must raise instead."""
    from fastfilter_spark.spark import build_partitioned_filter

    narrow = spark.range(100).select(F.col("id").cast("int").alias("key"))
    with pytest.raises(TypeError, match="bigint"):
        build_partitioned_filter(narrow, kind="bf8", num_partitions=4)
    wide = spark.range(100).select(F.xxhash64("id").alias("key"))
    pf = build_partitioned_filter(wide, kind="bf8", num_partitions=4)
    with pytest.raises(TypeError, match="bigint"):
        pf.with_contains(narrow, "key")


def test_packed_and_chunks_blobs_byte_identical(spark, corpus_df):
    """r6: the default "packed" mode became a bare-key exchange keyed on
    the pid expression (one Python pass; the old two-pass chunk-pack
    plan survives as shuffle_mode="chunks"). Both must produce
    byte-identical blobs and identical xxhash_pmod routing — every
    probe path (broadcast, sidecar, SQL, contains_local) depends on
    the per-pid key sets and seeds being plan-independent."""
    keys = keys_from_content(corpus_df, "content")
    for kind, kwargs in (("bf8", {}), ("xor8", {}),
                         ("bloom", {"bloom_n_expected": 10_000})):
        a = build_partitioned_filter(keys, kind=kind, num_partitions=8,
                                     **kwargs)
        b = build_partitioned_filter(keys, kind=kind, num_partitions=8,
                                     shuffle_mode="chunks", **kwargs)
        assert a.routing == b.routing == "xxhash_pmod"
        assert a.blobs == b.blobs
        assert a.n_keys == b.n_keys


def test_pid_token_placement_parity_with_spark(spark):
    """The r6 build exchange balances pid groups with pre-searched
    tokens whose Spark-murmur3 must land each group in ITS OWN
    partition. Pin the driver-side hash replica against Spark itself
    (a drift would only degrade balance, but the docstring promises a
    pinned parity — keep the promise): for several B, every token's
    pmod(hash(token), B) must equal its index, per Spark."""
    from pyspark.sql import functions as F

    from fastfilter_spark.spark.build import _pid_tokens

    for B in (1, 7, 8, 32, 100):
        toks = _pid_tokens(B)
        rows = (spark.createDataFrame(
                    [(i, t) for i, t in enumerate(toks)], "i int, t int")
                .select("i", F.pmod(F.hash("t"), F.lit(B)).alias("b"))
                .collect())
        assert all(r.b == r.i for r in rows), B
