"""Sketch aggregation over Spark, cross-checked against Spark 4.1's
built-in sketch functions as *oracles* (BASELINE.md: hll_sketch_agg,
count_min_sketch, approx_percentile — our sketches are from scratch;
the built-ins only define the accuracy yardstick)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import cms_agg, cms_query, hll_agg, kll_agg, tdigest_agg
from fastfilter_spark.spark.keys import content_key


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.cache().count()
    return df


def test_hll_agg_vs_exact_and_builtin(spark, events):
    keyed = events.select("event_type", F.xxhash64("user_id").alias("key"))
    ours = {r.event_type: r.n_est
            for r in hll_agg(keyed, ["event_type"], "key").collect()}
    exact = {r.event_type: r.c for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("c")).collect()}
    builtin = {r.event_type: r.b for r in events.groupBy("event_type")
               .agg(F.approx_count_distinct("user_id").alias("b")).collect()}
    for et, ex in exact.items():
        assert abs(ours[et] - ex) / ex < 0.05
        # at least as close as the built-in's documented default (5%)
        assert abs(ours[et] - ex) <= max(abs(builtin[et] - ex) * 2, 0.05 * ex)


def test_hll_agg_global(spark, events):
    keyed = events.select(F.xxhash64("user_id").alias("key"))
    est = hll_agg(keyed, [], "key").collect()[0].n_est
    exact = events.select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.05


def test_cms_agg_and_query(spark, events):
    keyed = events.select(F.xxhash64("event_type").alias("key"))
    blob = cms_agg(keyed, [], "key", eps=1e-3, delta=0.01).collect()[0].sketch
    exact = {r.key: r.c for r in keyed.groupBy("key").agg(F.count("*").alias("c")).collect()}
    qdf = spark.createDataFrame([(k,) for k in exact], "key long")
    res = {r.key: r.cms_est for r in cms_query(spark, bytes(blob), qdf, "key").collect()}
    total = sum(exact.values())
    for k, ex in exact.items():
        assert res[k] >= ex
        assert res[k] <= ex + 1e-3 * total + 1


def test_kll_agg_vs_percentile(spark, events):
    r = kll_agg(events, [], "value", quantiles=[0.1, 0.5, 0.9]).collect()[0]
    exact = events.selectExpr(
        "percentile(value, array(0.1, 0.5, 0.9)) as p").collect()[0].p
    vals = events.select("value").toPandas()["value"].to_numpy()
    sv = np.sort(vals)
    for est, q in [(r.q_0_1, 0.1), (r.q_0_5, 0.5), (r.q_0_9, 0.9)]:
        rank = np.searchsorted(sv, est) / len(sv)
        assert abs(rank - q) < 0.03


def test_tdigest_agg_grouped(spark, events):
    rows = tdigest_agg(events, ["event_type"], "value",
                       quantiles=[0.5]).collect()
    pdf = events.select("event_type", "value").toPandas()
    for r in rows:
        grp = np.sort(pdf[pdf.event_type == r.event_type]["value"].to_numpy())
        rank = np.searchsorted(grp, r.q_0_5) / len(grp)
        assert abs(rank - 0.5) < 0.05, r.event_type


def test_sketch_agg_on_corpus_keys(spark, corpus_path):
    docs = spark.read.parquet(corpus_path)
    keyed = docs.select("lang", content_key("content").alias("key"))
    ours = {r.lang: r.n_est for r in hll_agg(keyed, ["lang"], "key").collect()}
    exact = {r.lang: r.c for r in docs.groupBy("lang")
             .agg(F.countDistinct("content").alias("c")).collect()}
    for lang, ex in exact.items():
        assert abs(ours[lang] - ex) / ex < 0.05


def test_mg_agg_heavy_hitters(spark, events):
    """Misra-Gries over Spark: deterministic two-sided bound vs exact
    per-key counts, guaranteed presence of every f > n/(k+1) key."""
    from fastfilter_spark.sketches import MisraGries
    from fastfilter_spark.spark import mg_agg

    keyed = events.select(F.xxhash64("event_type").alias("key"))
    row = mg_agg(keyed, [], "key", k=16).collect()[0]
    mg = MisraGries.from_bytes(bytes(row.sketch))
    exact = {r.key: r.c for r in keyed.groupBy("key")
             .agg(F.count("*").alias("c")).collect()}
    n = sum(exact.values())
    assert row.n_total == n and mg.deficit == row.deficit
    est = mg.query(np.array(list(exact), dtype=np.int64).view(np.uint64))
    for (x, f), c in zip(exact.items(), est):
        assert c <= f <= c + row.deficit
        if f > n / 17:
            assert c > 0


def test_sketch_aggs_ignore_null_keys(spark):
    """NULL keys must not be folded as key 0 — the Spark built-in
    aggregates ignore NULLs and the filter build path drops them."""
    from fastfilter_spark.spark import hll_agg, mg_agg, theta_agg

    df = spark.createDataFrame(
        [(i % 50,) for i in range(1000)] + [(None,)] * 500,
        "key long")
    exact = 50
    h = hll_agg(df, [], "key").collect()[0]
    assert abs(h.n_est - exact) / exact < 0.1
    t = theta_agg(df, [], "key").collect()[0]
    assert abs(t.n_est - exact) / exact < 0.1
    g = mg_agg(df, [], "key", k=64).collect()[0]
    assert g.n_total == 1000  # the 500 NULLs contribute nothing


def test_sketch_aggs_big_int64_keys_exact_despite_nulls(spark):
    """A batch containing any NULL used to demote the int64 key column
    to float64+NaN in pandas, ROUNDING keys >2^53 before the fold (e.g.
    123456789012345677 -> ...680) — so the same key hashed differently
    in null-free vs null-containing batches, and exact-key point queries
    missed. NULLs are now filtered JVM-side before Arrow transfer."""
    from fastfilter_spark.sketches import CountMinSketch
    from fastfilter_spark.spark import theta_agg

    BIG = 123456789012345677           # float64 rounds this to ...680
    rows = ([(BIG,)] * 40 + [(None,)] * 10 + [(BIG + 1,)] * 5
            + [(BIG + 2,)] * 5)        # BIG..BIG+2 all collide as float64
    df = spark.createDataFrame(rows, "key long").coalesce(1)

    c = cms_agg(df, [], "key").collect()[0]
    sk = CountMinSketch.from_bytes(bytes(c.sketch))
    got = int(sk.query(np.array([BIG], dtype=np.uint64))[0])
    assert got >= 40               # exact key present, not rounded away
    assert c.total == 50           # NULLs contribute nothing

    t = theta_agg(df, [], "key").collect()[0]
    assert t.n_est == 3.0          # BIG/BIG+1/BIG+2 stay distinct


def test_sketch_aggs_keep_all_null_groups(spark):
    """SQL GROUP BY keeps a group whose values are all NULL (count 0);
    the JVM-side null filter must not drop it. Also: a GLOBAL aggregate
    over an all-null (or empty) input yields exactly one row, like SQL."""
    from fastfilter_spark.spark import hll_agg, theta_agg

    df = spark.createDataFrame(
        [("en", 1), ("en", 2), ("de", None), ("de", None)],
        "lang string, v long").coalesce(1)
    res = hll_agg(df, ["lang"], "v").toPandas().set_index("lang")
    assert set(res.index) == {"en", "de"}
    assert res.loc["de", "n_est"] == 0.0
    assert res.loc["en", "n_est"] > 0

    allnull = spark.createDataFrame([(None,)] * 5, "v long")
    g = theta_agg(allnull, [], "v").collect()
    assert len(g) == 1 and g[0].n_est == 0.0

    c = cms_agg(allnull, [], "v").collect()
    assert len(c) == 1 and c[0].total == 0


def test_hll_sliding_merge_equals_direct(spark):
    """Register-max merging is lossless: the trailing-window estimate
    from per-bucket partials equals (EXACTLY) hll_agg run directly on
    the window's raw rows, for every window end."""
    import pyspark.sql.functions as F
    from fastfilter_spark.spark import hll_agg, hll_sliding

    df = (spark.range(5000)
          .select((F.col("id") % 10).cast("long").alias("b"),
                  F.xxhash64((F.col("id") * 37) % 1700).alias("key")))
    W = 3
    got = {r.bucket_end: r.n_est
           for r in hll_sliding(df, "b", "key", window=W).collect()}
    # covered ends: 0..9 observed buckets each cover b..b+2 → 0..11
    assert set(got) == set(range(0, 10 + W - 1))
    for end in range(0, 10 + W - 1):
        direct = (hll_agg(df.where((F.col("b") <= end)
                                   & (F.col("b") >= end - W + 1)),
                          [], "key").collect()[0].n_est)
        assert got[end] == direct, (end, got[end], direct)
    # window=1 degenerates to per-bucket hll_agg
    one = {r.bucket_end: r.n_est
           for r in hll_sliding(df, "b", "key", window=1).collect()}
    per = {r.b: r.n_est for r in hll_agg(df, ["b"], "key").collect()}
    assert one == per


def test_hll_sliding_accuracy_and_edges(spark):
    import pyspark.sql.functions as F
    from fastfilter_spark.spark import hll_sliding

    # planted cardinalities: bucket b holds users b*100 .. b*100+199
    # (so consecutive buckets overlap by 100 users)
    rows = [(b, u) for b in range(6) for u in range(b * 100, b * 100 + 200)]
    df = spark.createDataFrame(rows, "b long, u long") \
        .select("b", F.xxhash64("u").alias("key"))
    out = {r.bucket_end: r.n_est
           for r in hll_sliding(df, "b", "key", window=2).collect()}
    for end in range(1, 6):
        exact = 300  # 200 + 200 - 100 overlap
        assert abs(out[end] - exact) / exact < 0.05
    assert abs(out[0] - 200) / 200 < 0.05
    # NULL buckets are excluded entirely
    with_null = df.union(spark.createDataFrame(
        [(None, 1), (None, 2)], "b long, key long"))
    out2 = {r.bucket_end: r.n_est
            for r in hll_sliding(with_null, "b", "key", window=2).collect()}
    assert out2 == out
    import pytest as _pt
    with _pt.raises(ValueError, match="window"):
        hll_sliding(df, "b", "key", window=0)
    with _pt.raises(ValueError, match="integral"):
        hll_sliding(df.withColumn("b", F.col("b").cast("string")),
                    "b", "key", window=2)


def test_hll_sliding_narrow_bucket_type_widens(spark):
    """Window ends can exceed the input bucket type's max (tinyint 127,
    window 4 → end 130): bucket_end is always BIGINT so the Arrow cast
    can never overflow-crash."""
    import pyspark.sql.functions as F
    from fastfilter_spark.spark import hll_sliding

    df = (spark.createDataFrame([(126, 1), (127, 2), (127, 3)],
                                "b int, u long")
          .select(F.col("b").cast("tinyint").alias("b"),
                  F.xxhash64("u").alias("key")))
    out = hll_sliding(df, "b", "key", window=4)
    assert dict(out.dtypes)["bucket_end"] == "bigint"
    got = {r.bucket_end: r.n_est for r in out.collect()}
    assert set(got) == set(range(126, 131))    # ends reach 127+3
    # ends 128/129 cover both buckets (3 users); end 130 only 127 (2)
    assert round(got[128]) == round(got[129]) == 3
    assert round(got[130]) == 2


def test_mg_sliding_bounds_and_exact_totals(spark):
    """Trailing-window Misra-Gries: merged n_total is EXACT per window,
    the two-sided bound est <= f <= est+deficit holds for every key in
    every window, and the window=1 case matches per-bucket mg_agg."""
    import numpy as np
    import pyspark.sql.functions as F
    from fastfilter_spark.sketches import MisraGries
    from fastfilter_spark.spark import mg_agg, mg_sliding

    # planted zipf-ish stream: key j appears (10-j) times in bucket b
    rows = [(b, j) for b in range(6) for j in range(8)
            for _ in range(10 - j)]
    df = spark.createDataFrame(rows, "b long, k long") \
        .select("b", F.xxhash64("k").alias("key"), "k")
    W = 3
    sl = {r.bucket_end: r for r in
          mg_sliding(df, "b", "key", window=W, k=16).collect()}
    per_bucket_total = sum(10 - j for j in range(8))
    for end in range(0, 6 + W - 1):
        covered = [b for b in range(6) if b <= end <= b + W - 1]
        assert sl[end].n_total == per_bucket_total * len(covered)
        m = MisraGries.from_bytes(bytes(sl[end].sketch))
        for j in range(8):
            exact = (10 - j) * len(covered)
            kh = df.where(f"k = {j}").select("key").first().key
            est = int(m.query(np.array([kh], dtype=np.int64)
                              .view(np.uint64))[0])
            assert est <= exact <= est + sl[end].deficit, (end, j)
    one = {r.bucket_end: (r.n_total, r.deficit, bytes(r.sketch)) for r in
           mg_sliding(df, "b", "key", window=1, k=16).collect()}
    per = {r.b: (r.n_total, r.deficit, bytes(r.sketch)) for r in
           mg_agg(df, ["b"], "key", k=16).collect()}
    assert one == per
