"""Plan-hygiene audit: .explain("formatted") for the engine's core
query shapes + automated checks that the plans have the properties the
100TB design depends on:

  * parquet scans carry PushedFilters / pruned ReadSchema;
  * the filter-confirm join is a BroadcastHashJoin;
  * the filter build plans exactly ONE exchange and no sort;
  * aggregations show partial_ stages (map-side combine).

Usage: python tools/explain_plans.py [sf_dir]  (prints plans + PASS/FAIL)
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import (
        build_partitioned_filter, content_key, get_spark,
    )
    from fastfilter_spark.spark.keys import route_expr

    spark = get_spark("plans", cpus=8)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    checks = []

    # 1. projection+filter pushdown on the corpus scan
    q1 = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    p1 = plan_of(q1)
    checks.append(("scan pushdown: PushedFilters carries lang filter",
                   "PushedFilters" in p1 and "lang" in p1.split("PushedFilters")[1][:200]))
    rs1 = re.search(r"ReadSchema:.*", p1)
    checks.append(("scan pruning: ReadSchema excludes text",
                   rs1 is not None and "text" not in rs1.group(0)))

    # 2. build plan: the one exchange moves packed chunk rows, and the
    # raw key rows never shuffle (pack runs pre-exchange, map-side)
    keys = docs.select(content_key("text").alias("key"))
    from fastfilter_spark.spark.build import PARTIAL_SCHEMA
    from fastfilter_spark import workerside
    packed = (keys.withColumn("route", route_expr("key", 0))
              .mapInArrow(lambda it: workerside.pack_by_pid(it, 8),
                          "pid int, chunk binary"))
    build_df = packed.groupBy("pid").applyInArrow(
        lambda t: workerside.build_from_chunks(t, "bf8", 1, None),
        PARTIAL_SCHEMA)
    p2 = plan_of(build_df)
    checks.append(("build: exactly one Exchange (of packed chunks)",
                   len(re.findall(r"\(\d+\) Exchange", p2)) == 1))
    checks.append(("build: pack (MapInArrow) runs BELOW the exchange",
                   p2.find("MapInArrow") > p2.find("Exchange")))

    # 3. confirm join is broadcast
    en_keys = docs.where("lang = 'en'").select(content_key("text").alias("key"))
    pf = build_partitioned_filter(en_keys, kind="bf8", num_partitions=4)
    probe = docs.withColumn("key", content_key("text"))
    cand = pf.with_contains(probe, "key").where("contained")
    confirmed = cand.join(F.broadcast(en_keys.dropDuplicates()), "key", "left_semi")
    p3 = plan_of(confirmed)
    checks.append(("semi-join: BroadcastHashJoin planned",
                   "BroadcastHashJoin" in p3))

    # 4. aggregation shows partial (map-side) stage
    agg = docs.groupBy("lang").agg(F.count("*").alias("n"))
    p4 = plan_of(agg)
    checks.append(("agg: partial_count map-side combine", "partial_count" in p4))

    # 5. whole-stage codegen spans the key derivation
    p5 = plan_of(keys)
    checks.append(("key derivation inside WholeStageCodegen",
                   "codegen id" in p5))

    # 6. grouped build: one exchange (the groupBy), no extra sort of
    # key rows beyond the grouping requirement
    from fastfilter_spark.spark import build_grouped_filters  # noqa: F401
    from fastfilter_spark.spark.grouped import _GROUPED_SCHEMA, _gkey_expr
    gsrc = (docs.withColumn("key", content_key("text"))
            .select(_gkey_expr(["lang"]).alias("gkey"), "key"))
    gbuild = gsrc.groupBy("gkey").applyInArrow(
        lambda t: workerside.build_group_arrow(t, "bf8", 1, None),
        _GROUPED_SCHEMA)
    p6 = plan_of(gbuild)
    checks.append(("grouped build: exactly one Exchange",
                   len(re.findall(r"\(\d+\) Exchange", p6)) == 1))

    # 7. custom source scan: membership applied inside a BatchScan with
    # the comparison predicate consumed by pushFilters (no residual
    # Filter node for it above the scan)
    import tempfile
    from fastfilter_spark.spark.io import write_filter_sidecar
    from fastfilter_spark.sources import register_sources
    register_sources(spark)
    tmp = tempfile.mkdtemp(prefix="ffsk_plan_")
    write_filter_sidecar(pf, f"{tmp}/sidecar")
    probe.write.mode("overwrite").parquet(f"{tmp}/probe")
    src = (spark.read.format("ffsk_membership")
           .option("path", f"{tmp}/probe").option("sidecar", f"{tmp}/sidecar")
           .option("key_col", "key").load()
           .where(F.col("n_chars") > 100))
    p7 = plan_of(src)
    checks.append(("source: membership scan is a BatchScan (Python)",
                   "BatchScan ffsk_membership" in p7))
    checks.append(("source: comparison predicate pushed (no residual Filter)",
                   len(re.findall(r"\(\d+\) Filter", p7)) == 0))

    # 8. bucketed sink + co-located join: the SortMergeJoin reads both
    # bucketed tables directly — zero Exchange at or below the join
    # (the shuffle was paid once at write time)
    from fastfilter_spark.spark import write_bucketed
    write_bucketed(probe.select("lang", "key"), "ffsk_plan_docs_bkt", "key", 8)
    write_bucketed(en_keys.distinct(), "ffsk_plan_en_bkt", "key", 8)
    bjoin = (spark.table("ffsk_plan_docs_bkt").hint("merge")
             .join(spark.table("ffsk_plan_en_bkt"), "key"))
    p8 = plan_of(bjoin)
    checks.append(("bucketed join: SortMergeJoin over Bucketed: true scans",
                   "SortMergeJoin" in p8 and p8.count("Bucketed: true") == 2))
    checks.append(("bucketed join: ZERO Exchange anywhere in the join plan",
                   len(re.findall(r"\(\d+\) Exchange", p8)) == 0))

    # 9. hive-style partitioned sink → partition pruning: a lang filter
    # must prune directories at plan time (PartitionFilters), not scan
    # all partitions and filter rows
    import tempfile as _tf
    part_dir = _tf.mkdtemp(prefix="ffsk_part_") + "/docs_by_lang"
    docs.write.mode("overwrite").partitionBy("lang").parquet(part_dir)
    pq = (spark.read.parquet(part_dir)
          .where(F.col("lang") == "en").select("doc_id"))
    p9 = plan_of(pq)
    m9 = re.search(r"PartitionFilters: \[([^\]]*)\]", p9)
    checks.append(("partitioned sink: lang filter prunes partitions "
                   "(PartitionFilters, not row Filter)",
                   m9 is not None and "lang" in m9.group(1)))

    # 10. asof_join: exactly ONE exchange (on the key) — the union +
    # cumulative-window composition must not add extra shuffles
    from fastfilter_spark.spark import asof_join
    ev_p = docs.select(F.col("doc_id").alias("uid"),
                       F.col("n_chars").cast("double").alias("t"), "lang")
    ev_r = docs.select(F.col("doc_id").alias("uid"),
                       (F.col("n_chars") * 2).cast("double").alias("t"),
                       F.col("source").alias("rv"))
    p10 = plan_of(asof_join(ev_p, ev_r, "uid", "t"))
    checks.append(("asof join: exactly one Exchange (key shuffle only)",
                   len(re.findall(r"\(\d+\) Exchange", p10)) == 1))

    # 11. salted_join: the shuffle key is (join key, salt), not the key
    # alone — hot keys split across salt_n partitions. Disable broadcast
    # for the check: salting matters precisely when the dim is too big
    # to broadcast (a broadcast join has no skew problem to begin with).
    from fastfilter_spark.spark import salted_join
    dim = docs.select("lang").distinct()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p11 = plan_of(salted_join(docs, dim, "lang", salt_n=8))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    m11 = re.search(r"hashpartitioning\(([^)]*)\)", p11)
    checks.append(("salted join: shuffle on (key, salt)",
                   m11 is not None and "lang" in m11.group(1)
                   and "salt" in m11.group(1)))

    # 12. capped LSH candidates AT SCALE (sort-merge self-join; broadcast
    # disabled like check 11 — a broadcast join is the small-data plan):
    # the bucket-size-cap window partitions on the SAME (band, bh) key
    # the self-join shuffles on, so the window's exchange is REUSED as
    # the join-side exchange — the cap adds no Exchange beyond what the
    # uncapped SMJ plan already pays per side.
    from fastfilter_spark.pipeline import minhash_lsh_candidates
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p12u = plan_of(minhash_lsh_candidates(docs, "text", "doc_id",
                                              num_hashes=16, bands=8))
        p12c = plan_of(minhash_lsh_candidates(docs, "text", "doc_id",
                                              num_hashes=16, bands=8,
                                              max_bucket=64))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    n_ex_u = len(re.findall(r"\(\d+\) Exchange", p12u))
    n_ex_c = len(re.findall(r"\(\d+\) Exchange", p12c))
    checks.append(("capped LSH (SMJ shape): bucket cap adds no extra "
                   f"Exchange ({n_ex_u} uncapped vs {n_ex_c} capped)",
                   n_ex_c <= n_ex_u))

    # 13. sidecar local probe: for small sidecars contains_via_sidecar
    # takes the no-shuffle path (process-cached blobs, mapInArrow on the
    # input partitioning) — ZERO Exchange; the routed path (forced via
    # max_local_bytes=0) keeps its single pid-expression Exchange.
    import os
    import tempfile

    from fastfilter_spark.spark import build_filter_sidecar, contains_via_sidecar
    from fastfilter_spark.spark.keys import content_key
    sc13 = tempfile.mkdtemp(prefix="ffsk_plan_sc_") + "/sidecar"
    k13 = docs.select(content_key("text").alias("key"))
    build_filter_sidecar(k13, sc13, kind="bf8", num_partitions=8)
    p13l = plan_of(contains_via_sidecar(k13, sc13))
    p13r = plan_of(contains_via_sidecar(k13, sc13, max_local_bytes=0))
    checks.append(("sidecar probe: local path has ZERO Exchange",
                   "Exchange" not in p13l))
    checks.append(("sidecar probe: routed path shuffles on the pid expr",
                   len(re.findall(r"\(\d+\) Exchange", p13r)) == 1))
    import shutil as _shutil
    _shutil.rmtree(os.path.dirname(sc13), ignore_errors=True)

    # 14. q5_two_dim_filters: BOTH dimension-derived runtime filters
    # prune the fact BEFORE any join — the probes are Python/Arrow eval
    # nodes on the lineitem scan, every join is a broadcast of a slim
    # dim, and the FACT never shuffles: ≥2 probe nodes, zero
    # SortMergeJoin, and ≤3 Exchanges total, all of slim/aggregated
    # relations (the okeys DISTINCT on the dim side, the final
    # aggregation, the output sort).
    import __spark_entry__ as entry
    p14 = plan_of(entry.q_q5_two_dim_filters(spark, sf_dir))
    n_probe = len(re.findall(r"ArrowEvalPython|PythonUDF|MapInArrow", p14))
    n_ex14 = len(re.findall(r"\(\d+\) Exchange", p14))
    checks.append((f"q5: both runtime-filter probes in-plan ({n_probe} "
                   "probe nodes)", n_probe >= 2))
    # the 3 allowed Exchanges: the slim okeys DISTINCT (dim side), the
    # final aggregation, the output sort — none of them move the fact
    checks.append(("q5: fact never shuffles before the final agg "
                   f"({n_ex14} Exchanges — dim-distinct/agg/sort only, "
                   "no SortMergeJoin)",
                   n_ex14 <= 3 and "SortMergeJoin" not in p14))

    # 15. r3 operator plan-shape claims (CLAUDE.md checklist):
    # decontamination's exact confirm must broadcast the SMALL benchmark
    # shingle side; the packing/stratified windows must shuffle on the
    # GROUP column, never collapse to a single-partition global sort;
    # a connected-components propagation round shuffles only on the
    # vertex id (one aggregate exchange + the join exchanges on id/v —
    # no SortMergeJoin on a non-vertex key, no SinglePartition).
    from fastfilter_spark.pipeline import contamination_flags
    from fastfilter_spark.pipeline.graph import _large_star, _small_star
    from fastfilter_spark.spark import pack_into_shards, stratified_sample
    p15a = plan_of(contamination_flags(docs, docs.limit(20), "text",
                                       "doc_id", shingle_k=8))
    checks.append(("decontam: confirm join broadcasts the benchmark side",
                   "BroadcastHashJoin" in p15a
                   and "ArrowEvalPython" in p15a))
    docs_sz = docs.select("doc_id", "lang",
                          F.length("text").alias("n"))
    p15b = plan_of(pack_into_shards(docs_sz, "n", 1000, "lang", "doc_id"))
    p15c = plan_of(stratified_sample(docs, 5, "lang", "doc_id"))
    ok_window = all("SinglePartition" not in p
                    and "hashpartitioning(lang" in p
                    for p in (p15b, p15c))
    checks.append(("pack/stratified windows shuffle on the group column "
                   "(no single-partition global sort)", ok_window))
    from fastfilter_spark.pipeline import repetition_stats
    p15r = plan_of(repetition_stats(docs, "text", "doc_id"))
    rep_keys = set(re.findall(r"hashpartitioning\((\w+)", p15r))
    checks.append((f"repetition_stats: shuffles keyed on the doc id only "
                   f"({sorted(rep_keys)}, no SinglePartition)",
                   rep_keys <= {"id", "b"}
                   and "SinglePartition" not in p15r))
    from fastfilter_spark.spark import mixture_sample
    p15e = plan_of(mixture_sample(docs, "lang", {"en": 0.5}, "doc_id"))
    checks.append(("mixture_sample: fractions broadcast-joined, data "
                   "never shuffles",
                   "BroadcastHashJoin" in p15e
                   and len(re.findall(r"\(\d+\) Exchange", p15e)) == 0))
    e15 = docs.select((F.col("doc_id") + 50).alias("u"),
                      (F.col("doc_id") % 50).alias("v"))
    p15d = plan_of(_small_star(_large_star(e15)))
    part_keys = set(re.findall(r"hashpartitioning\((\w+)", p15d))
    checks.append((f"CC round (large-star∘small-star): exchanges keyed "
                   f"on vertex cols only ({sorted(part_keys)}, "
                   "no SinglePartition)",
                   part_keys <= {"u", "v"}
                   and "SinglePartition" not in p15d))

    # 16. lsh_topk candidate join AT SCALE (VERDICT r3 #1): same claim
    # as check 12 for the ANN path — the index/probe bucket caps are
    # count-windows partitioned on the (band, bh) join key, so under
    # the SMJ shape (broadcast disabled) they add no Exchange beyond
    # the uncapped plan's per-side join exchanges.
    from fastfilter_spark.pipeline import lsh_candidate_pairs
    emb16 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p16u = plan_of(lsh_candidate_pairs(emb16, "embedding", "vec_id",
                                           64, 8, 64, 42, None, 1, True))
        p16c = plan_of(lsh_candidate_pairs(emb16, "embedding", "vec_id",
                                           64, 8, 64, 42, 2000, 1, True))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    n16u = len(re.findall(r"\(\d+\) Exchange", p16u))
    n16c = len(re.findall(r"\(\d+\) Exchange", p16c))
    checks.append(("capped ANN-LSH (SMJ shape): bucket caps add no extra "
                   f"Exchange ({n16u} uncapped vs {n16c} capped)",
                   n16c <= n16u))

    # 17. the persisted IVF index: a probe's cell IN (...) predicate
    # must land as a PARTITION filter on the scan (whole cell
    # directories pruned at plan time — the disk-level nprobe/n_cells
    # read-reduction write_ivf_index exists for).
    import shutil
    import tempfile

    from fastfilter_spark.pipeline import ivf_topk_from_index, write_ivf_index
    ivf_tmp = tempfile.mkdtemp(prefix="ffsk_plans_ivf_")
    try:
        write_ivf_index(emb16, ivf_tmp + "/idx", n_cells=8)
        p17 = plan_of(ivf_topk_from_index(spark, ivf_tmp + "/idx",
                                          emb16.where("vec_id < 5"),
                                          k=3, nprobe=4))
    finally:
        shutil.rmtree(ivf_tmp, ignore_errors=True)
    checks.append(("IVF index probe: cell IN (...) is a PartitionFilter "
                   "(scan prunes cell directories)",
                   bool(re.search(r"PartitionFilters: \[[^\]]*cell", p17))))

    # 17b. the persisted IVF-PQ index: same partition pruning, AND the
    # probe scan's ReadSchema must carry only (vec_id, code) — the
    # m-bytes-per-vector compression claim is void if the scan still
    # decodes a float array column.
    from fastfilter_spark.pipeline import (ivfpq_topk_from_index,
                                           write_ivfpq_index)
    pq_tmp = tempfile.mkdtemp(prefix="ffsk_plans_ivfpq_")
    try:
        write_ivfpq_index(emb16, pq_tmp + "/idx", n_cells=8, m=8)
        p17b = plan_of(ivfpq_topk_from_index(spark, pq_tmp + "/idx",
                                             emb16.where("vec_id < 5"),
                                             k=3, nprobe=4))
    finally:
        shutil.rmtree(pq_tmp, ignore_errors=True)
    rs17b = re.search(r"ReadSchema[^\n]*", p17b)
    checks.append(("IVF-PQ index probe: cell PartitionFilter AND the scan "
                   "reads only vec_id+code (no float embedding column)",
                   bool(re.search(r"PartitionFilters: \[[^\]]*cell", p17b))
                   and rs17b is not None
                   and "code" in rs17b.group(0)
                   and "embedding" not in rs17b.group(0)))

    # 17c. the join-shaped bulk serve: queries shuffle to their probed
    # cells (one hash exchange per cogroup side + the top-k window's),
    # nothing broadcast is proportional to nq, and there is no
    # cartesian/nested-loop anywhere.
    from fastfilter_spark.pipeline import ivfpq_topk_joined
    pq_tmp2 = tempfile.mkdtemp(prefix="ffsk_plans_ivfpqj_")
    try:
        write_ivfpq_index(emb16, pq_tmp2 + "/idx", n_cells=8, m=8)
        p17c = plan_of(ivfpq_topk_joined(spark, pq_tmp2 + "/idx",
                                         emb16.where("vec_id < 5"),
                                         k=3, nprobe=4))
    finally:
        shutil.rmtree(pq_tmp2, ignore_errors=True)
    # formatted explain prints every node twice (tree + details), so
    # count numbered nodes, not raw token occurrences
    n17c = len(re.findall(r"\(\d+\) Exchange", p17c))
    checks.append(("IVF-PQ joined bulk serve: cogroup exchanges + window "
                   f"only ({n17c} Exchange ≤ 3), no cartesian",
                   n17c <= 3
                   and "CartesianProduct" not in p17c
                   and "BroadcastNestedLoopJoin" not in p17c))

    # 18. KLL range repartition: the claim is "range layout WITHOUT the
    # bound-sampling job" — the executed plan must contain a hash
    # exchange (on the carrier) and NO RangePartitioning anywhere, and
    # the bucket CASE tree must sit inside WholeStageCodegen.
    from fastfilter_spark.spark import (kll_partition_bounds,
                                        kll_range_repartition)
    vals = docs.select(F.length("text").cast("double").alias("v"))
    b18 = kll_partition_bounds(vals, "v", 8)
    p18 = plan_of(kll_range_repartition(vals, "v", 8, bounds=b18))
    checks.append(("KLL range repartition: no RangePartitioning/sampling "
                   "in plan (hash exchange on carriers only)",
                   "rangepartitioning" not in p18.lower()
                   and "hashpartitioning" in p18.lower()))
    checks.append(("KLL range repartition: single Exchange; bucket CASE "
                   "tree is a plain Project (codegen-eligible, no UDF)",
                   len(re.findall(r"\(\d+\) Exchange", p18)) == 1
                   and "CASE WHEN" in p18
                   and "pythonudf" not in p18.lower()))

    # 19. per-file skip index: the point lookup must (a) list ONLY the
    # index-matched files in its scan (file pruning is the operator),
    # (b) push the exact IN confirm into the scan, (c) add no Exchange.
    from fastfilter_spark.spark import build_file_skipping_index, pruned_lookup
    si_tmp = tempfile.mkdtemp(prefix="ffsk_plans_si_")
    try:
        (spark.range(80_000)
         .withColumn("pay", F.sha2(F.col("id").cast("string"), 256))
         .repartitionByRange(8, "id")
         .write.parquet(si_tmp + "/d"))
        build_file_skipping_index(spark, si_tmp + "/d", si_tmp + "/i",
                                  key="id")
        looked = pruned_lookup(spark, si_tmp + "/d", si_tmp + "/i",
                               [7, 70_009], "id")
        p19 = plan_of(looked)
        n_scan = len(looked.inputFiles())
        n_all = len(spark.read.parquet(si_tmp + "/d").inputFiles())
        checks.append((f"skip index: lookup scans a strict file subset "
                       f"({n_scan} of {n_all})", 0 < n_scan < n_all))
        checks.append(("skip index: exact IN confirm pushed into the "
                       "scan, zero Exchange",
                       "PushedFilters: [In(id" in p19
                       and not re.search(r"\(\d+\) Exchange", p19)))
    finally:
        shutil.rmtree(si_tmp, ignore_errors=True)

    # 20. sorted_write layout shape: partition-local Sort (global=false)
    # directly above the single carrier hash exchange — a global sort's
    # effect with no RangePartitioning (= no sampling job) anywhere.
    p20 = plan_of(kll_range_repartition(vals, "v", 8, bounds=b18,
                                        sort_within=True))
    checks.append(("sorted_write shape: local Sort over ONE hash "
                   "Exchange, no RangePartitioning",
                   "rangepartitioning" not in p20.lower()
                   and len(re.findall(r"\(\d+\) Exchange", p20)) == 1
                   and bool(re.search(r"Arguments: \[v#\d+ ASC NULLS "
                                      r"FIRST\], false", p20))))

    # 21. z-order layout shape: the Morton interleave must be plain
    # Catalyst arithmetic (shiftright inside a Project, no UDF), the
    # write plan one hash Exchange with a partition-local Sort, and no
    # RangePartitioning (= no sampling job) anywhere — same discipline
    # as sorted_write, now over the multi-column z-value.
    from fastfilter_spark.spark import (kll_range_repartition as _krr,
                                        range_bucket as _rb,
                                        zorder_bounds, zorder_key)
    zsrc = docs.select(F.length("text").cast("double").alias("v"),
                       (F.xxhash64("text") % 1000).alias("h"))
    zcb = zorder_bounds(zsrc, ["v", "h"], bits=4)
    zdf = zsrc.withColumn("__z", zorder_key(
        [_rb("v", zcb["v"]), _rb("h", zcb["h"])], 4))
    zb = [float(x) for x in range(0, 256, 32)][1:]
    p21 = plan_of(_krr(zdf, "__z", len(zb) + 1, bounds=zb,
                       sort_within=True).drop("__z"))
    checks.append(("z-order write shape: Morton interleave is plain "
                   "Catalyst (shiftright, no UDF), local Sort over ONE "
                   "hash Exchange, no RangePartitioning",
                   "shiftright" in p21
                   and "pythonudf" not in p21.lower()
                   and "rangepartitioning" not in p21.lower()
                   and len(re.findall(r"\(\d+\) Exchange", p21)) == 1
                   and bool(re.search(
                       r"Arguments: \[__z#\d+L? ASC NULLS FIRST\], false",
                       p21))))

    # 22. span-level dedup shape: the repeated-gram detection is one
    # hash join on the 8-byte xxhash64 gram key — all-Catalyst (no
    # Python UDF) and never a nested-loop/cartesian join, so the gram
    # relation shuffles exactly once per side at any corpus size.
    from fastfilter_spark.pipeline import dup_span_stats
    p22 = plan_of(dup_span_stats(docs, "text", "doc_id", g=8))
    checks.append(("span dedup: gram join is hash-keyed (xxhash64), "
                   "no cartesian/nested-loop, no Python UDF",
                   "xxhash64" in p22
                   and "CartesianProduct" not in p22
                   and "BroadcastNestedLoopJoin" not in p22
                   and "pythonudf" not in p22.lower()))

    # 23. keep_best_per_cluster: the representative pick is a scalar
    # two-phase min-struct aggregate (partial_min map-side combine) —
    # never a window sort over the cluster or a collect_list, so a
    # million-copy cluster costs one partial per task.
    from fastfilter_spark.pipeline import keep_best_per_cluster
    kb_pairs = docs.select(F.col("doc_id").alias("id_a"),
                           (F.col("doc_id") + 1).alias("id_b")).limit(50)
    p23 = plan_of(keep_best_per_cluster(
        docs.withColumn("sc", F.col("n_chars").cast("double")),
        kb_pairs, "doc_id", "sc"))
    checks.append(("keep_best: representative is a partial_min struct agg "
                   "(map-side combined, no window/collect over the cluster)",
                   "partial_min" in p23 and "collect_list" not in p23
                   and "row_number" not in p23))

    # 24. epoch_shuffle: ONE Exchange total (hash on shard — the
    # row_number window's), no RangePartitioning (= no sampling job),
    # and the sha256 shard/priority derivation is plain Catalyst inside
    # codegen (no Python UDF).
    from fastfilter_spark.spark import epoch_shuffle
    p24 = plan_of(epoch_shuffle(docs, "doc_id", 8, seed=1))
    checks.append(("epoch_shuffle: ONE hash Exchange on shard, no "
                   "RangePartitioning, no Python UDF",
                   len(re.findall(r"\(\d+\) Exchange", p24)) == 1
                   and "hashpartitioning(shard" in p24
                   and "rangepartitioning" not in p24.lower()
                   and "pythonudf" not in p24.lower()))

    # 25. upsample: pure narrow Catalyst — ZERO Exchange, no Python
    # UDF, the copy expansion is a plain explode(sequence) Generate.
    from fastfilter_spark.spark import upsample
    p25 = plan_of(upsample(docs, F.lit(1.7), "doc_id", seed=1))
    checks.append(("upsample: zero Exchange, Generate(explode) only, "
                   "no Python UDF",
                   "Exchange" not in p25 and "Generate" in p25
                   and "pythonudf" not in p25.lower()))

    # 26. hll_sliding: the raw input is scanned ONCE (the window overlap
    # is resolved on per-bucket blobs, never by re-aggregating raw rows
    # per end — a shared-subtree 'observed' join would double the scan),
    # and no nested-loop/cartesian join anywhere.
    from fastfilter_spark.spark import hll_sliding
    ev26 = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.floor(F.col("ts").cast("timestamp").cast("long") / 3600)
        .cast("long").alias("hb"),
        F.xxhash64("user_id").alias("key"))
    p26 = plan_of(hll_sliding(ev26, "hb", "key", window=6))
    checks.append(("hll_sliding: ONE raw scan (overlap resolved on "
                   "blobs), no nested-loop join",
                   len(re.findall(r"\(\d+\) Scan parquet", p26)) == 1
                   and "BroadcastNestedLoopJoin" not in p26
                   and "CartesianProduct" not in p26))

    # 27. mg_sliding (shared _sliding_merge tail): same single-raw-scan
    # contract as hll_sliding — trailing-window heavy hitters never
    # re-aggregate raw rows per end.
    from fastfilter_spark.spark import mg_sliding
    p27 = plan_of(mg_sliding(ev26, "hb", "key", window=6, k=32))
    checks.append(("mg_sliding: ONE raw scan, overlap on k-entry blobs",
                   len(re.findall(r"\(\d+\) Scan parquet", p27)) == 1
                   and "BroadcastNestedLoopJoin" not in p27
                   and "CartesianProduct" not in p27))

    # 28. semantic_dedup composition (VERDICT r4 #4): the one-call
    # pipeline must add NO exchange beyond its three components'
    # (pair edges + connected components + keep_best), and the
    # lsh-mode plan must never contain a cartesian.
    from fastfilter_spark.pipeline import (cosine_near_dups,
                                           keep_best_per_cluster,
                                           semantic_dedup)
    p28 = plan_of(semantic_dedup(emb16, threshold=0.5, method="lsh"))
    pairs28 = cosine_near_dups(emb16, threshold=0.5, method="lsh")
    p28_pairs = plan_of(pairs28)
    p28_keep = plan_of(keep_best_per_cluster(
        emb16.withColumn("s", F.lit(None).cast("double")),
        pairs28, "vec_id", "s"))
    n_ex = lambda p: len(re.findall(r"\bExchange\b", p))
    checks.append(("semantic_dedup: no Exchange beyond the three "
                   "components', no cartesian",
                   n_ex(p28) <= n_ex(p28_pairs) + n_ex(p28_keep)
                   and "CartesianProduct" not in p28
                   and "BroadcastNestedLoopJoin" not in p28))

    # 29. fork_candidates (repo-level set-MinHash LSH): the signature
    # build is ONE hash aggregate with map-side partial mins (no
    # per-repo materialization), and nothing in the candidate or
    # verify stage is an all-pairs product.
    from fastfilter_spark.pipeline import fork_candidates
    repos = docs.select(
        F.concat(F.lit("r"), (F.col("doc_id") % 20).cast("string"))
        .alias("repo"), content_key("text").alias("key"))
    p29 = plan_of(fork_candidates(repos, num_hashes=64, bands=16))
    checks.append(("fork_candidates: banded LSH + equi verify, "
                   "no cartesian/BNLJ anywhere",
                   "CartesianProduct" not in p29
                   and "BroadcastNestedLoopJoin" not in p29))
    checks.append(("fork_candidates: signature agg has map-side "
                   "partial_min", "partial_min" in p29))

    # 30. paragraph_dedup: the keep-first winner is a map-side-combined
    # min-struct aggregate (never a window over the full occurrence
    # list), and nothing in the dedup/reassembly is an all-pairs join.
    from fastfilter_spark.pipeline import paragraph_dedup
    p30 = plan_of(paragraph_dedup(
        docs.select("doc_id", F.replace(F.col("text"), F.lit(" "),
                                        F.lit("\n\n")).alias("text")),
        "text", "doc_id"))
    checks.append(("paragraph_dedup: keep-first via partial_min struct "
                   "agg, no cartesian/BNLJ, no Window",
                   "partial_min" in p30
                   and "CartesianProduct" not in p30
                   and "BroadcastNestedLoopJoin" not in p30
                   and "Window" not in p30))

    # 31. prepare_code_corpus composition: gates/license/redaction are
    # pure projection work (no exchange of their own); the only
    # aggregate is the dedup winner (map-side partial_min on the
    # collision-safe key), and nothing is a cartesian.
    from fastfilter_spark.pipeline import prepare_code_corpus
    p31 = plan_of(prepare_code_corpus(
        docs.select(F.col("doc_id").alias("id"), F.col("lang"),
                    F.col("text").alias("content")),
        min_alnum_frac=0.0))
    checks.append(("prepare_code_corpus: ONE aggregate (dedup winner, "
                   "partial_min + final), no cartesian/BNLJ",
                   "partial_min" in p31
                   # one two-phase agg = exactly 2 HashAggregate nodes
                   and len(re.findall(r"\(\d+\) HashAggregate", p31)) == 2
                   and "CartesianProduct" not in p31
                   and "BroadcastNestedLoopJoin" not in p31))

    # 32. gopher_quality: the published quality gate is ONE zero-shuffle
    # Catalyst projection — no Exchange, no aggregate, no Python UDF.
    from fastfilter_spark.pipeline import gopher_quality
    p32 = plan_of(gopher_quality(docs))
    checks.append(("gopher_quality: zero Exchange, zero aggregate, "
                   "no Python UDF",
                   "Exchange" not in p32
                   and "HashAggregate" not in p32
                   and "EvalPython" not in p32))

    # 33. c4_quality: line-level C4 cleaning is likewise ONE zero-
    # shuffle projection (nested higher-order line filters, no UDF).
    from fastfilter_spark.pipeline import c4_quality
    p33 = plan_of(c4_quality(docs))
    checks.append(("c4_quality: zero Exchange, zero aggregate, "
                   "no Python UDF",
                   "Exchange" not in p33
                   and "HashAggregate" not in p33
                   and "EvalPython" not in p33))

    # 34. r6 default packed build: ONE exchange moving ONLY the bare
    # 8-byte key (token-balanced pid placement computed map-side in
    # the partitioning expression; no route/pid column transits), the
    # builder MapInArrow directly above it, and no pre-exchange
    # Python pass (the chunk-pack mode pays one; it is checked as
    # shape #2 above).
    from fastfilter_spark.spark.build import (PARTIAL_SCHEMA as _PS,
                                              partials_dataframe)
    placed34 = (keys.withColumn("route", route_expr("key", 0)))
    p34 = plan_of(partials_dataframe(placed34, "bf8", 8, 0, 1, None,
                                     "packed"))
    ex34 = re.search(r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", p34)
    checks.append(("packed build r6: exactly one Exchange",
                   len(re.findall(r"\(\d+\) Exchange", p34)) == 1))
    checks.append(("packed build r6: exchange carries ONLY the bare key",
                   ex34 is not None and "," not in ex34.group(1)
                   and "key" in ex34.group(1)))
    checks.append(("packed build r6: no Python pass below the exchange "
                   "(builder MapInArrow is above it)",
                   "MapInArrow" in p34 and "Exchange" in p34
                   and p34.find("MapInArrow") < p34.find("Exchange")))

    # 35. r6 skip-index scan-stage build: when files are task-atomic
    # the per-file blob plan has ZERO exchanges — the groupBy(fid)
    # shuffle of every corpus row is gone.
    from fastfilter_spark import workerside as _ws
    placed35 = (docs.select(F.xxhash64(F.input_file_name()).alias("fid"),
                            content_key("text").alias("key"))
                .where(F.col("key").isNotNull()))
    p35 = plan_of(placed35.mapInArrow(
        lambda it: _ws.build_file_blobs_scan(it, "bf8", 1, {}),
        "file string, kind string, blob binary, n_keys long, "
        "keys_ingested long, bits_per_entry double"))
    checks.append(("skipindex r6: scan-stage build has ZERO Exchange",
                   "Exchange" not in p35))

    print(p2)
    print(p3[:3000])
    ok = True
    for name, passed in checks:
        print(("PASS" if passed else "FAIL"), "-", name)
        ok &= passed
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
