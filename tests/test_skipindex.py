"""Per-file data-skipping index (spark/skipindex.py). Load-bearing
claims:

* pruned_lookup is ROW-IDENTICAL to the full scan (zero false
  negatives — the filter guarantee lifted to file granularity), for
  present keys, absent keys, and mixed sets.
* pruning actually prunes: on a range-clustered 8-file layout a
  single-key probe matches ~1 file (FP-rate extra files bounded).
* empty probe set -> no files, schema-preserved empty result.
* readers refuse a manifest-less (crashed) index.
* rebuilds are byte-identical (deterministic per-file seeds).
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import (
    build_file_skipping_index, prune_files, pruned_lookup,
    read_skipping_manifest, skip_stats,
)

N = 80_000
FILES = 8


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """8 parquet files, each a contiguous id range (the clustered
    layout where file-level skipping pays)."""
    p = str(tmp_path_factory.mktemp("skip") / "data.parquet")
    (spark.range(N)
     .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
     .repartitionByRange(FILES, "id")
     .write.mode("overwrite").parquet(p))
    return p


@pytest.fixture(scope="module")
def index(spark, clustered, tmp_path_factory):
    ip = str(tmp_path_factory.mktemp("skip") / "index")
    m = build_file_skipping_index(spark, clustered, ip, key="id")
    assert m["n_keys"] == N and m["n_files"] == FILES
    return ip


def test_lookup_identical_to_full_scan(spark, clustered, index):
    rng = np.random.default_rng(7)
    present = rng.choice(N, size=50, replace=False).astype(np.int64)
    absent = (rng.integers(N, 2 * N, size=50)).astype(np.int64)
    keys = np.concatenate([present, absent])
    got = (pruned_lookup(spark, clustered, index, keys, "id")
           .select("id").toPandas()["id"].sort_values().to_numpy())
    assert np.array_equal(got, np.sort(present))


def test_pruning_touches_few_files(spark, clustered, index):
    files = prune_files(spark, index, [42])
    # the owning file always matches; bf8 FPs can add a stray file
    assert 1 <= len(files) <= 3
    st = skip_stats(spark, index, [42])
    assert st["files_total"] == FILES
    assert st["files_matched"] == len(files)
    assert st["keys_indexed"] == N


def test_absent_keys_may_prune_everything(spark, clustered, index):
    files = prune_files(spark, index, [10 * N + 1])
    assert len(files) <= 2   # 0 expected; FP can add one
    out = pruned_lookup(spark, clustered, index, [10 * N + 1], "id")
    assert out.count() == 0
    assert set(out.columns) == {"id", "payload"}


def test_empty_probe_set(spark, clustered, index):
    assert prune_files(spark, index, []) == []
    out = pruned_lookup(spark, clustered, index, [], "id")
    assert out.count() == 0
    assert set(out.columns) == {"id", "payload"}


def test_manifestless_index_refused(spark, clustered, index, tmp_path):
    import shutil
    broken = str(tmp_path / "broken")
    shutil.copytree(index, broken)
    os.remove(os.path.join(broken, "skipindex_manifest.json"))
    with pytest.raises(ValueError, match="incomplete or crashed"):
        prune_files(spark, broken, [1])
    with pytest.raises(ValueError, match="incomplete or crashed"):
        read_skipping_manifest(broken)


def test_rebuild_byte_identical(spark, clustered, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_file_skipping_index(spark, clustered, a, key="id")
    build_file_skipping_index(spark, clustered, b, key="id")
    pa_ = (spark.read.parquet(os.path.join(a, "files.parquet"))
           .orderBy("file").select("file", "blob").collect())
    pb_ = (spark.read.parquet(os.path.join(b, "files.parquet"))
           .orderBy("file").select("file", "blob").collect())
    assert [(r.file, bytes(r.blob)) for r in pa_] == \
           [(r.file, bytes(r.blob)) for r in pb_]


def test_key_expression_and_scan_subset(spark, clustered, index):
    """pruned_lookup's scan inputFiles must be a strict subset of the
    full scan's (the whole point: fewer files listed, fewer read)."""
    full = set(spark.read.parquet(clustered).inputFiles())
    out = pruned_lookup(spark, clustered, index, [7, 9], "id")
    scanned = set(out.inputFiles())
    assert scanned and scanned < full
    assert sorted(r.id for r in out.select("id").collect()) == [7, 9]


# ---------------------------------------------------------------------------
# incremental maintenance
# ---------------------------------------------------------------------------

def test_incremental_update_appends_only_new_files(spark, tmp_path):
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    (spark.range(0, 40_000).repartitionByRange(4, "id")
     .write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    m0 = build_file_skipping_index(spark, data, idx, key="id")
    assert m0["n_files"] == 4
    before = {r.file: bytes(r.blob) for r in spark.read.parquet(
        os.path.join(idx, "files.parquet")).collect()}
    # append two more files of new ids
    (spark.range(40_000, 60_000).repartitionByRange(2, "id")
     .write.mode("append").parquet(data))
    m1 = update_file_skipping_index(spark, data, idx, key="id")
    assert m1["n_files"] == 6 and m1["n_keys"] == 60_000
    after = {r.file: bytes(r.blob) for r in spark.read.parquet(
        os.path.join(idx, "files.parquet")).collect()}
    # old blobs byte-untouched; exactly two new rows
    for f, blob in before.items():
        assert after[f] == blob
    assert len(after) == 6
    # lookups exact across both generations
    got = sorted(r.id for r in pruned_lookup(
        spark, data, idx, [5, 41_000, 59_999], "id").collect())
    assert got == [5, 41_000, 59_999]


def test_incremental_update_noop(spark, tmp_path):
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    (spark.range(1000).repartitionByRange(2, "id")
     .write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    m0 = build_file_skipping_index(spark, data, idx, key="id")
    m1 = update_file_skipping_index(spark, data, idx, key="id")
    assert m1 == m0


def test_incremental_update_drops_orphans(spark, tmp_path):
    import glob
    import shutil
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    (spark.range(0, 30_000).repartitionByRange(3, "id")
     .write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    build_file_skipping_index(spark, data, idx, key="id")
    # delete the file holding the lowest ids
    parts = sorted(glob.glob(os.path.join(data, "part-*")))
    victim_ids = sorted(r.id for r in spark.read.parquet(
        "file://" + parts[0]).select("id").limit(3).collect())
    os.remove(parts[0])
    m = update_file_skipping_index(spark, data, idx, key="id")
    assert m["n_files"] == 2
    # the orphan file is no longer in the index nor scanned
    assert prune_files(spark, idx, victim_ids) == [] or all(
        parts[0] not in f for f in prune_files(spark, idx, victim_ids))
    remaining = sorted(r.id for r in spark.read.parquet(data)
                       .select("id").collect())
    probe = [remaining[0], remaining[-1]]
    got = sorted(r.id for r in pruned_lookup(
        spark, data, idx, probe, "id").collect())
    assert got == probe


def test_all_null_key_files_indexed_empty(spark, tmp_path):
    """Files with no non-NULL keys still get an (empty-filter, 0) row —
    otherwise every update would rebuild them forever."""
    import pandas as pd
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    df = spark.createDataFrame(
        pd.DataFrame({"id": [None] * 100})).withColumn(
        "id", F.col("id").cast("long"))
    df.coalesce(1).write.mode("overwrite").parquet(data)
    idx = str(tmp_path / "idx")
    m = build_file_skipping_index(spark, data, idx, key="id")
    assert m["n_files"] == 1 and m["n_keys"] == 0
    # noop update: nothing to rebuild
    assert update_file_skipping_index(spark, data, idx, key="id") == m
    assert prune_files(spark, idx, [1, 2, 3]) == []


def test_update_rejects_mismatched_key(spark, tmp_path):
    """A mismatched key expression must be refused via the manifest's
    key_repr fingerprint — blobs built over a different column would
    silently produce false negatives."""
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    (spark.range(1000).withColumn("other", F.col("id") + 1)
     .repartitionByRange(2, "id").write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    build_file_skipping_index(spark, data, idx, key="id")
    with pytest.raises(ValueError, match="does not match"):
        update_file_skipping_index(spark, data, idx, key="other")
    # escape hatch for verified cross-version repr drift: the accepted
    # key is re-recorded even on a quiescent corpus (no blob work), so
    # the NEXT unflagged update with the same key passes
    m = update_file_skipping_index(spark, data, idx, key="other",
                                   allow_key_mismatch=True)
    assert m["n_files"] == 2
    assert read_skipping_manifest(idx)["key_repr"] == m["key_repr"]
    m2 = update_file_skipping_index(spark, data, idx, key="other")
    assert m2 == m
    with pytest.raises(ValueError, match="does not match"):
        update_file_skipping_index(spark, data, idx, key="id")


def test_pruned_lookup_keeps_partition_columns(spark, tmp_path):
    """basePath on the per-file read keeps hive partition columns
    resolvable — without it the pruned result is not row-identical to
    the full scan (and the two branches disagree on schema)."""
    data = str(tmp_path / "data")
    (spark.range(2000)
     .withColumn("lang", F.when(F.col("id") % 2 == 0, F.lit("en"))
                 .otherwise(F.lit("de")))
     .write.partitionBy("lang").mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    build_file_skipping_index(spark, data, idx, key="id")
    out = pruned_lookup(spark, data, idx, [10, 11], "id")
    assert {(r.id, r.lang) for r in out.select("id", "lang").collect()} \
        == {(10, "en"), (11, "de")}


def test_orphan_update_swaps_generation_never_deletes_manifest(
        spark, tmp_path):
    """Orphan removal commits by atomically repointing files_dir at a
    new generation dir; the manifest exists (and the index stays
    readable) at every step, and repeated orphan rounds bump the
    generation."""
    import glob
    from fastfilter_spark.spark import update_file_skipping_index
    data = str(tmp_path / "data")
    (spark.range(0, 30_000).repartitionByRange(3, "id")
     .write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    build_file_skipping_index(spark, data, idx, key="id")
    parts = sorted(glob.glob(os.path.join(data, "part-*")))
    os.remove(parts[0])
    m1 = update_file_skipping_index(spark, data, idx, key="id")
    assert m1["files_dir"] == "files.parquet.g1"
    assert os.path.isdir(os.path.join(idx, "files.parquet.g1"))
    # the superseded generation survives the commit (grace period for
    # in-flight readers); the NEXT update's start-of-run sweep takes it
    assert os.path.isdir(os.path.join(idx, "files.parquet"))
    assert read_skipping_manifest(idx) == m1   # never deleted
    os.remove(parts[1])
    m2 = update_file_skipping_index(spark, data, idx, key="id")
    assert m2["files_dir"] == "files.parquet.g2"
    assert not os.path.exists(os.path.join(idx, "files.parquet"))  # swept
    assert os.path.isdir(os.path.join(idx, "files.parquet.g1"))  # grace
    assert os.path.isdir(os.path.join(idx, "files.parquet.g2"))
    remaining = sorted(r.id for r in spark.read.parquet(data)
                       .select("id").collect())
    probe = [remaining[0], remaining[-1]]
    got = sorted(r.id for r in pruned_lookup(
        spark, data, idx, probe, "id").collect())
    assert got == probe


def test_lookup_ignores_files_deleted_after_indexing(spark, tmp_path):
    """The orphan window: a corpus file deleted AFTER indexing may
    still match in the index; the lookup must skip it (the full scan
    of the current corpus would not read it either), not crash."""
    import glob
    data = str(tmp_path / "data")
    (spark.range(0, 20_000).repartitionByRange(2, "id")
     .write.mode("overwrite").parquet(data))
    idx = str(tmp_path / "idx")
    build_file_skipping_index(spark, data, idx, key="id")
    parts = sorted(glob.glob(os.path.join(data, "part-*")))
    low = sorted(r.id for r in spark.read.parquet(
        "file://" + parts[0]).select("id").limit(1).collect())
    os.remove(parts[0])
    surviving = sorted(r.id for r in spark.read.parquet(data)
                       .select("id").collect())
    # key in the deleted file: matched, skipped, zero rows
    assert pruned_lookup(spark, data, idx, low, "id").count() == 0
    # key in a surviving file still found even if the deleted file
    # also matched (FP or shared prune set)
    got = [r.id for r in pruned_lookup(
        spark, data, idx, [surviving[0]], "id").collect()]
    assert got == [surviving[0]]


def test_shared_prune_matches_fresh_prune(spark, clustered, index):
    """skip_stats(matched=...) and pruned_lookup(files=...) reuse one
    prune_files result — identical to recomputing."""
    keys = [7, 42, 99_999_999]
    matched = prune_files(spark, index, keys)
    st = skip_stats(spark, index, keys, matched=matched)
    assert st["files_matched"] == len(matched)
    a = sorted(r.id for r in pruned_lookup(
        spark, clustered, index, keys, "id", files=matched).collect())
    b = sorted(r.id for r in pruned_lookup(
        spark, clustered, index, keys, "id").collect())
    assert a == b == [7, 42]


def test_scan_and_grouped_builds_byte_identical(spark, tmp_path):
    """r6: the zero-shuffle scan-stage build (task-atomic files) must
    produce byte-identical blobs to the grouped fallback — seeds
    derive from the file name, so the physical plan must not leak
    into the index."""
    from pyspark.sql import functions as F

    from fastfilter_spark.spark import build_file_skipping_index
    from fastfilter_spark.spark import skipindex as si

    data = str(tmp_path / "data.parquet")
    (spark.range(0, 50_000, 1, 4)
     .select(F.xxhash64("id").alias("key"))
     .repartitionByRange(4, "key")
     .write.mode("overwrite").parquet(data))

    # the fixture must actually take the scan-stage path, or this
    # test degenerates to grouped-vs-grouped (review finding)
    df = spark.read.parquet(data)
    assert si._files_task_atomic(spark, df.inputFiles())

    idx_a = str(tmp_path / "idx_scan")
    m_a = build_file_skipping_index(spark, data, idx_a, key="key")
    # force the grouped path by disabling the atomicity gate
    orig = si._files_task_atomic
    si._files_task_atomic = lambda *_: False
    try:
        idx_b = str(tmp_path / "idx_grouped")
        m_b = build_file_skipping_index(spark, data, idx_b, key="key")
    finally:
        si._files_task_atomic = orig

    import pyarrow.parquet as pq
    a = (pq.read_table(f"{idx_a}/files.parquet").to_pandas()
         .sort_values("file").reset_index(drop=True))
    b = (pq.read_table(f"{idx_b}/files.parquet").to_pandas()
         .sort_values("file").reset_index(drop=True))
    assert list(a["file"]) == list(b["file"])
    assert all(bytes(x) == bytes(y) for x, y in zip(a["blob"], b["blob"]))
    assert m_a["n_keys"] == m_b["n_keys"] == 50_000
