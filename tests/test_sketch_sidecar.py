"""Resumable sketch sidecar (north_rule: sketch UDAFs resumable from
checkpoint with per-partition lineage + metrics). The load-bearing
properties, each asserted byte-for-byte where the design promises it:

* kill mid-build -> readers reject (no manifest); resume completes and
  the merged blob is IDENTICAL to an uninterrupted build — including
  for order-dependent KLL (the sorted-fold determinism claim).
* partitioning invariance: HLL/CMS/theta merged state is a pure
  function of the key multiset, so P=1 and P=32 builds produce
  byte-identical merged blobs.
* estimates within published bounds vs exact ground truth.
* lineage: per-pid rows sum to the non-null input row count.
* param-mismatch resume and wrong-typed columns fail loudly.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import (
    build_sketch_sidecar, read_sketch_sidecar, sketch_sidecar_lineage,
)
from fastfilter_spark.spark.keys import content_key


@pytest.fixture(scope="module")
def corpus(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def keyed(corpus):
    return corpus.select(content_key("content").alias("key"))


def test_hll_sidecar_estimate_and_lineage(spark, corpus, keyed, tmp_path):
    sc = str(tmp_path / "hll")
    m = build_sketch_sidecar(keyed, sc, kind="hll", col="key",
                             num_partitions=16, p=14)
    sk, m2 = read_sketch_sidecar(sc)
    assert m == m2 and m["rows_ingested"] == corpus.count()
    exact = corpus.select("content").distinct().count()
    assert abs(sk.estimate() - exact) / exact < 0.05
    lin = sketch_sidecar_lineage(spark, sc).collect()
    assert sum(r.n_rows for r in lin) == corpus.count()
    assert all(r.blob_bytes > 0 for r in lin)
    assert len(lin) == m["pids_built"] <= 16


def test_kill_resume_byte_identical_kll(spark, corpus, tmp_path):
    """The hard case: KLL folds are order-dependent, so resume
    byte-identity only holds because each pid sorts before folding."""
    vals = corpus.select(F.length("content").cast("double").alias("v"))
    one_shot = str(tmp_path / "one")
    build_sketch_sidecar(vals, one_shot, kind="kll", col="v",
                         num_partitions=8, batches=4, k=200)
    crashed = str(tmp_path / "crash")
    r = build_sketch_sidecar(vals, crashed, kind="kll", col="v",
                             num_partitions=8, batches=4, k=200,
                             _stop_after=2)
    assert r is None
    with pytest.raises(ValueError, match="incomplete or crashed"):
        read_sketch_sidecar(crashed)
    m = build_sketch_sidecar(vals, crashed, kind="kll", col="v",
                             num_partitions=8, batches=4, k=200,
                             resume=True)
    a, _ = read_sketch_sidecar(one_shot)
    b, m2 = read_sketch_sidecar(crashed)
    assert m == m2
    assert a.to_bytes() == b.to_bytes()
    exact = np.sort(np.array(
        [r.v for r in vals.collect()], dtype=np.float64))
    for q in (0.1, 0.5, 0.9):
        est = b.quantile(q)
        rank = np.searchsorted(exact, est) / len(exact)
        assert abs(rank - q) <= b.rank_error_bound() + 0.01


def test_partitioning_invariance_hll_cms_theta(spark, keyed, tmp_path):
    for kind, kw in (("hll", {"p": 12}), ("cms", {"eps": 1e-3}),
                     ("theta", {"k": 1024})):
        blobs = []
        for P in (1, 32):
            sc = str(tmp_path / f"{kind}_{P}")
            build_sketch_sidecar(keyed, sc, kind=kind, col="key",
                                 num_partitions=P, **kw)
            blobs.append(read_sketch_sidecar(sc)[0].to_bytes())
        assert blobs[0] == blobs[1], kind


def test_resume_param_mismatch_and_type_guard(spark, keyed, tmp_path):
    sc = str(tmp_path / "mm")
    build_sketch_sidecar(keyed, sc, kind="hll", col="key",
                         num_partitions=8, batches=2, _stop_after=1, p=12)
    with pytest.raises(ValueError, match="incompatible build params"):
        build_sketch_sidecar(keyed, sc, kind="hll", col="key",
                             num_partitions=8, batches=2, resume=True, p=14)
    with pytest.raises(ValueError, match="must be bigint"):
        build_sketch_sidecar(
            keyed.select(F.col("key").cast("string").alias("key")),
            str(tmp_path / "ty"), kind="hll", col="key")
    with pytest.raises(ValueError, match="unknown sketch kind"):
        build_sketch_sidecar(keyed, str(tmp_path / "uk"), kind="bf8")


def test_fresh_rebuild_drops_manifest_first(spark, keyed, tmp_path):
    """A fresh rebuild over a completed sidecar must not leave the old
    manifest visible next to new-generation partials."""
    import os
    sc = str(tmp_path / "re")
    build_sketch_sidecar(keyed, sc, kind="hll", col="key",
                         num_partitions=8, p=12)
    # rebuild with different geometry, crash before any batch commits
    r = build_sketch_sidecar(keyed, sc, kind="hll", col="key",
                             num_partitions=16, p=12, batches=2,
                             _stop_after=0)
    assert r is None
    assert not os.path.exists(os.path.join(sc, "sketch_manifest.json"))
    with pytest.raises(ValueError, match="incomplete or crashed"):
        read_sketch_sidecar(sc)


def test_empty_and_all_null_inputs(spark, tmp_path):
    df = spark.createDataFrame(
        [(None,), (None,)], "key long")
    sc = str(tmp_path / "nulls")
    m = build_sketch_sidecar(df, sc, kind="hll", col="key",
                             num_partitions=4, p=12)
    assert m["rows_ingested"] == 0 and m["pids_built"] == 0
    sk, _ = read_sketch_sidecar(sc)
    assert sk.estimate() == 0.0


# ---------------------------------------------------------------------------
# review-fix regressions (r4): decimal guard, NaN lineage, resume read
# failures abort instead of double-folding
# ---------------------------------------------------------------------------

def test_decimal_column_accepted(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").cast("decimal(12,2)").alias("v"))
    sc = str(tmp_path / "dec")
    m = build_sketch_sidecar(df, sc, kind="kll", col="v",
                             num_partitions=4, k=200)
    assert m["rows_ingested"] == 100
    sk, _ = read_sketch_sidecar(sc)
    assert 30 <= sk.quantile(0.5) <= 70


def test_nan_rows_excluded_from_lineage(spark, tmp_path):
    """NaN is not NULL in Spark: the ingest filter must drop it so that
    sum(lineage.n_rows) == rows actually folded (the conservation
    invariant the lineage audit rests on)."""
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame(
        {"v": [1.0, 2.0, float("nan"), 3.0, float("nan")]}))
    sc = str(tmp_path / "nan")
    m = build_sketch_sidecar(df, sc, kind="kll", col="v",
                             num_partitions=2, k=200)
    assert m["rows_ingested"] == 3
    lin = sketch_sidecar_lineage(spark, sc).collect()
    assert sum(r.n_rows for r in lin) == 3


def test_resume_read_failure_aborts_not_duplicates(spark, keyed, tmp_path):
    """A corrupt committed partial must abort the resume (and the final
    manifest aggregation), never be treated as 'nothing committed yet' —
    that would re-append every pid and double-fold the merge."""
    import os
    sc = str(tmp_path / "corrupt")
    build_sketch_sidecar(keyed, sc, kind="cms", col="key",
                         num_partitions=8, batches=2, _stop_after=1,
                         eps=1e-3, delta=0.01)
    parts = os.path.join(sc, "partials.parquet")
    part = next(f for f in sorted(os.listdir(parts))
                if f.startswith("part-"))
    with open(os.path.join(parts, part), "wb") as fh:
        fh.write(b"not a parquet file")
    with pytest.raises(Exception):
        build_sketch_sidecar(keyed, sc, kind="cms", col="key",
                             num_partitions=8, batches=2, resume=True,
                             eps=1e-3, delta=0.01)
    # no manifest was committed over the corrupt state
    assert not os.path.exists(os.path.join(sc, "sketch_manifest.json"))

