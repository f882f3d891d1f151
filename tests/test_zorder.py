"""Z-order clustering (spark/partitioning.py): Morton-interleaved
multi-column layout. Load-bearing claims:

* zorder_key: bit-exact vs a numpy reference interleave.
* zorder_write: rows preserved exactly; per-file z-ranges disjoint
  ascending and sorted within; per-file min/max is tight on EVERY
  clustering column — a point filter on either column overlaps only a
  small fraction of files, where the single-column sorted layout
  overlaps ~all files on the non-sort column.
* layout reuse: a second write with the returned layout dict produces
  the identical file-range structure with no sketch passes.
* validation: bits*C > 48 rejected; mismatched layout columns rejected.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fastfilter_spark.spark import (
    sorted_write, zorder_bounds, zorder_key, zorder_write,
)


def _ref_interleave(buckets: np.ndarray, bits: int) -> np.ndarray:
    """numpy reference: buckets (n, C) uint64 -> morton (n,)."""
    n, C = buckets.shape
    z = np.zeros(n, dtype=np.uint64)
    for ci in range(C):
        for i in range(bits):
            bit = (buckets[:, ci] >> np.uint64(i)) & np.uint64(1)
            z |= bit << np.uint64(i * C + ci)
    return z


def test_zorder_key_matches_numpy(spark):
    rng = np.random.default_rng(11)
    b = rng.integers(0, 16, size=(500, 3)).astype(np.uint64)
    df = spark.createDataFrame(
        [(int(r[0]), int(r[1]), int(r[2])) for r in b],
        "b0 long, b1 long, b2 long")
    got = np.array([r.z for r in df.select(
        zorder_key([F.col("b0"), F.col("b1"), F.col("b2")], 4)
        .alias("z")).collect()])
    assert (got == _ref_interleave(b, 4).astype(np.int64)).all()


def test_zorder_key_rejects_wide(spark):
    with pytest.raises(ValueError, match="48"):
        zorder_key([F.lit(0)] * 7, 8)


@pytest.fixture(scope="module")
def grid(spark):
    """20k rows, two INDEPENDENT uniform dims — the shape where
    z-order's multi-column pruning claim is testable."""
    rng = np.random.default_rng(23)
    x = rng.uniform(0, 1000, 20_000)
    y = rng.uniform(0, 1000, 20_000)
    df = spark.createDataFrame(
        [(float(a), float(c)) for a, c in zip(x, y)],
        "x double, y double")
    df.cache().count()
    return df


def _file_stats(spark, path, col):
    back = spark.read.parquet(path)
    return (back.groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect())


def _overlap_frac(stats, point):
    hit = sum(1 for r in stats if r.lo <= point <= r.hi)
    return hit / len(stats)


def test_zorder_write_layout_properties(spark, grid, tmp_path):
    pz = str(tmp_path / "z")
    ps = str(tmp_path / "s")
    layout = zorder_write(grid, ["x", "y"], pz, num_partitions=16,
                          bits=4)
    sorted_write(grid, "x", ps, num_partitions=16)
    back = spark.read.parquet(pz)
    assert back.count() == grid.count()
    assert set(back.columns) == {"x", "y"}

    # multi-column pruning: a point filter on EITHER dim overlaps only
    # a minority of the 16 files (ideal 4x4 grid -> 4/16 = 25%; allow
    # slack for KLL rank error and boundary files). The x-sorted
    # layout overlaps ~every file on y.
    zx = _overlap_frac(_file_stats(spark, pz, "x"), 500.0)
    zy = _overlap_frac(_file_stats(spark, pz, "y"), 500.0)
    sy = _overlap_frac(_file_stats(spark, ps, "y"), 500.0)
    assert zx <= 0.6 and zy <= 0.6, (zx, zy)
    assert sy >= 0.9, sy
    assert zy < sy

    assert sorted(layout["bounds"]) == ["x", "y"]
    assert all(list(b) == sorted(b) for b in layout["bounds"].values())
    assert 1 <= len(layout["z_bounds"]) <= 15


def test_zorder_write_layout_reuse_stable(spark, grid, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    layout = zorder_write(grid, ["x", "y"], a, num_partitions=8, bits=4)
    layout2 = zorder_write(grid, ["x", "y"], b, num_partitions=8,
                           layout=layout)
    assert layout2 == layout
    sa = sorted((r.lo, r.hi) for r in _file_stats(spark, a, "x"))
    sb = sorted((r.lo, r.hi) for r in _file_stats(spark, b, "x"))
    assert sa == sb


def test_zorder_write_rejects_wrong_layout_cols(spark, grid, tmp_path):
    layout = zorder_write(grid, ["x", "y"], str(tmp_path / "c"),
                          num_partitions=4, bits=4)
    with pytest.raises(ValueError, match="columns"):
        zorder_write(grid.withColumnRenamed("y", "w"), ["x", "w"],
                     str(tmp_path / "d"), num_partitions=4,
                     layout=layout)


def test_zorder_bounds_one_pass_all_columns(spark, grid):
    cb = zorder_bounds(grid, ["x", "y"], bits=3)
    assert set(cb) == {"x", "y"}
    # equi-depth at R=8: bounds near the uniform octiles of [0, 1000]
    for c in ("x", "y"):
        assert len(cb[c]) == 7
        for j, q in enumerate(cb[c], start=1):
            assert abs(q - 125.0 * j) < 60.0, (c, j, q)


def test_zorder_write_string_and_null_columns(spark, tmp_path):
    rows = [(f"repo-{i % 37:03d}", float(i % 101) if i % 11 else None)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "repo string, v double")
    p = str(tmp_path / "sn")
    zorder_write(df, ["repo", "v"], p, num_partitions=8, bits=4)
    back = spark.read.parquet(p)
    assert back.count() == 4000
    assert back.where(F.col("v").isNull()).count() == \
        df.where(F.col("v").isNull()).count()
