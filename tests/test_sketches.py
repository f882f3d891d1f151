"""Sketch accuracy vs published error bounds + merge associativity
(FIXTURES.md F4; bounds per BASELINE.md)."""

import numpy as np
import pytest

from fastfilter_spark.sketches import CountMinSketch, HyperLogLog, KLLSketch, TDigest


# ---- HLL ---------------------------------------------------------------------

@pytest.mark.parametrize("true_n", [10, 1_000, 100_000, 1_000_000])
def test_hll_error_bound(true_n):
    rng = np.random.default_rng(true_n)
    keys = np.unique(rng.integers(0, 2**64, size=true_n, dtype=np.uint64))
    h = HyperLogLog(14).add(keys)
    err = abs(h.estimate() - len(keys)) / len(keys)
    assert err < max(4 * h.rel_std_error(), 0.02)


def test_hll_merge_exact_associativity():
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 2**64, size=30_000, dtype=np.uint64)
    parts = np.array_split(keys, 7)
    whole = HyperLogLog(12).add(keys)
    left = HyperLogLog(12)
    for p in parts:
        left = left.merge(HyperLogLog(12).add(p))
    right = HyperLogLog(12)
    for p in reversed(parts):
        right = HyperLogLog(12).add(p).merge(right)
    assert (left.registers == whole.registers).all()
    assert (right.registers == whole.registers).all()


def test_hll_serde():
    h = HyperLogLog(10).add(np.arange(1000, dtype=np.uint64))
    assert HyperLogLog.from_bytes(h.to_bytes()).estimate() == h.estimate()


# ---- CMS ---------------------------------------------------------------------

def test_cms_never_undercounts_and_bound():
    rng = np.random.default_rng(11)
    stream = rng.zipf(1.3, size=300_000)
    stream = stream[stream < 50_000].astype(np.uint64)
    c = CountMinSketch(eps=1e-4, delta=0.01).add(stream)
    uniq, cnt = np.unique(stream, return_counts=True)
    est = c.query(uniq)
    assert (est >= cnt).all()
    assert ((est - cnt) > c.eps * c.total).mean() <= c.delta


def test_cms_merge_exact():
    rng = np.random.default_rng(12)
    s = rng.integers(0, 1000, size=50_000).astype(np.uint64)
    parts = np.array_split(s, 5)
    whole = CountMinSketch(1e-3, 0.01).add(s)
    acc = CountMinSketch(1e-3, 0.01)
    for p in parts:
        acc = acc.merge(CountMinSketch(1e-3, 0.01).add(p))
    assert (acc.table == whole.table).all()
    assert acc.total == whole.total


def test_cms_weighted_add():
    c = CountMinSketch(1e-3, 0.01)
    c.add(np.array([7], dtype=np.uint64), np.array([100]))
    assert c.query(np.array([7], dtype=np.uint64))[0] >= 100


# ---- KLL ---------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["uniform", "lognormal", "constant"])
def test_kll_rank_error(dist):
    rng = np.random.default_rng(13)
    n = 200_000
    vals = {"uniform": rng.uniform(0, 1, n),
            "lognormal": rng.lognormal(0, 2, n),
            "constant": np.full(n, 3.14)}[dist]
    k = KLLSketch(200).add(vals)
    sv = np.sort(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = k.quantile(q)
        r = np.searchsorted(sv, est, side="left") / n
        assert abs(r - q) < 2.5 * k.rank_error_bound() or sv[0] == sv[-1]


def test_kll_merge_within_bound():
    rng = np.random.default_rng(14)
    vals = rng.normal(0, 1, 150_000)
    parts = np.array_split(vals, 8)
    acc = KLLSketch(200)
    for p in parts:
        acc = acc.merge(KLLSketch(200).add(p))
    sv = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        r = np.searchsorted(sv, acc.quantile(q)) / len(sv)
        assert abs(r - q) < 4 * acc.rank_error_bound()


def test_kll_serde():
    k = KLLSketch(128).add(np.arange(10_000, dtype=float))
    k2 = KLLSketch.from_bytes(k.to_bytes())
    assert k2.quantile(0.5) == k.quantile(0.5)
    assert k2.n == k.n


# ---- t-digest ------------------------------------------------------------------

def test_tdigest_tail_accuracy():
    rng = np.random.default_rng(15)
    vals = rng.lognormal(1, 1.5, 200_000)
    td = TDigest(200).add(vals)
    sv = np.sort(vals)
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        r = np.searchsorted(sv, td.quantile(q)) / len(sv)
        # t-digest: rank error shrinks toward the tails; 0.5% mid, tighter tails
        tol = 0.005 if 0.1 < q < 0.9 else 0.002
        assert abs(r - q) < tol, (q, r)


def test_tdigest_merge_within_bound():
    rng = np.random.default_rng(16)
    vals = rng.normal(10, 3, 120_000)
    parts = np.array_split(vals, 6)
    acc = TDigest(200)
    for p in parts:
        acc = acc.merge(TDigest(200).add(p))
    sv = np.sort(vals)
    for q in (0.01, 0.5, 0.99):
        r = np.searchsorted(sv, acc.quantile(q)) / len(sv)
        assert abs(r - q) < 0.01


def test_tdigest_serde_and_minmax():
    td = TDigest(100).add(np.array([1.0, 2.0, 100.0]))
    t2 = TDigest.from_bytes(td.to_bytes())
    assert t2.min == 1.0 and t2.max == 100.0
    assert t2.quantile(0.5) == td.quantile(0.5)


# ---- theta ------------------------------------------------------------------

def test_theta_set_algebra_and_bounds():
    from fastfilter_spark.sketches import ThetaSketch
    rng = np.random.default_rng(21)
    both = rng.integers(0, 2**64, size=50_000, dtype=np.uint64)
    A = np.unique(np.concatenate([rng.integers(0, 2**64, size=200_000, dtype=np.uint64), both]))
    B = np.unique(np.concatenate([rng.integers(0, 2**64, size=150_000, dtype=np.uint64), both]))
    ta, tb = ThetaSketch(4096).add(A), ThetaSketch(4096).add(B)
    for est, exact in ((ta.union(tb).estimate(), len(np.union1d(A, B))),
                       (ta.intersect(tb).estimate(), len(np.intersect1d(A, B))),
                       (ta.a_not_b(tb).estimate(), len(np.setdiff1d(A, B)))):
        assert abs(est - exact) / exact < 6 * ta.rel_std_error() + 0.02


def test_theta_union_associative_exact():
    from fastfilter_spark.sketches import ThetaSketch
    rng = np.random.default_rng(22)
    parts = [rng.integers(0, 2**64, size=60_000, dtype=np.uint64) for _ in range(4)]
    sks = [ThetaSketch(1024).add(p) for p in parts]
    l = sks[0].union(sks[1]).union(sks[2]).union(sks[3])
    r = sks[0].union(sks[1].union(sks[2].union(sks[3])))
    assert l.theta == r.theta and np.array_equal(l.values, r.values)


def test_theta_serde():
    from fastfilter_spark.sketches import ThetaSketch
    t = ThetaSketch(256).add(np.arange(10_000, dtype=np.uint64))
    t2 = ThetaSketch.from_bytes(t.to_bytes())
    assert t2.estimate() == t.estimate() and t2.theta == t.theta


def test_misragries_bounds_and_guarantee():
    from fastfilter_spark.sketches import MisraGries

    rng = np.random.default_rng(5)
    # zipf-ish stream: key i appears ~ n/(i+1) times
    keys = np.repeat(np.arange(200, dtype=np.uint64),
                     (20000 / np.arange(1, 201)).astype(int))
    rng.shuffle(keys)
    n = len(keys)
    k = 32
    mg = MisraGries(k)
    for chunk in np.array_split(keys, 7):      # batched adds
        mg.add(chunk)
    assert mg.n_total == n
    assert mg.deficit <= n // (k + 1)
    assert len(mg.keys) <= k

    true = {int(v): int(c) for v, c in
            zip(*np.unique(keys, return_counts=True))}
    est = mg.query(np.array(sorted(true), dtype=np.uint64))
    for (x, f), c in zip(sorted(true.items()), est):
        assert c <= f <= c + mg.deficit          # two-sided bound
        if f > n / (k + 1):
            assert c > 0                         # guaranteed presence


def test_misragries_merge_any_order_keeps_bounds():
    from fastfilter_spark.sketches import MisraGries

    rng = np.random.default_rng(11)
    keys = rng.integers(0, 50, 30_000, dtype=np.int64).view(np.uint64)
    parts = np.array_split(keys, 4)
    sks = [MisraGries(24).add(p) for p in parts]
    m_lr = sks[0].merge(sks[1]).merge(sks[2]).merge(sks[3])
    m_tree = sks[0].merge(sks[1]).merge(sks[2].merge(sks[3]))
    n = len(keys)
    true = {int(v): int(c) for v, c in zip(*np.unique(keys, return_counts=True))}
    for m in (m_lr, m_tree):
        assert m.n_total == n
        assert m.deficit <= 2 * n // 25 + 4      # deficits add, each <= n_i/(k+1)
        qs = m.query(np.array(sorted(true), dtype=np.uint64))
        for (x, f), c in zip(sorted(true.items()), qs):
            assert c <= f <= c + m.deficit


def test_misragries_serde_and_heavy_hitters():
    from fastfilter_spark.sketches import MisraGries

    keys = np.array([1] * 500 + [2] * 300 + list(range(100, 300)),
                    dtype=np.uint64)
    mg = MisraGries(16).add(keys)
    rt = MisraGries.from_bytes(mg.to_bytes())
    assert np.array_equal(rt.keys, mg.keys)
    assert np.array_equal(rt.counts, mg.counts)
    assert (rt.k, rt.n_total, rt.deficit) == (mg.k, mg.n_total, mg.deficit)
    hh_keys, hh_counts = mg.heavy_hitters(0.2)
    assert 1 in hh_keys and 2 in hh_keys        # 500/1000, 300/1000
    assert list(hh_counts) == sorted(hh_counts, reverse=True)


def test_kll_merge_seed_mismatch_rejected():
    from fastfilter_spark.sketches import KLLSketch
    import pytest as _pytest
    a = KLLSketch(128, seed=1).add(np.arange(100, dtype=float))
    b = KLLSketch(128, seed=2).add(np.arange(100, dtype=float))
    with _pytest.raises(ValueError, match="seed mismatch"):
        a.merge(b)
