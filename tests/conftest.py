import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from fastfilter_spark.spark.session import get_spark
    s = get_spark("pytest", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """10^4-row F1 corpus with 20% duplicate contents (F3 `dupes`)."""
    from fixtures.gen import write_corpus
    p = tmp_path_factory.mktemp("corpus") / "corpus.parquet"
    return write_corpus(str(p), 10_000, seed=42, dupe_frac=0.2)


@pytest.fixture(scope="session")
def member_keys():
    """Deterministic uint64 member set, n≈1e5 (t-correct tier)."""
    rng = np.random.default_rng(42)
    return np.unique(rng.integers(0, 2**64, size=100_000, dtype=np.uint64))


@pytest.fixture(scope="session")
def non_member_probes(member_keys):
    """1e6 probes rejection-filtered against the member set (F2)."""
    rng = np.random.default_rng(4242)
    probes = rng.integers(0, 2**64, size=1_000_000, dtype=np.uint64)
    return probes[~np.isin(probes, member_keys)]
