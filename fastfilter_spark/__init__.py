"""fastfilter_spark — a PySpark-native distributed sketch & membership-filter engine.

From-scratch reimplementation (NOT a port) of the capabilities of
hexops/fastfilter (binary fuse 8/16/32, xor/xor+, Bloom) plus the
mergeable sketches a 100TB-scale pipeline needs (HLL, count-min, KLL,
t-digest), built Spark-first: JVM-side key derivation, salted
repartitioning, Arrow-vectorized partition builders, broadcast query.
"""

__version__ = "0.1.0"
