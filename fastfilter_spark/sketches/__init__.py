from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLLSketch
from .tdigest import TDigest

__all__ = ["HyperLogLog", "CountMinSketch", "KLLSketch", "TDigest"]
