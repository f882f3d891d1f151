from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLLSketch
from .tdigest import TDigest
from .theta import ThetaSketch

__all__ = ["HyperLogLog", "CountMinSketch", "KLLSketch", "TDigest", "ThetaSketch"]
