from .cms import CountMinSketch
from .hll import HyperLogLog
from .kll import KLLSketch
from .misragries import MisraGries
from .tdigest import TDigest
from .theta import ThetaSketch

__all__ = ["HyperLogLog", "CountMinSketch", "KLLSketch", "MisraGries",
           "TDigest", "ThetaSketch"]
