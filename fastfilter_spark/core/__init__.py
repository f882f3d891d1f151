from .binaryfuse import BinaryFuseFilter, FuseGeometry
from .blockedbloom import BlockedBloomFilter
from .bloom import BloomFilter
from .fuse import FuseFilter
from .peel import MAX_ITERATIONS, PeelFailure
from .xor import XorFilter, XorPlusFilter

__all__ = [
    "BinaryFuseFilter", "FuseGeometry", "BlockedBloomFilter", "BloomFilter",
    "FuseFilter", "XorFilter", "XorPlusFilter", "PeelFailure",
    "MAX_ITERATIONS",
]
