"""Pure-numpy sketch kernels. No Spark imports allowed in this package."""

from sketchlib.core.tdigest import TDigest
from sketchlib.core.kll import KLL
from sketchlib.core.hll import HyperLogLog
from sketchlib.core.cms import CountMinSketch
from sketchlib.core.bloom import BloomFilter
from sketchlib.core.oracle import LinearOracle

__all__ = [
    "TDigest",
    "KLL",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "LinearOracle",
]
