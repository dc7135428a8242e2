"""Pure-numpy sketch kernels. No Spark imports allowed in this package."""

from sketchlib.core.tdigest import TDigest
from sketchlib.core.kll import KLL
from sketchlib.core.ddsketch import DDSketch
from sketchlib.core.rc_sketch import RCSketch
from sketchlib.core.hll import HyperLogLog
from sketchlib.core.cms import CountMinSketch
from sketchlib.core.bloom import BloomFilter
from sketchlib.core.oracle import LinearOracle
from sketchlib.core.reservoir import ReservoirSample
from sketchlib.core.spacesaving import SpaceSaving
from sketchlib.core.theta import ThetaSketch
from sketchlib.core.wrappers import RankCombinedGroup, SymDigest

__all__ = [
    "TDigest",
    "KLL",
    "DDSketch",
    "RCSketch",
    "HyperLogLog",
    "CountMinSketch",
    "BloomFilter",
    "LinearOracle",
    "SpaceSaving",
    "ReservoirSample",
    "ThetaSketch",
    "SymDigest",
    "RankCombinedGroup",
]
