from .cms import CountMinSketch
from .hashing import hash64_array
from .hll import HyperLogLog
from .tdigest import TDigest

__all__ = ["CountMinSketch", "HyperLogLog", "TDigest", "hash64_array"]
