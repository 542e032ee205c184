from .hll import HyperLogLog
from .tdigest import TDigest
from .hashing import hash64_array

__all__ = ["HyperLogLog", "TDigest", "hash64_array"]
