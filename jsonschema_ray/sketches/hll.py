"""HyperLogLog distinct-count sketch (Flajolet et al. 2007): raw HLL
estimator with the classic linear-counting small-range correction
(switch below 2.5m when empty registers remain). Heule et al.'s
(EDBT 2013) empirical bias-table correction is deliberately NOT
implemented (the per-p tables aren't reproducible offline): in the
transition band just above the 2.5m cutoff (~40k-65k distinct at p=14)
the estimate carries a systematic +1-2.5% bias on top of the
0.81% standard error; outside that band the usual 1.04/sqrt(m)
accuracy holds. ndv_approx consumers should treat that band as
approximate-plus-bias, or raise p.

Mergeable (register-wise max) and serializable (raw register bytes) so it
crosses Ray actor/task boundaries as a tiny binary payload: each batch folds
into per-actor registers; partials merge per partition and then globally
(SURVEY §2.4, §2.6 "approx aggregates").
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_array


class HyperLogLog:
    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None \
            else np.zeros(self.m, dtype=np.uint8)

    # -- building ------------------------------------------------------
    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold a uint64 hash array into the registers — vectorized."""
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros + 1, via exact vectorized highest-set-bit
        # (float log2 misrounds near 2^64); the OR above guarantees rest != 0
        # and caps rank at 64 - p + 1
        hb = np.zeros(len(rest), dtype=np.int64)
        x = rest.copy()
        for s in (32, 16, 8, 4, 2, 1):
            big = x >= (np.uint64(1) << np.uint64(s))
            hb[big] += s
            x = np.where(big, x >> np.uint64(s), x)
        rank = (64 - hb).astype(np.uint8)  # (63 - hb) leading zeros, +1
        np.maximum.at(self.registers, idx, rank)
        return self

    def add_column(self, arr, seed: int = 0) -> "HyperLogLog":
        import pyarrow as pa
        import pyarrow.compute as pc
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, pa.Array) and arr.null_count:
            arr = arr.filter(pc.is_valid(arr))
        return self.add_hashes(hash64_array(arr, seed))

    # -- merging / serialization --------------------------------------
    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("incompatible HLL precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = b[0]
        return cls(p, np.frombuffer(b[1:], dtype=np.uint8).copy())

    # -- estimation ----------------------------------------------------
    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)  # linear counting
        return float(est)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)
