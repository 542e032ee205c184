"""Bloom filter over 64-bit key hashes — the big-key-universe form of the
broadcast semi-join side (checks/referential.py): when the distinct key set
is too large to ship as an exact Arrow array, ship ``m`` BITS instead.

One-sided error only: membership tests may report false POSITIVES (rate
``fp``), never false negatives — so an ANTI-join filtered through a Bloom
filter may MISS some orphans (at rate ≈ fp) but never reports a valid row
as an orphan, and a SEMI-join keeps every true match. Built vectorized
(numpy), double-hashing scheme (Kirsch–Mitzenmacher 2006: g_i = h1 + i·h2).
"""

from __future__ import annotations

import math

import numpy as np

from .hashing import _splitmix64, hash64_array


class BloomFilter:
    def __init__(self, capacity: int, fp: float = 0.01,
                 bits: np.ndarray | None = None, k: int | None = None):
        if bits is not None:
            self.bits = bits
            self.k = k
            self.m = len(bits) * 8
            return
        m = max(64, int(-capacity * math.log(fp) / (math.log(2) ** 2)))
        m = (m + 63) // 64 * 64
        self.m = m
        self.k = max(1, round(m / max(1, capacity) * math.log(2)))
        if self.k > 255:
            # to_bytes encodes k in one byte; fail HERE where the absurd
            # fp (< ~1e-77) is introduced, not at serialization time
            # mid-pipeline after the filter was built and populated
            raise ValueError(
                f"fp={fp:g} needs k={self.k} hash functions; the "
                "serialized form caps k at 255 — use a larger fp")
        self.bits = np.zeros(m // 8, dtype=np.uint8)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing."""
        h1 = h
        h2 = _splitmix64(h) | np.uint64(1)
        with np.errstate(over="ignore"):
            idx = np.empty((self.k, len(h)), dtype=np.uint64)
            for i in range(self.k):
                idx[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
        return idx

    def add_hashes(self, h: np.ndarray) -> "BloomFilter":
        pos = self._positions(np.asarray(h, dtype=np.uint64)).ravel()
        np.bitwise_or.at(self.bits, (pos // 8).astype(np.int64),
                         (1 << (pos % 8)).astype(np.uint8))
        return self

    def add_column(self, arr, seed: int = 0) -> "BloomFilter":
        import pyarrow as pa
        import pyarrow.compute as pc
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if isinstance(arr, pa.Array) and arr.null_count:
            arr = arr.filter(pc.is_valid(arr))
        return self.add_hashes(hash64_array(arr, seed))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(np.asarray(h, dtype=np.uint64))
        byte = (pos // 8).astype(np.int64)
        bit = (1 << (pos % 8)).astype(np.uint8)
        hit = (self.bits[byte] & bit) != 0
        return hit.all(axis=0)

    def contains_column(self, arr, seed: int = 0) -> np.ndarray:
        import pyarrow as pa
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return self.contains_hashes(hash64_array(arr, seed))

    def to_bytes(self) -> bytes:
        return bytes([self.k]) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        return cls(0, bits=np.frombuffer(b[1:], dtype=np.uint8).copy(),
                   k=b[0])
