"""Count-min sketch: fixed-memory approximate frequency counts.

(Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 2005.) ``depth``
independent hash rows of ``width`` counters; an item's estimate is the
MINIMUM of its ``depth`` cells, which can only OVER-estimate the true
count (each cell adds non-negative collision mass). That one-sided
error is what makes the sketch usable as an exact-answer prefilter:
every item whose true count reaches a threshold T is guaranteed to
estimate >= T, so "CMS-candidates then exact-verify" has no false
negatives (see ``heavy_hitters_cms_events``).

The sketch is LINEAR: merging two sketches over disjoint streams is
element-wise addition of their counter matrices. That is the whole
distributed story — one fixed-size (depth x width) uint64 matrix per
batch, summed pairwise in any order/topology (driver loop here; a tree
reduce at cluster scale), with nothing keyed ever shuffled.

Hashing: one ``hash64_array`` pass per row seed (deterministic across
processes, see hashing.py) — vectorized, no per-item Python.
"""

from __future__ import annotations

import numpy as np

from .hashing import hash64_array


class CountMinSketch:
    """depth x width uint64 counter matrix with conservative defaults.

    Error bound: estimate <= true + eps * stream_total with probability
    1 - delta, for eps = e / width and delta = exp(-depth). The bound
    scales with the STREAM, so the screen is selective only when the
    threshold does too (phi-heavy-hitters, T = phi*N): the default
    width 8192 over-counts by ~0.033% of the stream per item. Against
    a FIXED absolute threshold T, size width ~ e*N/T or the sketch
    saturates and passes everything (heavy_hitters_cms_events sizes W
    from the stream's metadata count and cap-gates the fallout).
    """

    def __init__(self, width: int = 8192, depth: int = 4,
                 counts: np.ndarray = None):
        if width <= 0 or depth <= 0:
            raise ValueError("CountMinSketch: width/depth must be >= 1")
        self.width, self.depth = int(width), int(depth)
        if counts is None:
            counts = np.zeros((self.depth, self.width), dtype=np.uint64)
        else:
            counts = np.asarray(counts, dtype=np.uint64)
            if counts.shape != (self.depth, self.width):
                raise ValueError(
                    f"CountMinSketch: counts shape {counts.shape} != "
                    f"({self.depth}, {self.width})")
        self.counts = counts

    def _cells(self, arr) -> np.ndarray:
        """(depth, n) column indices for the items in ``arr``."""
        w = np.uint64(self.width)
        return np.stack([hash64_array(arr, seed=r + 1) % w
                         for r in range(self.depth)])

    def add_column(self, arr) -> "CountMinSketch":
        """Count every element of an Arrow/numpy column (nulls count as
        the null sentinel key — mask them out beforehand if the stream
        excludes them)."""
        cells = self._cells(arr)
        for r in range(self.depth):
            # bincount, not fancy-index +=: repeated cells in one batch
            # must each contribute (a[idx] += 1 collapses duplicates)
            self.counts[r] += np.bincount(
                cells[r].astype(np.int64), minlength=self.width
            ).astype(np.uint64)
        return self

    def estimate(self, arr) -> np.ndarray:
        """Per-element upper-biased count estimates (uint64)."""
        cells = self._cells(arr)
        per_row = np.stack([self.counts[r][cells[r]]
                            for r in range(self.depth)])
        return per_row.min(axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("CountMinSketch: merging mismatched shapes")
        self.counts += other.counts
        return self

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, width: int = 8192,
                   depth: int = 4) -> "CountMinSketch":
        counts = np.frombuffer(b, dtype=np.uint64).reshape(depth, width)
        return cls(width=width, depth=depth, counts=counts.copy())
