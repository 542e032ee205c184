"""Merging t-digest quantile sketch (Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests", 2019 — the merging variant with the
k1 scale function).

Mergeable and serializable: per-batch partials are built vectorized from
numpy arrays, merged per partition, and globally on the driver; drift checks
(KS statistic, PSI) run over merged digests (SURVEY §2.4, north_star)."""

from __future__ import annotations

import numpy as np


class TDigest:
    def __init__(self, delta: float = 200.0,
                 means: np.ndarray | None = None,
                 weights: np.ndarray | None = None):
        self.delta = delta
        self.means = means if means is not None else np.array([])
        self.weights = weights if weights is not None else np.array([])
        self._buf_m: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # -- building ------------------------------------------------------
    def add_values(self, vals: np.ndarray) -> "TDigest":
        v = np.asarray(vals, dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v):
            self._buf_m.append(v)
            self._buf_w.append(np.ones(len(v)))
            if sum(len(b) for b in self._buf_m) > 16384:
                self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if len(other.means):
            self._buf_m.append(other.means)
            self._buf_w.append(other.weights)
        return self

    def _compress(self):
        if not self._buf_m and len(self.means) <= self.delta:
            return
        m = np.concatenate([self.means] + self._buf_m) \
            if self._buf_m else self.means
        w = np.concatenate([self.weights] + self._buf_w) \
            if self._buf_w else self.weights
        self._buf_m, self._buf_w = [], []
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # k1 scale function: k(q) = delta/(2π) * asin(2q-1)
        cum = np.cumsum(w) - w / 2.0
        q = cum / total
        k = self.delta / (2 * np.pi) * np.arcsin(np.clip(2 * q - 1, -1, 1))
        # group centroids whose k-values round to the same integer bucket
        buckets = np.floor(k - k[0]).astype(np.int64)
        # enforce monotone buckets
        buckets = np.maximum.accumulate(buckets)
        uniq, inv = np.unique(buckets, return_inverse=True)
        neww = np.zeros(len(uniq))
        np.add.at(neww, inv, w)
        newm = np.zeros(len(uniq))
        np.add.at(newm, inv, m * w)
        newm /= neww
        self.means, self.weights = newm, neww

    # -- serialization -------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        out = np.concatenate([[self.delta, len(self.means)],
                              self.means, self.weights])
        return out.astype(np.float64).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        a = np.frombuffer(b, dtype=np.float64)
        delta, n = a[0], int(a[1])
        return cls(delta, a[2:2 + n].copy(), a[2 + n:2 + 2 * n].copy())

    # -- queries -------------------------------------------------------
    @property
    def count(self) -> float:
        self._compress()
        return float(self.weights.sum()) if len(self.weights) else 0.0

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * total
        return float(np.interp(target, cum, self.means))

    def cdf(self, x: np.ndarray) -> np.ndarray:
        self._compress()
        if len(self.means) == 0:
            return np.full(np.shape(x), np.nan)
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return np.interp(np.asarray(x, dtype=np.float64), self.means,
                         cum / total, left=0.0, right=1.0)
