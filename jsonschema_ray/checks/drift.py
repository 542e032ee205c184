"""Distribution-drift checks over merged t-digests (north rule:
"caption/pixel distribution drift uses KS and PSI tests over merged
t-digests"). No reference analog.

Both tests consume ONLY sketch state (two t-digests), so drift over a
100 TB table costs one stats pass (stages/stats.py) plus O(centroids)
driver-side math.
"""

from __future__ import annotations

import numpy as np

from ..sketches import TDigest


def ks_statistic(a: TDigest, b: TDigest) -> float:
    """Two-sample Kolmogorov–Smirnov statistic approximated at the union of
    centroid locations of the two digests."""
    a._compress()
    b._compress()
    if len(a.means) == 0 or len(b.means) == 0:
        return float("nan")
    xs = np.union1d(a.means, b.means)
    return float(np.max(np.abs(a.cdf(xs) - b.cdf(xs))))


def psi(baseline: TDigest, current: TDigest, buckets: int = 10,
        eps: float = 1e-6) -> float:
    """Population Stability Index with bucket edges at baseline quantiles
    (the standard industry construction; PSI > 0.2 ⇒ significant shift)."""
    baseline._compress()
    current._compress()
    if len(baseline.means) == 0 or len(current.means) == 0:
        return float("nan")
    qs = np.linspace(0, 1, buckets + 1)[1:-1]
    edges = np.array([baseline.quantile(q) for q in qs])
    edges = np.unique(edges)
    if len(edges) == 0:
        return 0.0

    def props(td: TDigest) -> np.ndarray:
        c = td.cdf(edges)
        p = np.diff(np.concatenate(([0.0], c, [1.0])))
        return np.clip(p, eps, None)

    p, q = props(baseline), props(current)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum((q - p) * np.log(q / p)))


def drift_report(baseline_stats, current_stats,
                 ks_threshold: float = 0.1,
                 psi_threshold: float = 0.2) -> list[dict]:
    """Compare two per-column stats tables (output of stages.stats
    column_stats, as pandas or list of dicts) — one drift record per
    column present in both."""
    def index(rows):
        if hasattr(rows, "to_dict"):
            rows = rows.to_dict("records")
        return {r["column"]: r for r in rows}

    base, cur = index(baseline_stats), index(current_stats)
    out = []
    for col in sorted(set(base) & set(cur)):
        tb = TDigest.from_bytes(base[col]["tdigest"])
        tc = TDigest.from_bytes(cur[col]["tdigest"])
        k = ks_statistic(tb, tc)
        p = psi(tb, tc)
        out.append({
            "column": col,
            "ks": k,
            "psi": p,
            "null_rate_baseline": base[col].get("null_rate"),
            "null_rate_current": cur[col].get("null_rate"),
            "drifted": bool((np.isfinite(k) and k > ks_threshold)
                            or (np.isfinite(p) and p > psi_threshold)),
        })
    return out
