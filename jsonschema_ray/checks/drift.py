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
        # clamp-only, NO renormalization — the standard PSI smoothing,
        # and the SAME convention as psi_exact so the sketch and exact
        # variants are threshold-comparable (a renormalized clamp
        # systematically diverges once one side has many empty buckets)
        return np.clip(p, eps, None)

    p, q = props(baseline), props(current)
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


def exact_ks_from_counts(values: np.ndarray, counts_a: np.ndarray,
                         counts_b: np.ndarray) -> float:
    """Exact two-sample KS from per-distinct-value counts of each sample
    (values need not be sorted; empty input or an empty side → NaN).
    Pure driver math, O(distinct values)."""
    if len(values) == 0:
        return float("nan")
    order = np.argsort(values, kind="stable")
    ca = counts_a[order].cumsum()
    cb = counts_b[order].cumsum()
    if ca[-1] == 0 or cb[-1] == 0:
        return float("nan")
    fa = ca / ca[-1]
    fb = cb / cb[-1]
    return float(np.max(np.abs(fa - fb)))


def _grouped_counts_pivot(ds, col: str, group_fn, group_name: str,
                          value_fn=None):
    """Shared distributed pass for the two-sample statistics: tag each
    row with its cohort, grouped-count per (col value, cohort) with the
    partial-agg combiner, pivot driver-side. Null ``col`` values are
    DROPPED explicitly (matching the oracles' ``IS NOT NULL`` guards),
    and so are non-finite floats: NaN has no order position in an ECDF
    and pandas' pivot would silently drop NaN keys anyway — excluding
    them deliberately keeps the distributed counts and the returned
    totals consistent (an oracle over NaN-bearing float data needs an
    ``isfinite()`` guard to match). ``value_fn(batch) -> pa.Array``
    overrides the tagged value (e.g. binning); rows it nulls are
    dropped like any other null."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_agg

    def tag(b: pa.Table) -> pa.Table:
        g = group_fn(b)
        vals = value_fn(b) if value_fn is not None else b[col]
        t = pa.table({col: vals,
                      group_name: pa.array(np.asarray(g, np.int8))})
        t = t.filter(pc.is_valid(t[col]))
        if pa.types.is_floating(t.schema.field(col).type):
            t = t.filter(pc.is_finite(t[col]))
        return t

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            zero_copy_batch=True)
    hist = grouped_agg(tagged, [col, group_name], {},
                       count_alias="_c").to_pandas()
    return hist.pivot_table(index=col, columns=group_name, values="_c",
                            fill_value=0, aggfunc="sum")


def exact_ks(ds, value_col: str, group_fn, group_name: str = "_g"):
    """EXACT two-sample Kolmogorov–Smirnov statistic over a Dataset split
    into two samples by ``group_fn`` (a batch → int8-array callable; 0 =
    sample A, 1 = sample B). The distributed pass reduces to per-
    (value, group) counts with the partial-agg groupby — the shuffle
    moves one row per (distinct value, group, batch) — and the driver
    walks the merged histogram. Null values are excluded (both samples).
    Driver footprint is O(distinct values): exact KS fundamentally needs
    the full ECDF support, so for unbounded-cardinality columns use the
    t-digest ``ks_statistic`` instead (this pair mirrors exact vs sketch
    column stats). → (ks, n_a, n_b)."""
    piv = _grouped_counts_pivot(ds, value_col, group_fn, group_name)
    vals = piv.index.to_numpy()
    ca = piv[0].to_numpy() if 0 in piv.columns else np.zeros(len(piv))
    cb = piv[1].to_numpy() if 1 in piv.columns else np.zeros(len(piv))
    return (exact_ks_from_counts(vals, ca.astype(np.int64),
                                 cb.astype(np.int64)),
            int(ca.sum()), int(cb.sum()))


def chi2_contingency(ds, cat_col: str, group_fn, group_name: str = "_g"):
    """Pearson chi-square independence statistic between a categorical
    column and a two-way cohort split (``group_fn`` as in exact_ks; null
    categories excluded). One grouped-count shuffle (per-batch combined);
    the contingency math runs on the driver over O(categories) cells.
    → (chi2, dof); dof is 0 (and chi2 0.0) when the table is degenerate."""
    piv = _grouped_counts_pivot(ds, cat_col, group_fn, group_name)
    obs = piv.to_numpy(dtype=np.int64)
    dof = max(obs.shape[0] - 1, 0) * max(obs.shape[1] - 1, 0)
    if obs.size == 0 or dof == 0:
        return 0.0, int(dof)
    # float64 marginals: int64 rows[i]*cols[j] wraps negative once the
    # product exceeds 2^63 (billions-of-rows marginals at target scale)
    n = float(obs.sum(dtype=np.float64))
    rows = obs.sum(axis=1, dtype=np.float64)
    cols = obs.sum(axis=0, dtype=np.float64)
    e = np.outer(rows, cols) / n
    return float(((obs - e) ** 2 / e).sum()), int(dof)


def psi_exact(ds, value_col: str, group_fn, bin_width: float,
              group_name: str = "_g", eps: float = 1e-6):
    """EXACT Population Stability Index over FIXED-WIDTH bins between two
    cohorts (``group_fn`` as in :func:`exact_ks`) — the oracled companion
    to the t-digest :func:`psi` exactly as :func:`exact_ks` pairs with
    ``ks_statistic`` (north rule: "caption/pixel distribution drift uses
    KS and PSI tests"). bin = floor(value / bin_width) (the
    events_value_histogram convention); per-cohort proportions are
    clamped at ``eps`` before the log so bins one side never saw
    contribute a large-but-finite term (the standard PSI smoothing).

    One grouped-count shuffle (per-batch combined partials — the shuffle
    moves one row per (bin, cohort, batch)); the driver walks O(bins)
    cells. Null values are excluded from both cohorts.

    → (per-bin DataFrame ``(bin, n_a, n_b, psi_term)`` sorted by bin,
    total PSI). Both sides of the driver contract compute count/total
    double divisions and a libm log, so per-bin terms are bit-identical
    to the SQL conditional-aggregation form. Null and NON-FINITE values
    are excluded from both cohorts (NaN/inf have no bin; the previous
    int64 cast of NaN was undefined and fabricated an INT64_MIN bin);
    a finite value whose bin index would overflow int64 is refused
    loudly — silently dropping it would skew the totals."""
    import pandas as pd
    import pyarrow as pa

    if not (np.isfinite(bin_width) and bin_width > 0):
        raise ValueError(
            f"psi_exact: bin_width must be a finite positive float, "
            f"got {bin_width!r}")

    def bin_fn(b: pa.Table) -> pa.Array:
        col = b[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False).astype(np.float64,
                                                      copy=False)
        ok = np.isfinite(v)          # nulls surface as NaN here too
        q = np.zeros(len(v))
        q[ok] = np.floor(v[ok] / bin_width)
        if (np.abs(q[ok]) >= 2.0 ** 62).any():
            raise ValueError(
                "psi_exact: value / bin_width exceeds the int64 bin "
                "range — choose a wider bin_width")
        return pa.array(q.astype(np.int64), mask=~ok)

    piv = _grouped_counts_pivot(ds, "bin", group_fn, group_name,
                                value_fn=bin_fn)
    empty = pd.DataFrame({"bin": pd.Series([], dtype=np.int64),
                          "n_a": pd.Series([], dtype=np.int64),
                          "n_b": pd.Series([], dtype=np.int64),
                          "psi_term": pd.Series([], dtype=float)})
    if not len(piv):
        return empty, float("nan")
    zeros = np.zeros(len(piv), dtype=np.int64)
    c0 = piv[0].to_numpy().astype(np.int64) if 0 in piv.columns else zeros
    c1 = piv[1].to_numpy().astype(np.int64) if 1 in piv.columns else zeros
    t0, t1 = int(c0.sum()), int(c1.sum())
    if t0 == 0 or t1 == 0:
        return empty, float("nan")
    p_a = np.maximum(c0 / t0, eps)
    p_b = np.maximum(c1 / t1, eps)
    term = (p_a - p_b) * np.log(p_a / p_b)
    out = pd.DataFrame({"bin": piv.index.to_numpy().astype(np.int64),
                        "n_a": c0, "n_b": c1, "psi_term": term}) \
        .sort_values("bin").reset_index(drop=True)
    return out, float(term.sum())
