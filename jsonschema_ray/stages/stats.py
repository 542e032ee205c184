"""Per-column statistics as a two-stage partial/merge aggregation.

The reference has only intra-row counting (maxContains validator.go:1114-1124,
maxProperties validator.go:1140-1152); the table-level stats are mandated by
the north rule: null-rate, min/max, distinct-count via HyperLogLog, quantiles
via t-digest — accumulated per batch inside ``map_batches`` (NO shuffle of
data rows), then merged over the tiny partials table (SURVEY §2.6
"Aggregation" row: partial per-batch → merge per partition → global merge).

At 100 TB scale this moves only O(#columns × #batches) sketch rows through
the object store — the data itself never shuffles.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches import HyperLogLog, TDigest, hash64_array

_PARTIAL_SCHEMA = pa.schema([
    ("column", pa.string()),
    ("count", pa.int64()),
    ("null_count", pa.int64()),
    ("min_num", pa.float64()),
    ("max_num", pa.float64()),
    ("sum_num", pa.float64()),
    ("n_num", pa.int64()),
    ("min_int", pa.int64()),
    ("max_int", pa.int64()),
    ("min_str", pa.string()),
    ("max_str", pa.string()),
    ("hll", pa.binary()),
    ("tdigest", pa.binary()),
])


def _is_numericish(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t) \
        or pa.types.is_boolean(t)


class ColumnStatsStage:
    """map_batches actor: one partial-stats row per column per batch."""

    def __init__(self, columns: Optional[list[str]] = None, hll_p: int = 14,
                 tdigest_delta: float = 200.0):
        self.columns = columns
        self.hll_p = hll_p
        self.delta = tdigest_delta

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = self.columns or batch.column_names
        rows = {name: [] for name in _PARTIAL_SCHEMA.names}
        for name in cols:
            col = batch.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            n = len(col)
            nulls = col.null_count
            hll = HyperLogLog(self.hll_p)
            td = TDigest(self.delta)
            min_num = max_num = sum_num = None
            min_str = max_str = None
            n_num = 0
            min_int = max_int = None
            t = col.type
            valid = col.drop_null() if nulls else col
            if len(valid):
                hll.add_hashes(hash64_array(valid))
                if _is_numericish(t):
                    if pa.types.is_integer(t):
                        # exact int64 min/max: the float64 pipeline rounds
                        # values ≥ 2^53 (snowflake ids, ns timestamps)
                        iv = valid.to_numpy(zero_copy_only=False)
                        min_int = int(iv.min())
                        max_int = int(iv.max())
                    v = valid.to_numpy(zero_copy_only=False).astype(
                        np.float64, copy=False)
                    finite = v[np.isfinite(v)]
                    if len(finite):
                        min_num = float(finite.min())
                        max_num = float(finite.max())
                        sum_num = float(finite.sum())
                        n_num = len(finite)
                        td.add_values(finite)
                elif pa.types.is_temporal(t):
                    # date32/time32 are int32-backed: Arrow has no direct
                    # cast to int64, go through int32 first
                    if t.bit_width == 32:
                        as_int = valid.cast(pa.int32()).cast(pa.int64())
                    else:
                        as_int = valid.cast(pa.int64())
                    iv = as_int.to_numpy()
                    min_int, max_int = int(iv.min()), int(iv.max())
                    v = iv.astype(np.float64)
                    min_num, max_num, sum_num = \
                        float(v.min()), float(v.max()), float(v.sum())
                    n_num = len(v)
                    td.add_values(v)
                elif pa.types.is_string(t) or pa.types.is_large_string(t):
                    mm = pc.min_max(valid)
                    min_str = mm["min"].as_py()
                    max_str = mm["max"].as_py()
                    # length distribution feeds the t-digest
                    td.add_values(pc.utf8_length(valid).to_numpy(
                        zero_copy_only=False).astype(np.float64))
            rows["column"].append(name)
            rows["count"].append(n)
            rows["null_count"].append(nulls)
            rows["min_num"].append(min_num)
            rows["max_num"].append(max_num)
            rows["sum_num"].append(sum_num)
            rows["n_num"].append(n_num)
            rows["min_int"].append(min_int)
            rows["max_int"].append(max_int)
            rows["min_str"].append(min_str)
            rows["max_str"].append(max_str)
            rows["hll"].append(hll.to_bytes())
            rows["tdigest"].append(td.to_bytes())
        return pa.table(rows, schema=_PARTIAL_SCHEMA)


_MERGED_SCHEMA = pa.schema([
    ("column", pa.string()), ("count", pa.int64()),
    ("null_count", pa.int64()), ("null_rate", pa.float64()),
    ("min_num", pa.float64()), ("max_num", pa.float64()),
    ("sum_num", pa.float64()), ("mean_num", pa.float64()),
    ("n_num", pa.int64()),
    ("min_int", pa.int64()), ("max_int", pa.int64()),
    ("min_str", pa.string()), ("max_str", pa.string()),
    ("ndv_approx", pa.float64()),
    ("p25", pa.float64()), ("p50", pa.float64()),
    ("p75", pa.float64()), ("p99", pa.float64()),
    ("hll", pa.binary()), ("tdigest", pa.binary()),
])


def stats_frame(t: pa.Table) -> pd.DataFrame:
    """Arrow stats rows → pandas with int64 columns as NULLABLE Int64.
    The plain to_pandas converts null-bearing int64 columns (min_int is
    null on every non-integer row) to float64, silently ROUNDING exact
    min/max past 2^53 — defeating exactly the guarantee min_int/max_int
    exist for (full-range phash values, snowflake ids)."""
    return t.to_pandas(types_mapper={pa.int64(): pd.Int64Dtype()}.get)


def merge_stat_partials_table(t: pa.Table) -> pa.Table:
    """Arrow-native face of :func:`merge_stat_partials` with a PINNED
    output schema (single-group frames would otherwise infer
    data-dependent types for all-null columns)."""
    out = merge_stat_groups(stats_frame(t))
    return pa.Table.from_pandas(out, schema=_MERGED_SCHEMA,
                                preserve_index=False)


def merge_stat_partials(g: pd.DataFrame) -> pd.DataFrame:
    """Merge all partial rows of one column (used by groupby.map_groups and
    by the driver-side global merge).

    Exactness contract: ``g`` must carry min_int/max_int as INTEGER
    dtypes (nullable Int64 from :func:`stats_frame`, or plain int64) —
    a float64 frame has already lost bits past 2^53."""
    return pd.DataFrame([_merge_stat_row(g)])


def merge_stat_groups(partials: pd.DataFrame) -> pd.DataFrame:
    """Merge a multi-column partials frame into one merged row per
    column — one DataFrame built from dict rows, NOT a concat of
    single-row frames (whose all-NA columns trip the pandas
    empty/all-NA-concat FutureWarning and will change dtype inference
    on a pandas upgrade). min_int/max_int are pinned to NULLABLE Int64
    — dict-row inference would promote an int/None mix to float64 and
    round exact values past 2^53 (full-range phash)."""
    rows = [_merge_stat_row(g) for _, g in
            partials.groupby("column", sort=False)]
    if not rows:
        return pd.DataFrame()
    out = pd.DataFrame(rows)
    for c in ("min_int", "max_int"):
        out[c] = pd.array([r[c] for r in rows], dtype="Int64")
    return out


def _merge_stat_row(g: pd.DataFrame) -> dict:
    hll = HyperLogLog.from_bytes(g["hll"].iloc[0])
    td = TDigest.from_bytes(g["tdigest"].iloc[0])
    for b in g["hll"].iloc[1:]:
        hll.merge(HyperLogLog.from_bytes(b))
    for b in g["tdigest"].iloc[1:]:
        td.merge(TDigest.from_bytes(b))
    mn = g["min_num"].dropna()
    mx = g["max_num"].dropna()
    sm = g["sum_num"].dropna()
    mni = g["min_int"].dropna()
    mxi = g["max_int"].dropna()
    mns = g["min_str"].dropna()
    mxs = g["max_str"].dropna()
    count = int(g["count"].sum())
    nulls = int(g["null_count"].sum())
    # mean over the values that actually fed the sum (finite only) — a
    # NaN/±inf row is excluded from sum_num, so dividing by the plain
    # non-null count would bias the mean
    n_num = int(g["n_num"].sum()) if "n_num" in g.columns else \
        count - nulls
    return {
        "column": g["column"].iloc[0],
        "count": count,
        "null_count": nulls,
        "null_rate": (nulls / count) if count else 0.0,
        "min_num": float(mn.min()) if len(mn) else None,
        "max_num": float(mx.max()) if len(mx) else None,
        "sum_num": float(sm.sum()) if len(sm) else None,
        "mean_num": (float(sm.sum()) / n_num)
        if len(sm) and n_num else None,
        # n_num RIDES the merged row: a re-merge of merged rows (the
        # flagship's persisted per-fragment sketch_state) would
        # otherwise fall back to count - nulls, re-biasing the mean
        # NaN/inf rows were excluded from
        "n_num": n_num,
        "min_int": int(mni.min()) if len(mni) else None,
        "max_int": int(mxi.max()) if len(mxi) else None,
        "min_str": mns.min() if len(mns) else None,
        "max_str": mxs.max() if len(mxs) else None,
        "ndv_approx": float(hll.estimate()),
        "p25": td.quantile(0.25), "p50": td.quantile(0.5),
        "p75": td.quantile(0.75), "p99": td.quantile(0.99),
        "hll": hll.to_bytes(), "tdigest": td.to_bytes(),
    }


def _stats_batch(batch: pa.Table, *, columns, hll_p, delta) -> pa.Table:
    from ..util import worker_cached
    stage = worker_cached(("colstats", columns, hll_p, delta),
                          lambda: ColumnStatsStage(
                              columns=list(columns) if columns else None,
                              hll_p=hll_p, tdigest_delta=delta))
    return stage(batch)


def column_stats(ds, columns: Optional[list[str]] = None,
                 batch_size: int = 65536, concurrency=None,
                 hll_p: int = 14, tdigest_delta: float = 200.0):
    """Dataset → small Dataset of per-column stats (one row per column).

    Partials are computed inside map_batches (stateless vectorized tasks);
    only the sketch rows go through the tiny groupby.

    Consuming min_int/max_int: the Arrow result is exact int64; a plain
    ``.to_pandas()`` over MIXED rows (integer + string columns) converts
    the null-bearing int64 columns to float64 and rounds values past
    2^53 — collect to Arrow and use :func:`stats_frame` when those
    columns matter."""
    import functools
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    if columns is not None:
        ds = ds.select_columns(columns)  # prune before compute
    partials = ds.map_batches(
        functools.partial(_stats_batch,
                          columns=tuple(columns) if columns else None,
                          hll_p=hll_p, delta=tdigest_delta),
        **kwargs)
    # pyarrow group blocks: the pandas conversion happens INSIDE
    # merge_stat_partials_table via stats_frame (nullable Int64), so
    # exact int64 min/max survive null-bearing mixed-column frames
    return partials.groupby("column").map_groups(
        merge_stat_partials_table, batch_format="pyarrow")
