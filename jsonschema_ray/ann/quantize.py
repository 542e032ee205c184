"""Scalar (int8-range) embedding quantization — the compression pass a
vector store or ANN index runs before persisting embeddings (reference
analog: the stats/normalization stage family; quantization itself is
an LLM-pipeline extension like ann/search.py).

Two passes, both streaming:
  1. per-DIMENSION min/max — each batch reduces its lists to one
     64-row partial (dim, mn, mx); the gather is dim × blocks rows,
     never data-proportional.
  2. encode — fully per-row: ``code = round(((v - mn)/(mx - mn)) *
     255)`` with the broadcast stats, summed per vector locally, then
     one vec-hash partition merges duplicate ids (SQL GROUP BY
     identity: ALL null-id rows are ONE group).

Exactness contract with the SQL oracle (DuckDB, unnest +
generate_subscripts):
- float32 → float64 casts are exact; min/max are order-insensitive.
- the encode expression evaluates in the SAME operation order
  ``((v - mn) / (mx - mn)) * 255`` in float64 on both engines.
- rounding is util.duckdb_round(x, 0) == DuckDB ``round(x, 0)``
  (std::round ties-away; numpy would tie to even).
- codes stay in [0, 255] by construction (v ∈ [mn, mx] ⇒ the ratio is
  exactly 0..1 in fp), so no clamp exists to diverge.
- NULL list elements and non-finite values (NaN AND ±inf) are
  excluded from BOTH the stats and the code sums (SQL:
  ``val IS NOT NULL AND isfinite(val)``) — the repo's psi/drift
  non-finite convention, here mirrored in the oracle rather than
  documented as divergence. An admitted inf would diverge hard:
  Python's ``rng = inf - inf = NaN`` silently codes INT64_MIN while
  DuckDB raises on ``CAST(round(NaN) AS BIGINT)``.
- a degenerate dimension (mx == mn) codes to 0 on both engines.
- vectors whose every element is NULL/NaN (or whose list is NULL) are
  ABSENT from the output, exactly like unnest of an empty list.

The per-vector summary (code_sum, n_dims) rather than a dims×rows
exploded table keeps the oracle comparison exact-integer and the
output vector-bounded at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import duckdb_round


def _flat_dims(b: pa.Table, id_col: str, vec_col: str):
    """Flatten a list<float> column: (row_idx, dim_idx, float64
    values) over valid lists and finite non-null elements only.
    Returns (ids_arrow_valid_rows, row_idx, dims, vals)."""
    arr = b.column(vec_col).combine_chunks()
    ids = b.column(id_col).combine_chunks()
    if arr.null_count:
        valid = pc.is_valid(arr)
        arr = arr.filter(valid)
        ids = ids.filter(valid)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    flat = pc.list_flatten(arr)
    total = len(flat)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) \
        if len(lens) else np.array([], dtype=np.int64)
    row_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    dims = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    vals = pc.cast(flat, pa.float64())
    keep = np.ones(total, dtype=bool)
    if vals.null_count:
        keep &= pc.is_valid(vals).to_numpy(zero_copy_only=False)
        vals = pc.fill_null(vals, 0.0)
    v = vals.to_numpy(zero_copy_only=False)
    # exclude NULL, NaN AND ±inf: an inf element would make the stats
    # non-finite (Python: rng = inf-inf = NaN → INT64_MIN garbage
    # codes; SQL: CAST(round(NaN) AS BIGINT) errors) — the psi/drift
    # non-finite screen, mirrored into the oracle via isfinite(val)
    keep &= np.isfinite(v)
    uniform = None
    if keep.all():
        if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
            uniform = int(lens[0])  # clean fixed-dim fast path
    else:
        row_idx, dims, v = row_idx[keep], dims[keep], v[keep]
    return ids, row_idx, dims, v, uniform


def scalar_quantize_summary(ds, id_col: str = "vec_id",
                            vec_col: str = "embedding"):
    """(id, code_sum, n_dims) Dataset — see module docstring."""
    import ray

    from ..pipelines.relational import grouped_agg_hash
    from ..util import worker_cached

    def stats_partial(b: pa.Table) -> pa.Table:
        _, _, dims, v, uniform = _flat_dims(b, id_col, vec_col)
        if len(dims) == 0:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        if uniform:  # the clean fixed-dim corpus: one reshape
            mat = v.reshape(-1, uniform)
            return pa.table({
                "dim": pa.array(np.arange(uniform, dtype=np.int64)),
                "mn": pa.array(mat.min(axis=0)),
                "mx": pa.array(mat.max(axis=0))})
        ndim = int(dims.max()) + 1
        mn = np.full(ndim, np.inf)
        mx = np.full(ndim, -np.inf)
        np.minimum.at(mn, dims, v)
        np.maximum.at(mx, dims, v)
        seen = mn <= mx  # dims with no value in this batch stay ±inf
        return pa.table({
            "dim": pa.array(np.nonzero(seen)[0].astype(np.int64)),
            "mn": pa.array(mn[seen]), "mx": pa.array(mx[seen])})

    parts = ds.select_columns([id_col, vec_col]).map_batches(
        stats_partial, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    if parts.empty:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "code_sum": pa.array([], pa.int64()),
            "n_dims": pa.array([], pa.int64())}))
    g = parts.groupby("dim")
    mins = g["mn"].min()
    dim_index = mins.index.to_numpy().astype(np.int64)
    ndim = int(dim_index.max()) + 1
    mn_full = np.full(ndim, np.nan)
    mx_full = np.full(ndim, np.nan)
    mn_full[dim_index] = mins.to_numpy()
    mx_full[dim_index] = g["mx"].max().to_numpy()
    ref = ray.put((mn_full, mx_full))

    def encode(b: pa.Table) -> pa.Table:
        mn, mx = worker_cached(("sq_stats", ref.hex()),
                               lambda: ray.get(ref))
        ids, row_idx, dims, v, _ = _flat_dims(b, id_col, vec_col)
        n_rows = len(ids)
        rng = mx[dims] - mn[dims]
        ratio = np.where(rng == 0.0, 0.0, (v - mn[dims]) / rng)
        code = duckdb_round(ratio * 255.0, 0).astype(np.int64)
        code_sum = np.bincount(row_idx, weights=code,
                               minlength=n_rows).astype(np.int64)
        n_el = np.bincount(row_idx, minlength=n_rows) \
            .astype(np.int64)
        keep = n_el > 0
        return pa.table({
            id_col: ids.take(pa.array(
                np.nonzero(keep)[0].astype(np.int64))),
            "cs": pa.array(code_sum[keep]),
            "ne": pa.array(n_el[keep])})

    enc = ds.select_columns([id_col, vec_col]).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg_hash(enc, [id_col],
                            {"cs": "code_sum", "ne": "n_dims"},
                            count_alias="_nr") \
        .drop_columns(["_nr"])


def sql_scalar_quantize(table: str = "embeddings",
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> str:
    return f"""
WITH x AS (
  SELECT {id_col}, CAST(unnest({vec_col}) AS DOUBLE) AS val,
         generate_subscripts({vec_col}, 1) AS dim
  FROM {table}),
f AS (SELECT {id_col}, val, dim FROM x
      WHERE val IS NOT NULL AND isfinite(val)),
stats AS (SELECT dim, min(val) AS mn, max(val) AS mx
          FROM f GROUP BY dim),
codes AS (
  SELECT {id_col},
         CASE WHEN mx = mn THEN 0
              ELSE CAST(round(((val - mn) / (mx - mn)) * 255, 0)
                        AS BIGINT) END AS code
  FROM f JOIN stats USING (dim))
SELECT {id_col}, CAST(sum(code) AS BIGINT) AS code_sum,
       CAST(count(*) AS BIGINT) AS n_dims
FROM codes GROUP BY {id_col} ORDER BY {id_col}"""
