"""Small shared helpers for Ray Data stages."""

from __future__ import annotations

import os

import numpy as np

# ---------------------------------------------------------------------------
# per-worker-process state cache
#
# Light compiled state (a compiled rule set, regexes, minhash coefficients,
# a broadcast lookup) is cached per WORKER PROCESS rather than held in actor
# pools: Ray reuses warm worker processes across task stages, so the state
# builds once per process per session — while an actor pool pays a fresh
# cold-start (interpreter + imports + construct) for EVERY stage it appears
# in, at every concurrency slot. Measured on the flagship: 32 actors ×
# ~1 s startup ≈ 32 core-seconds of ramp for a job with ~50 core-seconds
# of real work (and inverse scaling at high num_cpus). Actor pools remain
# the right tool for heavy state (models, large indexes) — see the
# reference's process-wide caches analog (fieldCache sync.Map,
# internal/validator/fields.go:291-300).

_WORKER_CACHE: dict = {}
_WORKER_CACHE_CAP = 64


def worker_cached(key, factory):
    """Build-once-per-worker-process memo with FIFO eviction.

    Broadcast objects (candidate key sets, sig tables, query matrices)
    are keyed by their ObjectRef hex, which is unique per RUN — a
    long-lived worker serving many runs would otherwise accumulate every
    broadcast it ever saw. 64 entries comfortably hold one pipeline's
    working set; evicted entries just rebuild/refetch."""
    v = _WORKER_CACHE.get(key)
    if v is None:
        if len(_WORKER_CACHE) >= _WORKER_CACHE_CAP:
            _WORKER_CACHE.pop(next(iter(_WORKER_CACHE)))
        v = _WORKER_CACHE[key] = factory()
    return v


def _cluster_cpus(default: int = 8) -> int:
    """Cluster CPU count (Ray resources when initialized, else the local
    box) — the ONE detection both auto_partitions and
    default_concurrency size themselves from."""
    try:
        import ray
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or default)
        return os.cpu_count() or default
    except Exception:  # pragma: no cover
        return os.cpu_count() or default


def auto_partitions(mult: int = 2, lo: int = 8, hi: int = 256) -> int:
    """Coarse-partition count sized to the cluster: ~2× the CPUs, floored
    so small clusters still get group parallelism and capped so per-group
    task overhead stays bounded. A FIXED count (the old 64) wastes task
    overhead at low parallelism and under-splits giant clusters."""
    return max(lo, min(hi, mult * _cluster_cpus(8)))


def add_partition_column(ds, keys: list[str], num_partitions: int,
                         col: str = "_part", batch_size: int = 131072):
    """Append a coarse hash-partition column over the key columns.

    Group-wise operators here NEVER run ``groupby(fine_key).map_groups``
    directly when the fine key has high cardinality: Ray Data invokes the
    group fn once per group, and millions of tiny groups drown in per-group
    overhead. Instead we shuffle ONCE on a bounded ``_part`` key
    (num_partitions ≈ a few × cluster cores) and run the per-group logic
    vectorized inside each partition — same result, per-partition batching.
    """
    from .sketches.hashing import _splitmix64, hash64_array

    def stamp(batch):
        import pyarrow as pa
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for k in keys:
            col_arr = batch.column(k)
            if isinstance(col_arr, pa.ChunkedArray):
                col_arr = col_arr.combine_chunks()
            h = _splitmix64(h ^ hash64_array(col_arr))
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(col, pa.array(part))

    return ds.map_batches(stamp, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)


def ranges_concat(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+len) index ranges — vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    rows = np.nonzero(lengths > 0)[0]
    reps = lengths[rows]
    base = np.repeat(starts[rows], reps)
    firsts = np.concatenate(([0], np.cumsum(reps)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(firsts, reps)
    return base + pos


def sorted_segments(cols: list[np.ndarray], m: int
                    ) -> tuple[np.ndarray, np.ndarray]:
    """(seg_start_per_row, pos_within_segment) for PRE-SORTED key
    columns — the one audited home of the boundaries idiom shared by
    segment_pairs and rank-style partition fns (a third hand-rolled
    copy is how off-by-one rank bugs breed)."""
    new_seg = np.ones(m, dtype=bool)
    new_seg[1:] = False
    for c in cols:
        new_seg[1:] |= c[1:] != c[:-1]
    seg_start = np.nonzero(new_seg)[0][np.cumsum(new_seg) - 1]
    return seg_start, np.arange(m, dtype=np.int64) - seg_start


def segment_pairs(sort_cols: list[np.ndarray], cap: int
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All intra-bucket index pairs (a < b in sort order), fully vectorized.

    LSH verify stages have ~1 bucket per few rows; a per-bucket Python loop
    costs ~100 µs/bucket (measured 16 s for 100k buckets) while this runs
    in a handful of array ops. Buckets are truncated to ``cap`` rows (hot
    bucket guard). Returns (a_idx, b_idx, order) where the indices address
    the SORTED arrays and ``order`` maps sorted position → input row."""
    order = np.lexsort(sort_cols[::-1])
    n = len(order)
    if n < 2:
        return (np.array([], dtype=np.int64),) * 2 + (order,)

    sorted_cols = [c[order] for c in sort_cols]
    seg_start, pos = sorted_segments(sorted_cols, n)
    keep = pos < cap
    if not keep.all():
        order = order[keep]
        sorted_cols = [c[keep] for c in sorted_cols]
        n = len(order)
        seg_start, pos = sorted_segments(sorted_cols, n)
    b_idx = np.repeat(np.arange(n, dtype=np.int64), pos)
    a_idx = ranges_concat(seg_start, pos)
    return a_idx, b_idx, order


def partitioned_group_apply(ds, keys: list[str], partition_fn,
                            num_partitions: int = None,
                            batch_size: int = 131072,
                            batch_format: str = "pandas"):
    """Hash-partition on ``keys`` into ``num_partitions`` coarse groups and
    apply ``partition_fn(pandas.DataFrame) -> DataFrame`` once per
    partition. The fn sees every row of every key-group it owns (groups
    never split across partitions) and is responsible for its own
    within-partition groupby — typically vectorized.

    ``batch_format="pyarrow"`` hands the fn a ``pa.Table`` instead — the
    REQUIRED choice when the partition rows carry null-bearing int64
    payload columns (a pandas roundtrip converts those to float64,
    silently rounding values past 2^53)."""
    stamped = add_partition_column(ds, keys,
                                   num_partitions or auto_partitions(),
                                   batch_size=batch_size)
    if batch_format == "pyarrow":
        out = stamped.groupby("_part").map_groups(
            lambda t: partition_fn(t.drop_columns(["_part"])),
            batch_format="pyarrow")
    else:
        out = stamped.groupby("_part").map_groups(
            lambda df: partition_fn(df.drop(columns=["_part"])),
            batch_format="pandas")
    return out


def default_concurrency(cap: int = 32) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (min, max) sized to the cluster.

    Ray Data requires explicit ``concurrency`` for callable-class stages; an
    autoscaling (1, N) pool lets the streaming executor balance this stage
    against the read/write stages instead of starving them (ray_guide:
    'a pool that reserves every CPU starves the read and write stages')."""
    return (1, max(2, min(cap, _cluster_cpus(4))))


def duckdb_round(a, nd: int = 2):
    """DuckDB-parity ``round(DOUBLE, nd)``: DuckDB computes
    ``std::round(x * 10^nd) / 10^nd`` — an fp multiply, then
    ties-AWAY-from-zero on the scaled double. numpy/pandas ``round``
    instead round the BINARY value half-to-even, so any aggregate
    landing within one ulp of a half-cent diverges (observed:
    sum=74251.48500000000058 → DuckDB .49, pandas .48). The tie branch
    is exact: for |v| ≥ 1, floor(|v|) is within a factor 2 of |v| so
    the Sterbenz lemma makes ``|v| - floor(|v|)`` exact; for |v| < 1
    the subtraction is trivially exact; above 2^52 the fraction is 0.
    Property-tested equal to DuckDB on 30k adversarial doubles
    (test_session13_ops). NaN propagates; use where an oracle rounds a
    value whose granularity can hit the half boundary."""
    p = float(10 ** nd)
    v = np.asarray(a, dtype=np.float64) * p
    av = np.abs(v)
    f = np.floor(av)
    return np.copysign(np.where(av - f >= 0.5, f + 1.0, f), v) / p


def partial_topk(ds, sort_cols: list[str], ascending: list[bool],
                 k: int, round_col: str = None):
    """Distributed top-k: per-block partial top-k inside map_batches,
    then the same sort over the O(blocks·k) survivors on the driver —
    only k rows per block ever gather, the group set never does.
    ``round_col`` is rounded to 2 dp BEFORE ranking (the oracle
    convention — both levels must rank the rounded value or a pair
    rounding to a tie could order differently across engines). Returns
    the k-row DataFrame, or None when the upstream pipeline was
    all-empty (Ray drops its schema and the gather is column-less).
    One home for the relational _partial_topk AND the text-side PMI
    ranking (moving it here removed a pipelines<-text layer
    inversion)."""
    import pyarrow as pa

    def local_topk(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if round_col is not None:
            df[round_col] = df[round_col].round(2)
        df = df.sort_values(sort_cols, ascending=ascending,
                            kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    surv = ds.map_batches(local_topk, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if surv.empty or sort_cols[0] not in surv.columns:
        return None
    return surv.sort_values(sort_cols, ascending=ascending,
                            kind="mergesort").head(k) \
        .reset_index(drop=True)
