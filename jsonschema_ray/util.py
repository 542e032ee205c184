"""Small shared helpers for Ray Data stages."""

from __future__ import annotations

import os

import numpy as np


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


def partitioned_group_apply(ds, keys: list[str], partition_fn,
                            num_partitions: int = 64,
                            batch_size: int = 131072):
    """Hash-partition on ``keys`` into ``num_partitions`` coarse groups and
    apply ``partition_fn(pandas.DataFrame) -> DataFrame`` once per
    partition. The fn sees every row of every key-group it owns (groups
    never split across partitions) and is responsible for its own
    within-partition groupby — typically vectorized."""
    stamped = add_partition_column(ds, keys, num_partitions,
                                   batch_size=batch_size)
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
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 4)
        else:
            cpus = os.cpu_count() or 4
    except Exception:  # pragma: no cover
        cpus = os.cpu_count() or 4
    return (1, max(2, min(cap, cpus)))
