"""Distributed candidate-pair plumbing shared by the dedup family
(minhash / embedding / phash near-dup, exact dedup).

Every near-dup pipeline here ends with the same shape: a Dataset of
(key_a, key_b) candidate pairs that may contain cross-band/table
duplicates, a distinct-key set used to broadcast-filter a second
narrow pass over the corpus, and a scoring step. At small scale the
pair set is driver-resident anyway (it feeds a broadcast), so the
dedup runs there; at 100-TB scale nothing corpus-proportional may
touch the driver — these helpers provide the DISTRIBUTED versions of
each step, and callers pick a path by MEASURED size against a cap
(degrade, never die)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def distinct_pairs(pairs, cols, num_partitions: int = None):
    """Distributed ``drop_duplicates`` over the pair columns: one narrow
    hash-partition shuffle of the pair rows, dedup vectorized inside each
    partition. Nothing lands on the driver."""
    from ..util import partitioned_group_apply
    cols = list(cols)
    return partitioned_group_apply(
        pairs, cols, lambda df: df.drop_duplicates(cols),
        num_partitions=num_partitions)


def pair_key_dataset(pairs, cols, out_col: str = "key",
                     num_partitions: int = None):
    """Dataset of DISTINCT values appearing in either pair column
    (the candidate-key set), computed without driver residency:
    explode both columns to one, then a partitioned dedup."""
    from ..util import partitioned_group_apply
    cols = list(cols)

    def explode(b: pa.Table) -> pa.Table:
        arrs = [b.column(c).combine_chunks() for c in cols]
        return pa.table({out_col: pa.concat_arrays(arrs)})

    keys = pairs.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partitioned_group_apply(
        keys, [out_col], lambda df: df.drop_duplicates([out_col]),
        num_partitions=num_partitions)


def collect_keys_if_small(keys_ds, cap_bytes: int, col: str = "key"):
    """Materialized distinct-key Dataset → sorted numpy array for a
    per-node ``ray.put`` broadcast IF it fits the cap, else ``None``
    (caller falls back to a distributed join). The broadcast object
    lives once per node in the plasma store (zero-copy numpy reads),
    so the cap bounds per-NODE footprint, not per-worker."""
    if keys_ds.size_bytes() > cap_bytes:
        return None
    arr = keys_ds.to_pandas()[col].to_numpy()
    return np.sort(arr)
