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


def cross_pairs_joined(pairs, new_keyed, seen_keyed, score_fn,
                       num_partitions: int, empty):
    """Shared distributed degrade path for the INCREMENTAL near-dup
    family (minhash + embedding): candidate pairs exceeded the driver
    gather cap, so dedup the (nkey, skey) pair set with one partitioned
    shuffle, attach both sides' payloads with two hash joins
    (``new_keyed`` carries (nkey, new_id, payload), ``seen_keyed``
    (skey, seen_id, payload)), score each joined row with ``score_fn``
    (a map_batches fn that thresholds), and collect ONLY the result —
    nothing candidate- or corpus-proportional lands on the driver."""
    if pairs.count() == 0:  # a zero-group shuffle loses the join schema
        return empty
    pairs = distinct_pairs(pairs, ["nkey", "skey"], num_partitions)
    jp = max(2, num_partitions // 16)
    both = pairs.join(new_keyed, "inner", jp, on=("nkey",)) \
        .join(seen_keyed, "inner", jp, on=("skey",))
    out = both.map_batches(score_fn, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if out.empty or "new_id" not in out.columns:
        return empty
    return out.drop_duplicates(["new_id", "seen_id"]) \
        .sort_values(["new_id", "seen_id"]).reset_index(drop=True)


def expand_pair_ranges(nlo, nhi, slo, shi):
    """Vectorized n-major expansion of per-pair row ranges: pair ``p``
    owning new rows [nlo[p], nhi[p]) and seen rows [slo[p], shi[p])
    expands to every (new row, seen row) combination — duplicate ids
    share a key, and scoring only the first row per key would miss a
    true duplicate hiding behind a same-id decoy. Returns (ni, si)
    index arrays into the SORTED per-side row arrays (empty when no
    pair expands). Replaces the per-pair Python loop (round-3 weak)."""
    tot = (nhi - nlo) * (shi - slo)
    total = int(tot.sum())
    if total == 0:
        return (np.array([], dtype=np.int64),) * 2
    prep = np.repeat(np.arange(len(tot), dtype=np.int64), tot)
    firsts = np.concatenate(([0], np.cumsum(tot)[:-1]))
    slot = np.arange(total, dtype=np.int64) - np.repeat(firsts, tot)
    scnt_p = (shi - slo)[prep]
    return nlo[prep] + slot // scnt_p, slo[prep] + slot % scnt_p


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
