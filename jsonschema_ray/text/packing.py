"""Training-sequence packing: assign documents to fixed-token-budget
packs by GLOBAL token prefix sum in id order — the batch-shaping step of
an LLM data pipeline (documents → ~window-token training sequences).

Semantics (deterministic, SQL-expressible): ``pack_id =
floor(prefix_sum_exclusive(n_tokens ORDER BY id) / window)`` — i.e. the
cumsum-division convention, not greedy bin packing, so the assignment is
independent of partitioning and exactly reproducible by a SQL window
function.

Scale shape (no global sort, no O(rows) driver state):
  1. narrow pass keeps only (id, n_tokens) and stamps ``bucket =
     id // bucket_size``;
  2. per-bucket token totals via ONE small groupby → the driver holds
     O(#buckets) rows (``bucket_size`` is the scale knob: 1M ids/bucket
     → 10^6 driver rows at 10^12 docs) and exclusive-cumsums them into
     per-bucket global offsets, broadcast once;
  3. ONE hash-partition on bucket (8+8 bytes/row): inside each bucket a
     vectorized sort-by-id + cumsum adds the bucket offset — every
     row's global prefix sum without any cross-partition exchange.

No reference analog (LLM-pipeline surplus surface, SURVEY §2.8)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pack_sequences(ds, id_col: str = "doc_id", tokens_col: str = "n_tokens",
                   window: int = 2048, bucket_size: int = 4096,
                   num_partitions: int = None):
    """(id, n_tokens) Dataset → (id, n_tokens, pack_id) Dataset.

    ``id_col`` and ``tokens_col`` must be integer-typed (the bucket
    stamp is ``id // bucket_size``; float token counts would truncate
    differently in the bucket-total and per-row passes). Null token
    counts pack as 0 tokens (SQL SUM-OVER ignores NULLs) but keep their
    null ``n_tokens`` in the output. Duplicate ids are ordered by
    (id, n_tokens) so the assignment stays deterministic — note SQL
    window frames over duplicate ORDER BY keys are themselves
    tie-ambiguous, so oracles should use unique ids."""
    import ray
    from ray.data.aggregate import Sum

    from ..util import partitioned_group_apply, worker_cached

    id_t = ds.schema().base_schema.field(id_col).type
    tok_t = ds.schema().base_schema.field(tokens_col).type
    if not (pa.types.is_integer(id_t) and pa.types.is_integer(tok_t)):
        raise TypeError(
            f"pack_sequences needs integer id/token columns, got "
            f"{id_col}: {id_t}, {tokens_col}: {tok_t}")

    def bucketize(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: b[id_col], tokens_col: b[tokens_col],
                         "_bkt": pa.array(ids // bucket_size)})

    keyed = ds.select_columns([id_col, tokens_col]).map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()  # feeds the totals pass AND the bucket shuffle
    if keyed.count() == 0:
        # empty shard: typed empty result (a zero-row map_batches block is
        # schema-less and would crash the groupby)
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_t),
            tokens_col: pa.array([], type=tok_t),
            "pack_id": pa.array([], type=pa.int64())}))

    tot = keyed.groupby("_bkt").aggregate(
        Sum(tokens_col, alias_name="_t")).to_pandas().sort_values("_bkt")
    sums = tot["_t"].fillna(0).to_numpy(dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(sums)[:-1]))
    bkt_ids = tot["_bkt"].to_numpy(dtype=np.int64)
    oref = ray.put((bkt_ids, offs))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        bkts, boffs = worker_cached(("packoffs", oref.hex()),
                                    lambda: ray.get(oref))
        outs = []
        for bkt, g in df.groupby("_bkt", sort=False):
            # secondary tokens key pins duplicate-id tie order (arrival
            # order varies run to run in a distributed read)
            g = g.sort_values([id_col, tokens_col], kind="mergesort")
            c = g[tokens_col].fillna(0).to_numpy(dtype=np.int64)
            base = boffs[np.searchsorted(bkts, int(bkt))]
            before = base + np.concatenate(([0], np.cumsum(c)[:-1]))
            outs.append(pd.DataFrame({
                id_col: g[id_col].to_numpy(),
                # nullable Int64: a partition with any null token count
                # otherwise converts the whole column to float64, making
                # the OUTPUT schema data-dependent (int64 vs double)
                tokens_col: g[tokens_col].astype("Int64"),
                "pack_id": (before // window).astype(np.int64)}))
        if not outs:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 tokens_col: pd.Series([], dtype="Int64"),
                                 "pack_id": pd.Series([], dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    return partitioned_group_apply(keyed, ["_bkt"], part,
                                   num_partitions=num_partitions)
