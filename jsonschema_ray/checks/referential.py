"""Referential-integrity check as a BROADCAST hash semi/anti-join.

The reference's nearest analog is the `$ref` static link + pluggable Loader
fetch (pkg/types/schema/schema.go:1045-1052, pkg/draft202012/builder.go:
327-405): a small reference universe resolved once, consulted everywhere.

Scale design (SURVEY §2.6 "Join / lookup" row): the reference key table is
assumed SMALL relative to the fact table (a key universe). It is read once,
put in the object store (``ray.put``), and each map_batches task/actor reads
the same shared copy — NO shuffle of the big side ever happens. For key
universes too big for one object, swap the set for a Bloom filter (same
stage shape); a shuffle join is deliberately not used here.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray


def _semi_join_batch(batch: pa.Table, *, key: str, value_set_ref,
                     keep: str) -> pa.Table:
    """Task body: the broadcast key set (exact Arrow array OR Bloom filter
    for huge universes) is fetched from the object store ONCE per worker
    process (worker_cached on the ref), then each batch filters with
    pc.is_in / vectorized bloom membership — no shuffle."""
    import numpy as np

    from ..sketches.bloom import BloomFilter
    from ..util import worker_cached

    def fetch():
        vs = ray.get(value_set_ref)
        if isinstance(vs, BloomFilter):
            return vs
        return vs if isinstance(vs, pa.Array) else pa.array(vs)

    value_set = worker_cached(("semijoin", value_set_ref.hex()), fetch)
    col = batch.column(key)
    if isinstance(value_set, BloomFilter):
        hit = pa.array(value_set.contains_column(col))
    else:
        hit = pc.is_in(col, value_set=value_set)
    valid = pc.is_valid(col)
    if keep == "missing":  # anti-join: present key, no match
        mask = pc.and_(valid, pc.invert(hit))
    else:  # semi-join
        mask = pc.and_(valid, hit)
    return batch.filter(mask)


def _broadcast_keys(ref_ds_or_array, key: Optional[str],
                    bloom_fp: Optional[float] = None):
    from ..sketches.bloom import BloomFilter
    if isinstance(ref_ds_or_array, BloomFilter):
        return ray.put(ref_ds_or_array)
    if isinstance(ref_ds_or_array, (pa.Array, pa.ChunkedArray, list)):
        arr = pa.array(ref_ds_or_array) \
            if isinstance(ref_ds_or_array, list) else ref_ds_or_array
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        uniq = pc.unique(arr)
    else:
        # a Dataset: pull the (small) distinct key column to the driver once
        tbl = ref_ds_or_array.select_columns([key]).to_arrow_refs()
        parts = [pa.Table.from_batches(t.to_batches(), schema=t.schema)
                 for t in ray.get(tbl)]
        nonempty = [p for p in parts if p.num_rows]
        if nonempty:
            whole = pa.concat_tables(nonempty)
            uniq = pc.unique(whole.column(key).combine_chunks())
        else:
            # a legitimately EMPTY reference universe (every fact row is
            # an orphan) must not crash pa.concat_tables([])
            key_type = ref_ds_or_array.schema().base_schema.field(key).type
            uniq = pa.array([], type=key_type)
    if bloom_fp is not None:
        # huge key universes: ship m bits instead of the exact set; ONLY
        # false positives (missed orphans at rate ≈ fp), never false
        # "orphan" reports
        bf = BloomFilter(len(uniq), fp=bloom_fp)
        bf.add_column(uniq)
        return ray.put(bf)
    return ray.put(uniq)


def broadcast_semi_join(ds, key: str, ref, ref_key: Optional[str] = None,
                        anti: bool = False, columns: Optional[list] = None,
                        batch_size: int = 131072, concurrency=None,
                        bloom_fp: Optional[float] = None):
    """Filter ``ds`` to rows whose ``key`` is (semi) / is not (anti) in the
    reference key universe. ``ref`` may be a Dataset, pyarrow array, list,
    or a pre-built BloomFilter; ``bloom_fp`` switches the broadcast side to
    a Bloom filter of that false-positive rate (for key universes too big
    to ship exactly — semi-joins keep every true match, anti-joins may
    miss orphans at rate ≈ fp)."""
    import functools
    vs_ref = _broadcast_keys(ref, ref_key or key, bloom_fp=bloom_fp)
    if columns is not None:
        ds = ds.select_columns(columns)
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        functools.partial(_semi_join_batch, key=key, value_set_ref=vs_ref,
                          keep="missing" if anti else "present"),
        **kwargs)


def referential_violations(ds, key: str, ref, ref_key: Optional[str] = None,
                           batch_size: int = 131072):
    """Orphan rows rendered as violation rows (keyword ``x-referential``)."""
    orphans = broadcast_semi_join(ds, key, ref, ref_key=ref_key, anti=True,
                                  columns=[key], batch_size=batch_size)

    def to_violations(b: pa.Table) -> pa.Table:
        vals = pc.cast(b.column(key), pa.string())
        n = b.num_rows
        return pa.table({
            key: b.column(key),
            "keyword": pa.array(["x-referential"] * n),
            "keyword_location": pa.array(["/x-referential"] * n),
            "instance_location": pa.array([f"/{key}"] * n),
            "offending_value": vals,
            "message": pa.array(
                [f"x-referential: {key} not in reference key set"] * n),
        })

    return orphans.map_batches(to_violations, batch_format="pyarrow")
