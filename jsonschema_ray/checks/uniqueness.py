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


class _BatchKeyCounts:
    """Combiner: one (key, partial_count) row per distinct key per batch."""

    def __init__(self, keys: list[str]):
        self.keys = keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        gb = batch.select(self.keys).group_by(self.keys)
        return gb.aggregate([([], "count_all")]).rename_columns(
            self.keys + ["partial_count"])


def duplicate_keys(ds, key, batch_size: int = 131072):
    """Dataset → small Dataset of ``(*key, dup_count)`` for keys appearing
    more than once. ``dup_count`` is int64."""
    keys = [key] if isinstance(key, str) else list(key)
    projected = ds.select_columns(keys)  # wide columns never shuffle
    from ..util import default_concurrency
    partials = projected.map_batches(
        _BatchKeyCounts, fn_constructor_kwargs=dict(keys=keys),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        concurrency=default_concurrency())
    from ray.data.aggregate import Sum
    counts = partials.groupby(keys).aggregate(
        Sum("partial_count", alias_name="dup_count"))
    # pyarrow-level filter keeps the (key, dup_count) schema even when the
    # result is empty (Dataset.filter(expr=...) drops it, breaking sinks
    # and the driver's schema compare)
    import pyarrow.compute as _pc
    return counts.map_batches(
        lambda t: t.filter(_pc.greater(t["dup_count"], 1)),
        batch_format="pyarrow", zero_copy_batch=True)


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
