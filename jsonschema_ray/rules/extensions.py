"""Custom-keyword registry + engine options.

The analogs of the reference's vocabulary extension surface:

- ``register_keyword(name, row_fn, vector_fn=None)`` — custom `Keyword`
  with its own Validate function (pkg/types/schema/schema.go:851-874,
  RegisterVocabulary schema.go:1293-1330). ``row_fn(value, arg) -> bool``
  is the per-value predicate; ``vector_fn(arr: pa.Array, arg) ->
  np.bool_[n]`` is the optional vectorized form — without it the engine
  applies ``row_fn`` over the batch's DISTINCT values (same memoization as
  the format library). Registered keywords are skipped (always valid) for
  null/absent members, like every reference leaf keyword.
- ``apply_defaults(table, ruleset)`` — the ApplyDefaults option
  (ValidateOpts, schema.go:717-748; consumption in properties,
  internal/validator/validator.go:520-526): fill null members from the
  ``default`` keyword of their property subschema, as a vectorized
  fill_null pass.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .model import RuleSet, parse_ruleset

# name -> (row_fn, vector_fn or None)
_CUSTOM_KEYWORDS: dict[str, tuple] = {}


def register_keyword(name: str, row_fn: Callable[[Any, Any], bool],
                     vector_fn: Optional[Callable] = None) -> None:
    if name.startswith("$"):
        raise ValueError("custom keywords cannot start with '$'")
    _CUSTOM_KEYWORDS[name] = (row_fn, vector_fn)


def unregister_keyword(name: str) -> None:
    _CUSTOM_KEYWORDS.pop(name, None)


def lookup_keyword(name: str):
    return _CUSTOM_KEYWORDS.get(name)


def _parse_ts_us(arg: Any) -> int:
    import pandas as pd
    return int(pd.Timestamp(arg).value // 1000)


def _ts_value_us(v: Any):
    import datetime

    import pandas as pd
    if isinstance(v, (datetime.datetime, datetime.date)):
        return int(pd.Timestamp(v).value // 1000)
    return None


def _x_before_row(v, arg):
    us = _ts_value_us(v)
    return us is None or us < _parse_ts_us(arg)


def _x_after_row(v, arg):
    us = _ts_value_us(v)
    return us is None or us > _parse_ts_us(arg)


def _ts_vector(op):
    def fn(arr: pa.Array, arg):
        # timestamp/date only: is_temporal also admits duration/time,
        # which Arrow cannot cast to timestamp — the row engine treats
        # those as not-applicable, so must the vector path
        if not (pa.types.is_timestamp(arr.type)
                or pa.types.is_date(arr.type)):
            return np.ones(len(arr), dtype=bool)
        us = pc.cast(arr, pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bound = _parse_ts_us(arg)
        with np.errstate(invalid="ignore"):
            return op(us, bound)
    return fn


# Built-in temporal comparison keywords — an ENGINE EXTENSION beyond the
# reference (JSON has no timestamp type; Arrow tables do). Registered like
# any user keyword so they flow through the same custom-keyword machinery:
#   {"properties": {"l_shipdate": {"x-before": "1998-09-03"}}}
register_keyword("x-before", _x_before_row,
                 vector_fn=_ts_vector(np.less))
register_keyword("x-after", _x_after_row,
                 vector_fn=_ts_vector(np.greater))


def apply_defaults(table: pa.Table, ruleset) -> pa.Table:
    """Fill null cells of each column whose property subschema carries a
    ``default``. Missing columns with defaults are appended as constant
    columns (the tabular analog of inserting the member)."""
    rs = ruleset if isinstance(ruleset, RuleSet) else parse_ruleset(ruleset)
    props = rs.root.get("properties") or {}
    for name, sub in props.items():
        if sub is None or getattr(sub, "bool_value", None) is not None:
            continue
        if not sub.has("default"):
            continue
        dflt = sub.get("default")
        if name in table.column_names:
            col = table.column(name)
            if col.null_count:
                idx = table.column_names.index(name)
                filled = pc.fill_null(col, pa.scalar(dflt))
                table = table.set_column(idx, name, filled)
        else:
            # type pinned from the default VALUE: pa.array([]) on an
            # empty shard would infer null and disagree with every
            # non-empty batch of the same stream
            dtype = pa.array([dflt]).type
            table = table.append_column(
                name, pa.array([dflt] * table.num_rows, type=dtype))
    return table
