"""Ray Data validation stages.

The per-record half of the engine (SURVEY §3.4 stage A): a compiled RuleSet
evaluated inside ``map_batches`` with zero-copy Arrow batches. The rule set
is compiled ONCE per actor in ``__init__`` (the reference compiles schemas
once and validates many instances; we additionally pre-compile regexes,
fixing validator.go:542's per-call compilation).

Stateless use (plain function) is supported too — compilation is cheap —
but the actor-pool form is the default for wide rule sets.
"""

from __future__ import annotations

import json
from typing import Any, Optional, Union

import pyarrow as pa

from ..rules.model import RuleSet, parse_ruleset
from ..rules.vector import BatchValidator

RulesetLike = Union[dict, str, RuleSet]


def _as_ruleset(rs: RulesetLike) -> RuleSet:
    if isinstance(rs, RuleSet):
        return rs
    return parse_ruleset(rs)


class ValidatorStage:
    """Actor-pool callable for ``map_batches``.

    mode="violations" → emits one row per violation
      ``(*key_columns, keyword, keyword_location, instance_location,
      offending_value, message)``
    mode="annotate"   → passes the batch through with an appended boolean
      ``_valid`` column (for filter-style pipelines)
    mode="valid" / "invalid" → filters the batch to passing / failing rows
    """

    def __init__(self, ruleset: RulesetLike,
                 key_columns: Optional[list[str]] = None,
                 mode: str = "violations", validate_format: bool = True):
        if isinstance(ruleset, str):
            ruleset = json.loads(ruleset)
        self.validator = BatchValidator(_as_ruleset(ruleset),
                                        key_columns=key_columns or [],
                                        validate_format=validate_format)
        if mode not in ("violations", "annotate", "valid", "invalid"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "violations":
            return self.validator.violations(batch)
        mask = self.validator.mask(batch)
        if self.mode == "annotate":
            return batch.append_column("_valid", pa.array(mask))
        keep = mask if self.mode == "valid" else ~mask
        return batch.filter(pa.array(keep))


def _validate_batch(batch: pa.Table, *, doc_json: str, key_columns: tuple,
                    mode: str, validate_format: bool) -> pa.Table:
    """Module-level task body: the compiled validator is cached per worker
    PROCESS (util.worker_cached), so stateless Ray tasks get load-once
    state without paying actor-pool cold starts per stage."""
    from ..util import worker_cached
    stage = worker_cached(
        ("validator", doc_json, key_columns, mode, validate_format),
        lambda: ValidatorStage(json.loads(doc_json),
                               key_columns=list(key_columns), mode=mode,
                               validate_format=validate_format))
    return stage(batch)


def _stage_fn(ruleset: RulesetLike, key_columns, mode, validate_format):
    import functools

    from ..rules.model import canonical_json
    rs = _as_ruleset(ruleset)
    return functools.partial(_validate_batch,
                             doc_json=canonical_json(rs.doc),
                             key_columns=tuple(key_columns or ()),
                             mode=mode, validate_format=validate_format)


def validate_dataset(ds, ruleset: RulesetLike, key_columns: list[str],
                     batch_size: int = 65536, concurrency=None,
                     validate_format: bool = True):
    """Dataset of rows → Dataset of violation rows (streaming; no
    materialization). ``ds.count() == 0`` ⇔ table passes."""
    kwargs: dict[str, Any] = dict(batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        _stage_fn(ruleset, key_columns, "violations", validate_format),
        **kwargs)


def sort_violations(ds, key_columns: list[str]):
    """Deterministic violation ordering for exact-match comparison
    (FIXTURES F4 / SURVEY §7 hard part (d)): sort by (keys, keyword,
    instance_location). Violations are ~0.1% of rows, so the sort is over
    a small dataset."""
    return ds.sort(key_columns + ["keyword", "instance_location"])


def annotate_dataset(ds, ruleset: RulesetLike, batch_size: int = 65536,
                     concurrency=None, validate_format: bool = True):
    """Dataset → same Dataset + ``_valid`` boolean column."""
    kwargs: dict[str, Any] = dict(batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        _stage_fn(ruleset, None, "annotate", validate_format), **kwargs)
