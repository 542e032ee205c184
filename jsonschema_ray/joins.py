"""Distributed as-of join — an operator Ray Data lacks, expressed as the
prompt's pattern (a): ONE co-partition of both sides on hash(by) + a
vectorized per-partition merge (lexsort + running-max scan), no per-group
Python loop.

Semantics (ANSI/DuckDB ``ASOF JOIN``): for each LEFT row, attach the
chosen value columns of the LATEST right row with ``right_on <= left_on``
(inclusive; ``<`` when inclusive=False) within the same ``by`` group;
left rows with no match keep nulls (left join).

Tie behavior: when several right rows share the winning ``on`` value the
LAST one in (on, input-order) wins — callers needing determinism against
an oracle should select value columns that are functions of the match
KEY (e.g. the matched timestamp itself), as ties are unordered in SQL
ASOF too.

Partitioning assumption (documented per the prompt's custom-operator
rule): a ``by`` group must fit one partition — guaranteed by hash
co-partitioning on ``by``; per-partition memory is bounded by the largest
group cluster, as for any equi-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _arrow_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset, tolerating pandas-block upstreams
    (``from_pandas`` / ``map_groups(batch_format='pandas')`` emit a
    PandasBlockSchema without ``.field``)."""
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for nm, dt in zip(base.names, base.types):
        if isinstance(dt, pa.DataType):
            fields.append(pa.field(nm, dt))
        else:
            try:
                fields.append(pa.field(nm, pa.from_numpy_dtype(dt)))
            except (pa.ArrowNotImplementedError, TypeError):
                fields.append(pa.field(nm, pa.string()))  # object dtype
    return pa.schema(fields)


_RESERVED_COLS = ("_by", "_on", "_ord", "_part")
_EXACT_INT_BOUND = 1 << 53


def _check_names(left_names, out_names, ctx: str):
    """The co-partitioned joins stage internal columns (_by/_on/_ord,
    plus partitioned_group_apply's _part) and write output value
    columns next to the left payload — a user column with one of those
    names would be silently overwritten or dropped. Refuse loudly."""
    clash = set(_RESERVED_COLS) & set(left_names)
    if clash:
        raise ValueError(f"{ctx}: left columns {sorted(clash)} collide "
                         "with internal join columns — rename them")
    out_clash = set(out_names) & set(left_names)
    if out_clash:
        raise ValueError(f"{ctx}: output columns {sorted(out_clash)} "
                         "collide with existing left columns — rename "
                         "the left columns or pick other value_cols")


def _guard_exact_ints(b: pa.Table, cols, ctx: str):
    """Integer columns ride the per-partition merge through pandas,
    where null padding upcasts them to float64 — a value past ±2^53
    would come back silently ROUNDED after the restore cast. Refuse
    loudly instead (one vectorized min_max per integer column per
    batch); callers with snowflake-scale ids cast to string or
    decimal128 before the join."""
    for c in cols:
        col = b[c]
        if not pa.types.is_integer(col.type) or b.num_rows == 0:
            continue
        mm = pc.min_max(col)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if (hi is not None and hi > _EXACT_INT_BOUND) or \
                (lo is not None and lo < -_EXACT_INT_BOUND):
            raise ValueError(
                f"{ctx}: integer column {c!r} holds values beyond "
                "±2^53; the pandas merge would silently round them — "
                "cast the column to string or decimal128 first")


def _restore_fn(out_fields, ctx: str):
    """Cast the merged (pandas-typed) blocks back to the declared Arrow
    types, turning an impossible cast (e.g. an object column that was
    not actually strings) into a named error instead of a bare
    ArrowNotImplementedError from deep inside the plan."""
    def restore(b: pa.Table) -> pa.Table:
        cols = {}
        for f in out_fields:
            try:
                cols[f.name] = b[f.name].cast(f.type, safe=False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError) as e:
                raise TypeError(
                    f"{ctx}: column {f.name!r} could not be restored to "
                    f"its declared type {f.type} — pandas-block object "
                    "columns must hold strings (cast other object "
                    "payloads upstream)") from e
        return pa.table(cols)
    return restore


def _sortable_kind(t: pa.DataType, name: str) -> str:
    if pa.types.is_timestamp(t) or pa.types.is_date(t) \
            or pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    raise TypeError(f"asof_join: unsupported `on` column type {t} "
                    f"({name}); need numeric or temporal")


def _resolve_on_type(lt: pa.DataType, rt: pa.DataType, lname: str,
                     rname: str) -> pa.DataType:
    """ONE reconciled ``_on`` type for both sides — divergent per-side
    types (int64 left, float64 right) would otherwise produce union
    blocks whose schemas disagree, with version-dependent coercion."""
    kinds = {_sortable_kind(lt, lname), _sortable_kind(rt, rname)}
    return pa.float64() if "float" in kinds else pa.int64()


def _sortable(col: pa.ChunkedArray, name: str, target: pa.DataType):
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        col = pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    elif pa.types.is_integer(t):
        col = pc.cast(col, pa.int64())
    elif pa.types.is_floating(t):
        col = pc.cast(col, pa.float64())
    else:
        raise TypeError(f"asof_join: unsupported `on` column type {t} "
                        f"({name}); need numeric or temporal")
    return pc.cast(col, target)


def asof_join(left, right, by: str, on: str, right_by: str = None,
              right_on: str = None, value_cols: list[str] = None,
              inclusive: bool = True, num_partitions: int = None,
              batch_size: int = 131072, direction: str = "backward"):
    """Dataset × Dataset → Dataset: left columns + matched right
    ``value_cols`` (suffixed ``_r`` on name clash, null when no match).

    ``direction``: "backward" (default) matches the LAST right row with
    right_on <= on (< when not inclusive); "forward" matches the FIRST
    right row with right_on >= on (> when not inclusive). Among several
    right rows tied at the matched time the pick is sort-arbitrary in
    both directions — deterministic only when value_cols are functions
    of (by, on), as for the date-valued pipelines here."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    from .util import partitioned_group_apply
    right_by = right_by or by
    right_on = right_on or on
    value_cols = list(value_cols or [])

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_names = list(lschema.names)
    out_val = {c: (c if c not in left_names else c + "_r")
               for c in value_cols}
    _check_names(left_names,
                 [v for k, v in out_val.items() if v != k], "asof_join")
    vtypes = {c: rschema.field(c).type for c in value_cols}
    on_type = _resolve_on_type(lschema.field(on).type,
                               rschema.field(right_on).type, on, right_on)

    # the union schema both sides emit: left payload + _by/_on/_ord + the
    # right value columns (typed nulls on the left side).
    # Sort order at equal `on`: a right row visible to an equal-time
    # left row must sort BEFORE it under backward (the scan looks back)
    # and AFTER it under forward (the scan looks ahead).
    if direction == "backward":
        right_first = 0 if inclusive else 2
    else:
        right_first = 2 if inclusive else 0

    def prep_left(b: pa.Table) -> pa.Table:
        _guard_exact_ints(b, left_names + [by], "asof_join")
        n = b.num_rows
        cols = {nm: b[nm] for nm in left_names}
        cols["_by"] = b[by]
        cols["_on"] = _sortable(b[on], on, on_type)
        cols["_ord"] = pa.array(np.full(n, 1, dtype=np.int8))
        for c in value_cols:
            cols[out_val[c]] = pa.nulls(n, type=vtypes[c])
        return pa.table(cols)

    def prep_right(b: pa.Table) -> pa.Table:
        # drop right rows with null key/time: they can never match
        keep = pc.and_(pc.is_valid(b[right_by]), pc.is_valid(b[right_on]))
        b = b.filter(keep)
        _guard_exact_ints(b, value_cols + [right_by], "asof_join")
        n = b.num_rows
        cols = {}
        for nm in left_names:
            cols[nm] = pa.nulls(n, type=lschema.field(nm).type)
        cols["_by"] = pc.cast(b[right_by], lschema.field(by).type)
        cols["_on"] = _sortable(b[right_on], right_on, on_type)
        cols["_ord"] = pa.array(np.full(n, right_first, dtype=np.int8))
        for c in value_cols:
            cols[out_val[c]] = b[c]
        return pa.table(cols)

    lt = left.map_batches(prep_left, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
    rt = right.map_batches(prep_right, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    union = lt.union(rt)

    val_names = [out_val[c] for c in value_cols]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_by", "_on", "_ord"], kind="mergesort",
                            na_position="last")
        n = len(df)
        idx = np.arange(n)
        is_r = df["_ord"].to_numpy() != 1
        byv = df["_by"].to_numpy()
        newg = np.ones(n, dtype=bool)
        newg[1:] = byv[1:] != byv[:-1]
        if direction == "backward":
            lastr = np.where(is_r, idx, -1)
            np.maximum.accumulate(lastr, out=lastr)
            gstart = idx[newg][np.cumsum(newg) - 1]
            match = np.where(lastr >= gstart, lastr, -1)
        else:
            # forward: FIRST right row at-or-after — reverse min-scan,
            # bounded by the group END instead of the group start
            nextr = np.where(is_r, idx, n)
            nextr = np.minimum.accumulate(nextr[::-1])[::-1]
            gend = np.append(idx[newg][1:] - 1, n - 1)[
                np.cumsum(newg) - 1]
            match = np.where(nextr <= gend, nextr, -1)
        # a left row with null `on` never matches (sorted last, would
        # otherwise see the whole group)
        match[pd.isna(df["_on"]).to_numpy()] = -1
        lm = match[~is_r]
        out = df.loc[~is_r, left_names].copy()
        safe = np.clip(lm, 0, max(0, n - 1))
        for c in val_names:
            vals = df[c].iloc[safe].reset_index(drop=True)
            vals[lm < 0] = None
            out[c] = vals.to_numpy()
        return out

    joined = partitioned_group_apply(union, ["_by"], merge,
                                     num_partitions=num_partitions,
                                     batch_size=batch_size)

    # pandas null-padding upcasts int64 left columns to float64 inside
    # the merge; restore the declared Arrow types (exact by the ±2^53
    # guard in the preps)
    out_fields = [lschema.field(nm) for nm in left_names] + \
        [pa.field(out_val[c], vtypes[c]) for c in value_cols]
    return joined.map_batches(_restore_fn(out_fields, "asof_join"),
                              batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)


def range_agg_join(left, right, by: str, on: str, right_by: str = None,
                   right_on: str = None, lower: int = 0, upper: int = 0,
                   sum_cols: list[str] = None,
                   num_partitions: int = None, batch_size: int = 131072):
    """Distributed RANGE-AGGREGATE join: for each left row, count (and
    optionally sum) the right rows of the same ``by`` group whose ``on``
    value lies in ``(left_on + lower, left_on + upper]``.

    Shuffle shape: the same single co-partition as :func:`asof_join`.
    Per partition the interval aggregation is two vectorized as-of
    lookups against per-group CUMULATIVE count/sum columns
    (``pd.merge_asof`` both bounds; range = cum[upper] - cum[lower]) —
    no per-row interval scan, so a wide range costs the same as a narrow
    one. Output: left columns + ``n_in_range`` + ``sum_<col>`` per sum
    column."""
    from .util import partitioned_group_apply
    right_by = right_by or by
    right_on = right_on or on
    sum_cols = list(sum_cols or [])

    lschema = _arrow_schema(left)
    rschema = _arrow_schema(right)
    left_names = list(lschema.names)
    _check_names(left_names,
                 ["n_in_range"] + ["sum_" + c for c in sum_cols]
                 + ["_s_" + c for c in sum_cols], "range_agg_join")
    on_type = _resolve_on_type(lschema.field(on).type,
                               rschema.field(right_on).type, on, right_on)

    def prep_left(b: pa.Table) -> pa.Table:
        _guard_exact_ints(b, left_names + [by], "range_agg_join")
        cols = {nm: b[nm] for nm in left_names}
        cols["_by"] = b[by]
        cols["_on"] = _sortable(b[on], on, on_type)
        cols["_ord"] = pa.array(np.full(b.num_rows, 1, dtype=np.int8))
        for c in sum_cols:
            cols["_s_" + c] = pa.nulls(b.num_rows,
                                       type=rschema.field(c).type)
        return pa.table(cols)

    def prep_right(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[right_by]), pc.is_valid(b[right_on]))
        b = b.filter(keep)
        _guard_exact_ints(b, sum_cols + [right_by], "range_agg_join")
        n = b.num_rows
        cols = {}
        for nm in left_names:
            cols[nm] = pa.nulls(n, type=lschema.field(nm).type)
        cols["_by"] = pc.cast(b[right_by], lschema.field(by).type)
        cols["_on"] = _sortable(b[right_on], right_on, on_type)
        cols["_ord"] = pa.array(np.zeros(n, dtype=np.int8))
        for c in sum_cols:
            cols["_s_" + c] = b[c]
        return pa.table(cols)

    lt = left.map_batches(prep_left, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size)
    rt = right.map_batches(prep_right, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=batch_size)
    union = lt.union(rt)

    def zeroed(rows: pd.DataFrame) -> pd.DataFrame:
        o = rows[left_names].reset_index(drop=True)
        o["n_in_range"] = np.zeros(len(o), dtype=np.int64)
        for c in sum_cols:
            o["sum_" + c] = np.zeros(len(o))
        return o

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        is_r = df["_ord"].to_numpy() == 0
        rights = df[is_r].sort_values(["_by", "_on"], kind="mergesort")
        lefts = df[~is_r]
        # left rows with null `on` can't anchor a range: emit zero counts
        # (mirrors asof_join's null-left handling) instead of letting
        # merge_asof raise on null merge keys
        null_on = pd.isna(lefts["_on"]).to_numpy()
        zero_rows = zeroed(lefts[null_on]) if null_on.any() else None
        lefts = lefts[~null_on]
        out = lefts[left_names].reset_index(drop=True)
        if rights.empty or lefts.empty:
            out = zeroed(lefts)
            return pd.concat([out, zero_rows], ignore_index=True) \
                if zero_rows is not None else out
        # per-group cumulative count / sums over the sorted rights
        # null sum values count as 0 (SQL SUM ignores nulls); pandas
        # cumsum would leave NaN at null positions and any range bound
        # landing exactly there would see fillna(0) wipe the prefix sum
        for c in sum_cols:
            rights["_s_" + c] = rights["_s_" + c].fillna(0.0)
        g = rights.groupby("_by", sort=False)
        rights = rights.assign(_cum_n=g.cumcount() + 1)
        for c in sum_cols:
            rights["_cum_" + c] = g["_s_" + c].cumsum()
        cum_cols = ["_cum_n"] + ["_cum_" + c for c in sum_cols]

        def at(bound_on: np.ndarray) -> pd.DataFrame:
            """Cumulative values of the LAST right row with on <= bound,
            per left row (vectorized as-of via merge_asof)."""
            q = pd.DataFrame({
                "_by": lefts["_by"].to_numpy(),
                "_bon": bound_on,
                "_row": np.arange(len(lefts)),
            }).sort_values(["_bon", "_row"], kind="mergesort")
            m = pd.merge_asof(q, rights[["_by", "_on"] + cum_cols]
                              .rename(columns={"_on": "_bon"})
                              .sort_values("_bon", kind="mergesort"),
                              on="_bon", by="_by", direction="backward")
            return m.sort_values("_row")[cum_cols].fillna(0.0)

        onv = lefts["_on"].to_numpy()
        hi = at(onv + upper)
        lo = at(onv + lower)
        out["n_in_range"] = (hi["_cum_n"].to_numpy()
                             - lo["_cum_n"].to_numpy()).astype(np.int64)
        for c in sum_cols:
            out["sum_" + c] = hi["_cum_" + c].to_numpy() \
                - lo["_cum_" + c].to_numpy()
        return pd.concat([out, zero_rows], ignore_index=True) \
            if zero_rows is not None else out

    joined = partitioned_group_apply(union, ["_by"], merge,
                                     num_partitions=num_partitions,
                                     batch_size=batch_size)

    # restore left column dtypes (pandas null-padding upcasts int64 →
    # float64 inside the merge, same as asof_join; exact by the ±2^53
    # guard in the preps)
    out_fields = [lschema.field(nm) for nm in left_names] + \
        [pa.field("n_in_range", pa.int64())] + \
        [pa.field("sum_" + c, pa.float64()) for c in sum_cols]
    return joined.map_batches(_restore_fn(out_fields, "range_agg_join"),
                              batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)


def _typed_empty(schema: pa.Schema) -> pa.Table:
    # from_arrays, not a dict: a legitimate duplicate output name (left
    # 'v_r' colliding with right 'v'+suffix) must survive
    return pa.Table.from_arrays(
        [pa.array([], type=f.type) for f in schema], schema=schema)


def equi_join(left, right, on, how: str = "inner", right_on=None,
              broadcast_cap: int = 256 << 20, num_partitions: int = None,
              right_suffix: str = "_r", left_schema: pa.Schema = None,
              right_schema: pa.Schema = None):
    """General equi-join with a size-chosen physical plan.

    If the RIGHT side fits ``broadcast_cap`` it is materialized once,
    ``ray.put`` once (per-node plasma residency), and every left batch
    joins against it with an Arrow/Acero hash join inside ``map_batches``
    — the left side streams, nothing shuffles. Above the cap (or for
    ``right_outer``/``full_outer``, which need unmatched-right tracking a
    replicated right cannot provide) both sides go through Ray Data's
    partitioned shuffle join.

    ``how``: inner | left_outer | semi | anti | right_outer | full_outer.
    Null join keys never match (SQL semantics — Acero and the shuffle
    join agree). Output column collisions take ``right_suffix``.
    Row order is not defined (as for any distributed join).

    ``left_schema``/``right_schema``: optional ``pa.Schema`` hints for a
    side that can legitimately produce ZERO rows (a filtered aggregate,
    an empty shard). Ray Data drops the schema of an all-empty pipeline
    and its shuffle join then dies on column-less partitions (KeyError
    deep in Acero); a hinted side is materialized — cheap for the
    aggregate-shaped inputs this serves, NOT meant for corpus-sized
    streams — and swapped for a typed empty block when that happens.
    Without a hint an all-empty schema-less right still degrades
    EXACTLY for semi (empty, left-typed) and anti (all left rows: the
    outputs carry left columns only), and raises a descriptive error
    for the join types whose output schema would be unconstructible.
    Emptiness is only probed where it is FREE (hinted or
    already-materialized sides) — an unhinted streaming side that
    turns out empty still dies inside Ray's shuffle join with a
    cryptic Acero KeyError, so hint any side that can legitimately
    produce zero rows.
    """
    import ray
    import ray.data as rd

    from .util import auto_partitions, worker_cached
    on = [on] if isinstance(on, str) else list(on)
    right_on = on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on))
    num_partitions = num_partitions or auto_partitions()
    if left_schema is not None:
        left = left.materialize()
        if left.schema() is None:
            left = rd.from_arrow(_typed_empty(left_schema))
    if right_schema is not None:
        right = right.materialize()
        if right.schema() is None:
            right = rd.from_arrow(_typed_empty(right_schema))

    acero_type = {"inner": "inner", "left_outer": "left outer",
                  "semi": "left semi", "anti": "left anti"}.get(how)
    if acero_type is not None:
        rt = right.materialize()
        if rt.schema() is None:     # all-empty right, schema dropped
            if how == "anti":
                return left         # nothing can match: all left survives
            if how == "semi":
                return left.limit(0)
            raise ValueError(
                f"equi_join: the right side is empty and Ray dropped "
                f"its schema, so the {how} output schema is "
                f"unconstructible — pass right_schema=")
        if rt.size_bytes() <= broadcast_cap:
            tabs = ray.get(rt.to_arrow_refs())
            rschema = rt.schema().base_schema
            # permissive promotion: Ray blocks of one dataset can differ
            # in string vs large_string per block
            small_tab = pa.concat_tables(
                tabs, promote_options="permissive") if tabs else pa.table(
                {f.name: pa.array([], type=f.type) for f in rschema})
            ref = ray.put(small_tab)

            def joined(b: pa.Table) -> pa.Table:
                small = worker_cached(("equi_join", ref.hex()),
                                      lambda: ray.get(ref))
                # Acero refuses string vs large_string key pairs, and
                # Ray block ops can promote a LEFT block's string key
                # per block (same class as the tfidf crash, f2138f0 —
                # fixed here at the join itself, not per call site)
                for lk, rk in zip(on, right_on):
                    lt_ = b.schema.field(lk).type
                    rt_ = small.schema.field(rk).type
                    if lt_ != rt_ and all(
                            pa.types.is_string(x)
                            or pa.types.is_large_string(x)
                            for x in (lt_, rt_)):
                        b = b.set_column(
                            b.schema.get_field_index(lk), lk,
                            pc.cast(b[lk], rt_))
                return b.join(small, keys=on, right_keys=right_on,
                              join_type=acero_type,
                              right_suffix=right_suffix)

            # batch_size=None → one Acero join per BLOCK: the default
            # 1024-row batching rebuilt the broadcast side's hash table
            # ~600 times for a lineitem-sized left (21 s -> 1.7 s at
            # sf0.1 on ship_delay_by_month, measured)
            return left.map_batches(joined, batch_format="pyarrow",
                                    zero_copy_batch=True,
                                    batch_size=None)
        right = rt
    ray_type = {"inner": "inner", "left_outer": "left_outer",
                "right_outer": "right_outer", "full_outer": "full_outer",
                "semi": "left_semi", "anti": "left_anti"}.get(how)
    if ray_type is None:
        raise ValueError(f"equi_join: shuffle path does not support "
                         f"how={how!r} above the broadcast cap")
    # Ray's hash-shuffle join dies on a zero-row input side — even a
    # TYPED empty block (the partition aggregator builds the missing
    # side column-less and Acero KeyErrors on the join key). Emptiness
    # is probed ONLY on sides that are already materialized (a schema
    # hint, or the acero branch's size probe falling through) — the
    # count is free metadata there. Unhinted streaming sides stay
    # streaming: materializing a corpus-scale side just to probe would
    # pin it in the object store and serialize upstream compute with
    # the shuffle. A side that can legitimately be empty is exactly
    # what the hints are for.
    l_empty = _free_count(left) == 0
    r_empty = _free_count(right) == 0
    if l_empty or r_empty:
        ls = left_schema if left_schema is not None else (
            left.schema().base_schema
            if left.schema() is not None else None)
        rs = right_schema if right_schema is not None else (
            right.schema().base_schema
            if right.schema() is not None else None)
        if ls is None or rs is None:
            raise ValueError(
                "equi_join: an empty side's schema is unknown (Ray "
                "drops the schema of an all-empty pipeline) — pass "
                "left_schema=/right_schema= so the output is "
                "constructible")
        return _empty_side_join(left, right, ls, rs, on, right_on, how,
                                right_suffix, l_empty, r_empty)
    return left.join(right, ray_type, num_partitions, on=tuple(on),
                     right_on=tuple(right_on), right_suffix=right_suffix)


def _free_count(ds):
    """Row count when Ray already knows it from metadata (in-memory
    sources, parquet reads, materialized datasets) — None for lazy
    pipelines, which we will NOT execute just to probe. Hinted sides
    are materialized by the caller, so their count is always known."""
    try:
        return ds._meta_count()
    except AttributeError:      # private API moved: fall back to
        from ray.data.dataset import MaterializedDataset
        return ds.count() if isinstance(ds, MaterializedDataset) else None


def _empty_side_join(lds, rds, lschema: pa.Schema, rschema: pa.Schema,
                     on, right_on, how: str, right_suffix: str,
                     l_empty: bool, r_empty: bool):
    """Exact equi-join semantics when at least one side has zero rows,
    built without Dataset.join (which crashes on empty inputs). Output
    follows Ray's convention: left columns, then right non-key columns
    (collisions suffixed); key values coalesce into the left key name."""
    import ray.data as rd
    if how in ("semi", "anti"):
        # output carries LEFT columns only — no payload merge, no
        # suffix/dupe concerns
        if l_empty:
            return rd.from_arrow(_typed_empty(lschema))
        # r_empty: nothing can match — semi keeps none, anti keeps all.
        # Today equi_join's Acero branch intercepts every empty right
        # for semi/anti (an empty materialized right always broadcasts:
        # size_bytes()==0), so this arm is belt-and-braces against Ray
        # ever reporting nonzero size for empty blocks — pinned by a
        # direct unit test, not reachable through equi_join.
        return lds if how == "anti" else rd.from_arrow(
            _typed_empty(lschema))
    lnames = {f.name for f in lschema}
    rpay = [f for f in rschema if f.name not in set(right_on)]

    def oname(n: str) -> str:
        return n + right_suffix if n in lnames else n

    out_schema = pa.schema(
        list(lschema) + [pa.field(oname(f.name), f.type) for f in rpay])
    names = out_schema.names
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # Ray cannot serialize an Arrow table with duplicate column
        # names (its serializer indexes by name) — refuse loudly like
        # asof_join does, instead of crashing downstream
        raise ValueError(
            f"equi_join: output column names collide even after "
            f"right_suffix={right_suffix!r}: {sorted(dupes)}")
    if (l_empty and r_empty) \
            or (r_empty and how in ("inner", "right_outer")) \
            or (l_empty and how in ("inner", "left_outer")):
        return rd.from_arrow(_typed_empty(out_schema))
    if r_empty:        # left_outer/full_outer: left rows, null right payload
        def add_right_nulls(b: pa.Table) -> pa.Table:
            for f in rpay:
                b = b.append_column(oname(f.name),
                                    pa.nulls(b.num_rows, type=f.type))
            return b

        return lds.map_batches(add_right_nulls, batch_format="pyarrow",
                               zero_copy_batch=True)

    # l_empty, right_outer/full_outer: right rows, key values under the
    # left key names, null left payload
    keymap = dict(zip(on, right_on))

    def add_left_nulls(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {}
        for f in lschema:
            if f.name in keymap:
                # honor the LEFT key type (the non-empty path's output
                # type) so schema doesn't depend on which side was empty
                cols[f.name] = pc.cast(b.column(keymap[f.name]), f.type)
            else:
                cols[f.name] = pa.nulls(b.num_rows, type=f.type)
        for f in rpay:
            cols[oname(f.name)] = b.column(f.name)
        return pa.table(cols)

    return rds.map_batches(add_left_nulls, batch_format="pyarrow",
                           zero_copy_batch=True)


def _is_distinct(a, b):
    """Vectorized SQL ``a IS DISTINCT FROM b`` over two Arrow columns:
    NULLs are EQUAL to each other and distinct from every value."""
    import pyarrow.compute as pc
    an, bn = pc.is_null(a), pc.is_null(b)
    same = pc.or_(pc.fill_null(pc.equal(a, b), False),
                  pc.and_(an, bn))
    return pc.invert(same)


def snapshot_diff(old, new, on: str, value_cols: list[str],
                  left_schema: pa.Schema = None,
                  right_schema: pa.Schema = None):
    """CDC table diff: one ``change`` row per key present in exactly
    one snapshot (``added``/``removed``) or present in both with ANY
    value column ``IS DISTINCT FROM`` its counterpart (``changed``);
    unchanged keys are absent. Presence is tracked by explicit marker
    columns (a present row's VALUE may legitimately be NULL, so value
    nullness cannot mean absence), and the diff predicate is the exact
    SQL three-valued identity (_is_distinct). NULL keys never join —
    a NULL-key row in either snapshot surfaces as added/removed,
    exactly like SQL FULL OUTER. Duplicate keys cross-match on both
    engines identically (join semantics, no dedup imposed).

    Scale shape: ONE key-hash shuffle (the full_outer plan — unmatched
    tracking needs partitioned state); the value columns ride the join
    for the EXACT compare the oracle needs. At 100 TB ship
    ``hash64(value)`` columns as ``value_cols`` instead (the
    novelty_documents hash_only convention) — classification is
    identical minus the 2^-64 collision risk, and the wide payload
    never shuffles."""
    import pyarrow.compute as pc

    def mark(tag):
        def fn(b: pa.Table) -> pa.Table:
            return b.append_column(
                tag, pa.array(np.ones(b.num_rows, dtype=np.int8)))
        return fn

    lo = old.select_columns([on] + value_cols).map_batches(
        mark("_po"), batch_format="pyarrow", zero_copy_batch=True)
    ln = new.select_columns([on] + value_cols).map_batches(
        mark("_pn"), batch_format="pyarrow", zero_copy_batch=True)
    if left_schema is not None:
        left_schema = left_schema.append(pa.field("_po", pa.int8()))
    if right_schema is not None:
        right_schema = right_schema.append(pa.field("_pn", pa.int8()))
    j = equi_join(lo, ln, on=on, how="full_outer",
                  left_schema=left_schema, right_schema=right_schema)

    def classify(b: pa.Table) -> pa.Table:
        added = pc.is_null(b["_po"])
        removed = pc.is_null(b["_pn"])
        distinct = pa.array(np.zeros(b.num_rows, dtype=bool))
        for c in value_cols:
            distinct = pc.or_(distinct,
                              _is_distinct(b[c], b[f"{c}_r"]))
        both = pc.and_(pc.invert(added), pc.invert(removed))
        keep = pc.or_(pc.or_(added, removed),
                      pc.and_(both, distinct))
        change = pc.if_else(
            added, pa.scalar("added"),
            pc.if_else(removed, pa.scalar("removed"),
                       pa.scalar("changed")))
        return pa.table({on: b[on], "change": change}).filter(keep)

    return j.map_batches(classify, batch_format="pyarrow",
                         zero_copy_batch=True)
