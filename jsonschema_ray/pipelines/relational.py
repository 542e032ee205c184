"""Relational pipelines over the driver testdata (TESTDATA.md tables) —
each function takes ``sf_dir`` and returns a Dataset / pandas result, with a
matching ANSI-SQL oracle registered in ``__ray_entry__.oracle_sql()``.

Each query exercises one operator family from SURVEY §2 through the REAL
Ray Data engine paths: rule-set validation (vectorized predicates),
uniqueness / referential checks, partial-aggregation groupbys, broadcast
joins, sort/top-k, windowed event aggregation, text analysis, dedup, ANN.

Column-name discipline: every computed column is named identically here and
in the SQL oracle (the driver hashes values under sorted column names).
Float aggregates at risk of order-dependent last-bit drift are rounded on
BOTH sides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.validate import validate_dataset


def _rd():
    import ray.data as rd
    return rd


def _read(sf_dir: str, table: str, columns=None):
    return _rd().read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# generic partial-aggregation groupby (SURVEY §2.6 "Aggregation": combine
# inside map_batches, then shuffle only the per-batch partials)


def _partial_group_agg(batch: pa.Table, *, keys: tuple,
                       sum_cols: tuple) -> pa.Table:
    keys, sum_cols = list(keys), list(sum_cols)
    aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
    out = batch.group_by(keys).aggregate(aggs)
    names = keys + [f"{c}_psum" for c in sum_cols] + ["_pcnt"]
    return out.rename_columns(names)


def _broadcast_lookup_batch(b: pa.Table, *, ref, key: str,
                            out: str, val_type=None) -> pa.Table:
    """Broadcast hash join: the small-side dict is fetched from the object
    store once per worker process (ray.put on the driver, worker_cached
    here), converted ONCE to parallel Arrow key/value arrays, then each
    batch is joined with vectorized index_in + take — no per-row Python
    dict probe in the hot path. Unmatched keys map to null (take with a
    null index), matching dict.get semantics. ``val_type`` defaults to
    string (the dimension-name callers); pass e.g. pa.int64() for a
    key→key lookup."""
    import ray

    from ..util import worker_cached

    def build():
        d = ray.get(ref)
        return (pa.array(list(d.keys())),
                pa.array(list(d.values()),
                         type=val_type or pa.string()))

    ks, vs = worker_cached(("lookup_arrays", ref.hex()), build)
    idx = pc.index_in(_combine_col(b[key]), value_set=ks)
    return b.append_column(out, vs.take(idx))


def _combine_col(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def grouped_agg(ds, keys: list[str], sums: dict[str, str],
                count_alias: str = "n_rows"):
    """groupby(keys) with Sum/Count, pre-aggregated per batch so the shuffle
    moves one row per (key, batch). ``sums``: {source_col: output_name}."""
    import functools

    from ray.data.aggregate import Sum
    sum_cols = list(sums)
    partials = ds.select_columns(keys + sum_cols).map_batches(
        functools.partial(_partial_group_agg, keys=tuple(keys),
                          sum_cols=tuple(sum_cols)),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=131072)
    aggs = [Sum(f"{c}_psum", alias_name=out) for c, out in sums.items()]
    aggs.append(Sum("_pcnt", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def grouped_agg_hash(ds, keys: list[str], sums: dict[str, str],
                     count_alias: str = "n_rows"):
    """High-cardinality variant of grouped_agg: when the group count is
    near the row count (PAIR aggregates — (order, supplier),
    (part, supplier)), the per-batch combiner cannot reduce and Ray's
    sort-based aggregate pays a full-corpus sort for nothing (measured
    15-35 s vs 1-2 s at sf0.1). One per-batch Arrow combine bounds the
    shuffle at one row per (key, batch), then ONE coarse hash-partition
    shuffle + a vectorized Arrow group_by per partition finishes
    exactly (keys never split across partitions). Same contract as
    grouped_agg. Null keys co-locate (hash64_array's fixed sentinel)
    and form SQL-style null groups."""
    from ..util import partitioned_group_apply
    sum_cols = list(sums)
    names = list(keys) + [f"{c}_ps" for c in sum_cols] + ["_pc"]
    out_names = (list(keys) + [sums[c] for c in sum_cols]
                 + [count_alias])

    def combine(t: pa.Table, final: bool) -> pa.Table:
        if final:
            aggs = [(f"{c}_ps", "sum") for c in sum_cols] \
                + [("_pc", "sum")]
        else:
            aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
        agg = t.group_by(list(keys)).aggregate(aggs)
        return agg.rename_columns(out_names if final else names)

    partials = ds.select_columns(list(keys) + sum_cols).map_batches(
        lambda b: combine(b, final=False), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=131072)
    return partitioned_group_apply(
        partials, keys, lambda t: combine(t, final=True),
        batch_format="pyarrow")


def _nullable_int64(dt):
    """types_mapper for to_pandas: int64 -> pandas Int64 so null-bearing
    id columns never round-trip through float64 (the 2^53 rule — a
    plain roundtrip silently rounds ids past 2^53)."""
    return pd.Int64Dtype() if pa.types.is_int64(dt) else None


def _round_cols(df: pd.DataFrame, cols: list[str], nd: int = 2):
    for c in cols:
        df[c] = df[c].round(nd)
    return df


# DuckDB-parity round lives in util (the ann/quantize stage needs it
# too); re-exported here because the oracle-rounding convention is a
# pipelines concern.
from ..util import duckdb_round  # noqa: E402,F401


# distributed top-k now lives in util (the text-side PMI ranking
# needs it too); the underscore alias keeps this module's many
# call sites
from ..util import partial_topk as _partial_topk  # noqa: E402


def _distinct_filtered_keys(sf_dir: str, table: str, key: str,
                            filter_fn, columns: list[str]):
    """Semi/anti BUILD side: push the predicate into the scan, keep the
    per-batch-DISTINCT key column only — a semi/anti probe never needs
    a key twice, so the dedup happens before anything ships (cross-batch
    dupes are a size cost only, never a fan-out)."""
    return _read(sf_dir, table, columns=columns).map_batches(
        lambda b: pa.table({key: pc.unique(filter_fn(b)[key])}),
        batch_format="pyarrow", zero_copy_batch=True)


def _broadcast_key_filter(ds, col: str, keys):
    """Broadcast MEMBERSHIP prune — the small-side analog of a semi
    join for a driver-resident key set. The keys ship once (ray.put);
    each worker converts them to an Arrow value_set ONCE per column
    type (worker_cached — pa.array + is_in's hash-set build must not
    re-run per batch, the heavy_hitters rule); every batch filters to
    rows whose ``col`` is in the set. Callers bound the key set's size
    before choosing this path over a distributed semi join."""
    import ray

    from ..util import worker_cached
    ref = ray.put(np.asarray(keys))

    def prune(b: pa.Table) -> pa.Table:
        t = b.schema.field(col).type
        vs = worker_cached(("bkf", ref.hex(), col, str(t)),
                           lambda: pa.array(ray.get(ref), type=t))
        return b.filter(pc.is_in(b[col], value_set=vs))

    return ds.map_batches(prune, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# validation rule sets (leaf keywords + combinators over testdata)

LINEITEM_RULESET = {
    "properties": {
        "l_quantity": {"minimum": 1, "maximum": 30},
        "l_returnflag": {"enum": ["A", "N"]},
    },
}

ORDERS_RULESET = {
    "properties": {
        "o_totalprice": {"maximum": 300000},
        "o_orderstatus": {"enum": ["O", "F"]},
        "o_orderpriority": {"pattern": "^[1-3]-"},
    },
}

DOCUMENTS_RULESET = {
    "properties": {
        "n_chars": {"minimum": 60, "maximum": 500},
        "lang": {"enum": ["en", "de", "fr", "es"]},
        "text": {"minLength": 60},
    },
}

EVENTS_RULESET = {
    "if": {"properties": {"event_type": {"const": "error"}}},
    "then": {"properties": {"value": {"maximum": 50}}},
}


def validate_lineitem(sf_dir: str):
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_quantity",
                        "l_returnflag"])
    return validate_dataset(ds, LINEITEM_RULESET,
                            key_columns=["l_orderkey", "l_linenumber"])


def validate_orders(sf_dir: str):
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_totalprice", "o_orderstatus",
                        "o_orderpriority"])
    return validate_dataset(ds, ORDERS_RULESET, key_columns=["o_orderkey"])


def validate_documents(sf_dir: str):
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "n_chars", "lang", "text"])
    return validate_dataset(ds, DOCUMENTS_RULESET, key_columns=["doc_id"])


def validate_events_conditional(sf_dir: str):
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])
    return validate_dataset(ds, EVENTS_RULESET, key_columns=["event_id"])


# ---------------------------------------------------------------------------
# uniqueness / referential


def _pin_schema(ds, dtypes: dict[str, str]) -> pd.DataFrame:
    """to_pandas that survives the all-empty case (Ray drops the schema of
    a fully-empty Dataset, which would fail the driver's schema compare)."""
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame({c: pd.Series([], dtype=t)
                             for c, t in dtypes.items()})
    return df


def uniqueness_lineitem_orderkey(sf_dir: str):
    from ..checks import duplicate_keys
    return duplicate_keys(_read(sf_dir, "lineitem", columns=["l_orderkey"]),
                          "l_orderkey")


def uniqueness_customer_custkey(sf_dir: str):
    from ..checks import duplicate_keys
    ds = duplicate_keys(_read(sf_dir, "customer", columns=["c_custkey"]),
                        "c_custkey")
    return _pin_schema(ds, {"c_custkey": "int64", "dup_count": "int64"})


def referential_lineitem_orders(sf_dir: str):
    from ..checks import broadcast_semi_join
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    ds = broadcast_semi_join(li, "l_orderkey", orders,
                             ref_key="o_orderkey", anti=True)
    return _pin_schema(ds, {"l_orderkey": "int64", "l_linenumber": "int32"})


# ---------------------------------------------------------------------------
# column stats (exact subset — the SQL-expressible face of stages/stats.py)


def column_stats_lineitem(sf_dir: str):
    from ..stages import column_stats
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    stats = column_stats(_read(sf_dir, "lineitem", columns=cols),
                         columns=cols).to_pandas()
    out = stats[["column", "count", "null_count", "min_num", "max_num"]] \
        .rename(columns={"column": "col_name", "count": "n_rows",
                         "null_count": "n_nulls", "min_num": "min_val",
                         "max_num": "max_val"})
    return out.sort_values("col_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# aggregation / join / sort / window


def q1_pricing_summary(sf_dir: str):
    rd = _rd()
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"),
                       type=pa.timestamp("us"))

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less_equal(b["l_shipdate"], cutoff))
        disc = pc.multiply(b["l_extendedprice"],
                           pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return b.append_column("disc_price", disc)

    ds = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(ds, ["l_returnflag", "l_linestatus"],
                      {"l_quantity": "sum_qty",
                       "l_extendedprice": "sum_base_price",
                       "disc_price": "sum_disc_price"},
                      count_alias="count_order").to_pandas()
    return _round_cols(out, ["sum_base_price", "sum_disc_price"]) \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def segment_order_stats(sf_dir: str):
    """Broadcast hash join: orders ⨝ customer (small side broadcast via
    ray.put), grouped by market segment."""
    import functools

    import ray
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = orders.map_batches(
        functools.partial(_broadcast_lookup_batch, ref=lookup_ref,
                          key="o_custkey", out="c_mktsegment"),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(joined, ["c_mktsegment"],
                      {"o_totalprice": "sum_totalprice"},
                      count_alias="n_orders").to_pandas()
    return _round_cols(out, ["sum_totalprice"]) \
        .sort_values("c_mktsegment").reset_index(drop=True)


def brand_quantity(sf_dir: str):
    """Broadcast join lineitem ⨝ part grouped by brand (sum of integral
    doubles — exact in any order)."""
    import functools

    import ray
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"]).to_pandas()
    ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))
    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity"])
    joined = li.map_batches(
        functools.partial(_broadcast_lookup_batch, ref=ref, key="l_partkey",
                          out="p_brand"),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(joined, ["p_brand"], {"l_quantity": "sum_qty"},
                      count_alias="n_items").to_pandas()
    return out.sort_values("p_brand").reset_index(drop=True)


def region_customer_rollup(sf_dir: str):
    """Three-table broadcast join chain (customer ⨝ nation ⨝ region — both
    dimension tables broadcast once) rolled up to region level."""
    import ray
    nation = _read(sf_dir, "nation",
                   columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region",
                   columns=["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name.get(v) for k, v in n2r.items()})
    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    import functools
    joined = cust.map_batches(
        functools.partial(_broadcast_lookup_batch, ref=lookup_ref,
                          key="c_nationkey", out="r_name"),
        batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(joined, ["r_name"], {"c_acctbal": "sum_acctbal"},
                      count_alias="n_customers").to_pandas()
    return _round_cols(out, ["sum_acctbal"]) \
        .sort_values("r_name").reset_index(drop=True)


def union_keys(sf_dir: str):
    """Dataset.union + distinct: every key that appears as a customer OR a
    supplier nation key."""
    a = _read(sf_dir, "customer", columns=["c_nationkey"]).map_batches(
        lambda b: b.rename_columns(["nationkey"]), batch_format="pyarrow")
    b = _read(sf_dir, "supplier", columns=["s_nationkey"]).map_batches(
        lambda t: t.rename_columns(["nationkey"]), batch_format="pyarrow")
    vals = sorted(a.union(b).unique("nationkey"))
    return pd.DataFrame({"nationkey": pd.Series(vals, dtype="int32")})


def topk_orders(sf_dir: str):
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(10)
    return top


def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event type (ray_guide streaming-shaped
    pattern: epoch-bucketed groupby)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def bucket(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, type=pa.int64()))
        return b.append_column("hour_bucket", hour).drop_columns(["ts"])

    ds = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    out = grouped_agg(ds, ["event_type", "hour_bucket"],
                      {"value": "sum_value"}, count_alias="n_events"
                      ).to_pandas()
    return _round_cols(out, ["sum_value"]) \
        .sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)


def distinct_event_types(sf_dir: str):
    vals = _read(sf_dir, "events", columns=["event_type"]) \
        .unique("event_type")
    return pd.DataFrame({"event_type": sorted(vals)})


def events_filter_project(sf_dir: str):
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "value"])
    return ds.map_batches(
        lambda b: b.filter(pc.and_(pc.equal(b["event_type"], "purchase"),
                                   pc.greater(b["value"], 50.0)))
        .select(["event_id", "user_id", "value"]),
        batch_format="pyarrow", zero_copy_batch=True)


def events_sessions(sf_dir: str):
    """Gap-based sessionization (30-min inactivity) per user — the
    streaming-shaped pattern from ray_guide (partition by key, sort by ts
    within the key), via ONE coarse hash-partition with the windowing
    fully vectorized inside each partition (a per-user map_groups would
    pay per-group task overhead at millions of users)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        # a NaT ts cannot be sessionized — and NaT.astype(int64) wraps
        # to -2^63, fabricating a session break via int overflow
        df = df[df["ts"].notna()]
        df = df.sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap = np.zeros(len(df), dtype=bool)
        gap[1:] = (us[1:] - us[:-1] > 1_800_000_000) & ~new_user[1:]
        users, counts = np.unique(uid, return_counts=True)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # uid sorted ⇒ np.unique order == segment order
        cum = np.concatenate(([0], np.cumsum(gap)))
        ends = starts + counts
        n_sessions = 1 + (cum[ends] - cum[starts])
        return pd.DataFrame({"user_id": users,
                             "n_sessions": n_sessions.astype(np.int64),
                             "n_events": counts.astype(np.int64)})

    return partitioned_group_apply(ds, ["user_id"], sessions,
                                   num_partitions=None)


def drift_events_value(sf_dir: str):
    """KS + PSI drift between the first and second half of the event stream
    (by time) over ``value`` — merged-t-digest drift (no SQL oracle).

    The split point is the time median taken from a FIRST distributed
    t-digest pass over ``ts`` (partials merged on the driver — a few KB),
    not a driver-side scan: both passes stream narrow projections."""
    from ..checks import ks_statistic, psi
    from ..sketches import TDigest

    ts_ds = _read(sf_dir, "events", columns=["ts"])

    def ts_partial(b: pa.Table) -> pa.Table:
        td = TDigest()
        td.add_values(pc.cast(b["ts"], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64))
        return pa.table({"tdigest": pa.array([td.to_bytes()],
                                             type=pa.binary())})

    ts_td = TDigest()
    for part in ts_ds.map_batches(ts_partial, batch_format="pyarrow",
                                  zero_copy_batch=True).to_pandas()["tdigest"]:
        ts_td.merge(TDigest.from_bytes(part))
    mid = ts_td.quantile(0.5)
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def halves(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        first = pc.less_equal(us, pa.scalar(int(mid), type=pa.int64()))
        a = TDigest()
        a.add_values(b.filter(first)["value"].to_numpy(
            zero_copy_only=False))
        bd = TDigest()
        bd.add_values(b.filter(pc.invert(first))["value"].to_numpy(
            zero_copy_only=False))
        return pa.table({"half": ["first", "second"],
                         "tdigest": pa.array([a.to_bytes(), bd.to_bytes()],
                                             type=pa.binary())})

    parts = ds.map_batches(halves, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    merged = {}
    for half, grp in parts.groupby("half"):
        td = TDigest.from_bytes(grp["tdigest"].iloc[0])
        for bts in grp["tdigest"].iloc[1:]:
            td.merge(TDigest.from_bytes(bts))
        merged[half] = td
    return pd.DataFrame([{
        "ks": round(ks_statistic(merged["first"], merged["second"]), 4),
        "psi": round(psi(merged["first"], merged["second"]), 4),
        "n_first": merged["first"].count,
        "n_second": merged["second"].count,
    }])


def hopping_window_events(sf_dir: str, window_us: int = 3_600_000_000,
                          slide_us: int = 1_800_000_000):
    """Hopping (sliding) window aggregate (ORACLED): count + sum(value)
    per 1-hour window sliding every 30 minutes. Each event belongs to
    window/slide windows; the explode happens INSIDE map_batches (×2
    rows, narrow) followed by a per-batch partial aggregation, so the
    shuffle moves one row per (window, batch) — the same combiner
    discipline as grouped_agg."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    # CEIL, not floor: with slide ∤ window a floor drops the oldest
    # window each event belongs to (the `keep` filter culls overshoot)
    nwin = -(-window_us // slide_us)

    def explode_partial(b: pa.Table) -> pa.Table:
        if b["ts"].null_count:  # a null ts belongs to no window, and a
            # null-bearing int64 to_numpy would promote the key to float
            b = b.filter(pc.is_valid(b["ts"]))
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        smax = np.floor_divide(us, slide_us)
        parts = []
        for j in range(int(nwin)):
            s = smax - j
            keep = s * slide_us > us - window_us  # window start in range
            parts.append(pa.table({
                "window_start": pa.array(s[keep] * slide_us),
                # from_pandas=True: NaN (null value) → arrow null, so the
                # sum ignores it (SQL SUM) while count_all still counts
                # the event row (SQL COUNT(*))
                "_v": pa.array(val[keep], from_pandas=True),
            }))
        t = pa.concat_tables(parts)
        agg = t.group_by(["window_start"]).aggregate(
            [("_v", "sum"), ([], "count_all")])
        return agg.rename_columns(["window_start", "_psum", "_pcnt"])

    partials = ds.map_batches(explode_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    out = partials.groupby("window_start").aggregate(
        Sum("_psum", alias_name="sum_value"),
        Sum("_pcnt", alias_name="n_events"))

    df = out.to_pandas()
    df["window_start"] = pd.to_datetime(df["window_start"], unit="us")
    df = _round_cols(df, ["sum_value"])  # same rounding as the oracle
    return df[["window_start", "n_events", "sum_value"]] \
        .sort_values("window_start").reset_index(drop=True)


def quantity_stats_by_flag(sf_dir: str):
    """Grouped mean + population stddev (ORACLED): per-batch
    (n, sum, sum-of-squares) partials — the shuffle moves three numbers
    per (group, batch); moments combine exactly."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        # SQL AVG/STDDEV_POP ignore NULLs: a null→NaN value must neither
        # poison the sums nor count in _n (same guard as the zscore query)
        ok = ~np.isnan(q)
        t = pa.table({"l_returnflag": b["l_returnflag"],
                      "_q": pa.array(np.where(ok, q, 0.0)),
                      "_q2": pa.array(np.where(ok, q * q, 0.0)),
                      "_c": pa.array(ok.astype(np.int64))})
        agg = t.group_by(["l_returnflag"]).aggregate(
            [("_q", "sum"), ("_q2", "sum"), ("_c", "sum")])
        return agg.rename_columns(["l_returnflag", "_s", "_s2", "_n"])

    out = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=131072) \
        .groupby("l_returnflag").aggregate(
            Sum("_s", alias_name="s"), Sum("_s2", alias_name="s2"),
            Sum("_n", alias_name="n")).to_pandas()
    mean = out["s"] / out["n"]
    var = out["s2"] / out["n"] - mean * mean
    df = pd.DataFrame({"l_returnflag": out["l_returnflag"],
                       "avg_qty": mean.round(4),
                       "std_qty": np.sqrt(np.maximum(var, 0)).round(4)})
    return df.sort_values("l_returnflag").reset_index(drop=True)


def distinct_parts_per_flag(sf_dir: str):
    """EXACT grouped distinct-count (ORACLED): stage 1 reduces to the
    distinct (group, key) pairs with a per-batch combiner + one groupby
    (no row data moves twice), stage 2 counts pairs per group — the
    distributed form of count(DISTINCT x) GROUP BY g."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_partkey"])

    def batch_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["l_returnflag", "l_partkey"]).aggregate([])

    from ..util import partitioned_group_apply
    pairs = ds.map_batches(batch_distinct, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)

    # hash-partition on the PAIR so each distinct pair lives in exactly
    # one partition; per-partition dedup + per-flag counts, tiny merge
    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["l_returnflag", "l_partkey"]) \
            .groupby("l_returnflag").size()
        return pd.DataFrame({"l_returnflag": g.index.to_numpy(),
                             "_n": g.to_numpy().astype(np.int64)})

    partials = partitioned_group_apply(
        pairs, ["l_returnflag", "l_partkey"], part_counts).to_pandas()
    out = partials.groupby("l_returnflag", as_index=False)["_n"].sum() \
        .rename(columns={"_n": "n_parts"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def top3_orders_per_segment(sf_dir: str):
    """Grouped top-k (ORACLED): the 3 highest-value orders per customer
    market segment — broadcast the small dim, then ONE coarse partition
    on the group key with a vectorized in-partition head(k) (the same
    partitioned_group_apply shape as every other group-wise operator; no
    global sort)."""
    import ray

    from ..util import partitioned_group_apply
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]) \
        .to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))
    import functools
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        functools.partial(_broadcast_lookup_batch, ref=ref, key="o_custkey",
                          out="c_mktsegment"),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=131072)

    def head3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_mktsegment", "o_totalprice", "o_orderkey"],
                            ascending=[True, False, True])
        out = df.groupby("c_mktsegment", sort=False).head(3)
        return out[["c_mktsegment", "o_orderkey", "o_totalprice"]]

    df = partitioned_group_apply(orders, ["c_mktsegment"], head3) \
        .to_pandas()
    return df.sort_values(["c_mktsegment", "o_orderkey"]) \
        .reset_index(drop=True)


def median_quantity_by_flag(sf_dir: str):
    """EXACT grouped median via histogram partials (ORACLED): l_quantity
    is a low-cardinality discrete column, so per-batch (flag, quantity)
    counts make an exact distributed histogram — the shuffle moves one
    row per (flag, quantity, batch), never the data. The driver walks
    ~100 histogram rows to the exact median (ties → lower-of-the-two
    middle values convention matched in the SQL via quantile_disc)."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    hist = grouped_agg(ds, ["l_returnflag", "l_quantity"], {},
                       count_alias="n").to_pandas()
    hist = hist.dropna(subset=["l_quantity"])  # median ignores NULLs
    out = []
    for flag, g in hist.groupby("l_returnflag"):
        g = g.sort_values("l_quantity")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        # quantile_disc(0.5): smallest value with cum >= ceil(total/2)
        target = (total + 1) // 2
        med = g["l_quantity"].to_numpy()[np.searchsorted(cum, target)]
        out.append({"l_returnflag": flag, "median_qty": float(med)})
    return pd.DataFrame(out).sort_values("l_returnflag") \
        .reset_index(drop=True)


def events_orders_90d(sf_dir: str):
    """Range-aggregate join (ORACLED): per event, count + revenue of the
    same customer's orders in the 90 days up to the event — the interval
    join as two vectorized as-of lookups over per-group cumulative sums
    (jsonschema_ray/joins.py::range_agg_join)."""
    from ..joins import range_agg_join
    ninety_us = 90 * 24 * 3600 * 1_000_000
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_totalprice"])
    j = range_agg_join(events, orders, by="user_id", on="ts",
                       right_by="o_custkey", right_on="o_orderdate",
                       lower=-ninety_us, upper=0,
                       sum_cols=["o_totalprice"])
    df = j.to_pandas()[["event_id", "n_in_range", "sum_o_totalprice"]]
    df = df.rename(columns={"n_in_range": "n_orders_90d",
                            "sum_o_totalprice": "revenue_90d"})
    return _round_cols(df, ["revenue_90d"]) \
        .sort_values("event_id").reset_index(drop=True)


def events_last_order(sf_dir: str):
    """As-of join (ORACLED): each event picks up the latest order date of
    the same customer at-or-before the event time — the custom operator
    Ray Data lacks, as one co-partition shuffle + vectorized merge
    (jsonschema_ray/joins.py)."""
    from ..joins import asof_join
    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    j = asof_join(events, orders, by="user_id", on="ts",
                  right_by="o_custkey", right_on="o_orderdate",
                  value_cols=["o_orderdate"])

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "last_orderdate": b["o_orderdate"]})

    return j.map_batches(out, batch_format="pyarrow", zero_copy_batch=True)


def fingerprint_documents(sf_dir: str):
    """Winnowing-style rolling-hash fingerprints (4 smallest k-gram hashes
    per doc) — deterministic content signatures (no SQL oracle)."""
    from ..text.analysis import rolling_fingerprint
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        fps = rolling_fingerprint(b["text"].combine_chunks())
        return pa.table({
            "doc_id": b["doc_id"],
            "fingerprint": pa.array(fps, type=pa.list_(pa.int64()))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def orders_running_total(sf_dir: str):
    """Per-customer running revenue ordered by date — windowed cumsum,
    vectorized per coarse partition (pandas groupby().cumsum over the
    whole partition; no per-customer task)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        rt = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum()
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(),
                             "running_total": rt.round(2).to_numpy()})

    return partitioned_group_apply(ds, ["o_custkey"], running,
                                   num_partitions=None)


# ---------------------------------------------------------------------------
# documents: dedup + text analysis


def dedup_exact_documents(sf_dir: str):
    from ..dedup import exact_dedup_stats
    return exact_dedup_stats(_read(sf_dir, "documents",
                                   columns=["doc_id", "text"]))


def token_count_documents(sf_dir: str):
    from ..text import token_counts
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(token_counts(
                             b["text"].combine_chunks()))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_documents(sf_dir: str):
    """Quality features with ratio columns as integer BASIS POINTS
    (floor(10000·count/len)) — floor of an identical double division is
    bit-reproducible in SQL, unlike round() (DuckDB rounds the decimal
    repr half-away; numpy rounds the binary value — they disagree on ties
    like 58/320 = 0.18125)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        col = b["text"].combine_chunks()
        n = pc.utf8_length(col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nullmask = np.isnan(n)      # null text → null features (SQL NULL),
        safe = np.maximum(np.where(nullmask, 1.0, n), 1.0)  # never UB casts

        def bp(pattern):
            c = pc.count_substring_regex(col, pattern).to_numpy(
                zero_copy_only=False).astype(np.float64)
            v = np.floor(10000.0 * np.where(nullmask, 0.0, c) / safe) \
                .astype(np.int64)
            return pa.array(v, mask=nullmask)

        from ..text import token_counts
        return pa.table({
            "doc_id": b["doc_id"],
            "n_chars": pa.array(np.where(nullmask, 0, n).astype(np.int64),
                                mask=nullmask),
            "n_tokens": pa.array(token_counts(col)),
            "alpha_bp": bp(r"[A-Za-z]"),
            "space_bp": bp(r" "),
            "digit_bp": bp(r"[0-9]"),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def lang_distribution(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang"])
    return grouped_agg(ds, ["lang"], {}, count_alias="n_docs").to_pandas() \
        .sort_values("lang").reset_index(drop=True)


def langid_documents(sf_dir: str):
    """Heuristic language-ID vs the labeled ``lang`` column (ORACLED: the
    stopword-share argmax, CJK override and 'und' thresholds are plain
    arithmetic DuckDB reproduces exactly; the float score column is kept
    OUT of the oracled output — prediction thresholds compare unrounded
    IEEE doubles bit-identically, rounded score columns would not)."""
    from ..text import add_text_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = add_text_features(ds, quality=False, simhash=False)
    return out.select_columns(["doc_id", "lang", "lang_pred"])


def simhash_documents(sf_dir: str):
    from ..text import add_text_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return add_text_features(ds, quality=False, langid=False) \
        .select_columns(["doc_id", "simhash"])


def minhash_neardup_documents(sf_dir: str):
    from ..dedup import minhash_near_duplicates
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return minhash_near_duplicates(ds, threshold=0.5,
                                   rows_hint=ds.count())


def orders_customer_join(sf_dir: str):
    """Broadcast equi-join (customer is the measured-small side): every
    order enriched with its customer's segment via the Acero per-batch
    hash-join path of joins.equi_join — left streams, nothing shuffles."""
    from ..joins import equi_join
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    out = equi_join(orders, cust, on="o_custkey",
                    right_on="c_custkey").to_pandas()
    out = out[["o_orderkey", "o_totalprice", "c_mktsegment"]]
    return out.sort_values("o_orderkey").reset_index(drop=True)


def lineitem_orders_priority_revenue(sf_dir: str):
    """Large×large shuffle equi-join (broadcast deliberately disabled):
    lineitem ⋈ orders on orderkey, then revenue per order priority via
    the per-batch-combined grouped aggregate."""
    from ..joins import equi_join
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    joined = equi_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                       broadcast_cap=0)
    out = grouped_agg(joined, ["o_orderpriority"],
                      {"revenue": "revenue"},
                      count_alias="n_items").to_pandas()
    out["revenue"] = out["revenue"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def ngram_jaccard_documents(sf_dir: str):
    """Exact all-pairs k-gram Jaccard ≥ 0.5 — SQL-expressible ground truth
    for the text near-dup family (the LSH queries stay rows-only because
    their recall is probabilistic by design)."""
    from ..dedup import ngram_jaccard_pairs
    out = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.5).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def simhash_neardup_documents(sf_dir: str):
    """SimHash fingerprint pairs within Hamming distance 3 (rows-only:
    the fingerprint depends on the engine's 64-bit token hash)."""
    from ..dedup import simhash_near_duplicates
    out = simhash_near_duplicates(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        max_distance=3).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def neardup_verified_documents(sf_dir: str):
    """MinHash-LSH candidates verified by exact k-gram Jaccard (rows-only:
    the exact-set intersection over shingle hashes is not SQL-expressible
    at reasonable cost)."""
    from ..dedup import verified_near_duplicates
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return verified_near_duplicates(ds, threshold=0.5,
                                    rows_hint=ds.count())


LINEITEM_DATE_RULESET = {
    "properties": {
        "l_shipdate": {"x-before": "1998-12-01"},
    },
}


def validate_lineitem_dates(sf_dir: str):
    """Temporal engine-extension keywords (x-before) on a timestamp
    column."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    return validate_dataset(ds, LINEITEM_DATE_RULESET,
                            key_columns=["l_orderkey", "l_linenumber"])


LINEITEM_DATE_CORE_RULESET = {
    "properties": {
        # the CORE composition a jsonschema user writes: format date-time
        # + an RFC3339 bound through minimum/maximum (canonicalized to
        # epoch micros at parse — rules/model.py::_temporal_to_micros)
        "l_shipdate": {"format": "date-time",
                       "exclusiveMaximum": "1998-12-01"},
    },
}


def validate_lineitem_dates_core(sf_dir: str):
    """Core temporal bounds (format + exclusiveMaximum RFC3339 string) on
    a timestamp column — oracled."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_shipdate"])
    return validate_dataset(ds, LINEITEM_DATE_CORE_RULESET,
                            key_columns=["l_orderkey", "l_linenumber"])


# ---------------------------------------------------------------------------
# embeddings: similarity search + near-dup


def _query_vectors(sf_dir: str, n: int = 5):
    import duckdb
    q = duckdb.sql(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{sf_dir}/embeddings.parquet')
            ORDER BY vec_id LIMIT {n}""").df()
    return q["embedding"].tolist(), q["vec_id"].to_numpy()


def ann_topk_embeddings(sf_dir: str):
    from ..ann import brute_force_topk
    vecs, ids = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, vecs, query_ids=ids, k=10)
    out["score"] = out["score"].round(6)
    return out


def ann_ivf_embeddings(sf_dir: str):
    from ..ann import ivf_topk
    vecs, ids = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, vecs, query_ids=ids, k=10, ncells=16, nprobe=4)
    out["score"] = out["score"].round(6)
    return out


def label_centroids_embeddings(sf_dir: str):
    """Per-label embedding centroid (the class-prototype statistic an
    IVF trainer or embedding-drift monitor consumes): mean of every
    dimension per label, in basis points. Per-batch partial sums via a
    sorted reduceat (one pass over the batch matrix) — the vectors
    themselves never shuffle; only (labels × dim) partial rows do."""
    from ray.data.aggregate import Sum

    from ..ann.search import embedding_matrix
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        M = embedding_matrix(b.column("embedding"))  # (n, d) float64
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), (M.shape[1] if len(M) else 0)
        if k == 0 or d == 0:
            return pa.table({
                "label": pa.array([], type=pa.int64()),
                "dim": pa.array([], type=pa.int64()),
                "sum_part": pa.array([], type=pa.float64()),
                "n_part": pa.array([], type=pa.int64())})
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(k))
        sums = np.add.reduceat(M[order], starts, axis=0)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    k)),
            "sum_part": pa.array(sums.ravel()),
            "n_part": pa.array(np.repeat(cnt, d)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("sum_part", alias_name="s"),
                   Sum("n_part", alias_name="n"))

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "label": b["label"], "dim": b["dim"],
            "mean_bp": pa.array(np.floor(10000 * s / n)
                                .astype(np.int64)),
            "n": pa.array(n.astype(np.int64))})

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def embedding_covariance(sf_dir: str):
    """Upper-triangle sample covariance matrix of the embedding column —
    the exact moment pass PCA/whitening runs (ONE streaming corpus scan
    emitting O(dim²) partials per batch; vectors never shuffle; the
    merge is a dim(dim+1)/2-row groupby). ORACLED against DuckDB
    covar_samp over the unnested column, which pins the distributed
    Σx/Σxxᵀ machinery exactly; the eigendecomposition on top of it is
    pca_embeddings (rows-only: no SQL eigensolver)."""
    from ..ann.pca import covariance
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    cov, mean, n = covariance(ds)
    iu = np.triu_indices(cov.shape[0])
    return pd.DataFrame({
        "dim_i": (iu[0] + 1).astype(np.int64),
        "dim_j": (iu[1] + 1).astype(np.int64),
        "cov": np.round(cov[iu], 6),
        "n": np.full(len(iu[0]), n, dtype=np.int64)})


def pca_embeddings(sf_dir: str):
    """Top-8 principal components of the embedding corpus (rows-only:
    eigendecomposition has no SQL form — the covariance input is pinned
    by the ORACLED embedding_covariance, the eigensolver + sign rule +
    projection stage by pytest vs single-node numpy). Per component:
    explained-variance share in basis points and the
    largest-|coefficient| axis (deterministic under the sign rule)."""
    from ..ann import distributed_pca
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    # full spectrum so explained_bp is the share of TOTAL variance
    comps, ev, mean, n = distributed_pca(ds)
    total = float(np.sum(ev)) if np.sum(ev) > 0 else 1.0
    k = min(8, len(ev))
    comps, ev = comps[:k], ev[:k]
    return pd.DataFrame({
        "component": np.arange(1, k + 1, dtype=np.int64),
        "explained_bp": np.floor(10000 * ev / total).astype(np.int64),
        "top_axis": (np.abs(comps).argmax(axis=1) + 1).astype(np.int64),
        "n": np.full(k, n, dtype=np.int64)})


def _value_hour_moments(sf_dir: str):
    """Shared per-group bivariate moment pass over events: six moment
    columns (n, Σx, Σy, Σx², Σy², Σxy; x = value, y = hour(ts)) per
    event_type — ONE corpus scan, one row per (group, batch) shuffles,
    the driver holds ngroups rows. Pairwise-complete FINITE rows only:
    SQL corr/regr_* skip a pair if either side is null, and a non-null
    NaN/inf would otherwise poison the partials PARTITION-DEPENDENTLY
    (Ray's Sum drops NaN cells per block — review pin); the exclusion
    is the repo's psi/drift convention, documented divergence from
    DuckDB which raises on NaN input here. Returns the sorted agg
    DataFrame (pn/sx/sy/sxx/syy/sxy) or None on empty input."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def mom(b: pa.Table) -> pa.Table:
        x = b.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        hr = pc.hour(b.column("ts")).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = (np.asarray(b.column("value").is_valid())
              & np.asarray(b.column("ts").is_valid()))
        ok &= np.isfinite(np.where(ok, x, 0.0))
        xv = np.where(ok, x, 0.0)
        yv = np.where(ok, hr, 0.0)
        return pa.table({
            "event_type": b.column("event_type"),
            "pok": pa.array(ok.astype(np.float64)),
            "px": pa.array(xv), "py": pa.array(yv),
            "pxx": pa.array(xv * xv), "pyy": pa.array(yv * yv),
            "pxy": pa.array(xv * yv)})

    agg = grouped_agg(
        ds.map_batches(mom, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["event_type"],
        {"pok": "pn", "px": "sx", "py": "sy",
         "pxx": "sxx", "pyy": "syy", "pxy": "sxy"}).to_pandas()
    if agg.empty:
        return None
    return agg.sort_values("event_type").reset_index(drop=True)


def value_hour_corr_by_type(sf_dir: str):
    """Per-group bivariate Pearson correlation — corr(value, hour(ts))
    for every event_type, the grouped moment shape (n,Σx,Σy,Σx²,Σy²,Σxy
    per group) none of the global-moment ops cover: one map computes
    the six moment columns per row, grouped_agg pre-aggregates them
    per batch (Arrow group_by — null group keys flow through like
    SQL's NULL group) so ONE row per (group, batch) shuffles, and the
    driver evaluates the corr formula per group. Pairs with a null
    value or null ts are excluded (SQL corr semantics); non-finite
    values too (psi/drift convention — DuckDB raises on NaN here);
    zero-variance or n<2 groups answer NULL exactly as SQL does.
    ORACLED vs DuckDB corr(value, extract(hour FROM ts)) per group."""
    agg = _value_hour_moments(sf_dir)
    if agg is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "corr": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    n = agg["pn"].to_numpy()
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxx, syy, sxy = (agg[c].to_numpy() for c in ("sxx", "syy", "sxy"))
    with np.errstate(invalid="ignore", divide="ignore"):
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        corr = (sxy - sx * sy / n) / np.sqrt(vx * vy)
    corr = np.where((n >= 2) & (vx > 0) & (vy > 0), corr, np.nan)
    return pd.DataFrame({
        "event_type": agg["event_type"].to_numpy(),
        "corr": np.round(corr, 6),
        "n": n.astype(np.int64)}).reset_index(drop=True)


def ann_pca_topk_embeddings(sf_dir: str):
    """Compress-then-search ANN: project the 64-dim embeddings onto the
    top-16 principal axes (one-pass covariance → driver eigh →
    broadcast matmul per batch), then exact cosine top-10 IN THE
    REDUCED SPACE for the same 5 queries as ann_topk — the
    dimension-reduction scale path a 100 TB embedding search runs
    before (or instead of) full-dim scoring: the scored matrix is 4×
    smaller and the basis ships once. Rows-only (the projection basis
    comes from the engine's eigensolver — no SQL form); pytest pins
    near-perfect recall vs full-dim exact top-k on planted low-rank
    data, where compression is lossless by construction."""
    from ..ann import brute_force_topk, distributed_pca, pca_project
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    comps, ev, mean, n = distributed_pca(ds, n_components=16)
    # pca_project nulls non-finite/null rows by design; drop them
    # before scoring (brute force requires dense vectors) — the same
    # dirty rows the full-dim path excludes inside its scorer
    proj = pca_project(ds, comps, mean).map_batches(
        lambda b: b.filter(b.column("pca").is_valid()),
        batch_format="pyarrow", zero_copy_batch=True)
    vecs, ids = _query_vectors(sf_dir)
    qp = (np.asarray(vecs, dtype=np.float64) - mean) @ comps.T
    out = brute_force_topk(proj, qp, query_ids=ids, vec_col="pca", k=10)
    out["score"] = out["score"].round(6)
    return out


def embedding_outliers_mahalanobis(sf_dir: str):
    """Top-20 embedding outliers by squared Mahalanobis distance to the
    corpus distribution (rows-only: the precision-matrix inverse has no
    SQL form; pytest pins the scores to a single-node numpy reference).
    Covariance via the one-pass moment machinery, scores via a
    broadcast quadratic form per batch, and the top-k is a per-batch
    PARTIAL top-20 (score desc, vec_id asc) merged on the driver —
    ≤20·nbatches tiny rows move, never the corpus."""
    from ..ann import covariance, mahalanobis_scores
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cov, mean, n = covariance(ds)
    scored = mahalanobis_scores(ds, cov, mean)

    def partial_topk(b: pa.Table) -> pa.Table:
        df = b.select(["vec_id", "maha2"]).to_pandas()
        df = df.dropna(subset=["maha2"])
        df = df.sort_values(["maha2", "vec_id"],
                            ascending=[False, True]).head(20)
        return pa.table({
            "vec_id": pa.array(df["vec_id"].to_numpy(), type=pa.int64()),
            "maha2": pa.array(df["maha2"].to_numpy(), type=pa.float64())})

    cand = scored.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    top = cand.sort_values(["maha2", "vec_id"],
                           ascending=[False, True]).head(20) \
        .reset_index(drop=True)
    top["maha2"] = top["maha2"].round(6)
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return top


def kmeans_embeddings(sf_dir: str):
    """Distributed full-corpus spherical k-means (rows-only: iterative
    float algorithm, no SQL form): each Lloyd iteration is one streaming
    pass emitting (≤k × dim) reduceat partials, merged by one small
    groupby — vectors never shuffle. Returns per-cluster sizes plus the
    first centroid component in basis points (deterministic given the
    seeded init; pinned against a single-node Lloyd reference in
    pytest)."""
    from ..ann import distributed_kmeans
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    C, counts, mean_cos = distributed_kmeans(ds, vec_col="embedding",
                                             k=8, iters=4, seed=11)
    order = np.lexsort((np.arange(len(counts)), -counts))
    return pd.DataFrame({
        "rank": np.arange(len(order), dtype=np.int64),
        "n_members": counts[order].astype(np.int64),
        "c0_bp": np.floor(10000 * C[order, 0]).astype(np.int64),
        "mean_cos_bp": np.full(len(order),
                               np.floor(10000 * mean_cos),
                               dtype=np.int64),
    })


def ann_ivf_fullprobe_embeddings(sf_dir: str):
    """IVF top-k probing EVERY cell (nprobe = ncells): cell partitioning
    must lose NOTHING relative to exact brute force, so this query is
    ORACLED against the same SQL ground truth as ann_topk — it pins the
    whole IVF machinery (assignment, per-cell scoring, deterministic
    (score desc, id) merge) exactly; the nprobe<ncells variants stay
    rows-only (approximate by construction)."""
    from ..ann import ivf_topk
    vecs, ids = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, vecs, query_ids=ids, k=10, ncells=16, nprobe=16)
    out["score"] = out["score"].round(6)
    return out


def _content_cached_dir(src_path: str, settings: str, base: str,
                        build_fn) -> str:
    """Shared /tmp cache for persisted indexes, keyed by CONTENT
    (path|size|mtime_ns) AND the build settings — a regenerated corpus
    at the same path, or a settings change, gets a fresh build (the r4
    review found one copy omitting settings from its tag, silently
    reusing a stale index after a parameter change). ``build_fn(dir)``
    runs once; the ``_DONE`` marker gates reuse so a torn build
    rebuilds rather than being trusted."""
    import hashlib
    import os
    import shutil
    st = os.stat(src_path)
    tag = hashlib.sha1(
        f"{src_path}|{st.st_size}|{st.st_mtime_ns}|{settings}".encode()
    ).hexdigest()[:12]
    d = os.path.join(base, tag)
    if not os.path.exists(os.path.join(d, "_DONE")):
        shutil.rmtree(d, ignore_errors=True)
        build_fn(d)
        open(os.path.join(d, "_DONE"), "w").write("ok")
    return d


def ann_ivf_index_embeddings(sf_dir: str):
    """Materialized IVF: build the cell-partitioned index once (per
    sf_dir CONTENT + build settings, cached under /tmp), probe reading
    only nprobe cells (rows-only: approximate by construction)."""
    import os

    from ..ann import IvfIndex
    vecs, ids = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    idx_dir = _content_cached_dir(
        os.path.join(os.path.abspath(sf_dir), "embeddings.parquet"),
        "ivf16t20000", "/tmp/jsonschema_ray_ivf",
        lambda d: IvfIndex.build(ds, d, ncells=16, train_sample=20000))
    idx = IvfIndex.load(idx_dir)
    out = idx.topk(vecs, query_ids=ids, k=10, nprobe=4)
    out["score"] = out["score"].round(6)
    return out


def embedding_neardup_exact(sf_dir: str):
    """Exact all-pairs cosine ≥ 0.4 — SQL-expressible ground truth for the
    LSH near-dup family (oracled; the LSH query stays rows-only because
    its recall is probabilistic by design)."""
    from ..dedup import exact_cosine_pairs
    out = exact_cosine_pairs(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.4).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def embedding_neardup(sf_dir: str):
    from ..dedup import embedding_near_duplicates
    return embedding_near_duplicates(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        threshold=0.9)


# ---------------------------------------------------------------------------
# approximate stats + flagship image pipeline (rows-only checks)


def column_stats_approx_lineitem(sf_dir: str):
    from ..stages import column_stats
    cols = ["l_quantity", "l_extendedprice"]
    stats = column_stats(_read(sf_dir, "lineitem", columns=cols),
                         columns=cols).to_pandas()
    out = stats[["column", "ndv_approx", "p25", "p50", "p75"]].copy()
    out["ndv_approx"] = out["ndv_approx"].round(0)
    return out.sort_values("column").reset_index(drop=True)


def _feature_synth_images(sf_dir: str):
    """The feature-stage synthetic corpus, sized to the scale factor
    (smaller than the flagship's — these stages decode per image)."""
    import os

    from ..sources import generate_images
    n = {"sf0.001": 500, "sf0.01": 1000, "sf0.1": 2000}.get(
        os.path.basename(sf_dir.rstrip("/")), 500)
    return generate_images(n, seed=42)


def _round_floats(ds, key_col: str, nd: int = 4):
    """Round every non-key column to ``nd`` decimals (driver-contract
    float hygiene for pixel-derived values)."""
    def rnd(b: pa.Table) -> pa.Table:
        cols = {key_col: b[key_col]}
        for c in b.column_names:
            if c != key_col:
                cols[c] = pc.round(b[c], nd)
        return pa.table(cols)

    return ds.map_batches(rnd, batch_format="pyarrow",
                          zero_copy_batch=True)


def image_features_synth(sf_dir: str):
    """Multimodal transform stage over the synthetic image corpus:
    decode + resize + per-image feature columns (rows-only: pixel-derived
    values are not SQL-expressible)."""
    from ..stages import extract_image_features
    return _round_floats(
        extract_image_features(_feature_synth_images(sf_dir)),
        "image_id")


def image_quality_synth(sf_dir: str):
    """Perceptual-quality screen over the synthetic image corpus —
    blur (Laplacian variance), RMS contrast, constant-border fraction
    (letterbox/pillarbox detection) per image (rows-only: pixel math;
    crafted flat / checkerboard / letterboxed images pin the exact
    values in pytest)."""
    from ..stages import score_image_quality
    return _round_floats(
        score_image_quality(_feature_synth_images(sf_dir)), "image_id")


def validate_images_synth(sf_dir: str):
    """Flagship over a deterministic synthetic image corpus sized to the
    scale factor (BASELINE: synthesise the input-table shape at small scale;
    no external data)."""
    import os
    from ..pipelines import validate_images
    from ..sources import generate_images
    n = {"sf0.001": 2000, "sf0.01": 10000, "sf0.1": 50000}.get(
        os.path.basename(sf_dir.rstrip("/")), 2000)
    ds = generate_images(n, seed=42)
    return validate_images(ds)


# ---------------------------------------------------------------------------
# text cleaning / chunking (LLM-pipeline stages, all SQL-oracled)


def term_frequency_documents(sf_dir: str):
    """Global top-50 whitespace-token counts: per-batch combiner partials
    (one row per term per batch) → vocabulary-sized groupby → tiny sort."""
    from ..text.transform import term_frequency
    return term_frequency(_read(sf_dir, "documents", columns=["text"]),
                          top_n=50)


def customer_order_counts(sf_dir: str):
    """Per-customer count of URGENT orders INCLUDING zero-count
    customers (~13% of customers have none at sf0.01, so the outer
    branch is genuinely exercised) — the oracled LEFT OUTER equi-join
    (equi_join picks broadcast vs shuffle by measured size). Combiner
    partials make the joined right side customer-sized; the orders
    stream itself never shuffles and the priority filter is applied
    at the scan."""
    from ray.data.aggregate import Sum
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"]) \
        .filter(expr="o_orderpriority == '1-URGENT'")

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["o_custkey"]).group_by(["o_custkey"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["c_custkey", "n_part"])

    counts = orders.map_batches(partial, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("c_custkey") \
        .aggregate(Sum("n_part", alias_name="n_orders"))
    from ..joins import equi_join
    j = equi_join(cust, counts, on="c_custkey", how="left_outer")

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "c_custkey": b["c_custkey"],
            "n_orders": pc.cast(pc.fill_null(b["n_orders"], 0),
                                pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


def hot_users_events(sf_dir: str):
    """Hot-key detector (skew diagnostics): top-10 user_ids by event
    count with traffic share in basis points — the report a shuffle
    planner consults before salting a hot key. Per-batch combiner
    partials → user-sized groupby → per-block local top-k →
    O(blocks·k) driver merge; the event stream never shuffles and the
    full user set is never driver-resident."""
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "events", columns=["user_id"])
    total = float(ds.count())  # parquet metadata, not a scan

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["user_id"]).group_by(["user_id"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["user_id", "n_part"])

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("user_id").aggregate(Sum("n_part", alias_name="n"))

    top = _partial_topk(counts, ["n", "user_id"], [False, True], 10)
    if top is None:
        # empty events table: a zero-group shuffle can surface as a
        # column-less frame — return the typed empty top-10
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64"),
                             "share_bp": pd.Series([], dtype="int64")})
    top["share_bp"] = np.floor(
        10000 * top["n"].to_numpy(dtype=np.float64) / total) \
        .astype(np.int64)
    top["n"] = top["n"].astype("int64")
    return top[["user_id", "n", "share_bp"]]


def unigram_logprob_documents(sf_dir: str):
    """Per-doc mean unigram log-probability under the corpus's own LM
    (CCNet-style quality score) — oracled: whitespace tokens and libm
    ln on both sides, floor basis points like tfidf."""
    from ..text.transform import unigram_logprob
    return unigram_logprob(_read(sf_dir, "documents",
                                 columns=["doc_id", "text"]))


def bigram_counts_documents(sf_dir: str):
    """Top-50 adjacent token pairs with counts (collocation statistics,
    the tokenizer-merge / phrase-mining input) — oracled: whitespace
    split and lead()-then-filter pairing on both sides, total-order
    tiebreak (n desc, w1, w2) so the tied band at the cut is
    deterministic."""
    from ..text.transform import bigram_counts
    return bigram_counts(_read(sf_dir, "documents", columns=["text"]),
                         top_n=50)


def nation_balance_outer(sf_dir: str):
    """Per-nation counts of high-balance customers (>9700) and suppliers
    (>7000), FULL OUTER joined on nation — the oracled exercise of Ray
    Data's partitioned shuffle join (full_outer never broadcasts:
    unmatched-RIGHT tracking needs partitioned state, joins.py:388). At
    sf0.01 one nation has rich suppliers but no rich customers and eight
    the reverse, so both null branches are real. Combiner partials make
    both join sides nation-sized; the customer/supplier streams never
    shuffle. Unmatched sides surface as count 0 (a grouped count is
    never 0 for a matched key, so 0 uniquely marks the outer branch)."""
    from ray.data.aggregate import Sum

    from ..joins import equi_join

    def side(table: str, key: str, bal: str, alias: str, thresh: int):
        ds = _read(sf_dir, table, columns=[key, bal]) \
            .filter(expr=f"{bal} > {thresh}")

        def partial(b: pa.Table) -> pa.Table:
            g = b.select([key]).group_by([key]) \
                .aggregate([([], "count_all")])
            return g.rename_columns(["nation_key", "n_part"])

        return ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
            .groupby("nation_key") \
            .aggregate(Sum("n_part", alias_name=alias))

    cust = side("customer", "c_nationkey", "c_acctbal", "n_cust", 9700)
    supp = side("supplier", "s_nationkey", "s_acctbal", "n_supp", 7000)
    # schema hints: at small SFs a side can pass the balance filter
    # NOWHERE (sf0.001 has 10 suppliers) — Ray drops an empty
    # pipeline's schema and the shuffle join dies without them; the
    # nationkey columns are int32 in the testdata parquet, counts are
    # grouped int64 sums
    key_t = pa.int32()
    j = equi_join(
        cust, supp, on="nation_key", how="full_outer",
        left_schema=pa.schema([("nation_key", key_t),
                               ("n_cust", pa.int64())]),
        right_schema=pa.schema([("nation_key", key_t),
                                ("n_supp", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "nation_key": pc.cast(b["nation_key"], pa.int64()),
            "n_cust": pc.cast(pc.fill_null(b["n_cust"], 0), pa.int64()),
            "n_supp": pc.cast(pc.fill_null(b["n_supp"], 0), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow",
                         zero_copy_batch=True)


def rolling_mean_events(sf_dir: str, frame: int = 3):
    """Per-user ROWS-frame windowed aggregate (ORACLED): mean of
    ``value`` over the current + ``frame`` preceding events of the same
    user ordered by (ts, event_id) — the smoothing/feature window shape
    the repo's other window ops (hopping, session, lag, rank) don't
    cover. ONE coarse user-hash partition (sessionization machinery);
    inside each partition the frame sums are vectorized SHIFTED adds in
    exactly the SQL frame order (((v[i-3]+v[i-2])+v[i-1])+v[i], nulls
    contributing +0.0, which is bitwise inert), so the floor-bp per-row
    outputs match DuckDB's running-sum window accumulation bit for bit.
    Null values are excluded from both sum and count (SQL AVG frame
    semantics); an all-null frame emits a null mean."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])

    def roll(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"],
                            na_position="last")
        uid = df["user_id"].to_numpy()
        v = df["value"].to_numpy(dtype=np.float64)   # nulls → NaN
        have = ~np.isnan(v)
        c0 = np.where(have, v, 0.0)
        s = np.zeros(len(df))
        n = np.zeros(len(df), dtype=np.int64)
        # accumulate oldest-first so each element's add sequence equals
        # the SQL frame order
        for k in range(frame, 0, -1):
            ck = np.zeros(len(df))
            nk = np.zeros(len(df), dtype=np.int64)
            if len(df) > k:
                in_frame = uid[k:] == uid[:-k]
                ck[k:] = np.where(in_frame, c0[:-k], 0.0)
                nk[k:] = in_frame & have[:-k]
            s = s + ck
            n = n + nk
        s = s + c0
        n = n + have
        with np.errstate(invalid="ignore", divide="ignore"):
            bp = np.floor(10000.0 * s / n)
        out = pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                            "n": n})
        out["mean_bp"] = pd.arrays.IntegerArray(
            np.where(n > 0, bp, 0).astype(np.int64), mask=(n == 0))
        return out

    res = partitioned_group_apply(ds, ["user_id"], roll).to_pandas()
    return res.sort_values("event_id").reset_index(drop=True)


def funnel_events(sf_dir: str):
    """First-touch conversion funnel view → click → purchase per user
    (the sequential-behavior statistic none of the window ops cover):
    t1 = the user's first view, t2 = first click strictly AFTER t1,
    t3 = first purchase strictly after t2. ONE coarse user-hash
    partition (users never split), a vectorized three-stage groupby-min
    chain inside each partition, and 3 tiny count rows per partition
    merged on the driver. Rows with null ts never satisfy the strict
    ordering on either engine (NULL/NaT comparisons are false), and a
    user whose views all carry null ts still enters stage 1 (SQL GROUP
    BY keeps the group; its t1 is NULL so no click can follow).
    ORACLED vs a 3-CTE min-join chain; conv_bp = floor(1e4·n/stage-1 n)
    with NULL on an empty funnel head."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def fn(t: pa.Table) -> pa.Table:
        # Arrow in, pandas only AFTER null users are split off: Ray's
        # pandas conversion of null-bearing int64 user_id coerces to
        # float64 (ids past 2^53 merge — the partitioned_group_apply
        # docstring trap). SQL's NULL-user group enters stage 1 (GROUP
        # BY keeps it; all null keys hash to one partition so it
        # counts once) but can never convert (JOIN on NULL never
        # matches) — so it contributes a constant +1 to stage 1 when
        # any null-user view exists, and nothing downstream.
        uid = t.column("user_id").combine_chunks()
        et = t.column("event_type").combine_chunks()
        null_view = bool(pc.any(pc.and_(
            pc.invert(uid.is_valid()),
            pc.equal(et, "view"))).as_py() or False)
        t2 = t.filter(uid.is_valid())
        df = pd.DataFrame({
            "user_id": t2.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "ts": t2.column("ts").to_numpy(zero_copy_only=False),
            "event_type": t2.column("event_type").to_numpy(
                zero_copy_only=False)})
        # merge, not DataFrame.join(on=..., how="inner"): join can hand
        # back a frame whose INDEX is the key while the column remains,
        # making the next groupby("user_id") ambiguous
        v = df.loc[df["event_type"] == "view"] \
            .groupby("user_id")["ts"].min()
        c = df.loc[df["event_type"] == "click", ["user_id", "ts"]] \
            .merge(v.rename("t1").reset_index(), on="user_id")
        c = c.loc[c["ts"] > c["t1"]].groupby("user_id")["ts"].min()
        p = df.loc[df["event_type"] == "purchase", ["user_id", "ts"]] \
            .merge(c.rename("t2").reset_index(), on="user_id")
        p = p.loc[p["ts"] > p["t2"]].groupby("user_id")["ts"].min()
        return pa.table({
            "stage_idx": pa.array([1, 2, 3], type=pa.int64()),
            "n_part": pa.array(
                [len(v) + int(null_view), len(c), len(p)],
                type=pa.int64())})

    parts = partitioned_group_apply(ds, ["user_id"], fn,
                                    batch_format="pyarrow").to_pandas()
    if parts.empty:
        # zero-row events: Ray hands back a column-less frame; the
        # oracle still answers 3 stage rows with n_users 0
        parts = pd.DataFrame({"stage_idx": pd.Series([], dtype="int64"),
                              "n_part": pd.Series([], dtype="int64")})
    n = parts.groupby("stage_idx")["n_part"].sum() \
        .reindex([1, 2, 3], fill_value=0)
    nv = int(n.loc[1])
    conv = np.floor(10000.0 * n.to_numpy() / nv).astype(np.int64) \
        if nv else None
    out = pd.DataFrame({
        "stage_idx": np.array([1, 2, 3], dtype=np.int64),
        "stage": ["view", "click", "purchase"],
        "n_users": n.to_numpy().astype(np.int64)})
    # float NaN, not pandas NA: the oracle's NULL BIGINT arrives as
    # float NaN through .df(), and the driver's canon must agree
    out["conv_bp"] = conv if conv is not None else np.full(3, np.nan)
    return out


def retention_cohorts_events(sf_dir: str):
    """Weekly retention-cohort matrix (the engagement statistic next to
    the funnel): cohort = the Monday-start week of a user's FIRST
    event; for each (cohort_week, offset_weeks) count the distinct
    users active in that week. ONE coarse user-hash partition — users
    never split, so per-partition distinct-user counts are additive
    and only (cohorts × offsets) tiny partial rows reach the driver.
    Null ts rows are invisible on both engines (WHERE ts IS NOT NULL);
    a null user_id never survives the SQL self-join, so it is excluded
    up front. Week truncation is Monday-start to match DuckDB
    date_trunc('week'). ORACLED."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        # Arrow in, pandas only AFTER nulls are filtered: Ray's pandas
        # conversion of a null-bearing int64 user_id coerces to
        # float64, merging distinct ids past 2^53 (the
        # partitioned_group_apply docstring trap) — and distinctness
        # is this query's core output
        keep = pc.and_(t.column("ts").combine_chunks().is_valid(),
                       t.column("user_id").combine_chunks().is_valid())
        t = t.filter(keep)
        empty = pa.table({"cw": pa.array([], type=pa.int64()),
                          "off": pa.array([], type=pa.int64()),
                          "n_part": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        day = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000
        week = day - (day + 3) % 7          # Monday-start (ISO) weeks
        u = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(
                zero_copy_only=False).astype(np.int64),
            "week": week})
        cw = u.groupby("user_id")["week"].transform("min")
        u["cw"] = cw
        u["off"] = (u["week"] - cw) // 7
        # cw is functionally dependent on user_id: (user, off) suffices
        cells = u.drop_duplicates(["user_id", "off"]) \
            .groupby(["cw", "off"]).size()
        out = cells.reset_index(name="n_part")
        return pa.Table.from_pandas(
            out.astype({"cw": "int64", "off": "int64",
                        "n_part": "int64"}), preserve_index=False)

    parts = partitioned_group_apply(ds, ["user_id"], fn,
                                    batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "cohort_week": pd.Series([], dtype="datetime64[us]"),
            "offset_weeks": pd.Series([], dtype="int64"),
            "n_users": pd.Series([], dtype="int64")})
    agg = parts.groupby(["cw", "off"])["n_part"].sum().reset_index()
    agg = agg.sort_values(["cw", "off"]).reset_index(drop=True)
    # epoch-day ints → datetime64[us] directly: unit='D' ns conversion
    # overflows past 2262 (inside the timestamp[us] input domain), and
    # the empty path above already declares [us]
    micros = agg["cw"].to_numpy(dtype=np.int64) * 86_400_000_000
    return pd.DataFrame({
        "cohort_week": pd.Series(micros.astype("datetime64[us]")),
        "offset_weeks": agg["off"].astype(np.int64),
        "n_users": agg["n_part"].astype(np.int64)})


def export_shards_documents(sf_dir: str):
    """Sharded training-data export: write documents into 16
    deterministic key-hash shards (the resumable output layout —
    shard = siphash64(doc_id) % 16 is a pure function of the key, so
    re-runs and different cluster shapes lay the same rows in the same
    shard directories) and return the committed manifest as per-shard
    row counts, cross-checked against a read-back count of one shard.
    Rows-only: the shard assignment is siphash-based (no SQL form)."""
    import os

    import pandas as pd

    from ..sources.tables import read_sharded, write_sharded
    src = os.path.join(sf_dir, "documents.parquet")
    out = os.path.join("/tmp", "jsonschema_ray_cache", "shards_" +
                       os.path.basename(os.path.dirname(src)))
    m = write_sharded(_read(sf_dir, "documents"), out, "doc_id",
                      num_shards=16)
    shards = sorted(int(k) for k in m["shard_rows"])
    if not shards:      # empty corpus: a committed, row-less export
        return pd.DataFrame({"shard": pd.Series([], dtype="int64"),
                             "n_rows": pd.Series([], dtype="int64")})
    probe = shards[0]
    got = read_sharded(out, shards=[probe]).count()
    if got != m["shard_rows"][str(probe)]:
        raise RuntimeError(
            f"shard {probe}: manifest says "
            f"{m['shard_rows'][str(probe)]} rows, read back {got}")
    return pd.DataFrame({
        "shard": pd.Series(shards, dtype="int64"),
        "n_rows": pd.Series([m["shard_rows"][str(s)] for s in shards],
                            dtype="int64")})


def clean_documents(sf_dir: str):
    """Stopword removal + whitespace collapse — RE2 on both sides, so
    DuckDB regexp_replace is an exact oracle."""
    from ..text.transform import normalize_text
    return normalize_text(_read(sf_dir, "documents",
                                columns=["doc_id", "text"]),
                          keep_cols=("doc_id",))


def chunk_documents(sf_dir: str):
    """Overlapping char-window chunking (window 200, stride 150) —
    codepoint indexing matches SQL substring()."""
    from ..text.transform import chunk_text
    return chunk_text(_read(sf_dir, "documents",
                            columns=["doc_id", "text"]),
                      window=200, stride=150)


def events_value_delta(sf_dir: str):
    """Per-user lag window: value minus the previous value ordered by
    (ts, event_id). Same partitioned-group shape as sessions/running
    totals; the delta of identical doubles is deterministic, no rounding
    needed."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts",
                                          "value"])

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        lagged = df.groupby("user_id", sort=False)["value"].shift(1)
        return pd.DataFrame({"event_id": df["event_id"].to_numpy(),
                             "delta": (df["value"] - lagged).to_numpy()})

    return partitioned_group_apply(ds, ["user_id"], deltas)


def quantity_percentiles(sf_dir: str):
    """Exact global discrete quantiles of l_quantity via a distributed
    value histogram: per-batch value_counts partials → one small groupby
    (≤ #distinct values rows) → driver-side cumulative index. Matches
    DuckDB quantile_disc (0-based index ceil(q·n)−1, verified)."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity"])
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    vals = _distinct_quantiles(ds, "l_quantity", qs)
    rows = [{"pctl": f"p{int(q * 100)}", "value": v}
            for q, v in zip(qs, vals)]
    return pd.DataFrame(rows).sort_values("pctl").reset_index(drop=True)


def _distinct_quantiles(ds, col: str, qs):
    """Exact discrete quantiles of a numeric column via the distributed
    value histogram (per-batch value_counts partials → ≤#distinct-row
    groupby → driver cumulative index). Matches SQL quantile_disc
    (0-based index ceil(q·n)−1). For continuous 100-TB columns whose
    distinct count approaches the row count, the approximate scale path
    is the t-digest machinery (stages/stats, drift) — this exact
    variant exists for auditable bounds on columns with bounded
    distinct cardinality."""
    from ray.data.aggregate import Sum

    def hist(b: pa.Table) -> pa.Table:
        t = b.select([col]).drop_null()
        if t.num_rows and pa.types.is_floating(t.column(col).type):
            # NaN is neither a quantile input nor a groupable key here
            # (repo psi/drift convention; SQL total order differs)
            t = t.filter(pc.invert(pc.is_nan(t.column(col))))
        vc = t.group_by([col]).aggregate([([], "count_all")])
        return vc.rename_columns([col, "n_part"])

    counts = ds.map_batches(hist, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(col).aggregate(Sum("n_part", alias_name="n")) \
        .to_pandas().sort_values(col).reset_index(drop=True)
    cum = counts["n"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out = []
    for q in qs:
        if n == 0:
            out.append(None)
            continue
        idx = max(int(np.ceil(q * n)) - 1, 0)
        pos = int(np.searchsorted(cum, idx + 1))
        out.append(float(counts[col].iloc[pos]))
    return out


def outlier_events_iqr(sf_dir: str):
    """Tukey-fence outlier detection on events.value: rows outside
    [q1 − 1.5·IQR, q3 + 1.5·IQR] with the quartiles computed EXACTLY by
    the distributed value histogram (quantile_disc semantics), then one
    broadcast-bounds filter pass — the standard numeric-column anomaly
    screen a data-quality pipeline runs next to drift/stats. The bounds
    arithmetic is the same two IEEE doubles on both sides, so on finite
    data the filter predicate is bit-identical to SQL. NaN rows are
    EXCLUDED from both the quartiles and the output (the repo's
    psi/drift convention; DuckDB's total order instead ranks NaN above
    every finite value) — NaN screening belongs to the validation
    rules, not the fence."""
    # the quartile pass reads ONLY the value column (half the bytes of
    # the two-column filter pass)
    q1, q3 = _distinct_quantiles(
        _read(sf_dir, "events", columns=["value"]), "value", (0.25, 0.75))
    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    if q1 is None:
        return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                             "value": pd.Series([], dtype="float64")})
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    import pyarrow.compute as pc

    def flt(b: pa.Table) -> pa.Table:
        v = b.column("value")
        keep = pc.or_(pc.less(v, lo), pc.greater(v, hi))
        return b.filter(pc.fill_null(keep, False))

    out = ds.map_batches(flt, batch_format="pyarrow",
                         zero_copy_batch=True).to_pandas()
    return out.sort_values(["event_id"]).reset_index(drop=True)


def lineitem_correlation(sf_dir: str):
    """Pearson correlation matrix of the lineitem numeric columns —
    cross-column dependence screening for data quality. The scalar
    columns are packed into a fixed-size vector per batch and run
    through the SAME one-pass O(p²)-partials moment machinery as PCA
    (ann/pca.covariance); corr_ij = cov_ij/√(cov_ii·cov_jj) on the
    driver's p×p matrix. Listwise null deletion (rows with any null
    dropped by the moment pass) — equal to SQL's pairwise corr() on
    null-free columns, which these are; documented divergence
    otherwise."""
    from ..ann.pca import covariance
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _read(sf_dir, "lineitem", columns=cols)

    def pack(b: pa.Table) -> pa.Table:
        X = np.column_stack([
            b.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        flat = pa.array(X.ravel(), type=pa.float64())
        return pa.table({"v": pa.FixedSizeListArray.from_arrays(
            flat, len(cols))})

    cov, mean, n = covariance(
        ds.map_batches(pack, batch_format="pyarrow",
                       zero_copy_batch=True), vec_col="v", strict=False)
    iu = np.triu_indices(len(cols))
    if cov is None:
        # empty / 1-row corpus: SQL corr answers NULL with n rows, not
        # an error — mirror the oracle's 10-row shape
        vals = np.full(len(iu[0]), np.nan)
    else:
        sd = np.sqrt(np.diag(cov))
        vals = np.round((cov / np.outer(sd, sd))[iu], 6)
    return pd.DataFrame({
        "col_i": [cols[i] for i in iu[0]],
        "col_j": [cols[j] for j in iu[1]],
        "corr": vals,
        "n": np.full(len(iu[0]), n, dtype=np.int64)})


def bpe_token_count_documents(sf_dir: str):
    """Token counting with a BPE-ish regex (GPT-2-shaped, RE2-compatible)
    alongside the whitespace count — the two standard budget estimators
    for LLM training data."""
    from ..text.analysis import bpe_token_counts, token_counts
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        col = b["text"].combine_chunks()
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens_ws": pa.array(token_counts(col)),
                         "n_tokens_bpe": pa.array(bpe_token_counts(col))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_documents(sf_dir: str):
    """Distributed TF-IDF over whitespace tokens: per-batch (doc, term,
    tf) partials, vocabulary-sized df via groupby, size-chosen equi-join
    back onto the streaming tf table. Integer basis-point scores keep the
    SQL oracle exact (libm log on both sides)."""
    from ..text.transform import tfidf
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    return tfidf(ds, n_docs=n_docs)


def pii_documents(sf_dir: str):
    """PII-ish pattern screening counts (email / phone / IPv4) — RE2
    non-overlapping match counts on both engines."""
    from ..text.analysis import pii_counts
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        out = {"doc_id": b["doc_id"]}
        out.update(pii_counts(b["text"].combine_chunks()))
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_documents(sf_dir: str):
    """Gopher-style word-repetition quality signals (duplicate-word and
    top-word fractions, integer basis points)."""
    from ..text.analysis import repetition_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        return repetition_features(b["doc_id"].combine_chunks(),
                                   b["text"].combine_chunks())

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def revenue_by_nation(sf_dir: str):
    """Three-way join composition: lineitem ⋈ orders (large×large
    partitioned shuffle) ⋈ customer (broadcast) with the nation name
    attached from a broadcast lookup, then the per-batch-combined grouped
    aggregate. The classic TPC-H Q5 shape without the date filters."""
    from ..joins import equi_join
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": r})

    li = li.map_batches(rev, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    oc = equi_join(orders, cust, on="o_custkey", right_on="c_custkey")
    oc = oc.select_columns(["o_orderkey", "c_nationkey"])
    joined = equi_join(li, oc, on="l_orderkey", right_on="o_orderkey",
                       broadcast_cap=0)
    per_key = grouped_agg(joined, ["c_nationkey"], {"revenue": "revenue"},
                          count_alias="n_items").to_pandas()
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    out = per_key.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    out["revenue"] = out["revenue"].round(2)
    out = out[["n_name", "revenue", "n_items"]]
    return out.sort_values("n_name").reset_index(drop=True)


def customers_no_bigorder(sf_dir: str):
    """Distributed anti-join: customers that never placed an order over
    200k (push the filter into the read, then a broadcast Acero
    anti-join — the right side shrinks before it ships)."""
    from ..joins import equi_join
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"])
    big = orders.filter(
        expr="o_totalprice >= 200000").select_columns(["o_custkey"])
    out = equi_join(cust, big, on="c_custkey", right_on="o_custkey",
                    how="anti").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def grouped_quantiles(ds, key: str, col: str, qs: tuple):
    """EXACT grouped quantiles (quantile_disc convention: smallest value
    whose cumulative count reaches ``ceil(q·n)``) via the same
    distributed histogram partials as the grouped median — the shuffle
    moves one row per (key, value, batch), the driver walks the
    per-group histograms (O(groups × distinct values))."""
    hist = grouped_agg(ds, [key, col], {}, count_alias="n").to_pandas()
    hist = hist.dropna(subset=[col])  # quantile_disc ignores NULL values
    out = []
    for k, g in hist.groupby(key):
        g = g.sort_values(col)
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g[col].to_numpy()
        for q in qs:
            target = max(int(np.ceil(q * total)), 1)
            out.append({key: k, "pctl": f"p{int(q * 100)}",
                        "value": float(vals[np.searchsorted(cum, target)])})
    return pd.DataFrame(out).sort_values([key, "pctl"]) \
        .reset_index(drop=True)


def quantity_quantiles_by_flag(sf_dir: str):
    """Grouped p25/p50/p90 over the discrete quantity column — the
    arbitrary-quantile generalization of median_quantity_by_flag."""
    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])
    return grouped_quantiles(ds, "l_returnflag", "l_quantity",
                             (0.25, 0.5, 0.9))


def neardup_components_documents(sf_dir: str):
    """Near-dup CLUSTERING (ORACLED): exact k-gram Jaccard pairs
    (threshold 0.5) → distributed connected components → one
    (doc_id, component_id) row per doc appearing in any pair, where
    component_id is the smallest doc id in its cluster. The oracle is a
    recursive-CTE transitive closure over the same SQL-computed pair
    set — pairs + clustering both checked end to end."""
    from ..dedup import connected_components, ngram_jaccard_pairs
    pairs = ngram_jaccard_pairs(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        threshold=0.5)
    out = connected_components(pairs).to_pandas()
    out = out.rename(columns={"node": "doc_id",
                              "component": "component_id"})
    return out.sort_values("doc_id").reset_index(drop=True)


def dup_passages_documents(sf_dir: str):
    """Repeated-passage detection (ORACLED): word 8-grams appearing in
    ≥ 2 distinct documents, with the distinct-document count. The gram
    STRING shuffles here so DuckDB can reproduce it; the 100-TB path is
    ``duplicate_passages(hash_only=True)`` (8 B gram hashes)."""
    from ..text import duplicate_passages
    out = duplicate_passages(
        _read(sf_dir, "documents", columns=["text"]),
        n=8, min_docs=2).to_pandas()
    return out.sort_values("gram").reset_index(drop=True)


def decontam_documents(sf_dir: str):
    """Benchmark decontamination (ORACLED): probe strings are the first
    40 characters of docs 1-5 (a deterministic stand-in for a benchmark
    suite); flags every document whose text contains any probe, with the
    number of probes matched."""
    from ..text import decontaminate
    probe_src = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def first5(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["doc_id"], 1),
                       pc.less_equal(b["doc_id"], 5))
        return b.filter(keep)

    pdf = probe_src.map_batches(first5, batch_format="pyarrow",
                                zero_copy_batch=True).to_pandas()
    probes = [t[:40] for t in pdf["text"].tolist() if t]
    out = decontaminate(
        _read(sf_dir, "documents", columns=["doc_id", "text"]),
        probes).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def entropy_documents(sf_dir: str):
    """Per-document char-level Shannon entropy in bits (ORACLED against
    DuckDB's entropy() aggregate over unnested code points) — a
    standard corpus quality signal (low entropy = boilerplate/repeats)."""
    from ..text import char_entropy

    def fn(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "char_entropy": char_entropy(b["text"])})

    out = _read(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(fn, batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def events_value_histogram(sf_dir: str, bin_width: float = 25.0):
    """Fixed-width histogram of events.value (ORACLED): bin = floor
    (value / width); count + sum per bin via the partial-agg groupby —
    the distribution-profiling primitive behind drift/stats at scale."""
    ds = _read(sf_dir, "events", columns=["value"])

    def with_bin(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b["value"]))   # oracle: value IS NOT NULL
        v = b["value"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array(np.floor(v / bin_width).astype(np.int64)),
            "value": b["value"]})

    out = grouped_agg(ds.map_batches(with_bin, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["bin"], {"value": "sum_value"},
                      count_alias="n").to_pandas()
    out = _round_cols(out, ["sum_value"])
    return out[["bin", "n", "sum_value"]].sort_values("bin") \
        .reset_index(drop=True)


def events_value_zscore(sf_dir: str):
    """Group-normalized z-scores (ORACLED): per-event-type mean/stddev
    from one moment-partials pass (3 numbers per (group, batch) move),
    broadcast back and applied per batch — the standard feature
    normalization pattern where per-group stats must NOT trigger a
    second full shuffle."""
    import functools

    import ray
    from ray.data.aggregate import Sum
    ds = _read(sf_dir, "events", columns=["event_id", "event_type",
                                          "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        t = pa.table({"event_type": b["event_type"],
                      "_v": pa.array(np.nan_to_num(v)),
                      "_v2": pa.array(np.nan_to_num(v * v)),
                      "_k": pa.array((~np.isnan(v)).astype(np.int64))})
        agg = t.group_by(["event_type"]).aggregate(
            [("_v", "sum"), ("_v2", "sum"), ("_k", "sum")])
        return agg.rename_columns(["event_type", "_s", "_s2", "_n"])

    stats = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072) \
        .groupby("event_type").aggregate(
            Sum("_s", alias_name="s"), Sum("_s2", alias_name="s2"),
            Sum("_n", alias_name="n")).to_pandas()
    mean = (stats["s"] / stats["n"]).to_numpy()
    var = (stats["s2"] / stats["n"]).to_numpy() - mean * mean
    std = np.sqrt(np.maximum(var, 0))
    ref = ray.put((stats["event_type"].to_numpy(), mean, std))

    def score(b: pa.Table, *, ref) -> pa.Table:
        from ..util import worker_cached
        keys, m, s = worker_cached(("zscore", ref.hex()),
                                   lambda: ray.get(ref))
        idx = pc.index_in(b["event_type"],
                          value_set=pa.array(keys)).to_numpy(
                              zero_copy_only=False).astype(np.int64)
        v = b["value"].to_numpy(zero_copy_only=False)
        z = (v - m[idx]) / s[idx]
        return pa.table({"event_id": b["event_id"],
                         "event_type": b["event_type"],
                         "z": pa.array(np.round(z, 4))})

    out = ds.map_batches(functools.partial(score, ref=ref),
                         batch_format="pyarrow", zero_copy_batch=True) \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def drift_exact_events(sf_dir: str):
    """EXACT two-sample KS drift (ORACLED): events split by
    ``user_id % 2``, KS = max ECDF gap over the merged per-value
    histogram — the exact companion to the t-digest ``drift_events_value``
    (same split rule a real pipeline would use for A/B cohorts). Both
    sides compute counts/total double divisions, so the statistic is
    bit-identical to the SQL window-ECDF form."""
    from ..checks import exact_ks
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def grp(b: pa.Table) -> np.ndarray:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return (u % 2).astype(np.int8)

    ks, n_a, n_b = exact_ks(ds, "value", grp)
    return pd.DataFrame([{"ks": round(ks, 6), "n_a": n_a, "n_b": n_b}])


def psi_events(sf_dir: str, bin_width: float = 25.0):
    """EXACT fixed-bin PSI drift (ORACLED): events split into A/B cohorts
    by ``user_id % 2``, per-bin stability terms over floor(value/25)
    bins — the exact companion to the t-digest PSI in drift_events_value,
    same pairing as drift_exact_events vs the t-digest KS. Per-bin
    output (counts + term) instead of one total so the float comparison
    never depends on summation order."""
    from ..checks import psi_exact
    ds = _read(sf_dir, "events", columns=["user_id", "value"])

    def grp(b: pa.Table) -> np.ndarray:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return (u % 2).astype(np.int8)

    out, _total = psi_exact(ds, "value", grp, bin_width)
    out["psi_term"] = np.round(out["psi_term"].to_numpy(), 6)
    return out


def dedup_neardup_keep_documents(sf_dir: str):
    """End-to-end near-dup dedup (ORACLED): exact-Jaccard pairs →
    connected components → drop every non-representative → the surviving
    doc_id keep-list, filtered with the broadcast drop-set pattern
    (losers shuffle, winners never collect — same shape as exact_dedup)."""
    import ray

    from ..dedup import connected_components, ngram_jaccard_pairs
    from ..util import worker_cached
    source = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = ngram_jaccard_pairs(source, threshold=0.5)
    cc = connected_components(pairs).to_pandas()
    drop = np.sort(cc.loc[cc["node"] != cc["component"],
                          "node"].to_numpy())
    ref = ray.put(pa.array(drop))

    def keep(b: pa.Table) -> pa.Table:
        d = worker_cached(("neardup_keep", ref.hex()),
                          lambda: ray.get(ref))
        mask = pc.invert(pc.is_in(b["doc_id"], value_set=d))
        return b.filter(mask).select(["doc_id"])

    out = source.map_batches(keep, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def grouped_rollup(ds, keys: list[str], sums: dict[str, str],
                   count_alias: str = "n_rows", all_label: str = "(all)"):
    """GROUP BY ROLLUP in ONE shuffle: the per-batch combiner aggregates
    at the finest level, then locally re-aggregates the (already tiny)
    partial upward level by level with ``all_label`` standing in for the
    rolled-up key (string keys only) — the shuffle carries
    (levels+1) × group-cardinality partial rows per batch, never
    (levels+1) × data. SQL's ROLLUP NULL markers map to ``all_label``
    (callers coalesce on the oracle side)."""
    import functools

    from ray.data.aggregate import Sum
    sum_cols = list(sums)
    psums = [f"{c}_psum" for c in sum_cols]

    def partial(b: pa.Table) -> pa.Table:
        t = _partial_group_agg(b.select(keys + sum_cols),
                               keys=tuple(keys), sum_cols=tuple(sum_cols))
        outs = [t]
        for lvl in range(len(keys) - 1, -1, -1):
            k = keys[lvl]
            i = t.schema.get_field_index(k)
            # cast to the SOURCE key type (large_string/dictionary blocks
            # would make concat_tables raise on a plain-string literal)
            lit = pa.array([all_label] * len(t), type=pa.string()) \
                .cast(t.schema.field(k).type)
            t = t.set_column(i, k, lit)
            t = t.group_by(keys).aggregate(
                [(c, "sum") for c in psums] + [("_pcnt", "sum")])
            t = t.rename_columns(keys + psums + ["_pcnt"])
            outs.append(t)
        return pa.concat_tables(outs)

    partials = ds.select_columns(keys + sum_cols).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)
    aggs = [Sum(f"{c}_psum", alias_name=out) for c, out in sums.items()]
    aggs.append(Sum("_pcnt", alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)


def rollup_orders_segment_priority(sf_dir: str):
    """ROLLUP (segment, priority) over orders ⋈ customer (ORACLED against
    GROUP BY ROLLUP with NULL→'(all)' coalesce): per-(segment, priority)
    totals + per-segment subtotals + the grand total from one shuffle."""
    from ..joins import equi_join
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority",
                            "o_totalprice"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"])
    j = equi_join(orders, cust, on="o_custkey", right_on="c_custkey") \
        .select_columns(["c_mktsegment", "o_orderpriority",
                         "o_totalprice"])
    out = grouped_rollup(j, ["c_mktsegment", "o_orderpriority"],
                         {"o_totalprice": "sum_price"},
                         count_alias="n_orders").to_pandas()
    out = _round_cols(out, ["sum_price"])
    out = out.rename(columns={"c_mktsegment": "segment",
                              "o_orderpriority": "priority"})
    return out[["segment", "priority", "n_orders", "sum_price"]] \
        .sort_values(["segment", "priority"]).reset_index(drop=True)


def chi2_events(sf_dir: str):
    """Chi-square contingency drift (ORACLED): event_type × (user_id % 2)
    cohort independence test from one grouped-count shuffle; the driver
    walks the tiny contingency table."""
    from ..checks import chi2_contingency
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def grp(b: pa.Table) -> np.ndarray:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        return (u % 2).astype(np.int8)

    chi2, dof = chi2_contingency(ds, "event_type", grp)
    return pd.DataFrame([{"chi2": round(chi2, 6), "dof": dof}])


def percent_rank_by_value(ds, value_col: str, out_col: str = "pct_rank",
                          keep_cols: list = None):
    """Global ``percent_rank() OVER (ORDER BY value)`` WITHOUT a global
    sort: one grouped-count pass builds the per-distinct-value histogram
    (partial-agg shuffle, one row per (value, batch)), the driver turns
    it into cumulative below-counts (O(distinct values)), broadcasts
    them, and a second streaming pass gathers each row's rank —
    rank-assignment never moves the data through a sort exchange. Ties
    share the SQL rank() value: pct = rows_below / (n - 1)."""
    import functools

    import ray

    from ..util import worker_cached
    ds = ds.materialize()   # one source execution feeds BOTH passes — a
    # lazy input would re-execute (and a nondeterministic one could show
    # the rank pass values absent from the histogram)
    hist = grouped_agg(ds.select_columns([value_col]), [value_col], {},
                       count_alias="_c").to_pandas()
    # null values carry no rank: drop the NaN histogram bin (it would
    # also defeat the vals[idx] != v determinism check, NaN != NaN) and
    # filter null rows out of the rank pass below
    hist = hist.dropna(subset=[value_col]).sort_values(value_col)
    counts = hist["_c"].to_numpy()
    n = int(counts.sum())
    below = np.concatenate(([0], counts.cumsum()[:-1]))
    ref = ray.put((hist[value_col].to_numpy(), below, n))

    def rank_batch(b: pa.Table, *, ref) -> pa.Table:
        import pyarrow.compute as pc
        vals, blw, total = worker_cached(("pct_rank", ref.hex()),
                                         lambda: ray.get(ref))
        if b[value_col].null_count:
            b = b.filter(pc.is_valid(b[value_col]))
        v = b[value_col].to_numpy(zero_copy_only=False)
        if len(v) == 0:
            # every row was null (nulls carry no rank) or the block is
            # empty — nothing to rank, and the histogram check below
            # would raise spuriously on len(vals) == 0
            cols = {c: b[c] for c in (keep_cols or b.column_names)}
            cols[out_col] = pa.array([], type=pa.float64())
            return pa.table(cols)
        idx = np.searchsorted(vals, v)
        if len(vals) == 0 or (idx >= len(vals)).any() \
                or (vals[np.minimum(idx, len(vals) - 1)] != v).any():
            raise ValueError(
                "percent_rank_by_value: rank-pass value missing from the "
                "histogram — the input Dataset is not deterministic")
        pr = blw[idx] / max(total - 1, 1)
        cols = {c: b[c] for c in (keep_cols or b.column_names)}
        cols[out_col] = pa.array(np.round(pr, 6))
        return pa.table(cols)

    return ds.map_batches(functools.partial(rank_batch, ref=ref),
                          batch_format="pyarrow", zero_copy_batch=True)


def events_percent_rank(sf_dir: str):
    """Global percent-rank of events.value (ORACLED against
    rank() OVER (ORDER BY value)) via the sort-free histogram-broadcast
    path — rows_below/(n-1) is an int/int double division, bit-identical
    both sides."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    out = percent_rank_by_value(ds, "value",
                                keep_cols=["event_id"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def _sql_mod(i: np.ndarray, m: int) -> np.ndarray:
    """SQL-truncation modulo (sign follows the DIVIDEND): numpy's
    floor-mod disagrees for negative ids (-5 % 100 = 95 vs SQL's -5),
    which would silently desynchronize split/sample assignment from the
    oracle on corpora with negative integer ids."""
    return np.where(i >= 0, i % m, -((-i) % m))


def assign_split(ds, id_col: str, val_pct: int = 10, test_pct: int = 10,
                 out_col: str = "split"):
    """Deterministic train/val/test assignment for integer ids (ORACLED:
    bucket = id % 100; val = first ``val_pct`` buckets, test = next
    ``test_pct``). Stateless per batch — no shuffle, no driver state —
    so the split is stable across runs, resumes and cluster sizes. For
    string ids hash to int64 first (sketches.hashing.hash64_array) — the
    modulo-on-hash variant is not SQL-reproducible, hence int ids here."""
    import functools

    def fn(b: pa.Table, *, id_col, val_pct, test_pct,
           out_col) -> pa.Table:
        i = b[id_col].to_numpy(zero_copy_only=False)
        bucket = _sql_mod(i, 100)
        s = np.where(bucket < val_pct, "val",
                     np.where(bucket < val_pct + test_pct, "test",
                              "train"))
        return b.append_column(out_col, pa.array(s, type=pa.string()))

    return ds.map_batches(
        functools.partial(fn, id_col=id_col, val_pct=val_pct,
                          test_pct=test_pct, out_col=out_col),
        batch_format="pyarrow", zero_copy_batch=True)


def split_documents(sf_dir: str):
    """Train/val/test split counts per split (the assignment itself is
    per-row; aggregating keeps the compared result small and pins both
    the assignment rule and the fractions)."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    tagged = assign_split(ds, "doc_id")
    out = grouped_agg(tagged, ["split"], {}, count_alias="n_docs") \
        .to_pandas()
    return out.sort_values("split").reset_index(drop=True)


QUALITY_THRESHOLDS = dict(min_chars=100, max_chars=10000, min_tokens=10,
                          min_alpha_bp=4000, max_space_bp=4000)


def quality_keep_mask(col: pa.Array) -> tuple:
    """(keep mask, n_tokens int64 array) for a text column under the
    Gopher-style QUALITY_THRESHOLDS — the definition the e2e curation
    pipeline applies. quality_filter_documents deliberately re-derives
    the same decision from quality_documents' OUTPUT columns instead:
    both queries are independently oracled, so any drift between the
    two shows up as a driver oracle mismatch, not silence."""
    from ..text import token_counts
    th = QUALITY_THRESHOLDS
    n = pc.utf8_length(col).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    nullmask = np.isnan(n)
    safe = np.maximum(np.where(nullmask, 1.0, n), 1.0)
    toks = token_counts(col).to_numpy(zero_copy_only=False) \
        .astype(np.float64)

    def bp(pattern):
        c = pc.count_substring_regex(col, pattern).to_numpy(
            zero_copy_only=False).astype(np.float64)
        return np.floor(10000.0 * np.where(nullmask, 0.0, c) / safe)

    keep = (~nullmask & (n >= th["min_chars"]) & (n <= th["max_chars"])
            & (toks >= th["min_tokens"])
            & (bp(r"[A-Za-z]") >= th["min_alpha_bp"])
            & (bp(r" ") <= th["max_space_bp"]))
    ntok = np.where(nullmask, 0, toks).astype(np.int64)
    return keep, ntok


def quality_filter_documents(sf_dir: str):
    """Gopher-style quality keep-list (ORACLED): documents passing ALL
    thresholds — length in [100, 10000] chars, ≥ 10 tokens, alpha ratio
    ≥ 40% (basis points, floor semantics shared with quality_documents),
    space ratio ≤ 40%. The filter composes the oracled quality signals
    into the actual curation decision a 100-TB pipeline ships."""
    q = quality_documents(sf_dir)

    th = QUALITY_THRESHOLDS
    def keep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.and_(pc.greater_equal(b["n_chars"], th["min_chars"]),
                    pc.less_equal(b["n_chars"], th["max_chars"])),
            pc.greater_equal(b["n_tokens"], th["min_tokens"])),
            pc.and_(pc.greater_equal(b["alpha_bp"], th["min_alpha_bp"]),
                    pc.less_equal(b["space_bp"], th["max_space_bp"])))
        return b.filter(pc.fill_null(m, False)).select(["doc_id"])

    out = q.map_batches(keep, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def pack_documents(sf_dir: str):
    """Training-sequence packing (ORACLED): every document assigned to a
    fixed-2048-token pack by GLOBAL token prefix sum in doc_id order
    (cumsum-division convention — exactly a SQL window function, see
    text/packing.py for the bucketed two-phase distributed shape)."""
    from ..text import pack_sequences, token_counts
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def tok(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": token_counts(
                             b["text"].combine_chunks())})

    counted = ds.map_batches(tok, batch_format="pyarrow",
                             zero_copy_batch=True)
    out = pack_sequences(counted, window=2048).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


STRATA_BP = {"en": 2500, "de": 5000, "fr": 7500}  # per-lang keep rate (bp)


def stratified_sample(ds, group_col: str, rates_bp: dict, id_col: str,
                      default_bp: int = 10000):
    """Deterministic per-group downsampling: keep a row iff
    ``id % 100 < rates_bp[group] // 100`` (1% rate granularity) — the
    mixture-rebalancing step of a training-data pipeline (e.g. cap
    dominant languages). Stateless per batch: no shuffle, no randomness,
    stable under resume/partitioning (same convention as assign_split).
    For id-correlated corpora use a hashed id upstream."""
    keys = pa.array(list(rates_bp.keys()))
    vals = np.fromiter(rates_bp.values(), dtype=np.int64,
                       count=len(rates_bp))

    def fn(b: pa.Table) -> pa.Table:
        # vectorized dict lookup: index_in + take (no per-row Python)
        idx = pc.index_in(b[group_col], value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.float64)
        miss = np.isnan(idx)
        bp = np.where(miss, default_bp,
                      vals[np.nan_to_num(idx).astype(np.int64)])
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.filter(pa.array(_sql_mod(ids, 100) < bp // 100))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample_documents(sf_dir: str):
    """Per-language stratified keep-list (ORACLED): en capped at 25%,
    de 50%, fr 75%, everything else kept."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    out = stratified_sample(ds, "lang", STRATA_BP, "doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def props_field_by_type(sf_dir: str):
    """Semi-structured field extraction (ORACLED): pull the integer ``k``
    out of the JSON ``props`` string with ONE vectorized RE2
    ``extract_regex`` (no per-row json.loads), then a per-batch combined
    grouped sum/count by event_type — both engines (Arrow, DuckDB) run
    the same RE2 pattern, so extraction is bit-identical."""
    import pyarrow.compute as pc
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:  # schema-stable empty combiner block
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "_s": pa.array([], type=pa.int64()),
                             "_c": pa.array([], type=pa.int64())})
        ex = pc.extract_regex(b["props"], r'"k":\s*(?P<v>-?\d+)')
        k = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        t = pa.table({"event_type": b["event_type"], "k": k})
        agg = t.group_by(["event_type"]).aggregate(
            [("k", "sum"), ("k", "count")])
        return agg.rename_columns(["event_type", "_s", "_c"])

    from ray.data.aggregate import Sum
    out = ds.map_batches(fn, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("event_type").aggregate(
            Sum("_s", alias_name="sum_k"),
            Sum("_c", alias_name="n_with_k")).to_pandas()
    # a group where no row had an extractable k: SQL SUM of all NULLs is
    # NULL — keep it nullable instead of crashing the int cast
    out["sum_k"] = out["sum_k"].astype("Int64")
    out["n_with_k"] = out["n_with_k"].fillna(0).astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def incremental_dedup(new_ds, seen_ds, text_col: str = "text",
                      id_col: str = "doc_id",
                      bloom_fp: float = None,
                      broadcast_cap: int = 1 << 30,
                      num_partitions: int = None):
    """Incremental-ingestion dedup: drop NEW rows whose ``text_col``
    content already exists in the SEEN corpus. The seen side ships as a
    broadcast 128-bit content-hash set (16 B per distinct seen doc —
    the text never moves; ``bloom_fp`` swaps it for a Bloom filter at
    extreme seen-corpus sizes, admitting ≈fp false drops); the new side
    streams through one hash + filter pass. The standard shape for
    "new crawl shard arrives, drop what the training set already has".

    Above ``broadcast_cap`` (exact mode only) the broadcast degrades to
    ONE hash-pair co-partition of the new rows against the seen pairs —
    a full shuffle of the new shard, but the (usually much larger) seen
    corpus still moves only 16 B/doc."""
    import functools

    import ray

    from ..dedup.exact import _add_hash128
    from ..util import partitioned_group_apply, worker_cached

    def hashes(b: pa.Table) -> pa.Table:
        # null text is excluded on BOTH sides: SQL '=' never matches NULL,
        # so null-text new rows are always kept
        t = b.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        if t.null_count:
            import pyarrow.compute as pc
            b = b.filter(pc.is_valid(t))
        h = _add_hash128(b, col_name=text_col)
        return h.select(["_h1", "_h2"])

    seen_h = seen_ds.select_columns([text_col]).map_batches(
        hashes, batch_format="pyarrow", zero_copy_batch=True) \
        .materialize()
    if bloom_fp is None and seen_h.size_bytes() > broadcast_cap:
        new_schema = new_ds.schema().base_schema
        new_names = list(new_schema.names)

        def mark_seen(b: pa.Table) -> pa.Table:
            cols = {nm: pa.nulls(b.num_rows, type=new_schema.field(nm).type)
                    for nm in new_names}
            cols["_h1"], cols["_h2"] = b["_h1"], b["_h2"]
            cols["_seen"] = pa.array(np.ones(b.num_rows, dtype=bool))
            return pa.table(cols)

        def mark_new(b: pa.Table) -> pa.Table:
            h = _add_hash128(b, col_name=text_col)
            cols = {nm: h[nm] for nm in new_names}
            cols["_h1"], cols["_h2"] = h["_h1"], h["_h2"]
            cols["_seen"] = pa.array(np.zeros(b.num_rows, dtype=bool))
            return pa.table(cols)

        union = seen_h.map_batches(
            mark_seen, batch_format="pyarrow", zero_copy_batch=True) \
            .union(new_ds.map_batches(
                mark_new, batch_format="pyarrow", zero_copy_batch=True))

        def anti(df: pd.DataFrame) -> pd.DataFrame:
            seen_pairs = df.loc[df["_seen"], ["_h1", "_h2"]] \
                .drop_duplicates()
            out = df.loc[~df["_seen"]]
            if len(seen_pairs):
                m = out.merge(seen_pairs, on=["_h1", "_h2"], how="left",
                              indicator=True)
                out = m.loc[m["_merge"] == "left_only"]
            return out[new_names]

        joined = partitioned_group_apply(union, ["_h1", "_h2"], anti,
                                         num_partitions=num_partitions)

        empty_typed = pa.table({nm: pa.array(
            [], type=new_schema.field(nm).type) for nm in new_names})

        def restore(b: pa.Table) -> pa.Table:
            if b.num_rows == 0 or set(new_names) - set(b.column_names):
                return empty_typed  # schema-stable empty block
            return pa.table({nm: b[nm].cast(new_schema.field(nm).type,
                                            safe=False)
                             for nm in new_names})

        import ray.data as rd
        restored = joined.map_batches(restore, batch_format="pyarrow",
                                      zero_copy_batch=True)
        # typed seed: an all-duplicates shard otherwise surfaces as a
        # column-less dataset (downstream column access crashes)
        return rd.from_arrow(empty_typed).union(restored)

    seen = seen_h.to_pandas()
    pairs = np.unique(np.stack([seen["_h1"].to_numpy(),
                                seen["_h2"].to_numpy()], axis=1), axis=0)
    if bloom_fp is not None:
        from ..sketches.bloom import BloomFilter
        bf = BloomFilter(max(1, len(pairs)), fp=bloom_fp)
        # the 128-bit pair is already uniform: fold to one 64-bit key
        bf.add_hashes(pairs[:, 0].view(np.uint64)
                      ^ pairs[:, 1].view(np.uint64))
        ref = ray.put(bf)
    else:
        ref = ray.put((np.ascontiguousarray(pairs[:, 0]),
                       np.ascontiguousarray(pairs[:, 1])))

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        state = worker_cached(("incdedup", ref.hex()),
                              lambda: ray.get(ref))
        h = _add_hash128(b, col_name=text_col)
        h1 = h.column("_h1").to_numpy()
        h2 = h.column("_h2").to_numpy()
        tvalid = pc.is_valid(b.column(text_col)).to_numpy(
            zero_copy_only=False)
        if bloom_fp is not None:
            hit = state.contains_hashes(h1.view(np.uint64)
                                        ^ h2.view(np.uint64))
        else:
            s1, s2 = state
            lo = np.searchsorted(s1, h1, side="left")
            hi = np.searchsorted(s1, h1, side="right")
            hit = np.zeros(len(h1), dtype=bool)
            single = (hi - lo) == 1
            hit[single] = s2[lo[single]] == h2[single]
            for i in np.nonzero((hi - lo) > 1)[0]:
                hit[i] = bool((s2[lo[i]:hi[i]] == h2[i]).any())
        hit &= tvalid                       # null text never matches
        return b.filter(pa.array(~hit))

    return new_ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def incremental_dedup_documents(sf_dir: str):
    """Incremental dedup (ORACLED): the seen corpus is the first 80% of
    doc ids, the arriving shard the last 40% — the overlapping 20%
    really gets dropped (its texts are already present), the tail 20%
    survives."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()
    c60, c80 = int(n * 0.6), int(n * 0.8)
    seen = docs.filter(expr=f"doc_id < {c80}")
    new = docs.filter(expr=f"doc_id >= {c60}")
    out = incremental_dedup(new, seen).to_pandas()
    if "doc_id" not in out.columns:     # Ray: empty to_pandas loses cols
        out = pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def dedup_events_window(sf_dir: str, window_s: int = 600):
    """Time-window event dedup (ORACLED): drop an event when the SAME
    (user_id, event_type) fired within the previous ``window_s`` seconds
    — the bot/double-fire cleaning step of an event pipeline. ONE coarse
    hash-partition on user_id (same machinery as sessionization), the
    LAG comparison fully vectorized inside each partition."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])
    win_us = window_s * 1_000_000

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "event_type", "ts", "event_id"])
        ok = df["ts"].notna().to_numpy()   # null ts: LAG diff is NULL →
        us = df["ts"].astype("int64").to_numpy()  # kept on both sides
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        drop = np.zeros(len(df), dtype=bool)
        with np.errstate(over="ignore"):
            drop[1:] = same[1:] & ok[1:] & ok[:-1] \
                & (us[1:] - us[:-1] <= win_us)
        return df.loc[~drop, ["event_id"]]

    out = partitioned_group_apply(ds, ["user_id"], dedup).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def curate_documents(sf_dir: str, window: int = 2048):
    """END-TO-END curation pipeline (ORACLED as one SQL CTE chain):
    quality filter → exact dedup (min-id winner among the quality
    survivors, text never shuffles) → deterministic train/val/test
    split → the TRAIN docs packed into fixed-``window``-token sequences
    by global prefix sum. Output: one row per curated doc —
    (doc_id, n_tokens, split, pack_id), pack_id null off-train. This is
    the composition a real training-data run ships; every stage is the
    operator already oracled in isolation."""
    from ..dedup import exact_dedup
    from ..text import pack_sequences, token_counts
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def qfilter(b: pa.Table) -> pa.Table:
        col = b["text"].combine_chunks()
        keep, ntok = quality_keep_mask(col)
        out = b.append_column("n_tokens", pa.array(ntok))
        return out.filter(pa.array(keep))

    filtered = ds.map_batches(qfilter, batch_format="pyarrow",
                              zero_copy_batch=True)
    winners = exact_dedup(filtered, text_col="text", id_col="doc_id") \
        .drop_columns(["text"])
    tagged = assign_split(winners, "doc_id").materialize()  # two readers
    full = tagged.to_pandas()
    train = tagged.filter(expr="split == 'train'") \
        .select_columns(["doc_id", "n_tokens"])
    packed = pack_sequences(train, window=window).to_pandas()
    if "doc_id" not in packed.columns:  # Ray: empty to_pandas loses cols
        packed = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                               "pack_id": pd.Series([], dtype="int64")})
    out = full.merge(packed[["doc_id", "pack_id"]], on="doc_id",
                     how="left")
    # canon parity with the oracle: DuckDB's pandas conversion answers
    # a nullable BIGINT as float64+NaN when nulls exist (off-train rows
    # always do), int64 otherwise — NOT pandas Int64/<NA> (the funnel
    # conv_bp rule)
    out["pack_id"] = out["pack_id"].astype(
        "int64" if out["pack_id"].notna().all() else "float64")
    return out[["doc_id", "n_tokens", "split", "pack_id"]] \
        .sort_values("doc_id").reset_index(drop=True)


def incremental_minhash_documents(sf_dir: str):
    """Incremental NEAR-dup (rows-only: LSH recall + minhash estimator
    are probabilistic): the first 80% of docs' minhash signatures are
    persisted once (content-keyed /tmp cache, the stored-index pattern
    of ann_ivf_index) and the last 40% arrive as a shard — pairs where
    an arriving doc's estimated jaccard against a seen doc ≥ 0.5."""
    import os

    from ..dedup import incremental_minhash_neardup, \
        write_minhash_signatures
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n = docs.count()
    c60, c80 = int(n * 0.6), int(n * 0.8)
    # settings in the cache key: a stale index built with different
    # (num_hashes, k) or corpus cut would silently never collide
    sig_dir = _content_cached_dir(
        os.path.join(os.path.abspath(sf_dir), "documents.parquet"),
        f"{c80}|mh128k5", "/tmp/jsonschema_ray_mhsig",
        lambda d: write_minhash_signatures(
            docs.filter(expr=f"doc_id < {c80}"), d))
    return incremental_minhash_neardup(
        docs.filter(expr=f"doc_id >= {c60}"), sig_dir, threshold=0.5)


def incremental_embedding_documents(sf_dir: str):
    """Incremental embedding near-dup (rows-only: hyperplane LSH recall
    is probabilistic): the first 80% of vectors' unit-vector index is
    persisted once (content-keyed /tmp cache) and the last 40% arrive
    as a shard — pairs with exact cosine ≥ 0.99 that share a bucket."""
    import os

    from ..dedup import incremental_embedding_neardup, \
        write_embedding_index
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = emb.count()
    c60, c80 = int(n * 0.6), int(n * 0.8)
    idx_dir = _content_cached_dir(
        os.path.join(os.path.abspath(sf_dir), "embeddings.parquet"),
        f"{c80}|emb", "/tmp/jsonschema_ray_embidx",
        lambda d: write_embedding_index(
            emb.filter(expr=f"vec_id < {c80}"), d))
    return incremental_embedding_neardup(
        emb.filter(expr=f"vec_id >= {c60}"), idx_dir, threshold=0.99)


# ---------------------------------------------------------------------------
# multi-way join pipelines (TPC-H Q3/Q5 shapes) + sketch-verified heavy
# hitters + RANGE-frame burst window


def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (ORACLED): top-10 orders by unshipped revenue for
    one market segment — segment-filtered customers broadcast-SEMI-join
    into date-filtered orders, the lineitem stream (date filter + revenue
    projection applied per batch before anything joins) meets the
    qualified orders through the size-chosen join plan, per-order revenue
    via the combiner groupby, and the top-10 is a per-block partial
    top-k merged on the driver — the per-order group set never gathers.
    Revenue sums hold ≤7 addends per order, so the 2-dp rounding is
    sum-order-proof on both engines."""
    import datetime as dt

    from ..joins import equi_join
    cut = dt.datetime(1998, 6, 1)
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.less(b["o_orderdate"], pa.scalar(cut))),
        batch_format="pyarrow", zero_copy_batch=True)
    qorders = equi_join(orders, cust, on="o_custkey",
                        right_on="c_custkey", how="semi") \
        .select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])

    def rev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cut)))
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": r})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        rev, batch_format="pyarrow", zero_copy_batch=True)
    q3_empty = pd.DataFrame({
        "l_orderkey": pd.Series([], dtype="int64"),
        "revenue": pd.Series([], dtype="float64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_orderpriority": pd.Series([], dtype="object")})
    try:
        joined = equi_join(li, qorders, on="l_orderkey",
                           right_on="o_orderkey") \
            .select_columns(["l_orderkey", "revenue", "o_orderdate",
                             "o_orderpriority"])
    except ValueError as ex:
        # no qualifying orders at all: Ray drops the schema of the
        # all-empty semi-join output and equi_join refuses inner on a
        # schema-less right — the whole result is the typed empty
        # top-10 (a right_schema hint would instead MATERIALIZE the
        # corpus-sized qualified-orders stream on every healthy run)
        if "right side is empty" in str(ex):
            return q3_empty
        raise
    per_order = grouped_agg(joined,
                            ["l_orderkey", "o_orderdate",
                             "o_orderpriority"],
                            {"revenue": "revenue"}, count_alias="_n")

    top = _partial_topk(per_order, ["revenue", "l_orderkey"],
                        [False, True], 10, round_col="revenue")
    if top is None:
        # all-empty pipeline: Ray drops the schema — typed empty top-10
        return q3_empty
    return top[["l_orderkey", "revenue", "o_orderdate",
                "o_orderpriority"]]


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA"):
    """TPC-H Q5 shape (ORACLED): per-nation revenue where the customer
    and the supplier share the nation, restricted to one region — the
    six-table join with a CROSS-side equality predicate
    (c_nationkey = s_nationkey) that no chained key join expresses.
    region⋈nation prune driver-side (≤ dozens of rows), customers AND
    suppliers are filtered to the region's nation keys per batch BEFORE
    anything joins (the classic pushed-down plan), lineitem streams
    through orderkey then suppkey joins with only
    (orderkey, c_nationkey | suppkey, revenue) riding them, the cross
    predicate filters per batch, and only per-nation partials shuffle."""
    from ..joins import equi_join
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    nat = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nat = nat[nat["r_name"] == region]
    in_region = sorted(int(k) for k in nat["n_nationkey"])

    def prune(col):
        def fn(b: pa.Table) -> pa.Table:
            vs = pa.array(in_region, type=b.schema.field(col).type)
            return b.filter(pc.is_in(b[col], value_set=vs))
        return fn

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        prune("c_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True)
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).map_batches(
        prune("s_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"], "revenue": r})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"]).map_batches(
        rev, batch_format="pyarrow", zero_copy_batch=True)
    q5_empty = pd.DataFrame({"n_name": pd.Series([], dtype="object"),
                             "revenue": pd.Series([], dtype="float64")})
    try:
        oc = equi_join(orders, cust, on="o_custkey",
                       right_on="c_custkey") \
            .select_columns(["o_orderkey", "c_nationkey"])
        lioc = equi_join(li, oc, on="l_orderkey",
                         right_on="o_orderkey") \
            .select_columns(["l_suppkey", "c_nationkey", "revenue"])
        los = equi_join(lioc, supp, on="l_suppkey",
                        right_on="s_suppkey").map_batches(
            lambda b: b.filter(pc.equal(b["c_nationkey"],
                                        b["s_nationkey"])),
            batch_format="pyarrow", zero_copy_batch=True)
    except ValueError as ex:
        # no in-region customers/suppliers (or an empty dimension): Ray
        # drops the all-empty side's schema and equi_join refuses inner
        # — the whole result is the typed empty report (see the q3 note
        # on why a right_schema hint is wrong for healthy-run scale)
        if "right side is empty" in str(ex):
            return q5_empty
        raise
    per_nat = grouped_agg(los, ["s_nationkey"], {"revenue": "revenue"},
                          count_alias="_n").to_pandas()
    if per_nat.empty or "s_nationkey" not in per_nat.columns:
        return q5_empty
    out = per_nat.merge(nat[["n_nationkey", "n_name"]],
                        left_on="s_nationkey", right_on="n_nationkey")
    out["revenue"] = out["revenue"].round(2)
    return out[["n_name", "revenue"]] \
        .sort_values(["revenue", "n_name"], ascending=[False, True]) \
        .reset_index(drop=True)


def _range_frame_counts(ts: np.ndarray, seg_starts: np.ndarray,
                        horizon: int, force_loop: bool = False
                        ) -> np.ndarray:
    """Per-row count of same-segment rows with value in
    ``[ts_i - horizon, ts_i]``, for ``ts`` int64 sorted ascending WITHIN
    each segment (segments contiguous, starting at ``seg_starts``).
    Vectorized via a band-shifted key — each segment's values are offset
    into a disjoint int64 band wider than the global span + horizon, so
    the array becomes GLOBALLY sorted and two searchsorted calls answer
    every segment's range queries at once without cross-segment bleed
    (the nearest foreign key is > horizon away by construction). Falls
    back to a per-segment loop when the banding would overflow int64."""
    n = ts.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    nseg = seg_starts.shape[0]
    span = int(ts.max()) - int(ts.min()) + int(horizon) + 1
    if not force_loop and (nseg + 1) * span < (1 << 62):
        seg = np.zeros(n, dtype=np.int64)
        seg[seg_starts[1:]] = 1
        seg = np.cumsum(seg)
        key = (ts - ts.min()) + seg * span
        lo = np.searchsorted(key, key - horizon, side="left")
        hi = np.searchsorted(key, key, side="right")
        return (hi - lo).astype(np.int64)
    out = np.empty(n, dtype=np.int64)
    ends = np.append(seg_starts[1:], n)
    for s, e in zip(seg_starts, ends):
        w = ts[s:e]
        out[s:e] = (np.searchsorted(w, w, side="right")
                    - np.searchsorted(w, w - horizon, side="left"))
    return out


def burst_rate_events(sf_dir: str, window_min: int = 60):
    """Per-user peak request rate (ORACLED): the maximum number of a
    user's events inside any sliding ``window_min``-minute RANGE window
    ``[t - w, t]`` anchored at an event — the rate-limit / bot-screen
    statistic, and the RANGE-frame window shape rolling_mean's ROWS
    frame doesn't cover (peers at equal ts all count, per SQL RANGE
    CURRENT ROW semantics). Null users and null timestamps are excluded
    up front on BOTH engines (the contract pins the well-defined
    subset). ONE coarse user-hash partition; inside each partition two
    vectorized searchsorted calls over a band-shifted key answer every
    user's frame counts at once (``_range_frame_counts``), then
    ``maximum.reduceat`` takes the per-user max — only (user, max) rows
    leave the partitions."""
    from ..util import partitioned_group_apply
    horizon = window_min * 60_000_000  # interval in microsecond ticks
    ds = _read(sf_dir, "events", columns=["user_id", "ts"]).map_batches(
        lambda b: b.filter(pc.and_(pc.is_valid(b["user_id"]),
                                   pc.is_valid(b["ts"]))),
        batch_format="pyarrow", zero_copy_batch=True)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "max_burst": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        new = np.empty(len(df), dtype=bool)
        new[0] = True
        new[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(new)
        cnt = _range_frame_counts(ts, starts, horizon)
        return pd.DataFrame({
            "user_id": uid[starts].astype(np.int64),
            "max_burst": np.maximum.reduceat(cnt, starts)
            .astype(np.int64)})

    out = partitioned_group_apply(ds, ["user_id"], fn).to_pandas()
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "max_burst": pd.Series([], dtype="int64")})
    return out.sort_values("user_id").reset_index(drop=True)


def heavy_hitters_cms_events(sf_dir: str, threshold: int = 80,
                             gather_cap_bytes: int = 64 << 20):
    """Heavy-hitter users by count-min sketch + exact verify (ORACLED):
    exactly SQL's ``GROUP BY user_id HAVING count(*) >= T``. Pass 1
    streams one fixed-size (4×W uint64) CMS partial per batch, merged
    on the driver (the sketch is LINEAR — a tree reduce at cluster
    scale); W is sized to the stream's metadata row count so the
    per-cell collision mass stays well under the threshold (a fixed
    width saturates once N/W approaches T and the screen passes
    everyone). Pass 2 re-streams the column against the broadcast
    merged sketch and keeps each batch's DISTINCT ids whose estimate
    reaches T: CMS only ever OVER-counts, so every true heavy hitter
    survives — no false negatives. Pass 3 trims the over-counted light
    ids with an exact candidate-only count (broadcast is_in prune →
    combiner partials → candidate-sized groupby). The candidate gather
    is CAP-GATED by measured size: a saturated screen (threshold tiny
    relative to the stream — at that point the "heavy hitters" are
    most of the key set and no sketch can help) degrades to the exact
    distributed count over ALL users instead of a corpus-sized driver
    gather — degrade, never die. Only the survivors (the answer)
    ever land on the driver. Null users are excluded up front on both
    engines."""
    import ray

    from ..sketches import CountMinSketch
    from ..util import worker_cached
    raw = _read(sf_dir, "events", columns=["user_id"])
    n_hint = raw.count()       # parquet metadata, not a scan
    # per-cell collision mass n/W must sit well under T for the screen
    # to prune; cap W so a per-batch partial stays ~2 MB
    W, D = 8192, 4
    while W < (1 << 16) and n_hint * 8 > W * max(int(threshold), 1):
        W <<= 1
    ds = raw.map_batches(
        lambda b: b.filter(pc.is_valid(b["user_id"])),
        batch_format="pyarrow", zero_copy_batch=True)
    empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                          "n": pd.Series([], dtype="int64")})

    def sketch_partial(b: pa.Table) -> pa.Table:
        s = CountMinSketch(W, D).add_column(
            b["user_id"].combine_chunks())
        return pa.table({"sk": pa.array([s.to_bytes()],
                                        type=pa.binary())})

    merged = CountMinSketch(W, D)
    for t in ds.map_batches(sketch_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for bs in t["sk"].to_pylist():
            merged.merge(CountMinSketch.from_bytes(bs, W, D))
    ref = ray.put(merged.to_bytes())

    def candidates(b: pa.Table) -> pa.Table:
        sk = worker_cached(
            ("cms", ref.hex()),
            lambda: CountMinSketch.from_bytes(ray.get(ref), W, D))
        ids = pc.unique(b["user_id"].combine_chunks())
        keep = ids.filter(pa.array(
            sk.estimate(ids) >= np.uint64(threshold)))
        return pa.table({"user_id": keep})

    cand_ds = ds.map_batches(candidates, batch_format="pyarrow",
                             zero_copy_batch=True).materialize()
    small = cand_ds.size_bytes() <= gather_cap_bytes
    cand = cand_ds.to_pandas() if small else None
    # release the materialized candidate blocks either way — in the
    # saturated-screen case they are near the full distinct-key set and
    # must not stay pinned while the exact count (the memory-hungry
    # pass) runs
    del cand_ds
    stream = ds
    if small:
        if cand.empty or "user_id" not in cand.columns:
            return empty
        cand_ids = np.unique(cand["user_id"].to_numpy())
        stream = _broadcast_key_filter(ds, "user_id", cand_ids)
    counts = grouped_agg(stream, ["user_id"], {}, count_alias="n")
    surv = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["n"], pa.scalar(int(threshold), type=pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if surv.empty or "n" not in surv.columns:
        return empty
    out = surv.copy()
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "n"]].sort_values("user_id") \
        .reset_index(drop=True)


def q4_order_priority(sf_dir: str):
    """TPC-H Q4 shape (ORACLED): order count by priority for a 3-month
    window, keeping only orders with at least one returned lineitem —
    SQL's correlated EXISTS as a distributed SEMI join. The probe side
    is date-pruned per batch at the read; the build side carries ONLY
    per-batch-distinct returned orderkeys (the semi join never needs a
    key twice, so the dedup happens before anything ships); the result
    is the 5-row grouped count — nothing corpus-sized ever gathers.
    Mirrors the reference's EXISTS-style applicator gating (contains /
    if-then-else over row sets) at table granularity."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1996, 4, 1)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
            pc.less(b["o_orderdate"], pa.scalar(hi))))
        .select(["o_orderkey", "o_orderpriority"]),
        batch_format="pyarrow", zero_copy_batch=True)
    returned = _distinct_filtered_keys(
        sf_dir, "lineitem", "l_orderkey",
        lambda b: b.filter(pc.equal(b["l_returnflag"], "R")),
        columns=["l_orderkey", "l_returnflag"])
    qualified = equi_join(orders, returned, on="o_orderkey",
                          right_on="l_orderkey", how="semi")
    out = grouped_agg(qualified, ["o_orderpriority"], {},
                      count_alias="order_count").to_pandas()
    if out.empty or "o_orderpriority" not in out.columns:
        return pd.DataFrame({
            "o_orderpriority": pd.Series([], dtype="object"),
            "order_count": pd.Series([], dtype="int64")})
    out["order_count"] = out["order_count"].astype("int64")
    return out[["o_orderpriority", "order_count"]] \
        .sort_values("o_orderpriority").reset_index(drop=True)


def stale_parts_anti(sf_dir: str):
    """Parts with NO shipment on or after a cutoff (ORACLED): SQL's
    NOT EXISTS with a correlated predicate as a distributed ANTI join.
    The build side is date-filtered AND per-batch-distinct before the
    join (an anti join only needs each key once); the part side streams
    two columns. Inventory-staleness shape: at 100 TB the right side is
    the recently-shipped key set — small relative to the catalog — so
    the size-chosen plan broadcasts it; above the cap it rides Ray's
    left_anti shuffle."""
    import datetime as dt

    from ..joins import equi_join
    cut = dt.datetime(2001, 1, 1)
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    shipped = _distinct_filtered_keys(
        sf_dir, "lineitem", "l_partkey",
        lambda b: b.filter(pc.greater_equal(b["l_shipdate"],
                                            pa.scalar(cut))),
        columns=["l_partkey", "l_shipdate"])
    out = equi_join(part, shipped, on="p_partkey",
                    right_on="l_partkey", how="anti").to_pandas()
    if out.empty or "p_partkey" not in out.columns:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "p_brand": pd.Series([], dtype="object")})
    return out[["p_partkey", "p_brand"]].sort_values("p_partkey") \
        .reset_index(drop=True)


def q10_returned_items(sf_dir: str):
    """TPC-H Q10 shape (ORACLED): top-20 customers by revenue of
    RETURNED items in a 3-month order window. lineitem is
    returnflag-pruned and revenue-projected per batch at the read; the
    order window joins through the size-chosen plan; per-customer
    revenue reduces via the combiner groupby BEFORE customer attributes
    attach (the wide customer row never rides the big join — it joins
    the aggregate, hinted because a narrow window can qualify zero
    customers); nation names attach from a driver-side 25-row lookup
    and the top-20 is a per-block partial top-k merged on the driver.
    Revenue per customer-window holds few addends, so 2-dp rounding is
    stable on both engines (same convention as q3/revenue_by_nation)."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1996, 7, 1), dt.datetime(1996, 10, 1)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey",
                            "o_orderdate"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
            pc.less(b["o_orderdate"], pa.scalar(hi))))
        .select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)

    def rev(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        r = pc.multiply(b["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.table({"l_orderkey": b["l_orderkey"], "revenue": r})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount",
                        "l_returnflag"]).map_batches(
        rev, batch_format="pyarrow", zero_copy_batch=True)
    empty = pd.DataFrame({
        "c_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype="object"),
        "revenue": pd.Series([], dtype="float64"),
        "c_acctbal": pd.Series([], dtype="float64"),
        "n_name": pd.Series([], dtype="object")})
    try:
        j1 = equi_join(li, orders, on="l_orderkey",
                       right_on="o_orderkey") \
            .select_columns(["o_custkey", "revenue"])
    except ValueError as ex:
        # empty order window: Ray drops the all-empty side's schema and
        # equi_join refuses inner on a schema-less right (hinting would
        # materialize the corpus-sized stream on every healthy run)
        if "right side is empty" in str(ex):
            return empty
        raise
    per_cust = grouped_agg(j1, ["o_custkey"], {"revenue": "revenue"},
                           count_alias="_n") \
        .select_columns(["o_custkey", "revenue"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_acctbal",
                          "c_nationkey"])
    j2 = equi_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                   right_schema=pa.schema([
                       pa.field("o_custkey", pa.int64()),
                       pa.field("revenue", pa.float64())]))
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()

    top = _partial_topk(j2, ["revenue", "c_custkey"], [False, True],
                        20, round_col="revenue")
    if top is None:
        return empty
    top = top.merge(nat, left_on="c_nationkey", right_on="n_nationkey",
                    how="left")
    return top[["c_custkey", "c_name", "revenue", "c_acctbal",
                "n_name"]].reset_index(drop=True)


def q18_large_volume_orders(sf_dir: str, threshold: float = 180.0):
    """TPC-H Q18 shape (ORACLED): top-100 large-volume orders — SQL's
    ``IN (SELECT … GROUP BY … HAVING sum(qty) > T)`` as an
    AGGREGATE-DERIVED join: the qualifying key set is itself a
    distributed combiner groupby, filtered per batch, and it carries its
    sum so nothing recomputes downstream. Orders join the (hinted,
    aggregate-shaped) qualifier, customer names attach the same way as
    q10 — the wide customer row joins the bounded qualified set, never
    the lineitem stream — and the top-100 is the shared per-block
    partial top-k. Quantities are integral, so the HAVING comparison
    and the sum hash exactly across engines."""
    from ..joins import equi_join
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    # per-ORDER keys are near row cardinality: the hash-partition
    # aggregate, not Ray's sort-based one (15.2 s -> measured faster)
    per_order = grouped_agg_hash(li, ["l_orderkey"],
                                 {"l_quantity": "sum_qty"},
                                 count_alias="_n")
    big = per_order.map_batches(
        lambda b: b.select(["l_orderkey", "sum_qty"]).filter(
            pc.greater(b["sum_qty"], pa.scalar(float(threshold)))),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    qual = equi_join(orders, big, on="o_orderkey",
                     right_on="l_orderkey",
                     right_schema=pa.schema([
                         pa.field("l_orderkey", pa.int64()),
                         pa.field("sum_qty", pa.float64())]))
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    j2 = equi_join(cust, qual, on="c_custkey", right_on="o_custkey",
                   right_schema=pa.schema([
                       pa.field("o_orderkey", pa.int64()),
                       pa.field("o_custkey", pa.int64()),
                       pa.field("o_orderdate", pa.timestamp("us")),
                       pa.field("o_totalprice", pa.float64()),
                       pa.field("sum_qty", pa.float64())]))
    top = _partial_topk(j2, ["o_totalprice", "o_orderdate", "o_orderkey"],
                        [False, True, True], 100)
    if top is None:
        return pd.DataFrame({
            "c_name": pd.Series([], dtype="object"),
            "c_custkey": pd.Series([], dtype="int64"),
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_totalprice": pd.Series([], dtype="float64"),
            "sum_qty": pd.Series([], dtype="float64")})
    return top[["c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty"]]


def top_event_type_by_user(sf_dir: str):
    """Grouped MODE (ORACLED): each user's most frequent event type,
    SQL row_number tie-breaking (count DESC, then event_type ASC, nulls
    last). Phase 1 is the combiner groupby over (user, type) — the only
    corpus-sized pass; phase 2 picks the argmax inside ONE coarse
    user-hash partition of the pair-aggregate (users never split, so
    the pick is exact; only user×type aggregate rows ride the second
    shuffle, never events). Null users are excluded up front on both
    engines; a null TYPE is a real SQL group and can win the mode."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type"]).map_batches(
        lambda b: b.filter(pc.is_valid(b["user_id"])),
        batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_agg(ds, ["user_id", "event_type"], {},
                         count_alias="n")

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "n", "event_type"],
                            ascending=[True, False, True],
                            na_position="last", kind="mergesort")
        return df.groupby("user_id", as_index=False, dropna=False) \
            .head(1)

    out = partitioned_group_apply(counts, ["user_id"], pick).to_pandas()
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "top_type": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64")})
    out = out.rename(columns={"event_type": "top_type"})
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "top_type", "n"]].sort_values("user_id") \
        .reset_index(drop=True)


def q7_volume_shipping(sf_dir: str, nation_a: str = "NATION_9",
                       nation_b: str = "NATION_11"):
    """TPC-H Q7 shape (ORACLED): shipping volume between two nations by
    ship YEAR, both directions — a join tree with a DISJUNCTIVE
    cross-side pair predicate ((a,b) OR (b,a)) and a derived grouping
    column (year extraction, Arrow kernel). Supplier and customer are
    nation-pruned per batch BEFORE joining (2/25 of each dimension);
    lineitem is date-pruned and carries only (orderkey, suppkey,
    volume, year); orders meets the tiny pruned-customer broadcast
    FIRST, so the join that the lineitem stream sees on its right is
    the ~2/25 customer-pruned slice of orders, never the full table;
    only per-(pair, year) partials shuffle. ``nation_a`` must differ
    from ``nation_b``: the pair predicate is the two cross directions
    only (intra-nation volume is a different query — refuse loudly
    rather than return a silently-empty frame)."""
    import datetime as dt

    from ..joins import equi_join
    if nation_a == nation_b:
        raise ValueError("q7_volume_shipping: nation_a and nation_b "
                         "must differ (the pair predicate covers the "
                         "two cross directions only)")
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    keys = {r.n_name: int(r.n_nationkey) for r in nat.itertuples()
            if r.n_name in (nation_a, nation_b)}
    empty = pd.DataFrame({
        "supp_nation": pd.Series([], dtype="object"),
        "cust_nation": pd.Series([], dtype="object"),
        "l_year": pd.Series([], dtype="int64"),
        "revenue": pd.Series([], dtype="float64")})
    if len(keys) < 2:
        return empty
    ka, kb = keys[nation_a], keys[nation_b]
    pair = pa.array(sorted((ka, kb)), type=pa.int32())

    def prune(col):
        def fn(b: pa.Table) -> pa.Table:
            vs = pc.cast(pair, b.schema.field(col).type)
            return b.filter(pc.is_in(b[col], value_set=vs))
        return fn

    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).map_batches(
        prune("s_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True)
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        prune("c_nationkey"), batch_format="pyarrow",
        zero_copy_batch=True)
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1998, 1, 1)

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        return pa.table({
            "l_orderkey": b["l_orderkey"], "l_suppkey": b["l_suppkey"],
            "volume": pc.multiply(b["l_extendedprice"],
                                  pc.subtract(pa.scalar(1.0),
                                              b["l_discount"])),
            "l_year": pc.cast(pc.year(b["l_shipdate"]), pa.int64())})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    try:
        ls = equi_join(li, supp, on="l_suppkey", right_on="s_suppkey") \
            .select_columns(["l_orderkey", "volume", "l_year",
                             "s_nationkey"])
        # orders ⋈ pruned-customer FIRST: the lineitem stream's right
        # side is then the ~2/25 slice of orders with c_nationkey
        # already attached — one fewer corpus-stream join, ~12× less
        # broadcast/shuffle footprint than joining full orders
        oc = equi_join(orders, cust, on="o_custkey",
                       right_on="c_custkey") \
            .select_columns(["o_orderkey", "c_nationkey"])
        full = equi_join(ls, oc, on="l_orderkey",
                         right_on="o_orderkey").map_batches(
            lambda b: b.filter(pc.or_(
                pc.and_(pc.equal(b["s_nationkey"], ka),
                        pc.equal(b["c_nationkey"], kb)),
                pc.and_(pc.equal(b["s_nationkey"], kb),
                        pc.equal(b["c_nationkey"], ka)))),
            batch_format="pyarrow", zero_copy_batch=True)
    except ValueError as ex:
        # a nation with zero suppliers/customers empties a pruned
        # dimension: Ray drops its schema and equi_join refuses inner
        if "right side is empty" in str(ex):
            return empty
        raise
    agg = grouped_agg(full, ["s_nationkey", "c_nationkey", "l_year"],
                      {"volume": "revenue"}, count_alias="_n") \
        .to_pandas()
    if agg.empty or "revenue" not in agg.columns:
        return empty
    names = {v: k for k, v in keys.items()}
    agg["supp_nation"] = agg["s_nationkey"].map(names)
    agg["cust_nation"] = agg["c_nationkey"].map(names)
    agg["revenue"] = agg["revenue"].round(2)
    agg["l_year"] = agg["l_year"].astype("int64")
    return agg[["supp_nation", "cust_nation", "l_year", "revenue"]] \
        .sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)


def events_dow_pivot(sf_dir: str):
    """PIVOT / conditional aggregation (ORACLED): per event type, the
    count for each day of week as SEVEN WIDE COLUMNS (dow_0=Sunday …
    dow_6, DuckDB dayofweek convention = Arrow day_of_week with
    week_start=7, count_from_zero). The corpus pass is the combiner
    groupby over (type, dow) — at most types×7 rows reach the driver,
    where the wide layout is assembled (pandas merge matching NaN keys
    is load-bearing: a null TYPE is a real SQL group and must collect
    its per-dow counts). Null timestamps are excluded up front on both
    engines."""
    def proj(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b["ts"]))
        return pa.table({
            "event_type": f["event_type"],
            "dow": pc.cast(pc.day_of_week(
                f["ts"], count_from_zero=True, week_start=7),
                pa.int64())})

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    counts = grouped_agg(ds, ["event_type", "dow"], {},
                         count_alias="n").to_pandas()
    cols = [f"dow_{d}" for d in range(7)]
    if counts.empty or "event_type" not in counts.columns:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             **{c: pd.Series([], dtype="int64")
                                for c in cols}})
    out = counts[["event_type"]].drop_duplicates().reset_index(drop=True)
    for d in range(7):
        sub = counts[counts["dow"] == d][["event_type", "n"]] \
            .rename(columns={"n": f"dow_{d}"})
        out = out.merge(sub, on="event_type", how="left")
    for c in cols:
        out[c] = out[c].fillna(0).astype("int64")
    return out.sort_values("event_type", na_position="last") \
        .reset_index(drop=True)


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape (ORACLED): distribution of per-customer URGENT
    order counts INCLUDING zero-count customers — SQL's LEFT OUTER JOIN
    with the predicate in the JOIN condition (a WHERE would silently
    drop the zero bucket), then a SECOND aggregation over the first
    aggregate's values. The orders stream reduces to per-customer
    partials via the combiner groupby; customer keys left-join that
    (hinted) aggregate so never-matched customers surface as null→0;
    the distribution groupby runs over the customer-sized intermediate
    only — at most distinct-count rows reach the driver. Mirrors the
    reference's two-level applicator nesting (contains over contains)
    at table granularity."""
    from ..joins import equi_join
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"]).map_batches(
        lambda b: b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
        .select(["o_custkey"]),
        batch_format="pyarrow", zero_copy_batch=True)
    per_cust = grouped_agg(orders, ["o_custkey"], {},
                           count_alias="c_count")
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    j = equi_join(cust, per_cust, on="c_custkey", right_on="o_custkey",
                  how="left_outer",
                  right_schema=pa.schema([
                      pa.field("o_custkey", pa.int64()),
                      pa.field("c_count", pa.int64())]))
    counts = j.map_batches(
        lambda b: pa.table({"c_count": pc.fill_null(
            pc.cast(b["c_count"], pa.int64()), 0)}),
        batch_format="pyarrow", zero_copy_batch=True)
    dist = grouped_agg(counts, ["c_count"], {},
                       count_alias="custdist").to_pandas()
    if dist.empty or "c_count" not in dist.columns:
        return pd.DataFrame({
            "c_count": pd.Series([], dtype="int64"),
            "custdist": pd.Series([], dtype="int64")})
    dist["c_count"] = dist["c_count"].astype("int64")
    dist["custdist"] = dist["custdist"].astype("int64")
    return dist[["c_count", "custdist"]] \
        .sort_values(["custdist", "c_count"], ascending=[False, False]) \
        .reset_index(drop=True)


def q22_idle_balance(sf_dir: str, cutoff=None):
    """TPC-H Q22 shape (ORACLED): per-nation count + total balance of
    customers whose balance exceeds the GLOBAL average positive balance
    and who placed no order since a cutoff — a scalar subquery (one
    tiny moment pass: per-batch (sum, n) partials, the threshold is a
    driver float broadcast into the filter), composed with NOT EXISTS
    as the distributed anti join (recent-order keys are per-batch
    distinct before they ship) and a final combiner groupby. The
    balance filter applies BEFORE the anti join so only above-average
    customers probe it. Balances are 2-dp values (exact-multiple sums,
    so the 2-dp rounding is boundary-safe); the avg threshold is the
    one float compare both engines must agree on — verified exact at
    all SFs, and any tie would need a balance within 1 ulp of the
    grand mean."""
    import datetime as dt

    from ..joins import equi_join
    if cutoff is None:
        cutoff = dt.datetime(2000, 9, 1)
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def moment(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b["c_acctbal"], pa.scalar(0.0)))
        v = pos["c_acctbal"].to_numpy(zero_copy_only=False)
        return pa.table({"_s": pa.array([float(v.sum())]),
                         "_n": pa.array([len(v)], type=pa.int64())})

    parts = cust.map_batches(moment, batch_format="pyarrow",
                             zero_copy_batch=True).to_pandas()
    empty = pd.DataFrame({
        "c_nationkey": pd.Series([], dtype="int64"),
        "numcust": pd.Series([], dtype="int64"),
        "totacctbal": pd.Series([], dtype="float64")})
    n_pos = int(parts["_n"].sum()) if "_n" in parts.columns else 0
    if n_pos == 0:
        # SQL: avg over zero rows is NULL and `x > NULL` admits nothing
        return empty
    thr = float(parts["_s"].sum()) / n_pos
    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b["c_acctbal"], pa.scalar(thr))),
        batch_format="pyarrow", zero_copy_batch=True)
    recent = _distinct_filtered_keys(
        sf_dir, "orders", "o_custkey",
        lambda b: b.filter(pc.greater_equal(b["o_orderdate"],
                                            pa.scalar(cutoff))),
        columns=["o_custkey", "o_orderdate"])
    idle = equi_join(rich, recent, on="c_custkey", right_on="o_custkey",
                     how="anti")
    agg = grouped_agg(idle, ["c_nationkey"],
                      {"c_acctbal": "totacctbal"},
                      count_alias="numcust").to_pandas()
    if agg.empty or "c_nationkey" not in agg.columns:
        return empty
    agg["c_nationkey"] = agg["c_nationkey"].astype("int64")
    agg["numcust"] = agg["numcust"].astype("int64")
    agg["totacctbal"] = agg["totacctbal"].round(2)
    return agg[["c_nationkey", "numcust", "totacctbal"]] \
        .sort_values("c_nationkey").reset_index(drop=True)


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (ORACLED): the supplier(s) with the MAXIMUM
    3-month revenue — SQL's `= (SELECT max(...))` scalar subquery with
    tie preservation. Revenue per supplier reduces through the combiner
    groupby (the only corpus-sized pass) and is rounded to 2 dp per
    batch BEFORE both the max and the equality compare (both engines
    rank the rounded value, so a pair rounding to a tie cannot diverge
    — the _partial_topk convention). The max is a per-block partial max
    merged on the driver (one float gathers per block, never the
    aggregate); winners are filtered distributed and only the tie set
    joins supplier names (hinted: zero qualifying suppliers is legal)."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1996, 4, 1)

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        return pa.table({
            "l_suppkey": b["l_suppkey"],
            "volume": pc.multiply(b["l_extendedprice"],
                                  pc.subtract(pa.scalar(1.0),
                                              b["l_discount"]))})

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    rev = grouped_agg(li, ["l_suppkey"], {"volume": "total_revenue"},
                      count_alias="_n").map_batches(
        lambda b: pa.table({
            "l_suppkey": b["l_suppkey"],
            "total_revenue": pc.round(b["total_revenue"], 2)}),
        batch_format="pyarrow", zero_copy_batch=True)
    rev = rev.materialize()  # consumed twice: max probe + winner filter
    empty = pd.DataFrame({
        "s_suppkey": pd.Series([], dtype="int64"),
        "s_name": pd.Series([], dtype="object"),
        "total_revenue": pd.Series([], dtype="float64")})
    maxes = rev.map_batches(
        lambda b: pa.table({"_m": pa.array(
            [] if len(b) == 0 else [pc.max(b["total_revenue"]).as_py()],
            type=pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if maxes.empty or "_m" not in maxes.columns or maxes["_m"].isna().all():
        return empty
    best = float(maxes["_m"].max())
    winners = rev.map_batches(
        lambda b: b.filter(pc.equal(b["total_revenue"],
                                    pa.scalar(best))),
        batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = equi_join(supp, winners, on="s_suppkey", right_on="l_suppkey",
                    right_schema=pa.schema([
                        pa.field("l_suppkey", pa.int64()),
                        pa.field("total_revenue", pa.float64())])) \
        .to_pandas()
    if out.empty or "s_suppkey" not in out.columns:
        return empty
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name", "total_revenue"]] \
        .sort_values("s_suppkey").reset_index(drop=True)


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape (ORACLED): promo revenue share — a conditional
    aggregate RATIO (100 · promo volume / total volume) over a one-month
    lineitem window joined to part. The part side reduces to
    (p_partkey, is_promo bool) before the size-chosen join; the joined
    stream emits TWO partial sums per batch (branch and total — one
    pass, no second scan for the denominator); the driver evaluates the
    ratio. A ratio of large sums tolerates partial-order float drift
    far inside its 4-dp rounding. Empty window answers the SQL NULL
    ratio as one NaN row."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1996, 6, 1), dt.datetime(1996, 7, 1)

    def proj(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        return pa.table({
            "l_partkey": b["l_partkey"],
            "volume": pc.multiply(b["l_extendedprice"],
                                  pc.subtract(pa.scalar(1.0),
                                              b["l_discount"]))})

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_type"]).map_batches(
        lambda b: pa.table({
            "p_partkey": b["p_partkey"],
            "is_promo": pc.equal(b["p_type"], "PROMO")}),
        batch_format="pyarrow", zero_copy_batch=True)
    try:
        j = equi_join(li, part, on="l_partkey", right_on="p_partkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return pd.DataFrame({"promo_revenue":
                                 pd.Series([float("nan")])})
        raise

    def partial(b: pa.Table) -> pa.Table:
        v = b["volume"].to_numpy(zero_copy_only=False)
        promo = b["is_promo"].to_numpy(zero_copy_only=False)
        return pa.table({
            "_p": pa.array([float(v[promo].sum())]),
            "_t": pa.array([float(v.sum())])})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if parts.empty or "_t" not in parts.columns:
        return pd.DataFrame({"promo_revenue": pd.Series([float("nan")])})
    tot = float(parts["_t"].sum())
    if tot == 0.0:
        return pd.DataFrame({"promo_revenue": pd.Series([float("nan")])})
    ratio = round(100.0 * float(parts["_p"].sum()) / tot, 4)
    return pd.DataFrame({"promo_revenue": pd.Series([ratio])})


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#3"):
    """TPC-H Q17 shape (ORACLED): average yearly revenue lost by
    shipping small orders — a CORRELATED scalar subquery (per-part
    average quantity) as an aggregate-derived broadcast. The brand's
    part keys prune the lineitem stream per batch (broadcast key set —
    the correlated average only ever needs the brand's parts, so the
    corpus pass is the pruned slice, not full lineitem); ONE combiner
    groupby yields per-part (sum, n) and the threshold map ships via
    ray.put; the second pruned pass compares and sums partials.
    Quantities are integral doubles, so the per-part average — and
    therefore the strict `<` threshold — is EXACT on both engines (sums
    of integers carry no float order drift); the final sum of 2-dp
    prices divided by 7 can never sit at a rounding boundary (sum·100
    is integral, and k/7 has no fractional part of exactly .5)."""
    import functools

    import ray

    from ..util import worker_cached
    part_keys = _distinct_filtered_keys(
        sf_dir, "part", "p_partkey",
        lambda b: b.filter(pc.equal(b["p_brand"], brand)),
        columns=["p_partkey", "p_brand"]).to_pandas()
    if part_keys.empty or "p_partkey" not in part_keys.columns:
        return pd.DataFrame({"avg_yearly": pd.Series([float("nan")])})
    # the brand slice (~1/|brands| of the corpus, 3 columns) is
    # consumed twice (per-part averages, then the threshold compare):
    # materialize it once instead of re-running the full lineitem
    # read + prune for the second pass
    li = _broadcast_key_filter(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_quantity", "l_extendedprice"]),
        "l_partkey", part_keys["p_partkey"].to_numpy()).map_batches(
        # SQL avg ignores NULL quantities: the divisor must count only
        # valid values, not count_all (review pin) — carried as a
        # per-row validity column summed by the combiner groupby
        lambda b: b.append_column("_qv", pc.cast(
            pc.is_valid(b["l_quantity"]), pa.int64())),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    per_part = grouped_agg(li, ["l_partkey"],
                           {"l_quantity": "qty_sum", "_qv": "qty_n"},
                           count_alias="_c").to_pandas()
    if per_part.empty or "l_partkey" not in per_part.columns:
        return pd.DataFrame({"avg_yearly": pd.Series([float("nan")])})
    with np.errstate(invalid="ignore", divide="ignore"):
        # a part whose quantities are ALL null: SQL's avg is NULL and
        # the `<` never fires — 0/0 -> NaN gives the same exclusion
        thr = 0.5 * per_part["qty_sum"].to_numpy() \
            / per_part["qty_n"].to_numpy()
    thr_ref = ray.put((pa.array(per_part["l_partkey"].to_numpy(),
                                type=pa.int64()),
                       np.asarray(thr, dtype=np.float64)))

    def small_sum(b: pa.Table, *, ref) -> pa.Table:
        ks, th = worker_cached(("q17thr", ref.hex()),
                               lambda: ray.get(ref))
        idx = pc.index_in(b["l_partkey"], value_set=ks).to_numpy(
            zero_copy_only=False)
        # every surviving row's part is in the map by construction
        lim = th[idx.astype(np.int64)]
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        p = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        hit = q < lim
        return pa.table({"_s": pa.array([float(p[hit].sum())]),
                         "_n": pa.array([int(hit.sum())],
                                        type=pa.int64())})

    parts = li.map_batches(functools.partial(small_sum, ref=thr_ref),
                           batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    if "_n" not in parts.columns or int(parts["_n"].sum()) == 0:
        # SQL: sum over zero qualifying rows is NULL, and NULL/7 stays
        # NULL — not 0.0
        return pd.DataFrame({"avg_yearly": pd.Series([float("nan")])})
    total = float(parts["_s"].sum())
    return pd.DataFrame({"avg_yearly":
                         pd.Series([round(total / 7.0, 2)])})


_Q19_BRANCHES = (
    # (brand, size_max, qty_lo, qty_hi) — OR-of-conjunctions branches
    ("Brand#1", 10, 1.0, 15.0),
    ("Brand#2", 20, 10.0, 25.0),
    ("Brand#3", 30, 20.0, 35.0),
)


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19 shape (ORACLED): revenue under a DISJUNCTION of
    conjunctive branch predicates spanning BOTH join sides (part
    brand/size × lineitem quantity). The part side prunes to the union
    of branch-eligible parts and carries (key, brand, size); lineitem
    prunes to the quantity hull [min lo, max hi] per batch; after the
    size-chosen join each branch is one vectorized AND over Arrow
    kernels, OR-folded — no row loops, no per-branch rescan. One
    2-dp-rounded scalar (sum of a modest row set) returns."""
    from ..joins import equi_join
    brands = pa.array([b for b, _, _, _ in _Q19_BRANCHES])
    size_cap = max(s for _, s, _, _ in _Q19_BRANCHES)
    qlo = min(q for _, _, q, _ in _Q19_BRANCHES)
    qhi = max(q for _, _, _, q in _Q19_BRANCHES)

    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.is_in(b["p_brand"], value_set=brands),
            pc.and_(pc.greater_equal(b["p_size"], pa.scalar(1)),
                    pc.less_equal(b["p_size"],
                                  pa.scalar(size_cap))))),
        batch_format="pyarrow", zero_copy_batch=True)
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["l_quantity"], pa.scalar(qlo)),
            pc.less_equal(b["l_quantity"], pa.scalar(qhi)))),
        batch_format="pyarrow", zero_copy_batch=True)
    try:
        j = equi_join(li, part, on="l_partkey", right_on="p_partkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return pd.DataFrame({"revenue": pd.Series([float("nan")])})
        raise

    def partial(b: pa.Table) -> pa.Table:
        keep = None
        for brand, smax, lo, hi in _Q19_BRANCHES:
            cond = pc.and_(
                pc.and_(pc.equal(b["p_brand"], brand),
                        pc.less_equal(b["p_size"], pa.scalar(smax))),
                pc.and_(pc.greater_equal(b["l_quantity"],
                                         pa.scalar(lo)),
                        pc.less_equal(b["l_quantity"],
                                      pa.scalar(hi))))
            keep = cond if keep is None else pc.or_(keep, cond)
        f = b.filter(keep)
        v = pc.multiply(f["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), f["l_discount"]))
        s = pc.sum(v).as_py()
        return pa.table({"_s": pa.array([0.0 if s is None else
                                         float(s)]),
                         "_n": pa.array([len(f)], type=pa.int64())})

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    if parts.empty or "_s" not in parts.columns \
            or int(parts["_n"].sum()) == 0:
        # SQL: sum over zero matching rows is NULL, not 0.0
        return pd.DataFrame({"revenue": pd.Series([float("nan")])})
    return pd.DataFrame({"revenue":
                         pd.Series([round(float(parts["_s"].sum()), 2)])})


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    nation: str = "NATION_5", p_type: str = "ECONOMY"):
    """TPC-H Q8 shape (ORACLED): one nation's market share of a
    region's imports by order year — the deepest join tree in the
    suite (part, supplier, lineitem, orders, customer, nation×2,
    region) with a per-group conditional RATIO. Dimension sides reduce
    before any corpus join: the type-filtered part keys prune the
    lineitem stream per batch as a broadcast MEMBERSHIP set (no join —
    only existence matters); supplier attaches s_nationkey through the
    size-chosen join; orders are date-pruned per batch and meet the
    region-pruned customer keys FIRST (the q7 ordering: the lineitem
    stream's right side is the ~region-share slice of orders carrying
    o_year only). One combiner groupby emits per-(year, supp-nation)
    partials; the driver evaluates numerator/denominator per year —
    a ratio of large sums rounded at 4 dp, far inside float drift."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1996, 12, 31)
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    nat_r = nat.merge(reg, left_on="n_regionkey",
                      right_on="r_regionkey")
    in_region = sorted(
        int(k) for k in nat_r[nat_r["r_name"] == region]["n_nationkey"])
    target = nat[nat["n_name"] == nation]["n_nationkey"]
    empty = pd.DataFrame({"o_year": pd.Series([], dtype="int64"),
                          "mkt_share": pd.Series([], dtype="float64")})
    if not in_region:
        return empty
    target_key = int(target.iloc[0]) if len(target) else None

    part_keys = _distinct_filtered_keys(
        sf_dir, "part", "p_partkey",
        lambda b: b.filter(pc.equal(b["p_type"], p_type)),
        columns=["p_partkey", "p_type"]).to_pandas()
    if part_keys.empty or "p_partkey" not in part_keys.columns:
        return empty

    def vol_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "volume": pc.multiply(b["l_extendedprice"],
                                  pc.subtract(pa.scalar(1.0),
                                              b["l_discount"]))})

    li = _broadcast_key_filter(
        _read(sf_dir, "lineitem",
              columns=["l_orderkey", "l_partkey", "l_suppkey",
                       "l_extendedprice", "l_discount"]),
        "l_partkey", part_keys["p_partkey"].to_numpy()).map_batches(
        vol_proj, batch_format="pyarrow", zero_copy_batch=True)
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"])

    def ord_prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
            pc.less_equal(b["o_orderdate"], pa.scalar(hi))))
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey",
                            "o_orderdate"]).map_batches(
        ord_prune, batch_format="pyarrow", zero_copy_batch=True)
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pa.table({"c_custkey": b.filter(pc.is_in(
            b["c_nationkey"],
            value_set=pa.array(in_region, type=pa.int64())))
            ["c_custkey"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    try:
        ls = equi_join(li, supp, on="l_suppkey", right_on="s_suppkey") \
            .select_columns(["l_orderkey", "volume", "s_nationkey"])
        oc = equi_join(orders, cust, on="o_custkey",
                       right_on="c_custkey") \
            .select_columns(["o_orderkey", "o_year"])
        full = equi_join(ls, oc, on="l_orderkey", right_on="o_orderkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return empty
        raise
    agg = grouped_agg(full, ["o_year", "s_nationkey"],
                      {"volume": "vol"}, count_alias="_n").to_pandas()
    if agg.empty or "o_year" not in agg.columns:
        return empty
    # SQL inner-joins nation n2: a supplier whose nationkey is absent
    # from the nation table contributes to NEITHER sum. The membership
    # check runs on the per-(year, nation) aggregate — exact, since
    # membership is a property of s_nationkey alone.
    agg = agg[agg["s_nationkey"].isin(
        set(int(k) for k in nat["n_nationkey"]))]
    if agg.empty:
        return empty
    den = agg.groupby("o_year")["vol"].sum()
    num = agg[agg["s_nationkey"] == target_key] \
        .groupby("o_year")["vol"].sum() if target_key is not None \
        else den * 0.0
    share = (num.reindex(den.index, fill_value=0.0) / den).round(4)
    return pd.DataFrame({"o_year": den.index.astype("int64"),
                         "mkt_share": share.to_numpy()}) \
        .sort_values("o_year").reset_index(drop=True)


def q16_supplier_count(sf_dir: str):
    """TPC-H Q16 shape (ORACLED): per-(brand, type) count of DISTINCT
    suppliers shipping small parts, excluding a supplier blocklist —
    SQL's count(DISTINCT …) with a NOT IN subquery. The blocklist
    (negative-balance suppliers) is per-batch distinct before it ships
    into the ANTI join (s_suppkey is non-null, so NOT IN ≡ anti join);
    part prunes by size and attaches (brand, type) through the
    size-chosen join; the DISTINCT is the first combiner groupby's key
    set (brand, type, suppkey — aggregate-shaped, corpus never
    gathers) and the count is a second groupby over that aggregate."""
    from ..joins import equi_join
    # SQL makes a NULL l_suppkey row invisible TWICE over: NOT IN with
    # a non-empty list evaluates NULL to UNKNOWN (row excluded), and
    # count(DISTINCT l_suppkey) ignores NULLs — while the anti join
    # would KEEP a null probe key and the groupby would count the
    # (brand, type, NULL) group. Drop nulls up front so every
    # downstream step agrees with the oracle.
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey"]).map_batches(
        lambda b: b.filter(pc.is_valid(b["l_suppkey"])),
        batch_format="pyarrow", zero_copy_batch=True)
    bad = _distinct_filtered_keys(
        sf_dir, "supplier", "s_suppkey",
        lambda b: b.filter(pc.less(b["s_acctbal"], pa.scalar(0.0))),
        columns=["s_suppkey", "s_acctbal"])
    ok = equi_join(li, bad, on="l_suppkey", right_on="s_suppkey",
                   how="anti")
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand", "p_size",
                          "p_type"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["p_size"], pa.scalar(1)),
            pc.less_equal(b["p_size"], pa.scalar(15))))
        .select(["p_partkey", "p_brand", "p_type"]),
        batch_format="pyarrow", zero_copy_batch=True)
    empty = pd.DataFrame({
        "p_brand": pd.Series([], dtype="object"),
        "p_type": pd.Series([], dtype="object"),
        "supplier_cnt": pd.Series([], dtype="int64")})
    try:
        j = equi_join(ok, part, on="l_partkey", right_on="p_partkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return empty
        raise
    # the distinct key set is high-cardinality (brands × types ×
    # suppliers): hash-partition dedup, then the tiny count groupby
    distinct = grouped_agg_hash(j, ["p_brand", "p_type", "l_suppkey"],
                                {}, count_alias="_n")
    out = grouped_agg(distinct, ["p_brand", "p_type"], {},
                      count_alias="supplier_cnt").to_pandas()
    if out.empty or "p_brand" not in out.columns:
        return empty
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    return out[["p_brand", "p_type", "supplier_cnt"]] \
        .sort_values(["supplier_cnt", "p_brand", "p_type"],
                     ascending=[False, True, True]) \
        .reset_index(drop=True)


def q21_lone_returner(sf_dir: str):
    """TPC-H Q21 shape (ORACLED): suppliers who were the ONLY supplier
    with a returned item on a multi-supplier finalized order — the
    double CORRELATED quantifier (EXISTS another supplier ∧ NOT EXISTS
    another returning supplier) at lineitem grain. Everything
    per-order — the pair counts, the (n_suppliers, n_returning) stats
    and the quantifier filter — runs inside ONE order-hash partition
    pass: per-batch Arrow combines bound the shuffle at one row per
    (order, supplier, batch), the partition fn evaluates both
    quantifiers vectorized, and only the qualifying (order, supplier,
    r_cnt) rows leave it. Finalized orders prune via the
    per-batch-distinct semi join; names attach to the bounded
    per-supplier counts."""
    from ..joins import equi_join
    from ..util import partitioned_group_apply
    def li_proj(b: pa.Table) -> pa.Table:
        # a NULL l_suppkey line is invisible to the WHOLE oracle: the
        # supplier join never matches it as l1, and l2/l3's
        # `l_suppkey <> l1.l_suppkey` evaluates NULL to UNKNOWN — so
        # it must count in NEITHER quantifier (the q16 rule)
        b = b.filter(pc.is_valid(b["l_suppkey"]))
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            # a NULL returnflag is not a return ('= R' is UNKNOWN) but
            # the line still counts as another supplier for EXISTS
            "_r": pc.fill_null(pc.cast(pc.equal(b["l_returnflag"], "R"),
                                       pa.int64()), 0)})

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey",
                        "l_returnflag"]).map_batches(
        li_proj, batch_format="pyarrow", zero_copy_batch=True)
    partials = li.map_batches(
        lambda b: b.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("_r", "sum")]).rename_columns(
            ["l_orderkey", "l_suppkey", "_r"]),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)

    def quantifiers(t: pa.Table) -> pa.Table:
        pairs = t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("_r", "sum")]).rename_columns(
            ["l_orderkey", "l_suppkey", "r_cnt"])
        ret = pc.cast(pc.greater(pairs["r_cnt"], pa.scalar(0)),
                      pa.int64())
        stats = pairs.append_column("_hr", ret) \
            .group_by(["l_orderkey"]).aggregate(
            [([], "count_all"), ("_hr", "sum")]).rename_columns(
            ["l_orderkey", "n_supp", "n_ret"])
        ok = stats.filter(pc.and_(
            pc.greater_equal(stats["n_supp"], pa.scalar(2)),
            pc.equal(stats["n_ret"], pa.scalar(1))))["l_orderkey"]
        out = pairs.filter(pc.and_(
            pc.greater(pairs["r_cnt"], pa.scalar(0)),
            pc.is_in(pairs["l_orderkey"],
                     value_set=_combine_col(ok))))
        return out

    qual = partitioned_group_apply(partials, ["l_orderkey"],
                                   quantifiers, batch_format="pyarrow")
    empty = pd.DataFrame({"s_name": pd.Series([], dtype="object"),
                          "numwait": pd.Series([], dtype="int64")})
    try:
        final_orders = _distinct_filtered_keys(
            sf_dir, "orders", "o_orderkey",
            lambda b: b.filter(pc.equal(b["o_orderstatus"], "F")),
            columns=["o_orderkey", "o_orderstatus"])
        qual = equi_join(qual, final_orders, on="l_orderkey",
                         right_on="o_orderkey", how="semi")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return empty
        raise
    # SQL counts one row per qualifying l1 LINEITEM, not per pair — a
    # supplier with three returned items on the order contributes 3
    counts = grouped_agg(qual, ["l_suppkey"], {"r_cnt": "numwait"},
                         count_alias="_c")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    named = equi_join(supp, counts.select_columns(
        ["l_suppkey", "numwait"]), on="s_suppkey",
                      right_on="l_suppkey",
                      right_schema=pa.schema([
                          pa.field("l_suppkey", pa.int64()),
                          pa.field("numwait", pa.int64())])).to_pandas()
    if named.empty or "s_name" not in named.columns:
        return empty
    # SQL groups by NAME: distinct suppliers sharing a name merge here
    out = named.groupby("s_name", as_index=False)["numwait"].sum()
    out["numwait"] = out["numwait"].astype("int64")
    return out.sort_values(["numwait", "s_name"],
                           ascending=[False, True]) \
        .reset_index(drop=True)


def cheapest_supplier_per_part(sf_dir: str):
    """TPC-H Q2 essence (ORACLED): the ARGMIN-per-group join — for
    every part ever sold, the supplier offering its MINIMUM sale price
    (ties broken by supplier key, SQL row_number semantics). Per-batch
    Arrow group_by("min") partials reduce to the (part, supplier) pair
    aggregate under Ray's Min — min is order-free and EXACT on 2-dp
    doubles, so the cross-engine compare carries no float-sum drift;
    the argmin runs inside ONE coarse part-hash partition of the pair
    aggregate (parts never split, only pair rows ride the shuffle);
    names attach to the one-row-per-part winner set."""
    from ..joins import equi_join
    from ..util import partitioned_group_apply
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        agg = b.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("l_extendedprice", "min")])
        return agg.rename_columns(["l_partkey", "l_suppkey", "_pmin"])

    partials = li.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def pick(t: pa.Table) -> pa.Table:
        # pair-min AND per-part argmin inside ONE part-hash partition:
        # the pair lives wholly in its part's partition, so a single
        # shuffle of the per-batch min partials answers both levels.
        # ALL-ARROW: a pandas roundtrip would coerce a null-bearing
        # int64 suppkey to float64 (join-type crash, and silent id
        # corruption past 2^53). A NULL suppkey is a real SQL GROUP
        # that competes in the ranking (ORDER BY l_suppkey NULLS LAST)
        # — it can win a part and SHADOW a real supplier; the oracle's
        # inner join then drops that part, so the null winner is
        # filtered AFTER the argmin, never before.
        pairs = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("_pmin", "min")]).rename_columns(
            ["l_partkey", "l_suppkey", "best_price"]).sort_by(
            [("l_partkey", "ascending"), ("best_price", "ascending"),
             ("l_suppkey", "ascending")])
        pk = pairs["l_partkey"].to_numpy(zero_copy_only=False)
        first = np.ones(len(pk), dtype=bool)
        first[1:] = pk[1:] != pk[:-1]
        win = pairs.filter(pa.array(first))
        return win.filter(pc.is_valid(win["l_suppkey"]))

    winners = partitioned_group_apply(partials, ["l_partkey"], pick,
                                      batch_format="pyarrow")
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = equi_join(supp, winners, on="s_suppkey",
                    right_on="l_suppkey",
                    right_schema=pa.schema([
                        pa.field("l_partkey", pa.int64()),
                        pa.field("l_suppkey", pa.int64()),
                        pa.field("best_price", pa.float64())])) \
        .to_pandas()
    if out.empty or "l_partkey" not in out.columns:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "best_price": pd.Series([], dtype="float64")})
    out = out.rename(columns={"l_partkey": "p_partkey"})
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["p_partkey", "s_suppkey", "s_name", "best_price"]] \
        .sort_values("p_partkey").reset_index(drop=True)


def events_cube(sf_dir: str):
    """GROUPING SETS / CUBE (ORACLED): event counts for all four
    grouping sets of (event_type, day-of-week) with explicit
    ``grouping()`` marker columns — the markers are what let a REAL
    null group key (null event_type is a real SQL group here) stay
    distinct from the rolled-up level that also answers NULL. One
    combiner groupby over the finest set is the only corpus-sized
    pass; the three coarser levels derive from the ≤ types×7 fine
    aggregate on the driver (counts are additive, the derivation is
    exact). The dow column answers the DuckDB pandas convention:
    float64 with NaN on rolled rows (nullable BIGINT → float64)."""
    def proj(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b["ts"]))
        return pa.table({
            "event_type": f["event_type"],
            "dow": pc.cast(pc.day_of_week(
                f["ts"], count_from_zero=True, week_start=7),
                pa.int64())})

    ds = _read(sf_dir, "events",
               columns=["event_type", "ts"]).map_batches(
        proj, batch_format="pyarrow", zero_copy_batch=True)
    fine = grouped_agg(ds, ["event_type", "dow"], {},
                       count_alias="n").to_pandas()
    cols = ["g_type", "g_dow", "event_type", "dow", "n"]
    if fine.empty or "event_type" not in fine.columns:
        # SQL CUBE always emits the empty grouping set: even a zero-row
        # input answers the grand-total row (count 0), not zero rows
        return pd.DataFrame([{"g_type": 1, "g_dow": 1,
                              "event_type": None,
                              "dow": float("nan"), "n": 0}])[cols]
    fine["n"] = fine["n"].astype("int64")
    fine["dow"] = fine["dow"].astype("float64")
    lvl00 = fine.assign(g_type=0, g_dow=0)
    by_type = fine.groupby("event_type", dropna=False,
                           as_index=False)["n"].sum() \
        .assign(g_type=0, g_dow=1, dow=float("nan"))
    by_dow = fine.groupby("dow", as_index=False)["n"].sum() \
        .assign(g_type=1, g_dow=0, event_type=None)
    total = pd.DataFrame([{"g_type": 1, "g_dow": 1, "event_type": None,
                           "dow": float("nan"),
                           "n": int(fine["n"].sum())}])
    out = pd.concat([lvl00[cols], by_type[cols], by_dow[cols],
                     total[cols]], ignore_index=True)
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["g_type", "g_dow", "event_type", "dow"],
                           na_position="last").reset_index(drop=True)


def nation_customer_names(sf_dir: str):
    """Grouped ORDER-SENSITIVE string aggregation (ORACLED vs DuckDB
    string_agg(name, ',' ORDER BY name)): the one aggregate whose merge
    is only associative under a global per-group ORDER, so it cannot
    partial-combine per batch — each group's rows meet ONCE inside a
    key-hash partition (groups never split), sort there, and join.
    NULL names are skipped like SQL; a group with only NULL names
    answers NULL, not ''. Inherent contract (same as SQL engines): one
    group's concatenated payload must fit its partition's worker."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_name"])

    # groups with only-NULL names must survive with names=NULL: carry
    # the full key set per partition and left-join the joined strings
    def join_names(df: pd.DataFrame) -> pd.DataFrame:
        keys = df[["c_nationkey"]].drop_duplicates()
        ok = df[df["c_name"].notna()].sort_values(
            ["c_nationkey", "c_name"], kind="mergesort")
        agg = ok.groupby("c_nationkey", dropna=False)["c_name"] \
            .agg(",".join).reset_index().rename(
            columns={"c_name": "names"})
        out = keys.merge(agg, on="c_nationkey", how="left")
        return out

    out = partitioned_group_apply(ds, ["c_nationkey"],
                                  join_names).to_pandas()
    if out.empty or "c_nationkey" not in out.columns:
        return pd.DataFrame({
            "c_nationkey": pd.Series([], dtype="int64"),
            "names": pd.Series([], dtype="object")})
    # DuckDB pandas convention: a NULL group key makes the int column
    # float64+NaN; all-concrete keys stay int64 (the curate rule)
    out["c_nationkey"] = out["c_nationkey"].astype(
        "int64" if out["c_nationkey"].notna().all() else "float64")
    return out[["c_nationkey", "names"]] \
        .sort_values("c_nationkey", na_position="last") \
        .reset_index(drop=True)


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 (ORACLED): the canonical scalar filter-aggregate — one
    projected streaming pass, per-batch conditional partial sums, no
    shuffle at all (the degenerate-but-common shape a 100 TB scan
    reduces to when the answer is one number). Discount bounds compare
    the same IEEE doubles both engines parsed from the same parquet
    and the same literals, so the row set is bit-identical; the 2-dp
    rounding of a sum of products holds the usual margin."""
    import datetime as dt
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))), pc.and_(
            pc.and_(pc.greater_equal(b["l_discount"],
                                     pa.scalar(0.05)),
                    pc.less_equal(b["l_discount"], pa.scalar(0.07))),
            pc.less(b["l_quantity"], pa.scalar(24.0))))
        f = b.filter(m)
        s = pc.sum(pc.multiply(f["l_extendedprice"],
                               f["l_discount"])).as_py()
        return pa.table({"_s": pa.array([0.0 if s is None else
                                         float(s)]),
                         "_n": pa.array([len(f)], type=pa.int64())})

    parts = _read(sf_dir, "lineitem",
                  columns=["l_shipdate", "l_discount", "l_quantity",
                           "l_extendedprice"]).map_batches(
        partial, batch_format="pyarrow",
        zero_copy_batch=True).to_pandas()
    if parts.empty or int(parts["_n"].sum()) == 0:
        # SQL: sum over zero matching rows is NULL
        return pd.DataFrame({"revenue": pd.Series([float("nan")])})
    return pd.DataFrame({"revenue":
                         pd.Series([round(float(parts["_s"].sum()), 2)])})


def q12_shipmode_priority(sf_dir: str):
    """TPC-H Q12 shape (ORACLED): conditional aggregation OVER A JOIN
    — per lineitem status, how many joined orders carry urgent/high
    priority vs the rest, for a one-year ship window (l_linestatus
    stands in for the schema's missing l_shipmode). The lineitem side
    prunes per batch to (orderkey, status); the priority flag is
    computed per batch AFTER the size-chosen join; only per-(status)
    conditional partials shuffle — the join stream never groups."""
    import datetime as dt

    from ..joins import equi_join
    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linestatus",
                        "l_shipdate"]).map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        .select(["l_orderkey", "l_linestatus"]),
        batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    empty = pd.DataFrame({
        "l_linestatus": pd.Series([], dtype="object"),
        "high_line_count": pd.Series([], dtype="int64"),
        "low_line_count": pd.Series([], dtype="int64")})
    try:
        j = equi_join(li, orders, on="l_orderkey",
                      right_on="o_orderkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return empty
        raise

    def partial(b: pa.Table) -> pa.Table:
        hi_p = pc.cast(pc.or_(
            pc.equal(b["o_orderpriority"], "1-URGENT"),
            pc.equal(b["o_orderpriority"], "2-HIGH")), pa.int64())
        t = pa.table({"l_linestatus": b["l_linestatus"],
                      "_h": pc.fill_null(hi_p, 0),
                      "_l": pc.fill_null(pc.subtract(pa.scalar(1),
                                                     hi_p), 0)})
        agg = t.group_by(["l_linestatus"]).aggregate(
            [("_h", "sum"), ("_l", "sum")])
        return agg.rename_columns(["l_linestatus", "_h", "_l"])

    parts = j.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=131072)
    out = grouped_agg(parts, ["l_linestatus"],
                      {"_h": "high_line_count",
                       "_l": "low_line_count"},
                      count_alias="_c").to_pandas()
    if out.empty or "l_linestatus" not in out.columns:
        return empty
    out["high_line_count"] = out["high_line_count"].astype("int64")
    out["low_line_count"] = out["low_line_count"].astype("int64")
    return out[["l_linestatus", "high_line_count", "low_line_count"]] \
        .sort_values("l_linestatus").reset_index(drop=True)


def source_quota_documents(sf_dir: str, quota: int = 3):
    """Per-source QUOTA sampling (ORACLED): keep at most ``quota``
    documents per source, best-first (longest, ties by id) — the
    domain-cap pass every web-curation pipeline runs so no single
    domain dominates the training mix. Rank-per-group distributes in
    two levels: each batch pre-prunes to its own per-source top-quota
    (the global top-quota of a source is a subset of the union of
    per-batch top-quotas — the _partial_topk argument, per group), so
    at most quota rows per (source, batch) ride the ONE source-hash
    shuffle; the partition pass ranks vectorized (cumcount) and cuts.
    A NULL source is a real SQL group (fixed-sentinel co-location)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            na_position="last", kind="mergesort")
        keep = df.groupby("source", dropna=False).cumcount() < quota
        return df[keep]

    def pick_tbl(t: pa.Table) -> pa.Table:
        # rank in pandas on NULLABLE Int64 — the plain roundtrip turns
        # null-bearing int64 payloads into float64, rounding ids past
        # 2^53 (the partitioned_group_apply docstring's pyarrow rule)
        return pa.Table.from_pandas(
            pick(t.to_pandas(types_mapper=_nullable_int64)),
            preserve_index=False)

    pruned = ds.map_batches(pick_tbl, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    out = partitioned_group_apply(pruned, ["source"], pick_tbl,
                                  batch_format="pyarrow").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64")})
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype(
        "int64" if out["n_chars"].notna().all() else "float64")
    return out[["doc_id", "source", "n_chars"]].sort_values("doc_id") \
        .reset_index(drop=True)


def ann_hard_negatives_embeddings(sf_dir: str):
    """Hard-negative mining (ORACLED): for each of the 5 query vectors,
    the exact cosine top-10 among vectors of a DIFFERENT label — the
    contrastive-training retrieval pass (positives share the query's
    label and must not surface). Same per-batch partial top-k + driver
    merge as ann_topk; the label mask applies vectorized inside the
    batch scorer, so the filter costs no extra scan and the corpus
    never gathers."""
    import duckdb

    from ..ann import hard_negative_topk
    q = duckdb.sql(
        f"""SELECT vec_id, embedding, label
            FROM read_parquet('{sf_dir}/embeddings.parquet')
            ORDER BY vec_id LIMIT 5""").df()
    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])
    out = hard_negative_topk(ds, q["embedding"].tolist(),
                             q["label"].tolist(),
                             query_ids=q["vec_id"].to_numpy(), k=10)
    out["score"] = out["score"].round(6)
    return out


def winsorize_events_by_type(sf_dir: str, lo_q: float = 0.05,
                             hi_q: float = 0.95):
    """Grouped WINSORIZATION (ORACLED): clip events.value to the
    per-event-type [p05, p95] band computed EXACTLY by the distributed
    per-group value histogram (quantile_disc semantics, same machinery
    as grouped_quantiles) — the robust-statistics normalization a
    feature pipeline runs before scaling so per-group tails can't
    dominate. Two passes: the bounds pass reads only (type, value) and
    shuffles one row per (type, value, batch); the clip pass is an
    embarrassingly-parallel broadcast-bounds map (the bounds table is
    group-cardinality-sized — ship it via ray.put when types are many;
    at 5 types it rides the closure). Like outlier_events_iqr, the
    exact-histogram bounds suit bounded-distinct columns; the 100-TB
    continuous-column path is the t-digest machinery (approximate
    bounds, same clip pass).

    SQL semantics pinned: a NULL event_type is a REAL group with its
    own bounds (IS NOT DISTINCT FROM join); a NULL value stays NULL
    (CASE returns NULL before touching the bounds); a group whose
    values are all NULL has no bounds row and only NULL values, so the
    LEFT JOIN's null bounds are unobservable. NaN values are excluded
    from bounds AND pass through unclipped (np.where on NaN compares
    false) — the repo's psi/drift convention, diverging from DuckDB's
    NaN-above-everything total order; validation rules, not the
    winsorizer, own NaN screening."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    # (type, value) groups are near row-cardinality on a continuous
    # column — the grouped_agg_hash case, not the sort aggregate
    hist = grouped_agg_hash(ds, ["event_type", "value"], {},
                            count_alias="n").to_pandas()
    # drops SQL NULLs and NaN value keys alike: the float64 histogram
    # column carries both as NaN, and pandas dropna removes them
    hist = hist.dropna(subset=["value"])
    bounds = {}
    for k, g in hist.groupby("event_type", dropna=False):
        g = g.sort_values("value")
        cum = g["n"].cumsum().to_numpy()
        total = int(cum[-1])
        vals = g["value"].to_numpy()
        lo = vals[np.searchsorted(cum, max(int(np.ceil(lo_q * total)), 1))]
        hi = vals[np.searchsorted(cum, max(int(np.ceil(hi_q * total)), 1))]
        bounds[None if pd.isna(k) else k] = (float(lo), float(hi))

    full = _read(sf_dir, "events",
                 columns=["event_id", "event_type", "value"])

    def clip(df: pd.DataFrame) -> pd.DataFrame:
        key = df["event_type"].where(df["event_type"].notna(), None)
        lo = key.map({k: v[0] for k, v in bounds.items()}).to_numpy(
            dtype="float64")
        hi = key.map({k: v[1] for k, v in bounds.items()}).to_numpy(
            dtype="float64")
        v = df["value"].to_numpy(dtype="float64")
        w = np.where(v < lo, lo, np.where(v > hi, hi, v))
        return pd.DataFrame({"event_id": df["event_id"],
                             "event_type": df["event_type"],
                             "value_w": w})

    out = full.map_batches(clip, batch_format="pandas",
                           batch_size=131072).to_pandas()
    if out.empty or "event_id" not in out.columns:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype="int64"),
            "event_type": pd.Series([], dtype="object"),
            "value_w": pd.Series([], dtype="float64")})
    return out.sort_values("event_id").reset_index(drop=True)


def upsample_documents(sf_dir: str, weights: dict = None,
                       default: int = 1):
    """Training-mix UPSAMPLING (ORACLED): repeat each document
    ``weights[source]`` times (default 1) with a 1-based copy index —
    the per-source epoch-weighting pass that turns a curation mix
    ("wikipedia ×3, books ×2, web ×1") into a physical training
    stream. Embarrassingly parallel: one vectorized np.repeat per
    batch, NO shuffle, no driver state; the weight table rides the
    closure (ray.put it when the source vocabulary is large). A NULL
    source takes the default weight (SQL CASE ELSE)."""
    if weights is None:
        weights = {"src0": 3, "src1": 2}
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def rep(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pandas()
        r = src.map(weights).fillna(default).astype("int64").to_numpy()
        r = np.maximum(r, 0)
        idx = np.repeat(np.arange(len(src), dtype=np.int64), r)
        starts = np.cumsum(r) - r  # exclusive prefix sum, empty-safe
        copy = np.arange(int(r.sum()), dtype=np.int64) \
            - np.repeat(starts, r) + 1
        t = b.take(pa.array(idx))
        return t.append_column("copy", pa.array(copy, pa.int64()))

    out = ds.map_batches(rep, batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=131072).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "source": pd.Series([], dtype="object"),
            "copy": pd.Series([], dtype="int64")})
    return out.sort_values(["doc_id", "copy"]).reset_index(drop=True)


def fuzzy_name_pairs_customers(sf_dir: str, max_dist: int = 2):
    """Blocked FUZZY-MATCH record linkage (ORACLED): within each
    (nation, market-segment) block, every customer-name pair at
    Levenshtein distance ≤ 2 with id_a < id_b — the entity-resolution
    pass that finds near-identical records exact dedup misses and
    token-set near-dup is too coarse for. One block-key hash shuffle
    of the narrow (block, id, name) projection; all-pairs generation
    only within a block (the blocking contract — see
    text/fuzzy.blocked_fuzzy_pairs). The oracle is the plain SQL
    self-join with DuckDB's levenshtein; names are ASCII so the
    byte-vs-code-point divergence is moot here."""
    from ..text import blocked_fuzzy_pairs
    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_nationkey",
                        "c_mktsegment"])
    out = blocked_fuzzy_pairs(
        ds, ["c_nationkey", "c_mktsegment"], "c_name", "c_custkey",
        max_dist=max_dist).to_pandas()
    if out.empty or "id_a" not in out.columns:
        return pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64")})
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def regr_value_hour_by_type(sf_dir: str):
    """Grouped OLS REGRESSION (ORACLED): per-event-type least-squares
    fit of value on hour(ts) — slope = cov(value, hour)/var(hour),
    intercept = mean(value) − slope·mean(hour) — the trend-per-segment
    screen a drift monitor runs next to the correlation. Reuses the
    SAME one-scan grouped moment pass as value_hour_corr_by_type
    (_value_hour_moments: one row per (group, batch) shuffles); the
    driver evaluates the closed form per group. SQL population
    semantics: a zero-variance or single-pair group answers NULL
    exactly like DuckDB's regr_slope/regr_intercept (0/0); null pairs
    are skipped; NaN/inf excluded per the psi/drift convention."""
    agg = _value_hour_moments(sf_dir)
    if agg is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "slope": pd.Series([], dtype="float64"),
                             "intercept": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    n = agg["pn"].to_numpy()
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    syy, sxy = agg["syy"].to_numpy(), agg["sxy"].to_numpy()
    with np.errstate(invalid="ignore", divide="ignore"):
        # x = hour (the helper's y-moments), y = value
        vx = syy - sy * sy / n
        slope = (sxy - sx * sy / n) / vx
        intercept = sx / n - slope * sy / n
    ok = (n >= 1) & (vx > 0)
    slope = np.where(ok, slope, np.nan)
    intercept = np.where(ok, intercept, np.nan)
    return pd.DataFrame({
        "event_type": agg["event_type"].to_numpy(),
        "slope": np.round(slope, 6),
        "intercept": np.round(intercept, 6),
        "n": n.astype(np.int64)}).reset_index(drop=True)


def weighted_sample_documents(sf_dir: str, k: int = 50):
    """Deterministic WEIGHTED sampling without replacement (ORACLED):
    Efraimidis-Spirakis A-Res — every doc draws key = u^(1/w) with
    weight w = n_chars and u a deterministic uniform in (0, 1) from
    pure integer arithmetic on doc_id (so SQL reproduces it bit-for-
    bit), and the k largest keys win. This is THE distributed
    weighted-reservoir primitive: the key needs only the row itself,
    so selection is a per-block partial top-k + driver merge
    (_partial_topk) — k rows per block gather, nothing shuffles, and
    at 10^12 rows the same two-level merge holds per partition.
    Rows with NULL/negative doc_id or NULL/non-positive n_chars are
    excluded on both sides (u and 1/w undefined; negative ids also hit
    the SQL-vs-numpy modulo sign divergence). The raw float key ranks;
    the reported skey rounds to 6 dp AFTER selection."""
    MOD, MULT, M32 = 1000003, 2654435761, 4294967296
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "source", "n_chars"])

    def score(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(b.column("doc_id").is_valid(),
                    pc.greater_equal(b.column("doc_id"), 0)),
            pc.and_(b.column("n_chars").is_valid(),
                    pc.greater(b.column("n_chars"), 0)))
        t = b.filter(pc.fill_null(keep, False))
        d = t.column("doc_id").to_numpy(zero_copy_only=False)
        w = t.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        u = ((d % MOD) * MULT % M32 + 1) / float(M32 + 1)
        key = np.power(u, 1.0 / w)
        return t.append_column("skey", pa.array(key, pa.float64()))

    scored = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    out = _partial_topk(scored, ["skey", "doc_id"], [False, True], k)
    if out is None:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "source": pd.Series([], dtype="object"),
            "n_chars": pd.Series([], dtype="int64"),
            "skey": pd.Series([], dtype="float64")})
    out["skey"] = out["skey"].round(6)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out[["doc_id", "source", "n_chars", "skey"]] \
        .reset_index(drop=True)


def candles_events(sf_dir: str):
    """Time-series OHLC CANDLES (ORACLED): per (event_type, day) the
    open (value of the first row by (ts, event_id)), high, low, close
    (last row), and count — the order-statistic-by-time aggregate a
    metrics pipeline runs over every stream; none of min/max/sum
    machinery covers first/last, whose merge needs the ARGUMENT of an
    extremum, not the extremum itself. Two phases: each batch reduces
    to one candidate row per (type, day, batch) — open/close carry
    their (ts, event_id) coordinates so the merge can re-argmin — then
    ONE (type, day)-hash partition merges candidates vectorized
    (sort + group head/tail). Only groups×batches candidate rows ride
    the shuffle; the corpus never re-sorts globally. Rows with a NULL
    ts or NULL value are invisible (SQL: the window excludes them via
    WHERE); a NULL event_type is a real group. Ties on ts break by
    event_id on both engines (mergesort / row_number)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_type", "ts", "event_id", "value"])

    def reduce_candles(df: pd.DataFrame) -> pd.DataFrame:
        # one candidate row per (type, day) of THIS frame; works for
        # both the per-batch pass (raw rows: open=close=value) and the
        # merge pass (candidate rows with distinct open/close)
        df = df.sort_values(["event_type", "day", "ts", "event_id"],
                            kind="mergesort")
        g = df.groupby(["event_type", "day"], dropna=False, sort=False)
        first = df.iloc[g.cumcount().to_numpy() == 0]
        last = df.iloc[(g.cumcount(ascending=False)).to_numpy() == 0]
        agg = g.agg(high=("high", "max"), low=("low", "min"),
                    n=("n", "sum")).reset_index()
        out = agg.merge(
            first[["event_type", "day", "ts", "event_id", "open"]],
            on=["event_type", "day"], how="left")
        lastc = last[["event_type", "day", "ts", "event_id", "close"]] \
            .rename(columns={"ts": "ts_z", "event_id": "id_z"})
        return out.merge(lastc, on=["event_type", "day"], how="left")[
            ["event_type", "day", "ts", "event_id", "open",
             "ts_z", "id_z", "close", "high", "low", "n"]]

    # the candidate schema is PINNED: an all-null-type batch would
    # otherwise emit a float64 NaN event_type column (pandas groupby
    # key) and the per-block schemas diverge (the repo's pin-types-at-
    # batch-sources trap)
    cand_schema = pa.schema([
        ("event_type", pa.string()), ("day", pa.string()),
        ("ts", pa.timestamp("us")), ("event_id", pa.int64()),
        ("open", pa.float64()), ("ts_z", pa.timestamp("us")),
        ("id_z", pa.int64()), ("close", pa.float64()),
        ("high", pa.float64()), ("low", pa.float64()),
        ("n", pa.int64())])

    # the NULL group rides as a sentinel STRING through every pandas
    # sort/groupby/merge (an all-None key column materializes as
    # float64 NaN on reset_index and merges stop typing; NaN-vs-None
    # merge matching is version lore this avoids entirely), restored
    # to a real null at each stage's Arrow boundary
    _NULLS = "\x00\x00<null-type>"

    def _renull(s: pd.Series) -> list:
        return [None if x == _NULLS else x for x in s]

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(b.column("ts").is_valid(),
                       b.column("value").is_valid())
        t = b.filter(keep)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas()
            .fillna(_NULLS),
            "day": pc.strftime(t.column("ts"),
                               format="%Y-%m-%d").to_pandas(),
            "ts": t.column("ts").to_pandas(),
            "event_id": t.column("event_id").to_pandas(),
        })
        v = t.column("value").to_numpy(zero_copy_only=False)
        df["open"] = v
        df["close"] = v
        df["high"] = v
        df["low"] = v
        df["n"] = np.ones(len(df), dtype=np.int64)
        # per-batch candidates: the merge needs (ts, id) of open/close
        red = reduce_candles(df)
        red["event_type"] = _renull(red["event_type"])
        return pa.Table.from_pandas(red, schema=cand_schema,
                                    preserve_index=False)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("day", pa.string()),
        ("open", pa.float64()), ("high", pa.float64()),
        ("low", pa.float64()), ("close", pa.float64()),
        ("n", pa.int64())])

    def merge(t: pa.Table) -> pa.Table:
        # a candidate's close coordinates live in (ts_z, id_z): the
        # merge re-argmins on open coords and re-argmaxes on close
        df = t.to_pandas()
        df["event_type"] = df["event_type"].fillna(_NULLS)
        opens = reduce_candles(df)
        closes = df.sort_values(["event_type", "day", "ts_z", "id_z"],
                                kind="mergesort")
        gz = closes.groupby(["event_type", "day"], dropna=False,
                            sort=False)
        lastz = closes.iloc[
            gz.cumcount(ascending=False).to_numpy() == 0]
        res = opens.drop(columns=["ts_z", "id_z", "close"]).merge(
            lastz[["event_type", "day", "ts_z", "id_z", "close"]],
            on=["event_type", "day"], how="left")
        res = res[["event_type", "day", "open", "high", "low",
                   "close", "n"]]
        res["event_type"] = _renull(res["event_type"])
        return pa.Table.from_pandas(res, schema=out_schema,
                                    preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)
    out = partitioned_group_apply(parts, ["event_type", "day"],
                                  merge,
                                  batch_format="pyarrow").to_pandas()
    cols = ["event_type", "day", "open", "high", "low", "close", "n"]
    if out.empty or "day" not in out.columns:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "day": pd.Series([], dtype="object"),
            "open": pd.Series([], dtype="float64"),
            "high": pd.Series([], dtype="float64"),
            "low": pd.Series([], dtype="float64"),
            "close": pd.Series([], dtype="float64"),
            "n": pd.Series([], dtype="int64")})
    for c in ("open", "high", "low", "close"):
        out[c] = out[c].round(6)
    out["n"] = out["n"].astype("int64")
    return out[cols].sort_values(["event_type", "day"]) \
        .reset_index(drop=True)


def novelty_documents(sf_dir: str):
    """Per-document NOVELTY / memorization-risk score (ORACLED):
    1 − (shared word-8-grams / total distinct word-8-grams), where a
    gram is shared when ≥ 2 distinct documents contain it — the
    admit/reject aggregate of the dup_passages signal. One gram-hash
    partition computes per-gram doc counts AND the per-(doc,
    partition) total/shared partials in the same pass; a doc-keyed
    combiner sum and a size-chosen LEFT equi-join attach scores to the
    id stream (gramless/null-text docs answer NULL). The gram STRING
    shuffles here so DuckDB can reproduce it; novelty_scores
    (hash_only=True) is the 8 B/gram 100-TB path."""
    from ..text import novelty_scores
    out = novelty_scores(
        _read(sf_dir, "documents", columns=["doc_id", "text"])) \
        .to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "novelty": pd.Series([], dtype="float64")})
    out["doc_id"] = out["doc_id"].astype(
        "int64" if out["doc_id"].notna().all() else "float64")
    return out.sort_values("doc_id").reset_index(drop=True)


def cooccur_event_types(sf_dir: str):
    """Market-basket CO-OCCURRENCE (ORACLED): for every unordered pair
    of event types, the number of distinct users who performed BOTH —
    the association signal behind recommendation/affinity mining. The
    SQL self-join never materializes: each batch first dedups to its
    distinct (user, type) pairs (dedup-before-ship), ONE user-hash
    partition then re-dedups and pair-expands WITHIN each user
    (≤ C(types, 2) rows per user — bounded by the type vocabulary, not
    the corpus) and pre-counts pairs, so only (type_a, type_b, n)
    partials reach the final tiny groupby. Null users and null types
    are invisible (a NULL never survives the self-join's equality or
    the < tie-break)."""
    out = _user_type_pair_partials(sf_dir, with_totals=False) \
        .rename(columns={"cnt": "n_users"})
    if out.empty or "type_a" not in out.columns:
        return pd.DataFrame({
            "type_a": pd.Series([], dtype="object"),
            "type_b": pd.Series([], dtype="object"),
            "n_users": pd.Series([], dtype="int64")})
    out["n_users"] = out["n_users"].astype("int64")
    return out[["type_a", "type_b", "n_users"]] \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)


def _hist_quantile_cont(vals: np.ndarray, counts: np.ndarray,
                        q: float = 0.5) -> float:
    """Interpolated (quantile_cont / DuckDB median) quantile from a
    SORTED distinct-value histogram. The k-th order statistic (0-based)
    of the expanded multiset is ``vals[searchsorted(cumsum, k+1)]``;
    the continuous quantile interpolates between the two straddling
    order statistics exactly as DuckDB's median()/mad() do."""
    cum = np.cumsum(counts)
    n = int(cum[-1])
    k = q * (n - 1)
    lo = vals[np.searchsorted(cum, int(np.floor(k)) + 1)]
    hi = vals[np.searchsorted(cum, int(np.ceil(k)) + 1)]
    return float(lo + (hi - lo) * (k - np.floor(k)))


def robust_stats_events(sf_dir: str):
    """Per-group ROBUST + SHAPE statistics (ORACLED): median, MAD
    (median absolute deviation), sample skewness and sample excess
    kurtosis of ``value`` for every event_type — the screening profile
    a feature-quality pass computes before deciding on clipping /
    transforms. ONE distributed pass: the per-group distinct-value
    histogram (grouped_agg_hash — the winsorize machinery; one row per
    (type, value, batch) shuffles) is a sufficient statistic for ALL
    four outputs. The driver computes the interpolated median from
    cumulative counts, folds the histogram around it for the MAD
    (|v - med| re-grouped, counts summed — exact because the fold is a
    many-to-one map of distinct values), and evaluates the
    adjusted-Fisher-Pearson skewness G1 = g1·sqrt(n(n-1))/(n-2) and the
    sample excess kurtosis G2 = ((n+1)·g2 + 6)(n-1)/((n-2)(n-3)) from
    count-weighted raw power sums (reconstruction error ~1e-14,
    measured — safe under the 6dp contract). Like winsorize /
    outlier_iqr, the exact histogram suits bounded-distinct columns;
    the continuous-column 100-TB path is the t-digest machinery.

    SQL semantics pinned: NULL event_type is a real group; NULL values
    are invisible (an all-NULL group answers n=0 and all-NULL stats);
    skewness answers NULL below n=3 OR at zero variance, kurtosis below
    n=4 OR at zero variance — DuckDB's 0/0 rule, verified empirically.
    NaN values are excluded (psi/drift convention; DuckDB would instead
    sort NaN above everything — validation rules own NaN screening).
    Numerics: moments are computed CENTERED (v - mean before powers) —
    shift-stable where DuckDB's own streaming raw-moment skewness/
    kurtosis collapses at large |mean|/sigma (measured: 1e8-offset
    unit-variance values answer 0.0/-6.25 in DuckDB v1.0.0 vs the
    shift-invariant truth 0.943266/-0.055813 — a documented divergence
    in OUR favor, pinned; the oracle holds at testdata magnitudes)."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    hist = grouped_agg_hash(ds, ["event_type", "value"],
                            {}, count_alias="n").to_pandas()
    if hist.empty or "event_type" not in hist.columns:
        hist = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "value": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    # every group key that appeared at all (value-NULL rows included)
    all_keys = hist["event_type"].drop_duplicates().tolist()
    # the float64 histogram key carries SQL NULL and NaN identically;
    # dropna excludes both (psi/drift convention)
    hv = hist.dropna(subset=["value"])
    rows = []
    stats = {}
    for k, g in hv.groupby("event_type", dropna=False):
        g = g.sort_values("value")
        v = g["value"].to_numpy(dtype=np.float64)
        c = g["n"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        med = _hist_quantile_cont(v, c)
        fold = pd.Series(c, index=np.abs(v - med)).groupby(level=0).sum()
        mad = _hist_quantile_cont(fold.index.to_numpy(),
                                  fold.to_numpy())
        cf = c.astype(np.float64)
        m = float(cf @ v) / n
        # center BEFORE taking powers: raw power sums cancel
        # catastrophically for large-mean/low-variance groups (s2 ~
        # 1e19 vs m2 ~ 1e2 at 1e8-magnitude values); the histogram
        # holds both v and the exact mean, so the stable form is free
        d = v - m
        m2 = float(cf @ (d * d))
        m3 = float(cf @ (d ** 3))
        m4 = float(cf @ (d ** 4))
        skew = kurt = np.nan
        if n >= 3 and m2 > 0:
            g1 = (m3 / n) / (m2 / n) ** 1.5
            skew = g1 * np.sqrt(n * (n - 1.0)) / (n - 2.0)
        if n >= 4 and m2 > 0:
            g2 = (m4 / n) / (m2 / n) ** 2 - 3.0
            kurt = ((n + 1.0) * g2 + 6.0) * (n - 1.0) / ((n - 2.0)
                                                         * (n - 3.0))
        stats[None if pd.isna(k) else k] = (n, med, mad, skew, kurt)
    for k in all_keys:
        kk = None if pd.isna(k) else k
        n, med, mad, skew, kurt = stats.get(kk,
                                            (0, np.nan, np.nan,
                                             np.nan, np.nan))
        rows.append((kk, n, med, mad, skew, kurt))
    out = pd.DataFrame(rows, columns=["event_type", "n", "med", "mad",
                                      "skew", "kurt"])
    out["n"] = out["n"].astype("int64")
    for c in ("med", "mad", "skew", "kurt"):
        out[c] = np.round(out[c].astype("float64"), 6)
    return out.sort_values("event_type", na_position="last") \
        .reset_index(drop=True)


def user_entropy_events(sf_dir: str):
    """Per-user behavioral ENTROPY (ORACLED): the Shannon entropy
    (base 2, DuckDB entropy() semantics) of each user's event-type
    distribution plus the contributing event count — the
    diversity/bot-screening signal of a behavioral pipeline. Plan:
    grouped_agg_hash pre-counts (user, type) pairs per batch (one row
    per (pair, batch) shuffles — the pair-aggregate case), then ONE
    user-hash partition evaluates -Σ p·log2 p vectorized per partition;
    only (user, h, n) rows reach the driver. The partition pass is the
    PYARROW path (null-bearing int64 user ids — the pandas roundtrip
    float64-rounds ids past 2^53).

    SQL semantics pinned: NULL user_id is a real GROUP BY group; NULL
    event_type VALUES are invisible to entropy() (aggregates skip
    NULL), and a user with only NULL types answers h=0.0, n=0 —
    DuckDB's entropy() of an empty multiset, verified empirically. The
    driver-facing user_id column follows the DuckDB pandas dtype rule
    (float64+NaN when a NULL user exists, int64 otherwise)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    pairs = grouped_agg_hash(ds, ["user_id", "event_type"],
                             {}, count_alias="c")

    def ent(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_nullable_int64)
        valid = df[df["event_type"].notna()]
        gsum = valid.groupby("user_id", dropna=False, sort=False)["c"] \
            .transform("sum")
        p = valid["c"].to_numpy(dtype=np.float64) \
            / gsum.to_numpy(dtype=np.float64)
        terms = pd.DataFrame({"user_id": valid["user_id"],
                              "t": -(p * np.log2(p)),
                              "c": valid["c"]})
        agg = terms.groupby("user_id", dropna=False) \
            .agg(h=("t", "sum"), n=("c", "sum")).reset_index()
        allu = df[["user_id"]].drop_duplicates()
        # pandas merge MATCHES NA keys — load-bearing here: the NULL
        # user is a real SQL group on both sides
        out = allu.merge(agg, on="user_id", how="left")
        out["h"] = out["h"].astype("float64").fillna(0.0)
        out["n"] = out["n"].astype("float64").fillna(0.0) \
            .astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    out = partitioned_group_apply(pairs, ["user_id"], ent,
                                  batch_format="pyarrow").to_pandas()
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "h": pd.Series([], dtype="float64"),
                             "n": pd.Series([], dtype="int64")})
    # DuckDB pandas dtype rule for the nullable BIGINT group key
    out["user_id"] = out["user_id"].astype(
        "float64" if out["user_id"].isna().any() else "int64")
    out["h"] = np.round(out["h"].astype("float64"), 6)
    out["n"] = out["n"].astype("int64")
    return out[["user_id", "h", "n"]] \
        .sort_values("user_id", na_position="last") \
        .reset_index(drop=True)


def transitions_event_types(sf_dir: str):
    """Markov TRANSITION counts (ORACLED): how often event_type A is
    immediately followed by B within one user's timeline ordered by
    (ts, event_id) — the sequence-model statistic (bigram over sessions)
    behind next-action prediction. The SQL lag() window never sorts the
    corpus globally: rows pruned per batch to non-null (user, ts, type),
    ONE user-hash partition sorts its own rows and shifts within user
    (vectorized groupby.shift), and only per-partition (prev, next, n)
    partials — bounded by the type-vocabulary square, not the corpus —
    reach the final tiny groupby.

    SQL semantics pinned: NULL-type events are removed from the
    timeline BEFORE pairing (so A, NULL, B yields the A→B transition —
    the only self-consistent reading: SQL lag over the null-filtered
    view), null user/ts rows are invisible, and each user's first event
    has no predecessor (prev IS NULL filtered on both sides)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)

    # output schema PINNED at the Arrow boundary: a partition whose
    # users all have single events returns an empty frame whose object
    # columns Arrow would infer as null type — block schemas diverge
    # (the candles rule)
    _trans_schema = pa.schema([("prev_type", pa.string()),
                               ("next_type", pa.string()),
                               ("_n", pa.int64())])

    def trans(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        m = prev.notna().to_numpy()
        agg = pd.DataFrame({"prev_type": prev.to_numpy()[m],
                            "next_type": df["event_type"]
                            .to_numpy()[m]}) \
            .groupby(["prev_type", "next_type"]).size() \
            .reset_index(name="_n")
        return pa.Table.from_pandas(agg, schema=_trans_schema,
                                    preserve_index=False)

    partials = partitioned_group_apply(pruned, ["user_id"], trans,
                                       batch_format="pyarrow")
    out = grouped_agg(partials, ["prev_type", "next_type"],
                      {"_n": "n"}, count_alias="_c").to_pandas()
    if out.empty or "prev_type" not in out.columns:
        return pd.DataFrame({
            "prev_type": pd.Series([], dtype="object"),
            "next_type": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out[["prev_type", "next_type", "n"]] \
        .sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _user_type_pair_partials(sf_dir: str, with_totals: bool):
    """Shared distinct-(user, type) machinery for the co-occurrence
    family: per-batch distinct prune (dedup-before-ship), ONE user-hash
    partition that re-dedups, pair-expands within each user (bounded by
    the type vocabulary) and pre-counts — returning the aggregated
    (type_a, type_b, cnt) DataFrame. With ``with_totals`` the SAME
    partition pass also emits per-type distinct-user partials as rows
    with type_b NULL (exact: each user lives wholly in one partition),
    so Jaccard needs no second corpus scan. Null users and null types
    are invisible (SQL self-join equality)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def distinct_pairs(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("event_type").is_valid()))
        return t.group_by(["user_id", "event_type"]).aggregate([])

    pruned = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)

    # the partition pass is the PYARROW path with a PINNED output
    # schema: a partition whose totals rows are its only output would
    # otherwise emit an all-None type_b that Arrow infers as null type
    # and block schemas diverge (the candles rule)
    _pair_schema = pa.schema([("type_a", pa.string()),
                              ("type_b", pa.string()),
                              ("_n", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.drop_duplicates(["user_id", "event_type"])
        m = df.merge(df, on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        agg = m.groupby(["event_type_x", "event_type_y"]) \
            .size().reset_index(name="_n")
        agg = agg.rename(columns={"event_type_x": "type_a",
                                  "event_type_y": "type_b"})
        if with_totals:
            tot = df.groupby("event_type").size().reset_index(name="_n")
            tot = tot.rename(columns={"event_type": "type_a"})
            tot["type_b"] = None
            agg = pd.concat([agg, tot[["type_a", "type_b", "_n"]]],
                            ignore_index=True)
        return pa.Table.from_pandas(agg, schema=_pair_schema,
                                    preserve_index=False)

    partials = partitioned_group_apply(pruned, ["user_id"], expand,
                                       batch_format="pyarrow")
    return grouped_agg(partials, ["type_a", "type_b"],
                       {"_n": "cnt"}, count_alias="_c").to_pandas()


def jaccard_event_types(sf_dir: str):
    """Type-pair JACCARD similarity (ORACLED): for every unordered pair
    of event types, |users(A) ∩ users(B)| / |users(A) ∪ users(B)| plus
    the raw intersection count — co-occurrence normalized by reach, the
    actual affinity metric recommendation screens rank on. ONE corpus
    scan: the shared cooccur partition pass emits pair intersections
    AND per-type distinct-user totals together (totals ride as
    type_b-NULL marker rows through the same tiny groupby), and the
    driver evaluates inter / (nA + nB - inter) over at most
    C(|vocabulary|, 2) rows. Pairs with an empty intersection are
    absent (SQL inner-join shape, like cooccur); null users/types are
    invisible."""
    empty = pd.DataFrame({
        "type_a": pd.Series([], dtype="object"),
        "type_b": pd.Series([], dtype="object"),
        "n_both": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64")})
    agg = _user_type_pair_partials(sf_dir, with_totals=True)
    if agg.empty or "type_a" not in agg.columns:
        return empty
    totals = agg[agg["type_b"].isna()].set_index("type_a")["cnt"]
    inter = agg[agg["type_b"].notna()].copy()
    if inter.empty:
        return empty
    na = inter["type_a"].map(totals).to_numpy(dtype=np.float64)
    nb = inter["type_b"].map(totals).to_numpy(dtype=np.float64)
    nn = inter["cnt"].to_numpy(dtype=np.float64)
    inter["jaccard"] = np.round(nn / (na + nb - nn), 6)
    inter["n_both"] = inter["cnt"].astype("int64")
    return inter[["type_a", "type_b", "n_both", "jaccard"]] \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True)


def prefix_dup_documents(sf_dir: str, prefix_len: int = 40):
    """Shared-opening BOILERPLATE groups (ORACLED): documents whose
    first ``prefix_len`` code points coincide with at least one other
    document — the template/mirror screen a web-curation pass runs
    before near-dup (identical openings betray boilerplate cheaply,
    without shingling). Exact-dedup shape on the PREFIX key: pass 1
    aggregates per-prefix counts (grouped_agg_hash — per-batch combine,
    one prefix-hash partition; the 40-char key bounds shuffle width),
    keeps only colliding groups (count > 1 — at web scale a tiny
    fraction), and pass 2 re-projects (doc_id, prefix) and attaches the
    group size through the size-chosen equi_join (broadcast while the
    dup-group table is small, partitioned shuffle above the cap). The
    narrow prefix projection is re-executed rather than materialized —
    read+slice is cheap, pinning a corpus-sized intermediate is not
    (the index-writer rule applies to expensive passes only).

    Arrow's utf8_slice_codeunits slices CODE POINTS, verified equal to
    DuckDB substr on non-ASCII (é, surrogate-pair range). Null-text
    docs are invisible; shorter docs key on their full text exactly as
    SQL substr does."""
    from ..joins import equi_join
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prefixes(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        return pa.table({
            "doc_id": t.column("doc_id"),
            "prefix": pc.utf8_slice_codeunits(t.column("text"),
                                              0, prefix_len)})

    pref = ds.map_batches(prefixes, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=131072)
    counts = grouped_agg_hash(pref.select_columns(["prefix"]),
                              ["prefix"], {}, count_alias="n")
    dups = counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)),
        batch_format="pyarrow", zero_copy_batch=True)
    joined = equi_join(
        pref, dups, on="prefix", how="inner",
        right_schema=pa.schema([("prefix", pa.string()),
                                ("n", pa.int64())]))
    out = joined.to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    return out[["doc_id", "n"]].sort_values("doc_id",
                                            na_position="last") \
        .reset_index(drop=True)


def events_next_order(sf_dir: str):
    """FORWARD as-of join (ORACLED): each event picks up the EARLIEST
    order date of the same customer at-or-after the event time — the
    lead-time / time-to-next-purchase shape (the mirror of
    events_last_order's backward match), exercising asof_join's
    direction="forward" scan: same one co-partition shuffle, the
    vectorized merge runs a reverse min-scan bounded by the group end
    instead of the backward max-scan. Null user/ts events answer NULL
    (a null key matches nothing, SQL scalar-subquery semantics)."""
    from ..joins import asof_join
    events = _read(sf_dir, "events",
                   columns=["event_id", "ts", "user_id"])
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate"])
    j = asof_join(events, orders, by="user_id", on="ts",
                  right_by="o_custkey", right_on="o_orderdate",
                  value_cols=["o_orderdate"], direction="forward")

    def out(b: pa.Table) -> pa.Table:
        return pa.table({"event_id": b["event_id"],
                         "next_orderdate": b["o_orderdate"]})

    return j.map_batches(out, batch_format="pyarrow",
                         zero_copy_batch=True)


def top_terms_by_lang(sf_dir: str, k: int = 10):
    """Per-language vocabulary head (ORACLED): the k most frequent
    whitespace tokens per lang with their ranks — the
    stopword/vocabulary screen a multilingual curation pass runs per
    language, and the grouped-top-k-on-aggregate shape (rank AFTER a
    full aggregation, where per-batch top-k pre-pruning would be WRONG
    because a token's count is spread across batches). Each batch
    pre-counts its own (lang, token) pairs (vocabulary-sized partials,
    term_frequency's tokenizer contract: split on single space, empty
    tokens dropped), grouped_agg_hash finishes the counts, and ONE
    lang-hash partition ranks vectorized (count desc, token asc —
    row_number semantics) and cuts to k. NULL lang is a real group;
    null-text docs are invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def explode(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        lang = t.column("lang").combine_chunks().take(
            pa.array(np.repeat(np.arange(len(t), dtype=np.int64),
                               lens)))
        keep = pc.not_equal(flat, "")
        pairs = pa.table({"lang": lang.filter(keep),
                          "token": flat.filter(keep)})
        agg = pairs.group_by(["lang", "token"]).aggregate([
            ([], "count_all")])
        return agg.rename_columns(["lang", "token", "_n"])

    partials = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    counts = grouped_agg_hash(partials, ["lang", "token"],
                              {"_n": "n"}, count_alias="_c")

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "n", "token"],
                            ascending=[True, False, True],
                            na_position="last", kind="mergesort")
        rk = df.groupby("lang", dropna=False, sort=False).cumcount() + 1
        df = df.assign(rk=rk.astype("int64"))
        return df[df["rk"] <= k]

    out = partitioned_group_apply(counts, ["lang"], rank).to_pandas()
    if out.empty or "lang" not in out.columns:
        return pd.DataFrame({"lang": pd.Series([], dtype="object"),
                             "token": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "rk": pd.Series([], dtype="int64")})
    out["n"] = out["n"].astype("int64")
    out["rk"] = out["rk"].astype("int64")
    return out[["lang", "token", "n", "rk"]] \
        .sort_values(["lang", "rk"], na_position="last") \
        .reset_index(drop=True)


def _dense_daily_counts(sf_dir: str):
    """Shared dense-grid builder (daily_counts_ma / autocorr): per-type
    daily counts on the GLOBAL corpus min..max day grid, zero-filled,
    sorted (event_type, day) — None when the corpus has no (type, ts)
    rows. The corpus scan distributes (one (type, day) partial per
    batch); the calendar×vocabulary-bounded densify runs driver-side
    (the candles/dow-pivot convention)."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("event_type").is_valid()))
        return pa.table({
            "event_type": t.column("event_type"),
            "day": pc.strftime(t.column("ts"), "%Y-%m-%d")})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["event_type", "day"], {}, count_alias="n").to_pandas()
    if agg.empty or "event_type" not in agg.columns:
        return None
    days = pd.date_range(agg["day"].min(), agg["day"].max(),
                         freq="D").strftime("%Y-%m-%d")
    types = sorted(agg["event_type"].unique())
    grid = pd.MultiIndex.from_product([types, days],
                                      names=["event_type", "day"])
    f = agg.set_index(["event_type", "day"]).reindex(
        grid, fill_value=0).reset_index()
    f = f.sort_values(["event_type", "day"]).reset_index(drop=True)
    f["n"] = f["n"].astype("int64")
    return f


def autocorr_daily_events(sf_dir: str, lag: int = 1):
    """Lag-k autocorrelation of the daily count series per event type
    (ORACLED) — the seasonality/periodicity statistic a monitoring or
    curriculum pipeline reads off ingestion volumes. Pearson r between
    (c_d, c_{d+lag}) over the SAME dense zero-filled grid as
    daily_counts_ma (gaps must count as 0 or the lag pairing is
    wrong). Every moment sum is an EXACT small integer in int64
    (counts × calendar days), so both engines compute the same
    mathematical r and the 6dp round is order-free; a zero-variance
    side (constant series) answers SQL-NULL, as does a single-day
    grid (no pairs → type row ABSENT, like the GROUP BY over the
    empty lead() set)."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_pairs": pd.Series([], dtype="int64"),
        "r": pd.Series([], dtype="float64")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        n_arr = g["n"].to_numpy()
        x, y = n_arr[:-lag], n_arr[lag:]
        m = len(x)
        if m == 0:
            continue
        sx, sy = int(x.sum()), int(y.sum())
        sxx = int((x * x).sum())
        syy = int((y * y).sum())
        sxy = int((x * y).sum())
        vx = m * sxx - sx * sx
        vy = m * syy - sy * sy
        num = m * sxy - sx * sy
        # duckdb_round, NOT Python round: round(5e-07, 6) is 0.0 in
        # Python (exact-decimal ties-to-even) but 1e-06 in DuckDB
        r = (float(duckdb_round(num / math.sqrt(vx * vy), 6))
             if vx > 0 and vy > 0 and m >= 2 else None)
        rows.append({"event_type": t, "n_pairs": m, "r": r})
    if not rows:
        return out_empty
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["r"] = out["r"].astype("float64")
    return out


def daily_counts_ma_events(sf_dir: str):
    """Gap-filled daily series + trailing moving average (ORACLED):
    per-type daily event counts on the DENSE day grid (every day
    between the corpus min and max day appears for every observed type,
    zero-filled) with the 7-day trailing mean — the
    seasonality/monitoring series shape, where the moving average is
    only correct over a gap-free calendar. The corpus scan distributes
    (grouped_agg per-batch partials on (type, day); one row per group
    per batch shuffles); the densify + rolling window runs driver-side
    over the aggregate (days × types rows — bounded by calendar and
    vocabulary, the candles/dow-pivot convention). Null-ts and
    null-type rows are excluded; a type absent on early days still
    answers the full grid (SQL cross-join grid semantics). The mean of
    integer counts is exact in float64; ma7 rounds at 6dp."""
    f = _dense_daily_counts(sf_dir)
    if f is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "day": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "ma7": pd.Series([], dtype="float64")})
    f["ma7"] = np.round(
        f.groupby("event_type", sort=False)["n"]
        .transform(lambda s: s.rolling(7, min_periods=1).mean())
        .astype("float64"), 6)
    return f[["event_type", "day", "n", "ma7"]]


def median_gap_by_user(sf_dir: str):
    """Per-user inter-event CADENCE (ORACLED): the interpolated median
    gap (microseconds, as SQL median over BIGINT date_diff) between a
    user's consecutive events ordered by (ts, event_id), plus the gap
    count — the periodicity/bot-cadence screen. ONE user-hash partition
    (sessionization machinery, PYARROW path for null-bearing int64
    ids): sort, diff within user, pandas interpolated median per user —
    all inside the partition, so only (user, med, n) rows reach the
    driver.

    SQL semantics pinned: null-ts events leave the timeline (lag can't
    order them) but the USER still answers (a user with only null-ts
    rows yields zero gaps); single-event users answer (NULL, 0); the
    NULL user is one real lag partition/group; equal timestamps break
    by event_id. A µs gap is exact int64; the interpolated median of
    ints is exact in float64 (k or k.5)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def gaps(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_nullable_int64)
        df = df.sort_values(["user_id", "ts", "event_id"],
                            na_position="last")
        have_ts = df["ts"].notna()
        dv = df[have_ts]
        prev = dv.groupby("user_id", dropna=False, sort=False)["ts"] \
            .shift(1)
        # exact µs: timedelta/Timedelta(1µs) divides the raw integer —
        # total_seconds()*1e6 would round-trip through /1e6*1e6 floats
        g = (dv["ts"] - prev) / pd.Timedelta(microseconds=1)
        stats = pd.DataFrame({"user_id": dv["user_id"], "g": g}) \
            .groupby("user_id", dropna=False) \
            .agg(med_gap_us=("g", "median"), n_gaps=("g", "count")) \
            .reset_index()
        allu = df[["user_id"]].drop_duplicates()
        out = allu.merge(stats, on="user_id", how="left")
        out["med_gap_us"] = out["med_gap_us"].astype("float64")
        out["n_gaps"] = out["n_gaps"].astype("float64").fillna(0.0) \
            .astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    out = partitioned_group_apply(ds, ["user_id"], gaps,
                                  batch_format="pyarrow").to_pandas()
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                             "med_gap_us": pd.Series([],
                                                     dtype="float64"),
                             "n_gaps": pd.Series([], dtype="int64")})
    out["user_id"] = out["user_id"].astype(
        "float64" if out["user_id"].isna().any() else "int64")
    out["n_gaps"] = out["n_gaps"].astype("int64")
    return out[["user_id", "med_gap_us", "n_gaps"]] \
        .sort_values("user_id", na_position="last") \
        .reset_index(drop=True)


def dedup_rate_by_source(sf_dir: str):
    """Per-source DUPLICATION rate (ORACLED): docs, distinct texts and
    1 - distinct/docs for every source — the per-domain contamination
    profile a curation pass reads before setting dedup thresholds.
    Texts never ship: each batch groups (source, hash64(text)) with
    counts — null-text rows ride as a null-hash row so an all-null
    source still answers its SQL GROUP BY row — grouped_agg_hash
    finishes the per-(source, hash) totals (distinct-text-cardinality-
    sized), and a tiny source groupby over THAT aggregate yields
    n_docs = Σ counts and n_distinct = #hashes. 64-bit hashing stands
    in for text equality (collision odds ~n²/2⁶⁵ — the exact-dedup
    convention, collision-free at every test SF).

    SQL semantics pinned: NULL source is a real group; null texts are
    invisible to both counts; an all-null-text source answers
    (0, 0, NULL) — the CASE-guarded 0/0."""
    from ..sketches.hashing import hash64_array
    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        h = hash64_array(b.column("text").combine_chunks())
        ht = pa.array(h.astype("int64"), type=pa.int64(),
                      mask=~np.asarray(b.column("text").is_valid()))
        t = pa.table({"source": b.column("source"), "h": ht})
        agg = t.group_by(["source", "h"]).aggregate([([], "count_all")])
        return agg.rename_columns(["source", "h", "_n"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    per_hash = grouped_agg_hash(partials, ["source", "h"],
                                {"_n": "n"}, count_alias="_c")

    def reduce_src(b: pa.Table) -> pa.Table:
        live = pc.is_valid(b.column("h"))
        t = pa.table({
            "source": b.column("source"),
            "pn": pc.if_else(live, b.column("n"),
                             pa.scalar(0, pa.int64())),
            "pd": pc.cast(live, pa.int64())})
        agg = t.group_by(["source"]).aggregate(
            [("pn", "sum"), ("pd", "sum")])
        return agg.rename_columns(["source", "pn", "pd"])

    agg = grouped_agg(
        per_hash.map_batches(reduce_src, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["source"], {"pn": "n_docs", "pd": "n_distinct"},
        count_alias="_c").to_pandas()
    if agg.empty or "source" not in agg.columns:
        return pd.DataFrame({
            "source": pd.Series([], dtype="object"),
            "n_docs": pd.Series([], dtype="int64"),
            "n_distinct": pd.Series([], dtype="int64"),
            "dup_rate": pd.Series([], dtype="float64")})
    nd = agg["n_docs"].to_numpy(dtype=np.float64)
    nu = agg["n_distinct"].to_numpy(dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        rate = np.where(nd > 0, np.round(1.0 - nu / nd, 6), np.nan)
    out = pd.DataFrame({
        "source": agg["source"],
        "n_docs": agg["n_docs"].astype("int64"),
        "n_distinct": agg["n_distinct"].astype("int64"),
        "dup_rate": rate})
    return out.sort_values("source", na_position="last") \
        .reset_index(drop=True)


def pareto_sources(sf_dir: str):
    """Source concentration PARETO curve (ORACLED): per-source total
    characters ordered largest-first with the cumulative corpus share —
    the 'what fraction of the corpus do the top domains own' read that
    decides quota caps. The corpus scan is one grouped_agg (per-batch
    sum partials per source); the ordered cumulative runs driver-side
    over the source-cardinality-bounded aggregate (the candles/pareto
    convention: windows over aggregates are driver math).

    SQL semantics pinned: NULL source is a real group; an all-null-
    n_chars source answers NULL chars, sorts LAST under DESC (DuckDB
    default NULLS LAST) and leaves the running share unchanged (window
    sum skips NULL); integer cumulation is exact, the share divides
    once at the end."""
    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    # consume the aggregate as ARROW: a pandas roundtrip would float64
    # the null-bearing int64 sums and round char totals past 2^53,
    # while SQL's window cumulation is exact BIGINT
    batches = list(grouped_agg(ds, ["source"], {"n_chars": "chars"},
                               count_alias="_c")
                   .iter_batches(batch_format="pyarrow"))
    if not batches:
        return pd.DataFrame({"source": pd.Series([], dtype="object"),
                             "chars": pd.Series([], dtype="float64"),
                             "cum_share": pd.Series([],
                                                    dtype="float64")})
    agg = pa.concat_tables(batches, promote_options="permissive") \
        .to_pandas(types_mapper=_nullable_int64)
    agg = agg.sort_values(["chars", "source"],
                          ascending=[False, True],
                          na_position="last", kind="mergesort") \
        .reset_index(drop=True)
    filled = agg["chars"].fillna(0).to_numpy(dtype=np.int64)
    total = int(filled.sum())
    cum = np.cumsum(filled)
    # driver-facing chars column follows the DuckDB pandas dtype rule
    chars_out = agg["chars"].astype(
        "float64" if agg["chars"].isna().any() else "int64")
    out = pd.DataFrame({
        "source": agg["source"],
        "chars": chars_out,
        "cum_share": np.round(cum / float(total), 6) if total > 0
        else np.full(len(agg), np.nan)})
    return out


def latest_event_per_user(sf_dir: str):
    """CDC LOG COMPACTION (ORACLED): the single most-recent event row
    per user — ORDER BY ts DESC NULLS LAST, event_id DESC, row 1 — the
    upsert/compaction primitive every changelog consumer runs to
    materialize current state. Argmax distributes in two levels: each
    batch keeps ITS OWN latest row per user (a valid partial — the
    global argmax is the argmax of batch argmaxes), so at most one row
    per (user, batch) rides the ONE user-hash shuffle; the partition
    pass re-argmaxes vectorized (sort + tail(1)). PYARROW path
    throughout (null-bearing int64 ids, the 2^53 rule).

    SQL semantics pinned: NULL user is a real window partition; null-ts
    rows lose to any timed row (NULLS LAST under DESC) but win — by
    highest event_id — when the user has only null-ts rows; equal
    timestamps break by event_id DESC; the full row (type, value)
    rides with the winner."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type",
                        "value"])

    def pick(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_nullable_int64)
        # ascending with nulls FIRST mirrors DESC NULLS LAST at tail(1)
        df = df.sort_values(["user_id", "ts", "event_id"],
                            na_position="first", kind="mergesort")
        win = df.groupby("user_id", dropna=False, sort=False).tail(1)
        return pa.Table.from_pandas(win, preserve_index=False,
                                    schema=t.schema)

    partials = ds.map_batches(pick, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    out = partitioned_group_apply(partials, ["user_id"], pick,
                                  batch_format="pyarrow").to_pandas()
    if out.empty or "user_id" not in out.columns:
        return pd.DataFrame({
            "user_id": pd.Series([], dtype="int64"),
            "event_id": pd.Series([], dtype="int64"),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "event_type": pd.Series([], dtype="object"),
            "value": pd.Series([], dtype="float64")})
    for c in ("user_id", "event_id"):
        out[c] = out[c].astype(
            "float64" if out[c].isna().any() else "int64")
    return out[["user_id", "event_id", "ts", "event_type", "value"]] \
        .sort_values("user_id", na_position="last") \
        .reset_index(drop=True)


def ttr_documents(sf_dir: str):
    """Type-token ratio (ORACLED): distinct-token share per document —
    the lexical-diversity quality signal (low TTR betrays repetitive or
    templated text). SQL GROUP BY doc_id semantics exactly: rows
    sharing a doc_id (and the NULL-id group) MERGE their token
    multisets, so the plan is the dedup_rate shape keyed by doc — each
    batch pre-groups (doc_id, hash64(token)) with counts (term_frequency
    tokenizer contract: single space, empty tokens dropped),
    grouped_agg_hash finishes the per-(doc, hash) totals, and a tiny
    per-doc reduce over THAT aggregate yields n_tok = Σ counts and
    n_uniq = #hashes. 64-bit token hashing stands in for string
    equality (the exact-dedup convention). Docs with no tokens (null
    text, empty, all-space) are absent — the SQL inner-group shape."""
    from ..sketches.hashing import hash64_array
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        idx = idx[keep]
        flat = flat.filter(pa.array(keep))
        th = hash64_array(flat).astype("int64")
        # doc_id via Arrow take — null-bearing int64 ids never float
        ids = t.column("doc_id").combine_chunks().take(
            pa.array(idx, pa.int64()))
        agg = pa.table({"doc_id": ids, "th": pa.array(th)}) \
            .group_by(["doc_id", "th"]).aggregate([([], "count_all")])
        return agg.rename_columns(["doc_id", "th", "_n"])

    partials = ds.map_batches(pairs, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    per_hash = grouped_agg_hash(partials, ["doc_id", "th"],
                                {"_n": "n"}, count_alias="_c")

    def reduce_doc(b: pa.Table) -> pa.Table:
        t = pa.table({"doc_id": b.column("doc_id"),
                      "pn": b.column("n"),
                      "pu": pa.array(np.ones(b.num_rows, np.int64))})
        agg = t.group_by(["doc_id"]).aggregate(
            [("pn", "sum"), ("pu", "sum")])
        return agg.rename_columns(["doc_id", "pn", "pu"])

    batches = list(grouped_agg(
        per_hash.map_batches(reduce_doc, batch_format="pyarrow",
                             zero_copy_batch=True),
        ["doc_id"], {"pn": "n_tok", "pu": "n_uniq"},
        count_alias="_c").iter_batches(batch_format="pyarrow"))
    if not batches:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "n_tok": pd.Series([], dtype="int64"),
                             "n_uniq": pd.Series([], dtype="int64"),
                             "ttr": pd.Series([], dtype="float64")})
    out = pa.concat_tables(batches, promote_options="permissive") \
        .to_pandas(types_mapper=_nullable_int64)
    nt = out["n_tok"].to_numpy(dtype=np.float64)
    nu = out["n_uniq"].to_numpy(dtype=np.float64)
    res = pd.DataFrame({
        "doc_id": out["doc_id"].astype(
            "float64" if out["doc_id"].isna().any() else "int64"),
        "n_tok": out["n_tok"].astype("int64"),
        "n_uniq": out["n_uniq"].astype("int64"),
        "ttr": np.round(nu / nt, 6)})
    return res.sort_values("doc_id", na_position="last") \
        .reset_index(drop=True)


def split_leakage_documents(sf_dir: str, val_pct: int = 10,
                            test_pct: int = 10):
    """Train/eval LEAKAGE audit (ORACLED): per split, how many docs
    share their EXACT text with a different train document — the
    contamination check every eval pipeline runs before trusting its
    val/test numbers (for the train split itself the same count reads
    as intra-train duplication). Identity is SQL's: a doc is leaked iff
    a train doc with IS DISTINCT FROM id carries equal text, so two
    NULL-id docs are the SAME identity (NOT DISTINCT) and don't leak
    each other, while a NULL-id train doc leaks any real-id twin. Texts
    never ship: ONE text-hash partition receives only (hash, doc_id) —
    the split re-derives from the id inside the partition (assign_split
    is stateless) — counts train rows per (hash) and per (hash, id)
    (pandas merge matching NA keys IS the IS-NOT-DISTINCT semantics,
    load-bearing as in funnel), flags leaked = train_total −
    same-identity-train > 0 vectorized, and only (split, n_docs,
    n_leaked) partials reach the final 3-row groupby. Null-text docs
    are invisible (equality never holds in SQL)."""
    from ..sketches.hashing import hash64_array
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        h = hash64_array(t.column("text").combine_chunks()) \
            .astype("int64")
        return pa.table({"h": pa.array(h), "doc_id": t.column("doc_id")})

    pruned = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)

    _out_schema = pa.schema([("split", pa.string()),
                             ("pn", pa.int64()), ("pl", pa.int64())])

    def audit(t: pa.Table) -> pa.Table:
        df = t.to_pandas(types_mapper=_nullable_int64)
        # split derivation on EXACT ints (a float64 detour would round
        # ids past 2^53 into the wrong bucket); NULL id -> 'train'
        # exactly like SQL's CASE on NULL % 100
        isna = df["doc_id"].isna().to_numpy()
        iv = df["doc_id"].fillna(0).astype("int64").to_numpy()
        bucket = _sql_mod(iv, 100)
        split = np.where(isna, "train",
                         np.where(bucket < val_pct, "val",
                                  np.where(bucket < val_pct + test_pct,
                                           "test", "train")))
        df = df.assign(split=split,
                       _tr=(split == "train").astype(np.int64))
        per_hash = df.groupby("h")["_tr"].sum().rename("t_n") \
            .reset_index()
        per_id = df.groupby(["h", "doc_id"], dropna=False)["_tr"] \
            .sum().rename("same_n").reset_index()
        # column merges: pandas matches NA keys, which IS the SQL
        # IS-NOT-DISTINCT identity this audit needs
        df = df.merge(per_hash, on="h", how="left") \
            .merge(per_id, on=["h", "doc_id"], how="left")
        leaked = (df["t_n"] - df["same_n"]) > 0
        agg = pd.DataFrame({"split": df["split"],
                            "pn": np.ones(len(df), np.int64),
                            "pl": leaked.to_numpy().astype(np.int64)}) \
            .groupby("split").sum().reset_index()
        return pa.Table.from_pandas(agg, schema=_out_schema,
                                    preserve_index=False)

    partials = partitioned_group_apply(pruned, ["h"], audit,
                                       batch_format="pyarrow")
    out = grouped_agg(partials, ["split"],
                      {"pn": "n_docs", "pl": "n_leaked"},
                      count_alias="_c").to_pandas()
    if out.empty or "split" not in out.columns:
        return pd.DataFrame({"split": pd.Series([], dtype="object"),
                             "n_docs": pd.Series([], dtype="int64"),
                             "n_leaked": pd.Series([], dtype="int64")})
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_leaked"] = out["n_leaked"].astype("int64")
    return out[["split", "n_docs", "n_leaked"]].sort_values("split") \
        .reset_index(drop=True)


def fuzzy_components_customers(sf_dir: str, max_dist: int = 2):
    """ENTITY RESOLUTION end-to-end (ORACLED): fuzzy-match pairs →
    distributed connected components → one (c_custkey, entity_id) row
    per customer appearing in any pair, entity_id = the smallest key
    in its cluster — the record-linkage composition (blocking +
    vectorized Levenshtein + min-label clustering) that turns pairwise
    matches into dedupable entities. Both stages are the existing
    scale paths: blocked_fuzzy_pairs ships only the narrow
    (block, id, name) projection through one block-hash shuffle, and
    connected_components union-finds under its gather cap with the
    distributed min-label-propagation fallback above it. The oracle is
    a recursive-CTE transitive closure over the same SQL pair set —
    pairs AND clustering checked end to end (the
    neardup_components_documents convention)."""
    from ..dedup import connected_components
    from ..text import blocked_fuzzy_pairs
    ds = _read(sf_dir, "customer",
               columns=["c_custkey", "c_name", "c_nationkey",
                        "c_mktsegment"])
    pairs = blocked_fuzzy_pairs(
        ds, ["c_nationkey", "c_mktsegment"], "c_name", "c_custkey",
        max_dist=max_dist)
    # components reads an ARROW schema; the fuzzy stage emits pandas
    # blocks — pin the edge schema at the boundary (typed even when a
    # partition finds zero pairs)
    _edge_schema = pa.schema([("id_a", pa.int64()),
                              ("id_b", pa.int64()),
                              ("dist", pa.int64())])
    edges = pairs.map_batches(
        lambda df: pa.Table.from_pandas(df, schema=_edge_schema,
                                        preserve_index=False),
        batch_format="pandas", batch_size=131072)
    out = connected_components(edges).to_pandas()
    if out.empty or "node" not in out.columns:
        return pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "entity_id": pd.Series([], dtype="int64")})
    out = out.rename(columns={"node": "c_custkey",
                              "component": "entity_id"})
    out["c_custkey"] = out["c_custkey"].astype("int64")
    out["entity_id"] = out["entity_id"].astype("int64")
    return out[["c_custkey", "entity_id"]].sort_values("c_custkey") \
        .reset_index(drop=True)


def q9_product_profit(sf_dir: str, name_frag: str = "red"):
    """TPC-H Q9 shape (ORACLED): profit per (supplier nation, order
    year) over a part-name family — the 5-table profit rollup
    (reference has no table ops at all; this is the SURVEY §2.6
    grouped-aggregate family at its widest join tree). The testdata
    star carries no partsupp table, so Q9's cost term
    ps_supplycost * l_quantity is re-expressed against the part list
    price (0.1 * p_retailprice * l_quantity) — same join tree
    (part ⋈ lineitem ⋈ supplier ⋈ orders ⋈ nation), same
    amount-expression shape, same GROUP/ORDER contract. Name-family
    parts prune FIRST and carry p_retailprice through the size-chosen
    join, so the corpus stream narrows before anything wide; supplier
    attaches s_nationkey the same way; the one big-big exchange is
    lineitem ⋈ orders on orderkey with o_year alone on the right
    (the q8 ordering). Per-(nationkey, year) combiner partials bound
    the final groupby — grouped_agg_hash so a NULL year (year(NULL))
    or NULL nationkey forms a real SQL group instead of poisoning
    Ray's sort aggregate — and the 25-row nation name map applies
    driver-side to the aggregate, re-grouping by NAME (two nationkeys
    sharing a name merge, the q21 s_name rule)."""
    from ..joins import equi_join
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_name",
                          "p_retailprice"]).map_batches(
        lambda b: b.filter(pc.match_substring(
            b["p_name"], name_frag)).select(
            ["p_partkey", "p_retailprice"]),
        batch_format="pyarrow", zero_copy_batch=True)
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_quantity", "l_extendedprice", "l_discount"])
    empty = pd.DataFrame({
        "nation": pd.Series([], dtype="object"),
        "o_year": pd.Series([], dtype="int64"),
        "sum_profit": pd.Series([], dtype="float64")})
    try:
        lp = equi_join(li, part, on="l_partkey", right_on="p_partkey")
    except ValueError as ex:
        if "right side is empty" in str(ex):
            return empty
        raise

    def amount_proj(b: pa.Table) -> pa.Table:
        # exactly the SQL expression tree, left-associative:
        # l_extendedprice*(1-l_discount) - 0.1*p_retailprice*l_quantity
        rev = pc.multiply(b["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), b["l_discount"]))
        cost = pc.multiply(pc.multiply(pa.scalar(0.1),
                                       b["p_retailprice"]),
                           b["l_quantity"])
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "l_suppkey": b["l_suppkey"],
                         "amount": pc.subtract(rev, cost)})

    lp = lp.map_batches(amount_proj, batch_format="pyarrow",
                        zero_copy_batch=True)
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"])
    ls = equi_join(lp, supp, on="l_suppkey", right_on="s_suppkey") \
        .select_columns(["l_orderkey", "amount", "s_nationkey"])

    def ord_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64())})

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"]).map_batches(
        ord_proj, batch_format="pyarrow", zero_copy_batch=True)
    full = equi_join(ls, orders, on="l_orderkey", right_on="o_orderkey")
    agg = grouped_agg_hash(full, ["s_nationkey", "o_year"],
                           {"amount": "profit"},
                           count_alias="_n").to_pandas()
    if agg.empty or "s_nationkey" not in agg.columns:
        return empty
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    j = agg.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    if j.empty:
        return empty
    # SQL groups by NAME; min_count=1 keeps SQL's sum-over-all-NULL =
    # NULL (pandas' default sum of an all-NaN group is 0.0, DuckDB's
    # round(sum(NULL),2) is NULL)
    out = j.groupby(["n_name", "o_year"], dropna=False,
                    as_index=False)["profit"].sum(min_count=1)
    out = out.rename(columns={"n_name": "nation",
                              "profit": "sum_profit"})
    out["sum_profit"] = out["sum_profit"].round(2)
    # DuckDB-pandas canon: nullable BIGINT gathers as float64+NaN when
    # nulls exist (a NULL o_orderdate year), plain int64 otherwise
    out["o_year"] = out["o_year"].astype(
        "float64" if out["o_year"].isna().any() else "int64")
    return out.sort_values(["nation", "o_year"],
                           ascending=[True, False]) \
        .reset_index(drop=True)


def q20_dominant_supplier(sf_dir: str):
    """TPC-H Q20 shape (ORACLED): suppliers holding a DOMINANT share
    (strictly more than half) of any large part's shipped quantity in
    the 1995-1996 window — Q20's `IN (grouped subquery with a
    per-part threshold)` re-expressed against shipped quantity
    because the testdata star has no partsupp/availqty. The pair
    aggregate AND the per-part threshold both run inside ONE
    part-hash partition pass (the q21 fusion): per-batch Arrow
    combines bound the shuffle at one (part, supplier, batch) row,
    the partition fn finishes the pair sums, computes each part's
    total and emits only dominant suppkeys. Dominance compares are
    float-exact: quantities are integral doubles, sums stay far below
    2^53 and 0.5*tot is a power-of-two scale. A NULL suppkey group
    still absorbs quantity into its part's total (the SQL window sums
    it) but can never qualify (IN against NULL is UNKNOWN); an
    all-NULL quantity pair has q = NULL and fails the > compare on
    both engines. Supplier attaches via the semi join; the gather is
    result-sized."""
    import datetime as dt

    from ..joins import equi_join
    from ..util import partitioned_group_apply
    lo, hi = dt.datetime(1995, 1, 1), dt.datetime(1997, 1, 1)
    part_keys = _distinct_filtered_keys(
        sf_dir, "part", "p_partkey",
        lambda b: b.filter(pc.greater_equal(b["p_size"],
                                            pa.scalar(40))),
        columns=["p_partkey", "p_size"]).to_pandas()
    empty = pd.DataFrame({
        "s_name": pd.Series([], dtype="object"),
        "s_acctbal": pd.Series([], dtype="float64")})
    if part_keys.empty or "p_partkey" not in part_keys.columns:
        return empty

    def li_prune(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(
            pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
            pc.less(b["l_shipdate"], pa.scalar(hi))))
        return b.select(["l_partkey", "l_suppkey", "l_quantity"])

    li = _broadcast_key_filter(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_quantity",
                       "l_shipdate"]),
        "l_partkey", part_keys["p_partkey"].to_numpy()).map_batches(
        li_prune, batch_format="pyarrow", zero_copy_batch=True)
    partials = li.map_batches(
        lambda b: b.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("l_quantity", "sum")]).rename_columns(
            ["l_partkey", "l_suppkey", "_q"]),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)

    def dominant(t: pa.Table) -> pa.Table:
        pairs = t.group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("_q", "sum")]).rename_columns(
            ["l_partkey", "l_suppkey", "q"])
        tot = pairs.group_by(["l_partkey"]).aggregate(
            [("q", "sum")]).rename_columns(["l_partkey", "tot"])
        idx = pc.index_in(_combine_col(pairs["l_partkey"]),
                          value_set=_combine_col(tot["l_partkey"]))
        half = pc.multiply(pa.scalar(0.5),
                           _combine_col(tot["tot"]).take(idx))
        keep = pairs.filter(pc.and_(
            pc.greater(pairs["q"], half),
            pc.is_valid(pairs["l_suppkey"])))
        return pa.table({
            "l_suppkey": pc.unique(_combine_col(keep["l_suppkey"]))})

    qual = partitioned_group_apply(partials, ["l_partkey"], dominant,
                                   batch_format="pyarrow")
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_name", "s_acctbal"])
    got = equi_join(
        supp, qual, on="s_suppkey", right_on="l_suppkey", how="semi",
        right_schema=pa.schema([("l_suppkey", pa.int64())])).to_pandas()
    if got.empty or "s_name" not in got.columns:
        return empty
    out = pd.DataFrame({"s_name": got["s_name"],
                        "s_acctbal": got["s_acctbal"].round(2)})
    return out.sort_values(["s_name", "s_acctbal"]) \
        .reset_index(drop=True)


def q11_important_parts(sf_dir: str, nation: str = "NATION_20",
                        fraction: float = 0.0003):
    """TPC-H Q11 shape (ORACLED): parts whose revenue within ONE
    nation's suppliers exceeds a FRACTION of that nation's total — the
    global-scalar-threshold-over-grouped-sums shape (Q22 uses a global
    avg; Q11's threshold is a fraction of the aggregate's own grand
    total, so the scalar derives from the SAME aggregate it filters).
    The testdata star carries no partsupp, so Q11's
    ps_supplycost*ps_availqty value is re-expressed as shipped revenue
    l_extendedprice*(1-l_discount) — same join tree (nation → supplier
    → lineitem), same HAVING-vs-scalar-subquery contract. The nation's
    supplier keys are dimension-sized and broadcast
    (_broadcast_key_filter) so the lineitem scan prunes to ~1/25 of
    the stream before anything groups; per-(partkey, batch) combiner
    partials ride grouped_agg_hash (near-part-cardinality keys); the
    aggregate is PART-BOUNDED, so the grand total + strict-> filter
    run driver-side over the gathered aggregate (the pareto_sources
    convention — at 10^12 lineitem rows this gather is still only one
    nation's part list). NULL l_partkey forms a real group that can
    qualify; an all-NULL-amount group has v = NULL and fails the
    strict > on both engines (pandas NaN compare = False); NULL
    l_suppkey rows never match the supplier semi join, exactly like
    the SQL inner join. The displayed value uses duckdb_round, NOT
    pandas round: three sf0.01 part sums land within one ulp of a
    half-cent and DuckDB's std::round(x*100)/100 ties AWAY from zero
    where numpy ties to even (74251.485 → .49 vs .48 — pinned)."""
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name"]).to_pandas()
    empty = pd.DataFrame({
        "l_partkey": pd.Series([], dtype="int64"),
        "value": pd.Series([], dtype="float64")})
    keys = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    if keys.empty:
        return empty
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = supp.loc[supp["s_nationkey"].isin(keys.to_numpy()),
                     "s_suppkey"].dropna()
    if skeys.empty:
        return empty

    def amount_proj(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": b["l_partkey"],
            "v": pc.multiply(b["l_extendedprice"],
                             pc.subtract(pa.scalar(1.0),
                                         b["l_discount"]))})

    li = _broadcast_key_filter(
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_suppkey", "l_extendedprice",
                       "l_discount"]),
        "l_suppkey", skeys.to_numpy()).map_batches(
        amount_proj, batch_format="pyarrow", zero_copy_batch=True)
    agg = grouped_agg_hash(li, ["l_partkey"], {"v": "v"},
                           count_alias="_n")
    # part-bounded gather (nullable Int64 keys — the 2^53 rule)
    parts = []
    for b in agg.iter_batches(batch_format="pyarrow"):
        parts.append(b.to_pandas(types_mapper=_nullable_int64))
    if not parts:
        return empty
    df = pd.concat(parts, ignore_index=True)
    if df.empty or "l_partkey" not in df.columns:
        return empty
    total = df["v"].sum(min_count=1)
    if pd.isna(total):
        return empty
    keep = df[df["v"] > fraction * total].copy()
    keep["value"] = duckdb_round(keep["v"].to_numpy())
    keep["l_partkey"] = keep["l_partkey"].astype(
        "float64" if keep["l_partkey"].isna().any() else "int64")
    return keep[["l_partkey", "value"]].sort_values(
        ["value", "l_partkey"], ascending=[False, True],
        na_position="last").reset_index(drop=True)


def minhash_md5_signatures_documents(sf_dir: str):
    """MD5-keyed minhash signatures (ORACLED — the hash-based dedup
    family's first value-level oracle): K=16 permuted minhash sigs
    over each document's 3-gram shingle set, keyed on md5 so DuckDB's
    md5_number reproduces every value bit-exactly (dedup/md5lsh.py
    module docstring has the full arithmetic contract). The
    production-path analog (internal hash64) is
    minhash_neardup_documents, rows-only by necessity."""
    from ..dedup.md5lsh import minhash_signatures_md5
    return minhash_signatures_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def minhash_md5_pairs_documents(sf_dir: str):
    """MD5-keyed banded-LSH candidate pairs (ORACLED): docs sharing at
    least one of 4 bands (4 sigs each), id_a < id_b, distinct. The
    full LSH candidate generation — shingle → sign → band → bucket →
    pair — checked value-level against a SQL self-join for the first
    time (the internal-hash variant can only be rows-only)."""
    from ..dedup.md5lsh import minhash_band_pairs_md5
    return minhash_band_pairs_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def simhash_md5_documents(sf_dir: str):
    """MD5-keyed 64-bit simhash per document (ORACLED): bit b set iff
    strictly more than half the token occurrences carry bit b — the
    ±1-bit-sum signature checked value-level against SQL bit
    arithmetic (VERDICT r3 item 7's 'reproduce the signature in SQL',
    delivered via md5_number rather than the internal hash)."""
    from ..dedup.md5lsh import simhash_md5
    return simhash_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def quantize_embeddings(sf_dir: str):
    """Scalar int8-range quantization summary (ORACLED): per-dimension
    corpus min/max -> code = round(((v-mn)/(mx-mn))*255) -> per-vector
    (code_sum, n_dims) exact-integer summary. The compression pass a
    vector store runs before persisting; ann/quantize.py's module
    docstring carries the full exactness contract (duckdb_round ties,
    NaN/NULL exclusion mirrored INTO the oracle, degenerate dims,
    all-null vectors absent). Two streaming passes: dim-bounded stats
    partials + broadcast encode; nothing vector-proportional gathers."""
    from ..ann.quantize import scalar_quantize_summary
    return scalar_quantize_summary(
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]))


def interleave_by_source_documents(sf_dir: str):
    """Deterministic proportional interleave (ORACLED) — the epoch
    schedule a training loader uses to mix sources at their corpus
    proportions without a global shuffle: within each source, the r-th
    document (ordered by doc_id, NULLS LAST) lands at
    ``slot = ((2r-1)*total) // (2*cnt_source)`` — the midpoint-rounded
    proportional position, so every source spreads evenly over
    [0, total) and two sources never systematically collide. Exact
    integer math on both engines; past ~2^31 rows the int64 product
    would WRAP, so the schedule lifts to Python-int (object-dtype)
    arithmetic there instead of corrupting slots silently. ONE
    source-hash partition pass; inside, Arrow sort + segment
    boundaries compute ranks vectorized and doc_ids NEVER round-trip
    through pandas float64 (the 2^53 rule). A NULL source is a real
    schedule lane (sorted to its own segment); duplicate doc_ids make
    the rank assignment between the twins arbitrary but the OUTPUT
    multiset identical on both engines (slots are consumed as rows,
    not joined back by id)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    total = int(ds.count())
    if total == 0:
        import ray
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "slot": pa.array([], pa.int64())}))
    from ..util import partitioned_group_apply

    def schedule(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("source", "ascending"),
                          ("doc_id", "ascending")],
            null_placement="at_end")
        t = t.take(order)
        codes = pc.fill_null(
            pc.cast(t["source"].combine_chunks().dictionary_encode()
                    .indices, pa.int64()), -1) \
            .to_numpy(zero_copy_only=False)
        from ..util import sorted_segments
        n = len(codes)
        seg_start, pos = sorted_segments([codes], n)
        rn = pos + 1
        uniq = np.unique(seg_start)
        lens = np.diff(np.append(uniq, n))
        cnt = lens[np.searchsorted(uniq, seg_start)]
        if 2 * total * total >= 2 ** 63:
            # int64 would wrap: lift to Python-int arithmetic
            slot = ((2 * rn.astype(object) - 1) * total
                    // (2 * cnt.astype(object))).astype(np.int64)
        else:
            slot = ((2 * rn - 1) * total) // (2 * cnt)
        return pa.table({"doc_id": t["doc_id"],
                         "source": t["source"],
                         "slot": pa.array(slot, pa.int64())})

    return partitioned_group_apply(ds, ["source"], schedule,
                                   batch_format="pyarrow")


def simhash_md5_pairs_documents(sf_dir: str):
    """Simhash near-duplicate pairs (ORACLED): Manku-style banded
    Hamming dedup over the md5-keyed 64-bit simhash — docs within
    Hamming distance 3, found via the 4x16-bit band pigeonhole
    (distance <= 3 forces exact agreement on >= 1 band) and verified
    by xor-popcount. The whole candidate-generate + verify loop is
    value-checked against a SQL self-join with bit_count(xor(...)) —
    the production simhash family's first end-to-end pair oracle."""
    from ..dedup.md5lsh import simhash_band_pairs_md5
    return simhash_band_pairs_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def snapshot_diff_documents(sf_dir: str):
    """CDC snapshot diff (ORACLED): classify every doc_id as
    added/removed/changed between two deterministic views of the
    documents table — old = ids with doc_id%3 != 0 (text as stored),
    new = ids with doc_id%7 != 0 (text || '!' appended when
    doc_id%5 == 0, Arrow emit-null concat == SQL ||'s NULL
    propagation, so a NULL text 'mutation' stays NULL and reads
    UNCHANGED under IS DISTINCT FROM). The generic joins.snapshot_diff
    carries the shape: explicit presence markers (value nullness can't
    mean absence), exact three-valued value compare, one key-hash
    full-outer shuffle; the 100-TB variant ships hash64(text) instead
    of text (novelty hash_only convention)."""
    from ..joins import snapshot_diff
    base = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def imod(x, m: int):
        # no modulo kernel in this pyarrow: x - trunc(x/m)*m — the
        # SAME trunc semantics as DuckDB's % (negative ids included)
        return pc.subtract(x, pc.multiply(pc.divide(x, m), m))

    def old_view(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(imod(b["doc_id"], 3), 0)
        return b.filter(pc.fill_null(keep, False))

    def new_view(b: pa.Table) -> pa.Table:
        keep = pc.not_equal(imod(b["doc_id"], 7), 0)
        b = b.filter(pc.fill_null(keep, False))
        mut = pc.equal(imod(b["doc_id"], 5), 0)
        bumped = pc.binary_join_element_wise(b["text"], "!", "")
        return pa.table({
            "doc_id": b["doc_id"],
            "text": pc.if_else(mut, bumped, b["text"])})

    old = base.map_batches(old_view, batch_format="pyarrow",
                           zero_copy_batch=True)
    new = base.map_batches(new_view, batch_format="pyarrow",
                           zero_copy_batch=True)
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    return snapshot_diff(old, new, on="doc_id", value_cols=["text"],
                         left_schema=schema, right_schema=schema)


def scd2_intervals_events(sf_dir: str):
    """SCD2 historization (ORACLED): compress each user's
    (ts, event_id)-ordered event_type timeline into change-point
    validity intervals — one row per RUN of consecutive equal types,
    valid_from = the run's first ts, valid_to = the NEXT run's first
    ts (NULL on the open/current run). The slowly-changing-dimension
    build every warehouse runs to historize a mutable attribute; the
    as-of join family then consumes the intervals. ONE user-hash
    partition (a user's whole timeline co-locates; the transitions
    machinery): sort, groupby-shift change detection, shift(-1) close
    — the OUTPUT is the partition rows themselves (run-count-sized,
    streamed as a Dataset; no second aggregate). Null user/ts/type
    rows leave the timeline BEFORE run detection (the transitions
    convention — lag over the filtered view), so A, NULL-type, A
    stays ONE run. Tie rows (same user, ts) order by event_id on both
    engines; a type change inside a tie yields a zero-length interval
    identically."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    _schema = pa.schema([("user_id", pa.int64()),
                         ("event_type", pa.string()),
                         ("valid_from", pa.timestamp("us")),
                         ("valid_to", pa.timestamp("us"))])

    def intervals(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        prev = df.groupby("user_id", sort=False)["event_type"].shift(1)
        change = (prev.isna() | (prev != df["event_type"])).to_numpy()
        st = df[change]
        out = pd.DataFrame({
            "user_id": st["user_id"].to_numpy(),
            "event_type": st["event_type"].to_numpy(),
            "valid_from": st["ts"].to_numpy(),
            "valid_to": st.groupby("user_id", sort=False)["ts"]
            .shift(-1).to_numpy()})
        return pa.Table.from_pandas(out, schema=_schema,
                                    preserve_index=False)

    return partitioned_group_apply(pruned, ["user_id"], intervals,
                                   batch_format="pyarrow")


def pmi_bigrams_documents(sf_dir: str):
    """Top-50 collocations by pointwise mutual information (ORACLED):
    Church-Hanks PMI over adjacent token pairs with n >= 5, the phrase
    detector behind tokenizer merges — see text/transform.pmi_bigrams
    for the materialize-once / prune-before-join / partial-top-k scale
    shape and the duckdb_round(…, 6)-before-ranking tie contract."""
    from ..text.transform import pmi_bigrams
    return pmi_bigrams(_read(sf_dir, "documents", columns=["text"]))


def sequence_match_users(sf_dir: str,
                         pattern: str = "view>click>purchase"):
    """Sequential-pattern mining (ORACLED): users whose (ts, event_id)-
    ordered event-type sequence contains the adjacent trigram
    ``view>click>purchase`` at least once, with the non-overlapping
    match count — the behavioral-cohort selector a funnel/curriculum
    pipeline runs as a REGEX over the ordered sequence (funnel_events
    answers first-touch stage conversion; this answers arbitrary
    ordered patterns). ONE user-hash partition (a user's timeline
    co-locates; the scd2/transitions machinery): sort, per-user
    '>'-join, ONE vectorized RE2 ``count_substring_regex`` over the
    user-count-sized sequence array — RE2 on both engines
    (DuckDB ``regexp_extract_all`` is RE2 too) with identical
    leftmost non-overlapping match semantics. Null user/ts/type rows
    leave the timeline BEFORE joining (the transitions convention);
    tie rows (same user, ts) order by event_id on both engines, and
    '>' cannot appear inside a type token so the join is unambiguous.
    Output is user-bounded (only matching users), streamed as a
    Dataset; a typed empty block pins the (user_id, n_matches) schema
    on an empty corpus (md5lsh convention)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)

    def match(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        seqs = df.groupby("user_id", sort=False)["event_type"] \
            .agg(">".join)
        n = pc.count_substring_regex(
            pa.array(seqs.to_numpy(), pa.string()),
            pattern).to_numpy(zero_copy_only=False).astype(np.int64)
        keep = n > 0
        return pd.DataFrame({
            "user_id": seqs.index.to_numpy()[keep].astype(np.int64),
            "n_matches": n[keep]})

    out = partitioned_group_apply(pruned, ["user_id"], match)
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64())})
    return _rd().from_pandas(empty.to_pandas()).union(out)


def cumulative_parts_shipped(sf_dir: str):
    """Catalog-adoption curve (ORACLED): per ship day, how many parts
    shipped for the FIRST time and the running total of distinct parts
    ever shipped — the cumulative-distinct-count curve a rollout or
    coverage dashboard reads. Two grouped aggregates, both partial:
    first-seen day per part is a #parts-bounded grouped MIN (one row
    per (part, batch) shuffles), the day recount is calendar-bounded,
    and the running sum is an exact int64 cumulation over the
    calendar-sized driver result (the pareto_sources convention).
    Null partkey/shipdate rows are invisible on both engines."""
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_shipdate"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("l_partkey").is_valid(),
                             b.column("l_shipdate").is_valid()))
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "day": pc.strftime(t.column("l_shipdate"), "%Y-%m-%d")})

    prepped = ds.map_batches(prep, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=131072)
    # per-batch partial min → one grouped Min per part (parts-bounded)
    partials = prepped.map_batches(
        lambda b: b.group_by(["l_partkey"]).aggregate([("day", "min")])
        .rename_columns(["l_partkey", "day_pmin"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=131072)
    from ray.data.aggregate import Min
    firsts = partials.groupby(["l_partkey"]).aggregate(
        Min("day_pmin", alias_name="day"))
    # calendar-bounded recount of first-seen days
    days = grouped_agg(firsts, ["day"], {}, count_alias="new_parts") \
        .to_pandas()
    if days.empty or "day" not in days.columns:
        return pd.DataFrame({
            "day": pd.Series([], dtype="object"),
            "new_parts": pd.Series([], dtype="int64"),
            "cum_parts": pd.Series([], dtype="int64")})
    days = days.sort_values("day").reset_index(drop=True)
    days["new_parts"] = days["new_parts"].astype("int64")
    days["cum_parts"] = days["new_parts"].cumsum().astype("int64")
    return days[["day", "new_parts", "cum_parts"]]


def tokenset_dedup_documents(sf_dir: str):
    """Bag-of-words dedup clusters (ORACLED): documents whose SORTED
    DISTINCT token set is identical collapse to one cluster — the
    order/multiplicity-insensitive exact-dedup key (catches shuffled
    or repeated-sentence near-copies that byte-exact dedup misses;
    the md5lsh family catches looser overlap). Per batch: literal
    single-space split (DuckDB string_split parity: consecutive
    spaces yield empty tokens, '' yields ['']), per-row distinct+sort
    (UTF-8 byte order == codepoint order == DuckDB binary collation),
    ' '-rejoin, md5-low64 of the canonical key — only the 8-byte key
    hash plus (min_id, cnt) partials ever shuffle, never the text
    (the hash_only convention; md5 collisions are 2^-64-negligible
    and the oracle groups the full key string, so a collision would
    surface as a mismatch, not hide). Output: clusters with >1 doc as
    (keep_id = min doc_id, n_docs). Null-text rows are excluded on
    both engines; duplicate doc_ids merge per SQL GROUP BY."""
    from ..dedup.md5lsh import md5_low64
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        # token explode stays vectorized Arrow; the per-row sorted
        # distinct set rebuilds via ONE lexsort over (row, token)
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
        order = np.lexsort((flat, idx))
        ridx, rtok = idx[order], flat[order]
        # drop (row, token) duplicates on the sorted stream
        first = np.ones(len(ridx), dtype=bool)
        first[1:] = (ridx[1:] != ridx[:-1]) | (rtok[1:] != rtok[:-1])
        ridx, rtok = ridx[first], rtok[first]
        keys = pd.Series(rtok).groupby(ridx, sort=True).agg(" ".join)
        # signed wrap of the unsigned low64 is a bijection — grouping
        # semantics unchanged (md5lsh signing convention)
        k64 = np.fromiter((md5_low64(k) for k in keys.to_numpy()),
                          dtype=np.uint64, count=len(keys)) \
            .astype(np.int64)
        # doc_id rides Arrow take — null-bearing ids never float
        ids = t.column("doc_id").combine_chunks().take(
            pa.array(keys.index.to_numpy(), pa.int64()))
        agg = pa.table({"key64": pa.array(k64), "doc_id": ids}) \
            .group_by(["key64"]).aggregate(
                [("doc_id", "min"), ([], "count_all")])
        return agg.rename_columns(["key64", "keep_pmin", "cnt_psum"])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)
    from ray.data.aggregate import Min, Sum
    agg = partials.groupby(["key64"]).aggregate(
        Min("keep_pmin", alias_name="keep_id"),
        Sum("cnt_psum", alias_name="n_docs"))
    batches = list(agg.iter_batches(batch_format="pyarrow"))
    if not batches:
        return pd.DataFrame({"keep_id": pd.Series([], dtype="int64"),
                             "n_docs": pd.Series([], dtype="int64")})
    out = pa.concat_tables(batches, promote_options="permissive") \
        .to_pandas(types_mapper=_nullable_int64)
    out = out[out["n_docs"].astype("int64") > 1]
    keep = out["keep_id"]
    res = pd.DataFrame({
        "keep_id": keep.astype(
            "float64" if keep.isna().any() else "int64"),
        "n_docs": out["n_docs"].astype("int64")})
    return res.sort_values("keep_id", na_position="last") \
        .reset_index(drop=True)


def drawdown_daily_events(sf_dir: str):
    """Max drawdown of each type's daily-count series (ORACLED): the
    largest peak-to-current drop over the SAME dense zero-filled
    calendar grid as ma/autocorr/gini, plus the EARLIEST trough day —
    the path statistic a volume-monitoring pipeline alarms on (a
    calendar gap IS a drawdown; dropping it would hide the alarm).
    Running max − count is exact int64; ties on the max drawdown
    resolve to the earliest day on both engines (SQL min(d) over the
    equal-drawdown rows). The corpus scan distributes; the finish is
    calendar×vocabulary-bounded driver work."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "max_drawdown": pd.Series([], dtype="int64"),
        "trough_day": pd.Series([], dtype="object")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        n = g["n"].to_numpy()
        dd = np.maximum.accumulate(n) - n
        md = int(dd.max())
        trough = g["day"].to_numpy()[int(np.argmax(dd))]
        rows.append({"event_type": t, "max_drawdown": md,
                     "trough_day": trough})
    out = pd.DataFrame(rows)
    out["max_drawdown"] = out["max_drawdown"].astype("int64")
    return out


def weighted_median_price(sf_dir: str):
    """Exact quantity-weighted median of l_extendedprice (ORACLED) —
    the weighted-quantile selection a pricing/mixture stage needs,
    computed by DISTRIBUTED SELECTION instead of a driver histogram
    (the distinct-price count is near the row count, so the
    _distinct_quantiles gather convention would not scale): per-price
    weight sums (grouped_agg_hash — near-row-cardinality keys) → Ray
    range sort → ONE batches-bounded gather of (min_v, sum_wt) block
    summaries → the driver prefix-sums to locate the crossing block →
    ONE value-range-pruned re-scan of just that block finds the
    smallest v with cumweight >= total/2. Weights are integral
    doubles (quantities) so every cumulative sum is exact below 2^53;
    non-positive and null weights/prices are excluded on both
    engines. Returns (wmedian, total_qty)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice", "l_quantity"])

    def clean(b: pa.Table) -> pa.Table:
        v = b.column("l_extendedprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        keep = np.isfinite(v) & np.isfinite(q) & (q > 0)
        return pa.table({"v": pa.array(v[keep]),
                         "q": pa.array(q[keep])})

    wagg = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["v"], {"q": "wt"}, count_alias="_c") \
        .select_columns(["v", "wt"]).sort("v").materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "w": pa.array([], pa.float64())})
        v = b.column("v").to_numpy(zero_copy_only=False)
        w = b.column("wt").to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())]),
                         "w": pa.array([float(w.sum())])})

    out_empty = pd.DataFrame({
        "wmedian": pd.Series([], dtype="float64"),
        "total_qty": pd.Series([], dtype="int64")})
    summ = wagg.map_batches(summary, batch_format="pyarrow",
                            zero_copy_batch=True).to_pandas()
    if summ.empty or "lo" not in summ.columns:
        return out_empty
    summ = summ.sort_values("lo").reset_index(drop=True)
    total = float(summ["w"].sum())
    target = total / 2
    cum = summ["w"].cumsum().to_numpy()
    k = int(np.searchsorted(cum, target))  # first block with cum>=t
    lo_k, hi_k = summ["lo"].iloc[k], summ["hi"].iloc[k]
    before = float(cum[k - 1]) if k > 0 else 0.0

    def in_block(b: pa.Table) -> pa.Table:
        v = b.column("v")
        m = pc.and_(pc.greater_equal(v, lo_k), pc.less_equal(v, hi_k))
        return b.filter(m)

    blk = wagg.map_batches(in_block, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas() \
        .sort_values("v")
    cw = before + blk["wt"].cumsum().to_numpy()
    v = blk["v"].to_numpy()[cw >= target]
    return pd.DataFrame({"wmedian": [float(v[0])],
                         "total_qty": [np.int64(total)]})


def contingency_lift_events(sf_dir: str):
    """Association-strength contingency cells (ORACLED): observed /
    expected lift for every (event_type, hour) cell — the pointwise
    dependence table behind mutual-information feature screens,
    computed CELL-WISE so no cross-cell float summation order exists:
    lift = (n_xy · N) / (n_x · n_y), all four moments exact int64
    from ONE combiner groupby (cells ≤ vocabulary × 24 reach the
    driver; margins derive from the same aggregate), evaluated in the
    exact SQL operand order and rounded at 6dp. Null type/ts rows are
    invisible on both engines."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        return pa.table({"event_type": t.column("event_type"),
                         "hr": pc.hour(t.column("ts"))})

    cells = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["event_type", "hr"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "hr": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "lift": pd.Series([], dtype="float64")})
    if cells.empty or "event_type" not in cells.columns:
        return out_empty
    cells["n"] = cells["n"].astype("int64")
    nx = cells.groupby("event_type")["n"].transform("sum").to_numpy()
    nh = cells.groupby("hr")["n"].transform("sum").to_numpy()
    nn = int(cells["n"].sum())
    n = cells["n"].to_numpy()
    lift = duckdb_round((n.astype(np.float64) * nn) / (nx * nh), 6)
    out = pd.DataFrame({"event_type": cells["event_type"],
                        "hr": cells["hr"].astype("int64"),
                        "n": n, "lift": lift})
    return out.sort_values(["event_type", "hr"]).reset_index(drop=True)


def trending_terms_documents(sf_dir: str, min_n: int = 20,
                             k: int = 25):
    """Trending-term drift (ORACLED): add-one-smoothed frequency lift
    of each term between the doc_id%2 == 0 and == 1 corpus halves —
    the term-level drift screen run between two crawl snapshots
    (here the deterministic parity split stands in for the time
    axis). Per-batch token explode with (term, half) count partials
    (term strings shuffle so DuckDB can reproduce them — the
    term_frequency convention; the 100-TB variant ships hash64(term));
    the vocabulary-sized aggregate MATERIALIZES once (it feeds the
    totals, the min-support filter AND the ranking — the pmi
    convention), lift evaluates in the exact SQL operand order with
    duckdb_round BEFORE ranking, selection is the per-block partial
    top-k. doc_id %% 2 is TRUNC-mod on both engines (a negative id
    answers -1: counted in NEITHER half, exactly like the SQL CASE);
    empty tokens are excluded; null text/doc_id rows are invisible."""
    from ..util import partial_topk
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("text").is_valid(),
                             b.column("doc_id").is_valid()))
        toks = pc.split_pattern(t.column("text").combine_chunks(), " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        half = np.repeat(np.fmod(ids, 2), lens)  # trunc-mod like SQL %
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.filter(pa.array(keep))
        half = half[keep]
        tb = pa.table({
            "w": w,
            "c0": pa.array((half == 0).astype(np.int64)),
            "c1": pa.array((half == 1).astype(np.int64))})
        agg = tb.group_by(["w"]).aggregate([("c0", "sum"),
                                            ("c1", "sum")])
        return agg.rename_columns(["w", "c0", "c1"])

    agg = grouped_agg(
        ds.map_batches(counts, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["w"], {"c0": "n0", "c1": "n1"},
        count_alias="_c").materialize()
    out_empty = pd.DataFrame({
        "w": pd.Series([], dtype="object"),
        "n0": pd.Series([], dtype="int64"),
        "n1": pd.Series([], dtype="int64"),
        "lift": pd.Series([], dtype="float64")})
    tot = agg.select_columns(["n0", "n1"]) \
        .map_batches(lambda b: pa.table(
            {"t0": pa.array([int(pc.sum(b["n0"]).as_py() or 0)]),
             "t1": pa.array([int(pc.sum(b["n1"]).as_py() or 0)])}),
            batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if tot.empty:
        return out_empty
    t0, t1 = int(tot["t0"].sum()), int(tot["t1"].sum())

    def lift_batch(b: pa.Table) -> pa.Table:
        n0 = b.column("n0").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n1 = b.column("n1").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = (n0 + n1) >= min_n
        n0, n1 = n0[keep], n1[keep]
        w = b.column("w").filter(pa.array(keep))
        lift = duckdb_round(((n1 + 1.0) / (t1 + 1.0))
                            / ((n0 + 1.0) / (t0 + 1.0)), 6)
        return pa.table({"w": w, "n0": pa.array(n0),
                         "n1": pa.array(n1), "lift": pa.array(lift)})

    ranked = agg.map_batches(lift_batch, batch_format="pyarrow",
                             zero_copy_batch=True)
    top = partial_topk(ranked, ["lift", "w"], [False, True], k)
    if top is None:
        return out_empty
    top["n0"] = top["n0"].astype("int64")
    top["n1"] = top["n1"].astype("int64")
    return top[["w", "n0", "n1", "lift"]]


def locf_resample_events(sf_dir: str):
    """Hourly LOCF resample per type (ORACLED): the value of the
    LATEST event at-or-before every hour of the dense corpus grid —
    the last-observation-carried-forward time-series regularization a
    monitoring/feature pipeline runs before windowed models. The
    latest-at-or-before-H event is the latest among per-HOUR winners
    with hour <= H, so the corpus never sorts: per-batch argmax per
    (type, hour) by (ts, event_id) — the candles two-level argmax —
    then ONE (type, hour)-hash partition re-argmax, then the
    calendar×vocabulary-bounded driver LOCF over the dense grid.
    A winner whose value is NULL CARRIES (SQL picks the latest row's
    value, null or not — a ffill would wrongly skip it); hours before
    a type's first event answer NULL; ties at the same ts resolve to
    the larger event_id on both engines (ORDER BY ts DESC, id DESC
    LIMIT 1). Null type/ts rows are invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        df = t.to_pandas()
        # admissible-from hour: an event at H:30 is visible only to
        # grid points >= H+1; an event exactly at H:00 to H itself —
        # i.e. the CEILING hour (floor-bucketing would leak events
        # later in the hour into grid point H)
        df["hour"] = df["ts"].dt.ceil("h")
        df = df.sort_values(["event_type", "hour", "ts", "event_id"])
        win = df.groupby(["event_type", "hour"], sort=False).tail(1)
        return pa.Table.from_pandas(
            win[["event_type", "hour", "ts", "event_id", "value"]],
            preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def re_argmax(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["event_type", "hour", "ts", "event_id"])
        return pa.Table.from_pandas(
            df.groupby(["event_type", "hour"], sort=False).tail(1),
            preserve_index=False)

    winners = partitioned_group_apply(
        partials, ["event_type", "hour"], re_argmax,
        batch_format="pyarrow").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "hour": pd.Series([], dtype="object"),
        "value": pd.Series([], dtype="float64")})
    if winners.empty or "hour" not in winners.columns:
        return out_empty
    # SQL grid bounds are FLOORED event extremes (a bucket's winner
    # shares the raw min/max event's hour, so floors agree)
    lo = winners["ts"].min().floor("h")
    hi = winners["ts"].max().floor("h")
    hours = pd.date_range(lo, hi, freq="h").to_numpy() \
        .astype("datetime64[us]")
    rows = []
    for et, g in winners.groupby("event_type", sort=True):
        g = g.sort_values(["hour", "ts", "event_id"])
        ghr = g["hour"].to_numpy().astype("datetime64[us]")
        vals = g["value"].to_numpy()
        idx = np.searchsorted(ghr, hours, side="right") - 1
        v = np.where(idx >= 0, vals[np.maximum(idx, 0)], np.nan)
        rows.append(pd.DataFrame({
            "event_type": et,
            "hour": pd.DatetimeIndex(hours)
            .strftime("%Y-%m-%d %H:00"),
            "value": v}))
    return pd.concat(rows, ignore_index=True)


BANDS = (("low", 0.0, 10.0), ("mid", 10.0, 100.0),
         ("high", 100.0, 1000.0))


def value_bands_events(sf_dir: str):
    """Broadcast interval-band join (ORACLED): count events whose
    value lands in each [lo, hi) band of a small interval dimension
    table — the bin-lookup join a bucketing/pricing stage runs; the
    intervals are contiguous so ONE vectorized searchsorted per batch
    replaces the SQL theta-join (the broadcast analog of a range
    join; bands ship in the closure, nothing shuffles but ≤ |bands|
    partial rows per batch). Zero-match bands still answer n = 0
    (the SQL LEFT JOIN count(e.value) shape); NaN matches no band on
    both engines; null values are excluded."""
    ds = _read(sf_dir, "events", columns=["value"])
    bounds = np.array([b[1] for b in BANDS] + [BANDS[-1][2]])
    names = [b[0] for b in BANDS]

    def bin_batch(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = v[np.isfinite(v) & (v >= bounds[0]) & (v < bounds[-1])]
        idx = np.searchsorted(bounds, v, side="right") - 1
        cnt = np.bincount(idx, minlength=len(names)).astype(np.int64)
        return pa.table({"band": pa.array(names),
                         "n_p": pa.array(cnt)})

    agg = grouped_agg(
        ds.map_batches(bin_batch, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["band"], {"n_p": "n"}, count_alias="_c").to_pandas()
    base = pd.DataFrame({"band": names})
    if agg.empty or "band" not in agg.columns:
        base["n"] = np.int64(0)
    else:
        base = base.merge(agg[["band", "n"]], on="band", how="left")
        base["n"] = base["n"].fillna(0).astype("int64")
    return base.sort_values("band").reset_index(drop=True)


def skyline_orders(sf_dir: str):
    """Pareto-front / skyline filter (ORACLED): orders not STRICTLY
    dominated on (o_orderdate, o_totalprice) — no other order has
    BOTH a later date AND a higher price; the maximal-frontier
    selection a curation pipeline runs to keep 'newest or best'.
    NO sort and NO pairwise join: the per-date max price is a
    calendar-bounded grouped aggregate, the strictly-later-date
    threshold is a driver-side suffix max over it, and one broadcast
    filter pass keeps rows with price > threshold (rows on the
    latest date have no threshold and always survive). Strict double
    compares are deterministic — same-date rows never dominate each
    other, equal prices across dates don't dominate. Null
    date/price rows are invisible on both engines; non-finite
    prices are excluded (NaN compares diverge across engines)."""
    import functools

    import ray
    ds = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def dmax(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        keep = np.isfinite(v) & (d != np.iinfo(np.int64).min) \
            & b.column("o_orderdate").is_valid().to_numpy(
                zero_copy_only=False)
        t = pa.table({"d": pa.array(d[keep]),
                      "mp": pa.array(v[keep])})
        return t.group_by(["d"]).aggregate([("mp", "max")]) \
            .rename_columns(["d", "mp"])

    from ray.data.aggregate import Max
    per_day = ds.map_batches(dmax, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=131072) \
        .groupby("d").aggregate(Max("mp", alias_name="mp")).to_pandas()
    _schema = pa.schema([("o_orderkey", pa.int64()),
                         ("o_orderdate", pa.timestamp("us")),
                         ("o_totalprice", pa.float64())])
    if per_day.empty or "d" not in per_day.columns:
        return _rd().from_arrow(_schema.empty_table())
    per_day = per_day.sort_values("d", ascending=False) \
        .reset_index(drop=True)
    # threshold for date d = max price over STRICTLY later dates
    mp = per_day["mp"].to_numpy()
    thr = np.concatenate([[-np.inf],
                          np.maximum.accumulate(mp)[:-1]])
    thr_ref = ray.put((per_day["d"].to_numpy().astype(np.int64),
                       thr))

    def keep_skyline(b: pa.Table, *, ref) -> pa.Table:
        from ..util import worker_cached
        days, t_arr = worker_cached(("skyline_thr", ref.hex()),
                                    lambda: ray.get(ref))
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        du = b.column("o_orderdate").to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        valid = b.column("o_orderdate").is_valid().to_numpy(
            zero_copy_only=False) & np.isfinite(v)
        # vectorized threshold lookup (every valid date IS in the
        # per-day aggregate; invalid rows are masked out anyway)
        idx = pc.index_in(pa.array(du), value_set=pa.array(days)) \
            .to_numpy(zero_copy_only=False)
        miss = pd.isna(idx)
        t = np.where(miss, np.inf,
                     t_arr[np.where(miss, 0, idx).astype(np.int64)])
        # strict dominance: dominated iff a LATER date has a STRICTLY
        # higher price → keep price >= threshold (an equal price on a
        # later date does not dominate)
        return b.filter(pa.array(valid & (v >= t)))

    out = ds.map_batches(
        functools.partial(keep_skyline, ref=thr_ref),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)
    return _rd().from_arrow(_schema.empty_table()).union(out)


def price_gaps_orders(sf_dir: str, k: int = 10):
    """Top-k gaps between consecutive DISTINCT o_totalprice values
    (ORACLED) — the sorted-neighbor statistic behind outlier-band and
    discretization audits, and the distributed-sort-with-boundary
    pattern: distinct values (grouped-agg histogram discipline) →
    Ray range sort → per-batch INTERNAL neighbor gaps reduced to a
    local top-k, plus one (first, last) edge row per batch — the
    driver stitches the batches-bounded edges into the cross-block
    gaps and merges (sorted batches are disjoint ordered ranges, so
    edge rows sorted by value pair up exactly). Gaps subtract the
    same doubles on both engines (no rounding); ties order
    (gap DESC, lo ASC) over unique lo values. Non-finite and null
    prices are excluded on both engines."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def finite(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({"o_totalprice": pa.array(v[np.isfinite(v)])})

    # near-row-cardinality distinct: the hash-partition aggregate, not
    # Ray's sort aggregate (grouped_agg here measured 9.8 s vs 1-2 s
    # at sf0.1 — the grouped_agg_hash pathology exactly)
    distinct = grouped_agg_hash(
        ds.map_batches(finite, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["o_totalprice"], {}, count_alias="_c") \
        .select_columns(["o_totalprice"]).sort("o_totalprice")

    def local(b: pa.Table) -> pa.Table:
        v = np.sort(b.column("o_totalprice").to_numpy(
            zero_copy_only=False).astype(np.float64))
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64()),
                             "gap": pa.array([], pa.float64()),
                             "edge": pa.array([], pa.int8())})
        gaps = v[1:] - v[:-1]
        # (-gap, lo)-lexsorted so the k kept ties are the SMALLEST-lo
        # ones — exactly the ties the global (gap DESC, lo ASC)
        # merge would pick; a dropped tie therefore can't belong to
        # the global top-k
        top = np.lexsort((v[:-1], -gaps))[:k]
        lo = np.concatenate([v[top], [v[0], v[-1]]])
        hi = np.concatenate([v[top + 1], [v[0], v[-1]]])
        gap = np.concatenate([gaps[top], [np.nan, np.nan]])
        edge = np.concatenate([np.zeros(len(top), np.int8),
                               [1, 2]]).astype(np.int8)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi),
                         "gap": pa.array(gap),
                         "edge": pa.array(edge)})

    parts = distinct.map_batches(local, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas()
    out_empty = pd.DataFrame({"lo": pd.Series([], dtype="float64"),
                              "hi": pd.Series([], dtype="float64"),
                              "gap": pd.Series([], dtype="float64")})
    if parts.empty or "edge" not in parts.columns:
        return out_empty
    internal = parts[parts["edge"] == 0][["lo", "hi", "gap"]]
    firsts = parts[parts["edge"] == 1].sort_values("lo")["lo"] \
        .to_numpy()
    lasts = parts[parts["edge"] == 2].sort_values("lo")["lo"] \
        .to_numpy()
    cross = pd.DataFrame({"lo": lasts[:-1], "hi": firsts[1:]})
    cross["gap"] = cross["hi"] - cross["lo"]
    allg = pd.concat([internal, cross], ignore_index=True)
    allg = allg.sort_values(["gap", "lo"], ascending=[False, True],
                            kind="mergesort").head(k)
    return allg.reset_index(drop=True)


def timed_conversions_events(sf_dir: str, window_h: int = 24):
    """Attribution-window conversions (ORACLED): per user, the number
    of 'purchase' events with at least one 'view' in the trailing
    ``window_h`` hours — the timed sequential join behind every
    attribution / conversion-rate metric (funnel_events answers
    unordered first-touch; this enforces the time constraint). ONE
    user-hash partition: sort (user, ts, event_id), per-user running
    cummax of view timestamps in EXACT int64 µs (a float64 µs would
    lose ~128 µs of precision at 2024 epochs — enough to flip an
    inclusive window compare), conversion = purchase with
    last_view >= ts - W. 'At least one view in window' reduces to
    the LAST view because ts is the sort key: the latest earlier
    view is the max. The SQL EXISTS counts views strictly earlier in
    (ts, event_id) order — the cummax sees exactly those rows (a
    same-ts view with a smaller event_id counts; a later one does
    not). Null rows leave before the scan; output is user-bounded
    (only converting users), typed-empty-pinned."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    w_us = int(window_h) * 3_600_000_000
    sentinel = np.iinfo(np.int64).min

    def conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        us = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        vts = np.where(et == "view", us, sentinel)
        lv = pd.Series(vts).groupby(u, sort=False).cummax() \
            .to_numpy()
        hit = (et == "purchase") & (lv != sentinel) & (lv >= us - w_us)
        agg = pd.Series(hit.astype(np.int64)).groupby(u, sort=True) \
            .sum()
        agg = agg[agg > 0]
        return pd.DataFrame({
            "user_id": agg.index.to_numpy().astype(np.int64),
            "n_conversions": agg.to_numpy().astype(np.int64)})

    out = partitioned_group_apply(pruned, ["user_id"], conv)
    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "n_conversions": pa.array([], pa.int64())})
    return _rd().from_pandas(empty.to_pandas()).union(out)


def basket_brand_pairs(sf_dir: str):
    """Market-basket affinity (ORACLED): for every unordered brand
    pair, the number of orders containing BOTH brands — the
    co-purchase lift table. Brand attaches from ONE broadcast part
    dict (brand_quantity convention); per-batch (order, brand)
    distinct partials prune the shuffle; ONE orderkey-hash partition
    rebuilds each order's sorted distinct brand set and expands the
    k·(k−1)/2 within-order pairs via ranges_concat (k is basket-
    bounded, ≤ order width); the global pair aggregate is
    vocabulary²-bounded. Null orderkeys and orphan partkeys (null
    brand) drop exactly like the SQL inner join."""
    import functools

    import ray

    from ..util import partitioned_group_apply, ranges_concat
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    out_empty = pd.DataFrame({
        "brand_a": pd.Series([], dtype="object"),
        "brand_b": pd.Series([], dtype="object"),
        "n_orders": pd.Series([], dtype="int64")})
    if "p_partkey" not in part.columns:
        return out_empty
    ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])

    def ob_partial(b: pa.Table) -> pa.Table:
        t = _broadcast_lookup_batch(b, ref=ref, key="l_partkey",
                                    out="p_brand")
        t = t.filter(pc.and_(t.column("l_orderkey").is_valid(),
                             t.column("p_brand").is_valid()))
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "p_brand": t.column("p_brand")}) \
            .group_by(["l_orderkey", "p_brand"]).aggregate([])

    partials = li.map_batches(ob_partial, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def pairs(t: pa.Table) -> pa.Table:
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        br = t.column("p_brand").to_numpy(zero_copy_only=False)
        order = np.lexsort((br, o))
        o, br = o[order], br[order]
        first = np.ones(len(o), dtype=bool)
        first[1:] = (o[1:] != o[:-1]) | (br[1:] != br[:-1])
        o, br = o[first], br[first]
        seg = np.ones(len(o), dtype=bool)
        seg[1:] = o[1:] != o[:-1]
        seg_start = np.flatnonzero(seg)
        seg_end = np.append(seg_start[1:], len(o))
        ends = np.repeat(seg_end,
                         seg_end - seg_start)  # row's segment end
        idx = np.arange(len(o))
        lens = ends - idx - 1
        left = np.repeat(idx, lens)
        right = ranges_concat(idx + 1, lens)
        tb = pa.table({"brand_a": pa.array(br[left], pa.string()),
                       "brand_b": pa.array(br[right], pa.string())})
        agg = tb.group_by(["brand_a", "brand_b"]).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["brand_a", "brand_b", "n_p"])

    agg = grouped_agg(
        partitioned_group_apply(partials, ["l_orderkey"], pairs,
                                batch_format="pyarrow"),
        ["brand_a", "brand_b"], {"n_p": "n_orders"},
        count_alias="_c").to_pandas()
    if agg.empty or "brand_a" not in agg.columns:
        return out_empty
    out = agg[["brand_a", "brand_b", "n_orders"]] \
        .sort_values(["brand_a", "brand_b"]).reset_index(drop=True)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def longest_streak_events(sf_dir: str):
    """Longest same-type streak per user (ORACLED): the max-length run
    of consecutive equal event_types in each user's (ts, event_id)-
    ordered timeline, with the run's type and start ts — the
    engagement/obsession statistic the SCD2 run machinery aggregates
    instead of historizes. ONE user-hash partition: change-point run
    detection (scd2 convention: null rows leave BEFORE detection, so
    A, NULL, A stays one run), run lengths via bincount over run ids,
    and the winner is the FIRST longest run in timeline order (ties
    on length resolve to the earliest run — the SQL tiebreak is the
    per-user run ordinal grp, which both engines derive from the same
    (ts, event_id) order). Output is user-bounded, streamed; a typed
    empty block pins the schema."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    _schema = pa.schema([("user_id", pa.int64()),
                         ("streak", pa.int64()),
                         ("event_type", pa.string()),
                         ("start_ts", pa.timestamp("us"))])

    def best(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        if len(u) == 0:
            return _schema.empty_table()
        change = np.ones(len(u), dtype=bool)
        change[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        rid = np.cumsum(change) - 1
        run_user = u[change]
        run_type = et[change]
        run_start = ts[change]
        run_len = np.bincount(rid).astype(np.int64)
        # first-longest per user: runs are already timeline-ordered,
        # so a stable sort on (user, -len) keeps the earliest winner
        order = np.lexsort((np.arange(len(run_len)), -run_len,
                            run_user))
        ru, rl = run_user[order], run_len[order]
        firsts = np.ones(len(ru), dtype=bool)
        firsts[1:] = ru[1:] != ru[:-1]
        sel = order[firsts]
        return pa.Table.from_pandas(
            pd.DataFrame({"user_id": run_user[sel],
                          "streak": run_len[sel],
                          "event_type": run_type[sel],
                          "start_ts": run_start[sel]}),
            schema=_schema, preserve_index=False)

    out = partitioned_group_apply(pruned, ["user_id"], best,
                                  batch_format="pyarrow")
    return _rd().from_arrow(_schema.empty_table()).union(out)


def customers_not_in_error_users(sf_dir: str):
    """NOT IN anti-join with full three-valued semantics (ORACLED):
    customers whose key is NOT IN the user_id set of 'error' events —
    the SQL trap the plain anti-join gets wrong twice: (a) ONE NULL
    in the probe set makes the whole result EMPTY (x NOT IN S is
    never TRUE when S holds a NULL), (b) an EMPTY probe set answers
    every row, INCLUDING null-key rows (vacuous truth), while a
    non-empty probe EXCLUDES null-key rows (NULL NOT IN S is NULL).
    The probe distinct-set is users-bounded (per-batch group_by
    partials with Arrow's null group carrying the null flag); the
    anti join is the size-chosen equi_join with null-key rows dropped
    first (Acero's anti keeps unmatched nulls — the opposite of SQL
    NOT IN)."""
    from ..joins import equi_join
    probe = _read(sf_dir, "events",
                  columns=["user_id", "event_type"])

    def dedup(b: pa.Table) -> pa.Table:
        t = b.filter(pc.fill_null(
            pc.equal(b.column("event_type"), "error"), False))
        return pa.table({"user_id": t.column("user_id")}) \
            .group_by(["user_id"]).aggregate([])

    # users-bounded distinct Dataset — NEVER gathered to the driver;
    # the null flag and emptiness are tiny aggregates over it and the
    # anti join consumes it as the size-chosen equi_join right side
    keys = probe.map_batches(dedup, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=131072) \
        .groupby("user_id").count().materialize()
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    empty = pd.DataFrame({"c_custkey": pd.Series([], dtype="int64"),
                          "c_name": pd.Series([], dtype="object")})
    if keys.count() == 0:
        # empty probe: vacuously TRUE for every row, nulls included
        out = cust.to_pandas()
        if out.empty and "c_custkey" not in out.columns:
            return empty
        return out.sort_values("c_custkey", na_position="last") \
            .reset_index(drop=True)

    def nullrows(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column("user_id"))) \
            .select(["user_id"])

    if keys.map_batches(nullrows, batch_format="pyarrow",
                        zero_copy_batch=True).count() > 0:
        return empty  # a NULL in the probe: nothing is NOT IN

    def dropnull(b: pa.Table) -> pa.Table:
        return b.filter(b.column("c_custkey").is_valid())

    nonnull = cust.map_batches(dropnull, batch_format="pyarrow",
                               zero_copy_batch=True)
    out = equi_join(nonnull, keys.select_columns(["user_id"]),
                    on="c_custkey", right_on="user_id",
                    how="anti").to_pandas()
    if out.empty and "c_custkey" not in out.columns:
        return empty
    return out.sort_values("c_custkey").reset_index(drop=True)


def nation_share_of_region(sf_dir: str):
    """Ratio-to-parent rollup (ORACLED): each nation's supplier-side
    revenue share WITHIN its region — the two-level percent-of-parent
    read every mix dashboard computes. The lineitem scan attaches
    nationkey from ONE broadcast supplier dict (ray.put once, Arrow
    index_in per batch — never a shuffle), partials combine per batch,
    the global aggregate is nation-bounded, and the region share
    divides the unrounded sums driver-side (region grouping is
    vocabulary-sized). revenue rounds at 2dp and share at 6dp via
    duckdb_round AFTER the division — float-sum ulp drift across
    summation orders is absorbed by the rounding grain (the q5/q7
    revenue convention)."""
    import functools

    import ray
    supp = _read(sf_dir, "supplier",
                 columns=["s_suppkey", "s_nationkey"]).to_pandas()
    out_empty = pd.DataFrame({
        "region": pd.Series([], dtype="object"),
        "nation": pd.Series([], dtype="object"),
        "revenue": pd.Series([], dtype="float64"),
        "share": pd.Series([], dtype="float64")})
    if "s_suppkey" not in supp.columns:
        return out_empty  # empty supplier: the inner join is empty
    ref = ray.put(dict(zip(supp["s_suppkey"], supp["s_nationkey"])))
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])

    def amount(b: pa.Table) -> pa.Table:
        t = _broadcast_lookup_batch(b, ref=ref, key="l_suppkey",
                                    out="n_nationkey",
                                    val_type=pa.int64())
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"n_nationkey": t["n_nationkey"], "r": r})

    per_nation = grouped_agg(
        li.map_batches(amount, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["n_nationkey"], {"r": "r"}, count_alias="_c").to_pandas()
    if per_nation.empty or "n_nationkey" not in per_nation.columns:
        return out_empty
    nat = _read(sf_dir, "nation",
                columns=["n_nationkey", "n_name",
                         "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region",
                columns=["r_regionkey", "r_name"]).to_pandas()
    m = per_nation.merge(nat, on="n_nationkey") \
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    tot = m.groupby("n_regionkey")["r"].transform("sum")
    out = pd.DataFrame({
        "region": m["r_name"],
        "nation": m["n_name"],
        "revenue": duckdb_round(m["r"].to_numpy(), 2),
        "share": duckdb_round(m["r"].to_numpy() / tot.to_numpy(), 6)})
    return out.sort_values(["region", "nation"]).reset_index(drop=True)


def rolling_distinct_users_events(sf_dir: str,
                                  event_type: str = "error",
                                  window: int = 3):
    """Sliding-window COUNT DISTINCT (ORACLED): distinct users with an
    ``event_type`` event in the trailing ``window`` days, for every day
    of the dense corpus calendar — the active-user / incident-reach
    series, and the classic hard distributed op (a per-day distinct
    set can't be pre-aggregated). Solved EXACTLY without any per-day
    set: a user active on day a covers window-days [a, a+W-1]; merge
    each user's overlapping coverage intervals inside ONE user-hash
    partition (vectorized run detection over sorted unique day
    ordinals — gap > W breaks a run), emit ±1 sweep deltas at merged
    run bounds, and the answer is the exact int64 prefix sum of the
    calendar-bounded delta aggregate (touching runs may stay split:
    their -1/+1 cancel at the same day; only OVERLAP must merge or a
    user double-counts). Per-batch (user, day) dedup partials bound
    the shuffle at one row per (user, day, batch); the grid hi bound
    rides the deltas as per-partition max-raw-day marker rows
    (delta 0). Null user/ts rows are invisible on both engines."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    pc.equal(b.column("event_type"), event_type))
        t = b.filter(pc.fill_null(m, False))
        day = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        agg = pa.table({"user_id": t.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])
        return agg

    partials = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def deltas(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[first], d[first]
        if len(u) == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "delta": pa.array([], pa.int64()),
                             "marker": pa.array([], pa.int64())})
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > window)
        start_idx = np.flatnonzero(brk)
        end_idx = np.append(start_idx[1:] - 1, len(u) - 1)
        starts = d[start_idx]
        ends = d[end_idx] + window  # exclusive: last active + W
        # the grid hi bound (max RAW active day) rides a separate
        # marker column — netting +1/-1 sums at the same day could
        # otherwise hide a delta-0 marker row
        days = np.concatenate([starts, ends,
                               [int(d.max())]]).astype(np.int64)
        dl = np.concatenate([np.ones(len(starts), np.int64),
                             -np.ones(len(ends), np.int64),
                             [0]])
        mk = np.zeros(len(days), np.int64)
        mk[-1] = 1
        return pa.table({"day": pa.array(days), "delta": pa.array(dl),
                         "marker": pa.array(mk)})

    agg = grouped_agg(
        partitioned_group_apply(partials, ["user_id"], deltas,
                                batch_format="pyarrow"),
        ["day"], {"delta": "delta", "marker": "marker"},
        count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({"day": pd.Series([], dtype="object"),
                              "n_users": pd.Series([], dtype="int64")})
    if agg.empty or "day" not in agg.columns:
        return out_empty
    agg = agg.sort_values("day").reset_index(drop=True)
    pos = agg[agg["delta"] > 0]["day"]
    if pos.empty:
        return out_empty
    lo = int(pos.min())
    hi = int(agg[agg["marker"] > 0]["day"].max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    dl = np.zeros(len(grid), dtype=np.int64)
    inb = agg[(agg["day"] >= lo) & (agg["day"] <= hi)]
    dl[inb["day"].to_numpy() - lo] = inb["delta"].to_numpy()
    n = np.cumsum(dl)
    day_str = (pd.to_datetime(grid, unit="D")
               .strftime("%Y-%m-%d").to_numpy())
    return pd.DataFrame({"day": day_str, "n_users": n})


def benford_totalprice(sf_dir: str):
    """Benford leading-digit screen (ORACLED): the distribution of the
    first significant digit of o_totalprice vs Benford's law — the
    classic fabricated-data / unit-mixing audit a data-quality
    pipeline runs over monetary columns. digit =
    floor(v / pow(10, floor(log10 v))): numpy and DuckDB agree
    BIT-FOR-BIT for v >= 1 (property-checked incl. the nextafter
    knife edges around powers of 10) but diverge one ulp on NEGATIVE
    exponents (np.power(10., -10) is one ulp under DuckDB's 1e-10) —
    so the domain is v >= 1 AND isfinite(v) on BOTH engines (a NaN
    would also poison DuckDB's BIGINT cast: NaN > 0 is TRUE there).
    Per-batch digit counts shuffle ≤ 10 rows each; shares divide
    exact ints in the SQL operand order and round at 6dp."""
    ds = _read(sf_dir, "orders", columns=["o_totalprice"])

    def digits(b: pa.Table) -> pa.Table:
        v = b.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        v = v[np.isfinite(v) & (v >= 1.0)]
        e = np.floor(np.log10(v))
        dig = np.floor(v / np.power(10.0, e)).astype(np.int64)
        t = pa.table({"digit": pa.array(dig)})
        return t.group_by(["digit"]).aggregate([([], "count_all")]) \
            .rename_columns(["digit", "n_p"])

    agg = grouped_agg(
        ds.map_batches(digits, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["digit"], {"n_p": "n"}, count_alias="_c").to_pandas()
    if agg.empty or "digit" not in agg.columns:
        return pd.DataFrame({
            "digit": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "obs_share": pd.Series([], dtype="float64"),
            "benford_share": pd.Series([], dtype="float64")})
    agg = agg.sort_values("digit").reset_index(drop=True)
    n = agg["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    dig = agg["digit"].to_numpy().astype(np.float64)
    # digit 0 is REACHABLE on knife edges (log10(nextafter(1000,0))
    # rounds to exactly 3.0 → v/1000 < 1) and both engines agree on
    # the digit — but 1.0/0 diverges (np inf vs DuckDB NaN), so
    # benford_share is defined only on 1..9 (NULL elsewhere)
    with np.errstate(divide="ignore"):
        bs = duckdb_round(np.log10(1.0 + 1.0 / dig), 6)
    bs = np.where((dig >= 1) & (dig <= 9), bs, np.nan)
    return pd.DataFrame({
        "digit": agg["digit"].astype("int64"),
        "n": n,
        "obs_share": duckdb_round(n.astype(np.float64) / total, 6),
        "benford_share": bs})


def transition_timing_events(sf_dir: str):
    """Markov transition TIMING (ORACLED): for every adjacent
    (prev_type → cur_type) pair in each user's (ts, event_id)-ordered
    timeline, the pair count and average gap in seconds — the dwell
    time that turns transitions_event_types' counts into a rate
    model. Same ONE user-hash partition; per-partition partials group
    (prev, cur) over EXACT int64 µs gap sums (timestamps subtract as
    int64 views), the global aggregate is vocabulary²-bounded, and
    the average divides exact ints in the SQL operand order
    (CAST(sum AS DOUBLE) / n / 1e6) before the 6dp round. Null
    user/ts/type rows leave the timeline BEFORE pairing (transitions
    convention); same-ts ties order by event_id, a zero gap is
    legitimate."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    b.column("event_type").is_valid())
        return b.filter(m)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
        g = df.groupby("user_id", sort=False)
        prev_t = g["event_type"].shift(1)
        prev_ts = g["ts"].shift(1)
        keep = prev_t.notna().to_numpy()
        # explicit µs view — unit-safe whatever pandas datetime64
        # resolution the roundtrip picked
        cur_us = df["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        prev_us = prev_ts.to_numpy().astype("datetime64[us]") \
            .astype(np.int64)
        gap = (cur_us - prev_us)[keep]
        sub = pa.table({
            "prev_type": pa.array(prev_t.to_numpy()[keep], pa.string()),
            "cur_type": pa.array(df["event_type"].to_numpy()[keep],
                                 pa.string()),
            "gap_us": pa.array(gap, pa.int64())})
        agg = sub.group_by(["prev_type", "cur_type"]).aggregate(
            [("gap_us", "sum"), ([], "count_all")])
        return agg.rename_columns(["prev_type", "cur_type",
                                   "gap_p", "n_p"])

    agg = grouped_agg(
        partitioned_group_apply(pruned, ["user_id"], pairs,
                                batch_format="pyarrow"),
        ["prev_type", "cur_type"], {"gap_p": "gap_us", "n_p": "n"},
        count_alias="_c").to_pandas()
    if agg.empty or "prev_type" not in agg.columns:
        return pd.DataFrame({
            "prev_type": pd.Series([], dtype="object"),
            "cur_type": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "avg_gap_s": pd.Series([], dtype="float64")})
    agg = agg.sort_values(["prev_type", "cur_type"]) \
        .reset_index(drop=True)
    n = agg["n"].to_numpy().astype(np.int64)
    gap = agg["gap_us"].to_numpy().astype(np.float64)
    return pd.DataFrame({
        "prev_type": agg["prev_type"],
        "cur_type": agg["cur_type"],
        "n": n,
        "avg_gap_s": duckdb_round(gap / n / 1000000.0, 6)})


def gini_daily_events(sf_dir: str):
    """Daily-volume inequality (ORACLED): the Gini coefficient of each
    type's daily event counts over the SAME dense zero-filled corpus
    calendar grid as daily_counts_ma/autocorr — the burstiness /
    concentration statistic a capacity or data-mixing pipeline reads
    (0 = perfectly even ingestion, →1 = all volume on one day).
    Computed from the sorted-count identity
    G = 2·Σ i·x_(i) / (n·Σx) − (n+1)/n: every moment is an EXACT
    small integer in int64 (counts × calendar ranks), tied counts are
    rank-sum-invariant (consecutive ranks × the same value), so both
    engines evaluate the same rationals in the same operand order and
    the 6dp duckdb_round is summation-order-free. The corpus scan
    distributes (_dense_daily_counts partials); the finish is
    vocabulary×calendar-bounded driver work. All-zero-sum series are
    impossible (an observed type has ≥1 event on the grid)."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_days": pd.Series([], dtype="int64"),
        "gini": pd.Series([], dtype="float64")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        x = np.sort(g["n"].to_numpy())
        nd = len(x)
        s = int(x.sum())
        srn = int((np.arange(1, nd + 1, dtype=np.int64) * x).sum())
        gini = float(duckdb_round(
            (2.0 * srn) / (nd * s) - (nd + 1.0) / nd, 6))
        rows.append({"event_type": t, "n_days": nd, "gini": gini})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["gini"] = out["gini"].astype("float64")
    return out


def cusum_daily_events(sf_dir: str):
    """CUSUM change-point statistic per event type (ORACLED): the max
    absolute deviation of each type's cumulative daily count from the
    uniform-rate line, plus the EARLIEST day attaining it — the
    classic change-point locator a drift monitor runs on ingestion
    volume (reference semantics: checks/drift.go's distribution-shift
    family, here as a path statistic). Fifth consumer of the shared
    _dense_daily_counts grid: a calendar gap IS a rate change and
    must zero-fill. The deviation is computed in EXACT int64 as
    |n_days·cumsum_k − k·total| (one multiply keeps every compare
    integral; bound calendar_days × corpus_rows < 2^63 at any real
    scale), divided by n_days only at the very end as ONE double
    divide in the same operand order as the SQL, then duckdb_round
    6dp. Ties on the max deviation resolve to the earliest day on
    both engines (np.argmax first-hit == SQL min(d)); a constant or
    single-day series answers EXACTLY 0.0 with the first grid day.
    The corpus scan distributes (per-batch (type, day) partials);
    the finish is calendar×vocabulary-bounded driver work."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "cusum": pd.Series([], dtype="float64"),
        "change_day": pd.Series([], dtype="object")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        n = g["n"].to_numpy().astype(np.int64)
        nn = len(n)
        tot = int(n.sum())
        s = np.cumsum(n)
        k = np.arange(1, nn + 1, dtype=np.int64)
        num = np.abs(nn * s - k * tot)
        mx = int(num.max())
        day = g["day"].to_numpy()[int(np.argmax(num))]
        rows.append({"event_type": t,
                     "cusum": float(duckdb_round(float(mx) / float(nn), 6)),
                     "change_day": day})
    out = pd.DataFrame(rows)
    out["cusum"] = out["cusum"].astype("float64")
    return out


def rolling_median_daily_events(sf_dir: str):
    """7-day trailing MEDIAN of the daily count series per type
    (ORACLED): the robust trend line (order statistic — immune to the
    single-day spikes that drag daily_counts_ma's mean), over the SAME
    dense zero-filled calendar grid; sixth consumer of
    _dense_daily_counts. The window is ROWS 6 PRECEDING..CURRENT with
    a ramp at the series start (min_periods=1 == SQL's shrinking
    frame); both engines interpolate the even-count middle as
    (a+b)/2, exact in float64 for integer counts, so the 6dp round is
    a no-op kept for convention. The corpus scan distributes; the
    rolling finish is calendar×vocabulary-bounded driver work."""
    f = _dense_daily_counts(sf_dir)
    if f is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype="object"),
                             "day": pd.Series([], dtype="object"),
                             "n": pd.Series([], dtype="int64"),
                             "med7": pd.Series([], dtype="float64")})
    f["med7"] = np.round(
        f.groupby("event_type", sort=False)["n"]
        .transform(lambda s: s.rolling(7, min_periods=1).median())
        .astype("float64"), 6)
    return f[["event_type", "day", "n", "med7"]]


def bigram_logprob_documents(sf_dir: str):
    """Per-doc mean ADD-ONE-SMOOTHED bigram conditional log-probability
    under the corpus's own bigram LM (ORACLED) — the perplexity-style
    fluency filter (KenLM-analog without external weights): fluent text
    reuses frequent transitions, word salad doesn't. Whitespace tokens,
    lead()-then-filter pairing (a doubled space BREAKS adjacency), libm
    ln and floor basis points on both engines — the unigram_logprob /
    tfidf convention, extended to the conditional model. See
    text.transform.bigram_logprob for the shuffle story (token stream
    never shuffles; the pair vocabulary materializes ONCE and feeds
    context counts, the V distinct-successor count and the scoring
    join)."""
    from ..text.transform import bigram_logprob
    return bigram_logprob(_read(sf_dir, "documents",
                                columns=["doc_id", "text"]))


def mode_quantity_by_flag(sf_dir: str):
    """Per-returnflag MODE of l_quantity (ORACLED): the most frequent
    value, ties resolved to the SMALLEST value — the modal aggregate
    (SQL mode() is nondeterministic on ties; this is the
    deterministic argmax-with-min-tiebreak form a reporting layer
    needs). ONE combiner groupby over the (flag, quantity) key space
    — flag vocabulary × ~50 distinct quantities, so the shuffle is
    key-bounded regardless of corpus size — then a key-space-bounded
    driver argmax. Null quantities are excluded on both engines; a
    NULL flag is its own group and SURVIVES the argmax join (SQL
    IS NOT DISTINCT FROM — pinned; a plain equi-join would silently
    drop it)."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_quantity"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("l_quantity").is_valid())
        return pa.table({"flag": t.column("l_returnflag"),
                         "q": t.column("l_quantity")})

    agg = grouped_agg(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["flag", "q"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "flag": pd.Series([], dtype="object"),
        "mode_q": pd.Series([], dtype="float64"),
        "n": pd.Series([], dtype="int64")})
    if agg.empty or "flag" not in agg.columns:
        return out_empty
    # argmax with (n desc, q asc) total order: one stable sort, first
    # row per flag — the SQL join-on-max + min(q) tie resolution
    agg = agg.sort_values(["flag", "n", "q"],
                          ascending=[True, False, True],
                          na_position="last", kind="mergesort")
    out = agg.groupby("flag", dropna=False, sort=True).head(1) \
        .reset_index(drop=True)
    out = out.rename(columns={"q": "mode_q"})
    out["mode_q"] = out["mode_q"].astype("float64")
    out["n"] = out["n"].astype("int64")
    return out[["flag", "mode_q", "n"]].reset_index(drop=True)


def spend_deciles_customers(sf_dir: str, k: int = 10):
    """Customer spend deciles (ORACLED against NTILE(10)): per-customer
    total spend in EXACT CENTS, bucketed into k equal-frequency bands
    with SQL NTILE's uneven-split rule (the first n%k buckets take the
    extra row) over the deterministic total order (spend, custkey) —
    the distribution table behind tiering/LTV reports, and the
    DISTRIBUTED GLOBAL-RANK pattern: per-customer combiner sums
    (custkey-bounded shuffle, hash aggregate — near-table-cardinality
    keys) → Ray range sort on (spend, c) → ONE batches-bounded
    (first-key, count) block-summary gather → driver prefix-sums block
    offsets → a second block-aligned pass (batch_size=None on the SAME
    materialized sorted dataset — batches ARE blocks, both passes) maps
    each row's global 0-based position to its NTILE bucket and emits
    <= k partial rows per block. No row-level data ever reaches the
    driver; the finish is (blocks x k)-bounded.

    Spend sums CENTS as int64 — sum(CAST(price*100 AS BIGINT)) per
    ORDER on both engines — so the sort key is exact and no float
    summation order can reorder two customers across a decile
    boundary (the 0.29*100 = 28.999… trap: both engines round the
    SAME double to the SAME 29). Null custkeys and null prices are
    excluded on both engines; a customer with only null-price orders
    is ABSENT (no countable rows), ties order by custkey."""
    import ray as _ray

    from ..util import worker_cached
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    spend = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], {"cents": "spend"}, count_alias="_c") \
        .select_columns(["c", "spend"]) \
        .sort(["spend", "c"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"s0": pa.array([], pa.int64()),
                             "c0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"s0": pa.array([b["spend"][0].as_py()]),
                         "c0": pa.array([b["c"][0].as_py()]),
                         "cnt": pa.array([b.num_rows])})

    out_empty = pd.DataFrame({
        "decile": pd.Series([], dtype="int64"),
        "n_cust": pd.Series([], dtype="int64"),
        "lo_cents": pd.Series([], dtype="int64"),
        "hi_cents": pd.Series([], dtype="int64")})
    summ = spend.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "s0" not in summ.columns:
        return out_empty
    # blocks are disjoint ordered ranges of the UNIQUE (spend, c) key:
    # sorting the summaries by first key orders the blocks
    summ = summ.sort_values(["s0", "c0"]).reset_index(drop=True)
    n = int(summ["cnt"].sum())
    offs = np.concatenate(([0], summ["cnt"].cumsum().to_numpy()[:-1]))
    lut = {(int(s), int(c)): int(o)
           for s, c, o in zip(summ["s0"], summ["c0"], offs)}
    size, rem = divmod(n, k)
    ref = _ray.put(lut)

    def bucketize(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "lo": pa.array([], pa.int64()),
                          "hi": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        table = worker_cached(("ntile_offs", ref.hex()),
                              lambda: _ray.get(ref))
        s = b["spend"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        pos = table[(int(s[0]), int(c[0]))] + np.arange(b.num_rows)
        # SQL NTILE: the first rem buckets take size+1 rows
        cut = rem * (size + 1)
        dec = np.where(pos < cut,
                       pos // max(size + 1, 1),
                       rem + (pos - cut) // max(size, 1)) + 1
        t = pa.table({"decile": pa.array(dec.astype(np.int64)),
                      "s1": pa.array(s), "s2": pa.array(s)})
        g = t.group_by(["decile"]).aggregate(
            [([], "count_all"), ("s1", "min"), ("s2", "max")])
        # select by NAME: pyarrow group_by key/aggregate column order
        # differs across versions
        g = g.select(["decile", "count_all", "s1_min", "s2_max"])
        return g.rename_columns(["decile", "n_part", "lo", "hi"])

    parts = spend.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).to_pandas()
    if parts.empty or "decile" not in parts.columns:
        return out_empty
    out = parts.groupby("decile", sort=True).agg(
        n_cust=("n_part", "sum"), lo_cents=("lo", "min"),
        hi_cents=("hi", "max")).reset_index()
    for col in ("decile", "n_cust", "lo_cents", "hi_cents"):
        out[col] = out[col].astype("int64")
    return out


def hhi_sources_by_lang(sf_dir: str):
    """Herfindahl-Hirschman concentration of sources per language
    (ORACLED): hhi = sum over sources of (share of the lang's docs)^2
    — the market-concentration index a curation pipeline reads to
    catch a language silently dominated by one crawl source (the
    drift/imbalance family of the reference's distribution checks,
    checks/drift.go semantics, here as a composition diagnostic).
    The corpus scan distributes (grouped_agg per-batch partials on the
    lang x source key — vocabulary-bounded shuffle); the finish is
    vocabulary-bounded driver work in PYTHON INTS: the numerator
    sum(n_s^2) overflows int64 once any source holds > 3e9 docs, so
    the exact integers live in arbitrary precision (the SQL side sums
    HUGEINT) and ONE double divide at the end matches the SQL operand
    order, round 6dp. A null source is EXCLUDED on both engines (it is
    no source); a null lang is its own GROUP BY group and sorts last
    (pandas sort=True NaN-last == DuckDB ORDER BY NULLS LAST). A lang
    with a single source answers exactly 1.0; k equal sources answer
    exactly 1/k when k divides the count evenly."""
    ds = _read(sf_dir, "documents", columns=["lang", "source"])

    def clean(b: pa.Table) -> pa.Table:
        return b.filter(b.column("source").is_valid())

    agg = grouped_agg(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["lang", "source"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "lang": pd.Series([], dtype="object"),
        "n_docs": pd.Series([], dtype="int64"),
        "n_sources": pd.Series([], dtype="int64"),
        "hhi": pd.Series([], dtype="float64")})
    if agg.empty or "lang" not in agg.columns:
        return out_empty
    rows = []
    for lang, g in agg.groupby("lang", dropna=False, sort=True):
        ns = [int(v) for v in g["n"]]
        total = sum(ns)
        num = sum(v * v for v in ns)  # exact at any scale
        rows.append({
            "lang": None if pd.isna(lang) else lang,
            "n_docs": total, "n_sources": len(ns),
            "hhi": float(duckdb_round(
                float(num) / float(total * total), 6))})
    out = pd.DataFrame(rows)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_sources"] = out["n_sources"].astype("int64")
    out["hhi"] = out["hhi"].astype("float64")
    return out


def fano_daily_events(sf_dir: str):
    """Fano factor (index of dispersion) of each type's daily count
    series (ORACLED): population variance / mean over the shared dense
    zero-filled calendar grid — the burstiness statistic (Poisson
    arrivals sit at 1; bursty traffic far above; a metronome near 0);
    seventh consumer of _dense_daily_counts, and a calendar gap IS
    dispersion so the grid must zero-fill (pinned). Kept exact as
    integers end-to-end: fano = (m*sum(x^2) - (sum x)^2) / (m*sum x)
    with PYTHON-INT sums (daily counts squared overflow int64 once a
    day holds > 3e9 events; the SQL side sums HUGEINT), then ONE
    double divide in the SQL operand order, round 6dp. A constant
    series answers exactly 0.0, as does a single-day grid (m=1 makes
    the numerator identically zero); the mean is never 0 because an
    observed type has >= 1 event. Null ts / null type rows are
    invisible on both engines."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_days": pd.Series([], dtype="int64"),
        "fano": pd.Series([], dtype="float64")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        ns = [int(v) for v in g["n"]]
        m = len(ns)
        sx = sum(ns)
        sxx = sum(v * v for v in ns)
        rows.append({
            "event_type": t, "n_days": m,
            "fano": float(duckdb_round(
                float(m * sxx - sx * sx) / float(m * sx), 6))})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["fano"] = out["fano"].astype("float64")
    return out


def dup_cluster_sizes_documents(sf_dir: str):
    """Histogram of exact-duplicate cluster sizes (ORACLED): group docs
    by full 128-bit MD5 of the text, then count clusters per size —
    the dedup DIAGNOSTIC table (how much of the corpus is singletons
    vs. template spam; the reference's duplicate-detection family,
    checks/uniqueness.go semantics, read as a distribution instead of
    a verdict). Two-level aggregation, nothing corpus-sized ever
    gathers: per-batch md5 partials -> grouped_agg_hash on the
    (h1, h2) digest halves (near-corpus-cardinality keys — the PAIR
    aggregate shape, so the hash-partition variant, one narrow row
    per distinct text on the wire) -> grouped_agg on the cluster SIZE
    (size-vocabulary-bounded second shuffle) -> size-bounded driver
    finish. MD5 follows the md5lsh convention (the one DuckDB-
    reproducible hash; hashlib per row with the digest buffer
    vectorized via frombuffer — same cost class as the oracled
    md5-LSH family, and 128 bits make collisions vs the SQL's
    GROUP BY md5(text) physically negligible). Null texts are
    EXCLUDED on both engines; clustering is pure content (the same
    text under different doc_id/lang/source merges — pinned)."""
    import hashlib
    ds = _read(sf_dir, "documents", columns=["text"])

    def digest(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        if t.num_rows == 0:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64())})
        buf = b"".join(
            hashlib.md5(s.encode("utf-8")).digest()
            for s in t.column("text").to_pylist())
        h = np.frombuffer(buf, dtype="<i8").reshape(-1, 2)
        return pa.table({"h1": pa.array(h[:, 0]),
                         "h2": pa.array(h[:, 1])})

    clusters = grouped_agg_hash(
        ds.map_batches(digest, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["h1", "h2"], {}, count_alias="size")
    hist = grouped_agg(clusters.select_columns(["size"]),
                       ["size"], {}, count_alias="n_clusters").to_pandas()
    out_empty = pd.DataFrame({
        "size": pd.Series([], dtype="int64"),
        "n_clusters": pd.Series([], dtype="int64")})
    if hist.empty or "size" not in hist.columns:
        return out_empty
    out = hist.sort_values("size").reset_index(drop=True)
    out["size"] = out["size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out[["size", "n_clusters"]]


def spearman_quantity_discount(sf_dir: str):
    """Spearman rank correlation between l_quantity and l_discount
    (ORACLED) — the monotone-association statistic (Pearson on
    tie-AVERAGED fractional ranks), the robust screen for "does
    discount rise with quantity" that ignores the marginal shapes.
    Both columns are LOW-CARDINALITY numerics (~50 x 11 values), so
    the whole problem reduces to the (q, d) CONTINGENCY TABLE: one
    vocabulary-bounded grouped_agg shuffle, then a cells-bounded
    driver finish — for continuous columns the distributed
    global-rank primitive (spend_deciles_customers) would replace the
    marginal rank derivation; this query pins the contingency form.

    Exactness: with integer weights the tie-averaged rank of value v
    is (2*cum_below + n_v + 1)/2 — kept DOUBLED as an exact integer,
    and the factor cancels in rho. Every moment (n, Sx, Sy, Sxx, Syy,
    Sxy over w*rx*ry) is an exact PYTHON INT (SQL: HUGEINT; bound
    4*N^3 < 1.7e38 holds to N ~ 3.5e12 rows), so no float summation
    order exists. The single float step is the final
    num / (sqrt(dx) * sqrt(dy)) in pinned operand order — and the
    SQL converts each integer through CAST(... AS VARCHAR) AS DOUBLE
    because DuckDB's direct HUGEINT->DOUBLE cast DOUBLE-ROUNDS
    (upper*2^64 + lower; measured 502/30000 off-by-ulp at 70 bits)
    while the string route is a correctly-rounded strtod == Python's
    float(int) (property-tested on 72k adversarial ints). Null and
    non-finite values are excluded on both engines; zero variance on
    either side (a single distinct value) answers SQL-NULL; an empty
    cleaned corpus answers the (0, 0, 0, NULL) aggregate row."""
    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_discount"])

    def clean(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(b.column("l_quantity").is_valid(),
                    b.column("l_discount").is_valid()),
            pc.and_(pc.is_finite(b.column("l_quantity")),
                    pc.is_finite(b.column("l_discount"))))
        t = b.filter(m)
        return pa.table({"q": t.column("l_quantity"),
                         "d": t.column("l_discount")})

    cells = grouped_agg(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["q", "d"], {}, count_alias="w").to_pandas()

    def one(n_rows, n_q, n_d, rho):
        out = pd.DataFrame({"n_rows": [n_rows], "n_q": [n_q],
                            "n_d": [n_d], "rho": [rho]})
        out["n_rows"] = out["n_rows"].astype("int64")
        out["n_q"] = out["n_q"].astype("int64")
        out["n_d"] = out["n_d"].astype("int64")
        out["rho"] = out["rho"].astype("float64")
        return out

    if cells.empty or "q" not in cells.columns:
        return one(0, 0, 0, None)

    def doubled_ranks(keys, weights):
        """value -> 2*avgrank as an exact Python int, ascending order."""
        order = np.argsort(keys, kind="mergesort")
        out, below = {}, 0
        for i in order:
            nv = int(weights[i])
            out[keys[i]] = 2 * below + nv + 1
            below += nv
        return out

    qv = cells["q"].to_numpy()
    dv = cells["d"].to_numpy()
    wv = cells["w"].to_numpy()
    mq, md = {}, {}
    for q, w in zip(qv, wv):
        mq[q] = mq.get(q, 0) + int(w)
    for d, w in zip(dv, wv):
        md[d] = md.get(d, 0) + int(w)
    rx_of = doubled_ranks(np.array(list(mq.keys())),
                          np.array(list(mq.values()), dtype=object))
    ry_of = doubled_ranks(np.array(list(md.keys())),
                          np.array(list(md.values()), dtype=object))
    n = sx = sy = sxx = syy = sxy = 0
    for q, d, w in zip(qv, dv, wv):  # cells-bounded, exact ints
        w = int(w)
        rx, ry = rx_of[q], ry_of[d]
        n += w
        sx += w * rx
        sy += w * ry
        sxx += w * rx * rx
        syy += w * ry * ry
        sxy += w * rx * ry
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    rho = (float(duckdb_round(
        float(num) / (math.sqrt(float(dx)) * math.sqrt(float(dy))), 6))
        if dx > 0 and dy > 0 else None)
    return one(n, len(mq), len(md), rho)


def kendall_tau_daily_events(sf_dir: str):
    """Kendall tau-b between every PAIR of event types' daily count
    series (ORACLED): the rank-concordance matrix over the shared
    dense zero-filled calendar grid — "do these two signals move
    together day-over-day", robust to the marginal shapes and, unlike
    the Pearson autocorr/corr family, to any monotone rescaling;
    eighth consumer of _dense_daily_counts (a calendar gap IS signal
    on both sides and must zero-fill — pinned). The corpus scan
    distributes (per-batch (type, day) partials); the finish is
    driver work bounded by calendar^2 x vocabulary-pairs: S =
    sum over day pairs a<b of sign(x_a-x_b)*sign(y_a-y_b) runs as
    CHUNKED numpy outer comparisons (256-row strips — no m^2
    temporary), exact in int64 (|S| <= m^2 < 2^53 for any calendar
    under 260k years, so the SQL's direct CAST to DOUBLE is exact),
    tie counts from np.unique value counts. tau-b = S /
    (sqrt(n0-tx) * sqrt(n0-ty)) with ONE float step in SQL operand
    order, round 6dp. A constant side makes the denominator zero and
    answers SQL-NULL; a single-day grid or a single observed type
    answers NO rows (the SQL self-join over d < d' is empty)."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "t1": pd.Series([], dtype="object"),
        "t2": pd.Series([], dtype="object"),
        "n_pairs": pd.Series([], dtype="int64"),
        "s": pd.Series([], dtype="int64"),
        "tau": pd.Series([], dtype="float64")})
    if f is None:
        return out_empty
    series = {t: g["n"].to_numpy().astype(np.int64)
              for t, g in f.groupby("event_type", sort=True)}
    types = sorted(series)
    m = len(next(iter(series.values()))) if series else 0
    if m < 2 or len(types) < 2:
        return out_empty
    n0 = m * (m - 1) // 2
    rows = []
    for i, t1 in enumerate(types):
        for t2 in types[i + 1:]:
            x, y = series[t1], series[t2]
            s_val = 0
            for st in range(0, m, 256):  # strip-chunked outer compare
                xa = x[st:st + 256, None]
                ya = y[st:st + 256, None]
                later = (np.arange(m)[None, :]
                         > (st + np.arange(len(xa)))[:, None])
                s_val += int((np.sign(xa - x[None, :])
                              * np.sign(ya - y[None, :]))[later].sum())
            tx = sum(int(c) * (int(c) - 1) // 2
                     for c in np.unique(x, return_counts=True)[1])
            ty = sum(int(c) * (int(c) - 1) // 2
                     for c in np.unique(y, return_counts=True)[1])
            tau = (float(duckdb_round(
                float(s_val) / (math.sqrt(float(n0 - tx))
                                * math.sqrt(float(n0 - ty))), 6))
                if n0 > tx and n0 > ty else None)
            rows.append({"t1": t1, "t2": t2, "n_pairs": n0,
                         "s": s_val, "tau": tau})
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["s"] = out["s"].astype("int64")
    out["tau"] = out["tau"].astype("float64")
    return out


def auc_value_error_events(sf_dir: str):
    """ROC AUC of `value` as a score for event_type == 'error'
    (ORACLED): the Mann-Whitney statistic — P(score_pos > score_neg)
    + 0.5*P(=) — the standard quality gate for any scorer/classifier
    column, here read directly off the corpus with NO row-level
    gather. Scores quantize to CENTS (np.rint(v*100) == the SQL
    CAST(value*100 AS BIGINT), the spend_deciles-pinned recipe) so
    the group key is exact int64; a NULL event_type is a NEGATIVE
    ("not error" — IS NOT DISTINCT FROM in SQL, pinned), null or
    non-finite values are excluded on both engines.

    Distributed-rank shape (the spend_deciles primitive, extended to
    an EXACT BIG-INT reduction): per-value (cents, n_pos, n_total)
    via grouped_agg_hash (value-range-bounded keys) -> Ray range sort
    on the unique cents key -> ONE batches-bounded pass over the
    materialized sorted dataset emitting per BLOCK (first key, pos
    sum, neg sum, and the two WITHIN-BLOCK products as decimal
    strings): w = sum(n_pos_v * cumneg_strictly_below_within) and
    t = sum(n_pos_v * n_neg_v). Those products overflow int64 once
    n_pos*n_neg crosses 9.2e18 (a 6e9-row balanced corpus), so the
    in-block dot products run on OBJECT-dtype arrays — arbitrary-
    precision Python ints under a C-level loop, block-bounded, never
    corpus-proportional on the driver — and ship as strings (Arrow
    has no int128 column). The driver orders blocks by first key,
    prefix-sums block negatives into offsets, and combines 2U =
    sum_b(2*(offset_b*pos_b + w_b) + t_b) in Python ints: exact at
    ANY scale. AUC = 2U / (2*P*N) — one float divide; the SQL
    converts both HUGEINT operands through the VARCHAR route
    (correctly-rounded strtod == Python float(int); the direct
    HUGEINT->DOUBLE cast double-rounds — see
    spearman_quantity_discount). u2 itself is returned as a decimal
    string for an exact value pin. Zero positives or zero negatives
    answer SQL-NULL AUC with the counts still reported; an empty
    cleaned corpus answers the (0, 0, '0', NULL) aggregate row."""
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def clean(b: pa.Table) -> pa.Table:
        v = b.column("value")
        t = b.filter(pc.and_(v.is_valid(), pc.is_finite(v)))
        vv = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pos = pc.fill_null(
            pc.equal(t.column("event_type"), "error"), False)
        return pa.table({
            "cents": pa.array(np.rint(vv * 100.0).astype(np.int64)),
            "pos": pc.cast(pos, pa.int64())})

    g = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["cents"], {"pos": "np"}, count_alias="ntot") \
        .select_columns(["cents", "np", "ntot"]) \
        .sort("cents").materialize()

    def block_reduce(b: pa.Table) -> pa.Table:
        empty = pa.table({"c0": pa.array([], pa.int64()),
                          "bp": pa.array([], pa.int64()),
                          "bn": pa.array([], pa.int64()),
                          "w": pa.array([], pa.string()),
                          "t": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        npos = b.column("np").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        neg = b.column("ntot").to_numpy(zero_copy_only=False) \
            .astype(np.int64) - npos
        cum = np.concatenate(([0], np.cumsum(neg)[:-1]))
        po = npos.astype(object)
        w = int((po * cum.astype(object)).sum())
        t = int((po * neg.astype(object)).sum())
        return pa.table({
            "c0": pa.array([int(b.column("cents")[0].as_py())]),
            "bp": pa.array([int(npos.sum())]),
            "bn": pa.array([int(neg.sum())]),
            "w": pa.array([str(w)]), "t": pa.array([str(t)])})

    parts = g.map_batches(block_reduce, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=None).to_pandas()

    def one(n_pos, n_neg, u2, auc):
        out = pd.DataFrame({"n_pos": [n_pos], "n_neg": [n_neg],
                            "u2": [u2], "auc": [auc]})
        out["n_pos"] = out["n_pos"].astype("int64")
        out["n_neg"] = out["n_neg"].astype("int64")
        out["u2"] = out["u2"].astype("object")
        out["auc"] = out["auc"].astype("float64")
        return out

    if parts.empty or "c0" not in parts.columns:
        return one(0, 0, "0", None)
    parts = parts.sort_values("c0").reset_index(drop=True)
    u2 = 0
    off = 0  # negatives strictly below the current block
    for bp, bn, w, t in zip(parts["bp"], parts["bn"],
                            parts["w"], parts["t"]):
        u2 += 2 * (off * int(bp) + int(w)) + int(t)
        off += int(bn)
    p = int(parts["bp"].sum())
    n = int(parts["bn"].sum())
    auc = (float(duckdb_round(float(u2) / float(2 * p * n), 6))
           if p > 0 and n > 0 else None)
    return one(p, n, str(u2), auc)


def rrf_fusion_embeddings(sf_dir: str, k_each: int = 20,
                          k_out: int = 10, rrf_k: int = 60):
    """Reciprocal-rank fusion of two exact ANN rankings (ORACLED) —
    the standard zero-tuning way to combine retrievers (hybrid
    search / multi-query recall): each corpus vector scores
    rrf = sum over the two query lists it appears in of
    1/(rrf_k + rank), and the fused top-k_out answers. Ranks come
    from the SAME distributed exact-cosine scorer as
    ann_topk_embeddings (per-batch Q@V^T partial top-k, only
    queries x k_each candidate rows ever gather — the corpus never
    does), each list cut at k_each with the deterministic
    (score desc, vec_id asc) order. Float discipline: the fusion sum
    has AT MOST TWO terms and IEEE addition of two doubles is
    commutative, so the SQL SUM's unspecified order cannot diverge —
    this query is pinned to exactly TWO query lists for that reason
    (three lists would need an ordered fold); each term
    1.0/(rrf_k + rank) is the identical double on both engines, the
    fused ranking compares those exact doubles with the vec_id
    tiebreak, and only the REPORTED rrf rounds (6dp). A vector
    outside both top-k_each lists contributes nothing and cannot
    appear; a vector in one list carries its single term. A corpus
    with a single vector degrades to a one-list fusion (still
    order-free); an empty corpus answers no rows."""
    from ..ann import brute_force_topk
    vecs, ids = _query_vectors(sf_dir, n=2)
    out_empty = pd.DataFrame({
        "vec_id": pd.Series([], dtype="int64"),
        "rrf": pd.Series([], dtype="float64"),
        "n_lists": pd.Series([], dtype="int64"),
        "best_rank": pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int64")})
    if len(vecs) == 0:
        return out_empty
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = brute_force_topk(ds, vecs, query_ids=ids, k=k_each)
    if base.empty:
        return out_empty
    base = base.copy()
    base["contrib"] = 1.0 / (rrf_k + base["rank"].to_numpy())
    fused = base.groupby("vec_id", sort=False).agg(
        rrf=("contrib", "sum"), n_lists=("contrib", "size"),
        best_rank=("rank", "min")).reset_index()
    fused = fused.sort_values(["rrf", "vec_id"],
                              ascending=[False, True],
                              kind="mergesort").head(k_out) \
        .reset_index(drop=True)
    fused["rank"] = np.arange(1, len(fused) + 1, dtype=np.int64)
    fused["rrf"] = duckdb_round(fused["rrf"].to_numpy(), 6)
    fused["vec_id"] = fused["vec_id"].astype("int64")
    fused["n_lists"] = fused["n_lists"].astype("int64")
    fused["best_rank"] = fused["best_rank"].astype("int64")
    fused["rrf"] = fused["rrf"].astype("float64")
    return fused[["vec_id", "rrf", "n_lists", "best_rank", "rank"]]


def calibration_value_error_events(sf_dir: str, k: int = 10):
    """Calibration table of `value` scoring event_type == 'error'
    (ORACLED): rows sort by score and split into k equal-frequency
    NTILE buckets; each bucket reports its size, positive count,
    realized positive RATE and mean score — read next to
    auc_value_error_events it answers "is the scorer calibrated, and
    where does it separate". Composes three pinned primitives:
    the spend_deciles distributed NTILE (Ray range sort on a
    deterministic total order -> ONE batches-bounded block-summary
    gather -> driver prefix offsets -> a second block-aligned pass
    emitting <= k partial rows per block), the cents quantization
    (np.rint(v*100) == CAST(value*100 AS BIGINT)), and the AUC
    big-int discipline (per-decile cents sums ship as DECIMAL
    STRINGS; sum(cents) can pass 2^53 where DuckDB's direct
    HUGEINT->DOUBLE cast double-rounds, so the SQL takes the VARCHAR
    route for mean_cents). The total order is (cents, event_id, pos):
    event_id disambiguates equal scores, and pos breaks the remaining
    tie so two rows sharing (cents, event_id) but differing in class
    land DETERMINISTICALLY around a bucket boundary on both engines
    (pinned — without it the per-bucket n_pos at a boundary would be
    engine-dependent). Null event_id rows are EXCLUDED (no total
    order without the key); null event_type is a NEGATIVE; null and
    non-finite values drop the row; n < k answers buckets 1..n with
    one row each (the NTILE degeneracy)."""
    import ray as _ray

    from ..util import worker_cached
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "value"])

    def clean(b: pa.Table) -> pa.Table:
        v = b.column("value")
        t = b.filter(pc.and_(pc.and_(v.is_valid(), pc.is_finite(v)),
                             b.column("event_id").is_valid()))
        vv = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pos = pc.fill_null(
            pc.equal(t.column("event_type"), "error"), False)
        return pa.table({
            "cents": pa.array(np.rint(vv * 100.0).astype(np.int64)),
            "eid": t.column("event_id"),
            "pos": pc.cast(pos, pa.int64())})

    sortd = ds.map_batches(clean, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072) \
        .sort(["cents", "eid", "pos"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c0": pa.array([], pa.int64()),
                             "e0": pa.array([], pa.int64()),
                             "p0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"c0": pa.array([b["cents"][0].as_py()]),
                         "e0": pa.array([b["eid"][0].as_py()]),
                         "p0": pa.array([b["pos"][0].as_py()]),
                         "cnt": pa.array([b.num_rows])})

    out_empty = pd.DataFrame({
        "decile": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "n_pos": pd.Series([], dtype="int64"),
        "pos_rate": pd.Series([], dtype="float64"),
        "mean_cents": pd.Series([], dtype="float64")})
    summ = sortd.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "c0" not in summ.columns:
        return out_empty
    summ = summ.sort_values(["c0", "e0", "p0"]).reset_index(drop=True)
    n = int(summ["cnt"].sum())
    offs = np.concatenate(([0], summ["cnt"].cumsum().to_numpy()[:-1]))
    lut = {(int(c), int(e), int(p)): int(o)
           for c, e, p, o in zip(summ["c0"], summ["e0"],
                                 summ["p0"], offs)}
    size, rem = divmod(n, k)
    ref = _ray.put(lut)

    def bucketize(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "pos_part": pa.array([], pa.int64()),
                          "cents_part": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        table = worker_cached(("calib_offs", ref.hex()),
                              lambda: _ray.get(ref))
        c = b["cents"].to_numpy(zero_copy_only=False)
        e = b["eid"].to_numpy(zero_copy_only=False)
        p = b["pos"].to_numpy(zero_copy_only=False)
        pos = table[(int(c[0]), int(e[0]), int(p[0]))] \
            + np.arange(b.num_rows)
        cut = rem * (size + 1)
        dec = np.where(pos < cut,
                       pos // max(size + 1, 1),
                       rem + (pos - cut) // max(size, 1)) + 1
        rows = {"decile": [], "n_part": [], "pos_part": [],
                "cents_part": []}
        for d in np.unique(dec):  # <= k buckets per block
            m = dec == d
            rows["decile"].append(int(d))
            rows["n_part"].append(int(m.sum()))
            rows["pos_part"].append(int(p[m].sum()))
            rows["cents_part"].append(
                str(int(c[m].astype(object).sum())))
        return pa.table({
            "decile": pa.array(rows["decile"], pa.int64()),
            "n_part": pa.array(rows["n_part"], pa.int64()),
            "pos_part": pa.array(rows["pos_part"], pa.int64()),
            "cents_part": pa.array(rows["cents_part"], pa.string())})

    parts = sortd.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).to_pandas()
    if parts.empty or "decile" not in parts.columns:
        return out_empty
    rows = []
    for d, g in parts.groupby("decile", sort=True):
        nd = int(g["n_part"].sum())
        npos = int(g["pos_part"].sum())
        sc = sum(int(x) for x in g["cents_part"])
        rows.append({
            "decile": int(d), "n": nd, "n_pos": npos,
            "pos_rate": float(duckdb_round(float(npos) / float(nd), 6)),
            "mean_cents": float(duckdb_round(
                float(sc) / float(nd), 6))})
    out = pd.DataFrame(rows)
    for col in ("decile", "n", "n_pos"):
        out[col] = out[col].astype("int64")
    out["pos_rate"] = out["pos_rate"].astype("float64")
    out["mean_cents"] = out["mean_cents"].astype("float64")
    return out


def bounce_rate_events(sf_dir: str):
    """Per-user session bounce rate (ORACLED): sessionize each user's
    stream with the 30-minute inactivity rule (the events_sessions
    contract: a gap STRICTLY greater than 1800s opens a new session;
    exactly 1800s continues — pinned both ways), then report how many
    sessions contain exactly ONE event — the engagement-quality
    statistic next to events_sessions' volume counts. ONE coarse
    user-hash partition (the sessionization convention), with the
    session SIZE histogram fully vectorized inside the partition:
    session ids by cumsum over (new-user | gap) breaks, sizes by
    bincount over the contiguous ids, per-user session/bounce counts
    by segment reduction — no per-user Python loop. bounce_rate =
    n_bounce / n_sessions, two exact small ints and ONE double divide
    in SQL operand order, 6dp. Null user_id rows are EXCLUDED (a
    session needs an owner), null ts rows are EXCLUDED (unorderable;
    and NaT.astype(int64) wraps to -2^63, fabricating a break)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna() & df["user_id"].notna()]
        df = df.sort_values(["user_id", "ts", "event_id"])
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
                "n_bounce": pd.Series([], dtype="int64"),
                "bounce_rate": pd.Series([], dtype="float64")})
        us = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy().astype(np.int64)
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | \
            ((us[1:] - us[:-1] > 1_800_000_000)
             & (uid[1:] == uid[:-1]))
        sid = np.cumsum(brk) - 1           # contiguous session ids
        sizes = np.bincount(sid)
        sess_user = uid[brk]               # owner of each session
        users, cnt = np.unique(sess_user, return_counts=True)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        bounce1 = (sizes == 1).astype(np.int64)
        cumb = np.concatenate(([0], np.cumsum(bounce1)))
        n_bounce = cumb[starts + cnt] - cumb[starts]
        rate = duckdb_round(n_bounce.astype(np.float64)
                            / cnt.astype(np.float64), 6)
        return pd.DataFrame({
            "user_id": users,
            "n_sessions": cnt.astype(np.int64),
            "n_bounce": n_bounce.astype(np.int64),
            "bounce_rate": np.asarray(rate, dtype=np.float64)})

    return partitioned_group_apply(ds, ["user_id"], kernel,
                                   num_partitions=None)


def _ntile_boundaries(ds, metric_col: str, id_col: str, k: int):
    """Distributed NTILE(k) BOUNDARY extraction: ``ds`` carries a
    UNIQUE (metric, id) total order; returns the <= k-1 boundary keys
    — the FIRST (metric, id) of buckets 2..k under SQL NTILE's
    uneven-split rule — so a later single pass can bucket ANY row by
    counting boundaries <= its key (tuple compare). Ray range sort →
    ONE batches-bounded (first-key, count) block-summary gather →
    the driver locates each boundary position's (block, offset) → a
    SECOND block-aligned pass emits only the boundary rows (<= k-1
    per block). Buckets left empty by n < k produce NO boundary
    (positions past n clip), which makes the bisect rule degrade
    exactly like NTILE. Nothing row-level reaches the driver beyond
    the k-1 keys themselves."""
    sortd = ds.sort([metric_col, id_col]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"m0": pa.array([], pa.int64()),
                             "i0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"m0": pa.array([b[metric_col][0].as_py()]),
                         "i0": pa.array([b[id_col][0].as_py()]),
                         "cnt": pa.array([b.num_rows])})

    summ = sortd.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "m0" not in summ.columns:
        return None
    summ = summ.sort_values(["m0", "i0"]).reset_index(drop=True)
    n = int(summ["cnt"].sum())
    offs = np.concatenate(([0], summ["cnt"].cumsum().to_numpy()[:-1]))
    size, rem = divmod(n, k)
    targets = []
    for q in range(1, k):
        pos = (q * (size + 1) if q < rem
               else rem * (size + 1) + (q - rem) * size)
        if 0 < pos < n:
            targets.append(pos)
    targets = sorted(set(targets))
    if not targets:
        return []
    # map each global position to its block's (first key, offset)
    want = {}
    for pos in targets:
        bi = int(np.searchsorted(offs, pos, side="right") - 1)
        key = (int(summ["m0"][bi]), int(summ["i0"][bi]))
        want.setdefault(key, []).append(pos - int(offs[bi]))

    def extract(b: pa.Table) -> pa.Table:
        empty = pa.table({"m": pa.array([], pa.int64()),
                          "i": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        m = b[metric_col].to_numpy(zero_copy_only=False)
        i = b[id_col].to_numpy(zero_copy_only=False)
        sel = want.get((int(m[0]), int(i[0])))
        if not sel:
            return empty
        idx = np.asarray(sel)
        return pa.table({"m": pa.array(m[idx].astype(np.int64)),
                         "i": pa.array(i[idx].astype(np.int64))})

    bd = sortd.map_batches(extract, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).to_pandas()
    return sorted(zip(bd["m"].astype(int), bd["i"].astype(int)))


def rfm_segments_customers(sf_dir: str, k: int = 5):
    """RFM segmentation histogram (ORACLED): quintile each customer on
    Recency (days since their last order, relative to the corpus max
    order date), Frequency (order count) and Monetary (exact cents
    spend), then count customers per (r, f, m) cell — the classic
    marketing / curation segmentation, <= k^3 output rows. Plan
    (rewritten from the first join-based draft, which paid ~17 Ray
    stage overheads on customer-cardinality data — 7.2 s at sf0.1):
    ONE per-customer shuffle computes (f, m, last_day) together
    (count+sum+max in the same partitioned combine), then per metric
    the _ntile_boundaries primitive extracts the <= k-1 NTILE
    boundary KEYS (sort + two block-bounded passes), and ONE final
    pass over the base buckets every customer against the THREE
    broadcast boundary lists with 3*(k-1) vectorized tuple compares,
    emitting <= k^3 partial rows per batch into a k^3-bounded count.
    No per-row assignment dataset, no joins. Total orders are
    (metric, custkey) — unique and deterministic on both engines;
    quintile 1 holds the MOST RECENT customers (recency_days sorts
    ascending) and the LOWEST frequency/spend (SQL NTILE ascending
    order — stated so readers don't assume the marketing 5=best
    flip). Cents via the pinned rint/CAST recipe; recency in exact
    date32-derived int days. Rows missing custkey, orderdate or
    totalprice are EXCLUDED from all three metrics (one row-level
    filter, pinned); an empty cleaned corpus answers no rows."""
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        day = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                      pa.int32())
        return pa.table({
            "c": t.column("o_custkey"),
            "day": pc.cast(day, pa.int64()),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    from ..util import partitioned_group_apply

    def part(b: pa.Table) -> pa.Table:
        g = b.group_by(["c"]).aggregate(
            [([], "count_all"), ("cents", "sum"), ("day", "max")])
        g = g.select(["c", "count_all", "cents_sum", "day_max"])
        return g.rename_columns(["c", "f_p", "m_p", "d_p"])

    def fin(t: pa.Table) -> pa.Table:
        g = t.group_by(["c"]).aggregate(
            [("f_p", "sum"), ("m_p", "sum"), ("d_p", "max")])
        g = g.select(["c", "f_p_sum", "m_p_sum", "d_p_max"])
        return g.rename_columns(["c", "f", "m", "last_day"])

    partials = ds.map_batches(clean, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=131072) \
        .map_batches(part, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=131072)
    base = partitioned_group_apply(partials, ["c"], fin,
                                   batch_format="pyarrow").materialize()
    out_empty = pd.DataFrame({
        "r": pd.Series([], dtype="int64"),
        "fq": pd.Series([], dtype="int64"),
        "mq": pd.Series([], dtype="int64"),
        "n_customers": pd.Series([], dtype="int64")})
    if base.count() == 0:
        return out_empty
    gmax = int(base.max("last_day"))

    def with_rec(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rec", pc.subtract(pa.scalar(gmax, pa.int64()),
                               pc.cast(b["last_day"], pa.int64())))

    base = base.map_batches(with_rec, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=None).materialize()
    bounds = {}
    for metric, name in (("rec", "r"), ("f", "fq"), ("m", "mq")):
        bl = _ntile_boundaries(
            base.select_columns([metric, "c"]), metric, "c", k)
        bounds[name] = bl or []

    def bucketize(b: pa.Table) -> pa.Table:
        empty = pa.table({"r": pa.array([], pa.int64()),
                          "fq": pa.array([], pa.int64()),
                          "mq": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        c = b["c"].to_numpy(zero_copy_only=False)
        out = {}
        for metric, name in (("rec", "r"), ("f", "fq"), ("m", "mq")):
            v = b[metric].to_numpy(zero_copy_only=False)
            bucket = np.ones(len(v), dtype=np.int64)
            for bm, bc in bounds[name]:   # <= k-1 vectorized compares
                bucket += ((v > bm) | ((v == bm) & (c >= bc)))
            out[name] = bucket
        t = pa.table({n: pa.array(a) for n, a in out.items()})
        g = t.group_by(["r", "fq", "mq"]).aggregate([([], "count_all")])
        g = g.select(["r", "fq", "mq", "count_all"])
        return g.rename_columns(["r", "fq", "mq", "n_p"])

    cells = grouped_agg(
        base.map_batches(bucketize, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=None),
        ["r", "fq", "mq"], {"n_p": "n_customers"},
        count_alias="_b").to_pandas()
    if cells.empty or "r" not in cells.columns:
        return out_empty
    out = cells.sort_values(["r", "fq", "mq"]).reset_index(drop=True)
    for col in ("r", "fq", "mq", "n_customers"):
        out[col] = out[col].astype("int64")
    return out[["r", "fq", "mq", "n_customers"]]


def session_duration_median_events(sf_dir: str):
    """Per-user MEDIAN session duration (ORACLED): sessionize with the
    30-minute rule (the events_sessions / bounce_rate contract), take
    each session's last-minus-first timestamp in exact µs, and answer
    the user's interpolated median — the robust dwell-time statistic
    (mean dwell is dragged by one left-open tab; the median is not).
    ONE user-hash partition; inside it session bounds via segment
    min/max over the contiguous session ids, the median via ONE
    pandas groupby-median (C-vectorized order statistic per user).
    Exactness: durations are int64 µs differences (session span «
    2^53 µs ≈ 285 years, so DuckDB's quantile_cont interpolated
    (a+b)/2 is exact in float64 — the bound is on DURATIONS, not
    epochs, which would overflow the mantissa); a single-event
    session has duration EXACTLY 0. Null user_id / null ts rows are
    invisible (the bounce_rate pins)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna() & df["user_id"].notna()]
        df = df.sort_values(["user_id", "ts", "event_id"])
        if not len(df):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "n_sessions": pd.Series([], dtype="int64"),
                "med_duration_us": pd.Series([], dtype="float64")})
        us = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy().astype(np.int64)
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (uid[1:] != uid[:-1]) | \
            ((us[1:] - us[:-1] > 1_800_000_000)
             & (uid[1:] == uid[:-1]))
        starts = np.flatnonzero(brk)
        ends = np.concatenate((starts[1:], [len(us)])) - 1
        dur = us[ends] - us[starts]          # sorted ⇒ last - first
        sess = pd.DataFrame({"user_id": uid[starts], "dur": dur})
        med = sess.groupby("user_id", sort=True)["dur"] \
            .agg(n_sessions="size", med_duration_us="median") \
            .reset_index()
        med["n_sessions"] = med["n_sessions"].astype("int64")
        med["med_duration_us"] = med["med_duration_us"] \
            .astype("float64")
        return med

    return partitioned_group_apply(ds, ["user_id"], kernel,
                                   num_partitions=None)


def readability_documents(sf_dir: str):
    """Flesch-style readability per document (ORACLED): flesch =
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) — the
    classic reading-ease screen, the text-quality family's third axis
    next to length/punct ratios (quality_documents) and LM fluency
    (bigram_logprob). Deterministic proxies, stated as the contract:
    WORDS are maximal non-space runs (== the split(' ') non-empty
    token rule), SYLLABLES are maximal [aeiouy]+ runs in the
    lowercased text (the standard vowel-group approximation),
    SENTENCES are maximal [.!?]+ runs floored at 1 (an unpunctuated
    doc is one sentence). Everything is ONE vectorized RE2 pass per
    quantity inside map_batches (pc.count_substring_regex — the
    engine pyarrow and DuckDB share, so counts agree by construction);
    the score is per-DOC float math in pinned operand order, FLOORED
    TO BASIS POINTS (the tfidf convention) so no cross-engine float
    compare is ever closer than 1e-4. Zero-word docs (empty, all
    spaces) and null texts are EXCLUDED; a doc with no vowels scores
    the pure sentence-length term; negative scores floor toward -inf
    on both engines."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        txt = t.column("text")
        w = pc.count_substring_regex(txt, pattern="[^ ]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sy = pc.count_substring_regex(pc.utf8_lower(txt),
                                      pattern="[aeiouy]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        sn = pc.count_substring_regex(txt, pattern="[.!?]+") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = w >= 1
        w, sy = w[keep], sy[keep]
        sn = np.maximum(sn[keep], 1)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
        flesch = (206.835
                  - 1.015 * (w.astype(np.float64)
                             / sn.astype(np.float64))
                  - 84.6 * (sy.astype(np.float64)
                            / w.astype(np.float64)))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "words": pa.array(w), "sentences": pa.array(sn),
            "syllables": pa.array(sy),
            "flesch_bp": pa.array(
                np.floor(10000.0 * flesch).astype(np.int64))})

    out = ds.map_batches(score, batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=131072).to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "words": pd.Series([], dtype="int64"),
            "sentences": pd.Series([], dtype="int64"),
            "syllables": pd.Series([], dtype="int64"),
            "flesch_bp": pd.Series([], dtype="int64")})
    return out.sort_values("doc_id").reset_index(drop=True)


def nonascii_ratio_by_lang(sf_dir: str):
    """Per-language script profile (ORACLED): share of non-ASCII
    CODEPOINTS in the corpus text — the encoding/script sanity check
    a multilingual curation pipeline runs per language (an 'en' shard
    suddenly 30% non-ASCII is mojibake or mislabeled data; a 'zh'
    shard near 0% lost its content). ONE vectorized RE2 count per
    batch (pc.count_substring_regex('[^\\x00-\\x7F]') — single-
    codepoint matches, so the count IS the non-ASCII codepoint count,
    and DuckDB's regexp_extract_all over the same RE2 agrees by
    construction; utf8_length == SQL length, both codepoints);
    vocabulary-bounded grouped_agg shuffle; ratio = two exact int
    sums and ONE divide through the VARCHAR->DOUBLE route (char sums
    pass 2^53 on a 1e12-doc corpus where the direct HUGEINT cast
    double-rounds). Null text rows are EXCLUDED; a null lang is its
    own group; a lang with only empty texts answers SQL-NULL ratio
    (0/0) with its doc count intact."""
    ds = _read(sf_dir, "documents", columns=["lang", "text"])

    def count(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        return pa.table({
            "lang": t.column("lang"),
            "chars": pc.cast(pc.utf8_length(t.column("text")),
                             pa.int64()),
            "na": pc.cast(pc.count_substring_regex(
                t.column("text"), pattern="[^\\x00-\\x7F]"),
                pa.int64())})

    agg = grouped_agg(
        ds.map_batches(count, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["lang"], {"chars": "chars", "na": "nonascii"},
        count_alias="n_docs").to_pandas()
    out_empty = pd.DataFrame({
        "lang": pd.Series([], dtype="object"),
        "n_docs": pd.Series([], dtype="int64"),
        "chars": pd.Series([], dtype="int64"),
        "nonascii": pd.Series([], dtype="int64"),
        "nonascii_ratio": pd.Series([], dtype="float64")})
    if agg.empty or "lang" not in agg.columns:
        return out_empty
    agg = agg.sort_values("lang", na_position="last") \
        .reset_index(drop=True)
    ratio = [
        (float(duckdb_round(float(int(na)) / float(int(ch)), 6))
         if int(ch) > 0 else None)
        for na, ch in zip(agg["nonascii"], agg["chars"])]
    out = pd.DataFrame({
        "lang": [None if pd.isna(v) else v for v in agg["lang"]],
        "n_docs": agg["n_docs"].astype("int64"),
        "chars": agg["chars"].astype("int64"),
        "nonascii": agg["nonascii"].astype("int64"),
        "nonascii_ratio": pd.Series(ratio, dtype="float64")})
    return out


def normalized_dup_documents(sf_dir: str):
    """Canonicalization-dedup histogram (ORACLED): cluster documents
    by the MD5 of their NORMALIZED text — lowercase, internal space
    runs collapsed to one, outer spaces trimmed — and count clusters
    per size; read against dup_cluster_sizes_documents it answers how
    much duplication hides behind casing/whitespace variants (the
    CCNet-style canonicalization step before exact dedup). The
    normalization contract: lower() is the engines' shared Unicode
    simple lowercase (utf8_lower == DuckDB lower; pinned on ASCII +
    Latin accents), collapse is the RE2 replace ' +' -> ' '
    (replace_substring_regex replaces ALL matches ==
    regexp_replace(..., 'g')), trim strips SPACES only. Same
    two-level aggregation shape as dup_cluster_sizes (per-batch md5
    partials -> digest-half hash aggregate -> size-bounded second
    groupby); a doc normalizing to the EMPTY string still clusters
    (it is a degenerate doc, not null); null text excluded."""
    import hashlib
    ds = _read(sf_dir, "documents", columns=["text"])

    def digest(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("text").is_valid())
        if t.num_rows == 0:
            return pa.table({"h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64())})
        norm = pc.utf8_trim(
            pc.replace_substring_regex(
                pc.utf8_lower(t.column("text")),
                pattern=" +", replacement=" "),
            characters=" ")
        buf = b"".join(
            hashlib.md5(s.encode("utf-8")).digest()
            for s in norm.to_pylist())
        h = np.frombuffer(buf, dtype="<i8").reshape(-1, 2)
        return pa.table({"h1": pa.array(h[:, 0]),
                         "h2": pa.array(h[:, 1])})

    clusters = grouped_agg_hash(
        ds.map_batches(digest, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["h1", "h2"], {}, count_alias="size")
    hist = grouped_agg(clusters.select_columns(["size"]),
                       ["size"], {}, count_alias="n_clusters").to_pandas()
    out_empty = pd.DataFrame({
        "size": pd.Series([], dtype="int64"),
        "n_clusters": pd.Series([], dtype="int64")})
    if hist.empty or "size" not in hist.columns:
        return out_empty
    out = hist.sort_values("size").reset_index(drop=True)
    out["size"] = out["size"].astype("int64")
    out["n_clusters"] = out["n_clusters"].astype("int64")
    return out[["size", "n_clusters"]]


def gains_spend_customers(sf_dir: str, k: int = 10):
    """Cumulative-gains (Lorenz) table of customer spend (ORACLED):
    customers in spend deciles, each reporting its exact cents total
    and the share of TOTAL revenue captured by this decile and every
    richer one — the "top 10% of customers drive X% of revenue"
    concentration readout (spend_deciles gives the band edges; this
    gives the gains curve). Same distributed-NTILE block discipline
    (sort on the unique (spend, custkey) order → block-summary gather
    → offsets → block-aligned pass emitting ≤ k partials per block)
    fused with the AUC big-int discipline: per-decile cents sums ride
    as DECIMAL STRINGS (a decile's revenue passes 2^53 at scale), the
    driver top-down cumulative and every share divide go through
    exact Python ints == the SQL HUGEINT window + VARCHAR→DOUBLE
    route. Spend in exact cents (the pinned rint/CAST recipe; int
    sums are order-free); null custkey / null price rows excluded;
    decile k is the RICHEST band (NTILE ascending), so cum_share_top
    reads 1.0 at decile 1 by construction (pinned) and the decile-k
    row alone answers the classic top-band share."""
    import ray as _ray

    from ..util import worker_cached
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    spend = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], {"cents": "spend"}, count_alias="_c") \
        .select_columns(["c", "spend"]) \
        .sort(["spend", "c"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"s0": pa.array([], pa.int64()),
                             "c0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"s0": pa.array([b["spend"][0].as_py()]),
                         "c0": pa.array([b["c"][0].as_py()]),
                         "cnt": pa.array([b.num_rows])})

    out_empty = pd.DataFrame({
        "decile": pd.Series([], dtype="int64"),
        "n_cust": pd.Series([], dtype="int64"),
        "cents": pd.Series([], dtype="object"),
        "cum_share_top": pd.Series([], dtype="float64")})
    summ = spend.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "s0" not in summ.columns:
        return out_empty
    summ = summ.sort_values(["s0", "c0"]).reset_index(drop=True)
    n = int(summ["cnt"].sum())
    offs = np.concatenate(([0], summ["cnt"].cumsum().to_numpy()[:-1]))
    lut = {(int(s), int(c)): int(o)
           for s, c, o in zip(summ["s0"], summ["c0"], offs)}
    size, rem = divmod(n, k)
    ref = _ray.put(lut)

    def bucketize(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"decile": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "cents_part": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        table = worker_cached(("gains_offs", ref.hex()),
                              lambda: _ray.get(ref))
        s = b["spend"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        pos = table[(int(s[0]), int(c[0]))] + np.arange(b.num_rows)
        cut = rem * (size + 1)
        dec = np.where(pos < cut,
                       pos // max(size + 1, 1),
                       rem + (pos - cut) // max(size, 1)) + 1
        rows = {"decile": [], "n_part": [], "cents_part": []}
        for d in np.unique(dec):
            m = dec == d
            rows["decile"].append(int(d))
            rows["n_part"].append(int(m.sum()))
            rows["cents_part"].append(
                str(int(s[m].astype(object).sum())))
        return pa.table({
            "decile": pa.array(rows["decile"], pa.int64()),
            "n_part": pa.array(rows["n_part"], pa.int64()),
            "cents_part": pa.array(rows["cents_part"], pa.string())})

    parts = spend.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).to_pandas()
    if parts.empty or "decile" not in parts.columns:
        return out_empty
    agg = {}
    for d, g in parts.groupby("decile", sort=True):
        agg[int(d)] = (int(g["n_part"].sum()),
                       sum(int(x) for x in g["cents_part"]))
    total = sum(v[1] for v in agg.values())
    rows, cum = [], 0
    for d in sorted(agg, reverse=True):  # richest decile first
        cum += agg[d][1]
        share = (float(duckdb_round(float(cum) / float(total), 6))
                 if total > 0 else None)
        rows.append({"decile": d, "n_cust": agg[d][0],
                     "cents": str(agg[d][1]), "cum_share_top": share})
    out = pd.DataFrame(rows).sort_values("decile") \
        .reset_index(drop=True)
    out["decile"] = out["decile"].astype("int64")
    out["n_cust"] = out["n_cust"].astype("int64")
    out["cents"] = out["cents"].astype("object")
    out["cum_share_top"] = out["cum_share_top"].astype("float64")
    return out


def stickiness_daily_events(sf_dir: str):
    """Daily stickiness (ORACLED): per calendar day, how many users
    were active, how many of those were ALSO active the previous day,
    and their ratio — the returning-user (DAU retention) metric a
    growth dashboard reads. ONE user-hash partition does all the
    pairing: within it the distinct (user, day) set sorts by
    (user, day) and a vectorized consecutive-day compare
    (d[i]−d[i−1] == 1 within the same user) marks returning days; the
    per-day (active, returning) partials that leave the partition are
    calendar-bounded, finished by one small grouped sum. Each user
    contributes at most ONE active and ONE returning per day (the
    distinct set — a user's 50 events on Tuesday are one active);
    a day with no previous-day overlap answers returning = 0 (the
    SQL LEFT JOIN + COALESCE); the first corpus day can never be
    returning. Days are exact date32 ints in-pipeline, formatted
    %Y-%m-%d at the edge; stickiness = two ints and ONE divide in
    SQL operand order, 6dp. Null user_id / null ts rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        out = pa.table({"u": t.column("user_id"),
                        "d": pc.cast(d, pa.int64())})
        # per-batch distinct prunes the shuffle to one row per (u, d)
        return out.group_by(["u", "d"]).aggregate([]) \
            .select(["u", "d"])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"d": pa.array([], pa.int64()),
                          "act": pa.array([], pa.int64()),
                          "ret": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        dd = t.group_by(["u", "d"]).aggregate([])  # exact distinct
        u = dd.column("u").to_numpy(zero_copy_only=False)
        d = dd.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        ret = np.zeros(len(u), dtype=bool)
        ret[1:] = (u[1:] == u[:-1]) & (d[1:] - d[:-1] == 1)
        days, act = np.unique(d, return_counts=True)
        rdays, rcnt = np.unique(d[ret], return_counts=True)
        rmap = dict(zip(rdays, rcnt))
        return pa.table({
            "d": pa.array(days.astype(np.int64)),
            "act": pa.array(act.astype(np.int64)),
            "ret": pa.array([int(rmap.get(x, 0)) for x in days],
                            pa.int64())})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["d"], {"act": "active", "ret": "returning"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "active": pd.Series([], dtype="int64"),
        "returning": pd.Series([], dtype="int64"),
        "stickiness": pd.Series([], dtype="float64")})
    if agg.empty or "d" not in agg.columns:
        return out_empty
    agg = agg.sort_values("d").reset_index(drop=True)
    day = pd.to_datetime(agg["d"].astype("int64"), unit="D") \
        .dt.strftime("%Y-%m-%d")
    out = pd.DataFrame({
        "day": day.astype("object"),
        "active": agg["active"].astype("int64"),
        "returning": agg["returning"].astype("int64"),
        "stickiness": np.asarray(duckdb_round(
            agg["returning"].to_numpy().astype(np.float64)
            / agg["active"].to_numpy().astype(np.float64), 6),
            dtype=np.float64)})
    return out


def ship_delay_by_month(sf_dir: str):
    """Shipping-latency SLA table (ORACLED): per ORDER month, the
    line-item count, mean and interpolated median of days between the
    order date and each line item's ship date — the fulfillment
    report behind "are we shipping slower this quarter". One
    size-chosen equi-join (orders' (key, date) projection broadcasts
    under the cap, shuffles above it — the established plan), then
    per-batch (month, delay_days) partials: the aggregate's key space
    is months x OBSERVED delay values — narrow on real fulfillment
    data, near-row-cardinality on adversarially independent dates —
    so the histogram rides grouped_agg_hash (per-batch combine, one
    coarse hash partition) and the finish is histogram-sized driver
    work. Exactness: delays are exact date32-int differences; the
    mean's numerator sum(delay) passes 2^53 at corpus scale, so the
    driver sums PYTHON INTS over the count table and the SQL reads
    its HUGEINT sum through the VARCHAR->DOUBLE route; the median
    comes EXACTLY from the per-month delay histogram (even counts
    interpolate (a+b)/2 — exact in float64 for day-sized ints ==
    DuckDB quantile_cont). A lineitem with a null ship date, an
    order with a null date, and orphan orderkeys (no matching order —
    the inner join) are invisible on both engines; negative delays
    (data errors) are KEPT — the report must show them."""
    from ..joins import equi_join
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate"])

    def li_clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("l_orderkey").is_valid(),
                             b.column("l_shipdate").is_valid()))
        return pa.table({
            "k": t.column("l_orderkey"),
            "sd": pc.cast(pc.cast(pc.cast(t.column("l_shipdate"),
                                          pa.date32()), pa.int32()),
                          pa.int64())})

    def o_clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_orderkey").is_valid(),
                             b.column("o_orderdate").is_valid()))
        od = t.column("o_orderdate")
        return pa.table({
            "k": t.column("o_orderkey"),
            "od": pc.cast(pc.cast(pc.cast(od, pa.date32()),
                                  pa.int32()), pa.int64()),
            "month": pc.strftime(od, "%Y-%m")})

    joined = equi_join(
        li.map_batches(li_clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        orders.map_batches(o_clean, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
        on=["k"])

    def partial(b: pa.Table) -> pa.Table:
        d = pc.subtract(b["sd"], b["od"])
        t = pa.table({"month": b["month"], "delay": d})
        g = t.group_by(["month", "delay"]).aggregate([([], "count_all")])
        g = g.select(["month", "delay", "count_all"])
        return g.rename_columns(["month", "delay", "n_p"])

    # grouped_agg_hash, not grouped_agg: the (month, delay) key space
    # is months x OBSERVED delay values — bounded on real fulfillment
    # data (delays cluster in 0..~120 days) but near-row-cardinality
    # on adversarially independent dates (189k keys at sf0.1, where
    # Ray's sort aggregate pathologically pays a full sort: 40 s vs
    # 1.5 s, measured)
    hist = grouped_agg_hash(
        joined.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
        ["month", "delay"], {"n_p": "n"}, count_alias="_b").to_pandas()
    out_empty = pd.DataFrame({
        "month": pd.Series([], dtype="object"),
        "n_items": pd.Series([], dtype="int64"),
        "mean_delay": pd.Series([], dtype="float64"),
        "med_delay": pd.Series([], dtype="float64")})
    if hist.empty or "month" not in hist.columns:
        return out_empty
    rows = []
    for month, g in hist.groupby("month", sort=True):
        g = g.sort_values("delay")
        cnt = [int(x) for x in g["n"]]
        dly = [int(x) for x in g["delay"]]
        n = sum(cnt)
        total = sum(c * d for c, d in zip(cnt, dly))  # exact ints
        # exact median from the histogram: positions are 0-based
        cum = np.cumsum(cnt)
        lo_pos, hi_pos = (n - 1) // 2, n // 2
        lo = dly[int(np.searchsorted(cum, lo_pos + 1))]
        hi = dly[int(np.searchsorted(cum, hi_pos + 1))]
        rows.append({
            "month": month, "n_items": n,
            "mean_delay": float(duckdb_round(
                float(total) / float(n), 6)),
            "med_delay": (float(lo) + float(hi)) / 2.0})
    out = pd.DataFrame(rows)
    out["n_items"] = out["n_items"].astype("int64")
    out["mean_delay"] = out["mean_delay"].astype("float64")
    out["med_delay"] = out["med_delay"].astype("float64")
    return out


def retention_curve_events(sf_dir: str):
    """Day-offset retention (survival) curve (ORACLED): for each day
    offset k, how many users were active exactly k days after their
    OWN first active day, and that count's share of all users — the
    lifecycle decay curve a product review reads next to the cohort
    table (retention_cohorts_events is cohort-month x age; this
    collapses to a single curve at day granularity). ONE user-hash
    partition computes everything: the distinct (user, day) set
    (per-batch Arrow distinct prunes the shuffle to one row per pair)
    lexsorts by (user, day) inside the partition, the run-start
    propagation (np.repeat of each user's first day) turns days into
    offsets with no join, and only offset-range-bounded
    (offset, n_users) partials leave the partition, finished by one
    small grouped sum. Every user contributes offset 0 (their first
    day IS an active day), so the denominator — total users — is
    EXACTLY the offset-0 count and share(0) == 1.0 by construction;
    observed offsets only (a user active on days {0, 5} emits offsets
    {0, 5}, nothing for the gap). Share = two exact ints and ONE
    divide in SQL operand order, 6dp. Null user/ts rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        out = pa.table({"u": t.column("user_id"),
                        "d": pc.cast(d, pa.int64())})
        return out.group_by(["u", "d"]).aggregate([]) \
            .select(["u", "d"])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"off": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        dd = t.group_by(["u", "d"]).aggregate([])  # exact distinct
        u = dd.column("u").to_numpy(zero_copy_only=False)
        d = dd.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        starts = np.ones(len(u), dtype=bool)
        starts[1:] = u[1:] != u[:-1]
        idx = np.flatnonzero(starts)
        runlen = np.diff(np.append(idx, len(u)))
        first = np.repeat(d[idx], runlen)
        off = d - first
        offs, cnt = np.unique(off, return_counts=True)
        return pa.table({"off": pa.array(offs.astype(np.int64)),
                         "n_p": pa.array(cnt.astype(np.int64))})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["off"], {"n_p": "n"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "day_offset": pd.Series([], dtype="int64"),
        "n_users": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "off" not in agg.columns:
        return out_empty
    agg = agg.sort_values("off").reset_index(drop=True)
    total = int(agg.loc[agg["off"] == 0, "n"].iloc[0])
    return pd.DataFrame({
        "day_offset": agg["off"].astype("int64"),
        "n_users": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64) / float(total), 6),
            dtype=np.float64)})


def zipf_slope_documents(sf_dir: str, top_n: int = 1000):
    """Zipf exponent of the term-frequency distribution (ORACLED):
    OLS slope (and intercept) of log2(count) on log2(rank) over the
    top-N whitespace terms — the one-number lexical-health readout a
    corpus curation review uses to spot template spam (slope near 0:
    boilerplate-flat head) or OCR noise (steeper-than-Zipf tail). The
    corpus-sized work is the SAME combiner + vocabulary-bounded
    groupby + per-block partial-top-k as term_frequency (the token
    stream never shuffles, the full vocabulary is never
    driver-resident); the regression runs on the driver over AT MOST
    top_n (rank, count) pairs with ranks from the deterministic
    (n DESC, term ASC) total order. Both engines evaluate the SAME
    closed form (sxy − sx·sy/c) / (sxx − sx·sx/c) in the same operand
    order over log2 values (numpy log2 == DuckDB log2 bit-for-bit on
    this host — the pmi_bigrams precedent), rounded at 6dp; a
    single-term corpus has zero x-variance and answers SQL-NULL slope
    (0/0 → NaN on both engines); an empty vocabulary answers the
    n_terms = 0 row with NULL slope AND NULL intercept."""
    from ..text.transform import term_frequency
    top = term_frequency(_read(sf_dir, "documents", columns=["text"]),
                         top_n=top_n)
    c = len(top)
    out = pd.DataFrame({"n_terms": pd.Series([c], dtype="int64"),
                        "slope": pd.Series([np.nan], dtype="float64"),
                        "intercept": pd.Series([np.nan],
                                               dtype="float64")})
    if c == 0:
        return out
    # ranks in the (n desc, term asc) order term_frequency returns
    x = np.log2(np.arange(1, c + 1, dtype=np.float64))
    y = np.log2(top["n"].to_numpy().astype(np.float64))
    # np.float64 operands: 0/0 follows IEEE (NaN) instead of raising
    # like Python floats — the single-term zero-variance branch
    sx, sy = np.float64(np.sum(x)), np.float64(np.sum(y))
    sxx, sxy = np.float64(np.sum(x * x)), np.float64(np.sum(x * y))
    with np.errstate(invalid="ignore", divide="ignore"):
        slope = (sxy - sx * sy / c) / (sxx - sx * sx / c)
        intercept = sy / c - slope * (sx / c)
    out.loc[0, "slope"] = duckdb_round(float(slope), 6) \
        if np.isfinite(slope) else np.nan
    out.loc[0, "intercept"] = duckdb_round(float(intercept), 6) \
        if np.isfinite(intercept) else np.nan
    return out


def new_vs_repeat_revenue(sf_dir: str):
    """New-vs-returning revenue split by order month (ORACLED): per
    calendar month, how many orders (and how much exact-cents
    revenue) came from customers placing their FIRST order vs
    returning customers, plus the repeat-revenue share — the
    acquisition-vs-retention readout of a growth P&L. An order is
    "new" iff its date equals the customer's earliest order date
    (same-day ties are ALL new — no arbitrary tiebreak). ONE
    customer-hash partition does the labeling: orders lexsort by
    (customer, day) inside the partition and a run-start np.repeat
    propagates each customer's first day with no join; only
    month-bounded (month, new/repeat cents + counts) int64 partials
    leave, finished by one small grouped sum. Cents ride the pinned
    rint/CAST recipe; the month sums stay exact int64 in Arrow and
    are reported as DECIMAL STRINGS (a month's revenue passes 2^53 at
    corpus scale and DuckDB's HUGEINT->pandas conversion
    double-rounds — the gains_spend precedent), with the share's two
    operands through the correctly-rounded VARCHAR->DOUBLE route in
    SQL operand order. Null custkey/date/price rows invisible; a
    zero-revenue month answers SQL-NULL share (0/0)."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))
        od = t.column("o_orderdate")
        d = pc.cast(pc.cast(pc.cast(od, pa.date32()), pa.int32()),
                    pa.int64())
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "c": t.column("o_custkey"), "d": d,
            "month": pc.strftime(od, "%Y-%m"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "month": pa.array([], pa.string()),
            "nc_p": pa.array([], pa.int64()),
            "rc_p": pa.array([], pa.int64()),
            "nn_p": pa.array([], pa.int64()),
            "rn_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, c))
        c, d = c[order], d[order]
        month = t.column("month").take(pa.array(order))
        cents = t.column("cents").to_numpy(zero_copy_only=False)[order]
        starts = np.ones(len(c), dtype=bool)
        starts[1:] = c[1:] != c[:-1]
        idx = np.flatnonzero(starts)
        runlen = np.diff(np.append(idx, len(c)))
        first = np.repeat(d[idx], runlen)
        new = d == first  # same-day ties are all new
        part = pa.table({
            "month": month,
            "nc_p": pa.array(np.where(new, cents, 0).astype(np.int64)),
            "rc_p": pa.array(np.where(new, 0, cents).astype(np.int64)),
            "nn_p": pa.array(new.astype(np.int64)),
            "rn_p": pa.array((~new).astype(np.int64))})
        g = part.group_by(["month"]).aggregate(
            [("nc_p", "sum"), ("rc_p", "sum"),
             ("nn_p", "sum"), ("rn_p", "sum")])
        return g.rename_columns(["month", "nc_p", "rc_p",
                                 "nn_p", "rn_p"])

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["month"],
                      {"nc_p": "nc", "rc_p": "rc",
                       "nn_p": "nn", "rn_p": "rn"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "month": pd.Series([], dtype="object"),
        "new_orders": pd.Series([], dtype="int64"),
        "repeat_orders": pd.Series([], dtype="int64"),
        "new_cents": pd.Series([], dtype="object"),
        "repeat_cents": pd.Series([], dtype="object"),
        "repeat_share": pd.Series([], dtype="float64")})
    if agg.empty or "month" not in agg.columns:
        return out_empty
    agg = agg.sort_values("month").reset_index(drop=True)
    nc = [int(x) for x in agg["nc"]]
    rc = [int(x) for x in agg["rc"]]
    share = np.asarray([
        duckdb_round(np.float64(float(r)) / np.float64(float(n + r)), 6)
        if (n + r) != 0 else np.nan
        for n, r in zip(nc, rc)], dtype=np.float64)
    return pd.DataFrame({
        "month": agg["month"].astype("object"),
        "new_orders": agg["nn"].astype("int64"),
        "repeat_orders": agg["rn"].astype("int64"),
        "new_cents": pd.Series([str(x) for x in nc], dtype="object"),
        "repeat_cents": pd.Series([str(x) for x in rc], dtype="object"),
        "repeat_share": share})


def return_rate_by_month(sf_dir: str):
    """Returns/refunds SLA by ship month (ORACLED): per calendar month
    of l_shipdate, the item count, how many items came back
    (l_returnflag = 'R'), the item-level return rate, the exact-cents
    returned revenue and its share of the month's revenue — the
    quality trend a merchandising review reads. Per-batch Arrow
    partials (count, conditional count, two conditional cents sums)
    feed a calendar-month-BOUNDED groupby; the finish is key-bounded
    driver work. A NULL returnflag is NOT returned (the SQL CASE
    WHEN NULL THEN .. ELSE 0 takes the ELSE); a NULL price row still
    counts in n_items but contributes nothing to either cents sum
    (the SQL SUM skips CASE-produced NULLs; both sides COALESCE to 0
    so a zero-R month answers '0', not NULL); a month whose every
    price is NULL answers 0/0 = SQL-NULL share. Cents ride the
    pinned rint/CAST recipe and are reported as DECIMAL STRINGS with
    the share's operands through the correctly-rounded
    VARCHAR->DOUBLE route. Null shipdate rows are invisible."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_returnflag", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("l_shipdate").is_valid())
        if t.num_rows == 0:
            return pa.table({"month": pa.array([], pa.string()),
                             "n_p": pa.array([], pa.int64()),
                             "r_p": pa.array([], pa.int64()),
                             "rc_p": pa.array([], pa.int64()),
                             "tc_p": pa.array([], pa.int64())})
        month = pc.strftime(t.column("l_shipdate"), "%Y-%m")
        flag = t.column("l_returnflag")
        is_r = pc.fill_null(pc.equal(flag, "R"), False) \
            .to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice")
        pv = price.is_valid().to_numpy(zero_copy_only=False)
        cents = np.where(
            pv, np.rint(np.nan_to_num(
                price.to_numpy(zero_copy_only=False).astype(np.float64))
                * 100.0).astype(np.int64), 0)
        part = pa.table({
            "month": month,
            "n_p": pa.array(np.ones(len(is_r), dtype=np.int64)),
            "r_p": pa.array(is_r.astype(np.int64)),
            "rc_p": pa.array(np.where(is_r & pv, cents, 0)
                             .astype(np.int64)),
            "tc_p": pa.array(np.where(pv, cents, 0).astype(np.int64))})
        g = part.group_by(["month"]).aggregate(
            [("n_p", "sum"), ("r_p", "sum"),
             ("rc_p", "sum"), ("tc_p", "sum")])
        return g.rename_columns(["month", "n_p", "r_p", "rc_p", "tc_p"])

    agg = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["month"], {"n_p": "n", "r_p": "r", "rc_p": "rc", "tc_p": "tc"},
        count_alias="_b").to_pandas()
    out_empty = pd.DataFrame({
        "month": pd.Series([], dtype="object"),
        "n_items": pd.Series([], dtype="int64"),
        "n_returned": pd.Series([], dtype="int64"),
        "return_rate": pd.Series([], dtype="float64"),
        "ret_cents": pd.Series([], dtype="object"),
        "ret_share": pd.Series([], dtype="float64")})
    if agg.empty or "month" not in agg.columns:
        return out_empty
    agg = agg.sort_values("month").reset_index(drop=True)
    rc = [int(x) for x in agg["rc"]]
    tc = [int(x) for x in agg["tc"]]
    with np.errstate(invalid="ignore", divide="ignore"):
        rate = np.asarray(duckdb_round(
            agg["r"].to_numpy().astype(np.float64)
            / agg["n"].to_numpy().astype(np.float64), 6),
            dtype=np.float64)
        share = np.asarray([
            duckdb_round(np.float64(float(a)) / np.float64(float(b)), 6)
            if b != 0 else np.nan for a, b in zip(rc, tc)],
            dtype=np.float64)
    return pd.DataFrame({
        "month": agg["month"].astype("object"),
        "n_items": agg["n"].astype("int64"),
        "n_returned": agg["r"].astype("int64"),
        "return_rate": rate,
        "ret_cents": pd.Series([str(x) for x in rc], dtype="object"),
        "ret_share": share})


def basket_size_histogram(sf_dir: str):
    """Order-size (basket) histogram (ORACLED): for each basket size
    k, how many orders contain exactly k line items, and that count's
    share of all orders — the order-shape distribution a fulfillment
    capacity plan reads (and the lineitem twin of
    dup_cluster_sizes' cluster histogram). Two-level aggregation:
    the per-order count is the high-cardinality level and rides
    grouped_agg_hash (per-batch combine bounds the shuffle at one row
    per (order, batch); one coarse hash partition finishes exactly —
    per-order counts are near row-cardinality, where Ray's sort
    aggregate pathologically pays a full-corpus sort), then only the
    size-BOUNDED (k, n_orders) histogram shuffles again. The share
    denominator — total orders — is the exact Python-int sum of the
    k-bounded histogram counts (no extra pass); share is two exact
    ints and ONE divide in SQL operand order, 6dp. Null orderkey rows
    are invisible."""
    ds = _read(sf_dir, "lineitem", columns=["l_orderkey"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("l_orderkey").is_valid())
        return pa.table({"o": t.column("l_orderkey")})

    per_order = grouped_agg_hash(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["o"], {}, count_alias="k")
    hist = grouped_agg(per_order.select_columns(["k"]),
                       ["k"], {}, count_alias="n_orders").to_pandas()
    out_empty = pd.DataFrame({
        "basket_size": pd.Series([], dtype="int64"),
        "n_orders": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if hist.empty or "k" not in hist.columns:
        return out_empty
    hist = hist.sort_values("k").reset_index(drop=True)
    total = sum(int(x) for x in hist["n_orders"])  # exact ints
    return pd.DataFrame({
        "basket_size": hist["k"].astype("int64"),
        "n_orders": hist["n_orders"].astype("int64"),
        "share": np.asarray(duckdb_round(
            hist["n_orders"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def price_qty_regr_by_brand(sf_dir: str):
    """Per-brand price-quantity regression (ORACLED): OLS slope +
    intercept of l_quantity on l_extendedprice, the Pearson corr, and
    the pair count, per part brand — the crude elasticity screen a
    pricing review runs per brand line. Composition the moment family
    didn't cover: ONE size-chosen equi-join attaches p_brand (only
    the (partkey, brand) projection ships — broadcast under the cap,
    shuffle above), then the SAME six-moment grouped pass as
    value_hour_corr (one row per (brand, batch) shuffles; the brand
    vocabulary is bounded) and the driver evaluates the closed forms.
    SQL population semantics: pairwise-complete rows only (a null
    quantity or price skips the pair), non-finite values excluded per
    the psi/drift convention; zero-price-variance or empty brands
    answer NULL slope/intercept/corr exactly like DuckDB regr_*/corr;
    a NULL brand is its own group (SQL GROUP BY). Null partkeys drop
    at the join on both engines."""
    from ..joins import equi_join
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])

    def li_prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("l_partkey").is_valid())
        return pa.table({"pk": t.column("l_partkey"),
                         "qty": t.column("l_quantity"),
                         "price": t.column("l_extendedprice")})

    def p_prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("p_partkey").is_valid())
        return pa.table({"pk": t.column("p_partkey"),
                         "brand": t.column("p_brand")})

    joined = equi_join(
        li.map_batches(li_prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        part.map_batches(p_prep, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=131072),
        on=["pk"])

    def mom(b: pa.Table) -> pa.Table:
        x = b.column("price").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        y = b.column("qty").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = (np.asarray(b.column("price").is_valid())
              & np.asarray(b.column("qty").is_valid()))
        ok &= np.isfinite(np.where(ok, x, 0.0))
        ok &= np.isfinite(np.where(ok, y, 0.0))
        xv = np.where(ok, x, 0.0)
        yv = np.where(ok, y, 0.0)
        return pa.table({
            "brand": b.column("brand"),
            "pok": pa.array(ok.astype(np.float64)),
            "px": pa.array(xv), "py": pa.array(yv),
            "pxx": pa.array(xv * xv), "pyy": pa.array(yv * yv),
            "pxy": pa.array(xv * yv)})

    agg = grouped_agg(
        joined.map_batches(mom, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["brand"],
        {"pok": "pn", "px": "sx", "py": "sy",
         "pxx": "sxx", "pyy": "syy", "pxy": "sxy"}).to_pandas()
    out_empty = pd.DataFrame({
        "brand": pd.Series([], dtype=object),
        "slope": pd.Series([], dtype="float64"),
        "intercept": pd.Series([], dtype="float64"),
        "pearson": pd.Series([], dtype="float64"),
        "n": pd.Series([], dtype="int64")})
    if agg.empty or "brand" not in agg.columns:
        return out_empty
    agg = agg.sort_values("brand").reset_index(drop=True)
    n = agg["pn"].to_numpy()
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxx, syy, sxy = (agg[c].to_numpy() for c in ("sxx", "syy", "sxy"))
    with np.errstate(invalid="ignore", divide="ignore"):
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        cov = sxy - sx * sy / n
        slope = cov / vx
        intercept = sy / n - slope * (sx / n)
        pear = cov / np.sqrt(vx * vy)
    ok_s = (n >= 1) & (vx > 0)
    ok_c = ok_s & (vy > 0)
    return pd.DataFrame({
        "brand": agg["brand"].to_numpy(),
        "slope": np.round(np.where(ok_s, slope, np.nan), 6),
        "intercept": np.round(np.where(ok_s, intercept, np.nan), 6),
        "pearson": np.round(np.where(ok_c, pear, np.nan), 6),
        "n": n.astype(np.int64)})


def wau_mau_engagement(sf_dir: str):
    """WAU/MAU engagement ratio (ORACLED): per observed day, the
    trailing-7-day and trailing-28-day distinct active users and
    their ratio — the engagement-health metric a growth dashboard
    reads next to stickiness. The windowed distincts never rescan:
    inside ONE user-hash partition each user's sorted distinct days
    become maximal coverage intervals per window (a new interval
    starts when the day gap >= W, else the coverage merges — the
    merge is what keeps a twice-active-in-window user counted ONCE),
    and each interval emits just TWO sweep deltas (+1 at its start,
    -1 one past its end). Only calendar-bounded (day, w7-delta,
    w28-delta, dau) partials leave the partition; the driver cumsums
    the deltas over the day line (calendar-bounded work) and keeps
    OBSERVED days only (dau > 0 — a silent day has no row, matching
    the SQL day grid). Ratio = two exact ints, ONE divide in SQL
    operand order, 6dp; wau <= mau always (window nesting). Null
    user/ts rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        out = pa.table({"u": t.column("user_id"),
                        "d": pc.cast(d, pa.int64())})
        return out.group_by(["u", "d"]).aggregate([]) \
            .select(["u", "d"])

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"d": pa.array([], pa.int64()),
                          "w7": pa.array([], pa.int64()),
                          "w28": pa.array([], pa.int64()),
                          "dau": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        dd = t.group_by(["u", "d"]).aggregate([])  # exact distinct
        u = dd.column("u").to_numpy(zero_copy_only=False)
        d = dd.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        new_user = np.ones(len(u), dtype=bool)
        new_user[1:] = u[1:] != u[:-1]
        days_list, deltas = [], []
        for col, w in (("w7", 7), ("w28", 28)):
            brk = new_user.copy()
            brk[1:] |= (d[1:] - d[:-1]) >= w  # gap >= W: coverage splits
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(d)) - 1
            days_list.append(np.concatenate([d[starts], d[ends] + w]))
            deltas.append(np.concatenate([
                np.ones(len(starts), dtype=np.int64),
                -np.ones(len(starts), dtype=np.int64)]))
        udays, ucnt = np.unique(d, return_counts=True)
        n7, n28 = len(days_list[0]), len(days_list[1])
        part = pa.table({
            "d": pa.array(np.concatenate(
                [days_list[0], days_list[1], udays]).astype(np.int64)),
            "w7": pa.array(np.concatenate(
                [deltas[0], np.zeros(n28 + len(udays), np.int64)])),
            "w28": pa.array(np.concatenate(
                [np.zeros(n7, np.int64), deltas[1],
                 np.zeros(len(udays), np.int64)])),
            "dau": pa.array(np.concatenate(
                [np.zeros(n7 + n28, np.int64),
                 ucnt.astype(np.int64)]))})
        g = part.group_by(["d"]).aggregate(
            [("w7", "sum"), ("w28", "sum"), ("dau", "sum")])
        return g.rename_columns(["d", "w7", "w28", "dau"])

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["d"],
                      {"w7": "w7", "w28": "w28", "dau": "dau"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "wau": pd.Series([], dtype="int64"),
        "mau": pd.Series([], dtype="int64"),
        "wau_mau": pd.Series([], dtype="float64")})
    if agg.empty or "d" not in agg.columns:
        return out_empty
    agg = agg.sort_values("d").reset_index(drop=True)
    wau = agg["w7"].to_numpy().cumsum()
    mau = agg["w28"].to_numpy().cumsum()
    keep = agg["dau"].to_numpy() > 0
    day = pd.to_datetime(agg.loc[keep, "d"].astype("int64"),
                         unit="D").dt.strftime("%Y-%m-%d")
    return pd.DataFrame({
        "day": day.astype("object").reset_index(drop=True),
        "wau": pd.Series(wau[keep], dtype="int64"),
        "mau": pd.Series(mau[keep], dtype="int64"),
        "wau_mau": np.asarray(duckdb_round(
            wau[keep].astype(np.float64) / mau[keep].astype(np.float64),
            6), dtype=np.float64)})


def first_touch_attribution(sf_dir: str):
    """First-touch attribution (ORACLED): bucket every user by the
    event type of their FIRST event (order = (ts, event_id) — the
    deterministic tie-break both engines share) and report, per
    first-touch type, the user count, how many of those users later
    fired a 'purchase' (strictly AFTER the first event in that same
    order), and the conversion rate — the marketing-attribution
    baseline every funnel review starts from. ONE user-hash partition
    does everything: rows lexsort by (user, ts, event_id), the
    first-of-user mask reads the first-touch type, a reduceat-style
    any() over the purchase mask past position 0 marks conversion,
    and only type-vocabulary-bounded (first_touch, n_users,
    n_converted) partials leave the partition. A user whose FIRST
    event is already a purchase converts only on a SECOND purchase
    (strictly-after contract, pinned); a NULL event_type is its own
    first-touch group and never counts as a purchase; rows with null
    user/ts/event_id are invisible (the tie-break must be total).
    Rate = two exact ints, ONE divide in SQL operand order, 6dp."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("user_id").is_valid(),
                    b.column("ts").is_valid()),
            b.column("event_id").is_valid()))
        return pa.table({
            "u": t.column("user_id"),
            "ts": pc.cast(t.column("ts"), pa.int64()),
            "eid": t.column("event_id"),
            "et": t.column("event_type")})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"ft": pa.array([], pa.string()),
                          "nu_p": pa.array([], pa.int64()),
                          "nc_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        eid = t.column("eid").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u = u[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        et = t.column("et").take(pa.array(order))
        is_p = pc.fill_null(pc.equal(et, "purchase"), False) \
            .to_numpy(zero_copy_only=False)
        conv_rows = is_p & ~first  # purchases strictly after the first
        idx = np.flatnonzero(first)
        # any() per user over conv_rows: cumsum difference at run edges
        cs = np.concatenate([[0], np.cumsum(conv_rows.astype(np.int64))])
        ends = np.append(idx[1:], len(u))
        conv = (cs[ends] - cs[idx]) > 0
        users = pa.table({
            "ft": et.take(pa.array(idx)),
            "nu_p": pa.array(np.ones(len(idx), dtype=np.int64)),
            "nc_p": pa.array(conv.astype(np.int64))})
        g = users.group_by(["ft"]).aggregate(
            [("nu_p", "sum"), ("nc_p", "sum")])
        return g.rename_columns(["ft", "nu_p", "nc_p"])

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["ft"], {"nu_p": "nu", "nc_p": "nc"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "first_touch": pd.Series([], dtype="object"),
        "n_users": pd.Series([], dtype="int64"),
        "n_converted": pd.Series([], dtype="int64"),
        "conversion": pd.Series([], dtype="float64")})
    if agg.empty or "ft" not in agg.columns:
        return out_empty
    agg = agg.sort_values("ft", na_position="last") \
        .reset_index(drop=True)
    return pd.DataFrame({
        "first_touch": agg["ft"].astype("object"),
        "n_users": agg["nu"].astype("int64"),
        "n_converted": agg["nc"].astype("int64"),
        "conversion": np.asarray(duckdb_round(
            agg["nc"].to_numpy().astype(np.float64)
            / agg["nu"].to_numpy().astype(np.float64), 6),
            dtype=np.float64)})


def hapax_share_documents(sf_dir: str):
    """Hapax-legomena share (ORACLED): how many distinct whitespace
    terms the corpus has, how many occur EXACTLY ONCE, their share,
    and the total token count — the vocabulary-tail health readout
    (zipf_slope reads the head; this reads the tail: OCR noise and
    boilerplate shift it in opposite directions). The corpus-sized
    work is the same term_frequency combiner + vocabulary-bounded
    groupby; the finish maps the counts Dataset through ONE partial
    pass (n_terms, n_hapax, token-sum per block) and sums exact
    Python ints on the driver — the vocabulary itself never gathers.
    total_tokens reports as a DECIMAL STRING (the corpus token count
    passes 2^53; DuckDB's HUGEINT->pandas conversion double-rounds);
    share = two exact ints, ONE divide in SQL operand order, 6dp.
    An empty vocabulary answers the n_terms = 0 row with SQL-NULL
    share and total_tokens '0' (the COALESCE on both engines)."""
    from ..text.transform import term_frequency
    counts = term_frequency(_read(sf_dir, "documents",
                                  columns=["text"]))

    def partial(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        return pa.table({
            "nt": pa.array([len(n)], pa.int64()),
            "nh": pa.array([int((n == 1).sum())], pa.int64()),
            "tok": pa.array([int(n.sum())], pa.int64())})

    parts = counts.map_batches(partial, batch_format="pyarrow",
                               zero_copy_batch=True).to_pandas()
    nt = sum(int(x) for x in parts.get("nt", []))
    nh = sum(int(x) for x in parts.get("nh", []))
    tok = sum(int(x) for x in parts.get("tok", []))
    share = (duckdb_round(np.float64(float(nh)) / np.float64(float(nt)),
                          6) if nt else np.nan)
    return pd.DataFrame({
        "n_terms": pd.Series([nt], dtype="int64"),
        "n_hapax": pd.Series([nh], dtype="int64"),
        "hapax_share": pd.Series([share], dtype="float64"),
        "total_tokens": pd.Series([str(tok)], dtype="object")})


def sessions_per_user_histogram(sf_dir: str):
    """Sessions-per-user histogram (ORACLED): sessionize every user's
    timeline with the 30-minute rule (the events_sessions /
    bounce_rate / session_duration contract: a gap STRICTLY greater
    than 30 min opens a new session) and report, per session count k,
    how many users had exactly k sessions and that count's share —
    the visit-frequency distribution an engagement model is trained
    against. Session COUNTS depend only on each user's sorted
    timestamp multiset (ties contribute gap 0 regardless of order),
    so no tie-break column is needed and only (user_id, ts) is read.
    ONE user-hash partition: the break mask (new user | gap > 30 min)
    reduceats to a per-user session count, and only the
    count-BOUNDED (k, n_users) histogram partials leave the
    partition. The share denominator — total users — is the exact
    Python-int sum of the k-bounded histogram (every user has k >= 1);
    share = two exact ints, ONE divide in SQL operand order, 6dp.
    Null user/ts rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        return pa.table({"u": t.column("user_id"),
                         "ts": pc.cast(t.column("ts"), pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "nu_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) \
            | (ts[1:] - ts[:-1] > 1_800_000_000)
        starts = np.ones(len(u), dtype=bool)
        starts[1:] = u[1:] != u[:-1]
        idx = np.flatnonzero(starts)
        k = np.add.reduceat(brk.astype(np.int64), idx)
        ks, cnt = np.unique(k, return_counts=True)
        return pa.table({"k": pa.array(ks.astype(np.int64)),
                         "nu_p": pa.array(cnt.astype(np.int64))})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["k"], {"nu_p": "n"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "n_sessions": pd.Series([], dtype="int64"),
        "n_users": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "k" not in agg.columns:
        return out_empty
    agg = agg.sort_values("k").reset_index(drop=True)
    total = sum(int(x) for x in agg["n"])  # exact ints
    return pd.DataFrame({
        "n_sessions": agg["k"].astype("int64"),
        "n_users": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def norm_stats_by_label_embeddings(sf_dir: str):
    """Per-label L2-norm profile of the embedding column (ORACLED):
    count, mean, min and max of each vector's Euclidean norm per
    label — the first-look health check on an embedding table
    (un-normalized shards, dead/zero vectors and scale drift between
    labels all show up here before any similarity math is trusted).
    Vectorized per batch: the fixed-size list column reshapes to an
    (n, dim) float64 matrix, one einsum row-reduction yields every
    norm, and only label-vocabulary-bounded (label, n, Σnorm, min,
    max) partials shuffle. Cross-engine float contract: each norm is
    sqrt of a SEQUENTIAL left-fold over dims in subscript order on
    both engines (numpy reduces axis-1 pairwise only past 128
    elements; DuckDB sums the unnest in list order), so min/max —
    which have no rounding headroom — compare IDENTICAL doubles, and
    the mean's batch-order-dependent Σnorm hides behind the 6dp
    round (the regr/corr precedent). NULL-embedding and NULL-label
    rows are invisible (the report keys on label as an int; a null
    label is malformed metadata, filtered on BOTH engines)."""
    ds = _read(sf_dir, "embeddings", columns=["embedding", "label"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("embedding").is_valid(),
                             b.column("label").is_valid()))
        if t.num_rows == 0:
            return pa.table({"label": pa.array([], pa.int32()),
                             "n_p": pa.array([], pa.int64()),
                             "s_p": pa.array([], pa.float64()),
                             "mn_p": pa.array([], pa.float64()),
                             "mx_p": pa.array([], pa.float64())})
        emb = t.column("embedding").combine_chunks()
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.chunk(0)
        flat = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(emb)
        dim = len(flat) // n if n else 0
        v = flat.reshape(n, dim)
        # add.reduce matches the sequential dim-order fold DuckDB's
        # unnest-SUM performs (np.sum's pairwise split kicks in past
        # 128 elements and would diverge in the last bits)
        nrm = np.sqrt(np.add.reduce(v * v, axis=1))
        part = pa.table({"label": t.column("label"),
                         "n_p": pa.array(np.ones(n, dtype=np.int64)),
                         "s_p": pa.array(nrm),
                         "mn_p": pa.array(nrm),
                         "mx_p": pa.array(nrm)})
        g = part.group_by(["label"]).aggregate(
            [("n_p", "sum"), ("s_p", "sum"),
             ("mn_p", "min"), ("mx_p", "max")])
        return g.rename_columns(["label", "n_p", "s_p", "mn_p", "mx_p"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=131072).to_pandas()
    out_empty = pd.DataFrame({
        "label": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "mean_norm": pd.Series([], dtype="float64"),
        "min_norm": pd.Series([], dtype="float64"),
        "max_norm": pd.Series([], dtype="float64")})
    if parts.empty or "label" not in parts.columns:
        return out_empty
    g = parts.groupby("label", dropna=False, sort=True).agg(
        n=("n_p", "sum"), s=("s_p", "sum"),
        mn=("mn_p", "min"), mx=("mx_p", "max")).reset_index()
    return pd.DataFrame({
        "label": g["label"].astype("int64"),
        "n": g["n"].astype("int64"),
        "mean_norm": np.asarray(duckdb_round(
            g["s"].to_numpy() / g["n"].to_numpy().astype(np.float64),
            6), dtype=np.float64),
        "min_norm": np.asarray(duckdb_round(g["mn"].to_numpy(), 6),
                               dtype=np.float64),
        "max_norm": np.asarray(duckdb_round(g["mx"].to_numpy(), 6),
                               dtype=np.float64)})


def order_gap_histogram(sf_dir: str):
    """Purchase-cadence histogram (ORACLED): for every pair of
    consecutive orders by the same customer, the gap in whole days —
    histogrammed with each gap count's share — the reorder-cycle
    distribution a replenishment model is fit against
    (median_gap_by_user answers a per-user median over events; this
    answers the corpus-wide gap distribution over orders). ONE
    customer-hash partition: orders lexsort by (customer, day), the
    within-customer consecutive difference is the gap vector (two
    same-day orders gap 0 deterministically — date subtraction
    ignores the tie order), and only gap-range-bounded
    (gap, n) histogram partials leave, finished by one small grouped
    sum. Share = two exact ints (the denominator is the histogram's
    own Python-int sum — no extra pass), ONE divide in SQL operand
    order, 6dp. A single-order customer contributes no gap; null
    custkey/date rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_orderdate").is_valid()))
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32())
        return pa.table({"c": t.column("o_custkey"),
                         "d": pc.cast(d, pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"gap": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, c))
        c, d = c[order], d[order]
        same = np.zeros(len(c), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        gaps = (d[1:] - d[:-1])[same[1:]]
        if not len(gaps):
            return empty
        gs, cnt = np.unique(gaps, return_counts=True)
        return pa.table({"gap": pa.array(gs.astype(np.int64)),
                         "n_p": pa.array(cnt.astype(np.int64))})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["gap"], {"n_p": "n"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "gap_days": pd.Series([], dtype="int64"),
        "n_gaps": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "gap" not in agg.columns:
        return out_empty
    agg = agg.sort_values("gap").reset_index(drop=True)
    total = sum(int(x) for x in agg["n"])  # exact ints
    return pd.DataFrame({
        "gap_days": agg["gap"].astype("int64"),
        "n_gaps": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def _gini_exact(stream):
    """Exact distributed Gini over a (v: int64, uid: int64) Dataset
    with a unique total order: sort once, a block-summary pass gives
    the driver each block's global offset, a second block-aligned
    pass emits ONE (n, Σx, Σ(i·x)) partial per block with
    rank-weighted sums as DECIMAL STRINGS (i·x passes 2^53 long
    before the corpus does), and the driver folds Python-int totals
    into G = (2·Σi·x − (n+1)·Σx)/(n·Σx) — the rank never
    materializes. Returns (n, total, gini — NaN when Σx = 0) or
    None when the stream is empty."""
    import ray as _ray

    from ..util import worker_cached
    sorted_ds = stream.select_columns(["v", "uid"]) \
        .sort(["v", "uid"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"s0": pa.array([], pa.int64()),
                             "c0": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({"s0": pa.array([b["v"][0].as_py()]),
                         "c0": pa.array([b["uid"][0].as_py()]),
                         "cnt": pa.array([b.num_rows])})

    summ = sorted_ds.map_batches(summary, batch_format="pyarrow",
                                 zero_copy_batch=True,
                                 batch_size=None).to_pandas()
    if summ.empty or "s0" not in summ.columns:
        return None
    summ = summ.sort_values(["s0", "c0"]).reset_index(drop=True)
    offs = np.concatenate(([0], summ["cnt"].cumsum().to_numpy()[:-1]))
    lut = {(int(s), int(c)): int(o)
           for s, c, o in zip(summ["s0"], summ["c0"], offs)}
    ref = _ray.put(lut)

    def rank_partial(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"n_p": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.string()),
                          "six": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        table = worker_cached(("gini_offs", ref.hex()),
                              lambda: _ray.get(ref))
        s = b["v"].to_numpy(zero_copy_only=False)
        c = b["uid"].to_numpy(zero_copy_only=False)
        off = table[(int(s[0]), int(c[0]))]
        x = s.astype(object)
        pos = (off + 1 + np.arange(b.num_rows)).astype(object)
        return pa.table({
            "n_p": pa.array([b.num_rows], pa.int64()),
            "sx": pa.array([str(int(x.sum()))], pa.string()),
            "six": pa.array([str(int((pos * x).sum()))],
                            pa.string())})

    parts = sorted_ds.map_batches(rank_partial,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True,
                                  batch_size=None).to_pandas()
    if parts.empty or "n_p" not in parts.columns:
        return None
    n = int(parts["n_p"].sum())
    if n == 0:
        return None
    s0 = sum(int(v) for v in parts["sx"])
    s1 = sum(int(v) for v in parts["six"])
    if s0 == 0:
        return n, s0, float("nan")
    num = 2 * s1 - (n + 1) * s0
    den = n * s0
    return n, s0, float(duckdb_round(float(num) / float(den), 6))


def gini_spend_customers(sf_dir: str):
    """Gini coefficient of customer spend (ORACLED): ONE row with the
    customer count, the exact total cents (decimal string — corpus
    revenue passes 2^53 at scale) and the Gini concentration index —
    the single-number "how unequal is revenue across customers"
    readout that gains_spend_customers expands into a curve. Exact
    integer arithmetic end to end via the shared _gini_exact kernel
    (sort + block-offset rank partials, G = (2·Σi·x − (n+1)·Σx)/
    (n·Σx); Σi·x is invariant under permuting tied spends, so the
    (spend, custkey) tie order is deterministic but not
    load-bearing), ONE divide in SQL operand order, 6dp. A
    zero-revenue corpus answers SQL-NULL gini; no customers answers
    the typed empty frame; null custkey/price rows invisible."""
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    spend = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], {"cents": "spend"}, count_alias="_c") \
        .rename_columns({"spend": "v", "c": "uid"})
    out_empty = pd.DataFrame({
        "n_cust": pd.Series([], dtype="int64"),
        "total_cents": pd.Series([], dtype="object"),
        "gini": pd.Series([], dtype="float64")})
    res = _gini_exact(spend)
    if res is None:
        return out_empty
    n, s0, gini = res
    return pd.DataFrame({
        "n_cust": pd.Series([n], dtype="int64"),
        "total_cents": pd.Series([str(s0)], dtype="object"),
        "gini": pd.Series([gini], dtype="float64")})


def length_gini_documents(sf_dir: str):
    """Gini coefficient of document LENGTH (ORACLED): ONE row — doc
    count, exact total characters (decimal string) and the Gini index
    of the n_chars distribution — the corpus length-skew readout a
    curation pipeline checks before token-budgeted training (a high
    length Gini means a few huge documents own the token budget;
    pack_documents' bin efficiency and chunk_documents' fan-out both
    degrade exactly then). Second consumer of the _gini_exact kernel
    (the spend machinery generalized off the orders table): the
    stream is (n_chars, doc_id) — lengths already integers, no
    quantization step at all. Zero-length docs are real rows (they
    shift n and the rank weights — pinned); a corpus of ONLY empty
    docs answers SQL-NULL gini with the count reported; null
    doc_id/n_chars rows invisible; no docs → typed empty frame."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("doc_id").is_valid(),
                             b.column("n_chars").is_valid()))
        return pa.table({"v": t.column("n_chars"),
                         "uid": t.column("doc_id")})

    stream = ds.map_batches(clean, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=131072)
    out_empty = pd.DataFrame({
        "n_docs": pd.Series([], dtype="int64"),
        "total_chars": pd.Series([], dtype="object"),
        "gini": pd.Series([], dtype="float64")})
    res = _gini_exact(stream)
    if res is None:
        return out_empty
    n, s0, gini = res
    return pd.DataFrame({
        "n_docs": pd.Series([n], dtype="int64"),
        "total_chars": pd.Series([str(s0)], dtype="object"),
        "gini": pd.Series([gini], dtype="float64")})


def cohort_ltv_curve(sf_dir: str):
    """Cohort LTV curve (ORACLED): customers cohorted by their FIRST
    order's calendar month; per (cohort_month, month_index) the table
    reports the cohort size, that month-index's exact cents revenue,
    the cumulative cents through it, and cumulative revenue per cohort
    customer — the lifetime-value curve a CAC payback model reads
    (retention_curve_events answers "do they come back", this answers
    "what are they worth by month k"). ONE customer-hash partition
    does the cohorting: sort by (customer, year·12+month), the first
    row per customer IS the cohort month, month_index = calendar-month
    difference (Jan 31 → Feb 1 is index 1 — calendar months, not
    30-day windows), and only calendar²-bounded (cohort, index,
    cents, n_first) partials leave — cohort size rides on the index-0
    group, where every customer's first order lives by construction.
    Cents sums ride int64 partials into grouped_agg (the gains
    discipline); the driver's per-cohort cumulative and the
    ltv = cum/n divide run over exact Python ints, ONE divide in SQL
    operand order, 6dp; cum_cents reports as a DECIMAL STRING (a
    cohort's lifetime revenue passes 2^53 at scale). Only observed
    (cohort, index) months produce rows — a gap month is absent but
    the next observed cumulative still includes everything before it.
    Rows with null custkey, date or price are invisible throughout."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))
        d = t.column("o_orderdate")
        ym = pc.add(pc.multiply(pc.cast(pc.year(d), pa.int64()), 12),
                    pc.cast(pc.month(d), pa.int64()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"), "ym": ym,
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"cm": pa.array([], pa.int64()),
                          "mi": pa.array([], pa.int64()),
                          "cents": pa.array([], pa.int64()),
                          "nc": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False)
        ym = t.column("ym").to_numpy(zero_copy_only=False)
        x = t.column("cents").to_numpy(zero_copy_only=False)
        order = np.lexsort((ym, c))
        c, ym, x = c[order], ym[order], x[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        gid = np.cumsum(first) - 1              # customer group index
        cm = ym[first][gid]                     # cohort month per row
        mi = ym - cm
        key = cm * 4096 + mi                    # mi < 4096 months (341y)
        uk, inv = np.unique(key, return_inverse=True)
        idx = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[idx], np.arange(len(uk)))
        cents = np.add.reduceat(x[idx], bounds)   # int64-exact sums
        nfirst = np.bincount(inv[first], minlength=len(uk)) \
            .astype(np.int64)
        return pa.table({
            "cm": pa.array((uk // 4096).astype(np.int64)),
            "mi": pa.array((uk % 4096).astype(np.int64)),
            "cents": pa.array(cents),
            "nc": pa.array(nfirst)})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], kernel, batch_format="pyarrow")
    agg = grouped_agg(parts, ["cm", "mi"],
                      {"cents": "cents", "nc": "nc"},
                      count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "cohort_month": pd.Series([], dtype="object"),
        "month_index": pd.Series([], dtype="int64"),
        "n_cust": pd.Series([], dtype="int64"),
        "cents": pd.Series([], dtype="object"),
        "cum_cents": pd.Series([], dtype="object"),
        "ltv_per_cust": pd.Series([], dtype="float64")})
    if agg.empty or "cm" not in agg.columns:
        return out_empty
    agg = agg.sort_values(["cm", "mi"]).reset_index(drop=True)
    sizes = {int(cm): int(g["nc"].sum())
             for cm, g in agg.groupby("cm")}
    rows = []
    for cm, g in agg.groupby("cm", sort=True):
        n, cum = sizes[int(cm)], 0
        y, m = (int(cm) - 1) // 12, (int(cm) - 1) % 12 + 1
        label = f"{y:04d}-{m:02d}"
        for _, r in g.iterrows():
            cum += int(r["cents"])
            rows.append({
                "cohort_month": label,
                "month_index": int(r["mi"]),
                "n_cust": n,
                "cents": str(int(r["cents"])),
                "cum_cents": str(cum),
                "ltv_per_cust": float(duckdb_round(
                    float(cum) / float(n), 6))})
    out = pd.DataFrame(rows)
    out["month_index"] = out["month_index"].astype("int64")
    out["n_cust"] = out["n_cust"].astype("int64")
    out["ltv_per_cust"] = out["ltv_per_cust"].astype("float64")
    return out


def centroid_distances_embeddings(sf_dir: str):
    """Pairwise Euclidean distance between per-label centroids
    (ORACLED): every unordered label pair with the L2 distance between
    their basis-point-quantized centroids — the class-separation
    readout an embedding-quality gate reads next to
    norm_stats_by_label (two labels whose prototypes collapse onto
    each other predict classifier confusion before any model trains).
    The corpus-sized work is the label_centroids partial pass (per
    batch: one sorted reduceat over the (n, d) float64 matrix; vectors
    never shuffle, only (labels × dim) partial rows do); the
    cross-engine float contract rides the centroid family's
    quantization: each centroid dim floors to basis points
    (floor(10000·Σv/n) — integer unless the mean sits within an ulp of
    a bp boundary), so the pairwise squared-diff sums are EXACT
    integers on both engines, and sqrt of an exact int is one
    deterministic double (rounded 6dp for the report). Labels × labels
    pairs are label-vocabulary-bounded — the pairing runs on the
    driver over the already-small centroid table. Null label / null
    embedding rows invisible; fewer than two labels answers the typed
    empty frame."""
    from ray.data.aggregate import Sum

    from ..ann.search import embedding_matrix
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("label").is_valid(),
                             b.column("embedding").is_valid()))
        empty = pa.table({
            "label": pa.array([], type=pa.int64()),
            "dim": pa.array([], type=pa.int64()),
            "sum_part": pa.array([], type=pa.float64()),
            "n_part": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        M = embedding_matrix(t.column("embedding"))  # (n, d) float64
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), (M.shape[1] if len(M) else 0)
        if k == 0 or d == 0:
            return empty
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(k))
        sums = np.add.reduceat(M[order], starts, axis=0)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                    k)),
            "sum_part": pa.array(sums.ravel()),
            "n_part": pa.array(np.repeat(cnt, d))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("sum_part", alias_name="s"),
                   Sum("n_part", alias_name="n")).to_pandas()
    out_empty = pd.DataFrame({
        "label_a": pd.Series([], dtype="int64"),
        "label_b": pd.Series([], dtype="int64"),
        "dist_bp": pd.Series([], dtype="float64")})
    if agg.empty or "label" not in agg.columns:
        return out_empty
    bp = np.floor(10000.0 * agg["s"].to_numpy()
                  / agg["n"].to_numpy().astype(np.float64)) \
        .astype(np.int64)
    agg = agg.assign(bp=bp).sort_values(["label", "dim"])
    labels = np.sort(agg["label"].unique())
    if len(labels) < 2:
        return out_empty
    d = int(agg["dim"].max())
    mat = agg["bp"].to_numpy().reshape(len(labels), d)
    rows = []
    for i in range(len(labels)):
        for j in range(i + 1, len(labels)):
            diff = mat[i] - mat[j]
            ssq = int(np.dot(diff.astype(object), diff.astype(object)))
            rows.append({
                "label_a": int(labels[i]), "label_b": int(labels[j]),
                "dist_bp": float(duckdb_round(
                    math.sqrt(float(ssq)), 6))})
    out = pd.DataFrame(rows)
    out["label_a"] = out["label_a"].astype("int64")
    out["label_b"] = out["label_b"].astype("int64")
    out["dist_bp"] = out["dist_bp"].astype("float64")
    return out


def peak_concurrent_sessions_events(sf_dir: str):
    """Peak concurrent sessions (ORACLED): ONE row — total session
    count, the maximum number of 30-minute-rule sessions active at
    the same instant, and the FIRST timestamp attaining it — the
    capacity-planning readout (how many simultaneous users must the
    serving tier hold?). Sweep line over session intervals: ONE
    user-hash partition sessionizes (the strict >30-min break of the
    bounce_rate/session_duration contract) and emits only
    (endpoint_ts, kind, ±count) rows pre-merged per partition; a
    grouped sum makes (t, kind) globally unique; after ONE sort the
    running concurrency never materializes — each block reports its
    (sum, max-prefix, first-argmax-t) summary, offsets are a cumsum
    over blocks on the driver, and block max-prefixes are
    offset-shifted (a prefix max is offset-equivariant, so one
    summary pass replaces the second block-aligned pass of the
    NTILE discipline). Interval ends are INCLUSIVE with starts
    ordered before ends at the same instant: a session ending exactly
    when another starts overlaps it (both count — pinned), and a
    single-event session still contributes concurrency 1 at its
    point. Null user/ts rows invisible; an eventless corpus answers
    the typed empty frame. The argmax-first tie rule is stable under
    arbitrary intra-(t,kind) orders: within a tie group all deltas
    share a sign, so intermediate prefixes never exceed the group
    boundary values."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    GAP = 1_800_000_000  # 30 min in µs

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        return pa.table({
            "u": t.column("user_id"),
            "t": pc.cast(t.column("ts"), pa.int64())})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], pa.int64()),
                          "k": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("u").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        brk = np.ones(len(u), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP)
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:] - 1, len(u) - 1]
        st, en = ts[starts], ts[ends]
        key = np.r_[st * 2, en * 2 + 1]          # k=0 starts, k=1 ends
        uk, cnt = np.unique(key, return_counts=True)
        k = (uk % 2).astype(np.int64)
        d = np.where(k == 0, cnt, -cnt).astype(np.int64)
        return pa.table({"t": pa.array((uk // 2).astype(np.int64)),
                         "k": pa.array(k), "d": pa.array(d)})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow")
    pts = grouped_agg_hash(parts, ["t", "k"], {"d": "d"},
                           count_alias="_p") \
        .select_columns(["t", "k", "d"]).sort(["t", "k"])

    def summary(b: pa.Table) -> pa.Table:
        empty = pa.table({"t0": pa.array([], pa.int64()),
                          "k0": pa.array([], pa.int64()),
                          "sum_d": pa.array([], pa.int64()),
                          "maxp": pa.array([], pa.int64()),
                          "argt": pa.array([], pa.int64()),
                          "n_start": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        t = b["t"].to_numpy(zero_copy_only=False)
        k = b["k"].to_numpy(zero_copy_only=False)
        d = b["d"].to_numpy(zero_copy_only=False)
        run = np.cumsum(d)
        mx = int(run.max())
        first = int(np.argmax(run == mx))
        return pa.table({
            "t0": pa.array([int(t[0])]), "k0": pa.array([int(k[0])]),
            "sum_d": pa.array([int(run[-1])]),
            "maxp": pa.array([mx]),
            "argt": pa.array([int(t[first])]),
            "n_start": pa.array([int(d[k == 0].sum())])})

    summ = pts.map_batches(summary, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=None).to_pandas()
    out_empty = pd.DataFrame({
        "n_sessions": pd.Series([], dtype="int64"),
        "peak_concurrency": pd.Series([], dtype="int64"),
        "peak_ts": pd.Series([], dtype="datetime64[us]")})
    if summ.empty or "t0" not in summ.columns:
        return out_empty
    summ = summ.sort_values(["t0", "k0"]).reset_index(drop=True)
    offs = np.concatenate(([0], summ["sum_d"].cumsum().to_numpy()[:-1]))
    gmax = offs + summ["maxp"].to_numpy()
    peak = int(gmax.max())
    first_blk = int(np.argmax(gmax == peak))
    return pd.DataFrame({
        "n_sessions": pd.Series([int(summ["n_start"].sum())],
                                dtype="int64"),
        "peak_concurrency": pd.Series([peak], dtype="int64"),
        "peak_ts": pd.Series(
            [np.datetime64(int(summ["argt"][first_blk]), "us")],
            dtype="datetime64[us]")})


def dedup_token_savings_documents(sf_dir: str):
    """Token savings from exact dedup (ORACLED): ONE row — raw doc
    count, distinct-text doc count, raw token total, the token total
    AFTER keeping one copy per distinct text, and the share of tokens
    dedup removes — the headline number a training-data budget reads
    before any fuzzy pass runs ("how much of the corpus is literal
    copies?"). The scan ships only (128-bit text hash, token count) —
    the dedup_exact digest convention (two independent 64-bit hashes;
    text never shuffles); ONE digest groupby yields BOTH sides at
    once: per distinct text the duplicate count n and Σtok, so raw
    totals are Σn / Σ(Σtok) and unique totals are the row count /
    Σ(Σtok ÷ n) — the division is exact (identical texts have
    identical token counts, so Σtok is divisible by n; asserted per
    block). Token = the corpus-wide \\S+ convention (token_counts ==
    SQL regexp_extract_all). Totals ride per-block DECIMAL-STRING
    partials into Python-int sums; share = two exact ints, ONE divide
    in SQL operand order, 6dp; a zero-token corpus answers SQL-NULL
    share. Null-text docs are invisible; an empty corpus answers the
    typed empty frame."""
    from ..sketches.hashing import hash64_array
    from ..text import token_counts
    ds = _read(sf_dir, "documents", columns=["text"])

    def prep(b: pa.Table) -> pa.Table:
        col = b["text"].combine_chunks()
        mask = col.is_valid()
        col = col.filter(mask)
        h1 = hash64_array(col).view(np.int64)
        h2 = hash64_array(col, seed=0x5851F42D4C957F2D).view(np.int64)
        tok = token_counts(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                         "tok": pa.array(tok)})

    g = grouped_agg_hash(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["h1", "h2"], {"tok": "sum_tok"}, count_alias="n")

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"nd": pa.array([], pa.string()),
                          "nu": pa.array([], pa.string()),
                          "tt": pa.array([], pa.string()),
                          "ut": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        n = b["n"].to_numpy(zero_copy_only=False).astype(object)
        st = b["sum_tok"].to_numpy(zero_copy_only=False).astype(object)
        uniq = st // n
        assert ((uniq * n) == st).all()   # identical texts, equal toks
        return pa.table({
            "nd": pa.array([str(int(n.sum()))]),
            "nu": pa.array([str(b.num_rows)]),
            "tt": pa.array([str(int(st.sum()))]),
            "ut": pa.array([str(int(uniq.sum()))])})

    parts = g.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=None).to_pandas()
    out_empty = pd.DataFrame({
        "n_docs": pd.Series([], dtype="int64"),
        "n_unique": pd.Series([], dtype="int64"),
        "total_tokens": pd.Series([], dtype="object"),
        "unique_tokens": pd.Series([], dtype="object"),
        "dup_token_share": pd.Series([], dtype="float64")})
    if parts.empty or "nd" not in parts.columns:
        return out_empty
    nd = sum(int(v) for v in parts["nd"])
    if nd == 0:
        return out_empty
    nu = sum(int(v) for v in parts["nu"])
    tt = sum(int(v) for v in parts["tt"])
    ut = sum(int(v) for v in parts["ut"])
    share = (float(duckdb_round(float(tt - ut) / float(tt), 6))
             if tt > 0 else float("nan"))
    return pd.DataFrame({
        "n_docs": pd.Series([nd], dtype="int64"),
        "n_unique": pd.Series([nu], dtype="int64"),
        "total_tokens": pd.Series([str(tt)], dtype="object"),
        "unique_tokens": pd.Series([str(ut)], dtype="object"),
        "dup_token_share": pd.Series([share], dtype="float64")})


def source_dup_matrix_documents(sf_dir: str):
    """Cross-source duplicate-leakage matrix (ORACLED): for every
    unordered source pair, the number of distinct texts appearing in
    BOTH — the provenance-contamination readout that tells a curation
    pipeline which feeds are re-crawls of each other (dup_rate_by_
    source says how duplicated each feed is internally; this says who
    copies whom). Same discipline as basket_brand_pairs with the
    basket keyed by the dedup_exact 128-bit text digest: per-batch
    distinct (digest, source) partials prune the shuffle (text never
    ships), ONE digest-hash partition rebuilds each text's sorted
    distinct source set and expands the k·(k−1)/2 pairs via
    ranges_concat (k is source-vocabulary-bounded), and the global
    pair aggregate is vocabulary²-bounded. A text seen twice in the
    SAME source only contributes nothing; null text / null source
    rows invisible; a corpus with no cross-source dup answers the
    typed empty frame."""
    from ..sketches.hashing import hash64_array
    from ..util import partitioned_group_apply, ranges_concat
    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("text").is_valid(),
                             b.column("source").is_valid()))
        col = t["text"].combine_chunks()
        h1 = hash64_array(col).view(np.int64)
        h2 = hash64_array(col, seed=0x5851F42D4C957F2D).view(np.int64)
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2),
                         "src": t.column("source")}) \
            .group_by(["h1", "h2", "src"]).aggregate([])

    partials = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def pairs(t: pa.Table) -> pa.Table:
        h1 = t.column("h1").to_numpy(zero_copy_only=False)
        h2 = t.column("h2").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        order = np.lexsort((src, h2, h1))
        h1, h2, src = h1[order], h2[order], src[order]
        first = np.ones(len(h1), dtype=bool)
        first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1]) \
            | (src[1:] != src[:-1])
        h1, h2, src = h1[first], h2[first], src[first]
        seg = np.ones(len(h1), dtype=bool)
        seg[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        seg_start = np.flatnonzero(seg)
        seg_end = np.append(seg_start[1:], len(h1))
        ends = np.repeat(seg_end, seg_end - seg_start)
        idx = np.arange(len(h1))
        lens = ends - idx - 1
        left = np.repeat(idx, lens)
        right = ranges_concat(idx + 1, lens)
        tb = pa.table({"source_a": pa.array(src[left], pa.string()),
                       "source_b": pa.array(src[right], pa.string())})
        agg = tb.group_by(["source_a", "source_b"]).aggregate(
            [([], "count_all")])
        return agg.rename_columns(["source_a", "source_b", "n_p"])

    agg = grouped_agg(
        partitioned_group_apply(partials, ["h1", "h2"], pairs,
                                batch_format="pyarrow"),
        ["source_a", "source_b"], {"n_p": "n_texts"},
        count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "source_a": pd.Series([], dtype="object"),
        "source_b": pd.Series([], dtype="object"),
        "n_texts": pd.Series([], dtype="int64")})
    if agg.empty or "source_a" not in agg.columns:
        return out_empty
    out = agg[["source_a", "source_b", "n_texts"]] \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    out["n_texts"] = out["n_texts"].astype("int64")
    return out


def knn_label_agreement_embeddings(sf_dir: str, *,
                                   broadcast_cap: int = 1 << 30):
    """1-NN label agreement per label (ORACLED): for every corpus
    vector, find its exact-cosine nearest neighbor (self excluded by
    id, ties by vec_id) and ask whether the neighbor shares its label
    — reported per label as (n, n_agree, agree_rate). This is the
    standard no-training kNN probe of embedding quality: a label
    whose vectors' nearest neighbors routinely wear other labels is a
    class the downstream classifier will confuse (centroid_distances
    sees prototype collapse; this sees boundary interleaving). The
    scorer is the ann_topk brute-force arm with the corpus itself as
    the query matrix (k=2 — the top-2 always contains a non-self row)
    — per corpus batch ONE matmul against the broadcast query matrix,
    per-batch partial top-k, only nq·2 candidate rows ever gather.
    Like ngram_jaccard / embedding_neardup_exact this is the
    all-pairs VERIFIER by design — quadratic in corpus size; the
    scale path for the same question is the IVF probe
    (ann_ivf_embeddings) over a label-stratified sample. Like its
    verifier siblings (exact_cosine_pairs embedding.py, ngram-Jaccard
    ngram.py) the driver gather is CAP-GATED: a cleaned corpus whose
    measured size exceeds ``broadcast_cap`` bytes refuses loudly with
    that guidance instead of OOMing the driver at scale. Rows with
    null vec_id / embedding / label neither query nor serve;
    a corpus with fewer than two surviving vectors answers the typed
    empty frame. agree_rate = two exact ints, ONE divide in SQL
    operand order, 6dp."""
    from ..ann import brute_force_topk
    ds = _read(sf_dir, "embeddings",
               columns=["vec_id", "embedding", "label"])

    def clean(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.and_(b.column("vec_id").is_valid(),
                    b.column("embedding").is_valid()),
            b.column("label").is_valid()))

    ds = ds.map_batches(clean, batch_format="pyarrow",
                        zero_copy_batch=True, batch_size=131072)
    source = ds.materialize()
    if source.size_bytes() > broadcast_cap:
        raise ValueError(
            "knn_label_agreement_embeddings is the all-pairs verifier; "
            f"corpus exceeds broadcast cap ({source.size_bytes()} > "
            f"{broadcast_cap} B) — probe with ann_ivf_embeddings over a "
            "label-stratified sample at scale")
    ds = source
    q = ds.to_pandas()           # the broadcast query side (verifier)
    out_empty = pd.DataFrame({
        "label": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "n_agree": pd.Series([], dtype="int64"),
        "agree_rate": pd.Series([], dtype="float64")})
    if len(q) < 2 or "vec_id" not in q.columns:
        return out_empty
    q = q.sort_values("vec_id").reset_index(drop=True)
    topk = brute_force_topk(ds, list(q["embedding"]),
                            query_ids=q["vec_id"].to_numpy(), k=2)
    nn = topk[topk["vec_id"] != topk["query_id"]] \
        .sort_values(["query_id", "rank"]) \
        .groupby("query_id", sort=True).head(1)
    lab = dict(zip(q["vec_id"].astype(np.int64),
                   q["label"].astype(np.int64)))
    qlab = nn["query_id"].map(lab).to_numpy()
    clab = nn["vec_id"].map(lab).to_numpy()
    rows = []
    for lbl in np.unique(qlab):
        m = qlab == lbl
        n, na = int(m.sum()), int((clab[m] == lbl).sum())
        rows.append({"label": int(lbl), "n": n, "n_agree": na,
                     "agree_rate": float(duckdb_round(
                         float(na) / float(n), 6))})
    out = pd.DataFrame(rows)
    out["label"] = out["label"].astype("int64")
    out["n"] = out["n"].astype("int64")
    out["n_agree"] = out["n_agree"].astype("int64")
    out["agree_rate"] = out["agree_rate"].astype("float64")
    return out


def interarrival_cv_by_type(sf_dir: str):
    """Burstiness of each event type (ORACLED): per event_type, the
    count, mean and coefficient of variation of the microsecond gaps
    between consecutive SAME-TYPE events of the SAME user — the
    standard burstiness diagnostic (a memoryless Poisson stream sits
    at CV ≈ 1, schedules sit below, bursts sit above; fano_daily
    reads the same dispersion story on the daily grid, this reads it
    on the raw timeline). All moments are EXACT integers end to end:
    gaps are int64 µs, per-partition partials carry (n, Σgap, Σgap²)
    with the squared sums as DECIMAL STRINGS through object-int
    arithmetic (a month-long gap squares past 2^62), and the driver
    finishes with Python-int totals. CV collapses to ONE deterministic
    expression over exact ints — sqrt(n·S2 − S1²)/S1 (algebraically
    population-std/mean; Cauchy-Schwarz keeps the radicand ≥ 0 in
    exact arithmetic, which float moments cannot promise) — mirrored
    operand-for-operand in SQL, 6dp. Equal timestamps gap 0 in any
    order (no tie column rides the shuffle); a type whose users all
    have one event produces NO row; an all-zero-gap type answers
    SQL-NULL cv; null user/ts/type rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("user_id").is_valid(),
                    b.column("ts").is_valid()),
            b.column("event_type").is_valid()))
        return pa.table({
            "u": t.column("user_id"),
            "t": t.column("event_type"),
            "ts": pc.cast(t.column("ts"), pa.int64())})

    def kernel(tb: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "s1": pa.array([], pa.string()),
                          "s2": pa.array([], pa.string())})
        if tb.num_rows == 0:
            return empty
        u = tb.column("u").to_numpy(zero_copy_only=False)
        ts = tb.column("ts").to_numpy(zero_copy_only=False)
        ty = tb.column("t").to_numpy(zero_copy_only=False)
        uty, code = np.unique(ty, return_inverse=True)
        order = np.lexsort((ts, u, code))
        code, u, ts = code[order], u[order], ts[order]
        same = np.zeros(len(u), dtype=bool)
        same[1:] = (code[1:] == code[:-1]) & (u[1:] == u[:-1])
        gaps = (ts[1:] - ts[:-1])[same[1:]]
        gcode = code[1:][same[1:]]
        if not len(gaps):
            return empty
        rows = {"t": [], "n": [], "s1": [], "s2": []}
        for ci in np.unique(gcode):
            g = gaps[gcode == ci].astype(object)
            rows["t"].append(str(uty[ci]))
            rows["n"].append(int(len(g)))
            rows["s1"].append(str(int(g.sum())))
            rows["s2"].append(str(int((g * g).sum())))
        return pa.table({"t": pa.array(rows["t"], pa.string()),
                         "n": pa.array(rows["n"], pa.int64()),
                         "s1": pa.array(rows["s1"], pa.string()),
                         "s2": pa.array(rows["s2"], pa.string())})

    parts = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u"], kernel, batch_format="pyarrow").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_gaps": pd.Series([], dtype="int64"),
        "mean_gap_us": pd.Series([], dtype="float64"),
        "cv": pd.Series([], dtype="float64")})
    if parts.empty or "t" not in parts.columns:
        return out_empty
    rows = []
    for t, g in parts.groupby("t", sort=True):
        n = int(g["n"].sum())
        s1 = sum(int(v) for v in g["s1"])
        s2 = sum(int(v) for v in g["s2"])
        mean = float(duckdb_round(float(s1) / float(n), 6))
        cv = (float(duckdb_round(
            math.sqrt(float(n * s2 - s1 * s1)) / float(s1), 6))
            if s1 > 0 else float("nan"))
        rows.append({"event_type": t, "n_gaps": n,
                     "mean_gap_us": mean, "cv": cv})
    out = pd.DataFrame(rows)
    out["n_gaps"] = out["n_gaps"].astype("int64")
    out["mean_gap_us"] = out["mean_gap_us"].astype("float64")
    out["cv"] = out["cv"].astype("float64")
    return out


def time_to_first_error_events(sf_dir: str):
    """Time-to-first-error survival summary (ORACLED): over each
    user's timeline, the µs delay from their FIRST event to their
    first 'error' event — reported as a fixed six-row (stat, value)
    frame: user count, users reaching an error, censored users (never
    erroring — the survival-analysis censoring count, reported rather
    than silently dropped), and the exact p25/p50/p75 of the delay
    over uncensored users (quantile_disc semantics: 0-based index
    ceil(q·n)−1, the quantity_percentiles convention). ONE user-hash
    partition computes both mins per user (a user whose first event
    IS the error answers delay 0); only (delta, n) histogram partials
    leave, with censored users riding the null-delta key (null keys
    co-locate in grouped_agg_hash). The driver's cumulative index
    over the distinct-delay histogram is the _distinct_quantiles
    discipline — exact for auditable bounds; at 100-TB continuous-
    delay cardinality the scale path is the t-digest machinery
    (stages/stats), stated here as there. Null user/ts/type rows
    invisible; an empty corpus still answers the six typed rows
    (counts 0, SQL-NULL quantiles) — the shape is constant."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("user_id").is_valid(),
                    b.column("ts").is_valid()),
            b.column("event_type").is_valid()))
        return pa.table({
            "u": t.column("user_id"),
            "err": pc.equal(t.column("event_type"), "error"),
            "ts": pc.cast(t.column("ts"), pa.int64())})

    def kernel(tb: pa.Table) -> pa.Table:
        empty = pa.table({"delta": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if tb.num_rows == 0:
            return empty
        u = tb.column("u").to_numpy(zero_copy_only=False)
        ts = tb.column("ts").to_numpy(zero_copy_only=False)
        er = tb.column("err").to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, u))
        u, ts, er = u[order], ts[order], er[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        users, t0 = u[first], ts[first]
        ue, te_all = u[er], ts[er]
        fe = np.ones(len(ue), dtype=bool)
        fe[1:] = ue[1:] != ue[:-1]
        ue, te = ue[fe], te_all[fe]
        pos = np.searchsorted(users, ue)
        delta = te - t0[pos]
        n_cens = len(users) - len(ue)
        gs, cnt = (np.unique(delta, return_counts=True)
                   if len(delta) else (np.array([], np.int64),
                                       np.array([], np.int64)))
        dcol = list(gs.astype(np.int64)) + ([None] if n_cens else [])
        ncol = list(cnt.astype(np.int64)) + ([n_cens] if n_cens else [])
        return pa.table({"delta": pa.array(dcol, pa.int64()),
                         "n_p": pa.array(ncol, pa.int64())})

    from ..util import partitioned_group_apply
    agg = grouped_agg_hash(
        partitioned_group_apply(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
            ["u"], kernel, batch_format="pyarrow"),
        ["delta"], {"n_p": "n"}, count_alias="_p").to_pandas()
    if agg.empty or "delta" not in agg.columns:
        agg = pd.DataFrame({"delta": [], "n": []})
    cens = int(agg.loc[agg["delta"].isna(), "n"].sum())
    h = agg.dropna(subset=["delta"]).sort_values("delta") \
        .reset_index(drop=True)
    n_err = int(h["n"].sum()) if len(h) else 0
    n_users = n_err + cens
    cum = h["n"].cumsum().to_numpy() if len(h) else np.array([])

    def qdisc(q):
        if n_err == 0:
            return float("nan")
        k = max(int(math.ceil(q * n_err)) - 1, 0)
        return float(h["delta"].to_numpy()[np.searchsorted(cum, k + 1)])

    rows = [("n_users", float(n_users)),
            ("n_with_error", float(n_err)),
            ("n_censored", float(cens)),
            ("p25_us", qdisc(0.25)),
            ("p50_us", qdisc(0.50)),
            ("p75_us", qdisc(0.75))]
    return pd.DataFrame({"stat": [r[0] for r in rows],
                         "value": pd.Series([r[1] for r in rows],
                                            dtype="float64")})


def vocab_overlap_by_lang(sf_dir: str):
    """Vocabulary overlap between languages (ORACLED): for every
    language pair sharing at least one term, the distinct-term
    intersection, both vocabulary sizes, and the vocabulary Jaccard —
    the multilingual-corpus diagnostic that flags mislabeled
    languages and code-switching feeds (two 'different' languages
    whose vocabularies overlap heavily are one language wearing two
    tags; langid disagreement shows up here before any classifier
    runs). Terms are the corpus-wide space-split convention
    (term_frequency == SQL string_split + empty drop). Per-batch
    distinct (term, lang) partials prune the shuffle; ONE term-hash
    partition holds every language of a term, so global dedup, the
    per-language vocabulary-size partials AND the k·(k−1)/2 language
    pairs (ranges_concat, k ≤ language vocabulary) all come out of
    the same kernel — sizes ride the SAME output table on the
    null-lang_b key (null keys co-locate in grouped_agg), so ONE
    grouped sum finishes everything. jaccard = inter/(|A|+|B|−inter)
    over exact ints, ONE divide in SQL operand order, 6dp. Null
    text/lang rows invisible; languages with no shared term produce
    no row; fewer than two languages answers the typed empty frame."""
    from ..util import partitioned_group_apply, ranges_concat
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("text").is_valid(),
                             b.column("lang").is_valid()))
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        n_per = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        lang = pa.array(np.repeat(
            t["lang"].to_numpy(zero_copy_only=False), n_per))
        tb = pa.table({"term": flat, "lang": lang})
        tb = tb.filter(pc.not_equal(tb["term"], ""))
        return tb.group_by(["term", "lang"]).aggregate([])

    partials = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"lang_a": pa.array([], pa.string()),
                          "lang_b": pa.array([], pa.string()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        term = t.column("term").to_numpy(zero_copy_only=False)
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        order = np.lexsort((lang, term))
        term, lang = term[order], lang[order]
        first = np.ones(len(term), dtype=bool)
        first[1:] = (term[1:] != term[:-1]) | (lang[1:] != lang[:-1])
        term, lang = term[first], lang[first]     # global distinct
        # per-language vocabulary sizes → (lang, NULL, n) rows
        ul, cnt = np.unique(lang, return_counts=True)
        sizes = pa.table({
            "lang_a": pa.array(ul, pa.string()),
            "lang_b": pa.array([None] * len(ul), pa.string()),
            "n_p": pa.array(cnt.astype(np.int64))})
        # per-term language pairs
        seg = np.ones(len(term), dtype=bool)
        seg[1:] = term[1:] != term[:-1]
        seg_start = np.flatnonzero(seg)
        seg_end = np.append(seg_start[1:], len(term))
        ends = np.repeat(seg_end, seg_end - seg_start)
        idx = np.arange(len(term))
        lens = ends - idx - 1
        left = np.repeat(idx, lens)
        right = ranges_concat(idx + 1, lens)
        prs = pa.table({"lang_a": pa.array(lang[left], pa.string()),
                        "lang_b": pa.array(lang[right], pa.string())})
        agg = prs.group_by(["lang_a", "lang_b"]).aggregate(
            [([], "count_all")]).rename_columns(
            ["lang_a", "lang_b", "n_p"])
        return pa.concat_tables([sizes, agg])

    agg = grouped_agg(
        partitioned_group_apply(partials, ["term"], kernel,
                                batch_format="pyarrow"),
        ["lang_a", "lang_b"], {"n_p": "n"}, count_alias="_c") \
        .to_pandas()
    out_empty = pd.DataFrame({
        "lang_a": pd.Series([], dtype="object"),
        "lang_b": pd.Series([], dtype="object"),
        "n_common": pd.Series([], dtype="int64"),
        "n_a": pd.Series([], dtype="int64"),
        "n_b": pd.Series([], dtype="int64"),
        "jaccard": pd.Series([], dtype="float64")})
    if agg.empty or "lang_a" not in agg.columns:
        return out_empty
    sizes = {r["lang_a"]: int(r["n"])
             for _, r in agg[agg["lang_b"].isna()].iterrows()}
    pairs = agg[agg["lang_b"].notna()].sort_values(["lang_a", "lang_b"])
    if pairs.empty:
        return out_empty
    rows = []
    for _, r in pairs.iterrows():
        inter = int(r["n"])
        na, nb = sizes[r["lang_a"]], sizes[r["lang_b"]]
        rows.append({
            "lang_a": r["lang_a"], "lang_b": r["lang_b"],
            "n_common": inter, "n_a": na, "n_b": nb,
            "jaccard": float(duckdb_round(
                float(inter) / float(na + nb - inter), 6))})
    out = pd.DataFrame(rows).reset_index(drop=True)
    for c in ("n_common", "n_a", "n_b"):
        out[c] = out[c].astype("int64")
    out["jaccard"] = out["jaccard"].astype("float64")
    return out


def effective_dim_embeddings(sf_dir: str):
    """Effective dimensionality / participation ratio (ORACLED): ONE
    row — vector count, total variance (covariance trace) and the
    participation ratio PR = (Σᵢvarᵢ)² / Σᵢⱼcovᵢⱼ² — the
    eigenvalue-free collapse diagnostic of representation learning
    (PR ≈ dim for isotropic embeddings, PR → 1 when the space
    collapses onto one direction; pca_embeddings reports the spectrum
    itself but needs an eigensolver SQL lacks — PR is the
    SQL-expressible summary of that same spectrum, since
    (Σλ)²/Σλ² ≡ trace²/‖C‖²_F). The corpus-sized work is exactly the
    embedding_covariance moment pass (O(dim²) partials per batch,
    vectors never shuffle); both engines then compute PR from the
    SAME 6dp-quantized covariance entries (the oracled
    embedding_covariance contract), with off-diagonals counted twice
    for the symmetric Frobenius norm — so the only float risk left is
    the 576-term sum order, hidden behind the final 6dp round like
    every mean in the repo. Null embeddings excluded; fewer than two
    usable vectors answers the typed empty frame (SQL covar_samp
    NULL)."""
    from ..ann.pca import covariance
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    cov, _mean, n = covariance(ds, strict=False)
    out_empty = pd.DataFrame({
        "n": pd.Series([], dtype="int64"),
        "total_var": pd.Series([], dtype="float64"),
        "participation_ratio": pd.Series([], dtype="float64")})
    if cov is None or n < 2:
        return out_empty
    c = np.round(cov, 6)                 # the oracled quantization
    tr = float(np.sum(np.diag(c)))
    w = np.full(c.shape, 2.0)
    np.fill_diagonal(w, 1.0)
    iu = np.triu_indices(c.shape[0])
    frob = float(np.sum(w[iu] * c[iu] * c[iu]))
    if frob == 0.0:
        pr = float("nan")                # zero-variance corpus
    else:
        pr = float(duckdb_round(tr * tr / frob, 6))
    return pd.DataFrame({
        "n": pd.Series([n], dtype="int64"),
        "total_var": pd.Series([float(duckdb_round(tr, 6))],
                               dtype="float64"),
        "participation_ratio": pd.Series([pr], dtype="float64")})


def order_completion_days_histogram(sf_dir: str):
    """Order-completion lag histogram (ORACLED): per order, the
    whole-day gap from order date to the LAST shipment of any of its
    line items — histogrammed with shares — the fulfillment-SLA
    readout from the order's point of view (ship_delay_by_month reads
    per-lineitem delays; an order is only DONE when its slowest line
    ships, so this is the customer-visible distribution). NO join
    operator: both tables ride ONE orderkey-hash co-partition as a
    tagged union (src 0 = order date, src 1 = ship date), the kernel
    takes the per-key src-1 max by sorted last-of-segment and pairs
    every order row against it via searchsorted — orders whose line
    items all lack ship dates (or have none) drop exactly like the
    SQL inner join. Only delay-range-bounded (delay, n) partials
    leave each partition (grouped_agg_hash finishes them — the
    ship_delay lesson: this corpus draws dates independently, so the
    key space is ±range, not fulfillment-clustered); share = two
    exact ints, ONE divide in SQL operand order, 6dp. Null keys /
    dates invisible."""
    from ..util import partitioned_group_apply
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def prep_li(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("l_orderkey").is_valid(),
                             b.column("l_shipdate").is_valid()))
        d = pc.cast(pc.cast(t.column("l_shipdate"), pa.date32()),
                    pa.int32())
        return pa.table({"k": t.column("l_orderkey"),
                         "d": pc.cast(d, pa.int64()),
                         "src": pa.array(
                             np.ones(t.num_rows, dtype=np.int8))})

    def prep_od(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_orderkey").is_valid(),
                             b.column("o_orderdate").is_valid()))
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32())
        return pa.table({"k": t.column("o_orderkey"),
                         "d": pc.cast(d, pa.int64()),
                         "src": pa.array(
                             np.zeros(t.num_rows, dtype=np.int8))})

    u = li.map_batches(prep_li, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072) \
        .union(od.map_batches(prep_od, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072))

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"delay": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        m1 = src == 1
        k1, d1 = k[m1], d[m1]
        if not len(k1):
            return empty
        order = np.lexsort((d1, k1))
        k1, d1 = k1[order], d1[order]
        last = np.ones(len(k1), dtype=bool)
        last[:-1] = k1[:-1] != k1[1:]
        kmax, dmax = k1[last], d1[last]
        k0, d0 = k[~m1], d[~m1]
        if not len(k0):
            return empty
        pos = np.searchsorted(kmax, k0)
        pos_c = np.minimum(pos, len(kmax) - 1)
        valid = kmax[pos_c] == k0
        delay = dmax[pos_c][valid] - d0[valid]
        if not len(delay):
            return empty
        gs, cnt = np.unique(delay, return_counts=True)
        return pa.table({"delay": pa.array(gs.astype(np.int64)),
                         "n_p": pa.array(cnt.astype(np.int64))})

    parts = partitioned_group_apply(u, ["k"], kernel,
                                    batch_format="pyarrow")
    agg = grouped_agg_hash(parts, ["delay"], {"n_p": "n"},
                           count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "delay_days": pd.Series([], dtype="int64"),
        "n_orders": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "delay" not in agg.columns:
        return out_empty
    agg = agg.sort_values("delay").reset_index(drop=True)
    total = sum(int(x) for x in agg["n"])
    return pd.DataFrame({
        "delay_days": agg["delay"].astype("int64"),
        "n_orders": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def spend_trend_customers(sf_dir: str):
    """Spend-trend census (ORACLED): classify every customer with
    orders on ≥ 2 distinct days by the SIGN of their OLS spend-vs-time
    slope — growing / shrinking / flat — and report the counts plus
    the growing share; the churn-risk census a retention team reads
    (price_qty_regr reports one slope per brand; this classifies a
    slope per CUSTOMER, where reporting millions of float slopes is
    useless but their sign census is the metric). The whole
    classification is EXACT INTEGER arithmetic — no float touches the
    decision: slope sign = sign(n·Σxy − Σx·Σy) with x = epoch days,
    y = cents (the denominator n·Σxx − Σx² is positive whenever ≥ 2
    distinct days, so it never flips the sign), computed per customer
    from ONE customer-hash partition's object-int partials (day·cents
    products pass 2^53 at whale scale; the kernel ships classified
    COUNTS, not moments, so nothing wider than four ints leaves any
    partition). share = two exact ints, ONE divide in SQL operand
    order, 6dp. Same-day repeat orders collapse into the regression
    as separate equal-x points (pinned: they tilt nothing by
    themselves); single-day customers are excluded as slope-undefined
    rather than counted flat; null custkey/date/price rows
    invisible; no classifiable customer → typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32())
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "x": pc.cast(d, pa.int64()),
            "y": pa.array(np.rint(v * 100.0).astype(np.int64))})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"sgn": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t.column("c").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        order = np.lexsort((x, c))
        c, x, y = c[order], x[order], y[order]
        first = np.ones(len(c), dtype=bool)
        first[1:] = c[1:] != c[:-1]
        gid = np.cumsum(first) - 1
        k = int(gid[-1]) + 1
        starts = np.flatnonzero(first)
        n = np.diff(np.r_[starts, len(c)])
        xo, yo = x.astype(object), y.astype(object)
        sx = np.add.reduceat(xo, starts)
        sy = np.add.reduceat(yo, starts)
        sxy = np.add.reduceat(xo * yo, starts)
        # distinct-day count per customer (sorted by (c, x))
        newday = np.ones(len(c), dtype=bool)
        newday[1:] = first[1:] | (x[1:] != x[:-1])
        ndays = np.bincount(gid[newday], minlength=k)
        num = n.astype(object) * sxy - sx * sy
        sgn = np.where([v > 0 for v in num], 1,
                       np.where([v < 0 for v in num], -1, 0))
        keep = ndays >= 2
        if not keep.any():
            return empty
        gs, cnt = np.unique(sgn[keep], return_counts=True)
        return pa.table({"sgn": pa.array(gs.astype(np.int64)),
                         "n_p": pa.array(cnt.astype(np.int64))})

    agg = grouped_agg(
        partitioned_group_apply(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
            ["c"], kernel, batch_format="pyarrow"),
        ["sgn"], {"n_p": "n"}, count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "n_cust": pd.Series([], dtype="int64"),
        "n_growing": pd.Series([], dtype="int64"),
        "n_shrinking": pd.Series([], dtype="int64"),
        "n_flat": pd.Series([], dtype="int64"),
        "share_growing": pd.Series([], dtype="float64")})
    if agg.empty or "sgn" not in agg.columns:
        return out_empty
    by = {int(r["sgn"]): int(r["n"]) for _, r in agg.iterrows()}
    up, dn, fl = by.get(1, 0), by.get(-1, 0), by.get(0, 0)
    total = up + dn + fl
    return pd.DataFrame({
        "n_cust": pd.Series([total], dtype="int64"),
        "n_growing": pd.Series([up], dtype="int64"),
        "n_shrinking": pd.Series([dn], dtype="int64"),
        "n_flat": pd.Series([fl], dtype="int64"),
        "share_growing": pd.Series(
            [float(duckdb_round(float(up) / float(total), 6))],
            dtype="float64")})


def gains_by_segment_customers(sf_dir: str, k: int = 5):
    """Per-segment cumulative-gains (Lorenz) table (ORACLED): within
    every market segment, customers in spend quintiles, each reporting
    its exact cents total and the share of the SEGMENT's revenue
    captured by this quintile and every richer one — the
    concentration-by-audience readout ("does revenue concentrate
    harder in BUILDING than in MACHINERY?") that gains_spend answers
    only globally. This is the GROUPED extension of the distributed-
    NTILE block discipline: segment attaches from ONE broadcast
    customer dict (the basket_brand convention), ONE sort orders
    (segment, spend, custkey), and because blocks may SPAN segments
    the block summary reports per-segment sub-counts keyed by the
    block's first triple; the driver computes per-(block, segment)
    running offsets, and the second block-aligned pass ranks each row
    within its segment-run (local index + segment offset) — position-
    based NTILE per partition with zero joins and ≤ segments·k partial
    rows per block. Cents ride DECIMAL STRINGS; the per-segment
    top-down cumulative and every share divide are exact Python ints,
    ONE divide in SQL operand order, 6dp. Orders whose customer is
    unknown or unsegmented drop like the SQL inner join; quintile k
    is the richest band (cum_share_top = 1.0 at quintile 1 by
    construction); empty → typed empty frame."""
    import ray as _ray

    from ..util import worker_cached
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    out_empty = pd.DataFrame({
        "segment": pd.Series([], dtype="object"),
        "quintile": pd.Series([], dtype="int64"),
        "n_cust": pd.Series([], dtype="int64"),
        "cents": pd.Series([], dtype="object"),
        "cum_share_top": pd.Series([], dtype="float64")})
    if "c_custkey" not in cust.columns or cust.empty:
        return out_empty
    cust = cust.dropna(subset=["c_custkey", "c_mktsegment"])
    seg_ref = _ray.put(dict(zip(cust["c_custkey"].astype(np.int64),
                                cust["c_mktsegment"])))
    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        t = _broadcast_lookup_batch(t, ref=seg_ref, key="o_custkey",
                                    out="seg")
        t = t.filter(t.column("seg").is_valid())
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "seg": t.column("seg"), "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    spend = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["seg", "c"], {"cents": "spend"}, count_alias="_c") \
        .select_columns(["seg", "c", "spend"]) \
        .sort(["seg", "spend", "c"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        empty = pa.table({"g0": pa.array([], pa.string()),
                          "s0": pa.array([], pa.int64()),
                          "c0": pa.array([], pa.int64()),
                          "seg": pa.array([], pa.string()),
                          "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        seg = b["seg"].to_numpy(zero_copy_only=False)
        us, cnt = np.unique(seg, return_counts=True)
        m = len(us)
        return pa.table({
            "g0": pa.array([str(seg[0])] * m),
            "s0": pa.array([b["spend"][0].as_py()] * m, pa.int64()),
            "c0": pa.array([b["c"][0].as_py()] * m, pa.int64()),
            "seg": pa.array([str(x) for x in us]),
            "cnt": pa.array(cnt.astype(np.int64))})

    summ = spend.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "g0" not in summ.columns:
        return out_empty
    blocks = summ.sort_values(["g0", "s0", "c0"])
    # per-segment totals and per-(block, segment) running offsets
    n_seg = {s: int(g["cnt"].sum()) for s, g in blocks.groupby("seg")}
    offsets, run = {}, {}
    for (g0, s0, c0), grp in blocks.groupby(["g0", "s0", "c0"],
                                            sort=True):
        bkey = (str(g0), int(s0), int(c0))
        offsets[bkey] = {}
        for _, r in grp.iterrows():
            s = str(r["seg"])
            offsets[bkey][s] = run.get(s, 0)
            run[s] = run.get(s, 0) + int(r["cnt"])
    ref = _ray.put((offsets, n_seg, k))

    def bucketize(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"seg": pa.array([], pa.string()),
                          "q": pa.array([], pa.int64()),
                          "n_part": pa.array([], pa.int64()),
                          "cents_part": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        offs_all, nseg, kk = worker_cached(
            ("gains_seg", ref.hex()), lambda: _ray.get(ref))
        seg = b["seg"].to_numpy(zero_copy_only=False)
        s = b["spend"].to_numpy(zero_copy_only=False)
        c = b["c"].to_numpy(zero_copy_only=False)
        bkey = (str(seg[0]), int(s[0]), int(c[0]))
        offs = offs_all[bkey]
        rows = {"seg": [], "q": [], "n_part": [], "cents_part": []}
        start = 0
        for sv in pd.unique(seg):
            m = seg == sv
            cnt = int(m.sum())
            pos = offs[str(sv)] + np.arange(cnt)
            n = nseg[str(sv)]
            size, rem = divmod(n, kk)
            cut = rem * (size + 1)
            q = np.where(pos < cut,
                         pos // max(size + 1, 1),
                         rem + (pos - cut) // max(size, 1)) + 1
            sm = s[m]
            for qv in np.unique(q):
                qm = q == qv
                rows["seg"].append(str(sv))
                rows["q"].append(int(qv))
                rows["n_part"].append(int(qm.sum()))
                rows["cents_part"].append(
                    str(int(sm[qm].astype(object).sum())))
            start += cnt
        return pa.table({
            "seg": pa.array(rows["seg"], pa.string()),
            "q": pa.array(rows["q"], pa.int64()),
            "n_part": pa.array(rows["n_part"], pa.int64()),
            "cents_part": pa.array(rows["cents_part"], pa.string())})

    parts = spend.map_batches(bucketize, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).to_pandas()
    if parts.empty or "seg" not in parts.columns:
        return out_empty
    rows = []
    for sv, g in parts.groupby("seg", sort=True):
        agg = {}
        for qv, gg in g.groupby("q"):
            agg[int(qv)] = (int(gg["n_part"].sum()),
                            sum(int(x) for x in gg["cents_part"]))
        total = sum(v[1] for v in agg.values())
        cum = 0
        for qv in sorted(agg, reverse=True):
            cum += agg[qv][1]
            share = (float(duckdb_round(float(cum) / float(total), 6))
                     if total > 0 else None)
            rows.append({"segment": sv, "quintile": qv,
                         "n_cust": agg[qv][0],
                         "cents": str(agg[qv][1]),
                         "cum_share_top": share})
    out = pd.DataFrame(rows).sort_values(["segment", "quintile"]) \
        .reset_index(drop=True)
    out["quintile"] = out["quintile"].astype("int64")
    out["n_cust"] = out["n_cust"].astype("int64")
    out["cum_share_top"] = out["cum_share_top"].astype("float64")
    return out


def ivf_recall_embeddings(sf_dir: str):
    """IVF recall@10 vs exact (rows-only): per standard query vector,
    |IVF top-10 ∩ exact top-10| / 10 with nprobe=4 of 16 cells, plus
    a 'mean' row — the ANN quality dial an index operator watches
    when trading nprobe for latency (ann_ivf_embeddings is the
    probe; ann_topk the truth; this is their agreement). Rows-only:
    the kmeans cell assignment is deterministic (seeded) but has no
    SQL form; both rankings are the already-tested distributed
    scorers, so this adds measurement, not new corpus passes."""
    from ..ann import brute_force_topk, ivf_topk
    vecs, ids = _query_vectors(sf_dir)
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, vecs, query_ids=ids, k=10)
    ivf = ivf_topk(ds, vecs, query_ids=ids, k=10, ncells=16, nprobe=4)
    rows = []
    for qid in ids:
        e = set(exact[exact["query_id"] == qid]["vec_id"])
        a = set(ivf[ivf["query_id"] == qid]["vec_id"])
        rows.append({"query_id": str(int(qid)),
                     "recall_at_10": float(duckdb_round(
                         len(e & a) / max(len(e), 1), 6))})
    mean = (float(duckdb_round(
        sum(r["recall_at_10"] for r in rows) / len(rows), 6))
        if rows else float("nan"))
    rows.append({"query_id": "mean", "recall_at_10": mean})
    out = pd.DataFrame(rows)
    out["recall_at_10"] = out["recall_at_10"].astype("float64")
    return out


def minhash_estimate_error_documents(sf_dir: str):
    """Minhash estimate calibration over the LSH's own candidates
    (ORACLED): per md5-banded candidate pair, the 16-permutation
    Jaccard ESTIMATE, the EXACT shingle-set Jaccard, and |error| —
    the table that says how far the sketch the dedup pipeline acts
    on can drift from truth at this band shape (the ngram_jaccard
    verifier measures pairs the LSH found; this also scores the
    ESTIMATE itself). Driver work is pair-bounded by LSH selectivity;
    corpus passes are the unchanged distributed md5 machinery."""
    from ..dedup.md5lsh import estimate_error_pairs_md5
    return estimate_error_pairs_md5(
        _read(sf_dir, "documents", columns=["doc_id", "text"]))


def null_profile_lineitem(sf_dir: str):
    """Column null profile (ORACLED): for every lineitem column, the
    row count, null count and null share — the first data-quality
    scan any ingestion gate runs (column_stats summarizes values;
    this audits PRESENCE, and its per-column loop is driven by the
    live Arrow schema, not a hand-kept list, so a schema change is
    profiled automatically). ONE corpus scan: per batch, ONE
    null_count per column (Arrow reads validity bitmaps — no value
    materializes), shipping a column-vocabulary-bounded (column,
    n_rows, n_null) partial; share = two exact ints, ONE divide in
    SQL operand order, 6dp. An empty table still answers one row per
    column (counts 0, SQL-NULL share) — the shape is the schema."""
    ds = _read(sf_dir, "lineitem")

    def prof(b: pa.Table) -> pa.Table:
        names = [f.name for f in b.schema]
        return pa.table({
            "col": pa.array(names, pa.string()),
            "n_p": pa.array([b.num_rows] * len(names), pa.int64()),
            "null_p": pa.array(
                [b.column(n).null_count for n in names], pa.int64())})

    agg = grouped_agg(
        ds.map_batches(prof, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["col"], {"n_p": "n", "null_p": "nn"},
        count_alias="_b").to_pandas()
    import pyarrow.parquet as pq
    schema_cols = [f.name for f in
                   pq.read_schema(f"{sf_dir}/lineitem.parquet")]
    counts = ({str(r["col"]): (int(r["n"]), int(r["nn"]))
               for _, r in agg.iterrows()}
              if not agg.empty and "col" in agg.columns else {})
    rows = []
    for c in schema_cols:
        n, nn = counts.get(c, (0, 0))
        rows.append({
            "column": c, "n_rows": n, "n_null": nn,
            "null_share": (float(duckdb_round(float(nn) / float(n), 6))
                           if n > 0 else float("nan"))})
    out = pd.DataFrame(rows).sort_values("column") \
        .reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_null"] = out["n_null"].astype("int64")
    out["null_share"] = out["null_share"].astype("float64")
    return out


def daily_trend_by_type(sf_dir: str):
    """Daily-count OLS trend per event type (ORACLED): regress each
    type's daily event count on the epoch day over its OBSERVED days
    and report the slope — events/day drift, the simplest "is this
    stream growing or dying" readout (kendall_tau answers the same
    question rank-robustly; cusum localizes the change; this gives
    the fitted rate). The slope is an exact RATIONAL: with x = epoch
    days and y = day counts, num = n·Σxy − Σx·Σy and
    den = n·Σxx − Σx·Σx are exact integers (shipped as DECIMAL
    STRINGS — day·count products pass 2^53 at corpus scale), reported
    alongside slope = num/den as ONE double divide in SQL operand
    order, 6dp. The daily grid is calendar-bounded: ONE grouped count
    per (type, day), then per-type moment partials per block — the
    corpus never re-shuffles. A single-day type has den = 0 →
    SQL-NULL slope (reported, not dropped); null ts/type rows
    invisible; empty → typed empty frame."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"t": t.column("event_type"),
                         "d": pc.cast(d, pa.int64())})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["t", "d"], {}, count_alias="y")

    def moments(b: pa.Table) -> pa.Table:
        empty = pa.table({"t": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "sx": pa.array([], pa.string()),
                          "sy": pa.array([], pa.string()),
                          "sxx": pa.array([], pa.string()),
                          "sxy": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        t = b["t"].to_numpy(zero_copy_only=False)
        x = b["d"].to_numpy(zero_copy_only=False).astype(object)
        y = b["y"].to_numpy(zero_copy_only=False).astype(object)
        rows = {"t": [], "n": [], "sx": [], "sy": [], "sxx": [],
                "sxy": []}
        for tv in pd.unique(t):
            m = t == tv
            xm, ym = x[m], y[m]
            rows["t"].append(str(tv))
            rows["n"].append(int(m.sum()))
            rows["sx"].append(str(int(xm.sum())))
            rows["sy"].append(str(int(ym.sum())))
            rows["sxx"].append(str(int((xm * xm).sum())))
            rows["sxy"].append(str(int((xm * ym).sum())))
        return pa.table({k: pa.array(v, pa.string() if k not in
                                     ("n",) else pa.int64())
                         for k, v in rows.items()})

    parts = daily.map_batches(moments, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=None).to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_days": pd.Series([], dtype="int64"),
        "slope_num": pd.Series([], dtype="object"),
        "slope_den": pd.Series([], dtype="object"),
        "slope": pd.Series([], dtype="float64")})
    if parts.empty or "t" not in parts.columns:
        return out_empty
    rows = []
    for tv, g in parts.groupby("t", sort=True):
        n = int(g["n"].sum())
        sx = sum(int(v) for v in g["sx"])
        sy = sum(int(v) for v in g["sy"])
        sxx = sum(int(v) for v in g["sxx"])
        sxy = sum(int(v) for v in g["sxy"])
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope = (float(duckdb_round(float(num) / float(den), 6))
                 if den != 0 else float("nan"))
        rows.append({"event_type": tv, "n_days": n,
                     "slope_num": str(num), "slope_den": str(den),
                     "slope": slope})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["slope"] = out["slope"].astype("float64")
    return out


def langid_confusion_documents(sf_dir: str):
    """Language-ID confusion matrix (ORACLED): for every (labeled
    lang, predicted lang) cell, the doc count and per-label recall —
    the classifier-quality readout on top of langid_documents (which
    is oracled per doc; this is the matrix a curation gate actually
    reads: 'which labeled languages does the stopword heuristic
    mistake, and for what'). Corpus-sized work is exactly the langid
    feature pass; the matrix aggregate is lang-vocabulary²-bounded
    via grouped_agg, and per-label totals come from the same driver-
    resident table (no second pass). recall = two exact ints, ONE
    divide in SQL operand order, 6dp. Null-LABEL docs are excluded
    (no ground truth → no matrix row) while docs with null/blank text
    still predict 'und' and count against their label; empty → typed
    empty frame."""
    from ..text import add_text_features
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    pred = add_text_features(ds, quality=False, simhash=False) \
        .select_columns(["lang", "lang_pred"])

    def clean(b: pa.Table) -> pa.Table:
        return b.filter(b.column("lang").is_valid())

    agg = grouped_agg(
        pred.map_batches(clean, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=131072),
        ["lang", "lang_pred"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "lang": pd.Series([], dtype="object"),
        "lang_pred": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
        "recall": pd.Series([], dtype="float64")})
    if agg.empty or "lang" not in agg.columns:
        return out_empty
    tot = {l: int(g["n"].sum()) for l, g in agg.groupby("lang")}
    agg = agg.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    out = pd.DataFrame({
        "lang": agg["lang"],
        "lang_pred": agg["lang_pred"],
        "n": agg["n"].astype("int64"),
        "recall": [float(duckdb_round(
            float(int(r["n"])) / float(tot[r["lang"]]), 6))
            for _, r in agg.iterrows()]})
    out["recall"] = out["recall"].astype("float64")
    return out


def suppliers_per_part_histogram(sf_dir: str):
    """Supply-diversity histogram (ORACLED): per observed-supplier
    count k, how many parts ship from exactly k distinct suppliers
    (and the share) — the single-sourcing risk readout (k = 1 parts
    are the supply-chain's single points of failure; q16 counts
    suppliers per brand-type, this histograms the per-part diversity
    the lineitem stream actually exercised). Per-batch distinct
    (part, supplier) partials prune the shuffle; ONE part-hash
    partition dedups globally and emits count-BOUNDED (k, n_parts)
    partials (k ≤ supplier vocabulary); share = two exact ints, ONE
    divide in SQL operand order, 6dp. Null part/supplier rows
    invisible; empty → typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("l_partkey").is_valid(),
                             b.column("l_suppkey").is_valid()))
        return pa.table({"p": t.column("l_partkey"),
                         "s": t.column("l_suppkey")}) \
            .group_by(["p", "s"]).aggregate([])

    partials = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        p = t.column("p").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        order = np.lexsort((s, p))
        p, s = p[order], s[order]
        first = np.ones(len(p), dtype=bool)
        first[1:] = (p[1:] != p[:-1]) | (s[1:] != s[:-1])
        p = p[first]                      # global distinct pairs
        seg = np.ones(len(p), dtype=bool)
        seg[1:] = p[1:] != p[:-1]
        counts = np.diff(np.r_[np.flatnonzero(seg), len(p)])
        ks, nn = np.unique(counts, return_counts=True)
        return pa.table({"k": pa.array(ks.astype(np.int64)),
                         "n_p": pa.array(nn.astype(np.int64))})

    agg = grouped_agg(
        partitioned_group_apply(partials, ["p"], kernel,
                                batch_format="pyarrow"),
        ["k"], {"n_p": "n"}, count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "n_suppliers": pd.Series([], dtype="int64"),
        "n_parts": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "k" not in agg.columns:
        return out_empty
    agg = agg.sort_values("k").reset_index(drop=True)
    total = sum(int(x) for x in agg["n"])
    return pd.DataFrame({
        "n_suppliers": agg["k"].astype("int64"),
        "n_parts": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def centroid_accuracy_embeddings(sf_dir: str):
    """Nearest-centroid classification accuracy (ORACLED): assign
    every vector to its nearest LABEL CENTROID and report, per true
    label, the count, correct count and accuracy — the prototype-
    classifier companion to knn_label_agreement (kNN asks "is my
    neighborhood my class"; this asks "is my class's PROTOTYPE my
    nearest"; both low together = labels orthogonal to geometry).
    The entire classification is EXACT integer arithmetic: vectors
    AND centroids quantize to basis points (floor(10000·v) — the
    centroid family contract), distances are object-int squared sums
    (no float enters the argmin), and ties break toward the SMALLER
    label on both engines. Two corpus passes, both already-proven
    shapes: the label_centroids partial pass builds the (labels ×
    dim) bp matrix, then one scan classifies each batch against the
    broadcast matrix and ships label-vocabulary²-bounded (label,
    pred, n) partials. accuracy = two exact ints, ONE divide in SQL
    operand order, 6dp. Null label/embedding rows invisible; a
    single-label corpus answers accuracy 1.0 trivially; empty →
    typed empty frame."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from ..ann.search import embedding_matrix
    from ..util import worker_cached
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("label").is_valid(),
                             b.column("embedding").is_valid()))
        empty = pa.table({
            "label": pa.array([], type=pa.int64()),
            "dim": pa.array([], type=pa.int64()),
            "sum_part": pa.array([], type=pa.float64()),
            "n_part": pa.array([], type=pa.int64())})
        if t.num_rows == 0:
            return empty
        M = embedding_matrix(t.column("embedding"))
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        k, d = len(ulab), (M.shape[1] if len(M) else 0)
        if k == 0 or d == 0:
            return empty
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(k))
        sums = np.add.reduceat(M[order], starts, axis=0)
        cnt = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(ulab, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1,
                                              dtype=np.int64), k)),
            "sum_part": pa.array(sums.ravel()),
            "n_part": pa.array(np.repeat(cnt, d))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby(["label", "dim"]) \
        .aggregate(Sum("sum_part", alias_name="s"),
                   Sum("n_part", alias_name="n")).to_pandas()
    out_empty = pd.DataFrame({
        "label": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "n_correct": pd.Series([], dtype="int64"),
        "accuracy": pd.Series([], dtype="float64")})
    if agg.empty or "label" not in agg.columns:
        return out_empty
    bp = np.floor(10000.0 * agg["s"].to_numpy()
                  / agg["n"].to_numpy().astype(np.float64)) \
        .astype(np.int64)
    agg = agg.assign(bp=bp).sort_values(["label", "dim"])
    labels = np.sort(agg["label"].unique()).astype(np.int64)
    d = int(agg["dim"].max())
    C = agg["bp"].to_numpy().reshape(len(labels), d)
    ref = _ray.put((labels, C))

    def classify(b: pa.Table, *, ref=ref) -> pa.Table:
        empty = pa.table({"label": pa.array([], pa.int64()),
                          "pred": pa.array([], pa.int64()),
                          "n_p": pa.array([], pa.int64())})
        t = b.filter(pc.and_(b.column("label").is_valid(),
                             b.column("embedding").is_valid()))
        if t.num_rows == 0:
            return empty
        labs, C = worker_cached(("cent_acc", ref.hex()),
                                lambda: _ray.get(ref))
        M = embedding_matrix(t.column("embedding"))
        Vi = np.floor(10000.0 * M).astype(np.int64)
        # int64 fast path whenever dim·(2·maxbp)² fits 2^63 — true for
        # any unit-ish embedding space; the object fallback keeps the
        # exact-integer contract for adversarial magnitudes
        maxbp = max(int(np.abs(Vi).max(initial=0)),
                    int(np.abs(C).max(initial=0)))
        d = Vi.shape[1] if Vi.ndim == 2 else 0
        safe = d == 0 or (4 * maxbp * maxbp) < (2 ** 62) // max(d, 1)
        if safe:
            V, Cb = Vi, C
        else:
            V, Cb = Vi.astype(object), C.astype(object)
        lab = t["label"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # exact int distance matrix (n, k): argmin, ties → smaller label
        best = np.zeros(len(V), dtype=np.int64)
        bestd = None
        for j in range(len(labs)):
            diff = V - Cb[j][None, :]
            dist = (diff * diff).sum(axis=1)
            if bestd is None:
                bestd = dist
                best[:] = labs[j]
            else:
                better = dist < bestd
                bestd = np.where(better, dist, bestd)
                best = np.where(better, labs[j], best)
        key = lab * (int(labs.max()) + 2) + best
        uk, cnt = np.unique(key, return_counts=True)
        base = int(labs.max()) + 2
        return pa.table({
            "label": pa.array((uk // base).astype(np.int64)),
            "pred": pa.array((uk % base).astype(np.int64)),
            "n_p": pa.array(cnt.astype(np.int64))})

    conf = grouped_agg(
        ds.map_batches(classify, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["label", "pred"], {"n_p": "n"}, count_alias="_p").to_pandas()
    if conf.empty or "label" not in conf.columns:
        return out_empty
    rows = []
    for lv, g in conf.groupby("label", sort=True):
        n = int(g["n"].sum())
        nc = int(g.loc[g["pred"] == lv, "n"].sum())
        rows.append({"label": int(lv), "n": n, "n_correct": nc,
                     "accuracy": float(duckdb_round(
                         float(nc) / float(n), 6))})
    out = pd.DataFrame(rows)
    for c in ("label", "n", "n_correct"):
        out[c] = out[c].astype("int64")
    out["accuracy"] = out["accuracy"].astype("float64")
    return out


def weekend_lift_by_type(sf_dir: str):
    """Weekend lift per event type (ORACLED): for each type, how
    over- or under-represented weekend activity is versus the corpus
    baseline — lift = (n_type_weekend · N_total) / (n_type ·
    N_weekend), the seasonality index a scheduling or anomaly model
    reads (lift > 1: the type skews weekend; < 1: weekday; errors
    spiking on weekends when ops is asleep is the classic catch).
    The whole statistic is FOUR exact integers in ONE formula — both
    products computed in Python-int space, ONE divide in SQL operand
    order, 6dp — from a single type-vocabulary-bounded grouped count
    of (type, is_weekend); the corpus never re-shuffles. ISO weekend
    = Saturday/Sunday (DuckDB isodow 6/7 == the epoch-day mod-7
    arithmetic pinned at the Thursday epoch). Null ts/type rows
    invisible; a weekend-free corpus answers SQL-NULL lift (reported,
    not dropped); empty → typed empty frame."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32()) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        # epoch day 0 = Thursday → isodow = (d + 3) % 7 + 1
        wknd = (((d + 3) % 7 + 1) >= 6).astype(np.int64)
        return pa.table({"t": t.column("event_type"),
                         "w": pa.array(wknd)})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["t", "w"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_events": pd.Series([], dtype="int64"),
        "n_weekend": pd.Series([], dtype="int64"),
        "lift": pd.Series([], dtype="float64")})
    if agg.empty or "t" not in agg.columns:
        return out_empty
    N = int(agg["n"].sum())
    NW = int(agg.loc[agg["w"] == 1, "n"].sum())
    rows = []
    for tv, g in agg.groupby("t", sort=True):
        nt = int(g["n"].sum())
        ntw = int(g.loc[g["w"] == 1, "n"].sum())
        lift = (float(duckdb_round(
            float(ntw * N) / float(nt * NW), 6))
            if NW > 0 else float("nan"))
        rows.append({"event_type": tv, "n_events": nt,
                     "n_weekend": ntw, "lift": lift})
    out = pd.DataFrame(rows)
    out["n_events"] = out["n_events"].astype("int64")
    out["n_weekend"] = out["n_weekend"].astype("int64")
    out["lift"] = out["lift"].astype("float64")
    return out


def first_last_matrix_events(sf_dir: str):
    """User-journey endpoint matrix (ORACLED): per (first event type,
    last event type) pair, how many users START their timeline with
    one and END it with the other, plus the share of all users — the
    entry→exit summary a funnel designer reads before committing to
    step definitions (first_touch_attribution fixes the entry; this
    crosses it with the exit, and the diagonal holds the single-event
    and never-progressed users). ONE user-hash partition: sort by
    (user, ts, event_id) — the corpus-wide endpoint tiebreak — and
    the first/last row masks give both endpoints in one pass; only
    type-vocabulary²-bounded (first, last, n) partials leave. share =
    two exact ints, ONE divide in SQL operand order, 6dp. Rows with
    null user/ts/event_id/type are invisible — a user whose only
    typed rows are null-ts does not exist; empty → typed empty
    frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(b.column("user_id").is_valid(),
                            b.column("ts").is_valid()),
                    pc.and_(b.column("event_id").is_valid(),
                            b.column("event_type").is_valid()))
        t = b.filter(m)
        return pa.table({
            "u": t.column("user_id"),
            "ts": pc.cast(t.column("ts"), pa.int64()),
            "e": t.column("event_id"),
            "t": t.column("event_type")})

    def kernel(tb: pa.Table) -> pa.Table:
        empty = pa.table({"ft": pa.array([], pa.string()),
                          "lt": pa.array([], pa.string()),
                          "n_p": pa.array([], pa.int64())})
        if tb.num_rows == 0:
            return empty
        u = tb.column("u").to_numpy(zero_copy_only=False)
        ts = tb.column("ts").to_numpy(zero_copy_only=False)
        e = tb.column("e").to_numpy(zero_copy_only=False)
        ty = tb.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, u))
        u, ty = u[order], ty[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[:-1] != u[1:]
        ft, lt = ty[first], ty[last]
        uty, fcode = np.unique(ft, return_inverse=True)
        uty2, lcode = np.unique(lt, return_inverse=True)
        key = fcode.astype(np.int64) * len(uty2) + lcode
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "ft": pa.array(uty[(uk // len(uty2))], pa.string()),
            "lt": pa.array(uty2[(uk % len(uty2))], pa.string()),
            "n_p": pa.array(cnt.astype(np.int64))})

    agg = grouped_agg(
        partitioned_group_apply(
            ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
            ["u"], kernel, batch_format="pyarrow"),
        ["ft", "lt"], {"n_p": "n"}, count_alias="_p").to_pandas()
    out_empty = pd.DataFrame({
        "first_type": pd.Series([], dtype="object"),
        "last_type": pd.Series([], dtype="object"),
        "n_users": pd.Series([], dtype="int64"),
        "share": pd.Series([], dtype="float64")})
    if agg.empty or "ft" not in agg.columns:
        return out_empty
    total = int(agg["n"].sum())
    agg = agg.sort_values(["ft", "lt"]).reset_index(drop=True)
    return pd.DataFrame({
        "first_type": agg["ft"],
        "last_type": agg["lt"],
        "n_users": agg["n"].astype("int64"),
        "share": np.asarray(duckdb_round(
            agg["n"].to_numpy().astype(np.float64)
            / np.float64(float(total)), 6), dtype=np.float64)})


def mad_daily_events(sf_dir: str):
    """Robust daily-volume anomaly summary (ORACLED): ONE row — the
    observed-day count, the MEDIAN daily event count, the median
    absolute deviation around it, and how many days sit more than
    3 MAD from the median — the robust outlier-day counter an
    on-call dashboard trusts when means are poisoned by the very
    spikes it hunts (cusum localizes a level shift; this counts
    discrete anomalies without distributional assumptions). Every
    quantity is an exact integer: daily counts are ints, both medians
    are quantile_disc picks (the 0-based ceil(q·n)−1 convention) over
    int multisets, deviations are |int − int|, and the 3-MAD fence
    compares |x − med| > 3·mad in pure integer arithmetic — no float
    enters until nothing is left to compute. The daily grid is
    calendar-bounded: ONE grouped count per day, the driver's two
    median picks run over the gathered grid (the _distinct_quantiles
    caveat: exact for auditable grids, t-digest is the unbounded-
    cardinality path). Null ts rows invisible; empty → typed empty
    frame."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("ts").is_valid())
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"d": pc.cast(d, pa.int64())})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["d"], {}, count_alias="y").to_pandas()
    out_empty = pd.DataFrame({
        "n_days": pd.Series([], dtype="int64"),
        "median_count": pd.Series([], dtype="int64"),
        "mad": pd.Series([], dtype="int64"),
        "n_outlier_days": pd.Series([], dtype="int64")})
    if daily.empty or "d" not in daily.columns:
        return out_empty
    y = np.sort(daily["y"].to_numpy().astype(np.int64))
    n = len(y)

    def qdisc(arr):
        k = max(int(math.ceil(0.5 * len(arr))) - 1, 0)
        return int(np.sort(arr)[k])

    med = qdisc(y)
    dev = np.abs(y - med)
    mad = qdisc(dev)
    outl = int((dev > 3 * mad).sum())
    return pd.DataFrame({
        "n_days": pd.Series([n], dtype="int64"),
        "median_count": pd.Series([med], dtype="int64"),
        "mad": pd.Series([mad], dtype="int64"),
        "n_outlier_days": pd.Series([outl], dtype="int64")})


def duplicate_events_share(sf_dir: str):
    """Event-log duplicate audit (ORACLED): ONE row — row count,
    distinct (user, ts, type, value) tuple count, duplicate rows and
    their share — the at-least-once-delivery damage report every
    event pipeline runs before trusting counts (dedup_exact audits
    documents by text; this audits the event LOG by full tuple, where
    a replayed Kafka partition shows up as exact tuple copies). The
    scan ships only a 128-bit tuple hash (two independent 64-bit
    hashes over a canonical string encoding — null fields encode as a
    reserved token so (NULL, x) and ('NULL', x) cannot collide);
    ONE digest groupby + per-block (rows, distinct) DECIMAL-STRING
    partials finish it. share = two exact ints, ONE divide in SQL
    operand order, 6dp. ALL-null tuples still count (a fully-null row
    is a row — the SQL GROUP BY keeps it); empty → typed empty
    frame."""
    from ..sketches.hashing import hash64_array
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_type", "value"])

    def prep(b: pa.Table) -> pa.Table:
        def enc(col, fmt):
            arr = b.column(col)
            s = pc.cast(arr, pa.string())
            return pc.fill_null(s, "\x00NULL")
        parts = [enc("user_id", None), enc("ts", None),
                 enc("event_type", None), enc("value", None)]
        joined = pc.binary_join_element_wise(*parts, "\x1f")
        h1 = hash64_array(joined).view(np.int64)
        h2 = hash64_array(joined,
                          seed=0x5851F42D4C957F2D).view(np.int64)
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    g = grouped_agg_hash(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["h1", "h2"], {}, count_alias="n")

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"nr": pa.array([], pa.string()),
                          "nd": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        n = b["n"].to_numpy(zero_copy_only=False).astype(object)
        return pa.table({"nr": pa.array([str(int(n.sum()))]),
                         "nd": pa.array([str(b.num_rows)])})

    parts = g.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True,
                          batch_size=None).to_pandas()
    out_empty = pd.DataFrame({
        "n_rows": pd.Series([], dtype="int64"),
        "n_distinct": pd.Series([], dtype="int64"),
        "n_dup_rows": pd.Series([], dtype="int64"),
        "dup_share": pd.Series([], dtype="float64")})
    if parts.empty or "nr" not in parts.columns:
        return out_empty
    nr = sum(int(v) for v in parts["nr"])
    if nr == 0:
        return out_empty
    nd = sum(int(v) for v in parts["nd"])
    return pd.DataFrame({
        "n_rows": pd.Series([nr], dtype="int64"),
        "n_distinct": pd.Series([nd], dtype="int64"),
        "n_dup_rows": pd.Series([nr - nd], dtype="int64"),
        "dup_share": pd.Series([float(duckdb_round(
            float(nr - nd) / float(nr), 6))], dtype="float64")})


def longest_quiet_gap_by_type(sf_dir: str):
    """Longest quiet gap per event type (ORACLED): for each type, the
    observed-day count, the longest run of consecutive FULLY-QUIET
    days strictly inside its active range, and the day that quiet run
    began — the outage/seasonal-blackout detector (a type that went
    silent for 9 days mid-range either broke or was paused; gaps
    OUTSIDE the active range are unknowable and excluded by
    construction). The whole answer reads off sorted distinct active
    days: gap = max consecutive difference − 1, starting the day
    after the left edge — no calendar materializes, no zero-filling
    (the observed-days discipline of daily_trend, pinned there). The
    per-type distinct-day grid is calendar-bounded (ONE grouped
    count); ties on equal maximal gaps resolve to the EARLIEST start
    on both engines (min over gap starts). A single-day type answers
    gap 0 with SQL-NULL start; null rows invisible; empty → typed
    empty frame."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"t": t.column("event_type"),
                         "d": pc.cast(d, pa.int64())})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["t", "d"], {}, count_alias="_n").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_days": pd.Series([], dtype="int64"),
        "max_gap_days": pd.Series([], dtype="int64"),
        "gap_start": pd.Series([], dtype="datetime64[us]")})
    if daily.empty or "t" not in daily.columns:
        return out_empty
    rows = []
    for tv, g in daily.groupby("t", sort=True):
        d = np.sort(g["d"].to_numpy().astype(np.int64))
        gaps = np.diff(d) - 1
        if len(gaps) and gaps.max() > 0:
            mg = int(gaps.max())
            start = int(d[np.argmax(gaps == mg)] + 1)
            ts = np.datetime64(start * 86_400_000_000, "us")
        elif len(gaps):
            mg, ts = 0, np.datetime64("NaT", "us")
        else:
            mg, ts = 0, np.datetime64("NaT", "us")
        rows.append({"event_type": tv, "n_days": len(d),
                     "max_gap_days": mg, "gap_start": ts})
    out = pd.DataFrame(rows)
    out["n_days"] = out["n_days"].astype("int64")
    out["max_gap_days"] = out["max_gap_days"].astype("int64")
    out["gap_start"] = out["gap_start"].astype("datetime64[us]")
    return out


def source_weighted_jaccard(sf_dir: str):
    """Weighted (multiset) Jaccard between source term distributions
    (ORACLED): per source pair, Σ_t min(c_a(t), c_b(t)) over shared
    terms, both token totals, and WJ = Σmin / (N_a + N_b − Σmin) —
    the frequency-aware companion to vocab_overlap_by_lang (two feeds
    can share a vocabulary yet use it with wildly different
    frequencies; weighted Jaccard sees that, set Jaccard can't — the
    identity max+min = a+b folds the Σmax denominator into totals, so
    shared terms are the ONLY join). Everything is exact integers:
    per-(term, source) counts ride the term_frequency combiner, ONE
    term-hash partition computes every pair's min-sum with
    ranges_concat pair expansion over per-term source runs, per-source
    totals ride the SAME output on null-key rows (one grouped sum
    finishes all of it), and the sums report as DECIMAL STRINGS.
    WJ = two exact ints, ONE divide in SQL operand order, 6dp. Null
    text/source rows invisible; pairs sharing no term are ABSENT
    (their WJ would still be 0/total — the absence is pinned);
    fewer than two sources → typed empty frame."""
    from ..util import partitioned_group_apply, ranges_concat
    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("text").is_valid(),
                             b.column("source").is_valid()))
        toks = pc.split_pattern(t["text"].combine_chunks(), " ")
        n_per = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        src = pa.array(np.repeat(
            t["source"].to_numpy(zero_copy_only=False), n_per))
        tb = pa.table({"term": flat, "src": src})
        tb = tb.filter(pc.not_equal(tb["term"], ""))
        return tb.group_by(["term", "src"]).aggregate(
            [([], "count_all")]).rename_columns(["term", "src", "c"])

    partials = ds.map_batches(prep, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=131072)

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"src_a": pa.array([], pa.string()),
                          "src_b": pa.array([], pa.string()),
                          "v": pa.array([], pa.string())})
        if t.num_rows == 0:
            return empty
        term = t.column("term").to_numpy(zero_copy_only=False)
        src = t.column("src").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((src, term))
        term, src, c = term[order], src[order], c[order]
        # merge duplicate (term, src) partial counts
        first = np.ones(len(term), dtype=bool)
        first[1:] = (term[1:] != term[:-1]) | (src[1:] != src[:-1])
        gid = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        csum = np.add.reduceat(c.astype(object), starts)
        term, src = term[first], src[first]
        # per-source totals → (src, NULL, total) rows
        us, inv = np.unique(src, return_inverse=True)
        tot = np.zeros(len(us), dtype=object)
        np.add.at(tot, inv, csum)
        totals = pa.table({
            "src_a": pa.array(us, pa.string()),
            "src_b": pa.array([None] * len(us), pa.string()),
            "v": pa.array([str(int(x)) for x in tot], pa.string())})
        # per-term source-pair min sums
        seg = np.ones(len(term), dtype=bool)
        seg[1:] = term[1:] != term[:-1]
        seg_start = np.flatnonzero(seg)
        seg_end = np.append(seg_start[1:], len(term))
        ends = np.repeat(seg_end, seg_end - seg_start)
        idx = np.arange(len(term))
        lens = ends - idx - 1
        left = np.repeat(idx, lens)
        right = ranges_concat(idx + 1, lens)
        if len(left):
            mins = np.minimum(csum[left].astype(np.int64),
                              csum[right].astype(np.int64))
            prs = pd.DataFrame({"a": src[left], "b": src[right],
                                "m": mins})
            g = prs.groupby(["a", "b"], sort=False)["m"].sum()
            pairs = pa.table({
                "src_a": pa.array([k[0] for k in g.index], pa.string()),
                "src_b": pa.array([k[1] for k in g.index], pa.string()),
                "v": pa.array([str(int(x)) for x in g.to_numpy()],
                              pa.string())})
        else:
            pairs = empty
        return pa.concat_tables([totals, pairs])

    parts = partitioned_group_apply(partials, ["term"], kernel,
                                    batch_format="pyarrow").to_pandas()
    out_empty = pd.DataFrame({
        "source_a": pd.Series([], dtype="object"),
        "source_b": pd.Series([], dtype="object"),
        "common_min": pd.Series([], dtype="object"),
        "n_a": pd.Series([], dtype="object"),
        "n_b": pd.Series([], dtype="object"),
        "wjaccard": pd.Series([], dtype="float64")})
    if parts.empty or "src_a" not in parts.columns:
        return out_empty
    totals = {}
    for _, r in parts[parts["src_b"].isna()].iterrows():
        totals[r["src_a"]] = totals.get(r["src_a"], 0) + int(r["v"])
    agg = {}
    for _, r in parts[parts["src_b"].notna()].iterrows():
        k = (r["src_a"], r["src_b"])
        agg[k] = agg.get(k, 0) + int(r["v"])
    if not agg:
        return out_empty
    rows = []
    for (a, b), mn in sorted(agg.items()):
        na, nb = totals[a], totals[b]
        rows.append({
            "source_a": a, "source_b": b, "common_min": str(mn),
            "n_a": str(na), "n_b": str(nb),
            "wjaccard": float(duckdb_round(
                float(mn) / float(na + nb - mn), 6))})
    out = pd.DataFrame(rows)
    out["wjaccard"] = out["wjaccard"].astype("float64")
    return out


def theil_sen_daily_events(sf_dir: str):
    """Theil–Sen robust daily trend (ORACLED): the MEDIAN of all
    pairwise day-slope estimates of daily event volume — ONE row
    (n_days, n_pairs, slope) — the estimator that shrugs off the
    outlier days a least-squares fit chases (daily_trend_by_type is
    the OLS rate; mad_daily counts the outliers; this fits THROUGH
    them — up to 29% corrupted days cannot move it). Slopes are
    (Δcount)/(Δday) over exact ints; both engines compute the SAME
    IEEE double per pair (exact ints in, one divide), so the
    median-by-value pick (quantile_disc, the ceil(q·n)−1 convention)
    agrees without any rounding trick — only the reported median
    rounds, 6dp. The daily grid is calendar-bounded, so the O(days²)
    pair enumeration is driver-side arithmetic on the gathered grid
    (435 pairs for a month; a decade is ~6.7M — still driver-cheap;
    the grid gather is the stated _distinct_quantiles caveat). Null
    ts rows invisible; fewer than two observed days → typed empty
    frame."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("ts").is_valid())
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"d": pc.cast(d, pa.int64())})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["d"], {}, count_alias="y").to_pandas()
    out_empty = pd.DataFrame({
        "n_days": pd.Series([], dtype="int64"),
        "n_pairs": pd.Series([], dtype="int64"),
        "slope": pd.Series([], dtype="float64")})
    if daily.empty or "d" not in daily.columns or len(daily) < 2:
        return out_empty
    daily = daily.sort_values("d").reset_index(drop=True)
    x = daily["d"].to_numpy().astype(np.int64)
    y = daily["y"].to_numpy().astype(np.int64)
    i, j = np.triu_indices(len(x), k=1)
    slopes = (y[j] - y[i]).astype(np.float64) \
        / (x[j] - x[i]).astype(np.float64)
    slopes = np.sort(slopes)
    k = max(int(math.ceil(0.5 * len(slopes))) - 1, 0)
    return pd.DataFrame({
        "n_days": pd.Series([len(x)], dtype="int64"),
        "n_pairs": pd.Series([len(slopes)], dtype="int64"),
        "slope": pd.Series([float(duckdb_round(float(slopes[k]), 6))],
                           dtype="float64")})


def equidepth_bins_value_events(sf_dir: str, k: int = 10):
    """Equi-depth bin edges of the event value column (ORACLED): the
    ≤ k−1 NTILE(k) boundary keys — each bin edge as (bin, quantized
    value, owning event_id) — the histogram-design primitive behind
    rfm/gains surfaced as a first-class query (an equi-depth binning
    is what a feature bucketizer or a range-partitioner actually
    ships; value_bands uses fixed widths, this uses fixed MASS). The
    metric is micro-quantized (rint(value·1e6), the cents discipline
    scaled) so the (metric, event_id) total order is exact on both
    engines; _ntile_boundaries does the distributed work — ONE range
    sort, a blocks-bounded summary gather, and a second block-aligned
    pass that ships ONLY the boundary rows; nothing row-level reaches
    the driver beyond the k−1 keys. Buckets left empty by n < k
    produce no edge (bins 2..min(k, n) — SQL NTILE's degrade,
    pinned). Null value/event_id rows invisible; fewer than two rows
    → typed empty frame."""
    ds = _read(sf_dir, "events", columns=["event_id", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_id").is_valid(),
                             b.column("value").is_valid()))
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "vm": pa.array(np.rint(v * 1e6).astype(np.int64)),
            "event_id": t.column("event_id")})

    out_empty = pd.DataFrame({
        "bin": pd.Series([], dtype="int64"),
        "edge_micro": pd.Series([], dtype="int64"),
        "edge_event_id": pd.Series([], dtype="int64")})
    bounds = _ntile_boundaries(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        "vm", "event_id", k)
    if not bounds:
        return out_empty
    return pd.DataFrame({
        "bin": pd.Series(range(2, 2 + len(bounds)), dtype="int64"),
        "edge_micro": pd.Series([m for m, _ in bounds],
                                dtype="int64"),
        "edge_event_id": pd.Series([i for _, i in bounds],
                                   dtype="int64")})


def naive_forecast_mae_daily(sf_dir: str):
    """Seasonal-naive forecast baseline (ORACLED): ONE row — the
    number of scorable days, the mean absolute error of the lag-7
    ("same weekday last week") naive forecast of daily event volume,
    and the mean absolute DAILY CHANGE (the lag-1 naive) — the two
    baselines every real forecasting model must beat before it earns
    a deploy (a model that can't beat copy-last-week is a bug with a
    dashboard). Exact integers end to end: daily counts are ints,
    errors are |int − int| over CALENDAR-aligned pairs (a day whose
    d−7 was never observed is not scorable and is excluded — no
    zero-filling, the observed-days discipline), and each MAE is ONE
    exact-int sum over ONE divide in SQL operand order, 6dp. The
    daily grid is calendar-bounded; the alignment is a driver-side
    searchsorted over the gathered grid. Null ts rows invisible; a
    corpus with no scorable lag-7 pair answers SQL-NULL mae7 while
    mae1 may still report (both pinned); fewer than two observed
    days → typed empty frame."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("ts").is_valid())
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"d": pc.cast(d, pa.int64())})

    daily = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["d"], {}, count_alias="y").to_pandas()
    out_empty = pd.DataFrame({
        "n_days": pd.Series([], dtype="int64"),
        "n_lag7_pairs": pd.Series([], dtype="int64"),
        "mae_lag7": pd.Series([], dtype="float64"),
        "mae_lag1": pd.Series([], dtype="float64")})
    if daily.empty or "d" not in daily.columns or len(daily) < 2:
        return out_empty
    daily = daily.sort_values("d").reset_index(drop=True)
    x = daily["d"].to_numpy().astype(np.int64)
    y = daily["y"].to_numpy().astype(np.int64)

    def lag_mae(lag):
        pos = np.searchsorted(x, x - lag)
        posc = np.minimum(pos, len(x) - 1)
        ok = x[posc] == x - lag
        n = int(ok.sum())
        if n == 0:
            return 0, float("nan")
        s = int(np.abs(y[ok].astype(object)
                       - y[posc[ok]].astype(object)).sum())
        return n, float(duckdb_round(float(s) / float(n), 6))

    n7, mae7 = lag_mae(7)
    _n1, mae1 = lag_mae(1)
    return pd.DataFrame({
        "n_days": pd.Series([len(x)], dtype="int64"),
        "n_lag7_pairs": pd.Series([n7], dtype="int64"),
        "mae_lag7": pd.Series([mae7], dtype="float64"),
        "mae_lag1": pd.Series([mae1], dtype="float64")})


def hll_registers_events(sf_dir: str, p: int = 8):
    """The HyperLogLog REGISTER TABLE of distinct event users (ORACLED):
    bucket (top-``p`` md5 bits) and register value (leading-zero rank of
    the remaining 56-bit suffix) for every OBSERVED bucket — the sketch
    state itself, value-level cross-engine, not just the estimate it
    implies. The repo's production HLL (sketches/hll.py, reference
    semantics: the approx distinct path of checks/stats.go's column
    profiler) keys on the internal hash64 no SQL engine can reproduce,
    so column_stats_approx is rows-only; this query re-keys the SAME
    register semantics on MD5 — the md5lsh convention (dedup/md5lsh.py:
    DuckDB ``md5_number`` low-64 == hashlib digest[:8] little-endian) —
    making the sketch's full merge tree value-reproducible in ANSI SQL:
    ``bucket = h >> 56``, ``rho = 57 − bit_length(h & (2^56−1))`` (57
    when the suffix is 0; SQL mirrors bit_length with the minimal-width
    ``length(bin(w))``, the w=0 arm CASEd). Registers are EXACTLY the
    max-merge of per-batch partial registers — the distributive max that
    makes HLL mergeable across shards is the same property that makes
    the partial shuffle here one <=2^p-row table per batch. Buckets no
    user hashes into are ABSENT (SQL GROUP BY semantics), not
    zero-filled. Null user_id rows are invisible; an all-null or empty
    corpus answers a typed empty frame. The estimate itself stays out
    of the oracle on purpose (the 2^p-term harmonic sum has no defined
    SQL accumulation order); test_session19_ops pins it driver-side
    against the exact distinct count at the sketch's nominal error."""
    import hashlib
    ds = _read(sf_dir, "events", columns=["user_id"])
    shift = 64 - p
    mask = (1 << shift) - 1

    def partial(b: pa.Table) -> pa.Table:
        col = b.column("user_id").drop_null()
        ids = np.unique(col.to_numpy(zero_copy_only=False)
                        .astype(np.int64))
        if ids.size == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        regs: dict[int, int] = {}
        for uid in ids.tolist():
            h = int.from_bytes(
                hashlib.md5(str(uid).encode()).digest()[:8], "little")
            w = h & mask
            rho = shift + 1 - w.bit_length() if w else shift + 1
            bkt = h >> shift
            if rho > regs.get(bkt, 0):
                regs[bkt] = rho
        buckets = sorted(regs)
        return pa.table({
            "bucket": pa.array(buckets, pa.int64()),
            "rho": pa.array([regs[b_] for b_ in buckets], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)
    from ray.data.aggregate import Max
    out = parts.groupby("bucket").aggregate(
        Max("rho", alias_name="register")).to_pandas()
    if out.empty or "bucket" not in out.columns:
        return pd.DataFrame({
            "bucket": pd.Series([], dtype="int64"),
            "register": pd.Series([], dtype="int64")})
    out = out.sort_values("bucket").reset_index(drop=True)
    out["bucket"] = out["bucket"].astype("int64")
    out["register"] = out["register"].astype("int64")
    return out


def runs_test_daily_events(sf_dir: str):
    """Wald–Wolfowitz RUNS census of daily volume per event type
    (ORACLED): dichotomize each type's dense daily-count series at its
    discrete median (quantile_disc 0.5 — an actual grid value, the
    ceil(q·n)−1 convention theil_sen pinned), DROP the days equal to
    the median (the standard dichotomization — pinned: they are not a
    third symbol), and count the maximal same-side runs of what
    remains — the randomness screen that separates "volume wanders
    independently" from "volume trends or oscillates" (few long runs
    = trending; many short runs = mean-reverting), the non-parametric
    cousin of autocorr_daily on the same grid. Seventh consumer of the
    shared _dense_daily_counts grid: a calendar gap IS a below-median
    day and must zero-fill before the median is taken. Everything is
    exact integers end to end — the median is a count, the sides are
    sign compares, runs are boundary counts (prev IS NULL OR side ≠
    prev in SQL == first-element + sign-change count in numpy) — so
    no rounding discipline is needed anywhere. A constant series
    (every day equal to the median) keeps its type row with
    n_above = n_below = n_runs = 0 (the LEFT JOIN arm, pinned); a
    corpus with no (type, ts) rows answers a typed empty frame."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "median_count": pd.Series([], dtype="int64"),
        "n_above": pd.Series([], dtype="int64"),
        "n_below": pd.Series([], dtype="int64"),
        "n_runs": pd.Series([], dtype="int64")})
    if f is None:
        return out_empty
    rows = []
    for t, g in f.groupby("event_type", sort=True):
        y = g.sort_values("day")["n"].to_numpy().astype(np.int64)
        med = int(np.sort(y)[max(int(math.ceil(0.5 * len(y))) - 1, 0)])
        sides = np.sign(y - med)
        sides = sides[sides != 0]
        runs = 0 if sides.size == 0 else \
            int((sides[1:] != sides[:-1]).sum()) + 1
        rows.append({"event_type": t, "median_count": med,
                     "n_above": int((sides > 0).sum()),
                     "n_below": int((sides < 0).sum()),
                     "n_runs": runs})
    out = pd.DataFrame(rows)
    for c in ("median_count", "n_above", "n_below", "n_runs"):
        out[c] = out[c].astype("int64")
    return out


def survival_risk_table_customers(sf_dir: str):
    """Kaplan–Meier RISK TABLE of time-to-second-order (ORACLED): for
    every distinct duration t (days), the number of customers still at
    risk at t, the repeat-purchase EVENTS at t, and the right-CENSORED
    exits at t — the survival-analysis input grid (KM / Cox / churn
    models all start here), and the repo's first query with censoring
    semantics: a single-order customer has NOT failed to repeat, they
    are censored at the end of observation (global max order date),
    and excluding them — what a naive repeat-rate query does — biases
    every hazard estimate upward. Durations are exact date32-int day
    differences; t=0 is real on both arms (two same-day orders = an
    event at 0; a lone order ON the corpus max date = a censor at 0,
    both pinned). The KM product-limit estimate itself stays out of
    the oracle (an ordered float product); the risk table is the
    sufficient statistic and is exact integers end to end, n_risk via
    the SQL running-sum identity n − Σ_{s<t}(d_s + c_s). Plan: one
    tiny max-date scan, then ONE per-batch kernel keeps only each
    customer's TWO smallest order days plus its batch count (the
    2-smallest multiset is combinable — per-batch partials merge to
    the global first/second order dates exactly, the argmin family
    generalized), ONE ck-hash partition merges partials and reduces
    straight to (t, ev) partial counts — only calendar-bounded rows
    reach the driver. Null custkey/orderdate rows invisible; an empty
    cleaned corpus answers a typed empty frame."""
    from ..util import partitioned_group_apply
    out_empty = pd.DataFrame({
        "t_days": pd.Series([], dtype="int64"),
        "n_risk": pd.Series([], dtype="int64"),
        "n_event": pd.Series([], dtype="int64"),
        "n_censor": pd.Series([], dtype="int64")})

    def pmax(b: pa.Table) -> pa.Table:
        # the observation horizon is the max date of the CLEANED
        # subject rows — a null-custkey order on a later day must not
        # extend censoring (pinned)
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_orderdate").is_valid()))
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32())
        return pa.table({"mx": pa.array([pc.max(d).as_py()],
                                        pa.int64())})

    mxdf = _read(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate"]) \
        .map_batches(pmax, batch_format="pyarrow",
                     zero_copy_batch=True,
                     batch_size=131072).to_pandas()
    if mxdf.empty or "mx" not in mxdf.columns:
        return out_empty
    dmax = int(mxdf["mx"].max())

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_orderdate").is_valid()))
        if t.num_rows == 0:
            return pa.table({"ck": pa.array([], pa.int64()),
                             "d": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((d, ck))
        ck, d = ck[order], d[order]
        idxf = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        cnts = np.diff(np.append(idxf, len(ck)))
        second = (idxf + 1)[cnts >= 2]
        keep = np.concatenate([idxf, second])
        w = np.concatenate([cnts,
                            np.zeros(second.size, np.int64)])
        return pa.table({"ck": pa.array(ck[keep]),
                         "d": pa.array(d[keep]),
                         "w": pa.array(w)})

    parts = _read(sf_dir, "orders",
                  columns=["o_custkey", "o_orderdate"]) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=131072)

    def fin(t: pa.Table) -> pa.Table:
        ck = t.column("ck").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t.column("d").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if ck.size == 0:
            return pa.table({"t": pa.array([], pa.int64()),
                             "ev": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        order = np.lexsort((d, ck))
        ck, d, w = ck[order], d[order], w[order]
        idxf = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        rows = np.diff(np.append(idxf, len(ck)))
        n_orders = np.add.reduceat(w, idxf)
        d1 = d[idxf]
        ev = n_orders >= 2
        # >=2 orders implies >=2 partial rows (each batch emits its
        # two smallest), so idxf+1 is in this customer's run
        d2 = np.where(ev, d[np.minimum(idxf + 1, len(d) - 1)], 0)
        tt = np.where(ev, d2 - d1, dmax - d1)
        evi = ev.astype(np.int64)
        key = tt * 2 + evi
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({"t": pa.array(uk // 2),
                         "ev": pa.array(uk % 2),
                         "cnt": pa.array(cnt.astype(np.int64))})

    agg = partitioned_group_apply(parts, ["ck"], fin,
                                  batch_format="pyarrow").to_pandas()
    if agg.empty or "t" not in agg.columns:
        return out_empty
    g = agg.groupby(["t", "ev"])["cnt"].sum().unstack(
        fill_value=0).reindex(columns=[0, 1], fill_value=0) \
        .reset_index().sort_values("t").reset_index(drop=True)
    n_event = g[1].to_numpy().astype(np.int64)
    n_censor = g[0].to_numpy().astype(np.int64)
    total = int(n_event.sum() + n_censor.sum())
    exits = n_event + n_censor
    n_risk = total - np.concatenate(([0], np.cumsum(exits)[:-1]))
    return pd.DataFrame({
        "t_days": g["t"].astype("int64"),
        "n_risk": pd.Series(n_risk, dtype="int64"),
        "n_event": pd.Series(n_event, dtype="int64"),
        "n_censor": pd.Series(n_censor, dtype="int64")})


def decay_spend_customers(sf_dir: str, horizon: int = 30, k: int = 20):
    """Exponentially-decayed recency spend score, EXACT (ORACLED): the
    top-k customers by Σ cents·2^(horizon−age) over orders at most
    ``horizon`` days old (age relative to the max cleaned order date;
    half-life one day) — the feature-store recency score that usually
    ships as an unreproducible float fold, made bit-exact by choosing
    the decay base 2: every weight is a power of two, every term is an
    exact integer (cents << (30−age), ≤ 2^63 per order for any real
    price), and the per-customer sum rides the repo's DECIMAL-STRING
    discipline (Python big-int == SQL HUGEINT — no float enters until
    nothing is left to compute). The window boundary is closed at
    age = horizon (weight 1) and open past it (pinned: an order one
    day older contributes NOTHING, not a half-weight — the window IS
    the approximation, stated rather than smuggled). Plan: one
    max-date scan over cleaned rows, per-batch per-customer big-int
    partial sums emitted as strings, ONE ck-hash partition pass
    merges them and keeps its LOCAL top-k by (score, −ck) — a
    partition-local top-k is sufficient because a global top-k row
    must be its own partition's top-k (scores are per-ck complete
    after the merge) — and the driver re-ranks ≤ k·partitions rows.
    Ties rank by customer key ascending on both engines. Null
    custkey/price/date rows invisible everywhere (including the
    horizon); an empty cleaned window answers a typed empty frame."""
    from ..util import partitioned_group_apply
    out_empty = pd.DataFrame({
        "o_custkey": pd.Series([], dtype="int64"),
        "score_scaled": pd.Series([], dtype="object"),
        "n_window_orders": pd.Series([], dtype="int64")})

    def clean(b: pa.Table):
        return b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))

    def pmax(b: pa.Table) -> pa.Table:
        t = clean(b)
        if t.num_rows == 0:
            return pa.table({"mx": pa.array([], pa.int64())})
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32())
        return pa.table({"mx": pa.array([pc.max(d).as_py()],
                                        pa.int64())})

    cols = ["o_custkey", "o_orderdate", "o_totalprice"]
    mxdf = _read(sf_dir, "orders", columns=cols) \
        .map_batches(pmax, batch_format="pyarrow",
                     zero_copy_batch=True,
                     batch_size=131072).to_pandas()
    if mxdf.empty or "mx" not in mxdf.columns:
        return out_empty
    dmax = int(mxdf["mx"].max())

    def partial(b: pa.Table) -> pa.Table:
        t = clean(b)
        empty = pa.table({"ck": pa.array([], pa.int64()),
                          "s": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = pc.cast(pc.cast(t.column("o_orderdate"), pa.date32()),
                    pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.rint(v * 100).astype(np.int64)
        age = dmax - d
        m = age <= horizon
        if not m.any():
            return empty
        ck, cents, age = ck[m], cents[m], age[m]
        order = np.argsort(ck, kind="stable")
        ck, cents, age = ck[order], cents[order], age[order]
        idxf = np.flatnonzero(
            np.concatenate(([True], ck[1:] != ck[:-1])))
        ns = np.diff(np.append(idxf, len(ck)))
        # each term fits int64 (cents·2^30); only the per-ck SUM can
        # overflow, so the reduceat runs on object dtype — Python
        # big-int addition, the decimal-string discipline's engine
        terms = np.left_shift(cents, horizon - age).astype(object)
        sums = np.add.reduceat(terms, idxf)
        return pa.table({"ck": pa.array(ck[idxf]),
                         "s": pa.array([str(x) for x in sums],
                                       pa.string()),
                         "n": pa.array(ns.astype(np.int64))})

    parts = _read(sf_dir, "orders", columns=cols) \
        .map_batches(partial, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=131072)

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ck": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = t.to_pandas()
        acc: dict[int, list] = {}
        for ck, s, n in zip(df["ck"], df["s"], df["n"]):
            e = acc.setdefault(int(ck), [0, 0])
            e[0] += int(s)
            e[1] += int(n)
        top = sorted(acc.items(),
                     key=lambda kv: (-kv[1][0], kv[0]))[:k]
        return pa.table({
            "ck": pa.array([c for c, _ in top], pa.int64()),
            "s": pa.array([str(e[0]) for _, e in top], pa.string()),
            "n": pa.array([e[1] for _, e in top], pa.int64())})

    got = partitioned_group_apply(parts, ["ck"], fin,
                                  batch_format="pyarrow").to_pandas()
    if got.empty or "ck" not in got.columns:
        return out_empty
    got["_v"] = got["s"].map(int)
    got = got.sort_values(["_v", "ck"],
                          ascending=[False, True]).head(k)
    return pd.DataFrame({
        "o_custkey": got["ck"].astype("int64").to_numpy(),
        "score_scaled": got["s"].astype(object).to_numpy(),
        "n_window_orders": got["n"].astype("int64").to_numpy()})


def trajectory_census_customers(sf_dir: str):
    """Per-customer spend TRAJECTORY census (ORACLED): ONE row — how
    many multi-order customers exist, and how many of them have
    strictly increasing, strictly decreasing, or exactly constant
    order-value sequences in (orderdate, orderkey) time order — the
    cohort-health readout ("are repeat customers ramping or fading?")
    that summarizes every customer's full trajectory, not just its
    endpoints (spend_trend's sign census reads first-vs-last; a
    customer who dips then recovers fools endpoints but not this).
    Monotonicity of a date-interleaved merge is NOT derivable from
    per-batch partials (unlike survival's 2-smallest), so the honest
    plan is the per-user kernel family's: ONE ck-hash partition pass
    ships only (ck, day, orderkey, cents) — four narrow int columns —
    lexsorts within the partition (the order_gap lexsort-diff
    kernel), signs consecutive same-ck cent diffs, and reduces to a
    four-int census partial per partition; the driver adds
    partitions-many rows. Exact integers throughout (cents via the
    pinned rint/CAST recipe; sign compares): no rounding discipline
    needed. Strictness is real: a repeated amount anywhere breaks
    both strict arms (a two-equal-then-up customer counts in NONE of
    the three classes — pinned); the (day, orderkey) total order
    makes same-day orders deterministic on both engines. Null
    custkey/price/date rows invisible; single-order customers count
    nowhere; the answer is ALWAYS exactly one row — an empty cleaned
    corpus answers all zeros (the SQL ungrouped-aggregate convention,
    pinned), not an empty frame."""
    from ..util import partitioned_group_apply
    cols = ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    ds = _read(sf_dir, "orders", columns=cols)

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("o_custkey").is_valid(),
                    b.column("o_orderdate").is_valid()),
            b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "ck": t.column("o_custkey"),
            "ok": t.column("o_orderkey"),
            "d": pc.cast(pc.cast(t.column("o_orderdate"),
                                 pa.date32()), pa.int32()),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    def census(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"multi": pa.array([], pa.int64()),
                             "inc": pa.array([], pa.int64()),
                             "dec": pa.array([], pa.int64()),
                             "const": pa.array([], pa.int64())})
        ck = t.column("ck").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = t.column("ok").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        d = t.column("d").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = t.column("cents").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((ok, d, ck))
        ck, c = ck[order], c[order]
        same = ck[1:] == ck[:-1]
        sgn = np.sign(c[1:] - c[:-1])
        idxf = np.flatnonzero(
            np.concatenate(([True], ~same)))
        cnts = np.diff(np.append(idxf, len(ck)))
        multi = cnts >= 2
        if not multi.any():
            return pa.table({
                "multi": pa.array([0], pa.int64()),
                "inc": pa.array([0], pa.int64()),
                "dec": pa.array([0], pa.int64()),
                "const": pa.array([0], pa.int64())})
        # per-ck min/max of diff signs over its in-run diffs
        # (positions start..start+cnt−2 of sgn): neutralize the
        # cross-customer boundary diffs with ±2 sentinels, then one
        # reduceat per extreme at the multi-run starts — segments
        # span to the next multi start, but everything in between is
        # boundary positions (single-order runs own no in-run diff),
        # all sentinel-neutral, so each reduce is exactly its run's
        mn_arr = np.where(same, sgn, 2)
        mx_arr = np.where(same, sgn, -2)
        starts = idxf[multi]  # each < len(sgn): the run's first diff
        mn = np.minimum.reduceat(mn_arr, starts)
        mx = np.maximum.reduceat(mx_arr, starts)
        return pa.table({
            "multi": pa.array([int(multi.sum())], pa.int64()),
            "inc": pa.array([int((mn > 0).sum())], pa.int64()),
            "dec": pa.array([int((mx < 0).sum())], pa.int64()),
            "const": pa.array([int(((mn == 0) & (mx == 0)).sum())],
                              pa.int64())})

    parts = ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)
    agg = partitioned_group_apply(parts, ["ck"], census,
                                  batch_format="pyarrow").to_pandas()
    vals = {c: int(agg[c].sum()) if not agg.empty and c in agg.columns
            else 0 for c in ("multi", "inc", "dec", "const")}
    return pd.DataFrame({
        "n_multi": pd.Series([vals["multi"]], dtype="int64"),
        "n_increasing": pd.Series([vals["inc"]], dtype="int64"),
        "n_decreasing": pd.Series([vals["dec"]], dtype="int64"),
        "n_constant": pd.Series([vals["const"]], dtype="int64")})


def twap_value_by_type(sf_dir: str):
    """Time-weighted average value per event type (ORACLED): the
    trapezoid integral of each type's value series over its own time
    span — Σ (v_i + v_{i+1})·(t_{i+1} − t_i) / (2·span) — the TWAP a
    metering / billing / market-data pipeline ships where a plain AVG
    would let burst-sampled intervals dominate (pinned by the sf
    corpus: TWAP ≠ AVG whenever sampling is irregular). Everything
    before the final divide is EXACT: timestamps are µs int64, values
    micro-quantize by the equidepth recipe (rint·1e6 == SQL
    CAST(round(value*1e6) AS BIGINT)), each trapezoid term is a
    Python big-int product (v-sums fit int64; ×µs-gaps do not — the
    object-dtype multiply is the decimal-string discipline's engine),
    and the numerator ships as a DECIMAL STRING; the TWAP is one
    VARCHAR→DOUBLE cast and two divides in pinned operand order, 6dp.
    CONSECUTIVE-PAIR ORDER IS A CONTRACT: ties in ts resolve by
    event_id on both engines — with equal timestamps the pairing
    (a,b),(b,c) vs (b,a),(a,c) changes which value bridges the gap
    (pinned with a zero-duration spike). Distributed shape: ONE range
    sort by (type, ts, event_id) — the equidepth sort discipline —
    then a blocks-bounded summary pass emits per type-RUN (first/last
    key, endpoint values, in-block partial numerator); the driver
    orders runs and adds only the ≤ blocks·types cross-block boundary
    trapezoids. Nothing row-level reaches the driver. A single-event
    type keeps its row with span 0, numerator "0" and SQL-NULL twap
    (0/0 — pinned); null type/ts/value/event_id rows invisible; an
    empty cleaned corpus answers a typed empty frame."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "event_type", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("event_type").is_valid(),
                    b.column("ts").is_valid()),
            pc.and_(b.column("value").is_valid(),
                    b.column("event_id").is_valid())))
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "et": t.column("event_type"),
            "t": pc.cast(t.column("ts"), pa.int64()),
            "i": t.column("event_id"),
            "v": pa.array(np.rint(v * 1e6).astype(np.int64))})

    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_events": pd.Series([], dtype="int64"),
        "span_us": pd.Series([], dtype="int64"),
        "twap_num_scaled": pd.Series([], dtype="object"),
        "twap": pd.Series([], dtype="float64")})
    sortd = ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=131072) \
        .sort(["et", "t", "i"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "et": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "if_": pa.array([], pa.int64()),
            "vf": pa.array([], pa.int64()),
            "tl": pa.array([], pa.int64()),
            "vl": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "num": pa.array([], pa.string())})
        if b.num_rows == 0:
            return empty
        et = b.column("et").to_numpy(zero_copy_only=False)
        t = b.column("t").to_numpy(zero_copy_only=False)
        i = b.column("i").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        idxf = np.flatnonzero(
            np.concatenate(([True], et[1:] != et[:-1])))
        ends = np.append(idxf[1:], len(et))
        # in-run trapezoid partials: object-dtype products (µs gaps
        # × value sums overflow int64), reduceat per run
        if len(et) > 1:
            terms = ((v[1:].astype(object) + v[:-1].astype(object))
                     * (t[1:].astype(object) - t[:-1].astype(object)))
            same = et[1:] == et[:-1]
            terms = np.where(same, terms, 0)
            sums = [int(terms[a:e - 1].sum()) if e - a >= 2 else 0
                    for a, e in zip(idxf.tolist(), ends.tolist())]
        else:
            sums = [0]
        return pa.table({
            "et": pa.array(et[idxf]),
            "tf": pa.array(t[idxf]),
            "if_": pa.array(i[idxf]),
            "vf": pa.array(v[idxf]),
            "tl": pa.array(t[ends - 1]),
            "vl": pa.array(v[ends - 1]),
            "n": pa.array((ends - idxf).astype(np.int64)),
            "num": pa.array([str(s) for s in sums], pa.string())})

    summ = sortd.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if summ.empty or "et" not in summ.columns:
        return out_empty
    summ = summ.sort_values(["et", "tf", "if_"]).reset_index(drop=True)
    rows = []
    for et, g in summ.groupby("et", sort=True):
        num = sum(int(s) for s in g["num"])
        tl = g["tl"].to_numpy()
        vl = g["vl"].to_numpy()
        tf = g["tf"].to_numpy()
        vf = g["vf"].to_numpy()
        # cross-block boundary trapezoids between consecutive runs
        for j in range(len(g) - 1):
            num += (int(vl[j]) + int(vf[j + 1])) \
                * (int(tf[j + 1]) - int(tl[j]))
        span = int(tl[-1]) - int(tf[0])
        n = int(g["n"].sum())
        twap = (float("nan") if span == 0 else
                float(duckdb_round(
                    float(num) / float(2 * span) / 1e6, 6)))
        rows.append({"event_type": et, "n_events": n,
                     "span_us": span, "twap_num_scaled": str(num),
                     "twap": twap})
    out = pd.DataFrame(rows)
    out["n_events"] = out["n_events"].astype("int64")
    out["span_us"] = out["span_us"].astype("int64")
    out["twap"] = out["twap"].astype("float64")
    return out


def mmr_rerank_embeddings(sf_dir: str, m: int = 20, k: int = 10):
    """Maximal-marginal-relevance re-ranking, EXACT (ORACLED): for the
    two lowest-id query vectors, greedily select k of the top-m
    integer-dot candidates maximizing relevance-minus-redundancy —
    the diversity re-ranker every retrieval stack bolts onto its ANN
    stage — and the repo's first oracle over an ITERATIVE GREEDY
    algorithm (the SQL side replays the selection loop in a recursive
    CTE carrying the picked-list). Exactness is STRUCTURAL, not
    empirical: float cosines differ across engines in the last ULP
    (measured 2.2e-16 on this corpus), which a per-step argmax could
    amplify into divergent selections, so the similarity here is the
    INTEGER dot product of micro-quantized vectors (rint(x·1e6) —
    the int8-rerank discipline made exact; comps ≤ .5 and dim 64 keep
    every dot < 2^44, exact in int64 AND in SQL's double
    list_inner_product). With λ = ½ the selection order equals
    argmax of mmr_x2 = s_query − max_{p∈picked} s(d, p) — pure int
    compares with a vec_id tiebreak; rank 1 carries the relevance
    itself (no penalty term exists yet — pinned, not coalesced to 0).
    Distributed shape: ONE corpus pass scores integer dots against
    the broadcast quantized queries and emits ≤ nq·m rows per batch
    WITH their quantized vectors riding along (so no second corpus
    scan to fetch candidate vectors); the driver merges to top-m per
    query — batch-local top-m is a superset of the global under the
    (s, −id) order — and replays the k-step greedy over an m×m int
    matrix. The query vector itself is excluded from its candidates
    (pinned). Null vec_id/embedding rows invisible; fewer than k
    candidates degrade to however many exist; an empty corpus
    answers a typed empty frame."""
    import duckdb as _dk
    from ..ann.search import embedding_matrix
    qdf = _dk.sql(
        f"""SELECT vec_id, embedding
            FROM read_parquet('{sf_dir}/embeddings.parquet')
            WHERE vec_id IS NOT NULL AND embedding IS NOT NULL
            ORDER BY vec_id LIMIT 2""").df()
    out_empty = pd.DataFrame({
        "query_id": pd.Series([], dtype="int64"),
        "rank": pd.Series([], dtype="int64"),
        "vec_id": pd.Series([], dtype="int64"),
        "mmr_x2": pd.Series([], dtype="int64")})
    if qdf.empty:
        return out_empty
    Qq = np.rint(np.stack(
        [np.asarray(v, dtype=np.float64)
         for v in qdf["embedding"]]) * 1e6).astype(np.int64)
    qids = qdf["vec_id"].to_numpy().astype(np.int64)
    import ray as _ray
    ref = _ray.put({"Q": Qq, "ids": qids})

    def score(b: pa.Table) -> pa.Table:
        from ..util import worker_cached
        st = worker_cached(("mmrq", ref.hex()),
                           lambda: _ray.get(ref))
        Q, ids_q = st["Q"], st["ids"]
        t = b.filter(pc.and_(b.column("vec_id").is_valid(),
                             b.column("embedding").is_valid()))
        d = Q.shape[1]
        empty = pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
            "vq": pa.array([], pa.list_(pa.int64(), d))})
        if t.num_rows == 0:
            return empty
        V = embedding_matrix(t.column("embedding"))
        Vq = np.rint(V * 1e6).astype(np.int64)
        ids = t.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        S = Vq @ Q.T  # (n, nq) exact int64
        oq, oi, os_, ov = [], [], [], []
        for qi in range(Q.shape[0]):
            mask = ids != ids_q[qi]  # self-exclusion
            s, idx = S[mask, qi], np.flatnonzero(mask)
            order = np.lexsort((ids[idx], -s))[:m]
            sel = idx[order]
            oq.append(np.full(len(sel), ids_q[qi], np.int64))
            oi.append(ids[sel])
            os_.append(S[sel, qi])
            ov.append(Vq[sel])
        vq_flat = np.concatenate(ov).ravel() if ov else \
            np.array([], np.int64)
        return pa.table({
            "query_id": pa.array(np.concatenate(oq)),
            "vec_id": pa.array(np.concatenate(oi)),
            "s": pa.array(np.concatenate(os_)),
            "vq": pa.FixedSizeListArray.from_arrays(
                pa.array(vq_flat), d)})

    cand = _read(sf_dir, "embeddings",
                 columns=["vec_id", "embedding"]) \
        .map_batches(score, batch_format="pyarrow",
                     zero_copy_batch=True,
                     batch_size=65536).to_pandas()
    if cand.empty or "query_id" not in cand.columns:
        return out_empty
    rows = []
    for qid, g in cand.groupby("query_id", sort=True):
        g = g.sort_values(["s", "vec_id"],
                          ascending=[False, True]).head(m)
        ids = g["vec_id"].to_numpy().astype(np.int64)
        s = g["s"].to_numpy().astype(np.int64)
        Vc = np.stack([np.asarray(v, dtype=np.int64)
                       for v in g["vq"]])
        CC = Vc @ Vc.T  # exact candidate-candidate int dots
        picked: list[int] = []
        remaining = list(range(len(ids)))
        for rank in range(1, min(k, len(ids)) + 1):
            best_j, best_key = None, None
            for j in remaining:
                pen = max(int(CC[j, p]) for p in picked) \
                    if picked else None
                mmr = int(s[j]) if pen is None else int(s[j]) - pen
                key = (-mmr, int(ids[j]))
                if best_key is None or key < best_key:
                    best_j, best_key = j, key
            rows.append({"query_id": int(qid), "rank": rank,
                         "vec_id": int(ids[best_j]),
                         "mmr_x2": -best_key[0]})
            picked.append(best_j)
            remaining.remove(best_j)
    out = pd.DataFrame(rows)
    for c in ("query_id", "rank", "vec_id", "mmr_x2"):
        out[c] = out[c].astype("int64")
    return out


def leadlag_daily_events(sf_dir: str):
    """Lag-1 LEAD-LAG cross-correlation matrix between event types
    (ORACLED): for every ORDERED type pair (lead, follow), the Pearson
    r between lead's daily count on day d and follow's on day d+1
    over the dense zero-filled calendar grid — the cross-series
    causality screen ("do errors today predict retries tomorrow?")
    that autocorr answers only within a series. Eighth consumer of
    _dense_daily_counts: both series must zero-fill or the day
    alignment silently shifts across gaps. Every moment sum is an
    exact integer computed identically on both engines (Python
    big-int on the driver's types×days matrix; HUGEINT in SQL — the
    pairwise products leave int64 at real scale), so r is ONE
    VARCHAR→DOUBLE numerator over ONE sqrt of the exact variance
    product, 6dp — the autocorr formula, cross-series, with the
    moments written out instead of corr() so the arithmetic is the
    pinned expression, not an aggregate's internal fold. A
    zero-variance side answers SQL-NULL r but KEEPS its pair row;
    vocabulary² output (pairs of observed types) is calendar-and-
    vocabulary bounded like every grid query. Fewer than two grid
    days → typed empty frame (no d+1 exists), as does a typeless
    corpus."""
    f = _dense_daily_counts(sf_dir)
    out_empty = pd.DataFrame({
        "type_lead": pd.Series([], dtype="object"),
        "type_follow": pd.Series([], dtype="object"),
        "n_pairs": pd.Series([], dtype="int64"),
        "r": pd.Series([], dtype="float64")})
    if f is None:
        return out_empty
    piv = f.pivot(index="event_type", columns="day",
                  values="n").sort_index()
    types = piv.index.tolist()
    C = piv.to_numpy().astype(np.int64)
    if C.shape[1] < 2 or len(types) < 2:
        return out_empty
    rows = []
    for a, ta in enumerate(types):
        x = C[a, :-1].astype(object)
        sx, sxx = int(x.sum()), int((x * x).sum())
        for b, tb in enumerate(types):
            if a == b:
                continue
            y = C[b, 1:].astype(object)
            m = len(y)
            sy, syy = int(y.sum()), int((y * y).sum())
            sxy = int((x * y).sum())
            vx = m * sxx - sx * sx
            vy = m * syy - sy * sy
            num = m * sxy - sx * sy
            r = (float(duckdb_round(
                float(num) / math.sqrt(float(vx * vy)), 6))
                if vx > 0 and vy > 0 and m >= 2 else float("nan"))
            rows.append({"type_lead": ta, "type_follow": tb,
                         "n_pairs": m, "r": r})
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["r"] = out["r"].astype("float64")
    return out


def k_anonymity_customers(sf_dir: str, k: int = 5):
    """k-ANONYMITY audit of the customer quasi-identifier pair
    (nationkey, mktsegment) (ORACLED): ONE row — total rows, distinct
    QI classes, the smallest class size (the dataset's k), how many
    classes fall below ``k``=5, and how many ROWS sit in those
    re-identifiable classes — the release-gate readout a privacy
    review runs before a table ships (a dataset is k-anonymous iff
    every QI class holds ≥ k rows; the at-risk ROW count, not the
    class count, is the exposure). NULL is a real QI value (SQL GROUP
    BY semantics — an attacker sees a null segment too; pinned), so
    no row is ever excluded. Exact integers end to end. Plan: one
    grouped_agg count over the QI pair (per-batch combine, vocabulary-
    bounded shuffle), then a driver fold over the class-size list —
    classes are bounded by nations × segments, not by rows. An empty
    table answers the SQL ungrouped-aggregate row with k_min NULL."""
    ds = _read(sf_dir, "customer",
               columns=["c_nationkey", "c_mktsegment"])
    g = grouped_agg(ds, ["c_nationkey", "c_mktsegment"], {},
                    count_alias="n").to_pandas()
    if g.empty or "n" not in g.columns:
        return pd.DataFrame({
            "n_rows": pd.Series([0], dtype="int64"),
            "n_classes": pd.Series([0], dtype="int64"),
            "k_min": pd.Series([float("nan")], dtype="float64"),
            "n_classes_below": pd.Series([0], dtype="int64"),
            "n_rows_at_risk": pd.Series([0], dtype="int64")})
    n = g["n"].to_numpy().astype(np.int64)
    small = n < k
    return pd.DataFrame({
        "n_rows": pd.Series([int(n.sum())], dtype="int64"),
        "n_classes": pd.Series([len(n)], dtype="int64"),
        "k_min": pd.Series([float(n.min())], dtype="float64"),
        "n_classes_below": pd.Series([int(small.sum())],
                                     dtype="int64"),
        "n_rows_at_risk": pd.Series([int(n[small].sum())],
                                    dtype="int64")})


def next_action_profile_events(sf_dir: str):
    """Markov NEXT-ACTION profile (ORACLED): per previous event type,
    the transition count, the branching factor (distinct next types),
    the most likely next action (count-desc, name-asc tiebreak) and
    its exact share — the argmax readout of the transition matrix a
    next-action recommender or anomaly screen actually serves
    (transitions_event_types ships the full matrix; this ships the
    decision). Rides the SAME pair machinery: per-user (ts, event_id)-
    ordered pairs from the user-hash partition pass, aggregated to
    the vocabulary²-bounded matrix; the profile fold is driver-side
    over ≤ |types|² rows. Exact integers plus ONE divide per row in
    SQL operand order, 6dp. The argmax tiebreak is pinned (equal
    counts → lexicographically smallest next type on both engines).
    NULL-type events are removed from the timeline BEFORE pairing
    (the transitions contract: A, NULL, B still yields A→B); a corpus
    with no transition answers a typed empty frame."""
    t = transitions_event_types(sf_dir)
    out_empty = pd.DataFrame({
        "prev_type": pd.Series([], dtype="object"),
        "n_pairs": pd.Series([], dtype="int64"),
        "n_next_types": pd.Series([], dtype="int64"),
        "top_next": pd.Series([], dtype="object"),
        "top_n": pd.Series([], dtype="int64"),
        "top_share": pd.Series([], dtype="float64")})
    if t.empty:
        return out_empty
    rows = []
    for prev, g in t.groupby("prev_type", sort=True):
        g = g.sort_values(["n", "next_type"],
                          ascending=[False, True])
        tot = int(g["n"].sum())
        top_n = int(g["n"].iloc[0])
        rows.append({
            "prev_type": prev, "n_pairs": tot,
            "n_next_types": len(g),
            "top_next": g["next_type"].iloc[0], "top_n": top_n,
            "top_share": float(duckdb_round(
                float(top_n) / float(tot), 6))})
    out = pd.DataFrame(rows)
    for c in ("n_pairs", "n_next_types", "top_n"):
        out[c] = out[c].astype("int64")
    out["top_share"] = out["top_share"].astype("float64")
    return out


def winnow_md5_documents(sf_dir: str, w: int = 4):
    """WINNOWING fingerprints, value-level (ORACLED): per document,
    the count and order-insensitive sum of its selected winnowing
    fingerprints — window ``w``=4 over the md5 unigram token-hash
    sequence, each full window contributing its RIGHTMOST-minimum
    hash, duplicates collapsed per distinct selected position — the
    Schleimer-Wilkerson-Aiken local fingerprinting scheme (MOSS; the
    production fingerprint_documents' family) brought under the md5
    oracle convention: the internal rolling hash no SQL engine can
    reproduce keeps that query rows-only, while md5 token hashes make
    the whole selection VALUE-reproducible. The rightmost-min tie
    rule becomes one windowed MIN in SQL via the key encoding
    h·2^20 + (2^20−1 − pos) — minimizing the key IS lexicographic
    (h asc, pos desc), so both engines select identical (h, pos)
    pairs for any tie pattern (docs are bounded at 2^20 tokens per
    row — stated, generous for any real document). Per-doc outputs:
    n_fingerprints (int) and fp_sum (Σ of the selected uint64 hashes
    — exceeds int64, rides the DECIMAL-STRING discipline / SQL
    HUGEINT). Tokens are the md5lsh convention (split on ' ', empties
    dropped, positions counted AFTER the drop); windows never span
    rows (adjacency is a row property; duplicate-doc_id rows merge by
    SUMMING their per-row counts/sums — each row fingerprints
    independently); a row with fewer than w tokens has no full
    window and contributes nothing — a doc with no fingerprinting
    row is ABSENT (pinned). Null doc_id/text rows invisible; an
    empty corpus answers a typed empty frame. Distributed shape: the
    token stream never shuffles — each batch reduces to one partial
    row per input row; ONE doc-hash partition merges duplicates with
    big-int sums; output is doc-cardinality like every per-doc
    metric."""
    from ..dedup.md5lsh import _row_token_hashes
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("doc_id").is_valid(),
                             b.column("text").is_valid()))
        memo: dict = {}
        rows = _row_token_hashes(t.column("text").to_pylist(), memo)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out_id, out_n, out_s = [], [], []
        for i, hs in enumerate(rows):
            if hs is None or len(hs) < w:
                continue
            W = np.lib.stride_tricks.sliding_window_view(hs, w)
            mn = W.min(axis=1)
            # rightmost position attaining the window min: first hit
            # in the reversed window
            ridx = (w - 1) - np.argmax(W[:, ::-1] == mn[:, None],
                                       axis=1)
            pos = np.arange(len(mn)) + ridx
            _, first = np.unique(pos, return_index=True)
            sel = mn[first]
            out_id.append(int(ids[i]))
            out_n.append(len(sel))
            out_s.append(str(int(sel.astype(object).sum())))
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_fp": pa.array(out_n, pa.int64()),
            "s": pa.array(out_s, pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        acc: dict[int, list] = {}
        for d, n, s in zip(df["doc_id"], df["n_fp"], df["s"]):
            e = acc.setdefault(int(d), [0, 0])
            e[0] += int(n)
            e[1] += int(s)
        ks = sorted(acc)
        return pa.table({
            "doc_id": pa.array(ks, pa.int64()),
            "n_fp": pa.array([acc[k][0] for k in ks], pa.int64()),
            "s": pa.array([str(acc[k][1]) for k in ks],
                          pa.string())})

    out = partitioned_group_apply(parts, ["doc_id"], merge,
                                  batch_format="pyarrow").to_pandas()
    if out.empty or "doc_id" not in out.columns:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_fingerprints": pd.Series([], dtype="int64"),
            "fp_sum": pd.Series([], dtype="object")})
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pd.DataFrame({
        "doc_id": out["doc_id"].astype("int64"),
        "n_fingerprints": out["n_fp"].astype("int64"),
        "fp_sum": out["s"].astype(object)})


def iso_week_volume_events(sf_dir: str):
    """ISO-WEEK volume rollup (ORACLED): event count and observed-day
    count per ISO (year, week) — the weekly reporting grain, pinned
    on the calendar footgun every home-grown week bucketing gets
    wrong: ISO weeks are Monday-based and week 1 belongs to the year
    containing that week's Thursday, so 2014-12-29 is 2015-W01 and
    2016-01-01 is 2015-W53 (both crafted pins; strftime('%W')-style
    buckets disagree on exactly these rows). Exact integers; the
    engines' ISO implementations (pandas isocalendar == DuckDB
    isoyear/weekofyear) are the oracle subject. Plan: per-batch
    grouped (isoyear, week, day) partials (calendar-bounded), one
    tiny shuffle, driver collapses days into the per-week day count.
    Null ts rows invisible; empty corpus → typed empty frame."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(b.column("ts").is_valid())
        s = t.column("ts").to_pandas()
        iso = s.dt.isocalendar()
        return pa.table({
            "iso_year": pa.array(iso["year"].to_numpy()
                                 .astype(np.int64)),
            "iso_week": pa.array(iso["week"].to_numpy()
                                 .astype(np.int64)),
            "d": pa.array(s.dt.normalize().astype(np.int64)
                          .to_numpy())})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["iso_year", "iso_week", "d"], {},
        count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "iso_year": pd.Series([], dtype="int64"),
        "iso_week": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
        "n_days": pd.Series([], dtype="int64")})
    if agg.empty or "iso_year" not in agg.columns:
        return out_empty
    g = agg.groupby(["iso_year", "iso_week"]).agg(
        n_events=("n", "sum"), n_days=("d", "nunique")) \
        .reset_index().sort_values(["iso_year", "iso_week"]) \
        .reset_index(drop=True)
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g


def emd_value_halves_events(sf_dir: str, k: int = 20,
                            lo: float = 0.0, hi: float = 1000.0):
    """Exact earth-mover's distance between the value distributions
    of the corpus' two calendar halves (ORACLED): bucket value into
    k=20 uniform bands over [0, 1000), split rows at the calendar
    midpoint ((min_day + max_day) // 2, first half inclusive), and
    compute the 1-D EMD = Σ_bins |cdfA − cdfB| — the drift metric
    that, unlike KS (max deviation) or PSI (log ratios), weighs HOW
    FAR mass moved, in band units. The whole statistic is exact
    integers until one final divide: with counts a_i, b_i and totals
    n_a, n_b, Σ |cumA_i·n_b − cumB_i·n_a| is an exact big-int
    (DECIMAL STRING / SQL HUGEINT — cum products reach n_a·n_b per
    band), and emd = that over (n_a·n_b), ONE VARCHAR→DOUBLE divide,
    6dp. Values outside the band support are excluded (the
    value_bands support convention — stated); an empty half answers
    SQL-NULL emd with the counts still reported (pinned); no
    surviving row at all → the ungrouped-aggregate zeros row with
    NULL emd. Plan: per-batch (half, band) partial counts — 2k rows
    per batch, nothing else shuffles — after one tiny min/max date
    scan for the midpoint."""
    ds0 = _read(sf_dir, "events", columns=["ts"])

    def pminmax(b: pa.Table) -> pa.Table:
        col = b.column("ts").drop_null()
        if len(col) == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        d = pc.cast(pc.cast(col, pa.date32()), pa.int32())
        return pa.table({
            "mn": pa.array([pc.min(d).as_py()], pa.int64()),
            "mx": pa.array([pc.max(d).as_py()], pa.int64())})

    mm = ds0.map_batches(pminmax, batch_format="pyarrow",
                         zero_copy_batch=True,
                         batch_size=131072).to_pandas()
    out_zero = pd.DataFrame({
        "n_first": pd.Series([0], dtype="int64"),
        "n_second": pd.Series([0], dtype="int64"),
        "emd_scaled": pd.Series([None], dtype="object"),
        "emd_bands": pd.Series([float("nan")], dtype="float64")})
    if mm.empty or "mn" not in mm.columns:
        return out_zero
    mid = (int(mm["mn"].min()) + int(mm["mx"].max())) // 2
    width = (hi - lo) / k
    edges = lo + width * np.arange(k + 1)

    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("value").is_valid()))
        if t.num_rows == 0:
            return pa.table({"half": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()),
                    pa.int32()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        m = np.isfinite(v) & (v >= lo) & (v < hi)
        d, v = d[m], v[m]
        half = (d > mid).astype(np.int64)
        band = np.searchsorted(edges, v, side="right") - 1
        key = half * k + band
        cnt = np.bincount(key, minlength=2 * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"half": pa.array(nz // k),
                         "band": pa.array(nz % k),
                         "n_p": pa.array(cnt[nz])})

    agg = grouped_agg(
        ds.map_batches(part, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["half", "band"], {"n_p": "n"}, count_alias="_c").to_pandas()
    if agg.empty or "half" not in agg.columns:
        return out_zero
    a = np.zeros(k, np.int64)
    b_ = np.zeros(k, np.int64)
    for _, r in agg.iterrows():
        (a if int(r["half"]) == 0 else b_)[int(r["band"])] = \
            int(r["n"])
    na, nb = int(a.sum()), int(b_.sum())
    if na == 0 or nb == 0:
        return pd.DataFrame({
            "n_first": pd.Series([na], dtype="int64"),
            "n_second": pd.Series([nb], dtype="int64"),
            "emd_scaled": pd.Series([None], dtype="object"),
            "emd_bands": pd.Series([float("nan")],
                                   dtype="float64")})
    ca = np.cumsum(a.astype(object))
    cb = np.cumsum(b_.astype(object))
    scaled = int(sum(abs(ca[i] * nb - cb[i] * na)
                     for i in range(k)))
    emd = float(duckdb_round(float(scaled) / float(na * nb), 6))
    return pd.DataFrame({
        "n_first": pd.Series([na], dtype="int64"),
        "n_second": pd.Series([nb], dtype="int64"),
        "emd_scaled": pd.Series([str(scaled)], dtype="object"),
        "emd_bands": pd.Series([emd], dtype="float64")})


def transition_entropy_events(sf_dir: str):
    """Conditional next-action ENTROPY (ORACLED): per previous event
    type, the transition count and the Shannon entropy (base 2,
    DuckDB entropy() semantics — the user_entropy convention) of the
    next-type distribution — H(next | prev), the predictability
    readout that completes the Markov family: transitions ships the
    matrix, next_action_profile ships the argmax, this ships how much
    the argmax can ever be trusted (h→0: deterministic flows worth
    hard-coding; h→log2|types|: don't bother predicting). Rides the
    SAME user-hash pair machinery; the entropy fold is driver-side
    over the vocabulary²-bounded matrix, p·log2 p in float64 over
    EXACT integer counts, 6dp (the ≤ |types|-term fold is the
    user_entropy cross-engine contract). The null-bridging transitions
    contract holds (A, NULL, B pairs A→B); a single-next-type prev
    answers exactly 0.0; no transition anywhere → typed empty
    frame."""
    t = transitions_event_types(sf_dir)
    out_empty = pd.DataFrame({
        "prev_type": pd.Series([], dtype="object"),
        "n_pairs": pd.Series([], dtype="int64"),
        "h_next": pd.Series([], dtype="float64")})
    if t.empty:
        return out_empty
    rows = []
    for prev, g in t.groupby("prev_type", sort=True):
        n = g.sort_values("next_type")["n"].to_numpy() \
            .astype(np.float64)
        tot = n.sum()
        p = n / tot
        h = float(-(p * np.log2(p)).sum())
        rows.append({"prev_type": prev, "n_pairs": int(tot),
                     "h_next": float(duckdb_round(h, 6))})
    out = pd.DataFrame(rows)
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["h_next"] = out["h_next"].astype("float64")
    return out


def audience_growth_daily_events(sf_dir: str):
    """AUDIENCE growth curve (ORACLED): per first-activity day, how
    many users appeared for the first time and the cumulative
    audience to date — the north-star growth chart, exact (every
    analytics deck has this line; few compute it exactly at scale
    because 'distinct users to date' naively needs a growing state).
    The trick is that cumulative-distinct collapses to a plain
    cumulative SUM once each user is reduced to their ONE first-
    activity day: per-batch per-user min-day partials (min is
    combinable), ONE user-hash partition finishes the min and
    reduces straight to per-day new-user counts — calendar-bounded
    rows to the driver, where the running sum is exact ints. Day
    keys are ISO date strings (the daily_counts_ma convention). Null
    user/ts rows invisible; a user's earlier null-ts events cannot
    advance their first day (dropped pre-min, pinned); empty corpus
    → typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        d = pc.cast(pc.cast(t.column("ts"), pa.date32()), pa.int32())
        return pa.table({"u": t.column("user_id"),
                         "d": pc.cast(d, pa.int64())})

    def pmin(b: pa.Table) -> pa.Table:
        agg = b.group_by(["u"]).aggregate([("d", "min")])
        return agg.rename_columns(["u", "d"])

    parts = ds.map_batches(prep, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072) \
        .map_batches(pmin, batch_format="pyarrow",
                     zero_copy_batch=True, batch_size=131072)

    def fin(t: pa.Table) -> pa.Table:
        agg = t.group_by(["u"]).aggregate([("d", "min")])
        days = agg.column("d_min").to_numpy(zero_copy_only=False)
        uk, cnt = np.unique(days, return_counts=True)
        return pa.table({"d": pa.array(uk.astype(np.int64)),
                         "nu": pa.array(cnt.astype(np.int64))})

    agg = partitioned_group_apply(parts, ["u"], fin,
                                  batch_format="pyarrow").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "new_users": pd.Series([], dtype="int64"),
        "cum_users": pd.Series([], dtype="int64")})
    if agg.empty or "d" not in agg.columns:
        return out_empty
    g = agg.groupby("d")["nu"].sum().reset_index() \
        .sort_values("d").reset_index(drop=True)
    import datetime
    day = [(datetime.date(1970, 1, 1)
            + datetime.timedelta(days=int(x))).isoformat()
           for x in g["d"]]
    return pd.DataFrame({
        "day": pd.Series(day, dtype="object"),
        "new_users": g["nu"].astype("int64"),
        "cum_users": g["nu"].cumsum().astype("int64")})


def bm25_topk_documents(sf_dir: str, nq: int = 3, k: int = 10,
                        k1: float = 1.2, b: float = 0.75):
    """BM25 top-k SEARCH (ORACLED): rank documents by Okapi BM25
    against the corpus' own top-``nq``=3 document-frequency terms
    (df desc, term asc — a self-contained deterministic query set) —
    the retrieval scorer every lexical search / RAG recall stage
    ships, here end to end on the engine: statistics pass, broadcast
    query terms, streaming scoring, top-k merge. A DOCUMENT is a
    doc_id: rows sharing one concatenate (the winnow/md5lsh row-merge
    convention — the first draft scored per ROW and the session's
    random-duplicate property net caught the divergence), so N and
    every df count DISTINCT doc_ids and dl/tf sum across a doc's
    rows. Plan: (A) distinct cleaned-doc count, (B) one token pass →
    (doc, term, tf) partials → doc-distinct df + total tokens
    (vocabulary-bounded table; top-3 terms + avgdl read driver-side),
    (C) one scoring pass emitting per-row (doc, dl, tf…) partials —
    the token stream never shuffles, only nq+2 ints per row — merged
    in ONE doc-hash partition whose finalize scores and keeps its
    LOCAL top-k under the (round(s,6) desc, doc_id) order (a global
    winner is necessarily its partition's winner once docs are
    merged); the driver re-ranks ≤ k·partitions rows. Float
    discipline: idf = ln(1 + (N−df+.5)/(df+.5)) with ln on both
    engines (the tfidf libm contract), every multiply/divide in the
    SQL's literal operand order — including (1.2 + 1.0) computed as
    a SUM on both sides rather than a 2.2 literal (the two differ in
    the last bit for some k1) — and ranking compares 6dp-ROUNDED
    scores with a doc_id tiebreak so the ≤ 3-term sum's fold order
    cannot flip a rank. Zero-scoring docs are ABSENT; fewer than k
    scoring docs degrade; an empty cleaned corpus answers a typed
    empty frame."""
    import functools

    from ..text.transform import _tf_partials
    from ..util import partitioned_group_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_empty = pd.DataFrame({
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64"),
        "rank": pd.Series([], dtype="int64")})

    def clean(bt: pa.Table) -> pa.Table:
        return bt.filter(pc.and_(bt.column("doc_id").is_valid(),
                                 bt.column("text").is_valid()))

    cleaned = ds.map_batches(clean, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=131072)

    # pass A: DISTINCT cleaned doc count (duplicate-id rows are one doc)
    n_docs = grouped_agg(
        cleaned.select_columns(["doc_id"]), ["doc_id"], {},
        count_alias="_c").count()
    if n_docs == 0:
        return out_empty

    # pass B: (doc, term, tf) partials → doc-DISTINCT df + total
    # tokens (vocabulary-bounded result)
    dt = grouped_agg_hash(
        cleaned.map_batches(
            functools.partial(_tf_partials, id_col="doc_id",
                              text_col="text"),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=131072),
        ["doc_id", "term"], {"tf": "tf"}, count_alias="_c")
    vocab = grouped_agg(dt, ["term"], {"tf": "tft"},
                        count_alias="df").to_pandas()
    if vocab.empty or "term" not in vocab.columns:
        return out_empty
    toks_total = int(vocab["tft"].sum())
    q = vocab.sort_values(["df", "term"],
                          ascending=[False, True]).head(nq)
    qterms = q["term"].tolist()
    qdf = q["df"].astype(int).tolist()
    avgdl = float(toks_total) / float(n_docs)
    idf = [math.log(1.0 + (float(n_docs - d) + 0.5)
                    / (float(d) + 0.5)) for d in qdf]

    # pass C: per-row (doc, dl, tf…) partials → doc-hash merge →
    # score → partition-local top-k
    tf_cols = [f"tf{i}" for i in range(len(qterms))]

    def row_partials(bt: pa.Table) -> pa.Table:
        t = clean(bt)
        cols = {"doc_id": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64())}
        for c in tf_cols:
            cols[c] = pa.array([], pa.int64())
        if t.num_rows == 0:
            return pa.table(cols)
        toks = pc.split_pattern(t.column("text").combine_chunks(),
                                " ")
        par = pc.list_parent_indices(toks).to_numpy(
            zero_copy_only=False)
        flat = pc.cast(pc.list_flatten(toks), pa.string())
        nonz = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        n = t.num_rows
        out = {"doc_id": t.column("doc_id"),
               "dl": pa.array(np.bincount(par[nonz], minlength=n)
                              .astype(np.int64))}
        for c, term in zip(tf_cols, qterms):
            hit = pc.equal(flat, term).to_numpy(
                zero_copy_only=False)
            out[c] = pa.array(np.bincount(par[hit], minlength=n)
                              .astype(np.int64))
        return pa.table(out)

    def score_partition(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        agg = t.group_by(["doc_id"]).aggregate(
            [("dl", "sum")] + [(c, "sum") for c in tf_cols])
        ids = agg.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        dl = agg.column("dl_sum").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s = np.zeros(len(ids), np.float64)
        denom_base = k1 * (1.0 - b + b * (dl / avgdl))
        for qi, c in enumerate(tf_cols):
            tf = agg.column(f"{c}_sum") \
                .to_numpy(zero_copy_only=False).astype(np.float64)
            m = tf > 0
            s[m] += idf[qi] * (tf[m] * (k1 + 1.0)) \
                / (tf[m] + denom_base[m])
        m = s > 0
        ids, s = ids[m], s[m]
        if ids.size == 0:
            return empty
        sr = np.array([float(duckdb_round(float(x), 6)) for x in s])
        order = np.lexsort((ids, -sr))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "s": pa.array(s[order])})

    cand = partitioned_group_apply(
        ds.map_batches(row_partials, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["doc_id"], score_partition,
        batch_format="pyarrow").to_pandas()
    if cand.empty or "doc_id" not in cand.columns or not len(cand):
        return out_empty
    cand["score"] = cand["s"].map(
        lambda x: float(duckdb_round(float(x), 6)))
    cand = cand.sort_values(["score", "doc_id"],
                            ascending=[False, True]).head(k) \
        .reset_index(drop=True)
    return pd.DataFrame({
        "doc_id": cand["doc_id"].astype("int64"),
        "score": cand["score"].astype("float64"),
        "rank": pd.Series(np.arange(1, len(cand) + 1),
                          dtype="int64")})


def _grouped_disc_quantiles(stream, qs=(("p50", 0.5), ("p90", 0.9))):
    """Distributed GROUPED disc-quantiles over a materialized stream
    of (g: group, v: int64 metric, uid: int64 uniquifier) rows: per
    group, the row count and the exact sorted[ceil(q·n)−1] value for
    each requested quantile (DuckDB quantile_disc). The block-position
    machinery generalized to groups: ONE range sort by (g, v, uid) —
    a unique total order, the _ntile_boundaries requirement — whose
    blocks-bounded summary reports per-block GROUP-RUN sub-spans
    (block first-key identity + local start + count, the
    gains_by_segment segment-spanning-blocks discipline); the driver
    walks runs in global order mapping each group's target positions
    to (block, local offset), and a second block-aligned pass ships
    ONLY those rows. Nothing row-level reaches the driver beyond
    |qs| rows per group. Returns a (g, n, <label>…) DataFrame or
    None when the stream is empty."""
    counts = grouped_agg(stream, ["g"], {}, count_alias="n") \
        .to_pandas()
    if counts.empty or "g" not in counts.columns:
        return None
    targets = {}
    for _, r in counts.iterrows():
        n = int(r["n"])
        targets[r["g"]] = {"n": n}
        for lbl, q in qs:
            targets[r["g"]][lbl] = max(
                int(math.ceil(q * n)) - 1, 0)

    sortd = stream.sort(["g", "v", "uid"]).materialize()

    def summary(b: pa.Table) -> pa.Table:
        empty = pa.table({
            "b_g": pa.array([], pa.string()),
            "b_v": pa.array([], pa.int64()),
            "b_uid": pa.array([], pa.int64()),
            "g": pa.array([], pa.string()),
            "start": pa.array([], pa.int64()),
            "cnt": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        g = b.column("g").to_numpy(zero_copy_only=False)
        idxf = np.flatnonzero(
            np.concatenate(([True], g[1:] != g[:-1])))
        cnts = np.diff(np.append(idxf, len(g)))
        n = len(idxf)
        return pa.table({
            "b_g": pa.array([g[0]] * n, pa.string()),
            "b_v": pa.array([b.column("v")[0].as_py()] * n,
                            pa.int64()),
            "b_uid": pa.array([b.column("uid")[0].as_py()] * n,
                              pa.int64()),
            "g": pa.array(g[idxf]),
            "start": pa.array(idxf.astype(np.int64)),
            "cnt": pa.array(cnts.astype(np.int64))})

    runs = sortd.map_batches(summary, batch_format="pyarrow",
                             zero_copy_batch=True,
                             batch_size=None).to_pandas()
    if runs.empty or "b_g" not in runs.columns:
        return None
    runs = runs.sort_values(["b_g", "b_v", "b_uid", "start"]) \
        .reset_index(drop=True)
    acc: dict = {}
    want: dict = {}
    labels = [lbl for lbl, _ in qs]
    for _, r in runs.iterrows():
        g, cnt = r["g"], int(r["cnt"])
        a = acc.get(g, 0)
        tg = targets[g]
        for lbl in labels:
            pos = tg[lbl]
            if a <= pos < a + cnt:
                key = (r["b_g"], int(r["b_v"]), int(r["b_uid"]))
                want.setdefault(key, []).append(
                    (int(r["start"]) + (pos - a), g, lbl))
        acc[g] = a + cnt

    def extract(b: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], pa.string()),
                          "lbl": pa.array([], pa.string()),
                          "v": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        key = (b.column("g")[0].as_py(), b.column("v")[0].as_py(),
               b.column("uid")[0].as_py())
        sel = want.get(key)
        if not sel:
            return empty
        vals = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "g": pa.array([s[1] for s in sel], pa.string()),
            "lbl": pa.array([s[2] for s in sel], pa.string()),
            "v": pa.array([int(vals[s[0]]) for s in sel],
                          pa.int64())})

    got = sortd.map_batches(extract, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=None).to_pandas()
    piv = got.pivot(index="g", columns="lbl", values="v") \
        .reset_index()
    piv["n"] = piv["g"].map(lambda e: targets[e]["n"])
    return piv


def gap_quantiles_by_type(sf_dir: str):
    """Distributed DISC-QUANTILES of inter-arrival gaps per type
    (ORACLED): per event_type, the gap count and the exact p50/p90 of
    the µs gaps between consecutive same-type events of the same user
    — the latency/SLA profile (interarrival_cv reads the same gap
    stream's moments; a long-tailed stream needs the order statistics,
    and p90 is what the pager threshold is set from). First consumer
    of _grouped_disc_quantiles (the block-position machinery
    generalized to grouped quantiles — see its docstring for the
    sort/summary/extract shape): stage 1 produces the gap stream in
    ONE user-hash partition pass (the interarrival lexsort-diff
    kernel, gaps tagged with the later event's id as the unique-order
    uniquifier). Exact int64 µs end to end — no float exists anywhere
    in this query. Equal timestamps contribute gap 0 in any order; a
    type whose users all have single events is ABSENT (no gap — SQL
    GROUP BY over the non-null lag set); null user/type/ts/id rows
    invisible; an empty gap stream answers a typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.and_(b.column("user_id").is_valid(),
                    b.column("ts").is_valid()),
            pc.and_(b.column("event_type").is_valid(),
                    b.column("event_id").is_valid())))

    _gap_schema = pa.schema([("g", pa.string()),
                             ("v", pa.int64()),
                             ("uid", pa.int64())])

    def gaps(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _gap_schema.empty_table()
        df = t.to_pandas()
        u = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, et, u))
        u, et, ts, eid = u[order], et[order], ts[order], eid[order]
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        g = ts[1:] - ts[:-1]
        return pa.table({"g": pa.array(et[1:][same]),
                         "v": pa.array(g[same]),
                         "uid": pa.array(eid[1:][same])},
                        schema=_gap_schema)

    stream = partitioned_group_apply(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["user_id"], gaps, batch_format="pyarrow").materialize()

    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_gaps": pd.Series([], dtype="int64"),
        "p50_us": pd.Series([], dtype="int64"),
        "p90_us": pd.Series([], dtype="int64")})
    piv = _grouped_disc_quantiles(stream)
    if piv is None:
        return out_empty
    out = pd.DataFrame({
        "event_type": piv["g"].astype(object),
        "n_gaps": piv["n"].astype("int64"),
        "p50_us": piv["p50"].astype("int64"),
        "p90_us": piv["p90"].astype("int64")}) \
        .sort_values("event_type").reset_index(drop=True)
    return out


def price_quantiles_by_brand(sf_dir: str):
    """Distributed DISC-QUANTILES of line price per part brand
    (ORACLED): per p_brand, the lineitem count and the exact p50/p90
    of extended-price cents — the price-book percentile readout
    (brand_quantity reads sums; a pricing review wants the order
    statistics). Second consumer of _grouped_disc_quantiles, proving
    the grouped block-position machinery generalizes across tables:
    the brand attaches from ONE broadcast part dict (the
    basket_brand convention, inner-join semantics — lineitems of
    unknown partkey are invisible, pinned), cents ride the pinned
    rint/CAST recipe, and the uniquifier is the (orderkey·10 +
    linenumber) composite — linenumber < 10 by construction keeps it
    collision-free, stated. Exact int64 cents end to end — no float
    after quantization. Null partkey/price rows invisible; an empty
    cleaned stream answers a typed empty frame."""
    import ray
    part = _read(sf_dir, "part",
                 columns=["p_partkey", "p_brand"]).to_pandas()
    ref = ray.put(dict(zip(part["p_partkey"], part["p_brand"])))
    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_linenumber", "l_partkey",
                        "l_extendedprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(
            pc.and_(b.column("l_partkey").is_valid(),
                    b.column("l_extendedprice").is_valid()),
            pc.and_(b.column("l_orderkey").is_valid(),
                    b.column("l_linenumber").is_valid())))
        t = _broadcast_lookup_batch(t, ref=ref, key="l_partkey",
                                    out="g")
        t = t.filter(t.column("g").is_valid())
        v = t.column("l_extendedprice") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ln = t.column("l_linenumber") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pc.cast(t.column("g"), pa.string()),
            "v": pa.array(np.rint(v * 100.0).astype(np.int64)),
            "uid": pa.array(ok * 10 + ln)})

    stream = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=131072).materialize()
    out_empty = pd.DataFrame({
        "p_brand": pd.Series([], dtype="object"),
        "n_lines": pd.Series([], dtype="int64"),
        "p50_cents": pd.Series([], dtype="int64"),
        "p90_cents": pd.Series([], dtype="int64")})
    piv = _grouped_disc_quantiles(stream)
    if piv is None:
        return out_empty
    return pd.DataFrame({
        "p_brand": piv["g"].astype(object),
        "n_lines": piv["n"].astype("int64"),
        "p50_cents": piv["p50"].astype("int64"),
        "p90_cents": piv["p90"].astype("int64")}) \
        .sort_values("p_brand").reset_index(drop=True)


def growth_accounting_monthly_events(sf_dir: str):
    """Monthly GROWTH ACCOUNTING (ORACLED): per calendar month on the
    dense min..max month grid, the active-user count decomposed into
    NEW (first-ever month), RETAINED (also active the previous month)
    and RESURRECTED (active before, but not last month), plus CHURNED
    (active last month, gone this month) — the standard
    growth-accounting identity (actives(m) = new + retained +
    resurrected; churned(m) = actives(m−1) − retained(m), an identity
    the two engines must BOTH satisfy row by row, which makes this
    query self-auditing). Exact integers end to end. Plan: ONE
    (user, month)-distinct reduction (grouped_agg_hash dedup — the
    wau/stickiness distinct discipline), ONE user-hash partition pass
    that lexsort-diffs each user's month-index sequence into
    (month, class) partial counts (class from the previous month's
    distance: none → new, 1 → retained, >1 → resurrected), a tiny
    grouped sum, and a driver-side dense month grid (calendar-
    bounded) where churned falls out of the identity. Months with no
    actives still appear (zero-filled — their churned row is where a
    total-loss month shows up; pinned). Null user/ts rows invisible;
    an empty corpus answers a typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("user_id").is_valid(),
                             b.column("ts").is_valid()))
        s = t.column("ts").to_pandas()
        mi = (s.dt.year * 12 + (s.dt.month - 1)).astype("int64")
        return pa.table({"u": t.column("user_id"),
                         "m": pa.array(mi.to_numpy())})

    pairs = grouped_agg_hash(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["u", "m"], {}, count_alias="_c")

    _cls_schema = pa.schema([("m", pa.int64()),
                             ("cls", pa.string()),
                             ("n", pa.int64())])

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _cls_schema.empty_table()
        u = t.column("u").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = t.column("m").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((m, u))
        u, m = u[order], m[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.empty(len(m), np.int64)
        gap[0] = 0
        gap[1:] = m[1:] - m[:-1]
        cls = np.where(first, "new",
                       np.where(gap == 1, "retained",
                                "resurrected"))
        key = pd.DataFrame({"m": m, "cls": cls}) \
            .groupby(["m", "cls"]).size().reset_index(name="n")
        return pa.Table.from_pandas(key, schema=_cls_schema,
                                    preserve_index=False)

    agg = partitioned_group_apply(pairs, ["u"], classify,
                                  batch_format="pyarrow")
    out = grouped_agg(agg, ["m", "cls"], {"n": "n_sum"},
                      count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "month": pd.Series([], dtype="object"),
        "n_active": pd.Series([], dtype="int64"),
        "n_new": pd.Series([], dtype="int64"),
        "n_retained": pd.Series([], dtype="int64"),
        "n_resurrected": pd.Series([], dtype="int64"),
        "n_churned": pd.Series([], dtype="int64")})
    if out.empty or "m" not in out.columns:
        return out_empty
    piv = out.pivot(index="m", columns="cls", values="n_sum") \
        .fillna(0).astype("int64")
    lo, hi = int(piv.index.min()), int(piv.index.max())
    grid = np.arange(lo, hi + 1)
    piv = piv.reindex(grid, fill_value=0)
    for c in ("new", "retained", "resurrected"):
        if c not in piv.columns:
            piv[c] = np.int64(0)
    active = (piv["new"] + piv["retained"]
              + piv["resurrected"]).to_numpy()
    churned = np.concatenate(
        ([0], active[:-1] - piv["retained"].to_numpy()[1:]))
    month = [f"{mi // 12:04d}-{mi % 12 + 1:02d}" for mi in grid]
    return pd.DataFrame({
        "month": pd.Series(month, dtype="object"),
        "n_active": pd.Series(active, dtype="int64"),
        "n_new": piv["new"].reset_index(drop=True),
        "n_retained": piv["retained"].reset_index(drop=True),
        "n_resurrected": piv["resurrected"].reset_index(drop=True),
        "n_churned": pd.Series(churned, dtype="int64")})


def hill_tail_spend(sf_dir: str, k: int = 50):
    """Hill TAIL-INDEX estimator of customer spend (ORACLED): ONE row
    — customer count, k, the (k+1)-th largest spend in cents, and
    the Hill estimate α = k / Σ_{i≤k} ln(x_i / x_{k+1}) over the
    top-k order statistics — the standard heavy-tail exponent readout
    (α ≈ 1–2: whale-dominated revenue where mean-based planning
    fails; gini says HOW unequal, Hill says WHAT LAW the tail
    follows). Spends are exact cents (the gini convention) and the
    order statistics come from the decay_spend partition-local top-k
    discipline (a global top row is necessarily its batch's top row);
    only k+1 rows reach the driver. The float boundary is explicit:
    ln of exact-cent ratios (the tfidf libm contract) summed over k
    terms, ONE divide, 6dp — and its two degenerate arms are pinned
    to SQL-NULL on both engines: fewer than k+1 customers (no tail to
    fit), and an ALL-TIED top (Σln = 0 — DuckDB's float x/0 is NULL,
    Python's is an exception, so the guard is explicit). The
    reference cutoff x_{k+1} ships as DOUBLE for dtype stability
    (NaN when absent). Ties at the cutoff resolve by custkey on both
    engines. Null custkey/price rows invisible."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0)
                              .astype(np.int64))})

    spends = grouped_agg_hash(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], {"cents": "spend"}, count_alias="_n")

    def local_top(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"c": pa.array([], pa.int64()),
                             "spend": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        c = b.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        s = b.column("spend").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        order = np.lexsort((c, -s))[:k + 1]
        np_ = np.zeros(len(order), np.int64)
        np_[0] = b.num_rows
        return pa.table({"c": pa.array(c[order]),
                         "spend": pa.array(s[order]),
                         "n_part": pa.array(np_)})

    cand = spends.map_batches(local_top, batch_format="pyarrow",
                              zero_copy_batch=True,
                              batch_size=131072).to_pandas()
    out_cols = ("n_cust", "k", "x_ref_cents", "alpha")
    if cand.empty or "c" not in cand.columns:
        return pd.DataFrame({
            "n_cust": pd.Series([0], dtype="int64"),
            "k": pd.Series([k], dtype="int64"),
            "x_ref_cents": pd.Series([float("nan")],
                                     dtype="float64"),
            "alpha": pd.Series([float("nan")], dtype="float64")})
    n_cust = int(cand["n_part"].sum())
    top = cand.sort_values(["spend", "c"],
                           ascending=[False, True]).head(k + 1)
    if n_cust < k + 1:
        return pd.DataFrame({
            "n_cust": pd.Series([n_cust], dtype="int64"),
            "k": pd.Series([k], dtype="int64"),
            "x_ref_cents": pd.Series([float("nan")],
                                     dtype="float64"),
            "alpha": pd.Series([float("nan")], dtype="float64")})
    x = top["spend"].to_numpy().astype(np.int64)
    xref = int(x[k])
    s = float(np.sum(np.log(x[:k].astype(np.float64)
                            / float(xref))))
    alpha = (float("nan") if s == 0.0 or xref <= 0 else
             float(duckdb_round(float(k) / s, 6)))
    return pd.DataFrame({
        "n_cust": pd.Series([n_cust], dtype="int64"),
        "k": pd.Series([k], dtype="int64"),
        "x_ref_cents": pd.Series([float(xref)], dtype="float64"),
        "alpha": pd.Series([alpha], dtype="float64")})


def anova_value_by_type(sf_dir: str):
    """One-way ANOVA of event value across types (ORACLED): ONE row —
    group count, row count, the F statistic and effect size η²
    (SSB/SST) for the null "every event type draws value from the
    same mean" — the first screen a metrics review runs before
    trusting per-type differences (fano/interarrival read dispersion
    within a series; this reads separation BETWEEN series). Every
    moment is an EXACT integer: values micro-quantize (the equidepth
    rint·1e6 recipe), per-type (n, Σv, Σv²) ride per-batch partials
    with the squared sums as Python big ints (a value² · corpus
    count leaves int64), and the driver holds k ≤ |types| exact
    triples. The float boundary is the textbook identity evaluated
    in pinned operand order over those ints: SSB = Σ_g S_g²/n_g −
    S²/n, SSW = Σv² − Σ_g S_g²/n_g (each S²/n one VARCHAR→DOUBLE
    divide; the ≤ k-term fold is the accepted small-sum class), F =
    (SSB/(k−1))/(SSW/(n−k)), 6dp. Degenerate arms pinned: k < 2 or
    n ≤ k (no residual degrees of freedom) and an exactly-zero SSW
    (all values equal within every group) all answer SQL-NULL F —
    while η² stays reportable whenever SST > 0. Null type/value rows
    invisible; an empty cleaned corpus answers the zeros row with
    NULL F and NULL η²."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    _m_schema = pa.schema([("g", pa.string()), ("n", pa.int64()),
                           ("s1", pa.string()), ("s2", pa.string())])

    def part(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("value").is_valid()))
        if t.num_rows == 0:
            return _m_schema.empty_table()
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        v = np.rint(t.column("value").to_numpy(zero_copy_only=False)
                    .astype(np.float64) * 1e6).astype(np.int64)
        order = np.argsort(et, kind="stable")
        et, v = et[order], v[order]
        idxf = np.flatnonzero(
            np.concatenate(([True], et[1:] != et[:-1])))
        cnts = np.diff(np.append(idxf, len(et)))
        vo = v.astype(object)
        s1 = np.add.reduceat(vo, idxf)
        s2 = np.add.reduceat(vo * vo, idxf)
        return pa.table({
            "g": pa.array(et[idxf]),
            "n": pa.array(cnts.astype(np.int64)),
            "s1": pa.array([str(x) for x in s1], pa.string()),
            "s2": pa.array([str(x) for x in s2], pa.string())},
            schema=_m_schema)

    def merge(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        acc: dict = {}
        for g, n, s1, s2 in zip(df["g"], df["n"], df["s1"],
                                df["s2"]):
            e = acc.setdefault(g, [0, 0, 0])
            e[0] += int(n)
            e[1] += int(s1)
            e[2] += int(s2)
        ks = sorted(acc)
        return pa.table({
            "g": pa.array(ks, pa.string()),
            "n": pa.array([acc[x][0] for x in ks], pa.int64()),
            "s1": pa.array([str(acc[x][1]) for x in ks],
                           pa.string()),
            "s2": pa.array([str(acc[x][2]) for x in ks],
                           pa.string())}, schema=_m_schema)

    parts = ds.map_batches(part, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072)
    agg = partitioned_group_apply(parts, ["g"], merge,
                                  batch_format="pyarrow").to_pandas()
    nullrow = pd.DataFrame({
        "k_groups": pd.Series([0], dtype="int64"),
        "n_rows": pd.Series([0], dtype="int64"),
        "f_stat": pd.Series([float("nan")], dtype="float64"),
        "eta_sq": pd.Series([float("nan")], dtype="float64")})
    if agg.empty or "g" not in agg.columns:
        return nullrow
    k = len(agg)
    n = int(agg["n"].sum())
    S = sum(int(x) for x in agg["s1"])
    S2 = sum(int(x) for x in agg["s2"])
    within = sum(float(str(int(x) * int(x))) / float(m)
                 for x, m in zip(agg["s1"], agg["n"]))
    grand = float(str(S * S)) / float(n)
    ssb = within - grand
    ssw = float(str(S2)) - within
    sst = float(str(S2)) - grand
    eta = (float(duckdb_round(ssb / sst, 6)) if sst > 0
           else float("nan"))
    f = (float(duckdb_round((ssb / float(k - 1))
                            / (ssw / float(n - k)), 6))
         if k >= 2 and n > k and ssw > 0 else float("nan"))
    return pd.DataFrame({
        "k_groups": pd.Series([k], dtype="int64"),
        "n_rows": pd.Series([n], dtype="int64"),
        "f_stat": pd.Series([f], dtype="float64"),
        "eta_sq": pd.Series([eta], dtype="float64")})


def lang_entropy_by_source(sf_dir: str):
    """Language-mix ENTROPY per source feed (ORACLED): per source,
    the doc count, distinct language count and Shannon entropy
    (base 2, DuckDB entropy() semantics — the user_entropy
    convention) of the language distribution — the feed-health
    diversity readout (h→0: a monolingual feed; h→log2|langs|: an
    even mix; a sudden drop is a scraper or labeler breaking). One
    vocabulary²-bounded grouped count (per-batch combine, tiny
    shuffle), entropy folded driver-side over exact integer counts
    (≤ |langs| terms per source — the accepted small-fold class),
    6dp. NULL langs are invisible to the entropy AND to n_langs
    (aggregate-skips-null semantics) but their docs still count in
    n_docs; an all-null-lang source answers h = 0.0 with n_langs 0
    (entropy of the empty multiset, coalesced identically in SQL —
    pinned); null sources are invisible entirely; an empty corpus
    answers a typed empty frame."""
    ds = _read(sf_dir, "documents", columns=["source", "lang"])
    agg = grouped_agg(ds, ["source", "lang"], {},
                      count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "source": pd.Series([], dtype="object"),
        "n_docs": pd.Series([], dtype="int64"),
        "n_langs": pd.Series([], dtype="int64"),
        "h_lang": pd.Series([], dtype="float64")})
    if agg.empty or "source" not in agg.columns:
        return out_empty
    agg = agg[agg["source"].notna()]
    if agg.empty:
        return out_empty
    rows = []
    for src, g in agg.groupby("source", sort=True):
        valid = g[g["lang"].notna()].sort_values("lang")
        n_docs = int(g["n"].sum())
        n = valid["n"].to_numpy().astype(np.float64)
        if n.size == 0:
            h, nl = 0.0, 0
        else:
            p = n / n.sum()
            h = float(-(p * np.log2(p)).sum())
            nl = len(n)
        rows.append({"source": src, "n_docs": n_docs,
                     "n_langs": nl,
                     "h_lang": float(duckdb_round(h, 6))})
    out = pd.DataFrame(rows)
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_langs"] = out["n_langs"].astype("int64")
    out["h_lang"] = out["h_lang"].astype("float64")
    return out


def band_occupancy_documents(sf_dir: str):
    """LSH BAND-OCCUPANCY histogram (ORACLED): per minhash band, how
    many buckets hold exactly 1, 2, … documents — the LSH health
    check a dedup operator reads before trusting candidate recall
    (a healthy corpus is almost all size-1 buckets; a fat bucket
    means a stop-shingle or hash collapse and quadratic pair blowup
    — exactly what the production path's hot-bucket cap defends
    against; this query shows WHERE that cap would bite). Rides the
    md5lsh machinery end to end: the SAME signature partials, doc
    merge and band hashing as minhash_md5_pairs (16 permutations, 4
    bands, order-insensitive weighted wrap-sum band hash), then one
    (band, bh) count and one tiny (band, size) histogram — all exact
    integers; nothing larger than 4 rows per doc ever shuffles.
    Null doc_id rows are invisible (the _band_rows drop, pinned in
    SQL with the explicit filter); docs with fewer than 3 tokens
    have no shingle and are absent; an empty shingleable corpus
    answers a typed empty frame."""
    from ..dedup.md5lsh import _band_rows, _merged_sigs, _sig_partials
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    partials = ds.map_batches(
        lambda b: _sig_partials(b, "doc_id", "text"),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072)
    bands = partitioned_group_apply(
        partials, ["doc_id"],
        lambda t: _band_rows(_merged_sigs(t, "doc_id"), "doc_id"),
        batch_format="pyarrow")
    occ = grouped_agg_hash(bands, ["band", "bh"], {},
                           count_alias="sz")
    hist = grouped_agg(occ.select_columns(["band", "sz"]),
                       ["band", "sz"], {},
                       count_alias="n_buckets").to_pandas()
    out_empty = pd.DataFrame({
        "band": pd.Series([], dtype="int64"),
        "bucket_size": pd.Series([], dtype="int64"),
        "n_buckets": pd.Series([], dtype="int64")})
    if hist.empty or "band" not in hist.columns:
        return out_empty
    out = hist.rename(columns={"sz": "bucket_size"}) \
        .sort_values(["band", "bucket_size"]).reset_index(drop=True)
    for c in ("band", "bucket_size", "n_buckets"):
        out[c] = out[c].astype("int64")
    return out[["band", "bucket_size", "n_buckets"]]


def top_paths_events(sf_dir: str, k: int = 10):
    """Top event PATHS (ORACLED): the k=10 most common 3-step
    within-user event-type sequences — the "most common user journey"
    readout product analytics actually ships (transitions is the
    1-step matrix, next_action its argmax; journeys need the trigram
    — A→B→C and B→A→C tell different stories with identical
    transition counts). The timeline contract is the transitions
    family's: NULL-type events are removed BEFORE pairing (A, NULL,
    B, C yields the A→B→C path), order is (ts, event_id) per user.
    Plan: ONE user-hash partition pass lexsorts its users' timelines
    and emits vocabulary³-bounded (t1, t2, t3) partial counts via a
    double-shift mask (the transitions kernel, one step deeper), a
    tiny grouped sum, and a driver top-k under (n desc, path asc) —
    ties rank lexicographically on both engines (pinned). Users with
    fewer than 3 surviving events contribute nothing; no path
    anywhere → typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])

    def prune(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.and_(b.column("user_id").is_valid(),
                    b.column("ts").is_valid()),
            pc.and_(b.column("event_type").is_valid(),
                    b.column("event_id").is_valid())))

    _p_schema = pa.schema([("t1", pa.string()), ("t2", pa.string()),
                           ("t3", pa.string()), ("_n", pa.int64())])

    def paths(t: pa.Table) -> pa.Table:
        if t.num_rows < 3:
            return _p_schema.empty_table()
        df = t.to_pandas()
        u = df["user_id"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        ts = df["ts"].astype("int64").to_numpy()
        eid = df["event_id"].to_numpy().astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same2 = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        if not same2.any():
            return _p_schema.empty_table()
        agg = pd.DataFrame({
            "t1": et[:-2][same2], "t2": et[1:-1][same2],
            "t3": et[2:][same2]}) \
            .groupby(["t1", "t2", "t3"]).size() \
            .reset_index(name="_n")
        return pa.Table.from_pandas(agg, schema=_p_schema,
                                    preserve_index=False)

    partials = partitioned_group_apply(
        ds.map_batches(prune, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["user_id"], paths, batch_format="pyarrow")
    out = grouped_agg(partials, ["t1", "t2", "t3"], {"_n": "n"},
                      count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "step1": pd.Series([], dtype="object"),
        "step2": pd.Series([], dtype="object"),
        "step3": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64")})
    if out.empty or "t1" not in out.columns:
        return out_empty
    out = out.sort_values(["n", "t1", "t2", "t3"],
                          ascending=[False, True, True, True]) \
        .head(k).reset_index(drop=True)
    return pd.DataFrame({
        "step1": out["t1"].astype(object),
        "step2": out["t2"].astype(object),
        "step3": out["t3"].astype(object),
        "n": out["n"].astype("int64")})


def spend_quantiles_by_segment(sf_dir: str):
    """Distributed DISC-QUANTILES of customer spend per market segment
    (ORACLED): per mktsegment, the customer count and exact p50/p90
    of per-customer spend cents — the segment price-point profile
    (gains_by_segment reads concentration; a pricing review wants
    the order statistics: 'what does the MEDIAN BUILDING customer
    spend, and where is its whale threshold?'). Third consumer of
    _grouped_disc_quantiles, on a third attach pattern: per-customer
    cents sum first (grouped_agg_hash, the gini convention), then
    the segment from ONE broadcast customer dict (inner-join
    semantics — orders of unknown or null-segment customers are
    invisible, pinned), uniquifier the custkey itself (per-customer
    rows are unique by construction). Exact int64 cents end to end.
    Null custkey/price rows invisible; an empty attachable stream
    answers a typed empty frame."""
    import ray
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust = cust[cust["c_mktsegment"].notna()]
    ref = ray.put(dict(zip(cust["c_custkey"],
                           cust["c_mktsegment"])))
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_totalprice"])

    def clean(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("o_custkey").is_valid(),
                             b.column("o_totalprice").is_valid()))
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c": t.column("o_custkey"),
            "cents": pa.array(np.rint(v * 100.0).astype(np.int64))})

    spends = grouped_agg_hash(
        ds.map_batches(clean, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["c"], {"cents": "spend"}, count_alias="_n")

    def attach(b: pa.Table) -> pa.Table:
        t = _broadcast_lookup_batch(b, ref=ref, key="c", out="g")
        t = t.filter(t.column("g").is_valid())
        return pa.table({
            "g": pc.cast(t.column("g"), pa.string()),
            "v": t.column("spend"),
            "uid": t.column("c")})

    stream = spends.map_batches(attach, batch_format="pyarrow",
                                zero_copy_batch=True,
                                batch_size=131072).materialize()
    out_empty = pd.DataFrame({
        "c_mktsegment": pd.Series([], dtype="object"),
        "n_cust": pd.Series([], dtype="int64"),
        "p50_cents": pd.Series([], dtype="int64"),
        "p90_cents": pd.Series([], dtype="int64")})
    piv = _grouped_disc_quantiles(stream)
    if piv is None:
        return out_empty
    return pd.DataFrame({
        "c_mktsegment": piv["g"].astype(object),
        "n_cust": piv["n"].astype("int64"),
        "p50_cents": piv["p50"].astype("int64"),
        "p90_cents": piv["p90"].astype("int64")}) \
        .sort_values("c_mktsegment").reset_index(drop=True)


def active_hours_by_type(sf_dir: str):
    """ACTIVE-HOURS profile per event type (ORACLED): per type, how
    many of the 24 clock hours have EVER seen an event, how many
    never have, and the peak hour with its count — the service-hours
    detector (a human-driven type goes quiet overnight; a cron or
    bot fires in all 24 — n_quiet_hours 0 with a flat peak is the
    bot signature; events_hourly ships the full series, this ships
    the decision). Exact integers via one (type, hour) grouped count
    (per-batch combine, ≤ 24·|types| rows shuffle) and a tiny driver
    fold; the peak tiebreak is pinned (equal counts → earliest
    hour, both engines). Null type/ts rows invisible; an empty
    cleaned corpus answers a typed empty frame."""
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("event_type").is_valid(),
                             b.column("ts").is_valid()))
        return pa.table({
            "event_type": t.column("event_type"),
            "h": pc.hour(t.column("ts"))})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["event_type", "h"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "event_type": pd.Series([], dtype="object"),
        "n_active_hours": pd.Series([], dtype="int64"),
        "n_quiet_hours": pd.Series([], dtype="int64"),
        "peak_hour": pd.Series([], dtype="int64"),
        "peak_n": pd.Series([], dtype="int64")})
    if agg.empty or "event_type" not in agg.columns:
        return out_empty
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        g = g.sort_values(["n", "h"], ascending=[False, True])
        nh = len(g)
        rows.append({"event_type": t, "n_active_hours": nh,
                     "n_quiet_hours": 24 - nh,
                     "peak_hour": int(g["h"].iloc[0]),
                     "peak_n": int(g["n"].iloc[0])})
    out = pd.DataFrame(rows)
    for c in ("n_active_hours", "n_quiet_hours", "peak_hour",
              "peak_n"):
        out[c] = out[c].astype("int64")
    return out


def embedding_lsh_buckets_md5(sf_dir: str):
    """Hyperplane-LSH bucket occupancy, value-level ORACLED: per
    (hash table, bucket), how many corpus vectors land there under 2
    tables x 8 md5-derived hyperplanes — the embedding family's first
    VALUE-exact oracle (its production near-dup path,
    dedup/embedding.py _hyperplane_bucket, buckets by rng-seeded float
    planes no SQL can reproduce; this is the md5 technique that gave
    minhash its value oracles, dedup/md5lsh.py, transplanted to the
    hyperplane axis). The whole computation is EXACT INTEGERS end to
    end: components quantize q_j = floor(x_j * 1e6) (float32 -> double
    widening, one double multiply, floor — bit-identical on both
    engines), coefficients are md5_low64-derived small ints, so the
    sign of each dot can never be flipped by float summation order —
    the precise hazard that makes the production rng buckets
    un-oracleable. Reference parity: the keyword-as-predicate
    discipline of pkg/jsonschema keyword evaluation (each plane is a
    compiled predicate over the batch). Plan: per batch ONE int64
    matmul (per distinct length group) against the worker-cached
    (16 x dim) coefficient matrix, bits pack to a bucket id, per-batch
    (tbl, bucket) partial counts — at most 2*256 = 512 keys EVER
    shuffle (vocabulary-bounded, corpus-size-independent), tiny
    grouped sum, driver sorts <= 512 rows. Pins: null vec_id / null
    embedding / EMPTY embedding rows invisible (the SQL no-component
    convention); a zero vector answers bucket 0 in both tables (dot 0
    is NOT > 0 — the tie bit is 0); identical vectors share buckets in
    every table; a short vector sums its own components only;
    DUPLICATE vec_ids merge ADDITIVELY into one vector before
    bucketing (the SQL GROUP-BY-vid convention and the md5 family's
    merge-before-signature discipline) so a vid counts ONCE per
    table; all-invalid -> typed empty frame."""
    from ..dedup.md5lsh import lsh_bucket_dataset
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    rows = lsh_bucket_dataset(ds)   # one row per merged vid per table

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tbl": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "n_p": pa.array([], pa.int64())})
        agg = b.select(["tbl", "bucket"]) \
            .group_by(["tbl", "bucket"]).aggregate([([], "count_all")])
        return agg.rename_columns(["tbl", "bucket", "n_p"])

    agg = grouped_agg(
        rows.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True, batch_size=131072),
        ["tbl", "bucket"], {"n_p": "n_vecs"},
        count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "tbl": pd.Series([], dtype="int64"),
        "bucket": pd.Series([], dtype="int64"),
        "n_vecs": pd.Series([], dtype="int64")})
    if agg.empty or "tbl" not in agg.columns:
        return out_empty
    out = agg[["tbl", "bucket", "n_vecs"]] \
        .sort_values(["tbl", "bucket"]).reset_index(drop=True)
    return out.astype({"tbl": "int64", "bucket": "int64",
                       "n_vecs": "int64"})


def embedding_lsh_pairs_md5(sf_dir: str):
    """Hyperplane-LSH candidate pairs, value-level ORACLED: DISTINCT
    (id_a, id_b), id_a < id_b, sharing at least one (table, bucket)
    under the 2x8 md5 hyperplanes — the SECOND consumer of the shared
    lsh_bucket_rows kernel (embedding_lsh_buckets_md5 reads the
    occupancy, this reads the candidate GENERATION the production
    rng-plane path performs rows-only; together they pin the whole
    bucket -> candidate stage of embedding near-dup value-exactly).
    Plan: per-batch bucket rows (2 narrow rows per vector), pair
    expansion inside ONE (tbl, bucket)-hash partition via the
    vectorized segment_pairs (hot-bucket cap as the production path),
    distributed distinct-pair dedup — nothing corpus-proportional on
    the driver. Pins: duplicate vec_ids NEVER self-pair (the a < b
    strictness survives id duplication); null/empty rows invisible;
    disjoint-bucket corpus -> empty pairs with pinned schema."""
    from ..dedup.md5lsh import embedding_lsh_pairs_md5 as _pairs
    return _pairs(_read(sf_dir, "embeddings",
                        columns=["vec_id", "embedding"]))


def embedding_lsh_pair_cosine_md5(sf_dir: str):
    """Candidate-pair quantized cosine (ORACLED): every md5
    hyperplane-LSH candidate pair with cos_q = exact-int dot /
    (sqrt(nrm_a) * sqrt(nrm_b)) over the merged quantized vectors —
    the VERIFY stage of embedding near-dup pinned value-exactly
    (buckets_md5 = assignment, pairs_md5 = generation, this = the
    score a threshold would gate on; the three together oracle the
    full candidate->verify pipeline the production rng path runs
    rows-only). Only single deterministic float ops touch the value
    (cast/sqrt/multiply/divide — the summation stays integer), so
    both engines agree to the bit before the 6dp round. Zero-norm
    sides answer SQL-NULL; ragged pairs dot the overlapping prefix;
    duplicate ids merge additively first. Scale: two size-chosen
    equi_joins attach merged vectors to the aggregate-sized pair
    table; nothing corpus-proportional gathers."""
    from ..dedup.md5lsh import embedding_lsh_pair_cosine_md5 as _pc
    return _pc(_read(sf_dir, "embeddings",
                     columns=["vec_id", "embedding"]))


def psi_daily_drift_events(sf_dir: str, bin_width: float = 25.0,
                           eps: float = 1e-6):
    """Day-over-day PSI drift TIMELINE (ORACLED): for every pair of
    consecutive OBSERVED days, the per-bin Population Stability Index
    terms between yesterday's and today's value distributions over
    fixed floor(value/25) bins — the drift monitor as a time series
    (psi_events answers ONE A/B split; a production validation
    pipeline watches drift day over day and alarms on the first day
    whose Σterm jumps; north rule: 'distribution drift uses KS and PSI
    tests'). Per-BIN terms ship instead of per-day totals so the float
    comparison never depends on summation order (the psi_events
    discipline); the consumer sums a day's rows for the alarm. Exactly
    the psi_exact arithmetic: count/total double divisions, eps-clamp
    1e-6, one libm log, 6dp — bit-identical to the SQL conditional
    form. One (day, bin) grouped count distributes the scan
    (calendar × bins bounded); the driver folds consecutive observed
    days — lag over OBSERVED days, so a calendar gap pairs across it
    (pinned). Null ts / null / NaN / ±inf values are invisible; a
    corpus with fewer than two observed days answers the typed empty
    frame; a bin absent on one side clamps to eps (the
    large-but-finite standard smoothing, pinned)."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("value").is_valid()))
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        ok = np.isfinite(v)
        t = t.filter(pa.array(ok))
        v = v[ok]
        q = np.floor(v / bin_width)
        if (np.abs(q) >= 2.0 ** 62).any():
            raise ValueError(
                "psi_daily_drift_events: value / bin_width exceeds "
                "the int64 bin range — choose a wider bin_width")
        return pa.table({
            "day": pc.strftime(t.column("ts"), "%Y-%m-%d"),
            "bin": pa.array(q.astype(np.int64))})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["day", "bin"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "bin": pd.Series([], dtype="int64"),
        "n_prev": pd.Series([], dtype="int64"),
        "n_cur": pd.Series([], dtype="int64"),
        "psi_term": pd.Series([], dtype="float64")})
    if agg.empty or "day" not in agg.columns:
        return out_empty
    days = sorted(agg["day"].unique())
    if len(days) < 2:
        return out_empty
    tot = agg.groupby("day")["n"].sum().astype("float64")
    by_day = {d: dict(zip(g["bin"].astype(np.int64), g["n"]))
              for d, g in agg.groupby("day")}
    rows = []
    for prev, day in zip(days, days[1:]):
        cp_d, cc_d = by_day[prev], by_day[day]
        bins = sorted(set(cp_d) | set(cc_d))
        tp, tc = float(tot[prev]), float(tot[day])
        for b in bins:
            np_, nc = int(cp_d.get(b, 0)), int(cc_d.get(b, 0))
            rp = max(np_ / tp, eps)
            rc = max(nc / tc, eps)
            rows.append({
                "day": day, "bin": int(b), "n_prev": np_, "n_cur": nc,
                "psi_term": float(np.round((rp - rc) * np.log(rp / rc),
                                           6))})
    out = pd.DataFrame(rows).sort_values(["day", "bin"]) \
        .reset_index(drop=True)
    out["bin"] = out["bin"].astype("int64")
    out["n_prev"] = out["n_prev"].astype("int64")
    out["n_cur"] = out["n_cur"].astype("int64")
    out["psi_term"] = out["psi_term"].astype("float64")
    return out


def violation_profile_tables(sf_dir: str):
    """Cross-table constraint-violation PROFILE (ORACLED): per (table,
    keyword, keyword_location), how many rows violate — the data-quality
    dashboard readout over the whole warehouse ('which constraints fire,
    where, how often'), the reporting face of the validation engine the
    north star centers on (the validate_* queries ship the violation
    ROWS; an operator triages from this profile first). Reference
    parity: the per-keyword verdict accounting of pkg/jsonschema's
    output units, aggregated. Runs the SAME four streaming
    validate_dataset pipelines as validate_lineitem / validate_orders /
    validate_documents / validate_events_conditional (vectorized
    rule-compiled predicates, violations-only leave the scan), then ONE
    tiny grouped count per table — the shuffle is bounded by the RULE
    SET size (keywords x locations), never by corpus or violation
    volume; the driver concatenates four aggregate-sized frames. The
    SQL oracle is COMPOSED from the four validate_* oracle strings
    (same dict entries, wrapped in a count — the two reports cannot
    drift). An all-clean corpus answers the typed empty frame; a table
    whose parquet file is absent is skipped (profile over what
    exists)."""
    import os as _os
    parts = []
    for tbl, fn in (("lineitem", validate_lineitem),
                    ("orders", validate_orders),
                    ("documents", validate_documents),
                    ("events", validate_events_conditional)):
        if not _os.path.exists(f"{sf_dir}/{tbl}.parquet"):
            continue
        v = fn(sf_dir)
        agg = grouped_agg(
            v.map_batches(
                lambda b: b.select(["keyword", "keyword_location"]),
                batch_format="pyarrow", zero_copy_batch=True),
            ["keyword", "keyword_location"], {},
            count_alias="n_violations").to_pandas()
        if agg.empty or "keyword" not in agg.columns:
            continue
        agg.insert(0, "tbl", tbl)
        parts.append(agg[["tbl", "keyword", "keyword_location",
                          "n_violations"]])
    out_empty = pd.DataFrame({
        "tbl": pd.Series([], dtype="object"),
        "keyword": pd.Series([], dtype="object"),
        "keyword_location": pd.Series([], dtype="object"),
        "n_violations": pd.Series([], dtype="int64")})
    if not parts:
        return out_empty
    out = pd.concat(parts, ignore_index=True) \
        .sort_values(["tbl", "keyword", "keyword_location"]) \
        .reset_index(drop=True)
    out["n_violations"] = out["n_violations"].astype("int64")
    return out


def late_events_by_day(sf_dir: str):
    """Out-of-order arrival accounting (ORACLED): per event-time day —
    total events, how many arrived LATE (event-time strictly below the
    running event-time maximum of the user's earlier arrivals, arrival
    order = event_id asc, the repo's arrival proxy), and the late
    share — the watermark-health readout a streaming validation
    pipeline alarms on (rising late share means the ingest is
    reordering and every window/sessionization result downstream is
    suspect; north-star stage: per-partition verdict accounting).
    Plan: ONE user-hash partition pass (the sessionization machinery)
    lexsorts each user's timeline by (event_id), computes the
    exclusive running max via np.maximum.accumulate over int64 µs, and
    emits per-day partials — only (day, n, n_late) rows bounded by
    calendar x partitions ever leave; a tiny grouped sum and a
    driver-side share finish. Pins: a user's FIRST arrival is never
    late; an arrival EQUAL to the running max is not late (strict <);
    lateness is per-user (an interleaved slow user doesn't poison a
    fast one); NULL user_id is one real partition (the median_gap
    convention); null ts / null event_id rows invisible (no arrival
    position); all-invalid -> typed empty frame. late_share = two
    exact ints, ONE divide in SQL operand order, 6dp."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("event_id").is_valid()))
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "tsv": pc.cast(t.column("ts"), pa.int64()),
            "day": pc.strftime(t.column("ts"), "%Y-%m-%d")})

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64()),
                          "n_late": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        tsv = t.column("tsv").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        day = t.column("day").to_numpy(zero_copy_only=False)
        # nulls sort as one group (the NULL-user partition); ts breaks
        # event_id ties so duplicate arrival positions are
        # order-invariant on both engines (ORDER BY event_id, ts)
        ukey = np.where(pd.isna(u), np.float64(np.inf),
                        u.astype(np.float64))
        order = np.lexsort((tsv, eid, ukey))
        ukey_s, tsv_s = ukey[order], tsv[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = ukey_s[1:] != ukey_s[:-1]
        # PER-USER exclusive running max (accumulate must reset at the
        # user boundary — a global cummax would leak the previous
        # user's clock into this one): C-impl groupby cummax, shifted
        # one arrival back; the first arrival has no predecessor
        ginv = np.cumsum(first) - 1
        cmax = pd.Series(tsv_s).groupby(ginv).cummax().to_numpy()
        prev = np.empty_like(cmax)
        prev[1:] = cmax[:-1]
        prev[0] = np.iinfo(np.int64).min
        late = (tsv_s < prev) & ~first
        tb = pa.table({"day": pa.array(day[order]),
                       "late": pa.array(late.astype(np.int64))})
        agg = tb.group_by(["day"]).aggregate(
            [("late", "sum"), ([], "count_all")])
        return agg.rename_columns(["day", "n_late", "n"]) \
            .select(["day", "n", "n_late"])

    agg = grouped_agg(
        partitioned_group_apply(ds.map_batches(
            prep, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=131072), ["user_id"], kernel,
            batch_format="pyarrow"),
        ["day"], {"n": "n", "n_late": "n_late"},
        count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
        "n_late": pd.Series([], dtype="int64"),
        "late_share": pd.Series([], dtype="float64")})
    if agg.empty or "day" not in agg.columns:
        return out_empty
    out = agg[["day", "n", "n_late"]].sort_values("day") \
        .reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    out["n_late"] = out["n_late"].astype("int64")
    out["late_share"] = [
        float(duckdb_round(float(l) / float(n), 6))
        for l, n in zip(out["n_late"], out["n"])]
    out["late_share"] = out["late_share"].astype("float64")
    return out


def _f64_sortkey(v: np.ndarray) -> np.ndarray:
    """Order-preserving int64 key for finite float64: flip all bits of
    negatives, set the sign bit of non-negatives — int64 key order ==
    IEEE numeric order, bit-exactly invertible (so the disc-quantile
    machinery's int64 contract extends to float metrics with ZERO
    value loss)."""
    TOP = np.uint64(1) << np.uint64(63)
    b = v.view(np.uint64)
    neg = (b >> np.uint64(63)).astype(bool)
    # SIGNED-monotone form: positives keep their bits (positive keys),
    # negatives map to ~b ^ TOP (top bit set -> negative keys) — key
    # order under signed int64 comparison == IEEE numeric order
    out = np.where(neg, ~b ^ TOP, b)
    return out.astype(np.uint64).view(np.int64)


def _f64_from_sortkey(k: np.ndarray) -> np.ndarray:
    TOP = np.uint64(1) << np.uint64(63)
    kb = k.view(np.uint64)
    neg = (kb >> np.uint64(63)).astype(bool)
    out = np.where(neg, ~(kb ^ TOP), kb)
    return out.astype(np.uint64).view(np.float64)


def value_quantiles_by_day(sf_dir: str):
    """Daily EXACT value quantiles (ORACLED): per event-time day, the
    finite-value count and the exact p50/p90 of `value` (DuckDB
    quantile_disc — an order statistic, so the answer is always a
    value the corpus actually contains) — the percentile drift
    timeline beside psi_daily_drift_events' bin terms (PSI says THAT
    the distribution moved; the quantile track says WHERE the median
    and tail sit each day). Fourth consumer of
    _grouped_disc_quantiles, extending its int64 contract to FLOAT
    metrics with zero value loss via an order-preserving IEEE
    float64<->int64 sort key (flip-negatives/set-sign encoding:
    int64 key order == numeric order, bit-exactly invertible) —
    nothing row-level reaches the driver beyond 2 rows per day.
    Null-ts / null / NaN / ±inf values are invisible (the psi
    convention); equal values make the uniquifier irrelevant to the
    answer; a one-event day answers p50 == p90 == the value;
    all-invalid -> typed empty frame."""
    ds = _read(sf_dir, "events",
               columns=["event_id", "ts", "value"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("value").is_valid()))
        v = t.column("value").to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        ok = np.isfinite(v)
        t = t.filter(pa.array(ok))
        v = v[ok]
        eid = t.column("event_id")
        uid = pc.fill_null(pc.cast(eid, pa.int64()), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "g": pc.strftime(t.column("ts"), "%Y-%m-%d"),
            "v": pa.array(_f64_sortkey(v)),
            "uid": pa.array(uid)})

    stream = ds.map_batches(prep, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=131072).materialize()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "n": pd.Series([], dtype="int64"),
        "p50": pd.Series([], dtype="float64"),
        "p90": pd.Series([], dtype="float64")})
    piv = _grouped_disc_quantiles(stream)
    if piv is None:
        return out_empty
    out = pd.DataFrame({
        "day": piv["g"].astype(object),
        "n": piv["n"].astype("int64"),
        "p50": _f64_from_sortkey(piv["p50"].to_numpy()
                                 .astype(np.int64)),
        "p90": _f64_from_sortkey(piv["p90"].to_numpy()
                                 .astype(np.int64))}) \
        .sort_values("day").reset_index(drop=True)
    out["p50"] = out["p50"].astype("float64")
    out["p90"] = out["p90"].astype("float64")
    return out


_SESSION_THRESHOLDS_MIN = (5, 15, 30, 60, 120)


def session_sensitivity_events(sf_dir: str):
    """Sessionization threshold SENSITIVITY (ORACLED): for each
    inactivity threshold in {5, 15, 30, 60, 120} minutes, the active
    user count and the TOTAL session count the corpus would split
    into — the tuning curve an operator reads before fixing the
    events_sessions 30-min constant (a knee in this curve IS the
    natural session boundary; too-flat means the threshold doesn't
    matter, cliff means bursty traffic). The per-user gap stream is
    computed ONCE (one user-hash partition, the events_sessions
    machinery: order (ts, event_id), break on gap STRICTLY > T), then
    every threshold is evaluated vectorized against the same gaps —
    5 thresholds cost one extra comparison each, not 5 passes. Only
    (threshold, n_users, extra_breaks) partials leave each partition
    (|thresholds| rows); a tiny grouped sum finishes. Null-ts and
    null-user rows are DROPPED before anything counts (a user with
    only null-ts rows is not active — pinned; the strict-> boundary
    at exactly T is pinned too). Empty corpus -> typed empty frame."""
    from ..util import partitioned_group_apply
    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["ts"].notna() & df["user_id"].notna()]
        if not len(df):
            return pd.DataFrame({
                "t": pd.Series([], dtype="int64"),
                "nu": pd.Series([], dtype="int64"),
                "extra": pd.Series([], dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"])
        us = df["ts"].astype("int64").to_numpy()
        uid = df["user_id"].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gaps = np.zeros(len(df), dtype=np.int64)
        gaps[1:] = us[1:] - us[:-1]
        valid = ~new_user                # within-user gaps only
        nu = int(new_user.sum())
        rows = []
        for t in _SESSION_THRESHOLDS_MIN:
            extra = int(((gaps > t * 60_000_000) & valid).sum())
            rows.append({"t": t, "nu": nu, "extra": extra})
        return pd.DataFrame(rows)

    agg = grouped_agg(
        partitioned_group_apply(ds, ["user_id"], kernel),
        ["t"], {"nu": "n_users", "extra": "extra"},
        count_alias="_c").to_pandas()
    out_empty = pd.DataFrame({
        "threshold_min": pd.Series([], dtype="int64"),
        "n_users": pd.Series([], dtype="int64"),
        "n_sessions": pd.Series([], dtype="int64")})
    if agg.empty or "t" not in agg.columns:
        return out_empty
    out = pd.DataFrame({
        "threshold_min": agg["t"].astype("int64"),
        "n_users": agg["n_users"].astype("int64"),
        "n_sessions": (agg["n_users"] + agg["extra"]).astype("int64")}) \
        .sort_values("threshold_min").reset_index(drop=True)
    return out


def referential_profile_tables(sf_dir: str):
    """Warehouse REFERENTIAL-integrity profile (ORACLED): for every
    declared FK edge — lineitem.l_orderkey -> orders, orders.o_custkey
    -> customer, customer.c_nationkey -> nation, supplier.s_nationkey
    -> nation, nation.n_regionkey -> region — the child row count and
    the ORPHAN count (child keys with no parent; null FK values are
    NOT orphans, the SQL anti-join convention) — the FK-health
    dashboard beside violation_profile_tables (north rule:
    'referential checks use a broadcast hash semi-join against a
    reference key table' — this profiles that check across the star
    schema). Each edge runs the same broadcast ANTI semi-join as
    referential_lineitem_orders (parent keys ray.put once, child
    streams) plus one metadata-cheap count; only 5 profile rows reach
    the driver. A missing table file skips its edges."""
    import os as _os

    from ..checks import broadcast_semi_join
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    rows = []
    for child, fk, parent, pk in edges:
        cp = f"{sf_dir}/{child}.parquet"
        pp = f"{sf_dir}/{parent}.parquet"
        if not (_os.path.exists(cp) and _os.path.exists(pp)):
            continue
        ch = _read(sf_dir, child, columns=[fk])
        pr = _read(sf_dir, parent, columns=[pk])
        n_child = ch.count()
        orphans = broadcast_semi_join(ch, fk, pr, ref_key=pk,
                                      anti=True)
        # a null FK is not an orphan (SQL anti-join semantics) —
        # broadcast_semi_join(anti=True) keeps null keys, drop them
        n_orphans = orphans.map_batches(
            lambda b, k=fk: b.filter(b.column(k).is_valid()),
            batch_format="pyarrow", zero_copy_batch=True).count()
        rows.append({"child_table": child, "fk": fk,
                     "parent_table": parent,
                     "n_child_rows": int(n_child),
                     "n_orphans": int(n_orphans)})
    out_empty = pd.DataFrame({
        "child_table": pd.Series([], dtype="object"),
        "fk": pd.Series([], dtype="object"),
        "parent_table": pd.Series([], dtype="object"),
        "n_child_rows": pd.Series([], dtype="int64"),
        "n_orphans": pd.Series([], dtype="int64")})
    if not rows:
        return out_empty
    out = pd.DataFrame(rows).sort_values(["child_table", "fk"]) \
        .reset_index(drop=True)
    out["n_child_rows"] = out["n_child_rows"].astype("int64")
    out["n_orphans"] = out["n_orphans"].astype("int64")
    return out


def uniqueness_profile_tables(sf_dir: str):
    """Warehouse KEY-uniqueness profile (ORACLED): for every declared
    key — lineitem (l_orderkey, l_linenumber), orders o_orderkey,
    customer c_custkey, part p_partkey, supplier s_suppkey, events
    event_id, documents doc_id, embeddings vec_id — the row count,
    distinct-key count and how many rows sit in duplicated keys — the
    PK-health dashboard completing the check-family profile trio
    (violations / referential / uniqueness). Per table ONE coarse
    key-hash partition pass (the duplicate_keys machinery) emits only
    (n_keys_dup, n_rows_dup) partials; rows/distinct come from the
    same grouped count. NULL key components form ONE real key group
    (the duplicate_keys convention — two all-null keys are
    duplicates, SQL GROUP BY semantics, pinned). Missing tables
    skipped."""
    import os as _os
    keysets = [
        ("lineitem", ["l_orderkey", "l_linenumber"]),
        ("orders", ["o_orderkey"]),
        ("customer", ["c_custkey"]),
        ("part", ["p_partkey"]),
        ("supplier", ["s_suppkey"]),
        ("events", ["event_id"]),
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
    ]
    rows = []
    for tbl, keys in keysets:
        p = f"{sf_dir}/{tbl}.parquet"
        if not _os.path.exists(p):
            continue
        ds = _read(sf_dir, tbl, columns=keys)
        n_rows = ds.count()
        cnt = grouped_agg_hash(ds, keys, {}, count_alias="nk") \
            .to_pandas()
        if cnt.empty or "nk" not in cnt.columns:
            n_distinct, n_dup_rows = 0, 0
        else:
            nk = cnt["nk"].astype("int64")
            n_distinct = int(len(nk))
            n_dup_rows = int(nk[nk > 1].sum())
        rows.append({"tbl": tbl, "key": ",".join(keys),
                     "n_rows": int(n_rows),
                     "n_distinct_keys": n_distinct,
                     "n_rows_in_dup_keys": n_dup_rows})
    out_empty = pd.DataFrame({
        "tbl": pd.Series([], dtype="object"),
        "key": pd.Series([], dtype="object"),
        "n_rows": pd.Series([], dtype="int64"),
        "n_distinct_keys": pd.Series([], dtype="int64"),
        "n_rows_in_dup_keys": pd.Series([], dtype="int64")})
    if not rows:
        return out_empty
    out = pd.DataFrame(rows).sort_values("tbl").reset_index(drop=True)
    for c in ("n_rows", "n_distinct_keys", "n_rows_in_dup_keys"):
        out[c] = out[c].astype("int64")
    return out


def type_mix_drift_daily(sf_dir: str):
    """Day-over-day CATEGORICAL drift (ORACLED): for every consecutive
    pair of observed days, the per-event-type total-variation terms
    |p_prev - p_cur| between yesterday's and today's event-type MIX —
    the categorical companion completing the drift trio
    (psi_daily_drift_events reads the numeric bins,
    value_quantiles_by_day the percentiles, this the type mix: a new
    bot type or a dying feature shows here first). Per-TYPE terms ship
    (the psi discipline — the consumer halves the sum for TV distance;
    no summation-order hazard crosses engines); each term is two
    count/total double divisions and one subtraction+abs, 6dp. One
    vocabulary x calendar-bounded (day, type) grouped count; the
    driver folds consecutive OBSERVED days (gaps pair across, the
    psi_daily convention). Null-ts / null-type rows invisible; a type
    absent on one side contributes its full share as the term
    (p = 0.0 exactly — no eps, TV needs none); fewer than two
    observed days -> typed empty frame."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.and_(b.column("ts").is_valid(),
                             b.column("event_type").is_valid()))
        return pa.table({
            "day": pc.strftime(t.column("ts"), "%Y-%m-%d"),
            "event_type": t.column("event_type")})

    agg = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow",
                       zero_copy_batch=True, batch_size=131072),
        ["day", "event_type"], {}, count_alias="n").to_pandas()
    out_empty = pd.DataFrame({
        "day": pd.Series([], dtype="object"),
        "event_type": pd.Series([], dtype="object"),
        "n_prev": pd.Series([], dtype="int64"),
        "n_cur": pd.Series([], dtype="int64"),
        "tv_term": pd.Series([], dtype="float64")})
    if agg.empty or "day" not in agg.columns:
        return out_empty
    days = sorted(agg["day"].unique())
    if len(days) < 2:
        return out_empty
    tot = agg.groupby("day")["n"].sum().astype("float64")
    by_day = {d: dict(zip(g["event_type"], g["n"]))
              for d, g in agg.groupby("day")}
    rows = []
    for prev, day in zip(days, days[1:]):
        cp_d, cc_d = by_day[prev], by_day[day]
        tp, tc = float(tot[prev]), float(tot[day])
        for ty in sorted(set(cp_d) | set(cc_d)):
            np_, nc = int(cp_d.get(ty, 0)), int(cc_d.get(ty, 0))
            rows.append({
                "day": day, "event_type": ty, "n_prev": np_,
                "n_cur": nc,
                "tv_term": float(np.round(
                    abs(np_ / tp - nc / tc), 6))})
    out = pd.DataFrame(rows).sort_values(["day", "event_type"]) \
        .reset_index(drop=True)
    out["n_prev"] = out["n_prev"].astype("int64")
    out["n_cur"] = out["n_cur"].astype("int64")
    out["tv_term"] = out["tv_term"].astype("float64")
    return out


_PROFILE_COLUMNS = {
    "region": ["r_regionkey", "r_name"],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    "part": ["p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"],
    "orders": ["o_orderkey", "o_custkey", "o_orderstatus",
               "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey",
                 "l_linenumber", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_returnflag",
                 "l_linestatus", "l_shipdate"],
    "events": ["event_id", "ts", "user_id", "event_type", "value",
               "props"],
    "documents": ["doc_id", "text", "lang", "source", "n_chars"],
    "embeddings": ["vec_id", "embedding", "label"],
}


def completeness_profile_tables(sf_dir: str):
    """Warehouse COMPLETENESS profile (ORACLED): per (table, column)
    — across every declared column of all 10 tables — the row count,
    null count and null rate (6dp) — the fourth data-quality
    dimension, completing the classic DQ quartet this repo now
    profiles warehouse-wide (validity = violation_profile_tables,
    uniqueness = uniqueness_profile_tables, referential integrity =
    referential_profile_tables, completeness = this; north rule:
    'per-column statistics (null-rate, ...)' as a first-class check).
    Per table ONE streaming pass whose batches emit |columns| partial
    rows each via Arrow's O(1) per-chunk null_count (no value is ever
    touched — validity bitmaps only, zero-copy); a grouped sum over
    |columns| keys and a driver fold finish. The column lists are the
    SAME _PROFILE_COLUMNS declaration the SQL oracle is generated
    from (declaration and oracle cannot drift). Complex columns count
    like any other (a null map/list row is null; an EMPTY list is NOT
    null — pinned). Missing tables skip their rows; empty tables
    answer n_rows 0 with null_rate 0.0 (the count=0 convention of
    stages/stats)."""
    import os as _os
    rows = []
    for tbl, cols in _PROFILE_COLUMNS.items():
        p = f"{sf_dir}/{tbl}.parquet"
        if not _os.path.exists(p):
            continue
        ds = _read(sf_dir, tbl, columns=cols)

        def partial(b: pa.Table, cols=tuple(cols)) -> pa.Table:
            return pa.table({
                "col": pa.array(list(cols), pa.string()),
                "nn": pa.array([b.column(c).null_count for c in cols],
                               pa.int64()),
                "nr": pa.array([b.num_rows] * len(cols), pa.int64())})

        agg = grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=131072),
            ["col"], {"nn": "n_nulls", "nr": "n_rows"},
            count_alias="_c").to_pandas()
        got = {} if (agg.empty or "col" not in agg.columns) else \
            {r["col"]: (int(r["n_rows"]), int(r["n_nulls"]))
             for _, r in agg.iterrows()}
        for c in cols:
            nr, nn = got.get(c, (0, 0))
            rows.append({
                "tbl": tbl, "col": c, "n_rows": nr, "n_nulls": nn,
                "null_rate": float(duckdb_round(nn / nr, 6))
                if nr else 0.0})
    out_empty = pd.DataFrame({
        "tbl": pd.Series([], dtype="object"),
        "col": pd.Series([], dtype="object"),
        "n_rows": pd.Series([], dtype="int64"),
        "n_nulls": pd.Series([], dtype="int64"),
        "null_rate": pd.Series([], dtype="float64")})
    if not rows:
        return out_empty
    out = pd.DataFrame(rows).sort_values(["tbl", "col"]) \
        .reset_index(drop=True)
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_nulls"] = out["n_nulls"].astype("int64")
    out["null_rate"] = out["null_rate"].astype("float64")
    return out
