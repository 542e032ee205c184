"""Deterministic vectorized 64-bit hashing for Arrow/numpy columns.

Used by HLL distinct-count sketches, exact/near dedup, and MinHash. Must be
deterministic ACROSS PROCESSES (Ray workers) and runs (checkpoint/resume
compares sketch states) — so no Python ``hash()``.

Numeric arrays: splitmix64 finalizer over the raw 64-bit pattern (public
domain algorithm, Steele et al., "Fast splittable pseudorandom number
generators", OOPSLA 2014). Strings/binary: pandas' vectorized siphash
(``pd.util.hash_pandas_object``, fixed default key — deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z ^= z >> np.uint64(30)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(27)
        z *= np.uint64(0x94D049BB133111EB)
        z ^= z >> np.uint64(31)
    return z


def _sip_key(seed: int) -> str:
    """16-byte siphash key for ``pd.util.hash_pandas_object``. Seed 0 keeps
    pandas' default key (back-compat with recorded hashes); any other seed
    selects a GENUINELY INDEPENDENT keyed siphash — two texts that collide
    under one key are unrelated under another, so multi-seed callers (e.g.
    128-bit exact dedup) get a true ~2^64 pairwise birthday bound instead of
    a post-mix of the same 64-bit value."""
    return "%016x" % (_splitmix64(np.uint64(seed).reshape(1))[0] or 1)


def hash64_array(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash per element. Nulls hash to a fixed sentinel (callers
    typically mask them out via validity)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        t = arr.type
        if pa.types.is_temporal(t) and not pa.types.is_timestamp(t) \
                and not pa.types.is_date(t):
            # time32/time64/duration: to_numpy yields OBJECT arrays of
            # datetime.time (which the numeric path can't hash) — take
            # the exact integer representation via Arrow instead; nulls
            # fall through to the null-bearing int branch below
            import pyarrow.compute as pc
            if pa.types.is_time32(t):
                arr = pc.cast(arr, pa.int32())
            arr = pc.cast(arr, pa.int64())
            t = arr.type
        if (pa.types.is_integer(t) or pa.types.is_boolean(t)) \
                and arr.null_count:
            # CRITICAL: to_numpy of a null-bearing int column yields
            # float64 (+NaN) — the same VALUE would then hash differently
            # depending on whether its batch happens to contain a null
            # (and ints > 2^53 would collide). Keep the integer path by
            # filling nulls, then stamp null slots with the same sentinel
            # the float-NaN path produces.
            import pyarrow.compute as pc
            fill = False if pa.types.is_boolean(t) else 0
            h = _hash_numeric(
                pc.fill_null(arr, fill).to_numpy(zero_copy_only=False),
                seed)
            nullmask = pc.is_null(arr).to_numpy(zero_copy_only=False)
            h[nullmask] = _null_sentinel(seed)
            return h
        if pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_temporal(t) or pa.types.is_boolean(t):
            np_vals = arr.to_numpy(zero_copy_only=False)
            return _hash_numeric(np_vals, seed)
        # strings / binary / everything else via pandas siphash; the seed
        # picks the siphash KEY (independent function per seed), not a
        # post-mix of the default-key hash.
        ser = arr.to_pandas()
        if seed:
            h = pd.util.hash_pandas_object(
                ser, index=False, hash_key=_sip_key(seed)).to_numpy()
        else:
            h = pd.util.hash_pandas_object(ser, index=False).to_numpy()
        return h
    np_vals = np.asarray(arr)
    if np_vals.dtype.kind in "iufbM":
        return _hash_numeric(np_vals, seed)
    if seed:
        return pd.util.hash_pandas_object(
            pd.Series(np_vals), index=False, hash_key=_sip_key(seed)).to_numpy()
    return pd.util.hash_pandas_object(pd.Series(np_vals), index=False).to_numpy()


def _null_sentinel(seed: int) -> np.uint64:
    """Hash of a null integer/boolean element. Pigeonhole makes ONE
    colliding int64 preimage unavoidable (2^64+1 values into 2^64
    buckets); double-mixing a fixed tag makes that preimage a
    pseudorandom value instead of the quiet-NaN bit pattern
    0x7FF8000000000000, which plausibly occurs in data reinterpreted
    from floats. (Float columns inherently hash null == NaN — that is
    the float path's own convention, unchanged.)"""
    with np.errstate(over="ignore"):
        tag = _splitmix64(np.array([0x6E756C6C5F6B6579],  # "null_key"
                                   dtype=np.uint64))
        return _splitmix64(tag + np.uint64(seed))[0]


def _hash_numeric(vals: np.ndarray, seed: int) -> np.ndarray:
    if vals.dtype.kind == "f":
        # canonicalize -0.0/NaN, then reinterpret bit pattern
        v = vals.astype(np.float64, copy=True)
        v[v == 0.0] = 0.0
        v[np.isnan(v)] = np.nan
        bits = v.view(np.uint64)
    elif vals.dtype.kind == "M":
        bits = vals.astype("datetime64[us]").view(np.int64).astype(np.uint64)
    elif vals.dtype.kind == "b":
        bits = vals.astype(np.uint64)
    else:
        bits = vals.astype(np.int64).view(np.uint64)
    return _splitmix64(bits + np.uint64(seed))
