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


def hash64_array(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash per element. Nulls hash to a fixed sentinel (callers
    typically mask them out via validity)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        t = arr.type
        if pa.types.is_integer(t) or pa.types.is_floating(t) \
                or pa.types.is_temporal(t) or pa.types.is_boolean(t):
            np_vals = arr.to_numpy(zero_copy_only=False)
            return _hash_numeric(np_vals, seed)
        # strings / binary / everything else via pandas siphash
        ser = arr.to_pandas()
        h = pd.util.hash_pandas_object(ser, index=False).to_numpy()
        if seed:
            h = _splitmix64(h + np.uint64(seed))
        return h
    np_vals = np.asarray(arr)
    if np_vals.dtype.kind in "iufbM":
        return _hash_numeric(np_vals, seed)
    h = pd.util.hash_pandas_object(pd.Series(np_vals), index=False).to_numpy()
    if seed:
        h = _splitmix64(h + np.uint64(seed))
    return h


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
