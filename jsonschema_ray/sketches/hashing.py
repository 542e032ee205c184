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


_PER_SEC = {"s": 1, "ms": 10 ** 3, "us": 10 ** 6, "ns": 10 ** 9}
# fixed tags for numpy timedelta units with no exact seconds ratio
# (calendar months/years) — their raw counts hash with a unit domain tag
_CAL_UNIT_TAG = {"M": np.uint64(0x6D6F6E7468736361),
                 "Y": np.uint64(0x79656172735F7467)}


def _decompose_ticks(iv: np.ndarray, per_sec: int
                     ) -> tuple[np.ndarray, np.ndarray]:
    """int64 tick counts at ``per_sec`` ticks/second → (whole seconds,
    subsecond nanoseconds) — the UNIT-INDEPENDENT canonical form, exact
    for every representable value (converting everything to one unit
    would truncate ns→us or overflow us→ns). NaT/INT64_MIN stays
    (INT64_MIN, 0) in every unit."""
    nat = iv == np.iinfo(np.int64).min
    with np.errstate(over="ignore"):
        sec = iv // per_sec                      # floor: negative-exact
        rem = (iv - sec * per_sec) * (1_000_000_000 // per_sec)
    if nat.any():
        sec = sec.copy()
        rem = rem.copy()
        sec[nat] = np.iinfo(np.int64).min
        rem[nat] = 0
    return sec, rem


def _hash_sec_ns(sec: np.ndarray, rem_ns: np.ndarray,
                 seed: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        bits = _splitmix64(sec.astype(np.int64).view(np.uint64)
                           ^ np.uint64(0x74656D706F72616C))  # "temporal"
        bits ^= rem_ns.astype(np.int64).view(np.uint64)
        return _splitmix64(bits + np.uint64(seed))


def hash64_array(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash per element. Nulls hash to a fixed sentinel (callers
    typically mask them out via validity). Temporal values hash their
    canonical (seconds, subsecond-ns) decomposition, so the same instant
    (or span) hashes identically across s/ms/us/ns columns WITHOUT
    truncating sub-microsecond precision — ns-resolution timestamps one
    tick apart are distinct keys (truncation collapsed 1000 ns-ticks
    onto each us, fabricating dedup duplicates and 1000x-undercounting
    HLL ndv on ns data)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.Array):
        t = arr.type
        if pa.types.is_temporal(t) and not pa.types.is_date(t):
            # timestamp/time32/time64/duration: exact integer ticks via
            # Arrow casts (to_numpy yields object arrays for time types
            # and would truncate units), then the canonical sec/ns split
            import pyarrow.compute as pc
            per_sec = _PER_SEC[t.unit]
            if pa.types.is_time32(t):
                arr = pc.cast(arr, pa.int32())
            iv_a = pc.cast(arr, pa.int64())
            nullmask = None
            if iv_a.null_count:
                nullmask = pc.is_null(iv_a).to_numpy(zero_copy_only=False)
                iv_a = pc.fill_null(iv_a, 0)
            iv = iv_a.to_numpy(zero_copy_only=False).astype(np.int64)
            h = _hash_sec_ns(*_decompose_ticks(iv, per_sec), seed)
            if nullmask is not None:
                h[nullmask] = _null_sentinel(seed)
            return h
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
    if np_vals.dtype.kind in "iufbMm":
        # 'm' included: timedelta64 previously fell through to the
        # OBJECT siphash path, so the same durations hashed differently
        # as numpy vs Arrow batches — breaking cross-stage determinism
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
    elif vals.dtype.kind in "Mm":
        # canonical (sec, subsecond-ns) split — identical hashes for the
        # same instant/span across units, matching the Arrow temporal
        # path exactly, NO ns truncation (see hash64_array docstring)
        unit = np.datetime_data(vals.dtype)[0]
        per_sec = _PER_SEC.get(unit)
        if per_sec is not None:
            return _hash_sec_ns(
                *_decompose_ticks(vals.view(np.int64), per_sec), seed)
        if vals.dtype.kind == "m" and unit in _CAL_UNIT_TAG:
            # calendar months/years have no fixed seconds ratio: hash
            # the raw count under a unit domain tag (deterministic, but
            # deliberately NOT equal across calendar units)
            with np.errstate(over="ignore"):
                bits = vals.view(np.int64).astype(np.uint64) \
                    ^ _CAL_UNIT_TAG[unit]
            return _splitmix64(bits + np.uint64(seed))
        # coarser-than-second fixed units (W/D/h/m): exact in seconds
        to = ("datetime64[s]" if vals.dtype.kind == "M"
              else "timedelta64[s]")
        iv = vals.astype(to).view(np.int64)
        return _hash_sec_ns(*_decompose_ticks(iv, 1), seed)
    elif vals.dtype.kind == "b":
        bits = vals.astype(np.uint64)
    else:
        bits = vals.astype(np.int64).view(np.uint64)
    return _splitmix64(bits + np.uint64(seed))
