"""Blocked fuzzy matching (record linkage) over string columns.

The entity-resolution pass a curation pipeline runs to find records
that are *almost* the same string — near-identical author names, URLs
off by one character, caption variants — where token-set methods
(minhash/simhash) are too coarse. Standard shape (Fellegi-Sunter /
blocking literature): a cheap BLOCKING key bounds the candidate set,
then exact edit distance runs only within blocks. No reference analog
(LLM-pipeline surplus surface, SURVEY §2.8).

* ``levenshtein_many`` — exact Levenshtein distance over parallel
  string lists, vectorized across PAIRS: pairs are grouped by
  (len_a, len_b) and each group runs one numpy dynamic program whose
  Python loop count is len_a × len_b regardless of how many pairs ride
  it (the per-cell work is an O(pairs) vector op). Distances count
  Unicode CODE POINTS (utf-32 reinterpret) — the standard definition.
  DuckDB v1.0's ``levenshtein`` counts UTF-8 *bytes* on non-ASCII
  input (measured: ``levenshtein('é','e') = 2``); the two agree
  exactly on ASCII, which is what the oracle table carries, and the
  code-point semantics are pinned by pytest against a pure-Python
  reference.
* ``blocked_fuzzy_pairs`` — SQL self-join semantics: block-key
  equality (NULL keys never match), ``id_a < id_b``, distance ≤
  ``max_dist``. ONE hash shuffle on the block key moves only
  (block, id, text); all-pairs generation happens within a block.

Scale contract: the blocking key must bound block size — that is the
record-linkage blocking assumption, the same contract as
``ngram_jaccard_pairs`` (all-pairs verifier, cap-guarded). A block
larger than ``max_block_rows`` raises with guidance to refine the key
rather than silently going quadratic; a length prefilter
(|len_a − len_b| > max_dist) drops pairs before the DP, and pair
index generation chunks so peak memory is bounded by ``pair_chunk``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import partitioned_group_apply

_EMPTY_PAIRS = {"id_a": "int64", "id_b": "int64", "dist": "int64"}


def _codes(strs, length: int) -> np.ndarray:
    """(n, length) uint32 code-point matrix for equal-length strings —
    one C-level encode per string, no per-character Python."""
    buf = "".join(strs).encode("utf-32-le")
    return np.frombuffer(buf, dtype=np.uint32).reshape(len(strs), length)


def _lev_full(A: np.ndarray, B: np.ndarray, l1: int,
              l2: int) -> np.ndarray:
    """Full Wagner-Fischer over a (len_a, len_b) bucket: l1×l2 Python
    steps, each an O(pairs) vector op."""
    prev = np.tile(np.arange(l2 + 1, dtype=np.int32), (len(A), 1))
    cur = np.empty_like(prev)
    for i in range(1, l1 + 1):
        cur[:, 0] = i
        cost = (A[:, i - 1:i] != B).astype(np.int32)
        for j in range(1, l2 + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1,
                       out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost[:, j - 1],
                       out=cur[:, j])
        prev, cur = cur, prev
    return prev[:, l2].astype(np.int64)


def _lev_banded(A: np.ndarray, B: np.ndarray, l1: int, l2: int,
                cap: int) -> np.ndarray:
    """Ukkonen-banded DP: only cells with |i−j| ≤ cap can sit on a
    path of total cost ≤ cap, so each row touches 2·cap+1 columns
    instead of l2. Pairs whose banded row MINIMUM exceeds cap are
    provably above the threshold (every ≤-cap path crosses each row
    inside the band, and the row min lower-bounds any completion) —
    they are compressed out mid-flight, so a bucket of mostly-distant
    pairs dies in a few rows. Returns the exact distance where it is
    ≤ cap, else cap+1."""
    P = len(A)
    INF = np.int32(cap + 1)
    res = np.full(P, cap + 1, dtype=np.int64)
    idx = np.arange(P)
    prev = np.full((P, l2 + 1), INF, np.int32)
    w = min(cap, l2)
    prev[:, :w + 1] = np.arange(w + 1, dtype=np.int32)
    for i in range(1, l1 + 1):
        lo, hi = max(1, i - cap), min(l2, i + cap)
        cur = np.full((len(idx), l2 + 1), INF, np.int32)
        if i <= cap:
            cur[:, 0] = i
        cost = (A[:, i - 1:i] != B).astype(np.int32)
        for j in range(lo, hi + 1):
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1,
                       out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost[:, j - 1],
                       out=cur[:, j])
        prev = cur
        alive = prev[:, lo:hi + 1].min(axis=1) <= cap
        if not alive.all():
            if not alive.any():
                return res
            if alive.mean() < 0.7:
                idx, prev = idx[alive], prev[alive]
                A, B = A[alive], B[alive]
    res[idx] = np.minimum(prev[:, l2], INF).astype(np.int64)
    return res


def levenshtein_many(a: list, b: list, cap: int = None) -> np.ndarray:
    """Exact Levenshtein distance for each (a[i], b[i]) pair, int64.

    Pairs are bucketed by (len(a), len(b)); each bucket runs one
    Wagner-Fischer DP vectorized over the bucket's pairs (the i/j
    loops are over CHARACTER positions only). Distances are over
    Unicode code points (see module docstring for the DuckDB
    byte-counting divergence on non-ASCII).

    With ``cap``, the banded early-abandon DP runs instead: distances
    ≤ cap are exact, anything above reports cap+1 — the threshold-join
    fast path (2·cap+1 columns per row, dead pairs compressed out),
    pinned equal to the full DP by pytest.
    """
    n = len(a)
    if n != len(b):
        raise ValueError("levenshtein_many: length mismatch")
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    la = np.fromiter((len(s) for s in a), np.int64, n)
    lb = np.fromiter((len(s) for s in b), np.int64, n)
    key = la * (int(lb.max()) + 1) + lb
    order = np.argsort(key, kind="stable")
    bounds = np.flatnonzero(np.diff(key[order])) + 1
    for idx in np.split(order, bounds):
        l1, l2 = int(la[idx[0]]), int(lb[idx[0]])
        if l1 == 0 or l2 == 0:
            d = max(l1, l2)
            out[idx] = d if cap is None else min(d, cap + 1)
            continue
        if cap is not None and abs(l1 - l2) > cap:
            out[idx] = cap + 1
            continue
        A = _codes([a[i] for i in idx], l1)
        B = _codes([b[i] for i in idx], l2)
        if cap is None:
            out[idx] = _lev_full(A, B, l1, l2)
        else:
            out[idx] = _lev_banded(A, B, l1, l2, cap)
    return out


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype=t)
                         for c, t in _EMPTY_PAIRS.items()})


def blocked_fuzzy_pairs(ds, block_cols: list, text_col: str,
                        id_col: str, max_dist: int = 2,
                        max_block_rows: int = 8192,
                        pair_chunk: int = 4_000_000,
                        num_partitions: int = None):
    """All within-block string pairs with edit distance ≤ ``max_dist``.

    Returns a Dataset of (id_a, id_b, dist) with ``id_a < id_b``.
    SQL-equivalent semantics (so the DuckDB oracle is a plain
    self-join): rows with a NULL block key, NULL id, or NULL text are
    invisible — NULL never equi-joins, ``NULL < x`` is UNKNOWN, and
    ``levenshtein(NULL, ·)`` is NULL which fails the ≤ filter.

    Shuffle shape: the narrow pruned projection (block, id, text)
    rides ONE block-key hash partition; every block lands whole in
    exactly one partition, where pair indices are generated in
    ``pair_chunk``-bounded slabs, length-prefiltered, and scored by
    the vectorized DP. Blocks above ``max_block_rows`` raise — the
    blocking key is the user's scale contract (refine it, e.g. add a
    length or prefix component) rather than a silent O(m²) blowup.
    """
    import pyarrow.compute as pc

    block_cols = list(block_cols)
    cols = block_cols + [id_col, text_col]

    def prune(b: pa.Table) -> pa.Table:
        t = b.select(cols)
        keep = None
        for c in cols:
            v = pc.is_valid(t.column(c))
            keep = v if keep is None else pc.and_(keep, v)
        return t.filter(keep)

    pruned = ds.map_batches(prune, batch_format="pyarrow",
                            zero_copy_batch=True)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby(block_cols, dropna=True, sort=False):
            m = len(g)
            if m < 2:
                continue
            if m > max_block_rows:
                raise ValueError(
                    f"blocked_fuzzy_pairs: block of {m} rows exceeds "
                    f"max_block_rows={max_block_rows}; refine the "
                    f"blocking key (add a length/prefix component) — "
                    f"all-pairs within a block is the blocking "
                    f"contract, not a degradable plan")
            g = g.sort_values(id_col, kind="mergesort")
            ids = g[id_col].to_numpy()
            texts = g[text_col].tolist()
            lens = np.fromiter((len(t) for t in texts), np.int64, m)
            # row-chunked triu pair generation: peak index memory is
            # bounded by pair_chunk pairs, not m²/2
            rows_per = max(1, pair_chunk // m)
            for i0 in range(0, m - 1, rows_per):
                i1 = min(i0 + rows_per, m - 1)
                ii, jj = np.broadcast_arrays(
                    np.arange(i0, i1)[:, None], np.arange(m)[None, :])
                keep = jj > ii
                iu, ju = ii[keep], jj[keep]
                # SQL id_a < id_b: duplicated ids never self-pair
                # (rows are id-sorted, so j > i implies id_j >= id_i)
                keep = (np.abs(lens[iu] - lens[ju]) <= max_dist) \
                    & (ids[iu] != ids[ju])
                iu, ju = iu[keep], ju[keep]
                if not len(iu):
                    continue
                d = levenshtein_many([texts[i] for i in iu],
                                     [texts[j] for j in ju],
                                     cap=max_dist)
                hit = d <= max_dist
                if hit.any():
                    outs.append(pd.DataFrame({
                        "id_a": ids[iu[hit]], "id_b": ids[ju[hit]],
                        "dist": d[hit]}))
        if not outs:
            return _empty_pairs()
        return pd.concat(outs, ignore_index=True)

    return partitioned_group_apply(pruned, block_cols, per_partition,
                                   num_partitions=num_partitions)
