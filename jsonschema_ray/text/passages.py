"""Passage-level dedup signals, benchmark decontamination, and
char-entropy quality scoring.

Training-corpus curation operators beyond whole-document dedup (no
reference analog — LLM-pipeline surplus surface, like dedup/):

* ``duplicate_passages`` — word n-grams that appear in ≥ ``min_docs``
  distinct documents (the unit of "memorized passage" dedup, Lee et
  al.-style: repeated passages, not repeated documents, drive
  memorization). Per-batch stage emits each document's DISTINCT grams
  once (a document lives in exactly one batch row, so in-batch dedup is
  global dedup per (doc, gram)); a grouped count over grams then equals
  an exact distinct-doc count with no second shuffle.
  ``hash_only=True`` shuffles 64-bit gram hashes (8 B/row) instead of
  gram strings — the 100-TB path; the string form exists so small runs
  can be oracled against plain SQL.
* ``decontaminate`` — flag documents containing any of a small probe
  set (benchmark strings). Probes are ``ray.put`` ONCE and read per
  actor via ``worker_cached``; each probe is one vectorized
  ``match_substring`` kernel over the batch, so cost is
  O(probes × batch) kernel calls, not a Python row loop.
* ``char_entropy`` — per-document Shannon entropy (bits, log2) over
  code points, fully vectorized: one flat code-point array per batch
  (utf-32 reinterpret), lexsort run-length counts per (doc, char),
  segment-summed ``-p·log2 p``. Matches DuckDB's ``entropy()``.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# duplicate word-n-gram passages


def _doc_word_ngrams(text: str, n: int) -> set:
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _gram_partials(b: pa.Table, *, text_col: str, n: int,
                   hash_only: bool) -> pa.Table:
    texts = b.column(text_col).to_pylist()
    grams: list = []
    for t in texts:
        if t is None:
            continue
        grams.extend(_doc_word_ngrams(t, n))
    if hash_only:
        from ..sketches.hashing import hash64_array
        col = hash64_array(pa.array(grams, type=pa.string()), seed=0)
        return pa.table({"gram_hash": col,
                         "_one": pa.array(np.ones(len(grams), np.int64))})
    return pa.table({"gram": pa.array(grams, type=pa.string()),
                     "_one": pa.array(np.ones(len(grams), np.int64))})


def duplicate_passages(ds, text_col: str = "text", n: int = 8,
                       min_docs: int = 2, hash_only: bool = False,
                       batch_size: int = 4096):
    """→ Dataset (gram | gram_hash, n_docs) for word ``n``-grams found in
    ≥ ``min_docs`` distinct documents. See module docstring for the
    in-batch-distinct = exact-distinct-count argument and the
    ``hash_only`` scale path."""
    from ray.data.aggregate import Sum

    key = "gram_hash" if hash_only else "gram"
    partials = ds.select_columns([text_col]).map_batches(
        functools.partial(_gram_partials, text_col=text_col, n=n,
                          hash_only=hash_only),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
    counts = partials.groupby(key).aggregate(
        Sum("_one", alias_name="n_docs"))

    def at_least(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["n_docs"], min_docs))

    return counts.map_batches(at_least, batch_format="pyarrow",
                              zero_copy_batch=True)


# ---------------------------------------------------------------------------
# benchmark decontamination


def _decontam_batch(b: pa.Table, *, id_col, text_col, probes_ref) -> pa.Table:
    import ray

    from ..util import worker_cached
    probes = worker_cached(("decontam", probes_ref.hex()),
                           lambda: ray.get(probes_ref))
    text = b.column(text_col)
    hits = np.zeros(len(b), dtype=np.int64)
    for p in probes:
        m = pc.fill_null(pc.match_substring(text, p), False)
        hits += m.to_numpy(zero_copy_only=False)
    keep = hits > 0
    return pa.table({id_col: b.column(id_col).filter(pa.array(keep)),
                     "n_probes": pa.array(hits[keep])})


def decontaminate(ds, probes: list, id_col: str = "doc_id",
                  text_col: str = "text", batch_size: int = 8192):
    """→ Dataset (id, n_probes) for documents containing at least one
    probe string. ``probes`` must be small (a benchmark suite's worth);
    they are deduplicated, broadcast once, and matched with vectorized
    substring kernels."""
    import ray

    probes_ref = ray.put(sorted(set(p for p in probes if p)))
    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_decontam_batch, id_col=id_col,
                          text_col=text_col, probes_ref=probes_ref),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


# ---------------------------------------------------------------------------
# char-level Shannon entropy


def char_entropy(arr: pa.Array, ndigits: int = 4) -> pa.Array:
    """Per-string Shannon entropy in bits over code points (null → null,
    empty → 0.0), vectorized via one flat utf-32 pass."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    texts = arr.to_pylist()
    n = len(texts)
    lens = np.array([0 if t is None else len(t) for t in texts],
                    dtype=np.int64)
    flat = np.frombuffer("".join(t for t in texts if t)
                         .encode("utf-32-le"), dtype=np.uint32)
    seg = np.repeat(np.arange(n), lens)
    ent = np.zeros(n, dtype=np.float64)
    if len(flat):
        order = np.lexsort((flat, seg))
        fs, ss = flat[order], seg[order]
        new_run = np.ones(len(fs), dtype=bool)
        new_run[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
        run_ids = np.cumsum(new_run) - 1
        run_counts = np.bincount(run_ids)
        run_seg = ss[new_run]
        p = run_counts / lens[run_seg]
        contrib = -p * np.log2(p)
        np.add.at(ent, run_seg, contrib)
    out = np.round(ent, ndigits)
    mask = np.array([t is None for t in texts])
    return pa.array(np.where(mask, np.nan, out), type=pa.float64(),
                    mask=mask)
