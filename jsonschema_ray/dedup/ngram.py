"""Exact character-k-gram Jaccard pairs — the ground-truth verifier for
the text near-dup family.

``minhash_near_duplicates`` / ``verified_near_duplicates`` are the scale
path (LSH candidates, banded shuffle); this module computes the EXACT
all-pairs answer so small-scale runs can be oracled against plain SQL
(DuckDB gram-join) and the LSH recall quantified. All-pairs is O(n²) by
definition, so the corpus broadcast is cap-gated and the function refuses
loudly above the cap instead of degrading.

Semantics match :func:`jaccard_shingles` (dedup/minhash.py): distinct
64-bit hashes of k code-point grams, docs shorter than k contribute their
whole text as a single gram, and two docs with EMPTY gram sets score 1.0
(they pair), exactly as jaccard_shingles and the minhash verify path
define it. Mirrors the reference's set-equality treatment of uniqueItems-style
comparisons only in spirit — this operator has no reference analog (it is
part of the LLM-pipeline surplus surface).

Per-batch compute is one dense (batch × vocab) @ (vocab × corpus) int
matmul: intersection counts for every batch-doc × corpus-doc pair at
BLAS speed, then the Jaccard threshold keeps survivors only.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def _distinct_doc_grams(texts: list, k: int):
    """texts → (flat distinct gram hashes, doc offsets): one flat kgram
    pass, then a lexsort dedup of (doc, gram) — no per-doc set() loop."""
    from .minhash import kgram_hashes_flat
    flat, bounds = kgram_hashes_flat(texts, k)
    n = len(texts)
    if len(flat) == 0:
        return np.zeros(0, dtype=flat.dtype), np.zeros(n + 1, dtype=np.int64)
    seg = np.repeat(np.arange(n), np.diff(bounds))
    order = np.lexsort((flat, seg))
    fs, ss = flat[order], seg[order]
    keep = np.ones(len(fs), dtype=bool)
    keep[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
    fs, ss = fs[keep], ss[keep]
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(ss, minlength=n), out=offs[1:])
    return fs, offs


def _corpus_ref(fdf, text_col: str, id_col: str, k: int,
                dense_cap_bytes: int):
    """Driver-side corpus prep → the broadcast payload: ids, sorted gram
    vocabulary, CSR (offsets + vocab column indices), per-doc set sizes."""
    texts = fdf[text_col].tolist()
    fs, offs = _distinct_doc_grams(texts, k)
    vocab = np.unique(fs)
    cols = np.searchsorted(vocab, fs).astype(np.int64)
    sizes = np.diff(offs)
    n, v = len(texts), len(vocab)
    if n * v * 4 > dense_cap_bytes:
        raise ValueError(
            "ngram_jaccard_pairs is the all-pairs verifier; dense corpus "
            f"gram matrix {n}x{v} exceeds the cap ({n * v * 4} > "
            f"{dense_cap_bytes} B) — use minhash_near_duplicates + "
            "verified_near_duplicates (LSH) at scale")
    ids = fdf[id_col].to_numpy()
    return ids, vocab, offs, cols, sizes


def _dense_corpus(vocab_len: int, offs, cols, n: int) -> np.ndarray:
    """CSR → dense (vocab × corpus) float32 incidence matrix (built once
    per actor via worker_cached)."""
    M = np.zeros((vocab_len, n), dtype=np.float32)
    doc = np.repeat(np.arange(n), np.diff(offs))
    M[cols, doc] = 1.0
    return M


def _batch_pairs(b: pa.Table, *, text_col, id_col, k, threshold,
                 ref, id_type) -> pa.Table:
    import ray

    from ..util import worker_cached
    ids_all, vocab, offs, cols, sizes_all = worker_cached(
        ("ngram_corpus", ref.hex()), lambda: ray.get(ref))
    Mc = worker_cached(("ngram_dense", ref.hex()),
                       lambda: _dense_corpus(len(vocab), offs, cols,
                                             len(ids_all)))
    texts = b.column(text_col).to_pylist()
    fs, boffs = _distinct_doc_grams(texts, k)
    # batch grams are a subset of the corpus vocabulary by construction
    bcols = np.searchsorted(vocab, fs)
    nb = len(texts)
    Mb = np.zeros((nb, len(vocab)), dtype=np.float32)
    Mb[np.repeat(np.arange(nb), np.diff(boffs)), bcols] = 1.0
    inter = Mb @ Mc                                   # (batch, corpus)
    sz_b = np.diff(boffs).astype(np.float64)
    union = sz_b[:, None] + sizes_all[None, :].astype(np.float64) - inter
    # union == 0 ⟺ both gram sets empty: jaccard_shingles (and the minhash
    # verify path) define that as 1.0, so the oracle must agree
    with np.errstate(divide="ignore", invalid="ignore"):
        jac = np.where(union > 0, inter / union, 1.0)
    bi, ci = np.nonzero(jac >= threshold)
    idb = b.column(id_col).to_numpy(zero_copy_only=False)
    ia_v, ib_v = idb[bi], ids_all[ci]
    keep = ia_v < ib_v                                # canonical, no self
    return pa.table({
        "id_a": pa.array(ia_v[keep], type=id_type),
        "id_b": pa.array(ib_v[keep], type=id_type),
        "jaccard": pa.array(np.round(jac[bi, ci][keep], 6),
                            type=pa.float64()),
    })


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5, threshold: float = 0.5,
                        batch_size: int = 2048,
                        broadcast_cap: int = 1 << 30,
                        dense_cap_bytes: int = 512 << 20):
    """EXACT all-pairs k-gram Jaccard ≥ threshold → Dataset
    (id_a, id_b, jaccard), id_a < id_b. Cap-gated small-corpus ground
    truth for the LSH text near-dup family (see module docstring)."""
    import ray

    source = ds.select_columns([id_col, text_col]).materialize()
    if source.size_bytes() > broadcast_cap:
        raise ValueError(
            "ngram_jaccard_pairs is the all-pairs verifier; corpus exceeds "
            f"broadcast cap ({source.size_bytes()} > {broadcast_cap} B) — "
            "use minhash_near_duplicates (LSH) at scale")
    id_type = ds.schema().base_schema.field(id_col).type
    fdf = source.to_pandas()
    ref = ray.put(_corpus_ref(fdf, text_col, id_col, k, dense_cap_bytes))
    return source.map_batches(
        functools.partial(_batch_pairs, text_col=text_col, id_col=id_col,
                          k=k, threshold=threshold, ref=ref,
                          id_type=id_type),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
