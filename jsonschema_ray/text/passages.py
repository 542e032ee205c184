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
import pandas as pd
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


def _gram_doc_partials(b: pa.Table, *, id_col: str, text_col: str,
                       n: int, hash_only: bool) -> pa.Table:
    ids = b.column(id_col).to_pylist()
    texts = b.column(text_col).to_pylist()
    out_ids: list = []
    grams: list = []
    for i, t in zip(ids, texts):
        if t is None:
            continue
        gs = _doc_word_ngrams(t, n)
        grams.extend(gs)
        out_ids.extend([i] * len(gs))
    id_type = b.schema.field(id_col).type
    if hash_only:
        from ..sketches.hashing import hash64_array
        col = hash64_array(pa.array(grams, type=pa.string()), seed=0)
        return pa.table({"gram_hash": col,
                         id_col: pa.array(out_ids, type=id_type)})
    return pa.table({"gram": pa.array(grams, type=pa.string()),
                     id_col: pa.array(out_ids, type=id_type)})


def novelty_scores(ds, id_col: str = "doc_id", text_col: str = "text",
                   n: int = 8, min_docs: int = 2,
                   hash_only: bool = False, batch_size: int = 4096):
    """Per-document NOVELTY score: 1 − (shared grams / total grams)
    over the document's DISTINCT word ``n``-grams, where a gram is
    "shared" when ≥ ``min_docs`` distinct documents contain it — the
    memorization-risk signal (Lee et al.: repeated passages drive
    memorization) aggregated to a per-document admit/reject score.
    Documents with no grams (fewer than ``n`` tokens, or null text)
    answer a NULL novelty, exactly like the SQL LEFT JOIN.

    Shape: the (gram, doc) pair stream — each document's distinct
    grams emitted once (a doc lives in one batch, so in-batch dedup is
    global) — rides ONE gram-hash partition, where per-gram doc counts
    and the per-(doc, partition) total/shared partials come out of the
    same pass; a doc-keyed combiner groupby sums the partials, and the
    size-chosen equi_join LEFT-attaches scores to the id stream so
    gramless documents surface with NULL. ``hash_only=True`` shuffles
    8 B gram hashes instead of gram strings (the 100-TB path; the
    string form exists so small runs can be oracled against SQL — a
    64-bit collision merging two grams is the accepted sketch error).
    Rows with a NULL id still contribute to gram doc-counts (SQL's
    grams CTE keeps them) but can never receive a score (NULL never
    equi-joins)."""
    import functools as _ft

    from ..joins import equi_join
    from ..pipelines.relational import grouped_agg

    key = "gram_hash" if hash_only else "gram"
    pairs = ds.select_columns([id_col, text_col]).map_batches(
        _ft.partial(_gram_doc_partials, id_col=id_col,
                    text_col=text_col, n=n, hash_only=hash_only),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)

    def per_partition(t: pa.Table) -> pa.Table:
        # all global rows of every gram it owns land here together:
        # per-gram doc counts are exact, and the doc-side partials
        # (total grams seen, shared grams seen) fall out of the same
        # pass. doc ids stay NULLABLE Int64 (pandas float64 would
        # round ids past 2^53 — the partitioned_group_apply rule).
        nullable_int = (lambda dt: pd.Int64Dtype()
                        if pa.types.is_int64(dt) else None)
        df = t.to_pandas(types_mapper=nullable_int)
        cnt = df.groupby(key, sort=False)[key].transform("size")
        df["_shared"] = (cnt >= min_docs).astype("int64")
        agg = df.groupby(id_col, dropna=False, sort=False).agg(
            total=(key, "size"), shared=("_shared", "sum"))
        agg = agg.reset_index()
        agg["total"] = agg["total"].astype("int64")
        agg["shared"] = agg["shared"].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ..util import partitioned_group_apply
    partials = partitioned_group_apply(pairs, [key], per_partition,
                                       batch_format="pyarrow")
    scores = grouped_agg(partials, [id_col],
                         {"total": "total", "shared": "shared"},
                         count_alias="_np")

    score_schema = pa.schema([
        (id_col, pa.int64()), ("total", pa.int64()),
        ("shared", pa.int64()), ("_np", pa.int64())])
    joined = equi_join(ds.select_columns([id_col]), scores, on=id_col,
                       how="left_outer", right_schema=score_schema)

    def nov(b: pa.Table) -> pa.Table:
        total = b.column("total").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        shared = b.column("shared").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            nvl = np.where(total > 0, 1.0 - shared / total, np.nan)
        return pa.table({id_col: b.column(id_col),
                         "novelty": pa.array(np.round(nvl, 6),
                                             pa.float64())})

    return joined.map_batches(nov, batch_format="pyarrow",
                              zero_copy_batch=True)
