"""Text analysis operators for training-data pipelines: token counting,
quality scoring, language-ID (n-gram/stopword heuristic), SimHash
fingerprinting. All vectorized (pyarrow.compute regex kernels / numpy) and
designed as map_batches stages — no reference analog (the reference's
string machinery is the format library, SURVEY §2.5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64_array

# tiny per-language stopword profiles (top function words) — enough for a
# deterministic heuristic over the 5 testdata languages
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for",
           "was", "with", "as", "on", "at", "by", "this", "be", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
           "den", "von", "mit", "auf", "für", "im", "dem", "sich", "des"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "que",
           "pour", "dans", "qui", "sur", "pas", "au", "du", "ce", "il"},
    "es": {"el", "la", "los", "las", "y", "de", "que", "en", "un", "una",
           "es", "por", "con", "para", "no", "se", "del", "su", "al"},
}


def token_counts(arr: pa.Array) -> pa.Array:
    """Whitespace-token count per string: number of ``\\S+`` matches
    (matches DuckDB ``length(regexp_extract_all(text, '\\S+'))``).
    Null strings stay null (the SQL result is NULL) — returned as a
    null-preserving Arrow int64 array, never a NaN-cast numpy array."""
    return pc.count_substring_regex(arr, r"\S+").cast(pa.int64())


# BPE-ish tokenizer regex (GPT-2 family shape, RE2-compatible: the
# original's \s+(?!\S) lookahead is dropped — RE2 has no lookarounds —
# so trailing whitespace runs count as one token)
BPE_TOKEN_PATTERN = (r"'(s|t|re|ve|m|ll|d)"
                     r"| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def bpe_token_counts(arr: pa.Array) -> pa.Array:
    """Subword-ish token count per string: number of BPE_TOKEN_PATTERN
    matches. Both this engine (pyarrow) and DuckDB run RE2, so
    ``length(regexp_extract_all(text, pattern))`` is an exact oracle;
    null strings stay null on both sides."""
    return pc.count_substring_regex(arr, BPE_TOKEN_PATTERN).cast(pa.int64())


def quality_features(arr: pa.Array, ndigits: int = 4) -> dict:
    """Quality-scoring features per string, each reproducible in ANSI SQL:
    n_chars (code points), n_tokens, alpha_ratio, space_ratio, digit_ratio,
    upper_ratio — ratios rounded to ``ndigits``. Null strings stay NULL in
    every feature (the float-NaN→int64 cast of a null length is undefined
    and platform-dependent — never let it near the output)."""
    n = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.float64)
    safe_n = np.where(n > 0, n, 1.0)
    nullmask = np.isnan(n)

    def ratio(pattern):
        c = pc.count_substring_regex(arr, pattern).to_numpy(
            zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            r = np.round(c / safe_n, ndigits)
        return pa.array(np.where(nullmask, 0.0, r), mask=nullmask)

    return {
        "n_chars": pc.utf8_length(arr).cast(pa.int64()),
        "n_tokens": token_counts(arr),
        "alpha_ratio": ratio(r"[A-Za-z]"),
        "space_ratio": ratio(r" "),
        "digit_ratio": ratio(r"[0-9]"),
        "upper_ratio": ratio(r"[A-Z]"),
    }


def _segment_sum(flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    cum = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(flat, out=cum[1:])
    return cum[offsets[1:]] - cum[offsets[:-1]]


_TOK_STRIP = r"^[.,;:!?\"'()]+|[.,;:!?\"'()]+$"


def langid_batch(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Heuristic language-ID: CJK codepoint share → 'zh'; else the language
    whose stopword profile covers the largest share of tokens; 'und' when
    nothing matches. Deterministic; returns (lang, score).

    Fully vectorized: Arrow regex kernels do the CJK count, lowercasing,
    whitespace split and punctuation strip; per-language membership is one
    ``is_in`` over the flat token array + a segment sum per doc."""
    n = len(arr)
    arr = pc.fill_null(arr, "")
    nchars = pc.utf8_length(arr).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cjk = pc.count_substring_regex(arr, "[一-鿿]").to_numpy(
        zero_copy_only=False).astype(np.int64)
    cjk_share = cjk / np.maximum(1, nchars)

    toks = pc.split_pattern_regex(pc.utf8_lower(arr), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = np.asarray(toks.offsets, dtype=np.int64)
    flat = toks.values
    if offs[0] != 0:  # sliced parent: values carry a leading offset
        flat = flat.slice(offs[0])
        offs = offs - offs[0]
    flat = pc.replace_substring_regex(flat, _TOK_STRIP, "")
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    denom = _segment_sum(nonempty, offs)

    names = list(_STOPWORDS)
    scores_mat = np.zeros((len(names), n))
    for li, lang in enumerate(names):
        member = pc.is_in(flat, value_set=pa.array(
            sorted(_STOPWORDS[lang]))).to_numpy(
            zero_copy_only=False).astype(np.int64)
        scores_mat[li] = _segment_sum(member, offs) / np.maximum(1, denom)
    best_idx = scores_mat.argmax(axis=0)  # ties → first profile, like the
    best_s = scores_mat[best_idx, np.arange(n)]  # old dict-order loop

    langs = np.where(best_s > 0.03,
                     np.asarray(names, dtype=object)[best_idx], "und")
    scores = np.round(best_s, 4)
    no_toks = (denom == 0) | (nchars == 0)
    langs[no_toks] = "und"
    scores[no_toks] = 0.0
    is_cjk = cjk_share > 0.2
    langs[is_cjk] = "zh"
    scores[is_cjk] = np.round(cjk_share[is_cjk], 4)
    return langs.astype(object), scores


def simhash64_batch(arr: pa.Array) -> np.ndarray:
    """64-bit SimHash over whitespace tokens (Charikar 2002): sum ±1 per bit
    of each token hash, take sign vector. Vectorized via one flat token-hash
    array + segment sums."""
    texts = arr.to_pylist()
    all_tokens, bounds = [], [0]
    for t in texts:
        toks = t.split() if t else []
        all_tokens.extend(toks)
        bounds.append(len(all_tokens))
    out = np.zeros(len(texts), dtype=np.int64)
    if not all_tokens:
        return out
    th = hash64_array(pa.array(all_tokens))
    # one 1-D segment-sum pass per bit: the old (n_tokens, 64) ±1 bit
    # matrix + (n_tokens+1, 64) int64 cumsum peaked at ~1.3 KB/token
    # (8+ GiB per default 8192-doc batch → worker OOM); this keeps one
    # 4 B/token temporary per pass with identical signatures
    b = np.asarray(bounds)
    nonempty = b[1:] > b[:-1]
    safe_starts = np.minimum(b[:-1], len(th) - 1)
    val = np.zeros(len(texts), dtype=np.uint64)
    for k in range(64):
        contrib = ((th >> np.uint64(k)) & np.uint64(1)) \
            .astype(np.int32) * 2 - 1
        sums = np.add.reduceat(contrib, safe_starts)
        pos = (sums > 0) & nonempty  # empty docs masked (reduceat
        # yields a stray single element for duplicate start indices)
        val |= pos.astype(np.uint64) << np.uint64(k)
    return val.view(np.int64)


def rolling_fingerprint(arr: pa.Array, window: int = 16,
                        keep: int = 4) -> list[list[int]]:
    """Winnowing-style document fingerprint: byte-window rolling hashes,
    keep the ``keep`` smallest per doc (deterministic robust content
    signature). ONE flat hash pass over the whole batch
    (kgram_hashes_flat) + a segment-sorted top-k — no per-doc loop."""
    from ..dedup.minhash import kgram_hashes_flat
    texts = arr.to_pylist()
    n = len(texts)
    flat, bounds = kgram_hashes_flat(texts, window)
    lengths = np.diff(bounds)
    # docs under the window (in code points or bytes) fingerprint to [] —
    # kgram's short-doc whole-text gram does not count
    nchars = pc.utf8_length(pc.fill_null(arr, "")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nbytes = np.fromiter(((len(t.encode("utf-8")) if t else 0)
                          for t in texts), count=n, dtype=np.int64)
    ok_doc = (nchars >= window) & (nbytes >= window)
    if len(flat) == 0:
        return [[] for _ in range(n)]
    seg_id = np.repeat(np.arange(n), lengths)
    order = np.lexsort((flat.view(np.int64) ^ np.int64(-2**63), seg_id))
    sorted_seg = seg_id[order]
    starts = bounds[:-1]
    pos = np.arange(len(order), dtype=np.int64) - starts[sorted_seg]
    sel = (pos < keep) & ok_doc[sorted_seg]
    vals = flat[order[sel]].astype(np.int64)
    counts = np.minimum(lengths, keep) * ok_doc
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return [vals[offs[i]:offs[i + 1]].tolist() for i in range(n)]


class TextFeaturesStage:
    """map_batches actor: append text-analysis columns to each batch."""

    def __init__(self, text_col: str = "text", langid: bool = True,
                 simhash: bool = True, quality: bool = True):
        self.text_col = text_col
        self.langid, self.simhash, self.quality = langid, simhash, quality

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if self.quality:
            for name, vals in quality_features(col).items():
                if not isinstance(vals, (pa.Array, pa.ChunkedArray)):
                    vals = pa.array(vals)
                batch = batch.append_column(name, vals)
        if self.langid:
            langs, scores = langid_batch(col)
            batch = batch.append_column("lang_pred",
                                        pa.array(list(langs),
                                                 type=pa.string()))
            batch = batch.append_column("lang_score", pa.array(scores))
        if self.simhash:
            batch = batch.append_column("simhash",
                                        pa.array(simhash64_batch(col)))
        return batch


def _text_features_batch(batch, *, text_col, cfg_items):
    from ..util import worker_cached
    stage = worker_cached(("textfeat", text_col, cfg_items),
                          lambda: TextFeaturesStage(text_col=text_col,
                                                    **dict(cfg_items)))
    return stage(batch)


def add_text_features(ds, text_col: str = "text", batch_size: int = 8192,
                      concurrency=None, **cfg):
    import functools
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        functools.partial(_text_features_batch, text_col=text_col,
                          cfg_items=tuple(sorted(cfg.items()))), **kwargs)


# ---------------------------------------------------------------------------
# PII-ish pattern counting (RE2 both sides → SQL-oracled)

# Non-overlapping match counts; RE2 syntax shared verbatim with DuckDB's
# regexp_extract_all, so `length(regexp_extract_all(text, pat))` is an
# exact oracle. These are screening signals for pipeline routing, not a
# PII detector.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"),
    ("phone", r"\+?[0-9][0-9()\- ]{7,}[0-9]"),
    ("ipv4", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"),
)


def pii_counts(arr: pa.Array) -> dict:
    """Per-string non-overlapping match counts for each PII-ish pattern.
    Null strings stay null (SQL NULL propagation)."""
    return {f"n_{name}": pc.count_substring_regex(arr, pat).cast(pa.int64())
            for name, pat in PII_PATTERNS}


# ---------------------------------------------------------------------------
# repetition-quality signals (Gopher-style duplicate-token fractions)


def repetition_features(ids: pa.Array, arr: pa.Array,
                        ndigits: int = 4) -> pa.Table:
    """Per-document word-repetition signals over whitespace tokens:
    ``n_words``, ``dup_word_bp = floor(10^d·(1 − distinct/words))`` and
    ``top_word_bp = floor(10^d·max_count/words)`` — the duplicate-line /
    top-n-gram fraction family of quality filters, at word granularity
    (the synthetic corpus has no newlines). Zero-token docs (empty or
    null text) report 0 for all three, keeping one output row per input
    row like the SQL ``LEFT JOIN``-against-unnest oracle.

    Vectorized: one split → flat (row, token) frame → two pandas groupbys
    (value_counts per (row, token), then per-row sum/size/max); no Python
    loop over rows or tokens.
    """
    import pandas as pd
    toks = pc.split_pattern(arr, " ")
    par = pc.list_parent_indices(toks)
    flat = pc.list_flatten(toks)
    keep = pc.not_equal(flat, "")
    df = pd.DataFrame({"row": par.to_numpy(zero_copy_only=False)[
                           keep.to_numpy(zero_copy_only=False)],
                       "tok": flat.filter(keep).to_pandas()})
    n = len(arr)
    n_words = np.zeros(n, dtype=np.int64)
    dup_bp = np.zeros(n, dtype=np.int64)
    top_bp = np.zeros(n, dtype=np.int64)
    if len(df):
        vc = df.groupby(["row", "tok"], sort=False).size()
        per = vc.groupby(level="row", sort=False).agg(["sum", "size", "max"])
        rix = per.index.to_numpy()
        tot = per["sum"].to_numpy(dtype=np.float64)
        scale = float(10 ** ndigits)
        n_words[rix] = per["sum"].to_numpy()
        dup_bp[rix] = np.floor(
            scale * (1.0 - per["size"].to_numpy() / tot)).astype(np.int64)
        top_bp[rix] = np.floor(
            scale * per["max"].to_numpy() / tot).astype(np.int64)
    return pa.table({"doc_id": ids, "n_words": pa.array(n_words),
                     "dup_word_bp": pa.array(dup_bp),
                     "top_word_bp": pa.array(top_bp)})
