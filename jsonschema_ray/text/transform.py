"""Text transformation stages for LLM-pipeline cleaning: term counting,
normalization (stopword removal), and char-window chunking.

All three are pure ``map_batches`` transforms built on pyarrow.compute
string kernels (RE2 — the same regex engine DuckDB uses, so the SQL
oracles match bit-for-bit). Per-batch partial aggregation keeps the only
shuffle (term counting) down to one row per (term, batch).

Reference parity note: the reference engine (altshiftab/jsonschema) has
no text-cleaning surface; these stages are part of the
large-scale-training-data extension mandated alongside SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _combine(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


# ---------------------------------------------------------------------------
# distributed term frequency (wordcount with per-batch combining)


def _term_partials(batch: pa.Table, *, text_col: str) -> pa.Table:
    toks = pc.list_flatten(pc.split_pattern(_combine(batch[text_col]), " "))
    toks = toks.filter(pc.not_equal(toks, ""))
    out = pa.table({"term": toks}).group_by(["term"]).aggregate(
        [([], "count_all")])
    return out.rename_columns(["term", "n_part"])


def _key_local_topk(batch: pa.Table, *, keys: list[str], k: int) -> pa.Table:
    df = batch.to_pandas().sort_values(
        ["n", *keys], ascending=[False] + [True] * len(keys),
        kind="mergesort").head(k)
    return pa.Table.from_pandas(df, preserve_index=False)


def _grouped_topk(counts, keys: list[str], k: int):
    """Driver-side top-k over a grouped-counts Dataset ``(*keys, n)``:
    per-block local top-k (each key's total lives in exactly one block
    after the groupby) then an O(blocks × k) merge — the full key set is
    never driver-resident. Total order (n desc, *keys asc) so the tied
    band at the cut is deterministic. An EMPTY vocabulary (no rows
    anywhere — Ray drops the schema of an all-empty pipeline, so the
    collected frame is column-less) returns a typed empty frame instead
    of a sort_values KeyError."""
    import functools

    import pandas as pd
    survivors = counts.map_batches(
        functools.partial(_key_local_topk, keys=keys, k=k),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if not len(survivors):
        return pd.DataFrame({**{c: pd.Series([], dtype=object)
                                for c in keys},
                             "n": pd.Series([], dtype="int64")})
    df = survivors.sort_values(["n", *keys],
                               ascending=[False] + [True] * len(keys),
                               kind="mergesort").head(k)
    return df.reset_index(drop=True)


def term_frequency(ds, text_col: str = "text", top_n: int | None = None):
    """Global whitespace-token counts. Each batch emits one partial row
    per distinct term (the classic combiner), so the groupby shuffles
    vocabulary-sized partials, never the token stream. ``top_n`` computes
    per-block local top-k over the grouped counts (each term's total
    lives in exactly one block after the groupby) and merges the
    O(blocks × k) survivors on the driver — the full vocabulary is never
    driver-resident."""
    from ray.data.aggregate import Sum
    import functools

    partials = ds.select_columns([text_col]).map_batches(
        functools.partial(_term_partials, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    counts = partials.groupby("term").aggregate(Sum("n_part", alias_name="n"))
    if top_n is None:
        return counts
    return _grouped_topk(counts, ["term"], top_n)


# ---------------------------------------------------------------------------
# normalization: stopword removal + whitespace collapse


def normalize_text(ds, text_col: str = "text", out_col: str = "clean_text",
                   stopwords: tuple = ("a", "an", "the"),
                   keep_cols: tuple = ()):
    r"""Remove whole-token stopwords and collapse runs of spaces.

    Vectorized as two RE2 ``replace_substring_regex`` passes
    (``\ba\b|\ban\b|\bthe\b`` → '' then ``' +'`` → ' ') plus a trim;
    DuckDB's ``regexp_replace(..., 'g')`` is the exact oracle because
    both engines are RE2. Stopwords are regex-escaped; RE2 has no
    lookarounds, so each alternative gets a ``\b`` anchor only on the
    side whose edge char IS a word char (``\b`` next to a non-word edge
    like ``c++`` would *require* an adjacent word char — the opposite of
    a token boundary)."""
    import re

    def _alt(w: str) -> str:
        word = "0123456789_abcdefghijklmnopqrstuvwxyz" \
               "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
        lead = r"\b" if w and w[0] in word else ""
        trail = r"\b" if w and w[-1] in word else ""
        return lead + re.escape(w) + trail

    pat = "(" + "|".join(_alt(w) for w in stopwords) + ")"
    cols = list(keep_cols)

    def fn(b: pa.Table) -> pa.Table:
        col = _combine(b[text_col])
        col = pc.replace_substring_regex(col, pattern=pat, replacement="")
        col = pc.replace_substring_regex(col, pattern=" +", replacement=" ")
        col = pc.utf8_trim_whitespace(col)
        out = {c: b[c] for c in cols}
        out[out_col] = col
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# char-window chunking with overlap


def n_chunks_for(lengths: np.ndarray, window: int, stride: int) -> np.ndarray:
    """1 chunk for len<=window (including empty), then one more per
    stride: 1 + ceil((len-window)/stride)."""
    extra = np.maximum(lengths - window, 0)
    return 1 + np.ceil(extra / stride).astype(np.int64)


def _chunk_batch(batch: pa.Table, *, id_col: str, text_col: str,
                 window: int, stride: int) -> pa.Table:
    col = _combine(batch[text_col])
    ids = _combine(batch[id_col])
    # null text → length NaN; treat as 0 so the row still emits ONE chunk
    # (a null chunk, since slicing a null string yields null) — matching
    # the SQL oracle, where substring(NULL,…) is NULL but the row exists
    lens = np.nan_to_num(
        pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(
            np.float64), nan=0.0).astype(np.int64)
    nch = n_chunks_for(lens, window, stride)
    parts_id, parts_j, parts_c = [], [], []
    # level-wise slicing: pass j selects the rows with > j chunks and takes
    # ONE vectorized codepoint slice per level — no per-row Python work;
    # the number of levels is bounded by (max_len/stride), not row count
    j = 0
    alive = np.arange(len(lens))
    while True:
        alive = alive[nch[alive] > j]
        if len(alive) == 0:
            break
        idx = pa.array(alive)
        sl = pc.utf8_slice_codeunits(col.take(idx), start=j * stride,
                                     stop=j * stride + window)
        parts_id.append(ids.take(idx))
        parts_j.append(pa.array(np.full(len(alive), j, dtype=np.int64)))
        parts_c.append(sl)
        j += 1
    if not parts_id:
        return pa.table({id_col: pa.array([], type=ids.type),
                         "chunk_id": pa.array([], type=pa.int64()),
                         "chunk": pa.array([], type=pa.string())})
    return pa.table({id_col: pa.concat_arrays(parts_id),
                     "chunk_id": pa.concat_arrays(parts_j),
                     "chunk": pa.concat_arrays(
                         [c.cast(pa.string()) for c in parts_c])})


def chunk_text(ds, id_col: str = "doc_id", text_col: str = "text",
               window: int = 200, stride: int = 150):
    """Explode each document into overlapping char-window chunks
    (start = chunk_id*stride, length = window, codepoint indexing — the
    semantics of SQL ``substring``). Streaming: each batch fans out
    independently; no shuffle."""
    import functools

    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_chunk_batch, id_col=id_col, text_col=text_col,
                          window=window, stride=stride),
        batch_format="pyarrow", zero_copy_batch=True)

# ---------------------------------------------------------------------------
# TF-IDF: per-(doc, term) weights with a distributed document-frequency join


def _tf_partials(batch: pa.Table, *, id_col: str, text_col: str) -> pa.Table:
    """(doc, term) → term frequency, exact per batch: a document lives in
    exactly one row, so per-batch grouping is per-document grouping."""
    toks = pc.split_pattern(_combine(batch[text_col]), " ")
    par = pc.list_parent_indices(toks)
    # pin the term type: Ray block ops sometimes promote string →
    # large_string per block, and mixed block schemas break the
    # broadcast-join concat downstream
    t = pa.table({id_col: _combine(batch[id_col]).take(par),
                  "term": pc.cast(pc.list_flatten(toks), pa.string())})
    t = t.filter(pc.not_equal(t["term"], ""))
    tf = t.group_by([id_col, "term"]).aggregate([([], "count_all")])
    return tf.rename_columns([id_col, "term", "tf"])


def tfidf(ds, n_docs: int, id_col: str = "doc_id", text_col: str = "text",
          ndigits: int = 4):
    """Per-(document, term) TF-IDF over whitespace tokens.

    Plan: per-batch exact (doc, term, tf) partials (no shuffle — a doc is
    one row), document frequency via ``groupby(term).count()`` over those
    partials (each (doc, term) exists exactly once globally), then a
    size-chosen equi-join of the streaming tf table against the
    vocabulary-sized df table — broadcast under the cap, partitioned
    shuffle join above it. The token stream itself never shuffles.

    Score = ``floor(10^ndigits · tf · ln(n_docs / df))`` as an int64
    ("basis points"), reproducible bit-for-bit in SQL (both engines use
    libm ``log``); ``n_docs`` is passed in (parquet row-count metadata —
    don't re-scan to count).
    """
    import functools

    from ..joins import equi_join
    tf = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_tf_partials, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count
    df = tf.groupby("term").aggregate(Count(alias_name="df"))
    joined = equi_join(tf, df, on="term")
    scale = 10 ** ndigits

    def score(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = b["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.floor(scale * tfv * np.log(n_docs / dfv)).astype(np.int64)
        return pa.table({id_col: b[id_col], "term": b["term"],
                         "tf": b["tf"],
                         "tfidf_bp": pa.array(w)})

    return joined.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True)


def unigram_logprob(ds, id_col: str = "doc_id", text_col: str = "text",
                    ndigits: int = 4):
    """Per-document mean unigram log-probability under the corpus's OWN
    unigram LM (the CCNet-style quality score): p(term) =
    count(term)/total over the whole corpus, score =
    ``floor(10^ndigits · Σ tf·ln p / Σ tf)`` as int64 basis points
    (SQL-reproducible — both engines use libm ``log``). Docs with zero
    tokens have no defined mean and drop out, matching the SQL oracle.

    Plan (token stream never shuffles): per-batch exact (doc, term, tf)
    partials (a doc is one row, so partials are globally exact), corpus
    term counts via groupby(term).sum over those partials
    (vocabulary-sized, MATERIALIZED once so the total-token scalar is a
    metadata sum, not a third token pass), a size-chosen equi-join of
    the tf stream against the counts (broadcast under the cap), then a
    per-(doc, batch) combiner before the doc-sized grouped sum. Like
    tfidf above, the tf map itself runs twice (once feeding the counts,
    once feeding the join) — the cheap stateless pass, never a shuffle.
    """
    import functools

    from ray.data.aggregate import Sum

    from ..joins import equi_join
    tf = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_tf_partials, id_col=id_col, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    counts = tf.groupby("term").aggregate(Sum("tf", alias_name="c")) \
        .materialize()
    total = float(counts.sum("c") or 0.0)
    if total == 0.0:
        import ray.data as rd
        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "n_tokens": pa.array([], type=pa.int64()),
            "logprob_bp": pa.array([], type=pa.int64())}))
    joined = equi_join(tf, counts, on="term")

    def doc_partials(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        cv = b["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({id_col: _combine(b[id_col]),
                      "w": pa.array(tfv * np.log(cv / total)),
                      "n": _combine(b["tf"])})
        g = t.group_by([id_col]).aggregate([("w", "sum"), ("n", "sum")])
        # select by NAME: pyarrow group_by key/aggregate column order
        # differs across versions
        return g.select([id_col, "w_sum", "n_sum"])

    parts = joined.map_batches(doc_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = parts.groupby(id_col).aggregate(
        Sum("w_sum", alias_name="w"), Sum("n_sum", alias_name="n"))
    scale = 10 ** ndigits

    def finish(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: _combine(b[id_col]),
            "n_tokens": pa.array(n.astype(np.int64)),
            "logprob_bp": pa.array(
                np.floor(scale * w / n.astype(np.float64))
                .astype(np.int64)),
        })

    # stays a streaming Dataset: the per-doc result is corpus-sized at
    # 10^12 docs — never driver-resident here (callers collect if small)
    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


# ---------------------------------------------------------------------------
# bigram (collocation) counts


def _bigram_partials(batch: pa.Table, *, text_col: str) -> pa.Table:
    """One partial row per distinct ADJACENT token pair in the batch.

    Pairing is fully vectorized: token lists flatten once; a boolean
    mask drops each document's LAST token (no successor), and the pair
    (w1, w2) = (flat[i], flat[i+1]) materializes via two takes. Empty
    tokens (doubled spaces) are excluded AFTER pairing so they don't
    create false adjacencies across themselves, matching the SQL
    oracle's lead()-then-filter order."""
    col = _combine(batch[text_col])
    if col.null_count:
        col = col.drop_null()          # a null text contributes no pairs
    toks = pc.split_pattern(col, " ")
    flat = pc.list_flatten(toks)
    n = len(flat)
    empty = pa.table({"w1": pa.array([], type=pa.string()),
                      "w2": pa.array([], type=pa.string()),
                      "n_part": pa.array([], type=pa.int64())})
    if n < 2:
        return empty
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ends = np.cumsum(lens)
    keep = np.ones(n, dtype=bool)
    # each doc's last token starts no pair; ends==0 (leading empty docs)
    # must not index -1 and clear the global last element
    keep[ends[ends > 0] - 1] = False
    idx = np.nonzero(keep)[0]
    if not len(idx):
        return empty
    w1 = flat.take(pa.array(idx, type=pa.int64()))
    w2 = flat.take(pa.array(idx + 1, type=pa.int64()))
    m = pc.and_(pc.not_equal(w1, ""), pc.not_equal(w2, ""))
    t = pa.table({"w1": w1.filter(m), "w2": w2.filter(m)})
    if not t.num_rows:
        return empty
    g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
    return g.rename_columns(["w1", "w2", "n_part"])


def bigram_counts(ds, text_col: str = "text", top_n: int | None = None):
    """Global adjacent-pair (bigram/collocation) counts — the phrase
    statistic a tokenizer-merge or collocation filter consumes. Same
    combiner shape as ``term_frequency``: each batch emits one partial
    row per distinct pair, so the groupby shuffles pair-vocabulary-sized
    partials, never the token stream. ``top_n`` merges per-block local
    top-k survivors on the driver (ties broken by (n desc, w1, w2) —
    a total order, so the cut is deterministic)."""
    import functools

    from ray.data.aggregate import Sum

    partials = ds.select_columns([text_col]).map_batches(
        functools.partial(_bigram_partials, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    counts = partials.groupby(["w1", "w2"]) \
        .aggregate(Sum("n_part", alias_name="n"))
    if top_n is None:
        return counts
    return _grouped_topk(counts, ["w1", "w2"], top_n)


def pmi_bigrams(ds, text_col: str = "text", top_n: int = 50,
                min_n: int = 5):
    """Pointwise mutual information over adjacent token pairs — the
    collocation statistic (Church-Hanks) a tokenizer-merge or phrase
    detector ranks by: ``pmi = log2(p(x,y) / (p(x)·p(y)))`` with
    p(x,y) from the bigram table and p(x) from the unigram table (the
    SAME split-on-space tokenization; empties excluded — bigram oracle
    conventions). Both count tables are vocabulary-sized combiner
    aggregates, MATERIALIZED once (each feeds a total, a filter and a
    join — re-running the corpus scan per consumer is the index-writer
    sin); the pair table prunes to ``n >= min_n`` BEFORE the two
    size-chosen equi-joins attach the unigram counts (unigram side
    broadcasts under the cap), and selection is the per-block partial
    top-k — the pair vocabulary is never driver-resident. The pmi
    expression evaluates in the exact SQL operand order on float64
    with util.duckdb_round(…, 6) BEFORE ranking, so the tied band at
    the cut is deterministic cross-engine ((pmi DESC, w1, w2) total
    order)."""
    import functools

    import pandas as pd
    from ray.data.aggregate import Sum

    from ..joins import equi_join
    from ..util import duckdb_round

    def counts(partial_fn, keys, names):
        p = ds.select_columns([text_col]).map_batches(
            functools.partial(partial_fn, text_col=text_col),
            batch_format="pyarrow", zero_copy_batch=True)
        return p.groupby(keys).aggregate(
            Sum("n_part", alias_name=names)).materialize()

    bi = counts(_bigram_partials, ["w1", "w2"], "n")
    uni = counts(_term_partials, "term", "n")
    empty = pd.DataFrame({"w1": pd.Series([], dtype="object"),
                          "w2": pd.Series([], dtype="object"),
                          "n": pd.Series([], dtype="int64"),
                          "pmi": pd.Series([], dtype="float64")})
    nb = bi.sum("n") if bi.count() else 0
    nt = uni.sum("n") if uni.count() else 0
    if not nb or not nt:
        return empty

    def rename(side, cname):
        return uni.map_batches(
            lambda b, s=side, c=cname: pa.table(
                {s: b["term"], c: b["n"]}),
            batch_format="pyarrow", zero_copy_batch=True)

    filt = bi.filter(expr=f"n >= {min_n}")
    j = equi_join(filt, rename("w1", "cx"), on="w1")
    j = equi_join(j, rename("w2", "cy"), on="w2")

    def score(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = b["cx"].to_numpy(zero_copy_only=False).astype(np.float64)
        cy = b["cy"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = duckdb_round(
            np.log2((n / nb) / ((cx / nt) * (cy / nt))), 6)
        return pa.table({"w1": b["w1"], "w2": b["w2"], "n": b["n"],
                         "pmi": pa.array(pmi)})

    from ..util import partial_topk
    out = partial_topk(
        j.map_batches(score, batch_format="pyarrow",
                      zero_copy_batch=True),
        ["pmi", "w1", "w2"], [False, True, True], top_n)
    if out is None:
        return empty
    out["n"] = out["n"].astype("int64")
    return out[["w1", "w2", "n", "pmi"]]


# ---------------------------------------------------------------------------
# bigram language-model document scoring


def _doc_bigram_partials(batch: pa.Table, *, id_col: str,
                         text_col: str) -> pa.Table:
    """(doc, w1, w2) → pair frequency, exact per batch (a document
    lives in exactly one row). Same vectorized pairing as
    ``_bigram_partials`` — flatten once, drop each row's last token,
    two takes — with the document id attached via the pair's FIRST
    token's parent index; empty tokens are excluded AFTER pairing
    (lead()-then-filter — a doubled space breaks adjacency, it does
    not bridge it). Null texts contribute no pairs; null doc ids are
    kept and group (SQL GROUP BY semantics)."""
    t = batch.select([id_col, text_col])
    tc = _combine(t[text_col])
    if tc.null_count:
        t = t.filter(tc.is_valid())
    toks = pc.split_pattern(_combine(t[text_col]), " ")
    flat = pc.cast(pc.list_flatten(toks), pa.string())
    n = len(flat)
    id_type = t.schema.field(id_col).type
    empty = pa.table({id_col: pa.array([], type=id_type),
                      "w1": pa.array([], type=pa.string()),
                      "w2": pa.array([], type=pa.string()),
                      "tf": pa.array([], type=pa.int64())})
    if n < 2:
        return empty
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ends = np.cumsum(lens)
    keep = np.ones(n, dtype=bool)
    keep[ends[ends > 0] - 1] = False
    idx = np.nonzero(keep)[0]
    if not len(idx):
        return empty
    par = pc.list_parent_indices(toks)
    ia = pa.array(idx, type=pa.int64())
    w1 = flat.take(ia)
    w2 = flat.take(pa.array(idx + 1, type=pa.int64()))
    doc = _combine(t[id_col]).take(par.take(ia))
    m = pc.and_(pc.not_equal(w1, ""), pc.not_equal(w2, ""))
    out = pa.table({id_col: doc.filter(m), "w1": w1.filter(m),
                    "w2": w2.filter(m)})
    if not out.num_rows:
        return empty
    g = out.group_by([id_col, "w1", "w2"], use_threads=False) \
        .aggregate([([], "count_all")])
    return g.rename_columns([id_col, "w1", "w2", "tf"])


def bigram_logprob(ds, id_col: str = "doc_id", text_col: str = "text",
                   ndigits: int = 4):
    """Per-document mean bigram conditional log-probability under the
    corpus's OWN add-one-smoothed bigram LM — the perplexity-style
    fluency score (a KenLM-filter analog computable without external
    model weights): ``p(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V)`` with V =
    the distinct-successor vocabulary, score =
    ``floor(10^ndigits · Σ tf·ln p / Σ tf)`` as int64 basis points
    (both engines use libm ``log``; the tf-grouped form keeps the
    multiply-vs-repeated-add float question out of scope — both sides
    compute tf·ln(p) per DISTINCT doc-pair). Docs with < 2 tokens
    have no bigrams and drop out, matching the SQL oracle.

    Plan (token stream never shuffles): per-batch exact
    (doc, w1, w2, tf) partials; the pair-vocabulary-sized corpus count
    table via groupby(w1, w2).sum, MATERIALIZED once (it feeds the
    context-count aggregate, the V distinct-successor count AND the
    scoring join — re-running the corpus scan per consumer is the
    index-writer sin); context counts c(w1,·) derive from the pair
    table (vocabulary-sized aggregate, never a second corpus pass);
    two size-chosen equi-joins attach (c, cx) to the streaming tf
    table (vocabulary sides broadcast under the cap); per-(doc, batch)
    combiner partials before the doc-sized grouped sum."""
    import functools

    from ray.data.aggregate import Sum

    from ..joins import equi_join
    tf = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_doc_bigram_partials, id_col=id_col,
                          text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    bi = tf.groupby(["w1", "w2"]).aggregate(Sum("tf", alias_name="c")) \
        .materialize()
    if not bi.count():
        import ray.data as rd
        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=id_type),
            "n_bigrams": pa.array([], type=pa.int64()),
            "logprob_bp": pa.array([], type=pa.int64())}))
    from ray.data.aggregate import Count
    ctx = bi.groupby("w1").aggregate(Sum("c", alias_name="cx"))
    vocab = float(bi.groupby("w2").aggregate(Count()).count())
    joined = equi_join(equi_join(tf, bi, on=["w1", "w2"]), ctx, on="w1")

    def doc_partials(b: pa.Table) -> pa.Table:
        tfv = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        cv = b["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        cxv = b["cx"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({id_col: _combine(b[id_col]),
                      "w": pa.array(tfv * np.log((cv + 1.0)
                                                 / (cxv + vocab))),
                      "n": _combine(b["tf"])})
        g = t.group_by([id_col]).aggregate([("w", "sum"), ("n", "sum")])
        return g.select([id_col, "w_sum", "n_sum"])

    parts = joined.map_batches(doc_partials, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = parts.groupby(id_col).aggregate(
        Sum("w_sum", alias_name="w"), Sum("n_sum", alias_name="n"))
    scale = 10 ** ndigits

    def finish(b: pa.Table) -> pa.Table:
        w = b["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        n = b["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: _combine(b[id_col]),
            "n_bigrams": pa.array(n.astype(np.int64)),
            "logprob_bp": pa.array(
                np.floor(scale * w / n.astype(np.float64))
                .astype(np.int64)),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)
