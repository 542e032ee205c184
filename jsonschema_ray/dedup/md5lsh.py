"""MD5-keyed minhash / banded LSH / simhash with bit-exact SQL parity.

The repo's production near-dup family (dedup/minhash.py, simhash.py —
reference semantics per altshiftab/jsonschema's duplicate-detection
checks) keys on the internal vectorized hash64, which no SQL engine can
reproduce, so those queries are rows-only in the driver's correctness
gate. This module re-keys the SAME pipeline shapes on MD5 — DuckDB
exposes ``md5_number`` (little-endian signed INT128 of the digest,
pinned by test_session13_ops) — making every stage value-reproducible
in ANSI SQL: token hash, permuted minhash signatures, banded LSH
candidate pairs, and the ±1-bit-sum simhash all gain full oracles.

Arithmetic contract (shared by the numpy and SQL sides):
- token hash  h = low 64 bits of md5(token), i.e. the first 8 digest
  bytes little-endian. SQL: ``((md5_number(t) % 2^64) + 2^64) % 2^64``
  (DuckDB ``%`` keeps the dividend's sign; the add-and-remod lifts the
  signed HUGEINT remainder into [0, 2^64)).
- permutation k: ``sig_k = min over tokens of (A_k*h + B_k) mod 2^64``.
  numpy uint64 multiply/add wrap IS mod 2^64; on the SQL side A_k < 2^62
  keeps ``A_k*h < 2^126`` inside HUGEINT before the explicit ``% 2^64``.
- band hash: ``bh = (sum over the band's k of W_k*sig_k) mod 2^64`` —
  an ORDER-INSENSITIVE combine (a fold would need a defined k-order
  inside a SQL aggregate; a weighted wrap-sum doesn't).
- simhash bit b: set iff ``2*ones_b > n_tokens`` (strict; the tie and
  the zero-token doc fall to 0/absent on both engines).

Tokens are ``string_split(text, ' ')`` with empty strings dropped —
the repo's bigram_counts oracle convention. Minhash hashes the SET of
3-token SHINGLES (word 3-grams): the synthetic corpus shares so much
vocabulary that unigram bands collapse (62k candidate pairs from 500
docs, measured) while 3-gram shingles keep LSH selective (28) — the
same reason the production minhash shingles. Shingling is strictly
WITHIN a source row (adjacency is a row property); the SQL side pins
this with ``row_number() OVER ()`` — an arbitrary but DISTINCT rid
whose only job is keeping lead() from pairing across rows. Simhash
reads the unigram token MULTISET (occurrences weight the bit sums).
Rows sharing a doc_id (and ALL null-id rows as ONE group) merge their
shingle sets / token multisets before signatures or banding — min
distributes over set union and the bit sums are additive, so per-ROW
partials merge exactly in one doc_id-hash partition pass (the
ttr_documents GROUP-BY-identity convention).

Scale shape: the token stream never shuffles — each batch reduces to
one wide partial row per input row (k uint64 sigs, or 64 bit counts);
ONE doc-hash partition merges duplicates; banding emits 4 narrow rows
per doc; pair expansion runs inside a (band, bh)-hash partition via
the vectorized segment_pairs, followed by the distributed
distinct_pairs dedup. Nothing corpus-proportional lands on the driver.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..util import partitioned_group_apply

K64 = 1 << 64
N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS

# Deterministic constants, < 2^62 so every SQL-side product fits
# HUGEINT (see module docstring). A and W must be odd (full-period
# multipliers mod 2^64).
A = tuple(((0x1000193 + 2 * k) * 0x61C88647) % (1 << 62) | 1
          for k in range(N_PERM))
B = tuple(((0x12345 + k) * 0x9E3779B1) % (1 << 62)
          for k in range(N_PERM))
W = tuple(((0xABCDE + 2 * k) * 0x85EBCA77) % (1 << 62) | 1
          for k in range(N_PERM))

_A = np.array(A, dtype=np.uint64)[:, None]
_B = np.array(B, dtype=np.uint64)[:, None]
_W = np.array(W, dtype=np.uint64)


def md5_low64(token: str) -> int:
    """Low 64 bits of md5(token) == DuckDB
    ``((md5_number(t) % 2^64) + 2^64) % 2^64``."""
    return int.from_bytes(
        hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


SHINGLE = 3


def _row_token_hashes(texts, memo: dict, shingle: int = 1):
    """Per row: uint64 hash array of the row's token MULTISET
    (``shingle=1``) or its word-``shingle``-gram multiset (None for
    null/blank/too-short rows). ``memo`` caches md5 per distinct
    token/shingle within the batch — they repeat heavily across
    documents."""
    out = []
    for txt in texts:
        if txt is None:
            out.append(None)
            continue
        toks = [t for t in txt.split(" ") if t]
        if shingle > 1:
            toks = [" ".join(toks[i:i + shingle])
                    for i in range(len(toks) - shingle + 1)]
        if not toks:
            out.append(None)
            continue
        hs = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            v = memo.get(t)
            if v is None:
                v = np.uint64(md5_low64(t))
                memo[t] = v
            hs[i] = v
        out.append(hs)
    return out


_SIG_COLS = [f"sig_{k}" for k in range(N_PERM)]


def _sig_partials(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """One wide partial row per input row that HAS at least one
    3-token shingle: (id, sig_0..sig_{K-1})."""
    memo: dict = {}
    rows = _row_token_hashes(b.column(text_col).to_pylist(), memo,
                             shingle=SHINGLE)
    keep, sigs = [], []
    for i, hs in enumerate(rows):
        if hs is None:
            continue
        keep.append(i)
        hu = np.unique(hs)  # SET semantics: min is dedup-invariant
        sigs.append((_A * hu[None, :] + _B).min(axis=1))
    ids = b.column(id_col).take(pa.array(keep, type=pa.int64()))
    mat = (np.vstack(sigs) if sigs
           else np.empty((0, N_PERM), dtype=np.uint64))
    cols = {id_col: ids}
    for k in range(N_PERM):
        cols[_SIG_COLS[k]] = pa.array(mat[:, k], type=pa.uint64())
    return pa.table(cols)


def _merged_sigs(t: pa.Table, id_col: str) -> pa.Table:
    """Within one doc-hash partition: merge duplicate ids (all
    null-id rows form ONE group, like SQL GROUP BY) via per-column
    min."""
    g = t.group_by([id_col]).aggregate(
        [(c, "min") for c in _SIG_COLS])
    return g.rename_columns([id_col] + _SIG_COLS)


def minhash_signatures_md5(ds, id_col: str = "doc_id",
                           text_col: str = "text"):
    """(id, k, sig) Dataset — K=16 MD5-permuted minhash signatures per
    merged document identity, long format to match the SQL oracle's
    unnest shape. Docs with no tokens are absent (SQL: unnest of an
    empty token list yields no rows)."""
    partials = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _sig_partials(b, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        m = _merged_sigs(t, id_col)
        n = m.num_rows
        ids = m.column(id_col)
        sig = np.empty((n, N_PERM), dtype=np.uint64)
        for k in range(N_PERM):
            sig[:, k] = m.column(_SIG_COLS[k]).to_numpy(
                zero_copy_only=False)
        return pa.table({
            id_col: ids.take(pa.array(
                np.repeat(np.arange(n, dtype=np.int64), N_PERM))),
            "k": pa.array(np.tile(np.arange(N_PERM, dtype=np.int64),
                                  n)),
            "sig": pa.array(sig.reshape(-1), type=pa.uint64())})

    return partitioned_group_apply(partials, [id_col], finish,
                                   batch_format="pyarrow")


def _band_rows(m: pa.Table, id_col: str) -> pa.Table:
    """Merged wide sigs → (id, band, bh) long rows, null ids DROPPED
    (a NULL id can never satisfy the pair oracle's ``a < b``; removing
    it here keeps the pair partition free of rows that cannot pair)."""
    ids = m.column(id_col)
    if ids.null_count:
        mask = pa.compute.is_valid(ids)
        m = m.filter(mask)
        ids = m.column(id_col)
    n = m.num_rows
    sig = np.empty((n, N_PERM), dtype=np.uint64)
    for k in range(N_PERM):
        sig[:, k] = m.column(_SIG_COLS[k]).to_numpy(
            zero_copy_only=False)
    wsig = sig * _W[None, :]  # uint64 wrap == mod 2^64
    bh = wsig.reshape(n, N_BANDS, ROWS_PER_BAND).sum(
        axis=2, dtype=np.uint64)
    return pa.table({
        id_col: ids.take(pa.array(
            np.repeat(np.arange(n, dtype=np.int64), N_BANDS))),
        "band": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64),
                                 n)),
        "bh": pa.array(bh.reshape(-1), type=pa.uint64())})


def minhash_band_pairs_md5(ds, id_col: str = "doc_id",
                           text_col: str = "text",
                           bucket_cap: int = 10000):
    """(id_a, id_b) DISTINCT candidate pairs sharing at least one of
    the 4 LSH bands (id_a < id_b) — the fully-oracled MD5 variant of
    the production minhash candidate generation. ``bucket_cap``
    truncates pathological single-bucket blowups exactly like the
    production path (segment_pairs' hot-bucket guard); the oracle SFs
    sit far below it."""
    partials = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _sig_partials(b, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    bands = partitioned_group_apply(
        partials, [id_col],
        lambda t: _band_rows(_merged_sigs(t, id_col), id_col),
        batch_format="pyarrow")

    def pairs_in_partition(t: pa.Table) -> pa.Table:
        from ..util import segment_pairs
        band = t.column("band").to_numpy(zero_copy_only=False)
        bh = t.column("bh").to_numpy(zero_copy_only=False)
        a_idx, b_idx, order = segment_pairs([band, bh], bucket_cap)
        ids = t.column(id_col).take(pa.array(order))
        lo = np.minimum(a_idx, b_idx)
        hi = np.maximum(a_idx, b_idx)
        # order ids within the pair by VALUE, not sort position
        ia = ids.take(pa.array(lo)).to_numpy(zero_copy_only=False)
        ib = ids.take(pa.array(hi)).to_numpy(zero_copy_only=False)
        sw = ia > ib
        ia2 = np.where(sw, ib, ia)
        ib2 = np.where(sw, ia, ib)
        return pa.table({"id_a": pa.array(ia2, type=pa.int64()),
                         "id_b": pa.array(ib2, type=pa.int64())})

    from .pairsops import distinct_pairs
    raw = partitioned_group_apply(bands, ["band", "bh"],
                                  pairs_in_partition,
                                  batch_format="pyarrow")
    return _pin_pairs_schema(distinct_pairs(raw, ["id_a", "id_b"]))


_ONE_COLS = [f"ones_{b}" for b in range(64)]


def _sim_partials(b: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """One wide partial per tokenful row: (id, n, ones_0..ones_63) —
    MULTISET bit counts (occurrences weight simhash)."""
    memo: dict = {}
    rows = _row_token_hashes(b.column(text_col).to_pylist(), memo)
    keep, ns, ones = [], [], []
    for i, hs in enumerate(rows):
        if hs is None:
            continue
        keep.append(i)
        ns.append(len(hs))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1))
        ones.append(bits.sum(axis=0, dtype=np.int64))
    ids = b.column(id_col).take(pa.array(keep, type=pa.int64()))
    mat = (np.vstack(ones) if ones
           else np.empty((0, 64), dtype=np.int64))
    cols = {id_col: ids,
            "n": pa.array(np.array(ns, dtype=np.int64))}
    for j in range(64):
        cols[_ONE_COLS[j]] = pa.array(mat[:, j])
    return pa.table(cols)


_EMPTY_PAIRS = pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64())})


def _pin_pairs_schema(pairs_ds):
    """An all-empty groupby/map_groups pipeline DROPS its schema (the
    known Ray trap) — union a typed empty block so an empty corpus
    still answers a Dataset whose schema() is (id_a, id_b) and whose
    iter_batches yield typed tables. (``to_pandas()`` of ANY empty
    Dataset — even a directly-typed from_arrow one — is column-less;
    that is Ray-global behavior, not recoverable here.) The pin block
    ships as a PANDAS block: distinct_pairs emits pandas blocks and a
    mixed Arrow/pandas union logs a schema-mismatch warning."""
    import ray.data as rd
    return rd.from_pandas(_EMPTY_PAIRS.to_pandas()).union(pairs_ds)


def simhash_band_pairs_md5(ds, id_col: str = "doc_id",
                           text_col: str = "text",
                           threshold: int = 3,
                           bucket_cap: int = 10000):
    """(id_a, id_b) DISTINCT near-duplicate pairs with simhash Hamming
    distance <= ``threshold`` (id_a < id_b) — the Manku-style banded
    scheme, fully oracled: a pair within Hamming 3 of a 64-bit
    signature must agree EXACTLY on at least one of the 4 16-bit bands
    (pigeonhole), so banding loses nothing at threshold <= 3; each
    band bucket expands to candidate pairs (segment_pairs, hot-bucket
    capped) and the xor-popcount verify filters exactly. Null ids are
    dropped before banding (they can never satisfy the oracle's
    ``a < b``). ``threshold`` must stay below N_BANDS: at >= 4 a pair
    can differ in one bit per band and banding would silently lose it
    — guarded, not documented-only."""
    if threshold >= N_BANDS:
        raise ValueError(
            f"threshold={threshold} breaks the {N_BANDS}-band "
            f"pigeonhole (lossless only for threshold < {N_BANDS}); "
            "raise N_BANDS or use the production simhash family")
    sims = simhash_md5(ds, id_col=id_col, text_col=text_col)

    def band_rows(t: pa.Table) -> pa.Table:
        ids = t.column(id_col)
        if ids.null_count:
            t = t.filter(pa.compute.is_valid(ids))
            ids = t.column(id_col)
        sim = t.column("simhash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        n = len(sim)
        bh = np.empty((n, N_BANDS), dtype=np.uint64)
        for b in range(N_BANDS):
            bh[:, b] = (sim >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        rep = np.repeat(np.arange(n, dtype=np.int64), N_BANDS)
        return pa.table({
            id_col: ids.take(pa.array(rep)),
            "b": pa.array(np.tile(np.arange(N_BANDS, dtype=np.int64),
                                  n)),
            "bh": pa.array(bh.reshape(-1), type=pa.uint64()),
            "simhash": pa.array(sim[rep], type=pa.uint64())})

    bands = sims.map_batches(band_rows, batch_format="pyarrow",
                             zero_copy_batch=True)

    def pairs_in_partition(t: pa.Table) -> pa.Table:
        from ..util import segment_pairs
        b = t.column("b").to_numpy(zero_copy_only=False)
        bh = t.column("bh").to_numpy(zero_copy_only=False)
        a_idx, b_idx, order = segment_pairs([b, bh], bucket_cap)
        ids = t.column(id_col).take(pa.array(order)) \
            .to_numpy(zero_copy_only=False)
        sim = t.column("simhash").take(pa.array(order)) \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        from ..checks.neardup import hamming64
        keep = hamming64(sim[a_idx], sim[b_idx]) <= threshold
        ia, ib = ids[a_idx[keep]], ids[b_idx[keep]]
        sw = ia > ib
        return pa.table({
            "id_a": pa.array(np.where(sw, ib, ia), type=pa.int64()),
            "id_b": pa.array(np.where(sw, ia, ib), type=pa.int64())})

    from .pairsops import distinct_pairs
    raw = partitioned_group_apply(bands, ["b", "bh"],
                                  pairs_in_partition,
                                  batch_format="pyarrow")
    return _pin_pairs_schema(distinct_pairs(raw, ["id_a", "id_b"]))


def simhash_md5(ds, id_col: str = "doc_id", text_col: str = "text"):
    """(id, simhash) Dataset — 64-bit simhash over MD5 token hashes,
    bit b set iff 2*ones_b > n_tokens (strict: the exact tie answers
    0, pinned against the SQL CASE). Duplicate/NULL ids merge their
    token multisets before the bit vote."""
    partials = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _sim_partials(b, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        g = t.group_by([id_col]).aggregate(
            [("n", "sum")] + [(c, "sum") for c in _ONE_COLS])
        g = g.rename_columns([id_col, "n"] + _ONE_COLS)
        n = g.column("n").to_numpy(zero_copy_only=False)
        sim = np.zeros(g.num_rows, dtype=np.uint64)
        for j in range(64):
            ones = g.column(_ONE_COLS[j]).to_numpy(
                zero_copy_only=False)
            sim |= np.where(2 * ones > n, np.uint64(1 << j),
                            np.uint64(0))
        return pa.table({id_col: g.column(id_col),
                         "simhash": pa.array(sim, type=pa.uint64())})

    return partitioned_group_apply(partials, [id_col], finish,
                                   batch_format="pyarrow")


# --- SQL oracle fragments (single source of truth for the constants) --

_K64_LIT = "18446744073709551616"


def _perm_values() -> str:
    return ", ".join(f"({k}, {A[k]}, {B[k]}, {W[k]})"
                     for k in range(N_PERM))


def _pow_values() -> str:
    return ", ".join(f"({b}, {1 << b})" for b in range(64))


def sql_token_cte(table: str = "documents", id_col: str = "doc_id",
                  text_col: str = "text") -> str:
    """Shared unigram token-hash CTE: (id, h) with h in [0, 2^64)."""
    return f"""
toks AS (
  SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS w
  FROM {table}),
tl AS (
  SELECT {id_col},
         ((md5_number(w) % {_K64_LIT}) + {_K64_LIT}) % {_K64_LIT} AS h
  FROM toks WHERE w <> '')"""


def sql_shingle_cte(table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """Shared 3-gram shingle-hash CTE: (id, h). ``rid`` is an
    arbitrary-but-distinct row number whose only job is keeping
    lead() from pairing tokens across rows — the shingle SET per id
    is rid-order-insensitive."""
    return f"""
numbered AS (
  SELECT {id_col}, {text_col}, row_number() OVER () AS rid
  FROM {table}),
rawtoks AS (
  SELECT {id_col}, rid,
         unnest(string_split({text_col}, ' ')) AS w,
         generate_subscripts(string_split({text_col}, ' '), 1) AS pos
  FROM numbered),
nz AS (SELECT {id_col}, rid, w, pos FROM rawtoks WHERE w <> ''),
sh AS (
  SELECT {id_col},
         w || ' ' || lead(w, 1) OVER win
           || ' ' || lead(w, 2) OVER win AS s,
         lead(w, 2) OVER win AS w3
  FROM nz WINDOW win AS (PARTITION BY rid ORDER BY pos)),
tl AS (
  SELECT {id_col},
         ((md5_number(s) % {_K64_LIT}) + {_K64_LIT}) % {_K64_LIT} AS h
  FROM sh WHERE w3 IS NOT NULL)"""


def sql_signatures() -> str:
    return f"""
WITH {sql_shingle_cte()},
perm(k, a, b, w) AS (VALUES {_perm_values()}),
sigs AS (
  SELECT doc_id, k, min((a * h + b) % {_K64_LIT}) AS sig
  FROM (SELECT DISTINCT doc_id, h FROM tl), perm
  GROUP BY doc_id, k)
SELECT doc_id, k, CAST(sig AS UBIGINT) AS sig
FROM sigs ORDER BY doc_id, k"""


def sql_band_pairs() -> str:
    return f"""
WITH {sql_shingle_cte()},
perm(k, a, b, w) AS (VALUES {_perm_values()}),
sigs AS (
  SELECT doc_id, k, w, min((a * h + b) % {_K64_LIT}) AS sig
  FROM (SELECT DISTINCT doc_id, h FROM tl), perm
  GROUP BY doc_id, k, w),
bands AS (
  SELECT doc_id, k // {ROWS_PER_BAND} AS band,
         sum((w * sig) % {_K64_LIT}) % {_K64_LIT} AS bh
  FROM sigs GROUP BY doc_id, k // {ROWS_PER_BAND})
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
FROM bands x JOIN bands y
  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
ORDER BY id_a, id_b"""


def _sql_simhash_core() -> str:
    return f"""
WITH {sql_token_cte()},
pows(b, p) AS (VALUES {_pow_values()}),
bits AS (
  SELECT doc_id, p,
         CASE WHEN (h % (2 * p)) >= p THEN 1 ELSE 0 END AS bit
  FROM tl, pows),
votes AS (
  SELECT doc_id, p, sum(bit) AS ones, count(*) AS n
  FROM bits GROUP BY doc_id, p)
SELECT doc_id,
       CAST(sum(CASE WHEN 2 * ones > n THEN p ELSE 0 END)
            AS UBIGINT) AS simhash
FROM votes GROUP BY doc_id"""


def sql_simhash() -> str:
    return _sql_simhash_core() + " ORDER BY doc_id"


def sql_simhash_pairs(threshold: int = 3) -> str:
    return f"""
WITH sims AS ({_sql_simhash_core()}),
sbands AS (
  SELECT doc_id, simhash, b, (simhash >> (16 * b)) & 65535 AS bh
  FROM sims, (VALUES (0), (1), (2), (3)) bb(b)
  WHERE doc_id IS NOT NULL)
SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
FROM sbands x JOIN sbands y
  ON x.b = y.b AND x.bh = y.bh AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {threshold}
ORDER BY id_a, id_b"""


def estimate_error_pairs_md5(ds, id_col: str = "doc_id",
                             text_col: str = "text"):
    """Per LSH candidate pair: minhash-ESTIMATED Jaccard (matching
    signature components / 16), the EXACT 3-gram-shingle-set Jaccard,
    and their absolute error — the sketch-calibration table that says
    how much the 16-permutation estimate can be trusted at this band
    configuration. Driver work is PAIR-bounded (the LSH's own
    selectivity, bucket_cap-guarded upstream): only the candidate
    ids' texts gather; the corpus-sized signature/banding passes are
    the unchanged distributed minhash_band_pairs_md5 machinery. A
    band-sum collision without any shared shingle (astronomically
    rare but possible — the band hash is a SUM of 4 sigs) answers
    exact_jaccard 0 on both engines (SQL LEFT JOIN + COALESCE)."""
    import ray as _ray

    import pandas as pd
    import pyarrow.compute as _pc

    from ..util import duckdb_round
    pairs = minhash_band_pairs_md5(ds, id_col=id_col,
                                   text_col=text_col).to_pandas()
    out_empty = pd.DataFrame({
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "est_jaccard": pd.Series([], dtype="float64"),
        "exact_jaccard": pd.Series([], dtype="float64"),
        "abs_err": pd.Series([], dtype="float64")})
    if pairs.empty or "id_a" not in pairs.columns:
        return out_empty
    ids = sorted(set(pairs["id_a"]) | set(pairs["id_b"]))
    idset = pa.array(ids, type=pa.int64())

    def pick(b: pa.Table) -> pa.Table:
        m = _pc.is_in(b.column(id_col), value_set=idset)
        t = b.filter(m)
        return pa.table({id_col: t.column(id_col),
                         text_col: t.column(text_col)})

    docs = ds.select_columns([id_col, text_col]).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=131072).to_pandas()
    memo: dict = {}
    sets: dict = {}
    for did, txt in zip(docs[id_col], docs[text_col]):
        hs = _row_token_hashes([txt], memo, shingle=SHINGLE)[0]
        if hs is None:
            continue
        sets.setdefault(int(did), set()).update(int(x) for x in hs)
    sig = {}
    for did, s in sets.items():
        h = np.fromiter(s, dtype=np.uint64, count=len(s))
        sig[did] = (_A * h[None, :] + _B).min(axis=1)
    rows = []
    for ia, ib in zip(pairs["id_a"], pairs["id_b"]):
        ia, ib = int(ia), int(ib)
        mt = int((sig[ia] == sig[ib]).sum())
        sa, sb = sets[ia], sets[ib]
        inter = len(sa & sb)
        est = float(duckdb_round(float(mt) / 16.0, 6))
        ex = float(duckdb_round(
            float(inter) / float(len(sa) + len(sb) - inter), 6))
        rows.append({"id_a": ia, "id_b": ib, "est_jaccard": est,
                     "exact_jaccard": ex,
                     "abs_err": float(duckdb_round(abs(est - ex), 6))})
    out = pd.DataFrame(rows).sort_values(["id_a", "id_b"]) \
        .reset_index(drop=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    for c in ("est_jaccard", "exact_jaccard", "abs_err"):
        out[c] = out[c].astype("float64")
    return out


def sql_estimate_error() -> str:
    return f"""
WITH {sql_shingle_cte()},
perm(k, a, b, w) AS (VALUES {_perm_values()}),
dl AS (SELECT DISTINCT doc_id, h FROM tl),
sigs AS (
  SELECT doc_id, k, w, min((a * h + b) % {_K64_LIT}) AS sig
  FROM dl, perm GROUP BY doc_id, k, w),
bands AS (
  SELECT doc_id, k // {ROWS_PER_BAND} AS band,
         sum((w * sig) % {_K64_LIT}) % {_K64_LIT} AS bh
  FROM sigs GROUP BY doc_id, k // {ROWS_PER_BAND}),
cand AS (
  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
m AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS mt
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.id_a
  JOIN sigs sb ON sb.doc_id = c.id_b AND sb.k = sa.k
  GROUP BY c.id_a, c.id_b),
iv AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN dl a ON a.doc_id = c.id_a
  JOIN dl b ON b.doc_id = c.id_b AND b.h = a.h
  GROUP BY c.id_a, c.id_b),
sz AS (SELECT doc_id, count(*) AS n FROM dl GROUP BY doc_id)
SELECT m.id_a, m.id_b,
       round(CAST(m.mt AS DOUBLE) / 16.0, 6) AS est_jaccard,
       round(CAST(COALESCE(iv.inter, 0) AS DOUBLE)
             / CAST(sa.n + sb.n - COALESCE(iv.inter, 0) AS DOUBLE),
             6) AS exact_jaccard,
       round(abs(round(CAST(m.mt AS DOUBLE) / 16.0, 6)
                 - round(CAST(COALESCE(iv.inter, 0) AS DOUBLE)
                         / CAST(sa.n + sb.n - COALESCE(iv.inter, 0)
                                AS DOUBLE), 6)), 6) AS abs_err
FROM m LEFT JOIN iv ON iv.id_a = m.id_a AND iv.id_b = m.id_b
JOIN sz sa ON sa.doc_id = m.id_a
JOIN sz sb ON sb.doc_id = m.id_b
ORDER BY m.id_a, m.id_b"""


def sql_band_occupancy() -> str:
    return f"""
WITH {sql_shingle_cte()},
perm(k, a, b, w) AS (VALUES {_perm_values()}),
sigs AS (
  SELECT doc_id, k, w, min((a * h + b) % {_K64_LIT}) AS sig
  FROM (SELECT DISTINCT doc_id, h FROM tl
        WHERE doc_id IS NOT NULL), perm
  GROUP BY doc_id, k, w),
bands AS (
  SELECT doc_id, k // {ROWS_PER_BAND} AS band,
         sum((w * sig) % {_K64_LIT}) % {_K64_LIT} AS bh
  FROM sigs GROUP BY doc_id, k // {ROWS_PER_BAND}),
occ AS (SELECT band, bh, count(*) AS sz
        FROM bands GROUP BY band, bh)
SELECT CAST(band AS BIGINT) AS band,
       CAST(sz AS BIGINT) AS bucket_size,
       CAST(count(*) AS BIGINT) AS n_buckets
FROM occ GROUP BY band, sz ORDER BY band, sz"""


# ------------------------------------------------------------------
# md5-derived hyperplane LSH (the embedding analog of the minhash_md5
# family): integer-exact bucket assignment both engines can reproduce
# value-for-value. Components are quantized q_j = floor(x_j * 1e6) as
# int64 (float32 -> double widening + one double multiply + floor —
# bit-identical IEEE ops on both engines), hyperplane coefficients are
# c(t,k,j) = md5_low64(f"hp_{t}_{k}_{j}") % 2001 - 1000 (exact small
# ints), so every dot product is EXACT integer arithmetic — no float
# summation-order hazard can flip a sign bit between numpy's pairwise
# sum and SQL's streaming SUM. bit_k = (dot > 0); a zero dot (the tie)
# answers bit 0 on both engines by the same strict inequality.

LSH_MD5_TABLES = 2
LSH_MD5_PLANES = 8


def lsh_md5_coef(dim: int, tables: int = LSH_MD5_TABLES,
                 planes: int = LSH_MD5_PLANES) -> "np.ndarray":
    """(tables*planes, dim) int64 coefficient matrix, row t*planes+k."""
    C = np.empty((tables * planes, dim), np.int64)
    for t in range(tables):
        for k in range(planes):
            for j in range(dim):
                C[t * planes + k, j] = \
                    md5_low64(f"hp_{t}_{k}_{j}") % 2001 - 1000
    return C


def _q_partial_rows(b: pa.Table, id_col: str,
                    vec_col: str) -> pa.Table:
    """Per-row quantized partials (vid, q: list<int64>) — q_j =
    floor(x_j * 1e6) (float32 -> double widening, one double multiply,
    floor: bit-identical IEEE on both engines). Null-id / null-vector
    / EMPTY-vector rows are DROPPED. These partials ride the ONE
    vid-hash shuffle ((dim+1)*8 B per row — the sig-partials shape of
    the minhash family) so duplicate ids can merge exactly."""
    import pyarrow.compute as pc
    t = b.filter(pc.and_(pc.is_valid(b.column(id_col)),
                         pc.is_valid(b.column(vec_col))))
    id_type = b.schema.field(id_col).type
    empty = pa.table({"vid": pa.array([], id_type),
                      "q": pa.array([], pa.list_(pa.int64()))})
    if t.num_rows == 0:
        return empty
    emb = t.column(vec_col)
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    lens = pc.list_value_length(emb) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = lens > 0
    if not keep.any():
        return empty
    flat = pc.list_flatten(emb) \
        .to_numpy(zero_copy_only=False).astype(np.float64)
    qf = np.floor(flat * 1000000.0).astype(np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    ids = t.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    from ..util import ranges_concat
    kidx = np.flatnonzero(keep)
    value_off = np.zeros(len(kidx) + 1, np.int64)
    np.cumsum(lens[kidx], out=value_off[1:])
    vals = qf[ranges_concat(offs[kidx], lens[kidx])]
    qlist = pa.ListArray.from_arrays(
        pa.array(value_off, pa.int32()).cast(pa.int32()),
        pa.array(vals, pa.int64()))
    return pa.table({"vid": ids.take(pa.array(kidx)), "q": qlist})


def _merged_q(t: pa.Table, with_norm: bool = False) -> pa.Table:
    """Per-vid MERGED quantized vector: duplicate ids sum their
    components per position j (absent positions are 0) — EXACTLY the
    SQL ``GROUP BY vid, j`` convention, and the family's
    merge-before-signature discipline (minhash merges shingle sets;
    here merge is vector addition, the linear form the bits CTE's
    sum(c*q) already implies). Optionally appends nrm = sum q_j^2
    (exact int64) for the cosine verify stage."""
    vid = t.column("vid")
    if isinstance(vid, pa.ChunkedArray):
        vid = vid.combine_chunks()
    qcol = t.column("q")
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    import pyarrow.compute as pc
    lens = pc.list_value_length(qcol) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(qcol).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # group rows by vid (sort once; vids arrive co-partitioned)
    key = vid.to_numpy(zero_copy_only=False)
    order = np.argsort(key, kind="stable")
    key_s, lens_s = key[order], lens[order]
    first = np.ones(len(key_s), dtype=bool)
    first[1:] = key_s[1:] != key_s[:-1]
    ginv = np.cumsum(first) - 1
    n_grp = int(ginv[-1]) + 1 if len(ginv) else 0
    gmax = np.zeros(n_grp, np.int64)
    np.maximum.at(gmax, ginv, lens_s)
    width = int(gmax.max()) if n_grp else 0
    M = np.zeros((n_grp, width), np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    from ..util import ranges_concat
    row_of = np.repeat(ginv, lens_s)
    col_of = ranges_concat(np.zeros(len(lens_s), np.int64), lens_s)
    vals = flat[ranges_concat(offs[order], lens_s)]
    np.add.at(M, (row_of, col_of), vals)
    gl = gmax  # merged length = max member length (shorter pad 0)
    value_off = np.zeros(n_grp + 1, np.int64)
    np.cumsum(gl, out=value_off[1:])
    mvals = M[np.repeat(np.arange(n_grp), gl),
              ranges_concat(np.zeros(n_grp, np.int64), gl)] \
        if n_grp else np.zeros(0, np.int64)
    qlist = pa.ListArray.from_arrays(
        pa.array(value_off, pa.int32()).cast(pa.int32()),
        pa.array(mvals, pa.int64()))
    cols = {"vid": vid.take(pa.array(order[first])), "q": qlist}
    if with_norm:
        # exact int64: |q| <= ~1e8 even after duplicate merge, so
        # q^2 * dim stays far inside int64
        cols["nrm"] = pa.array((M * M).sum(axis=1)
                               if n_grp else np.zeros(0, np.int64),
                               pa.int64())
    return pa.table(cols)


def _buckets_from_q(t: pa.Table) -> pa.Table:
    """(vid, q merged) -> (vid, tbl, bucket): one int64 matmul per
    length group against the worker-cached coefficient matrix; the
    sign of each exact integer dot packs to the bucket id."""
    import pyarrow.compute as pc

    from ..util import worker_cached
    vid = t.column("vid")
    if isinstance(vid, pa.ChunkedArray):
        vid = vid.combine_chunks()
    qcol = t.column("q")
    if isinstance(qcol, pa.ChunkedArray):
        qcol = qcol.combine_chunks()
    id_type = t.schema.field("vid").type
    empty = pa.table({"vid": pa.array([], id_type),
                      "tbl": pa.array([], pa.int64()),
                      "bucket": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    lens = pc.list_value_length(qcol) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(qcol).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    offs = np.zeros(len(lens) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    idx_parts, tbl_parts, bkt_parts = [], [], []
    w = (1 << np.arange(LSH_MD5_PLANES)).astype(np.int64)
    for d in np.unique(lens[lens > 0]):
        rows = np.flatnonzero(lens == d)
        M = flat[offs[rows][:, None] + np.arange(int(d))[None, :]]
        C = worker_cached(("lsh_md5_coef", int(d)),
                          lambda d=int(d): lsh_md5_coef(d))
        dots = M @ C.T              # exact int64, (n_d, tables*planes)
        bits = (dots > 0).astype(np.int64)
        for tt in range(LSH_MD5_TABLES):
            seg = bits[:, tt * LSH_MD5_PLANES:
                       (tt + 1) * LSH_MD5_PLANES]
            idx_parts.append(rows)
            tbl_parts.append(np.full(len(rows), tt, np.int64))
            bkt_parts.append(seg @ w)
    if not idx_parts:
        return empty
    take = np.concatenate(idx_parts)
    return pa.table({
        "vid": vid.take(pa.array(take)),
        "tbl": pa.array(np.concatenate(tbl_parts)),
        "bucket": pa.array(np.concatenate(bkt_parts))})


def lsh_bucket_dataset(ds, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       with_norm: bool = False):
    """Dataset of (vid, tbl, bucket) — ONE row per surviving vec_id
    per table (duplicate ids merged additively first). The shared
    stage behind occupancy, pairs and pair-cosine. When
    ``with_norm``, returns (buckets_ds, merged_ds) where merged_ds is
    (vid, q, nrm) for the verify stage."""
    partials = ds.select_columns([id_col, vec_col]).map_batches(
        lambda b: _q_partial_rows(b, id_col, vec_col),
        batch_format="pyarrow", zero_copy_batch=True)
    merged = partitioned_group_apply(
        partials, ["vid"],
        lambda t: _merged_q(t, with_norm=with_norm),
        batch_format="pyarrow")
    buckets = merged.map_batches(
        lambda b: _buckets_from_q(b.select(["vid", "q"])),
        batch_format="pyarrow", zero_copy_batch=True)
    if with_norm:
        return buckets, merged
    return buckets


def embedding_lsh_pairs_md5(ds, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            bucket_cap: int = 10000):
    """(id_a, id_b) DISTINCT candidate pairs sharing at least one
    (table, bucket) under the md5 hyperplanes (id_a < id_b — a
    vec_id never pairs with itself, even when duplicated) — the
    fully-oracled variant of the production hyperplane candidate
    generation (dedup/embedding.py keys on rng planes, rows-only).
    ``bucket_cap`` truncates pathological single-bucket blowups
    exactly like the production path; the oracle SFs sit far below
    it."""
    rows = lsh_bucket_dataset(ds, id_col, vec_col)
    return _pairs_from_buckets(rows, bucket_cap)


def _pairs_from_buckets(rows, bucket_cap: int):
    def pairs_in_partition(t: pa.Table) -> pa.Table:
        from ..util import segment_pairs
        tblc = t.column("tbl").to_numpy(zero_copy_only=False)
        bkt = t.column("bucket").to_numpy(zero_copy_only=False)
        a_idx, b_idx, order = segment_pairs([tblc, bkt], bucket_cap)
        ids = t.column("vid").take(pa.array(order))
        lo = np.minimum(a_idx, b_idx)
        hi = np.maximum(a_idx, b_idx)
        ia = ids.take(pa.array(lo)).to_numpy(zero_copy_only=False)
        ib = ids.take(pa.array(hi)).to_numpy(zero_copy_only=False)
        keep = ia != ib          # a vid never self-pairs
        ia, ib = ia[keep], ib[keep]
        sw = ia > ib
        return pa.table({
            "id_a": pa.array(np.where(sw, ib, ia), type=pa.int64()),
            "id_b": pa.array(np.where(sw, ia, ib), type=pa.int64())})

    from .pairsops import distinct_pairs
    raw = partitioned_group_apply(rows, ["tbl", "bucket"],
                                  pairs_in_partition,
                                  batch_format="pyarrow")
    return _pin_pairs_schema(distinct_pairs(raw, ["id_a", "id_b"]))


def embedding_lsh_pair_cosine_md5(ds, id_col: str = "vec_id",
                                  vec_col: str = "embedding",
                                  bucket_cap: int = 10000):
    """Candidate pairs WITH their quantized cosine — the VERIFY stage
    of embedding near-dup, value-oracled: cos_q = dot(q_a, q_b) /
    (sqrt(nrm_a) * sqrt(nrm_b)) where dot and the norms are EXACT
    int64 over the merged quantized vectors, so the only float ops are
    one int->double cast per operand, two sqrts, one multiply, one
    divide — each a single deterministic IEEE op identical on both
    engines (the float-sum-order hazard that blocks oracling the
    production cosine lives entirely in the SUM, which here is
    integer). Ragged pairs dot over the overlapping prefix (the SQL
    join-on-j convention); a zero-norm side answers SQL-NULL cos_q;
    6dp duckdb_round. Scale: the pair table joins the merged-vector
    table twice via the size-chosen equi_join (broadcast under the
    cap, partitioned shuffle join above it) — nothing
    corpus-proportional gathers until the final aggregate-sized pair
    frame."""
    from ..joins import equi_join
    from ..util import duckdb_round
    buckets, merged = lsh_bucket_dataset(ds, id_col, vec_col,
                                         with_norm=True)
    pairs = _pairs_from_buckets(buckets, bucket_cap)

    def side(name):
        # Acero joins reject list-typed payload columns — ship the
        # merged vector as BINARY (the minhash sig-bytes precedent)
        def conv(b: pa.Table, n=name) -> pa.Table:
            import pyarrow.compute as pc
            q = b.column("q")
            if isinstance(q, pa.ChunkedArray):
                q = q.combine_chunks()
            lens = pc.list_value_length(q) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(q) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            off = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens * 8, out=off[1:])
            qb = pa.Array.from_buffers(
                pa.binary(), len(lens),
                [None, pa.py_buffer(off.astype(np.int32).tobytes()),
                 pa.py_buffer(flat.tobytes())])
            return pa.table({f"id_{n}": b.column("vid"),
                             f"qb_{n}": qb,
                             f"nrm_{n}": b.column("nrm")})
        return merged.map_batches(conv, batch_format="pyarrow",
                                  zero_copy_batch=True)

    j = equi_join(pairs, side("a"), on="id_a")
    j = equi_join(j, side("b"), on="id_b")

    import pandas as pd
    import pyarrow.compute as pc
    out_empty = pd.DataFrame({
        "id_a": pd.Series([], dtype="int64"),
        "id_b": pd.Series([], dtype="int64"),
        "cos_q": pd.Series([], dtype="float64")})

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cos_q": pa.array([], pa.float64())})
        def unbin(col):
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bl = pc.binary_length(col) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            rows = col.to_pylist()     # pair-bounded batch, not corpus
            flat = np.frombuffer(b"".join(rows), dtype=np.int64) \
                if rows else np.zeros(0, np.int64)
            return flat, bl // 8
        fa, la = unbin(b.column("qb_a"))
        fb, lb = unbin(b.column("qb_b"))
        oa = np.zeros(len(la) + 1, np.int64)
        np.cumsum(la, out=oa[1:])
        ob = np.zeros(len(lb) + 1, np.int64)
        np.cumsum(lb, out=ob[1:])
        from ..util import ranges_concat
        ov = np.minimum(la, lb)
        rid = np.repeat(np.arange(len(la), dtype=np.int64), ov)
        va = fa[ranges_concat(oa[:-1], ov)]
        vb = fb[ranges_concat(ob[:-1], ov)]
        dots = np.zeros(len(la), np.int64)
        np.add.at(dots, rid, va * vb)
        na = b.column("nrm_a").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        nb = b.column("nrm_b").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = (na > 0) & (nb > 0)
        cos = np.full(len(la), np.nan)
        cos[ok] = dots[ok].astype(np.float64) / \
            (np.sqrt(na[ok].astype(np.float64)) *
             np.sqrt(nb[ok].astype(np.float64)))
        cos_r = [duckdb_round(float(c), 6) if k else None
                 for c, k in zip(cos, ok)]
        return pa.table({"id_a": b.column("id_a").cast(pa.int64()),
                         "id_b": b.column("id_b").cast(pa.int64()),
                         "cos_q": pa.array(cos_r, pa.float64())})

    res = j.map_batches(score, batch_format="pyarrow",
                        zero_copy_batch=True).to_pandas()
    if res.empty or "id_a" not in res.columns:
        return out_empty
    out = res[["id_a", "id_b", "cos_q"]] \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    out["id_a"] = out["id_a"].astype("int64")
    out["id_b"] = out["id_b"].astype("int64")
    out["cos_q"] = out["cos_q"].astype("float64")
    return out


def _plane_values(tables: int = LSH_MD5_TABLES,
                  planes: int = LSH_MD5_PLANES) -> str:
    return ", ".join(f"({t}, {k})" for t in range(tables)
                     for k in range(planes))


def _sql_lsh_bits_cte(table: str, id_col: str, vec_col: str) -> str:
    """Shared WITH-body: vecs -> comps -> coef -> dots -> bits
    ((vid, tbl, bucket) per surviving vector) — shared by the
    occupancy and pair oracles so the two cannot drift."""
    return f"""
vecs AS (
  SELECT {id_col} AS vid, {vec_col} AS v FROM {table}
  WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
    AND len({vec_col}) > 0),
comps AS (
  SELECT vid, generate_subscripts(v, 1) - 1 AS j,
         CAST(floor(CAST(unnest(v) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS q
  FROM vecs),
dims AS (SELECT DISTINCT j FROM comps),
plane(t, k) AS (VALUES {_plane_values()}),
coef AS (
  SELECT t, k, j,
         CAST(((md5_number('hp_' || t || '_' || k || '_' || j)
                % {_K64_LIT}) + {_K64_LIT}) % {_K64_LIT} % 2001 - 1000
              AS BIGINT) AS c
  FROM plane, dims),
dots AS (
  SELECT vid, t, k, sum(c * q) AS dot
  FROM comps JOIN coef USING (j)
  GROUP BY vid, t, k),
bits AS (
  SELECT vid, t AS tbl,
         sum(CASE WHEN dot > 0 THEN CAST(1 AS BIGINT) << k
             ELSE 0 END) AS bucket
  FROM dots GROUP BY vid, t)"""


def sql_embedding_lsh_buckets(table: str = "embeddings",
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> str:
    """DuckDB mirror of the hyperplane bucket assignment: per (tbl,
    bucket), how many vectors land there. Null-id / null-vector /
    empty-vector rows are invisible (no components -> no dot rows);
    a short vector sums over ITS OWN components only (the join on j),
    matching the Ray kernel's per-length matmul groups."""
    return f"""
WITH {_sql_lsh_bits_cte(table, id_col, vec_col)}
SELECT CAST(tbl AS BIGINT) AS tbl, CAST(bucket AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM bits GROUP BY tbl, bucket ORDER BY tbl, bucket"""


def sql_embedding_lsh_pairs(table: str = "embeddings",
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> str:
    """DuckDB mirror of the hyperplane candidate pairs: DISTINCT
    (id_a, id_b), id_a < id_b, sharing any (tbl, bucket)."""
    return f"""
WITH {_sql_lsh_bits_cte(table, id_col, vec_col)}
SELECT DISTINCT CAST(x.vid AS BIGINT) AS id_a,
                CAST(y.vid AS BIGINT) AS id_b
FROM bits x JOIN bits y
  ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vid < y.vid
ORDER BY id_a, id_b"""


def sql_embedding_lsh_pair_cosine(table: str = "embeddings",
                                  id_col: str = "vec_id",
                                  vec_col: str = "embedding") -> str:
    """DuckDB mirror of the pair-cosine verify stage: exact-integer
    dot/norms over the per-(vid, j) MERGED components, one float
    divide in the pinned operand order, 6dp."""
    return f"""
WITH {_sql_lsh_bits_cte(table, id_col, vec_col)},
mcomps AS (SELECT vid, j, sum(q) AS q FROM comps GROUP BY vid, j),
prs AS (
  SELECT DISTINCT x.vid AS id_a, y.vid AS id_b
  FROM bits x JOIN bits y
    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vid < y.vid),
nrms AS (SELECT vid, sum(q * q) AS nrm FROM mcomps GROUP BY vid),
pdots AS (
  SELECT p.id_a, p.id_b, sum(ca.q * cb.q) AS dot
  FROM prs p
  JOIN mcomps ca ON ca.vid = p.id_a
  JOIN mcomps cb ON cb.vid = p.id_b AND cb.j = ca.j
  GROUP BY p.id_a, p.id_b)
SELECT CAST(p.id_a AS BIGINT) AS id_a,
       CAST(p.id_b AS BIGINT) AS id_b,
       CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN NULL
            ELSE round(CAST(d.dot AS DOUBLE) /
                       (sqrt(CAST(na.nrm AS DOUBLE)) *
                        sqrt(CAST(nb.nrm AS DOUBLE))), 6)
       END AS cos_q
FROM prs p
JOIN nrms na ON na.vid = p.id_a
JOIN nrms nb ON nb.vid = p.id_b
LEFT JOIN pdots d ON d.id_a = p.id_a AND d.id_b = p.id_b
ORDER BY id_a, id_b"""
