"""Unit tests for text/transform.py (term frequency, normalization,
chunking) — edge cases the sf-corpus oracle test can't reach: empty
strings, unicode codepoints, exact chunk-count math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsonschema_ray.text.transform import (chunk_text, n_chunks_for,
                                           normalize_text, term_frequency)


def _ds(rows):
    import ray.data
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def test_n_chunks_math():
    lens = np.array([0, 1, 200, 201, 350, 351, 500])
    # window 200 stride 150: <=200 → 1; 201..350 → 2; 351..500 → 3
    assert n_chunks_for(lens, 200, 150).tolist() == [1, 1, 1, 2, 2, 3, 3]


def test_chunk_text_exact(ray_session):
    text = "abcdefghij" * 40  # 400 chars → 3 chunks (0,150,300)
    ds = _ds([{"doc_id": 1, "text": text},
              {"doc_id": 2, "text": ""},
              {"doc_id": 3, "text": "short"}])
    out = chunk_text(ds, window=200, stride=150).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    got = {(r.doc_id, r.chunk_id): r.chunk for r in out.itertuples()}
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)}
    assert got[(1, 0)] == text[0:200]
    assert got[(1, 1)] == text[150:350]
    assert got[(1, 2)] == text[300:400]  # final partial window
    assert got[(2, 0)] == ""
    assert got[(3, 0)] == "short"


def test_chunk_text_unicode_codepoints(ray_session):
    # multi-byte codepoints: slicing must count characters, not bytes
    text = "é" * 10 + "X" + "漢" * 10
    ds = _ds([{"doc_id": 7, "text": text}])
    out = chunk_text(ds, window=8, stride=6).to_pandas() \
        .sort_values("chunk_id").reset_index(drop=True)
    for r in out.itertuples():
        assert r.chunk == text[r.chunk_id * 6:r.chunk_id * 6 + 8]
    assert len(out) == 1 + int(np.ceil((len(text) - 8) / 6))


def test_normalize_text(ray_session):
    ds = _ds([{"doc_id": 1, "text": "the cat and a hat"},
              {"doc_id": 2, "text": "a  the  an"},
              {"doc_id": 3, "text": "theater announce"},  # no token match
              {"doc_id": 4, "text": ""}])
    out = normalize_text(ds, keep_cols=("doc_id",)).to_pandas() \
        .set_index("doc_id")["clean_text"].to_dict()
    assert out[1] == "cat and hat"
    assert out[2] == ""
    assert out[3] == "theater announce"  # \b keeps word-internal matches
    assert out[4] == ""


def test_term_frequency(ray_session):
    ds = _ds([{"text": "x y x"}, {"text": "y  z"}, {"text": ""}])
    out = term_frequency(ds)
    df = out.to_pandas().set_index("term")["n"].to_dict()
    assert df == {"x": 2, "y": 2, "z": 1}  # empty splits dropped


def test_term_frequency_topn_tiebreak(ray_session):
    ds = _ds([{"text": "b a c a b d"}])
    df = term_frequency(ds, top_n=3)
    # count desc, then term asc: a(2), b(2), then c/d(1) → c
    assert df["term"].tolist() == ["a", "b", "c"]
    assert df["n"].tolist() == [2, 2, 1]


def test_bpe_token_counts_vs_duckdb():
    import duckdb
    from jsonschema_ray.text.analysis import BPE_TOKEN_PATTERN, \
        bpe_token_counts
    texts = ["I'll say it's fine, really.", "abc123 !?  ", "", "héllo wörld",
             "don't,  can't...  42x  \t tab"]
    got = bpe_token_counts(pa.array(texts)).tolist()
    exp = [duckdb.sql(
        "select length(regexp_extract_all(?, ?))",
        params=[t, BPE_TOKEN_PATTERN]).fetchone()[0] for t in texts]
    assert got == exp
    assert got[2] == 0


def test_chunk_text_null_text(ray_session):
    ds = _ds([{"doc_id": 1, "text": None}, {"doc_id": 2, "text": "ab"}])
    out = chunk_text(ds, window=200, stride=150).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # null text still emits ONE row with a null chunk (SQL substring(NULL))
    assert len(out) == 2
    assert out.loc[0, "chunk"] is None or pd.isna(out.loc[0, "chunk"])
    assert out.loc[1, "chunk"] == "ab"


def test_token_counts_null_preserving():
    from jsonschema_ray.text.analysis import bpe_token_counts, token_counts
    arr = pa.array(["a b", None, ""])
    assert token_counts(arr).to_pylist() == [2, None, 0]
    assert bpe_token_counts(arr).to_pylist() == [2, None, 0]


def test_normalize_text_metachar_stopwords(ray_session):
    ds = _ds([{"doc_id": 1, "text": "c++ and aXb a.b"}])
    out = normalize_text(ds, stopwords=("c++", "a.b"),
                         keep_cols=("doc_id",)).to_pandas()
    # escaped: c++ removed as a token, a.b removed literally, aXb survives
    assert out["clean_text"].iloc[0] == "and aXb"


def test_pii_counts_patterns():
    from jsonschema_ray.text.analysis import pii_counts
    arr = pa.array([
        "mail me at jo.doe+x@ex-ample.org or admin@a.co thanks",
        "call +1 (555) 123-4567 now",
        "host 10.0.0.1 and 192.168.255.254 up",
        None, "",
    ])
    out = {k: v.to_pylist() for k, v in pii_counts(arr).items()}
    assert out["n_email"] == [2, 0, 0, None, 0]
    assert out["n_phone"] == [0, 1, 0, None, 0]
    assert out["n_ipv4"] == [0, 0, 2, None, 0]


def test_repetition_features_edges():
    from jsonschema_ray.text.analysis import repetition_features
    ids = pa.array([1, 2, 3, 4], type=pa.int64())
    arr = pa.array(["a a a a", "a b c d", "", None])
    out = repetition_features(ids, arr).to_pandas().set_index("doc_id")
    # all-same: dup = 1 - 1/4 = 0.75 -> 7500; top = 4/4 -> 10000
    assert out.loc[1].tolist() == [4, 7500, 10000]
    # all-distinct: dup 0, top 1/4 -> 2500
    assert out.loc[2].tolist() == [4, 0, 2500]
    assert out.loc[3].tolist() == [0, 0, 0]
    assert out.loc[4].tolist() == [0, 0, 0]


def test_tfidf_small(ray_session):
    import math

    from jsonschema_ray.text.transform import tfidf
    ds = _ds([{"doc_id": 1, "text": "x x y"},
              {"doc_id": 2, "text": "x z"},
              {"doc_id": 3, "text": None}])
    out = tfidf(ds, n_docs=3).to_pandas()
    got = {(r.doc_id, r.term): (r.tf, r.tfidf_bp)
           for r in out.itertuples()}
    def bp(tf, df):
        return math.floor(10000 * tf * math.log(3 / df))
    assert got[(1, "x")] == (2, bp(2, 2))
    assert got[(1, "y")] == (1, bp(1, 1))
    assert got[(2, "z")] == (1, bp(1, 1))
    assert (3, "x") not in dict(got)
    assert len(out) == 4


# ---------------------------------------------------------------------------
# passages module (round 3): dup passages, decontamination, char entropy


def _passages_docs():
    import pyarrow as pa
    shared = "one two three four five six seven eight nine ten"
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": [f"{shared} alpha beta", f"gamma {shared} delta",
                 "short text only", None]})


def test_duplicate_passages_string_and_hash_agree(ray_session):
    import ray.data

    from jsonschema_ray.text import duplicate_passages
    ds = ray.data.from_arrow(_passages_docs())
    s = duplicate_passages(ds, n=8, min_docs=2).to_pandas()
    h = duplicate_passages(ds, n=8, min_docs=2, hash_only=True).to_pandas()
    # same number of shared grams either way; every shared 8-gram comes
    # from the 10-word shared span → 3 shared grams of the span
    assert len(s) == len(h) == 3
    assert (s["n_docs"] == 2).all() and (h["n_docs"] == 2).all()
    assert all("one" in g or "two" in g or g.count(" ") == 7
               for g in s["gram"])


def test_duplicate_passages_short_and_null_docs(ray_session):
    import pyarrow as pa
    import ray.data

    from jsonschema_ray.text import duplicate_passages
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()),
         "text": ["tiny", None]}))
    assert duplicate_passages(ds, n=8).to_pandas().empty


def test_decontaminate_matches_and_nulls(ray_session):
    import pyarrow as pa
    import ray.data

    from jsonschema_ray.text import decontaminate
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
         "text": ["the quick brown fox", "quick brown shoes",
                  None, "nothing here"]}))
    out = decontaminate(ds, ["quick brown", "fox", ""]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_probes"].tolist() == [2, 1]   # empty probe dropped


def test_char_entropy_edges():
    import math

    import pyarrow as pa

    from jsonschema_ray.text import char_entropy
    out = char_entropy(pa.array(["aabb", "aaaa", "", None, "ab", "日本語"]))
    vals = out.to_pylist()
    assert vals[0] == 1.0                      # two symbols, p=.5 each
    assert vals[1] == 0.0                      # single symbol
    assert vals[2] == 0.0                      # empty → 0
    assert vals[3] is None                     # null → null
    assert vals[4] == 1.0
    assert math.isclose(vals[5], math.log2(3), abs_tol=1e-4)


def test_pack_sequences_matches_window_cumsum(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.text import pack_sequences
    rng = np.random.default_rng(3)
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    rng.shuffle(ids)                       # arrival order ≠ id order
    toks = rng.integers(0, 400, size=n).astype(np.int64)
    t = pa.table({"doc_id": pa.array(ids), "n_tokens": pa.array(toks)})
    out = pack_sequences(rd.from_arrow(t), window=1000,
                         bucket_size=137).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # oracle: exclusive cumsum in id order // window
    df = pd.DataFrame({"doc_id": ids, "n_tokens": toks}) \
        .sort_values("doc_id").reset_index(drop=True)
    before = np.concatenate(([0], df["n_tokens"].cumsum().to_numpy()[:-1]))
    exp = (before // 1000).astype(np.int64)
    assert out["pack_id"].tolist() == exp.tolist()
    # bucket size must not change the assignment
    out2 = pack_sequences(rd.from_arrow(t), window=1000,
                          bucket_size=4096).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out2["pack_id"].tolist() == exp.tolist()


def test_pack_sequences_null_tokens(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.text import pack_sequences
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "n_tokens": pa.array([600, None, 600], type=pa.int64())})
    out = pack_sequences(rd.from_arrow(t), window=1000).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # null packs as 0 tokens but keeps its null count
    assert out["pack_id"].tolist() == [0, 0, 0]
    assert pd.isna(out["n_tokens"].iloc[1])


def test_stratified_sample_rates(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.pipelines.relational import stratified_sample
    n = 10000
    langs = np.array(["en", "de", "xx"])[np.arange(n) % 3]
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                  "lang": pa.array(langs)})
    out = stratified_sample(rd.from_arrow(t), "lang",
                            {"en": 2500, "de": 5000}, "doc_id").to_pandas()
    got = out.groupby("lang").size()
    base = pd.Series(langs).value_counts()
    assert abs(got["en"] / base["en"] - 0.25) < 0.02
    assert abs(got["de"] / base["de"] - 0.50) < 0.02
    assert got["xx"] == base["xx"]          # default: keep all


def test_bigram_counts_matches_bruteforce(ray_session):
    """Vectorized adjacent-pair extraction vs a per-doc Python count:
    doc boundaries never pair, leading/empty docs don't clobber the
    mask (ends-1 underflow), doubled spaces drop pairs touching the
    empty token, null texts contribute nothing."""
    from collections import Counter

    import ray.data as rd

    from jsonschema_ray.text.transform import bigram_counts
    texts = ["", "a b a b", "single", "x  y", "b a", None,
             "a b", "  ", "edge case edge case edge"]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts,
                                                  type=pa.string())}))
    got = bigram_counts(ds, top_n=100)
    ref = Counter()
    for t in texts:
        if t is None:
            continue
        toks = t.split(" ")
        for w1, w2 in zip(toks, toks[1:]):
            if w1 and w2:
                ref[(w1, w2)] += 1
    want = sorted(((w1, w2, n) for (w1, w2), n in ref.items()))
    have = sorted(got[["w1", "w2", "n"]].itertuples(index=False,
                                                    name=None))
    assert have == want
    # top_n cut is a total order: ask for fewer than exist
    top2 = bigram_counts(ds, top_n=2)
    full = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert list(top2[["w1", "w2"]].itertuples(index=False, name=None)) \
        == [k for k, _ in full]
    # repartition invariance (partials combine across blocks)
    got7 = bigram_counts(ds.repartition(7), top_n=100)
    assert sorted(got7[["w1", "w2", "n"]].itertuples(
        index=False, name=None)) == want
    # streaming form (top_n=None) returns a Dataset of the same counts
    full_ds = bigram_counts(ds).to_pandas()
    assert sorted(full_ds[["w1", "w2", "n"]].itertuples(
        index=False, name=None)) == want


def test_topk_empty_vocabulary(ray_session):
    """A corpus yielding ZERO terms/bigrams returns a typed empty frame
    (Ray drops the schema of an all-empty pipeline; the survivors
    collect is column-less and used to KeyError in sort_values)."""
    import ray.data as rd

    from jsonschema_ray.text.transform import bigram_counts, term_frequency
    no_pairs = rd.from_arrow(pa.table({
        "text": pa.array(["single", "", None, " "], type=pa.string())}))
    got = bigram_counts(no_pairs, top_n=10)
    assert len(got) == 0 and sorted(got.columns) == ["n", "w1", "w2"]
    no_terms = rd.from_arrow(pa.table({
        "text": pa.array(["", None, "  "], type=pa.string())}))
    got = term_frequency(no_terms, top_n=10)
    assert len(got) == 0 and sorted(got.columns) == ["n", "term"]
