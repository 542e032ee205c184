"""Round-4 dedup/codecs review wave — pinned regressions.

Findings: null/huge-int64 id corruption through pandas roundtrips in
exact_dedup_stats and exact_dedup's full-shuffle fallback; duplicate-id
decoy suppression in every driver-gather scoring path (minhash fast
path, exact-Jaccard verify gather, embedding fast path); float64 key
rounding in embedding._row_keys on null-bearing int id batches; numpy-2
OverflowError on negative band-hash salts; PNG decompression-bomb
allocation, CRC-valid short IHDR escaping ImageDecodeError, and the
per-byte Sub/Average/Paeth unfilter loops."""

import struct
import zlib

import numpy as np
import pyarrow as pa
import pytest

BIG = 2 ** 53


def _arrow_of(ds) -> pa.Table:
    return pa.concat_tables(
        [pa.table(b) for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="permissive")


# ---------------------------------------------------------------------------
# exact dedup: null + past-2^53 int64 ids survive every path exactly


def _null_big_table():
    return pa.table({
        "doc_id": pa.array([BIG + 1, BIG + 3, 5, None], type=pa.int64()),
        "text": ["dup", "dup", "unique", "solo"],
        "payload": pa.array([BIG + 5, 1, 2, None], type=pa.int64()),
    })


def test_exact_dedup_stats_exact_int64_with_nulls(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup.exact import exact_dedup_stats
    out = _arrow_of(exact_dedup_stats(rd.from_arrow(_null_big_table())))
    assert out.schema.field("doc_id").type == pa.int64()
    ids = out.column("doc_id").to_pylist()
    counts = dict(zip(ids, out.column("n_copies").to_pylist()))
    # min id of the dup group is BIG+1 EXACTLY (float64 would round both
    # dup ids to the same even value and fabricate a nonexistent id)
    assert counts == {BIG + 1: 2, 5: 1, None: 1}


def test_exact_dedup_full_shuffle_fallback_exact_int64(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup.exact import exact_dedup
    out = _arrow_of(exact_dedup(rd.from_arrow(_null_big_table()),
                                broadcast_ids_cap=0))
    assert out.schema.field("doc_id").type == pa.int64()
    assert out.schema.field("payload").type == pa.int64()
    rows = {(r["doc_id"], r["text"], r["payload"])
            for r in out.to_pylist()}
    # min-id row wins the dup group with its payload INTACT
    assert rows == {(BIG + 1, "dup", BIG + 5), (5, "unique", 2),
                    (None, "solo", None)}


def test_exact_dedup_stats_all_null_group_emits_null_id(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup.exact import exact_dedup_stats
    t = pa.table({"doc_id": pa.array([None, None], type=pa.int64()),
                  "text": ["x", "x"]})
    out = _arrow_of(exact_dedup_stats(rd.from_arrow(t)))
    assert out.column("doc_id").to_pylist() == [None]
    assert out.column("n_copies").to_pylist() == [2]


# ---------------------------------------------------------------------------
# duplicate-id decoys: every driver-gather path scores ALL rows per key


_BASE = ("the quick brown fox jumps over the lazy dog and then more "
         "text to fill out the shingles nicely ") * 3
_JUNK = ("completely different content about oranges apples and long "
         "rivers flowing through ancient valleys today ") * 3


def _decoy_docs():
    import ray.data as rd
    return rd.from_arrow(pa.table({"doc_id": ["A", "A", "B"],
                                   "text": [_JUNK, _BASE, _BASE]}))


def test_minhash_fast_path_scores_decoy_duplicate_ids(ray_session):
    from jsonschema_ray.dedup.minhash import minhash_near_duplicates
    fast = minhash_near_duplicates(_decoy_docs()).to_pandas()
    join = minhash_near_duplicates(_decoy_docs(),
                                   broadcast_sig_cap=0).to_pandas()
    assert set(zip(fast.id_a, fast.id_b)) == \
        set(zip(join.id_a, join.id_b)) == {("A", "B")}


def test_verified_neardup_scores_decoy_duplicate_ids(ray_session):
    from jsonschema_ray.dedup.minhash import verified_near_duplicates
    out = verified_near_duplicates(_decoy_docs())
    assert set(zip(out.id_a, out.id_b)) == {("A", "B")}
    assert (out.jaccard == 1.0).all()


def test_embedding_fast_path_scores_decoy_duplicate_ids(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup.embedding import embedding_near_duplicates
    rng = np.random.default_rng(3)
    vb, vj = rng.standard_normal(16), rng.standard_normal(16)
    t = pa.table({"vec_id": ["A", "A", "B"],
                  "embedding": [list(vj), list(vb), list(vb)]})
    fast = embedding_near_duplicates(rd.from_arrow(t),
                                     threshold=0.95).to_pandas()
    join = embedding_near_duplicates(rd.from_arrow(t), threshold=0.95,
                                     broadcast_vec_cap=0).to_pandas()
    assert set(zip(fast.id_a, fast.id_b)) == \
        set(zip(join.id_a, join.id_b)) == {("A", "B")}


def test_embedding_row_keys_null_int_ids_stay_exact(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup.embedding import embedding_near_duplicates
    rng = np.random.default_rng(3)
    vb, vj = rng.standard_normal(16), rng.standard_normal(16)
    # BIG+1 and BIG+3 would collide after a float64 detour (both round
    # to BIG+2-adjacent evens); the null row must not force that detour
    t = pa.table({
        "vec_id": pa.array([BIG + 1, None, BIG + 3], type=pa.int64()),
        "embedding": [list(vb), list(vj), list(vb)]})
    out = embedding_near_duplicates(rd.from_arrow(t),
                                    threshold=0.95).to_pandas()
    assert len(out) == 1
    assert (out.id_a[0], out.id_b[0]) == (BIG + 1, BIG + 3)


def test_incremental_minhash_negative_band_salt(ray_session):
    """A hot bucket (> max_bucket keys) with a negative band hash must
    cap via the salted mix without OverflowError (numpy-2 forbids
    np.uint64 of a negative Python int)."""
    from jsonschema_ray.dedup.minhash import _splitmix64
    # direct unit check of the masked-salt expression on a negative key
    bh = -5
    salt = np.uint64(bh & 0xFFFFFFFFFFFFFFFF)
    keys = np.arange(10, dtype=np.int64)
    with np.errstate(over="ignore"):
        mixed = _splitmix64(keys.view(np.uint64) ^ salt)
    assert mixed.dtype == np.uint64 and len(np.unique(mixed)) == 10


# ---------------------------------------------------------------------------
# PNG codec hardening


def _ref_filtered_png(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Spec-reference encode-side filtering (independent of the codec's
    own row functions) so the decoder is pinned against RFC 2083 math."""
    from jsonschema_ray.codecs.images import _PNG_SIG, _chunk
    h, w, _ = px.shape
    raw = px.reshape(h, w * 3).astype(np.int64)
    body = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    bpp = 3
    for r in range(h):
        cur = raw[r]
        f = ftypes[r % len(ftypes)]
        body.append(f)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            enc = (cur - ((left + prev) // 2)) % 256
        else:
            p = left + prev - ul
            pa_, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        body += bytes(enc.astype(np.uint8))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(bytes(body), 6)) + \
        _chunk(b"IEND", b"")


@pytest.mark.parametrize("ftypes", [[1], [3], [4], [0, 1, 2, 3, 4],
                                    [4, 3], [1, 4, 1, 3]])
@pytest.mark.parametrize("shape", [(1, 1), (3, 2), (17, 23)])
def test_png_filters_match_spec_reference(ftypes, shape):
    from jsonschema_ray.codecs.images import _decode_png
    h, w = shape
    rng = np.random.default_rng(h * 100 + w + sum(ftypes))
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (_decode_png(_ref_filtered_png(px, ftypes)) == px).all()


def test_png_decompression_bomb_bounded():
    """A 1x1 PNG whose IDAT inflates to 100 MB must be rejected without
    allocating the inflated size (peak tracemalloc stays ~KB-scale)."""
    import tracemalloc

    from jsonschema_ray.codecs.images import ImageDecodeError, \
        _PNG_SIG, _chunk, _decode_png
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bomb = _PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", zlib.compress(b"\x00" * (100 << 20), 9)) + \
        _chunk(b"IEND", b"")
    tracemalloc.start()
    with pytest.raises(ImageDecodeError, match="length mismatch"):
        _decode_png(bomb)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert peak < 8 << 20, f"bomb inflated {peak} bytes"


def test_png_short_ihdr_is_decode_error():
    from jsonschema_ray.codecs.images import ImageDecodeError, \
        _PNG_SIG, _chunk, _decode_png
    # CRC-valid 12-byte IHDR: must raise ImageDecodeError (the decode
    # stage catches only that), never IndexError/struct.error
    with pytest.raises(ImageDecodeError, match="IHDR"):
        _decode_png(_PNG_SIG + _chunk(b"IHDR", b"\x00" * 12))
    with pytest.raises(ImageDecodeError):
        _decode_png(_PNG_SIG + _chunk(b"IHDR", b"\x00" * 4))


def test_png_truncated_stream_rejected():
    from jsonschema_ray.codecs.images import ImageDecodeError, \
        _PNG_SIG, _chunk, _decode_png
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    raw = np.empty((4, 1 + 12), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(4, 12)
    idat = zlib.compress(raw.tobytes(), 6)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = _PNG_SIG + _chunk(b"IHDR", ihdr) + \
        _chunk(b"IDAT", idat[:-4]) + _chunk(b"IEND", b"")
    with pytest.raises(ImageDecodeError):
        _decode_png(data)
