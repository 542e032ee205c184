"""Near-duplicate detection on 64-bit perceptual hashes (phash).

No reference analog (the reference is single-value); mandated by the north
rule ("near-duplicate detection on phash … hash-partitioned groupby …
skewed partitions salted and split before shuffle").

Algorithm: Hamming-LSH banding with ADAPTIVE second-level refinement (the
all-pairs variant of multi-index Hamming search, Norouzi et al. CVPR 2012):

- level 1: split the 64 bits into B = d+1 bands (fewest bands that
  guarantee recall by pigeonhole → widest band values); explode each row
  to B (band_id, band_val, id, phash) rows and hash-partition ONCE on the
  band key — the only large shuffle, B× the (narrow) input.
- level 2 (inside each partition, vectorized): buckets bigger than
  ``pair_threshold`` are re-split by sub-banding the remaining 64-width
  bits into d+1 sub-bands (a ≤d-distance pair colliding in a band also
  collides in some sub-band of that band's complement — pigeonhole again,
  recall stays 1). The oversized subset explodes ×(d+1) LOCALLY — never
  through the shuffle — and all pair generation runs through ONE
  vectorized segment pass (util.segment_pairs).

Without level 2, bucket sizes (and candidate pairs, quadratically) grow
linearly with the corpus: measured 610M candidate pairs at 1M rows with
single-level 12-bit bands. With it, candidates stay ~O(n) at any corpus
size; genuinely identical-phash cliques (whose true pair count IS
quadratic) are capped at ``max_bucket`` and truncated.

Pipeline (SURVEY §2.6): project (id, phash) → explode ×B → ONE coarse
hash-partition (util.partitioned_group_apply) → vectorized in-partition
candidate generation + ONE batched XOR+popcount verify → tiny cross-band
pair-dedup shuffle over candidates only. Image bytes never move.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


def _explode_bands(batch: pa.Table, *, id_col: str, phash_col: str,
                   bands: int, num_partitions: int,
                   hash_ids: bool) -> pa.Table:
    """Explode to (``_part``, band_id, id, phash) — band VALUES are
    recomputed from the phash inside each partition instead of shuffled
    (8 bytes/row saved on the only large exchange), and the partition
    stamp is computed here directly from (band_id, band_val).

    ``hash_ids``: string/binary ids shuffle as int64 hash64(id) keys
    (8 bytes/row instead of the variable-width string ×bands); pairs are
    translated back to real ids after the pair dedup."""
    import pyarrow.compute as pc

    from ..sketches.hashing import _splitmix64, hash64_array
    width = 64 // bands
    # null phash/id rows are EXCLUDED (a null hash is near nothing) —
    # the float-NaN path of to_numpy would otherwise cast every null to
    # the same garbage int64 (platform-dependent!) and report all null
    # rows as mutual distance-0 duplicates
    keep = pc.and_(pc.is_valid(batch.column(phash_col)),
                   pc.is_valid(batch.column(id_col)))
    if not pc.all(keep).as_py():
        batch = batch.filter(keep)
    ph = batch.column(phash_col).combine_chunks()
    ids = batch.column(id_col).combine_chunks()
    if hash_ids:
        ids = pa.array(hash64_array(ids).view(np.int64))
    h = ph.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    n = len(h)
    mask = np.uint64((1 << width) - 1)
    band_ids, parts = [], []
    with np.errstate(over="ignore"):
        for b in range(bands):
            bval = (h >> np.uint64(b * width)) & mask
            key = _splitmix64(bval ^ _splitmix64(
                np.full(n, b, dtype=np.uint64)))
            band_ids.append(np.full(n, b, dtype=np.int8))
            parts.append((key % np.uint64(num_partitions)).astype(np.int32))
    return pa.table({
        "_part": pa.array(np.concatenate(parts)),
        "band_id": pa.array(np.concatenate(band_ids)),
        id_col: pa.concat_arrays([ids] * bands),
        phash_col: pa.concat_arrays([ph] * bands),
    })


def _remove_band_bits(ph: np.ndarray, band: np.ndarray,
                      width: int) -> np.ndarray:
    """Per-row removal of each row's band bits (band is an array)."""
    lo_bits = band.astype(np.uint64) * np.uint64(width)
    low = ph & ((np.uint64(1) << lo_bits) - np.uint64(1))
    high = ph >> (lo_bits + np.uint64(width))
    return low | (high << lo_bits)


_EMPTY_PAIRS = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "distance": pd.Series([], dtype=np.int32)})


def _partition_pairs(id_col: str, phash_col: str, max_distance: int,
                     max_bucket: int, bands: int,
                     pair_threshold: int = 64):
    """Vectorized per-partition candidate generation (see module doc)."""
    width = 64 // bands
    nsub = max_distance + 1

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY_PAIRS.copy()
        from ..sketches.hashing import _splitmix64
        from ..util import segment_pairs
        bid = df["band_id"].to_numpy().astype(np.int64)
        ids = df[id_col].to_numpy()
        ph = df[phash_col].to_numpy().astype(np.int64).view(np.uint64)
        # band values recomputed from the phash (they never shuffled)
        mask64 = np.uint64((1 << width) - 1)
        bval = ((ph >> (bid.astype(np.uint64) * np.uint64(width)))
                & mask64).view(np.int64)

        # bucket sizes via one lexsort
        order = np.lexsort((bval, bid))
        bid_s, bval_s = bid[order], bval[order]
        n = len(order)
        new_seg = np.ones(n, dtype=bool)
        new_seg[1:] = (bid_s[1:] != bid_s[:-1]) | (bval_s[1:] != bval_s[:-1])
        seg_id = np.cumsum(new_seg) - 1
        starts_idx = np.nonzero(new_seg)[0]
        sizes = np.append(starts_idx[1:], n) - starts_idx
        row_size = sizes[seg_id]          # bucket size per sorted row

        small_rows = order[row_size <= pair_threshold]
        big_rows = order[row_size > pair_threshold]

        pend_a, pend_b = [], []

        def run_segment(sub_idx: np.ndarray, keys: list[np.ndarray]):
            a, b, ordr = segment_pairs(keys, max_bucket)
            if len(a):
                sa, sb = sub_idx[ordr][a], sub_idx[ordr][b]
                keep = sa != sb  # copies of one source row never pair
                pend_a.append(sa[keep])
                pend_b.append(sb[keep])

        if len(small_rows) >= 2:
            run_segment(small_rows, [bid[small_rows].astype(np.int64),
                                     bval[small_rows]])
        if len(big_rows) >= 2:
            # second level: locally explode oversized-bucket rows ×nsub on
            # sub-bands of each row's remaining bits — all vectorized
            rem = _remove_band_bits(ph[big_rows],
                                    bid[big_rows].astype(np.uint64), width)
            rembits = 64 - width
            w2 = rembits // nsub
            with np.errstate(over="ignore"):
                base = _splitmix64(bval[big_rows].view(np.uint64)
                                   ^ _splitmix64(
                                       bid[big_rows].astype(np.uint64)))
                rep_idx = np.tile(big_rows, nsub)
                keys2 = np.empty(len(big_rows) * nsub, dtype=np.uint64)
                for j in range(nsub):
                    take = rembits - j * w2 if j == nsub - 1 else w2
                    sval = (rem >> np.uint64(j * w2)) & \
                        ((np.uint64(1) << np.uint64(take)) - np.uint64(1))
                    # sub-band index salt must be a full-width mix: a small
                    # additive salt (sval + j) collides across sub-bands
                    # whenever svals differ by small integers, self-pairing
                    # rows with their own copies
                    salt = np.uint64((j + 1) * 0x9E3779B97F4A7C15 &
                                     0xFFFFFFFFFFFFFFFF)
                    keys2[j * len(big_rows):(j + 1) * len(big_rows)] = \
                        _splitmix64(base ^ _splitmix64(sval + salt))
            run_segment(rep_idx, [keys2.view(np.int64)])

        if not pend_a:
            return _EMPTY_PAIRS.copy()
        a_idx = np.concatenate(pend_a)
        b_idx = np.concatenate(pend_b)
        out_a, out_b, out_d = [], [], []
        for lo in range(0, len(a_idx), 8_000_000):  # bound verify memory
            ai = a_idx[lo:lo + 8_000_000]
            bi = b_idx[lo:lo + 8_000_000]
            d = hamming64(ph[ai], ph[bi])
            hit = d <= max_distance
            if not hit.any():
                continue
            ia, ib = ids[ai[hit]], ids[bi[hit]]
            swap = ia > ib  # canonical order for cross-band dedup
            out_a.append(np.where(swap, ib, ia))
            out_b.append(np.where(swap, ia, ib))
            out_d.append(d[hit].astype(np.int32))
        if not out_a:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "distance": np.concatenate(out_d)}
                            ).drop_duplicates(["id_a", "id_b"])
    return fn


def _swap_translated_batch(b: pa.Table) -> pa.Table:
    """(joined pairs × _orig_a × _orig_b) → canonical (id_a, id_b,
    distance) in ORIGINAL id order."""
    ia = b["_orig_a"].to_numpy(zero_copy_only=False)
    ib = b["_orig_b"].to_numpy(zero_copy_only=False)
    swap = ia > ib
    id_type = b.schema.field("_orig_a").type
    return pa.table({
        "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
        "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
        "distance": pa.array(
            b["distance"].to_numpy(zero_copy_only=False).astype(np.int32),
            type=pa.int32())})


def _translate_pair_keys(ds, pairs, id_col: str,
                         broadcast_cap: int = 1 << 30,
                         driver_pairs_cap: int = 256 << 20):
    """Replace int64 id-hash keys in ``pairs`` (id_a, id_b, distance) with
    the original ids: one broadcast-filtered scan of the id column builds
    the (key → id) table for CANDIDATE keys only, then a vectorized gather
    maps the pairs back (candidates-proportional, nothing big driverside).
    id_a < id_b is re-established in ORIGINAL id order.

    Cap-gated like dedup.minhash: pairs dedup on the driver under
    ``driver_pairs_cap`` else distributed; keymap gathered under
    ``broadcast_cap`` else two distributed ``Dataset.join``s translate
    the pairs without any driver residency."""
    import ray
    import ray.data as rd

    from ..dedup.pairsops import collect_keys_if_small, distinct_pairs, \
        pair_key_dataset
    from ..sketches.hashing import hash64_array
    from ..util import worker_cached

    id_type = ds.schema().base_schema.field(id_col).type
    empty = pa.table({"id_a": pa.array([], type=id_type),
                      "id_b": pa.array([], type=id_type),
                      "distance": pa.array([], type=pa.int32())})
    pairs = pairs.materialize()
    kdf = pairs_ds = None
    if pairs.size_bytes() <= driver_pairs_cap:
        # cross-band/partition dedup on the driver: the key pairs feed
        # the broadcast candidate set anyway (16 B/pair)
        kdf = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
        if kdf.empty:
            return rd.from_arrow(empty)
        wanted = np.unique(np.concatenate([kdf["id_a"].to_numpy(),
                                           kdf["id_b"].to_numpy()]))
    else:
        pairs_ds = distinct_pairs(pairs, ["id_a", "id_b"]).materialize()
        keys_ds = pair_key_dataset(pairs_ds, ["id_a", "id_b"]
                                   ).materialize()
        wanted = collect_keys_if_small(keys_ds, broadcast_cap)

    if wanted is not None:
        wanted_ref = ray.put(wanted)

        def keymap_batch(b: pa.Table) -> pa.Table:
            w = worker_cached(("phash_wanted", wanted_ref.hex()),
                              lambda: ray.get(wanted_ref))
            keys = hash64_array(b.column(id_col)).view(np.int64)
            pos = np.clip(np.searchsorted(w, keys), 0, len(w) - 1)
            sel = (w[pos] == keys) if len(w) else np.zeros(len(keys), bool)
            idx = pa.array(np.nonzero(sel)[0], type=pa.int64())
            return pa.table({"key": pa.array(keys[np.nonzero(sel)[0]]),
                             id_col: b.column(id_col).take(idx)})

        keymap = ds.select_columns([id_col]).map_batches(
            keymap_batch, batch_format="pyarrow",
            zero_copy_batch=True).materialize()  # candidates only
    else:
        def key_all(b: pa.Table) -> pa.Table:
            keys = hash64_array(b.column(id_col)).view(np.int64)
            return pa.table({"key": pa.array(keys),
                             id_col: b.column(id_col)})

        keyed = ds.select_columns([id_col]).map_batches(
            key_all, batch_format="pyarrow", zero_copy_batch=True)
        keymap = keyed.join(keys_ds, "inner", 8,
                            on=("key",)).materialize()

    if kdf is not None and keymap.size_bytes() <= broadcast_cap:
        mdf = keymap.to_pandas()
        order = np.argsort(mdf["key"].to_numpy())
        mkeys = mdf["key"].to_numpy()[order]
        mids = mdf[id_col].to_numpy()[order]
        # final gather right here — the pair set is driver-resident
        # already, and a one-block map_batches stage costs a whole Ray
        # execution
        ka = kdf["id_a"].to_numpy()
        kb = kdf["id_b"].to_numpy()
        ia = mids[np.searchsorted(mkeys, ka)]
        ib = mids[np.searchsorted(mkeys, kb)]
        swap = ia > ib
        return rd.from_arrow(pa.table({
            "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
            "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
            "distance": pa.array(kdf["distance"].to_numpy(),
                                 type=pa.int32())}))
    if pairs_ds is None:
        pairs_ds = rd.from_arrow(pa.Table.from_pandas(
            kdf, preserve_index=False))
    elif pairs_ds.count() == 0:
        return rd.from_arrow(empty)
    left = pairs_ds.join(
        keymap.rename_columns({"key": "id_a", id_col: "_orig_a"}),
        "inner", 8, on=("id_a",))
    both = left.join(
        keymap.rename_columns({"key": "id_b", id_col: "_orig_b"}),
        "inner", 8, on=("id_b",))
    return both.map_batches(_swap_translated_batch, batch_format="pyarrow",
                            zero_copy_batch=True)


def phash_near_duplicates(ds, id_col: str = "image_id",
                          phash_col: str = "phash", max_distance: int = 4,
                          bands: int = None, max_bucket: int = 1024,
                          num_partitions: int = None,
                          batch_size: int = 131072,
                          rows_hint: int = None):
    """Dataset → Dataset of near-dup pairs ``(id_a, id_b, distance)`` with
    id_a < id_b; recall 1 for Hamming distance ≤ max_distance (module doc),
    distances verified exactly. String/binary id columns shuffle as int64
    id hashes (×bands rows of 8 bytes instead of the full string) and are
    translated back after the pair dedup.

    ``rows_hint`` (optional, from callers that know the input row count):
    caps the partition count so each hash partition targets ≥ ~16k band
    rows — more partitions than the data warrants only buys shuffle-task
    overhead (measured ~0.7 s of the stage's fixed cost at 100k rows /
    64 parts). At scale the row-derived count exceeds the cluster-derived
    one and ``auto_partitions()`` governs as before."""
    if bands is None:
        bands = max_distance + 1
    assert max_distance < bands, "bands must exceed max_distance for recall 1"
    import functools

    from ..util import auto_partitions, partitioned_group_apply
    if num_partitions is None:
        num_partitions = auto_partitions()
        if rows_hint:
            num_partitions = min(num_partitions,
                                 max(8, (rows_hint * bands) // 16384))
    id_type = ds.schema().base_schema.field(id_col).type
    hash_ids = not (pa.types.is_integer(id_type)
                    or pa.types.is_floating(id_type))
    exploded = ds.select_columns([id_col, phash_col]).map_batches(
        functools.partial(_explode_bands, id_col=id_col,
                          phash_col=phash_col, bands=bands,
                          num_partitions=num_partitions,
                          hash_ids=hash_ids),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    # the explode already stamped ``_part`` (hash of band_id+band_val), so
    # group directly — no second stamping pass, band values never shuffle
    fn = _partition_pairs(id_col, phash_col, max_distance, max_bucket,
                          bands)
    pairs = exploded.groupby("_part").map_groups(
        lambda pdf: fn(pdf.drop(columns=["_part"])),
        batch_format="pandas")
    if hash_ids:
        # cross-band dedup happens driver-side inside the translation
        # (the pair keys are pulled there for the broadcast anyway)
        return _translate_pair_keys(ds, pairs, id_col)
    # the same pair can surface from several bands / partitions
    return partitioned_group_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_partitions=max(8, num_partitions // 4))
