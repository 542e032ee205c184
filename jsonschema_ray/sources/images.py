"""Deterministic synthetic image+caption corpus (FIXTURES F1).

Schema per BASELINE input_hint: (image_id:string, bytes:large_binary,
w:int32, h:int32, fmt:string, caption:string, phash:int64). Injected
violations ≈ 0.1% total, each class keyed deterministically off the global
row index so ANY shard/batch split reproduces identical rows:

  idx % 2000 == 1  → near-dup pair: pixels of idx-1 + small noise
  idx % 2000 == 3  → duplicate image_id of idx-1           (uniqueness)
  idx % 5000 == 5  → truncated payload                     (decode)
  idx % 5000 == 7  → stored w off by one                   (decode dims)
  idx % 10000 == 9 → h = 8 (< 16 minimum)                  (range rule)
  idx % 10000 == 11→ fmt lies ("gif")                      (enum + magic)
  idx % 5000 == 13 → caption over 256 chars                (maxLength)
  idx % 5000 == 17 → caption with control char             (pattern)
  idx % 10000 == 19→ id excluded from ref_ids universe     (referential)

Generation runs as a Ray Data pipeline (ray.data.range → map_batches actor),
so corpora of any size stream to parquet without driver memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import average_hash, encode_image

IMAGES_ARROW_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("bytes", pa.large_binary()),
    ("w", pa.int32()),
    ("h", pa.int32()),
    ("fmt", pa.string()),
    ("caption", pa.string()),
    ("phash", pa.int64()),
])

_WORDS = ("sunset beach mountain forest river city skyline portrait macro "
          "abstract light shadow winter summer spring autumn street bridge "
          "night cloud bird tree flower stone water glass mirror").split()
_FMTS = ["png", "bmp", "ppm"]


def _row_rng(seed: int, idx: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, idx]))


def _base_pixels(seed: int, idx: int, size_lo: int, size_hi: int):
    """Deterministic pixels + dims for a row (re-derivable for near-dups)."""
    rng = _row_rng(seed, idx)
    w = int(rng.integers(size_lo, size_hi + 1))
    h = int(rng.integers(size_lo, size_hi + 1))
    # content must be phash-DIVERSE (like natural photos): a per-image
    # random low-frequency field dominates luminance, so average-hash bits
    # are ~uniform across the corpus (a pure gradient would put most images
    # into the same few LSH buckets — pathological skew by construction)
    field = rng.integers(0, 256, (8, 8)).astype(np.float64)
    ys = np.linspace(0, 7, h)
    xs = np.linspace(0, 7, w)
    yi, xi = ys.astype(int), xs.astype(int)
    coarse = field[yi][:, xi]  # nearest-neighbor upsample of random 8x8
    grad = np.linspace(0, 96, w)[None, :] + np.linspace(0, 64, h)[:, None]
    px = np.stack([
        (coarse + rng.integers(0, 32, (h, w))) % 256,
        (coarse * float(rng.uniform(0.6, 1.4)) + grad) % 256,
        rng.integers(0, 256, (h, w)),
    ], axis=-1).astype(np.uint8)
    return px, w, h


class GenImagesBatch:
    """map_batches actor over ``ray.data.range(n)`` — input batches carry an
    ``id`` int64 column of global row indices."""

    def __init__(self, seed: int = 42, size_lo: int = 16, size_hi: int = 64,
                 inject: bool = True):
        self.seed = seed
        self.size_lo, self.size_hi = size_lo, size_hi
        self.inject = inject

    def _make_row(self, idx: int):
        seed = self.seed
        inj = self.inject
        near_dup = inj and idx % 2000 == 1
        src_idx = idx - 1 if near_dup else idx
        px, w, h = _base_pixels(seed, src_idx, self.size_lo, self.size_hi)
        rng = _row_rng(seed, idx)
        if near_dup:
            # flip a couple of pixels: phash stays within Hamming ≤4
            px = px.copy()
            px[0, 0] = 255 - px[0, 0]
        fmt = _FMTS[int(rng.integers(0, 3))]
        data = encode_image(px, fmt)
        ph = average_hash(px)
        nw = int(rng.integers(3, 9))
        caption = " ".join(_WORDS[int(i)] for i in
                           rng.integers(0, len(_WORDS), nw))
        image_id = f"img-{idx:012d}"
        if inj:
            if idx % 2000 == 3:
                image_id = f"img-{idx - 1:012d}"  # duplicate id
            if idx % 5000 == 5:
                data = data[:max(8, len(data) // 3)]  # truncated payload
            if idx % 5000 == 7:
                w += 1  # stored dims lie
            if idx % 10000 == 9:
                h = 8  # out of range
            if idx % 10000 == 11:
                fmt = "gif"  # fmt lies vs magic
            if idx % 5000 == 13:
                caption = caption + " pad" * 80  # > 256 chars
            if idx % 5000 == 17:
                caption = caption + "\x01"  # pattern violation
        return image_id, data, w, h, fmt, caption, ph

    def __call__(self, batch) -> pa.Table:
        if isinstance(batch, pa.Table):
            ids = batch.column("id").to_numpy(zero_copy_only=False)
        else:
            ids = np.asarray(batch["id"])
        cols = {name: [] for name in IMAGES_ARROW_SCHEMA.names}
        for idx in ids:
            iid, data, w, h, fmt, cap, ph = self._make_row(int(idx))
            cols["image_id"].append(iid)
            cols["bytes"].append(data)
            cols["w"].append(w)
            cols["h"].append(h)
            cols["fmt"].append(fmt)
            cols["caption"].append(cap)
            cols["phash"].append(ph)
        return pa.table(cols, schema=IMAGES_ARROW_SCHEMA)


def _gen_batch(batch, *, seed, inject, size_lo, size_hi):
    from ..util import worker_cached
    g = worker_cached(("genimages", seed, inject, size_lo, size_hi),
                      lambda: GenImagesBatch(seed=seed, inject=inject,
                                             size_lo=size_lo,
                                             size_hi=size_hi))
    return g(batch)


def generate_images(n: int, seed: int = 42, blocks: int | None = None,
                    inject: bool = True, size_lo: int = 16,
                    size_hi: int = 64, batch_size: int = 2048):
    """→ streaming Dataset of n synthetic image rows."""
    import functools

    import ray.data as rd
    kwargs = {}
    if blocks:
        kwargs["override_num_blocks"] = blocks
    return rd.range(n, **kwargs).map_batches(
        functools.partial(_gen_batch, seed=seed, inject=inject,
                          size_lo=size_lo, size_hi=size_hi),
        batch_format="pyarrow", batch_size=batch_size)


def write_images_corpus(out_dir: str, n: int, num_files: int = 8,
                        seed: int = 42, **kw) -> list[str]:
    """Materialize a corpus as `num_files` parquet fragments (the
    checkpoint/resume unit — SURVEY §4 'validation unit = input fragment').

    Written with preserve_order so fragment contents are deterministic
    (the streaming sink otherwise numbers files by task ARRIVAL order)."""
    import os

    from ray.data import DataContext
    ds = generate_images(n, seed=seed, blocks=num_files, **kw)
    os.makedirs(out_dir, exist_ok=True)
    ctx = DataContext.get_current()
    prev = ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    try:
        ds.write_parquet(out_dir)
    finally:
        ctx.execution_options.preserve_order = prev
    import glob
    return sorted(glob.glob(f"{out_dir}/*.parquet"))


def reference_ids_for(n: int) -> pa.Array:
    """The ref_ids universe (FIXTURES F2): every generated id except the
    deterministic orphan class (idx % 10000 == 19). The duplicate-id
    alias slots (idx % 2000 == 3, whose INJECTED rows carry
    img-(idx-1)) stay IN the universe deliberately: with inject=False
    those rows keep their own id, and a universe that excluded them
    would fabricate orphans in a clean corpus. Under injection they are
    merely unreferenced members — harmless for the data→ref direction
    the referential check runs."""
    ids = [f"img-{i:012d}" for i in range(n) if i % 10000 != 19]
    return pa.array(ids)
