"""Decoded-image structural checks — an actor-pool map_batches stage
(SURVEY §2.5 'NEW for image payload'; north rule 'decoded-image structural
checks').

Checks per row, in order (cheap → expensive, short-circuiting):
  1. magic-number sniff agrees with the claimed ``fmt`` column
  2. payload decodes (real PNG/BMP/PPM codecs — codecs/images.py)
  3. decoded dimensions equal the claimed ``w``/``h`` columns
  4. (optional) recomputed phash matches the stored ``phash`` column

Decode is inherently per-row work over opaque binary payloads, so this
stage is a callable CLASS (codec dispatch + config resolved once per actor)
run with a SMALL batch_size — batches of wide binary rows must fit the
worker heap (ray_guide 'Memory-aware'). The magic sniff (step 1) is
vectorized over the batch; only rows passing it pay the python decode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from ..codecs import ImageDecodeError, average_hash, decode_image, \
    sniff_format

VIOLATION_SCHEMA = pa.schema([
    ("image_id", pa.string()),
    ("keyword", pa.string()),
    ("keyword_location", pa.string()),
    ("instance_location", pa.string()),
    ("offending_value", pa.string()),
    ("message", pa.string()),
])


class DecodeCheckStage:
    def __init__(self, id_col: str = "image_id", bytes_col: str = "bytes",
                 w_col: str = "w", h_col: str = "h", fmt_col: str = "fmt",
                 phash_col: Optional[str] = None,
                 decodable_formats: tuple = ("png", "bmp", "ppm"),
                 extra_cols: tuple = (), sample: float = 1.0,
                 undecodable: str = "violation"):
        self.id_col, self.bytes_col = id_col, bytes_col
        self.w_col, self.h_col, self.fmt_col = w_col, h_col, fmt_col
        self.phash_col = phash_col
        self.decodable = set(decodable_formats)
        # policy for formats the sandbox codecs don't cover (jpeg/webp —
        # SURVEY §2.5 stub note): "violation" flags them, "skip" passes
        # them through (structural checks limited to the magic agreement)
        if undecodable not in ("violation", "skip"):
            raise ValueError(f"undecodable={undecodable!r}")
        self.undecodable = undecodable
        self.extra_cols = tuple(extra_cols)  # copied onto violation rows
        # deterministic sampling for the expensive decode ("sample p% for
        # expensive decode checks", SURVEY §2.6): keyed on the row id hash
        # so the same rows are checked on every run/resume — no extra pass,
        # no RNG state
        self.sample = float(sample)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.sample < 1.0:
            from ..sketches.hashing import hash64_array
            h = hash64_array(batch.column(self.id_col).combine_chunks(),
                             seed=77)
            keep = h < np.uint64(int(self.sample * 2**64))
            batch = batch.filter(pa.array(keep))
            if batch.num_rows == 0:
                empty = {f.name: [] for f in VIOLATION_SCHEMA}
                for c in self.extra_cols:
                    empty[c] = []
                fields = list(VIOLATION_SCHEMA) + [
                    pa.field(c, batch.schema.field(c).type)
                    for c in self.extra_cols]
                return pa.table(empty, schema=pa.schema(fields))
        ids = batch.column(self.id_col).to_pylist()
        blobs = batch.column(self.bytes_col).to_pylist()
        fmts = batch.column(self.fmt_col).to_pylist()
        ws = batch.column(self.w_col).to_pylist()
        hs = batch.column(self.h_col).to_pylist()
        phs = batch.column(self.phash_col).to_pylist() \
            if self.phash_col else None
        extras = {c: batch.column(c).to_pylist() for c in self.extra_cols}
        out = {name: [] for name in VIOLATION_SCHEMA.names}
        for c in self.extra_cols:
            out[c] = []

        def emit(i, msg, off):
            for c in self.extra_cols:
                out[c].append(extras[c][i])
            out["image_id"].append(ids[i])
            out["keyword"].append("x-decode")
            out["keyword_location"].append("/x-decode")
            out["instance_location"].append(f"/{self.bytes_col}")
            out["offending_value"].append(off)
            out["message"].append(msg)

        for i, blob in enumerate(blobs):
            if blob is None:
                emit(i, "x-decode: missing bytes", "null")
                continue
            magic = sniff_format(blob)
            claimed = fmts[i]
            if magic != claimed:
                emit(i, f"x-decode: fmt mismatch (claimed {claimed}, "
                        f"magic {magic})", str(claimed))
                # still attempt decode by magic below
            if magic not in self.decodable:
                if magic == claimed and self.undecodable == "violation":
                    emit(i, f"x-decode: undecodable format {magic}",
                         str(magic))
                continue
            try:
                px = decode_image(blob, magic)
            except ImageDecodeError as e:
                emit(i, f"x-decode: decode failed ({e})",
                     f"bytes[{len(blob)}]")
                continue
            dh, dw = px.shape[0], px.shape[1]
            if dw != ws[i] or dh != hs[i]:
                emit(i, f"x-decode: dimension mismatch "
                        f"(claimed {ws[i]}x{hs[i]}, decoded {dw}x{dh})",
                     f"{ws[i]}x{hs[i]}")
            if phs is not None:
                ph = average_hash(px)
                if ph != phs[i]:
                    emit(i, "x-decode: phash mismatch", str(phs[i]))
        if not self.extra_cols:
            return pa.table(out, schema=VIOLATION_SCHEMA)
        fields = list(VIOLATION_SCHEMA) + [
            pa.field(c, batch.schema.field(c).type) for c in self.extra_cols]
        return pa.table(out, schema=pa.schema(fields))


def _decode_batch(batch: pa.Table, *, cfg_items: tuple) -> pa.Table:
    from ..util import worker_cached
    stage = worker_cached(("decode", cfg_items),
                          lambda: DecodeCheckStage(**dict(cfg_items)))
    return stage(batch)


def decode_violations(ds, batch_size: int = 1024, concurrency=None, **cfg):
    """Dataset → Dataset of decode-check violation rows, as stateless tasks
    with per-worker cached codec config. Small batch_size by default:
    batches carry the full binary payload."""
    import functools
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True,
                  batch_size=batch_size)
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    return ds.map_batches(
        functools.partial(_decode_batch,
                          cfg_items=tuple(sorted(cfg.items()))), **kwargs)
