"""Multimodal transform stages: image resize, image feature extraction,
video frame sampling, audio feature extraction — actor-pool / map_batches
stages over opaque ``binary`` payload columns with typed metadata.

No reference analog (the reference validates one value at a time); these
are the transform stages a large-scale training-data pipeline runs after
validation (prompt: "decode / feature-extract / resize / frame-sample as
actor-pool map_batches stages").

Image paths are REAL (pure-numpy PNG/BMP/PPM codecs, codecs/images.py).
Video/audio decoding has no library in this container, so those stages
implement the full Ray-side contract (schema, batch sizing, actor
signature, output layout) over a deterministic fake decoder that is
clearly marked — swap ``_fake_video_frames`` / ``_fake_audio_samples``
for pyav/soundfile when available.

Scale notes: payload columns mean SMALL batch sizes (the flagship's
adaptive_batch_size pattern); all stages are stateless per batch with
per-worker cached config, so they run as task-pool map_batches and
stream; outputs carry only derived small columns unless the transformed
payload is requested (``keep_bytes``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs.images import decode_image, encode_image


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy, exact + deterministic)."""
    h, w = px.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[rows[:, None], cols[None, :]]


def image_features(px: np.ndarray) -> dict:
    """Cheap per-image features: mean/std brightness, per-channel means,
    edge density (gradient magnitude above threshold)."""
    f = px.astype(np.float32)
    gray = f.mean(axis=2) if f.ndim == 3 else f
    gy, gx = np.gradient(gray)
    mag = np.hypot(gx, gy)
    return {
        "brightness_mean": float(gray.mean()),
        "brightness_std": float(gray.std()),
        "r_mean": float(f[..., 0].mean()) if f.ndim == 3 else 0.0,
        "g_mean": float(f[..., 1].mean()) if f.ndim == 3 else 0.0,
        "b_mean": float(f[..., 2].mean()) if f.ndim == 3 else 0.0,
        "edge_density": float((mag > 24.0).mean()),
    }


def image_quality(px: np.ndarray) -> dict:
    """Perceptual-quality signals an image-corpus curation pass filters
    on: blur (variance of the interior 3×3 Laplacian — flat/defocused
    images score ~0), RMS contrast of the gray plane, and the
    constant-border area fraction (letterbox/pillarbox detection: the
    run of edge rows/columns whose pixels are all identical)."""
    f = px.astype(np.float64)
    gray = f.mean(axis=2) if f.ndim == 3 else f
    h, w = gray.shape
    if h >= 3 and w >= 3:
        lap = (gray[:-2, 1:-1] + gray[2:, 1:-1] + gray[1:-1, :-2]
               + gray[1:-1, 2:] - 4.0 * gray[1:-1, 1:-1])
        blur_var = float(lap.var())
    else:
        # no interior Laplacian exists — "unmeasurable" must stay
        # distinguishable from "defocused" (null-score policy)
        blur_var = None
    rms = float(gray.std())

    def _leading_const(const: np.ndarray) -> int:
        nc = np.flatnonzero(~const)
        return int(nc[0]) if len(nc) else len(const)

    # a row/column is "constant" when every PIXEL in it equals the
    # first pixel — compared per channel, so a solid COLORED bar
    # (channels differing within the pixel) still counts (review pin)
    axes_row = tuple(range(1, f.ndim))
    axes_col = (0, 2)[:f.ndim - 1]
    row_const = (f == f[:, :1]).all(axis=axes_row)
    col_const = (f == f[:1, :]).all(axis=axes_col)
    top = _leading_const(row_const)
    bot = _leading_const(row_const[::-1]) if top < h else 0
    left = _leading_const(col_const)
    right = _leading_const(col_const[::-1]) if left < w else 0
    inner = max(h - top - bot, 0) * max(w - left - right, 0)
    return {
        "blur_var": blur_var,
        "rms_contrast": rms,
        "border_frac": float(1.0 - inner / (h * w)) if h * w else 1.0,
    }


def _per_image_scores(ds, scorer, names: list[str],
                      bytes_col: str, fmt_col: str, id_col: str,
                      batch_size: int):
    """Shared decode-and-score skeleton for the per-image feature
    stages: decode each row, apply ``scorer(px) -> dict``, emit one
    float64 column per name; undecodable rows get null scores
    (transform policy: validation stages report them)."""

    def fn(b: pa.Table) -> pa.Table:
        data = b.column(bytes_col).to_pylist()
        fmts = b.column(fmt_col).to_pylist() \
            if fmt_col in b.column_names else [None] * len(data)
        rows = []
        for d, f in zip(data, fmts):
            try:
                rows.append(scorer(decode_image(d, f)))
            except Exception:
                rows.append({k: None for k in names})
        cols = {id_col: b.column(id_col)}
        for k in names:
            cols[k] = pa.array([r[k] for r in rows], type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def score_image_quality(ds, bytes_col: str = "bytes",
                        fmt_col: str = "fmt",
                        id_col: str = "image_id",
                        batch_size: int = 256):
    """Decode + perceptual-quality columns (blur/contrast/border) — the
    filter signals before training-set admission."""
    return _per_image_scores(
        ds, image_quality, ["blur_var", "rms_contrast", "border_frac"],
        bytes_col, fmt_col, id_col, batch_size)


def resize_images(ds, out_h: int, out_w: int, bytes_col: str = "bytes",
                  fmt_col: str = "fmt", id_col: str = "image_id",
                  out_fmt: str = "ppm", batch_size: int = 256,
                  keep_bytes: bool = True):
    """Decode → nearest-neighbor resize → re-encode, streaming. Rows that
    fail to decode pass through with null output (policy: validation
    stages report them; transforms skip them)."""

    def fn(b: pa.Table) -> pa.Table:
        data = b.column(bytes_col).to_pylist()
        fmts = b.column(fmt_col).to_pylist() \
            if fmt_col in b.column_names else [None] * len(data)
        out, ok = [], []
        for d, f in zip(data, fmts):
            try:
                px = decode_image(d, f)
                out.append(encode_image(resize_nearest(px, out_h, out_w),
                                        out_fmt))
                ok.append(True)
            except Exception:
                out.append(None)
                ok.append(False)
        cols = {
            id_col: b.column(id_col),
            "resized_ok": pa.array(ok, type=pa.bool_()),
            "out_w": pa.array([out_w] * len(data), type=pa.int32()),
            "out_h": pa.array([out_h] * len(data), type=pa.int32()),
        }
        if keep_bytes:
            cols["resized_bytes"] = pa.array(out, type=pa.large_binary())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def extract_image_features(ds, bytes_col: str = "bytes",
                           fmt_col: str = "fmt",
                           id_col: str = "image_id",
                           batch_size: int = 256):
    """Decode + per-image feature columns (brightness/channel/edge)."""
    return _per_image_scores(
        ds, image_features,
        ["brightness_mean", "brightness_std", "r_mean", "g_mean",
         "b_mean", "edge_density"],
        bytes_col, fmt_col, id_col, batch_size)


# ---------------------------------------------------------------------------
# video / audio: full Ray-side plumbing over clearly-marked fake decoders


def _fake_video_frames(data: bytes, n_frames: int,
                       h: int = 16, w: int = 16) -> list[np.ndarray]:
    """DETERMINISTIC FAKE decoder (no video library in this container):
    derives n pseudo-frames from the payload bytes. Replace with a real
    pyav/ffmpeg decode — the stage contract (signature, batching, output
    schema) is what this exercises."""
    seed = np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for _ in range(n_frames)]


def sample_video_frames(ds, every_n: int = 10, max_frames: int = 3,
                        bytes_col: str = "bytes", id_col: str = "video_id",
                        frame_fmt: str = "ppm", batch_size: int = 64):
    """Frame-sampling stage: one output row per sampled frame
    ``(id, frame_index, frame_bytes, frame_phash)``. Small batches — the
    payload is large and the output multiplies rows ×max_frames."""
    from ..codecs.images import average_hash

    def fn(b: pa.Table) -> pa.Table:
        ids, fidx, fbytes, fhash = [], [], [], []
        data = b.column(bytes_col).to_pylist()
        vids = b.column(id_col).to_pylist()
        for vid, d in zip(vids, data):
            frames = _fake_video_frames(d or b"", max_frames)
            for j, px in enumerate(frames):
                ids.append(vid)
                fidx.append(j * every_n)
                fbytes.append(encode_image(px, frame_fmt))
                fhash.append(average_hash(px))
        # id column pinned to the INPUT id type: pa.array([]) would infer
        # null for an empty batch (and re-infer string for large_string
        # ids), producing blocks whose schemas disagree
        return pa.table({
            id_col: pa.array(ids, type=b.schema.field(id_col).type),
            "frame_index": pa.array(fidx, type=pa.int32()),
            "frame_bytes": pa.array(fbytes, type=pa.large_binary()),
            # average_hash returns SIGNED int64 (bit 63 set ~half the
            # time); a uint64 detour errors on negative ints under
            # numpy >= 2 and was a no-op identity round-trip anyway
            "frame_phash": pa.array(np.array(fhash, dtype=np.int64)),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)


def _fake_audio_samples(data: bytes, n: int = 4096) -> np.ndarray:
    """DETERMINISTIC FAKE pcm decoder (no audio library here) — replace
    with soundfile/librosa; the Ray-side contract is real."""
    seed = np.frombuffer(data[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.standard_normal(n).astype(np.float32)


def extract_audio_features(ds, bytes_col: str = "bytes",
                           id_col: str = "audio_id",
                           batch_size: int = 256):
    """Audio feature stage: rms, zero-crossing rate, spectral centroid
    (rfft) per clip over the (fake-)decoded pcm."""

    def fn(b: pa.Table) -> pa.Table:
        data = b.column(bytes_col).to_pylist()
        rms, zcr, cent = [], [], []
        for d in data:
            x = _fake_audio_samples(d or b"")
            rms.append(float(np.sqrt((x * x).mean())))
            zcr.append(float((np.diff(np.signbit(x)) != 0).mean()))
            spec = np.abs(np.fft.rfft(x))
            freqs = np.arange(len(spec))
            s = spec.sum()
            cent.append(float((freqs * spec).sum() / s) if s else 0.0)
        return pa.table({
            id_col: b.column(id_col),
            "rms": pa.array(rms, type=pa.float64()),
            "zcr": pa.array(zcr, type=pa.float64()),
            "spectral_centroid": pa.array(cent, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=batch_size)
