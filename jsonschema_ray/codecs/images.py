"""Pure numpy+zlib image codecs: PNG (RGB8), BMP (24-bit BI_RGB), PPM (P6).

The sandbox has no PIL/imageio wheels (BASELINE.md), so the engine carries
its own lossless codecs for the decode-structural check (north rule:
"decoded-image structural checks … decoded-pixel allclose"). All three are
real, byte-exact implementations — not stubs — sufficient for the synthetic
corpus (FIXTURES F1) and for the per-row invariant tests. Formats the
codecs don't cover (jpeg/webp) raise ImageDecodeError("unsupported"), which
the decode stage reports as a violation or skips per configuration.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PPM (P6, maxval 255)


_MAX_PIXELS = 1 << 28  # 268M px: reject absurd header dims before allocating


def _check_dims(w: int, h: int) -> None:
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ImageDecodeError(f"unreasonable image dimensions {w}x{h}")


def _encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ImageDecodeError("not a P6 ppm")
    # header: magic, whitespace-separated w h maxval, single whitespace
    idx, fields = 2, []
    while len(fields) < 3:
        while idx < len(data) and data[idx:idx + 1].isspace():
            idx += 1
        if idx < len(data) and data[idx:idx + 1] == b"#":  # comment
            while idx < len(data) and data[idx] != 0x0A:
                idx += 1
            continue
        start = idx
        while idx < len(data) and not data[idx:idx + 1].isspace():
            idx += 1
        if start == idx:
            raise ImageDecodeError("truncated ppm header")
        try:
            fields.append(int(data[start:idx]))
        except ValueError:
            raise ImageDecodeError("malformed ppm header field")
    idx += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ImageDecodeError("ppm maxval must be 255")
    _check_dims(w, h)
    need = w * h * 3
    body = data[idx:idx + need]
    if len(body) < need:
        raise ImageDecodeError("truncated ppm body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, 24bpp, bottom-up, BI_RGB)


def _encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up, BGR
        body += px[r, :, ::-1].astype(np.uint8).tobytes()
        body += b"\x00" * pad
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return header + info + bytes(body)


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hsize = struct.unpack_from("<I", data, 14)[0]
    if hsize < 40:
        raise ImageDecodeError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ImageDecodeError("unsupported BMP variant")
    flip = h > 0
    h = abs(h)
    _check_dims(w, h)
    row = w * 3
    stride = row + ((-row) % 4)
    need = offset + stride * h
    if len(data) < need:
        raise ImageDecodeError("truncated BMP body")
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=stride * h, offset=offset)
    raw = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flip:
        raw = raw[::-1]
    return raw[:, :, ::-1].copy()  # BGR → RGB


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filters 0-4 on decode, filter 0 on encode)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload)) + tag + payload \
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)


def _encode_png(px: np.ndarray, level: int = 6) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = px.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) \
        + _chunk(b"IEND", b"")


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 1 (Sub) unfilter, fully vectorized: each channel stream
    (stride bpp) is an independent mod-256 prefix sum — Sub rows never
    read the previous row, so this holds regardless of neighbors."""
    cols = cur.reshape(-1, bpp).astype(np.int64)
    return (np.cumsum(cols, axis=0) & 0xFF).astype(np.uint8).ravel()


def _avg_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 3 (Average) unfilter. Sequential in x by definition
    (out[i] reads out[i-bpp]); plain-Python ints over bytearrays run
    ~10x faster than per-byte numpy scalar arithmetic."""
    cl, pl = cur.tolist(), prev.tolist()
    out = bytearray(len(cl))
    for i in range(min(bpp, len(cl))):
        out[i] = (cl[i] + (pl[i] >> 1)) & 0xFF
    for i in range(bpp, len(cl)):
        out[i] = (cl[i] + ((out[i - bpp] + pl[i]) >> 1)) & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 4 (Paeth) unfilter. Sequential in x (left operand);
    plain-Python ints, same rationale as :func:`_avg_row`."""
    cl, pl = cur.tolist(), prev.tolist()
    out = bytearray(len(cl))
    for i in range(len(cl)):
        left = out[i - bpp] if i >= bpp else 0
        up = pl[i]
        ul = pl[i - bpp] if i >= bpp else 0
        p = left + up - ul
        pa_ = p - left
        if pa_ < 0:
            pa_ = -pa_
        pb = p - up
        if pb < 0:
            pb = -pb
        pc_ = p - ul
        if pc_ < 0:
            pc_ = -pc_
        if pa_ <= pb and pa_ <= pc_:
            pred = left
        elif pb <= pc_:
            pred = up
        else:
            pred = ul
        out[i] = (cl[i] + pred) & 0xFF
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ImageDecodeError("not a PNG")
    pos, w = len(_PNG_SIG), None
    idat = bytearray()
    h = bitdepth = color = None
    while pos + 8 <= len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        payload = data[pos + 8:pos + 8 + ln]
        if len(payload) < ln:
            raise ImageDecodeError("truncated PNG chunk")
        crc = struct.unpack_from(">I", data, pos + 8 + ln)[0] \
            if pos + 12 + ln <= len(data) else None
        if crc is None or crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ImageDecodeError("PNG chunk CRC mismatch")
        if tag == b"IHDR":
            if ln < 13:  # spec: IHDR is exactly 13 bytes; a CRC-valid
                # short chunk must fail as ImageDecodeError, not escape
                # the decode stage's violation handler as IndexError
                raise ImageDecodeError("short PNG IHDR chunk")
            w, h, bitdepth, color = struct.unpack_from(">IIBB", payload)
            interlace = payload[12]
            if bitdepth != 8 or color != 2 or interlace != 0:
                raise ImageDecodeError("unsupported PNG variant")
            _check_dims(w, h)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ImageDecodeError("missing PNG chunks")
    stride = 1 + w * 3
    expected = stride * h
    try:
        # bounded inflate: a decompression-bomb IDAT claiming tiny
        # dimensions must not allocate its full inflated size before the
        # length check — cap the output at expected+1 and treat any
        # overrun (or leftover compressed input still producing bytes)
        # as the same length-mismatch error the unbounded path raised
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
        if len(raw) == expected and dec.unconsumed_tail:
            if dec.decompress(dec.unconsumed_tail, 1):
                raw += b"x"  # force the mismatch branch below
        if len(raw) == expected and not dec.eof:
            # truncated deflate stream (unbounded decompress raised here)
            raise ImageDecodeError("PNG inflate failed: incomplete stream")
    except zlib.error as e:
        raise ImageDecodeError(f"PNG inflate failed: {e}")
    if len(raw) != expected:
        raise ImageDecodeError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters, rows = arr[:, 0], arr[:, 1:]
    # uniform-filter fast paths (our own encoder emits all-None; many real
    # encoders emit all-Up/all-Sub for flat images): the per-row loop
    # collapses to one whole-image numpy op
    if (filters == 0).all():
        return rows.copy().reshape(h, w, 3)
    if (filters == 2).all():  # Up: column-wise prefix sum mod 256
        return (np.cumsum(rows, axis=0, dtype=np.int64) & 0xFF) \
            .astype(np.uint8).reshape(h, w, 3)
    out = np.zeros((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    bpp = 3
    for r in range(h):
        f, cur = filters[r], rows[r]
        if f == 0:
            line = cur.copy()
        elif f == 1:  # Sub — vectorized (independent of prev)
            line = _sub_row(cur, bpp)
        elif f == 2:  # Up
            line = (cur.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            line = _avg_row(cur, prev, bpp)
        elif f == 4:  # Paeth
            line = _paeth_row(cur, prev, bpp)
        else:
            raise ImageDecodeError(f"bad PNG filter {f}")
        out[r] = line
        prev = line
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------------------
# public API

_ENCODERS = {"png": _encode_png, "bmp": _encode_bmp, "ppm": _encode_ppm}
_DECODERS = {"png": _decode_png, "bmp": _decode_bmp, "ppm": _decode_ppm}

_MAGIC = [(b"\x89PNG\r\n\x1a\n", "png"), (b"BM", "bmp"), (b"P6", "ppm"),
          (b"\xff\xd8\xff", "jpeg"), (b"RIFF", "webp"), (b"GIF8", "gif")]


def sniff_format(data: bytes) -> str | None:
    """Magic-number sniff — the decode-structural check's 'fmt matches
    magic' predicate (SURVEY §2.5 'NEW for image payload' row)."""
    for magic, name in _MAGIC:
        if data[:len(magic)] == magic:
            return name
    return None


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt not in _ENCODERS:
        raise ImageDecodeError(f"unsupported encode format {fmt!r}")
    return _ENCODERS[fmt](np.asarray(px, dtype=np.uint8))


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    """bytes → (h, w, 3) uint8. If fmt is None, sniff the magic number."""
    if fmt is None:
        fmt = sniff_format(data)
    if fmt not in _DECODERS:
        raise ImageDecodeError(f"unsupported format {fmt!r}")
    return _DECODERS[fmt](bytes(data))


_LUM = np.array([0.299, 0.587, 0.114])
_BIT_W = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))


def average_hash(px: np.ndarray, grid: int = 8) -> int:
    """64-bit perceptual hash: grid×grid block-mean luminance thresholded at
    its global mean — deterministic from pixel content (FIXTURES F1
    'perceptual-hash stand-in derived from pixel content'). Vectorized via
    2-D reduceat (the per-cell python loop cost ~0.3 ms/image and dominated
    the flagship's decode stage)."""
    lum = px.astype(np.float64) @ _LUM
    # images smaller than the grid: integer-upscale so every grid cell is
    # non-empty (reduceat over zero-width cells divides by zero and
    # collapses the hash to garbage); unchanged for images >= grid
    if lum.shape[0] < grid:
        lum = np.repeat(lum, -(-grid // lum.shape[0]), axis=0)
    if lum.shape[1] < grid:
        lum = np.repeat(lum, -(-grid // lum.shape[1]), axis=1)
    h, w = lum.shape
    ys = (np.arange(grid + 1) * h) // grid
    xs = (np.arange(grid + 1) * w) // grid
    row_sums = np.add.reduceat(lum, ys[:-1], axis=0)
    cells = np.add.reduceat(row_sums, xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs)).astype(np.float64)
    cells /= counts
    bits = (cells > cells.mean()).ravel().astype(np.uint64)
    val = int((bits * _BIT_W).sum())
    return val - (1 << 64) if val >= (1 << 63) else val  # signed int64
