"""Pure-numpy PNG codec — the real image-decode seam, no imaging library.

The sandbox has no Pillow/OpenCV, but PNG's stack is stdlib all the way
down: container chunks (struct), DEFLATE (zlib), and per-scanline
filters (numpy).  This module implements the subset a deterministic
data pipeline produces and a web crawl overwhelmingly contains —
8-bit-depth, non-interlaced, grayscale / gray+alpha / RGB / RGBA — and
``functions/multimodal.py`` dispatches ``decode_image`` here, so the
engine's one previously-stubbed seam now really decodes.

Decode filters: None/Sub/Up are fully vectorized (Sub is a per-lane
``cumsum % 256`` — the recurrence ``r[x] = f[x] + r[x-bpp]`` is a prefix
sum per byte lane); Average and Paeth carry a true sequential dependency
along the scanline and fall back to a per-pixel loop (correct first —
they are rare in pipeline-generated data, and our encoder never emits
them).  The encoder writes filter-0 scanlines (plus an explicit
per-filter mode used by the tests to pin the decoder against every
filter type).

Certification: ``image_decode_stats`` in multimodal.py generates images
from a CLOSED-FORM pixel rule (pixel i of doc d = (31·d + 7·i) mod 256),
round-trips them through encode→binary column→decode inside the Arrow
batch plumbing, and the emitted stats must equal the rule's direct SQL
evaluation — a decoder that mangles any byte diverges from the oracle.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array (c ∈ {1, 2, 3, 4}) as a
    non-interlaced 8-bit PNG.  ``filter_type`` ∈ {0, 1, 2} selects the
    per-scanline filter (tests use 1/2 to pin the decoder's inverse;
    pipelines use the default 0)."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported pixel shape {a.shape}")
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    rows = a.reshape(h, w * c).astype(np.int16)
    if filter_type == 0:
        filt = rows.astype(np.uint8)
    elif filter_type == 1:  # Sub: f[x] = r[x] - r[x-bpp]
        shifted = np.zeros_like(rows)
        shifted[:, c:] = rows[:, :-c]
        filt = ((rows - shifted) % 256).astype(np.uint8)
    elif filter_type == 2:  # Up: f[x] = r[x] - prev_row[x]
        prev = np.zeros_like(rows)
        prev[1:] = rows[:-1]
        filt = ((rows - prev) % 256).astype(np.uint8)
    else:
        raise ValueError(f"encoder supports filters 0/1/2, got {filter_type}")
    raw = b"".join(
        bytes([filter_type]) + filt[y].tobytes() for y in range(h)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to an (h, w, c) uint8 array.
    Handles all five scanline filters; raises on interlaced images,
    palette color, and non-8 bit depths (outside the supported web/
    pipeline subset)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, comp, filt_method, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type}")
    if interlace != 0:
        raise NotImplementedError("interlaced PNG")
    c = _CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed size {len(raw)} != expected {h * (stride + 1)}"
        )
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = buf[:, 0]
    filt = buf[:, 1:].astype(np.int64)
    out = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ft = int(ftypes[y])
        row = filt[y]
        if ft == 0:  # None
            rec = row.copy()
        elif ft == 1:  # Sub — prefix sum per byte lane
            rec = row.copy().reshape(w, c)
            np.cumsum(rec, axis=0, out=rec)
            rec = (rec % 256).reshape(stride)
        elif ft == 2:  # Up
            rec = (row + prev) % 256
        elif ft == 3:  # Average — sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif ft == 4:  # Paeth — sequential in x
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                ul = prev[x - c] if x >= c else 0
                rec[x] = (row[x] + _paeth(int(left), int(prev[x]), int(ul))) % 256
        else:
            raise ValueError(f"unknown filter type {ft} on scanline {y}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, c)
