"""Minimal pure-stdlib PNG codec + image header parsers (SURVEY.md §2.11 X7).

This container ships no image libraries, but PNG needs none: the format is
zlib (stdlib) + per-scanline filters.  This module implements a real,
deterministic codec for 8-bit grayscale / RGB / RGBA PNGs — enough to make
the multimodal operators decode *actual image formats* end-to-end rather
than only the REHV fixture header — plus header-only dimension parsers for
JPEG and GIF (metadata extraction needs no pixel decode at all).

Scope guard: bit depth 8, color types 0/2/6, no interlace, no palette.
Anything else raises ``NotImplementedError`` so callers can fall through to
Pillow when it exists (operators/multimodal.py's capability check).
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color_type -> samples per pixel


def is_png(b: bytes) -> bool:
    return b[:8] == PNG_MAGIC


def _chunks(b: bytes):
    pos = 8
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            break


def png_meta(b: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — header-only."""
    if not is_png(b):
        raise ValueError("not a PNG")
    for ctype, data in _chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            return w, h, depth, color
    raise ValueError("PNG missing IHDR")


def png_decode(b: bytes):
    """Decode to a numpy uint8 array of shape (h, w, channels).

    Implements all five scanline filters (None/Sub/Up/Average/Paeth) —
    a complete decoder for the supported subset, not a fixture parser."""
    import numpy as np

    w, h, depth, color = png_meta(b)
    if depth != 8 or color not in _CHANNELS:
        raise NotImplementedError(
            f"png_decode supports 8-bit color types {sorted(_CHANNELS)}; "
            f"got depth={depth} color_type={color}"
        )
    ch = _CHANNELS[color]
    idat = b"".join(data for ctype, data in _chunks(b) if ctype == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("corrupt PNG: wrong decompressed size (interlaced?)")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: left-dependent scan
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0  # left
                bb = prev[x]  # up
                c = prev[x - ch] if x >= ch else 0  # up-left
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + bb) // 2
                else:  # Paeth
                    p = a + bb - c
                    pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (bb if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, ch)


def png_encode(arr) -> bytes:
    """Encode a (h, w) or (h, w, {1,3,4}) uint8 array as a PNG (filter 0,
    fixed zlib level => byte-deterministic for identical input)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def jpeg_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from the first SOF marker — header-only, no decode."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xFF:  # legal fill/padding byte before a marker
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0-3
            if pos + 9 > len(b):
                raise ValueError("truncated JPEG SOF segment")
            h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
            return w, h
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF")


def gif_dims(b: bytes) -> tuple[int, int]:
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", b[6:10])
    return w, h
