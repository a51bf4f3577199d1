"""Pure-stdlib WAV (RIFF) and BMP codecs (SURVEY.md §2.11 X7; VERDICT r3
item 6) — the audio/bitmap siblings of png_codec.py.

Like PNG, neither format needs a codec library for the engine's multimodal
surface: WAV is a RIFF container around raw PCM (header walk = full
metadata; the data chunk IS the samples), and BMP's BITMAPINFOHEADER is a
fixed-layout struct.  Both a parser and a deterministic encoder are
provided so fixtures are REAL format files, not synthetic headers —
`decode_blob` (operators/multimodal.py) routes on the magic bytes.

Scope guard: PCM WAV (format tag 1) and uncompressed 24-bit BI_RGB BMP.
Anything else raises so callers can fall through to richer libraries.
"""

from __future__ import annotations

import struct


# --- WAV / RIFF ------------------------------------------------------------


def is_wav(b: bytes) -> bool:
    return b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def wav_meta(b: bytes) -> dict:
    """Walk the RIFF chunks: (channels, sample_rate, bits_per_sample,
    data_bytes, n_samples) — header-only, no sample decode needed.
    Truncated/malformed containers raise ValueError (never struct.error:
    callers route on exception type — ADVICE-class robustness)."""
    if not is_wav(b):
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data_bytes = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt ":
            if pos + 24 > len(b):
                raise ValueError("truncated WAV fmt chunk")
            tag, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", b[pos + 8 : pos + 24]
            )
            if tag != 1:
                raise NotImplementedError(f"non-PCM WAV (format tag {tag})")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data_bytes = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data_bytes is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt
    frame = max(1, channels * bits // 8)
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits_per_sample": bits,
        "data_bytes": data_bytes,
        "n_samples": data_bytes // frame,
    }


def wav_encode(
    n_samples: int, sample_rate: int = 8000, channels: int = 1, bits: int = 16
) -> bytes:
    """Deterministic PCM WAV: sample k of channel c = a fixed integer ramp
    (no randomness — the determinism contract every fixture follows)."""
    frame = channels * bits // 8
    data = bytearray()
    for k in range(n_samples):
        for c in range(channels):
            v = ((k * 31 + c * 7) % 251) - 125
            if bits == 16:
                data += struct.pack("<h", v * 128)
            elif bits == 8:
                data += struct.pack("<B", (v + 125) % 256)
            else:
                raise NotImplementedError(f"bits={bits}")
    byte_rate = sample_rate * frame
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, frame, bits
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return bytes(hdr) + bytes(data)


# --- BMP -------------------------------------------------------------------


def is_bmp(b: bytes) -> bool:
    return b[:2] == b"BM"


def bmp_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_pixel) from BITMAPINFOHEADER.  A negative
    stored height means top-down row order — dimensions are |height|.

    Structural validation is strict because the 'BM' magic is only two
    bytes: truncated buffers and unknown header sizes raise ValueError,
    non-24-bpp and compressed bitmaps raise NotImplementedError (the
    module's documented scope guard) so callers fall through to a richer
    decoder instead of mis-reporting palette images."""
    if not is_bmp(b):
        raise ValueError("not a BMP")
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    (hdr_size,) = struct.unpack("<I", b[14:18])
    if hdr_size not in (40, 52, 56, 108, 124):  # BITMAPINFOHEADER family
        raise ValueError(f"unknown BMP header size {hdr_size}")
    w, h = struct.unpack("<ii", b[18:26])
    (bpp,) = struct.unpack("<H", b[28:30])
    (compression,) = struct.unpack("<I", b[30:34])
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bpp BMP (palette/alpha) needs Pillow")
    if not (0 < abs(w) < 1 << 24 and 0 < abs(h) < 1 << 24):
        raise ValueError(f"implausible BMP dimensions {w}x{h}")
    return abs(w), abs(h), bpp


def bmp_encode(width: int, height: int) -> bytes:
    """Deterministic 24-bit BI_RGB bottom-up BMP, pixel (x,y) a fixed
    arithmetic pattern; rows padded to 4 bytes per the format."""
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    img_bytes = (row_raw + pad) * height
    hdr = b"BM" + struct.pack("<IHHI", 54 + img_bytes, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_bytes, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        for x in range(width):
            body += bytes(((x * 5 + y * 11 + c * 3) % 256) for c in range(3))
        body += b"\x00" * pad
    return bytes(hdr) + bytes(body)
