"""Pure-stdlib WAV/BMP/TIFF codecs and WEBP/FLAC header parsers
(SURVEY.md §2.11 X7; VERDICT r3 item 6) — siblings of png_codec.py.

Like PNG, none of these need a codec library for the engine's multimodal
surface: WAV is a RIFF container around raw PCM (header walk = full
metadata; the data chunk IS the samples), BMP's BITMAPINFOHEADER and
TIFF's IFD are fixed-layout structs, WEBP is a RIFF container whose
VP8/VP8L/VP8X chunk headers carry the dimensions, and FLAC's mandatory
STREAMINFO block carries the full audio parameters.  WAV/BMP/TIFF also
get deterministic encoders so fixtures are REAL format files, not
synthetic headers — `decode_blob` (operators/multimodal.py) routes on
the magic bytes.

Scope guard: PCM WAV (format tag 1), uncompressed 24-bit BI_RGB BMP,
uncompressed 8-bit RGB TIFF, WEBP/FLAC metadata only (their payloads are
entropy-coded streams — full pixel/sample decode falls through to Pillow
or a real decoder on a production cluster).  Anything else raises so
callers can fall through to richer libraries.
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


# --- TIFF ------------------------------------------------------------------


def is_tiff(b: bytes) -> bool:
    return b[:4] in (b"II*\x00", b"MM\x00*")


def tiff_meta(b: bytes) -> tuple[int, int, int]:
    """(width, height, bits_per_sample) from the first IFD.

    Walks the IFD entry table in either byte order (II little / MM big).
    SHORT or LONG dimension tags are both accepted (the spec allows
    either); BitsPerSample with count>1 (e.g. 8,8,8 RGB) dereferences the
    value offset.  Compressed TIFFs (tag 259 != 1) raise
    NotImplementedError so callers fall through to a real decoder."""
    if not is_tiff(b):
        raise ValueError("not a TIFF")
    bo = "<" if b[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(bo + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ValueError("truncated TIFF: IFD offset past EOF")
    (n_entries,) = struct.unpack(bo + "H", b[ifd_off : ifd_off + 2])
    if ifd_off + 2 + n_entries * 12 > len(b):
        raise ValueError("truncated TIFF IFD")
    width = height = None
    bits, compression, spp, photometric = 1, 1, 1, None

    def _value(entry: bytes) -> int:
        tag, typ, count = struct.unpack(bo + "HHI", entry[:8])
        # SHORT(3) inline in the first 2 value bytes, LONG(4) in all 4.
        if typ == 3 and count == 1:
            return struct.unpack(bo + "H", entry[8:10])[0]
        if typ == 4 and count == 1:
            return struct.unpack(bo + "I", entry[8:12])[0]
        if typ == 3 and count > 1:  # e.g. BitsPerSample = (8,8,8)
            (off,) = struct.unpack(bo + "I", entry[8:12])
            if off + 2 > len(b):
                raise ValueError("truncated TIFF value offset")
            return struct.unpack(bo + "H", b[off : off + 2])[0]
        raise NotImplementedError(f"TIFF value type {typ} count {count}")

    for i in range(n_entries):
        entry = b[ifd_off + 2 + i * 12 : ifd_off + 14 + i * 12]
        (tag,) = struct.unpack(bo + "H", entry[:2])
        if tag == 256:
            width = _value(entry)
        elif tag == 257:
            height = _value(entry)
        elif tag == 258:
            bits = _value(entry)
        elif tag == 259:
            compression = _value(entry)
        elif tag == 262:
            photometric = _value(entry)
        elif tag == 277:
            spp = _value(entry)
    if width is None or height is None:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    if compression != 1:
        raise NotImplementedError(f"compressed TIFF (method {compression})")
    # scope guard (module docstring): only uncompressed 8-bit RGB — a
    # grayscale/palette/CMYK TIFF must fall through to a real decoder, not
    # be mis-reported as w*h*3 pixel bytes (round-4 code review)
    if spp != 3 or bits != 8 or photometric not in (None, 2):
        raise NotImplementedError(
            f"non-RGB TIFF (SamplesPerPixel={spp}, bits={bits}, "
            f"photometric={photometric}) needs a full decoder"
        )
    return width, height, bits


def tiff_encode(width: int, height: int) -> bytes:
    """Deterministic uncompressed 8-bit RGB little-endian TIFF: one strip,
    pixel (x,y) a fixed arithmetic pattern.  A real, spec-complete file —
    the same contract as bmp_encode/wav_encode."""
    strip = bytearray()
    for y in range(height):
        for x in range(width):
            strip += bytes(((x * 7 + y * 13 + c * 5) % 256) for c in range(3))
    # layout: header(8) · strip data · BitsPerSample array(6) · IFD
    strip_off = 8
    bps_off = strip_off + len(strip)
    ifd_off = bps_off + 6
    entries = [
        (256, 4, 1, width),  # ImageWidth
        (257, 4, 1, height),  # ImageLength
        (258, 3, 3, bps_off),  # BitsPerSample -> (8,8,8)
        (259, 3, 1, 1),  # Compression = none
        (262, 3, 1, 2),  # Photometric = RGB
        (273, 4, 1, strip_off),  # StripOffsets
        (277, 3, 1, 3),  # SamplesPerPixel
        (278, 4, 1, height),  # RowsPerStrip (single strip)
        (279, 4, 1, len(strip)),  # StripByteCounts
    ]
    out = b"II*\x00" + struct.pack("<I", ifd_off)
    out += bytes(strip)
    out += struct.pack("<HHH", 8, 8, 8)
    out += struct.pack("<H", len(entries))
    for tag, typ, count, value in entries:
        if typ == 3 and count == 1:
            out += struct.pack("<HHIHH", tag, typ, count, value, 0)
        else:
            out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)  # next-IFD terminator
    return out


# --- WEBP (RIFF container; header-only metadata) ---------------------------


def is_webp(b: bytes) -> bool:
    return b[:4] == b"RIFF" and b[8:12] == b"WEBP"


def webp_meta(b: bytes) -> tuple[int, int, str]:
    """(width, height, variant) from the first VP8/VP8L/VP8X chunk.

    - VP8  (lossy):   frame tag + '\\x9d\\x01\\x2a' sync + 14-bit w/h
    - VP8L (lossless): 0x2F signature + packed 14-bit (w-1),(h-1)
    - VP8X (extended): 24-bit (w-1),(h-1) canvas size
    Metadata only — the payload is an entropy-coded stream (scope guard in
    the module docstring)."""
    if not is_webp(b):
        raise ValueError("not a WEBP")
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (length,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + length]
        if cid == b"VP8 ":
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("malformed VP8 frame header")
            w, h = struct.unpack("<HH", body[6:10])
            return w & 0x3FFF, h & 0x3FFF, "lossy"
        if cid == b"VP8L":
            if len(body) < 5 or body[0] != 0x2F:
                raise ValueError("malformed VP8L signature")
            (bits,) = struct.unpack("<I", body[1:5])
            return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1, "lossless"
        if cid == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X chunk")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h, "extended"
        pos += 8 + length + (length & 1)
    raise ValueError("WEBP missing VP8/VP8L/VP8X chunk")


# --- FLAC (STREAMINFO metadata block) --------------------------------------


def is_flac(b: bytes) -> bool:
    return b[:4] == b"fLaC"


def flac_meta(b: bytes) -> dict:
    """(channels, sample_rate, bits_per_sample, n_samples) from the
    mandatory STREAMINFO block (always first, spec §: METADATA_BLOCK).
    Sample decode is out of scope (entropy-coded frames)."""
    if not is_flac(b):
        raise ValueError("not a FLAC file")
    if len(b) < 4 + 4 + 34:
        raise ValueError("truncated FLAC header")
    if b[4] & 0x7F != 0:  # first block must be STREAMINFO (type 0)
        raise ValueError("FLAC first metadata block is not STREAMINFO")
    info = b[8:42]
    # bits 80..: 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit samples
    packed = int.from_bytes(info[10:18], "big")
    return {
        "sample_rate": (packed >> 44) & 0xFFFFF,
        "channels": ((packed >> 41) & 0x7) + 1,
        "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
        "n_samples": packed & 0xFFFFFFFFF,
    }


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
