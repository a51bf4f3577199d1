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
    pos, fmt = 12, None
    data_bytes = data_offset = None
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
            if channels == 0:
                raise ValueError("WAV fmt declares 0 channels")
            fmt = (channels, rate, bits)
        elif cid == b"data" and data_offset is None:
            # FIRST data chunk wins (multiple data chunks are malformed;
            # decode reads the same chunk this metadata describes)
            data_bytes, data_offset = length, pos + 8
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
        "data_offset": data_offset,
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


def wav_decode(b: bytes):
    """Decode PCM samples to a numpy int32 array of shape (n_samples,
    channels), plus the sample rate and bit depth.  Supports the same
    subset wav_meta accepts (PCM, 8/16-bit); 8-bit WAV is unsigned per
    the RIFF spec and is centered to signed here."""
    import numpy as np

    meta = wav_meta(b)
    bits, ch = meta["bits_per_sample"], meta["channels"]
    payload = b[meta["data_offset"] : meta["data_offset"] + meta["data_bytes"]]
    if bits == 16:
        arr = np.frombuffer(payload, dtype="<i2").astype(np.int32)
    elif bits == 8:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise NotImplementedError(f"bits={bits}")
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch), meta["sample_rate"], bits


def wav_encode_pcm(samples, sample_rate: int, bits: int = 16) -> bytes:
    """Encode a (n, channels) integer sample array as PCM WAV —
    byte-deterministic, the inverse of wav_decode (8-bit re-biases to
    unsigned).  This is the REAL encoder; the fixture-ramp generator
    wav_encode stays for hermetic tests."""
    import numpy as np

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    # fail loudly on out-of-range samples: astype would silently WRAP
    # (40000 -> -25536 at 16-bit), emitting corrupt audio
    lo, hi = (-32768, 32767) if bits == 16 else (-128, 127)
    if len(a) and (int(a.min()) < lo or int(a.max()) > hi):
        raise ValueError(
            f"samples out of range for {bits}-bit PCM "
            f"[{lo}, {hi}]: min={int(a.min())} max={int(a.max())}"
        )
    if bits == 16:
        data = a.astype("<i2").tobytes()
    elif bits == 8:
        data = (a + 128).astype(np.uint8).tobytes()
    else:
        raise NotImplementedError(f"bits={bits}")
    frame = ch * bits // 8
    byte_rate = sample_rate * frame
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, frame, bits
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return bytes(hdr) + data


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


# --- MP4 / ISO-BMFF (box walk; container metadata, no sample decode) -------


def is_mp4(b: bytes) -> bool:
    return len(b) >= 12 and b[4:8] == b"ftyp"


def _bmff_boxes(b: bytes, pos: int, end: int):
    """Yield (type, body_start, box_end) for the sibling boxes in
    ``b[pos:end]``.  Handles 64-bit largesize (size==1) and to-end boxes
    (size==0); malformed sizes raise ValueError."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack(">Q", b[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed ISO-BMFF box size")
        yield typ, pos + hdr, pos + size
        pos += size


def mp4_meta(b: bytes) -> dict:
    """Container metadata from the moov tree: movie duration (mvhd),
    per-track handlers (hdlr: has_video/has_audio), the first video
    track's presentation size (tkhd 16.16 fixed-point), and the total
    mdat payload.  Media decode is out of scope (the samples are
    codec-specific streams) — exactly the FLAC/WEBP metadata-only
    contract."""
    if not is_mp4(b):
        raise ValueError("not an ISO-BMFF (ftyp) file")
    timescale = duration = None
    n_tracks = 0
    width = height = None
    has_video = has_audio = False
    mdat_bytes = 0
    for typ, body, endb in _bmff_boxes(b, 0, len(b)):
        if typ == b"mdat":
            mdat_bytes += endb - body
        elif typ == b"moov":
            for t2, b2, e2 in _bmff_boxes(b, body, endb):
                if t2 == b"mvhd":
                    # bounds-check before the byte read: size==hdr boxes are
                    # legal to the walker, so b2 can equal e2 (round-5
                    # review: an IndexError here would escape decode_blob's
                    # degrade-to-null catch list)
                    if b2 >= e2:
                        raise ValueError("empty mvhd box")
                    ver = b[b2]
                    if ver == 1:
                        if b2 + 32 > e2:
                            raise ValueError("truncated mvhd box")
                        timescale, duration = struct.unpack(
                            ">IQ", b[b2 + 20 : b2 + 32]
                        )
                    else:
                        if b2 + 20 > e2:
                            raise ValueError("truncated mvhd box")
                        timescale, duration = struct.unpack(
                            ">II", b[b2 + 12 : b2 + 20]
                        )
                elif t2 == b"trak":
                    n_tracks += 1
                    t_w = t_h = None
                    t_handler = None
                    for t3, b3, e3 in _bmff_boxes(b, b2, e2):
                        if t3 == b"tkhd":
                            if b3 >= e3:
                                raise ValueError("empty tkhd box")
                            ver = b[b3]
                            # v1 body adds 12 bytes over v0 (three 32->64-bit
                            # timestamps): width sits at 88, not 92 (round-5
                            # review — the off-by-4 made every spec-sized v1
                            # tkhd parse as truncated)
                            off = b3 + (88 if ver == 1 else 76)
                            if off + 8 > e3:
                                raise ValueError("truncated tkhd box")
                            w_fp, h_fp = struct.unpack(">II", b[off : off + 8])
                            t_w, t_h = w_fp >> 16, h_fp >> 16
                        elif t3 == b"mdia":
                            for t4, b4, _e4 in _bmff_boxes(b, b3, e3):
                                if t4 == b"hdlr":
                                    t_handler = b[b4 + 8 : b4 + 12]
                    if t_handler == b"vide":
                        has_video = True
                        if width is None and t_w:
                            width, height = t_w, t_h
                    elif t_handler == b"soun":
                        has_audio = True
    if timescale is None:
        raise ValueError("no mvhd box (not a movie file)")
    return {
        "duration_ms": (duration * 1000 // timescale) if timescale else None,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
        "mdat_bytes": mdat_bytes,
    }


def _bmff_box(typ: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + typ + body


def mp4_encode(
    duration_ms: int = 2000,
    width: int = 64,
    height: int = 36,
    mdat_bytes: int = 16,
    timescale: int = 1000,
) -> bytes:
    """Deterministic minimal ISO-BMFF movie: ftyp + zeroed mdat + a moov
    with one video track (mvhd, tkhd with 16.16 size, mdia/hdlr 'vide').
    Structurally valid for any box walker; carries no codec samples —
    the fixture twin of tiff_encode/wav_encode for the video column."""
    ftyp = _bmff_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = _bmff_box(b"mdat", bytes(mdat_bytes))
    dur = duration_ms * timescale // 1000
    mvhd = _bmff_box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, dur)  # v0, ts=create/mod 0
        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)  # rate, volume
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)  # predefined
        + struct.pack(">I", 2),  # next_track_id
    )
    tkhd = _bmff_box(
        b"tkhd",
        # v0: ver+flags(4) creation(4) mod(4) track_id(4) reserved(4) = 20
        struct.pack(">B3xIIII", 0, 0, 0, 1, 0)
        # duration(4) reserved(8) layer/alt/volume/reserved(8) = 20
        + struct.pack(">I8xHHHH", dur, 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 at body+76
    )
    hdlr = _bmff_box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide" + bytes(12) + b"\x00")
    mdia = _bmff_box(b"mdia", hdlr)
    trak = _bmff_box(b"trak", tkhd + mdia)
    moov = _bmff_box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --- MP3 (MPEG-1/2 Layer III frame headers; ID3v2-aware) -------------------

# MPEG-1 Layer III bitrates (kbps) by header index; index 0 = free, 15 = bad
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def is_mp3(b: bytes) -> bool:
    return b[:3] == b"ID3" or (
        len(b) >= 4 and b[0] == 0xFF and (b[1] & 0xE6) == 0xE2  # sync + Layer III
    )


def mp3_meta(b: bytes) -> dict:
    """Walk the Layer III frame stream: (version, bitrate_kbps,
    sample_rate, channels, n_frames, duration_ms, stream_bytes).  An
    ID3v2 tag (syncsafe length) is skipped; VBR streams report the first
    frame's bitrate and an exact frame-walk duration.  Only MPEG-1/2
    Layer III (the 'MP3' profile) is parsed — anything else raises for
    the caller's fall-through."""
    pos = 0
    if b[:3] == b"ID3":
        if len(b) < 10:
            raise ValueError("truncated ID3v2 header")
        pos = 10 + (
            (b[6] << 21) | (b[7] << 14) | (b[8] << 7) | b[9]  # syncsafe
        )
    start = pos
    first = None
    n_frames = 0
    while pos + 4 <= len(b):
        h = b[pos : pos + 4]
        if not (h[0] == 0xFF and (h[1] & 0xE0) == 0xE0):
            break
        ver_bits = (h[1] >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer_bits = (h[1] >> 1) & 0x3  # 1 = Layer III
        if layer_bits != 1 or ver_bits == 1:
            if first is not None:
                break  # false sync in trailing bytes after valid frames:
                # terminate like the frame-length check does (round-5
                # review), don't discard the parsed stream
            raise NotImplementedError("only MPEG-1/2/2.5 Layer III parsed")
        br_idx, sr_idx = h[2] >> 4, (h[2] >> 2) & 0x3
        if br_idx in (0, 15) or sr_idx == 3:
            if first is not None:
                break
            raise ValueError("free/invalid bitrate or bad sample-rate index")
        bitrate = (
            _MP3_BITRATES_V1[br_idx] if ver_bits == 3 else _MP3_BITRATES_V2[br_idx]
        ) * 1000
        rate = _MP3_RATES[ver_bits][sr_idx]
        padding = (h[2] >> 1) & 0x1
        spf = 1152 if ver_bits == 3 else 576  # samples per L3 frame
        frame_len = spf // 8 * bitrate // rate + padding
        if frame_len <= 4 or pos + frame_len > len(b):
            break
        if first is None:
            first = {
                "version": {3: "MPEG1", 2: "MPEG2", 0: "MPEG2.5"}[ver_bits],
                "bitrate_kbps": bitrate // 1000,
                "sample_rate": rate,
                "channels": 1 if (h[3] >> 6) == 3 else 2,
                "_spf": spf,
            }
        n_frames += 1
        pos += frame_len
    if first is None:
        raise ValueError("no Layer III frame at stream start")
    out = {k: v for k, v in first.items() if not k.startswith("_")}
    out["n_frames"] = n_frames
    out["duration_ms"] = n_frames * first["_spf"] * 1000 // first["sample_rate"]
    out["stream_bytes"] = pos - start
    return out


def mp3_encode(
    n_frames: int = 5, bitrate_kbps: int = 64, sample_rate: int = 44100
) -> bytes:
    """Deterministic MPEG-1 Layer III frame stream: valid headers, zeroed
    main data (decodes as silence/garbage but parses everywhere) — the
    audio fixture twin of mp4_encode."""
    br_idx = _MP3_BITRATES_V1.index(bitrate_kbps)
    sr_idx = _MP3_RATES[3].index(sample_rate)
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0xC0]  # no CRC, mono
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + bytes(frame_len - 4)
    return frame * n_frames
