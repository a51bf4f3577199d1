"""Multimodal (binary) columns (SURVEY.md §2.11 X7; S6).

The reference stores uploaded payment-proof files on disk and serves them by
URL (multer, render-complete-deploy.js:181-195, 620, 881) — a path column
pointing at binary artifacts.  The engine treats such artifacts as
first-class *binary columns*:

- ingest via ``spark.read.format("binaryFile")`` (path, modificationTime,
  length, content) joined to rows on the path column;
- decode / feature-extraction as Arrow-batched ``mapInPandas`` operators.

The container has no image/audio codecs, so the decode step is STUBBED:
``decode_image_stub`` parses only the deterministic fake header written by
``write_blob_fixtures`` and raises ``NotImplementedError`` for real formats.
The Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested (tests/test_multimodal.py).

At 100 TB: binary files are ingested once into Parquet with the binary
payload as a ``BinaryType`` column (row-group sized by
``spark.sql.files.maxPartitionBytes``), metadata columns first so pruning
can skip payload pages entirely.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Deterministic fake format: magic 'REHV' + u16 width + u16 height + u8 kind
_MAGIC = b"REHV"
_KINDS = {0: "image", 1: "audio", 2: "video"}


def write_blob_fixtures(dir_path: str, n: int = 24) -> list[str]:
    """Write n deterministic fake binary artifacts (payment-proof analogs)."""
    os.makedirs(dir_path, exist_ok=True)
    paths = []
    for i in range(n):
        w, h, kind = 16 + (i * 7) % 240, 16 + (i * 13) % 240, i % 3
        payload = bytes((i * 31 + j * 7) % 256 for j in range(64 + i))
        p = os.path.join(dir_path, f"proof_{i:04d}.bin")
        with open(p, "wb") as f:
            f.write(_MAGIC + struct.pack("<HHB", w, h, kind) + payload)
        paths.append(p)
    return paths


import functools


@functools.lru_cache(maxsize=1)
def real_format_fixtures() -> dict[str, bytes]:
    """Deterministic REAL-format blobs (round 4): an 8-bit RGB PNG through
    the actual png_codec encoder, a PCM WAV, and a 24-bit BMP — so the
    declared X7 query exercises the real parsers, not only the REHV stub.
    Cached: the registry's golden oracle needs the PNG byte length at
    import time and the fixture writer needs the same bytes again —
    encode once (code-review r4)."""
    import numpy as np

    from r_e_hive__spark.functions import media_codec as M
    from r_e_hive__spark.functions import png_codec as C

    x, y = np.meshgrid(np.arange(20), np.arange(12))
    img = np.stack(
        [(x * 9 + y * 4) % 256, (x * 3 + y * 17) % 256, (x + y * 29) % 256],
        axis=-1,
    ).astype(np.uint8)
    return {
        "real_0000.png": C.png_encode(img),
        "real_0001.wav": M.wav_encode(1234, sample_rate=8000, channels=1, bits=16),
        "real_0002.bmp": M.bmp_encode(17, 9),
        "real_0003.tif": M.tiff_encode(11, 7),
        # round 5: video/audio containers (ISO-BMFF box tree; Layer III
        # frame stream) — metadata-only parse, like WEBP/FLAC
        "real_0004.mp4": M.mp4_encode(duration_ms=2000, width=64, height=36,
                                      mdat_bytes=16),
        "real_0005.mp3": M.mp3_encode(n_frames=5, bitrate_kbps=64,
                                      sample_rate=44100),
    }


def write_real_blob_fixtures(dir_path: str) -> list[str]:
    """Write the real-format fixtures alongside the REHV blobs."""
    os.makedirs(dir_path, exist_ok=True)
    paths = []
    for fname, blob in real_format_fixtures().items():
        p = os.path.join(dir_path, fname)
        with open(p, "wb") as f:
            f.write(blob)
        paths.append(p)
    return paths


def read_binary_dir(spark: SparkSession, dir_path: str) -> DataFrame:
    """binaryFile source: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").load(dir_path)


_META_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("length", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload_bytes", LongType(), True),
    ]
)


def decode_image_stub(content: bytes) -> dict:
    """Parse the deterministic fake header; real codecs are out of scope in
    this container (STUB — see module docstring)."""
    if content[:4] != _MAGIC:
        raise NotImplementedError(
            "real image/audio decoding requires codec libraries not present "
            "in this environment; only REHV fixture blobs are supported"
        )
    w, h, kind = struct.unpack("<HHB", content[4:9])
    return {
        "kind": _KINDS.get(kind),
        "width": w,
        "height": h,
        "payload_bytes": len(content) - 9,
    }


def _pillow_meta(content: bytes) -> dict | None:
    """Capability-gated Pillow fallback for formats the built-in parsers
    don't cover (WEBP/TIFF/BMP/...).  Returns None when Pillow is absent —
    the container ships without it; on a real cluster this path activates
    automatically."""
    try:
        import io

        from PIL import Image  # noqa: import-not-at-top
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(content)) as im:
            return {
                "kind": "image",
                "width": int(im.width),
                "height": int(im.height),
                "payload_bytes": int(im.width) * int(im.height) * len(im.getbands()),
            }
    except Exception:
        return None


def decode_blob(content: bytes) -> dict:
    """Best-effort blob metadata: REHV fixture header, then REAL formats.

    PNG/JPEG/GIF are parsed with the pure-stdlib parsers in
    functions/png_codec.py (no codec library needed for metadata — PNG pixel
    decode is also real, via zlib); WAV (RIFF walk) and BMP come from
    functions/media_codec.py; anything else tries Pillow when importable.
    ``payload_bytes`` = decoded pixel bytes (w*h*channels) for images, PCM
    data bytes for audio, payload length for REHV blobs."""
    from r_e_hive__spark.functions import media_codec as M
    from r_e_hive__spark.functions import png_codec as C

    if content[:4] == _MAGIC:
        return decode_image_stub(content)
    # WAV/BMP magics are short (4/2 bytes): a malformed or false-positive
    # match falls THROUGH to the Pillow probe / not-implemented tail instead
    # of failing the whole query (best-effort contract; code-review r4).
    if M.is_wav(content):
        try:
            wm = M.wav_meta(content)
            return {
                "kind": "audio",
                "width": None,
                "height": None,
                "payload_bytes": wm["data_bytes"],
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    if M.is_bmp(content):
        try:
            w, h, bpp = M.bmp_meta(content)
            return {
                "kind": "image",
                "width": w,
                "height": h,
                "payload_bytes": w * h * (bpp // 8),
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    # PNG/JPEG/GIF get the same fall-through contract as every other
    # branch: a truncated/corrupt header degrades to the Pillow probe /
    # null row, never an uncaught exception out of the Arrow batch
    # (round-4 code review).
    if C.is_png(content):
        try:
            w, h, depth, color = C.png_meta(content)
            ch = {0: 1, 2: 3, 6: 4}.get(color)
            return {
                "kind": "image",
                "width": w,
                "height": h,
                "payload_bytes": (w * h * ch * depth // 8) if ch else None,
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    if content[:2] == b"\xff\xd8":
        try:
            w, h = C.jpeg_dims(content)
            return {"kind": "image", "width": w, "height": h, "payload_bytes": w * h * 3}
        except (ValueError, NotImplementedError, struct.error):
            pass
    if content[:6] in (b"GIF87a", b"GIF89a"):
        try:
            w, h = C.gif_dims(content)
            return {"kind": "image", "width": w, "height": h, "payload_bytes": w * h * 3}
        except (ValueError, NotImplementedError, struct.error):
            pass
    # TIFF / WEBP / FLAC (round 4 breadth): same short-magic fall-through
    # contract as WAV/BMP above.
    if M.is_tiff(content):
        try:
            w, h, bits = M.tiff_meta(content)
            return {
                "kind": "image",
                "width": w,
                "height": h,
                "payload_bytes": w * h * 3 * bits // 8,
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    if M.is_webp(content):
        try:
            w, h, _variant = M.webp_meta(content)
            return {"kind": "image", "width": w, "height": h, "payload_bytes": w * h * 3}
        except (ValueError, NotImplementedError, struct.error):
            pass
    if M.is_flac(content):
        try:
            fm = M.flac_meta(content)
            return {
                "kind": "audio",
                "width": None,
                "height": None,
                # multiply BEFORE the divide: FLAC allows 4-31-bit samples
                # (12-bit archival audio is common); bits//8 would floor to
                # 0-3 bytes and badly under-report
                "payload_bytes": fm["n_samples"]
                * fm["channels"]
                * fm["bits_per_sample"]
                // 8,
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    # MP4 / MP3 (round 5 breadth: the video/audio container column).  MP4
    # before MP3 — the MP3 frame-sync probe is the loosest magic, so it
    # goes last of the structured parsers.
    if M.is_mp4(content):
        try:
            mm = M.mp4_meta(content)
            return {
                "kind": "video" if mm["has_video"] else "audio",
                "width": mm["width"],
                "height": mm["height"],
                "payload_bytes": mm["mdat_bytes"],
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    if M.is_mp3(content):
        try:
            am = M.mp3_meta(content)
            return {
                "kind": "audio",
                "width": None,
                "height": None,
                "payload_bytes": am["stream_bytes"],
            }
        except (ValueError, NotImplementedError, struct.error):
            pass
    meta = _pillow_meta(content)
    if meta is not None:
        return meta
    raise NotImplementedError(
        "unrecognized blob format and no codec library available"
    )


def extract_metadata(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``mapInPandas``: one pandas batch per input partition slice — the binary
    payloads never round-trip through the driver, and batch size follows
    ``spark.sql.execution.arrow.maxRecordsPerBatch``."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, length, content in zip(
                pdf["path"], pdf["length"], pdf["content"]
            ):
                try:
                    meta = decode_blob(bytes(content))
                except (NotImplementedError, ValueError, struct.error):
                    meta = {
                        "kind": None,
                        "width": None,
                        "height": None,
                        "payload_bytes": None,
                    }
                rows.append({"path": path, "length": length, **meta})
            yield pd.DataFrame(
                rows, columns=[f.name for f in _META_SCHEMA.fields]
            )

    return binary_df.select("path", "length", "content").mapInPandas(
        _extract, _META_SCHEMA
    )


# ---------------------------------------------------------------------------
# Feature extraction / transform / frame sampling (north-star X7 surface)
# ---------------------------------------------------------------------------

_FEAT_DIM = 32

_FEAT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def featurize_blobs(binary_df: DataFrame) -> DataFrame:
    """Deterministic 32-d feature vector per blob: L1-normalized histogram
    of payload bytes over 32 buckets.

    This is the *feature-extract* stage of a multimodal pipeline with the
    codec swapped out: on real data the per-batch body would call an image/
    audio encoder over the same Arrow batches — the Spark plumbing (binary
    in, fixed-width ``array<float>`` out, zero driver round-trips, batch
    size bounded by arrow.maxRecordsPerBatch) is exactly what production
    needs at 100 TB: a narrow map stage, no shuffle, embarrassingly
    parallel."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(arr >> 3, minlength=_FEAT_DIM)[:_FEAT_DIM]
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32))
            yield pd.DataFrame({"path": pdf["path"], "feature": feats})

    return binary_df.select("path", "content").mapInPandas(_feat, _FEAT_SCHEMA)


_RESIZE_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("content", BinaryType(), False),
    ]
)


def resize_images_stub(
    binary_df: DataFrame, max_side: int = 64
) -> DataFrame:
    """Resize stage: cap the longer side at ``max_side`` preserving aspect
    ratio.  REAL for PNG (pure-stdlib decode → nearest-neighbor resample →
    re-encode, functions/png_codec.py) and for the REHV fixture format
    (header rewrite + proportional payload truncation); other formats raise
    ``NotImplementedError`` unless Pillow is importable.  Plumbing shape:
    binary in → binary out, per-row transform, no shuffle."""
    from r_e_hive__spark.functions import png_codec as C

    def _resize_png(raw: bytes) -> tuple[int, int, bytes]:
        import numpy as np

        arr = C.png_decode(raw)
        h, w = arr.shape[:2]
        scale = min(1.0, max_side / max(w, h, 1))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        ys = (np.arange(nh) * h // nh).astype(int)
        xs = (np.arange(nw) * w // nw).astype(int)
        return nw, nh, C.png_encode(arr[ys][:, xs])

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if C.is_png(raw):
                    nw, nh, out = _resize_png(raw)
                elif raw[:4] == _MAGIC:
                    w, h, kind = struct.unpack("<HHB", raw[4:9])
                    scale = min(1.0, max_side / max(w, h, 1))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    payload = raw[9:]
                    keep = max(1, int(len(payload) * scale * scale))
                    out = _MAGIC + struct.pack("<HHB", nw, nh, kind) + payload[:keep]
                else:
                    raise NotImplementedError(
                        "resize supports PNG (built-in codec) and REHV blobs; "
                        "other formats need Pillow"
                    )
                rows.append(
                    {"path": path, "width": nw, "height": nh, "content": out}
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_SCHEMA.fields])

    return binary_df.select("path", "content").mapInPandas(_resize, _RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def sample_frames_stub(
    binary_df: DataFrame, frame_bytes: int = 16, every: int = 2
) -> DataFrame:
    """Frame sampling (video → every-Nth-frame rows) — a one-to-many
    ``mapInPandas`` (UDTF shape: each blob explodes into frame rows).

    The REHV fixture payload is treated as a sequence of ``frame_bytes``
    chunks; rows with kind != video are skipped.  A real decoder would seek
    keyframes instead — same output schema, same partition-parallel shape.
    At 100 TB the fan-out factor (frames per blob) multiplies output volume:
    keep it bounded by ``every`` and let the downstream write repartition by
    output size, not input rows."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if raw[:4] != _MAGIC:
                    raise NotImplementedError(
                        "real video decoding requires codec libraries not "
                        "present in this environment"
                    )
                _, _, kind = struct.unpack("<HHB", raw[4:9])
                if _KINDS.get(kind) != "video":
                    continue
                payload = raw[9:]
                n_frames = len(payload) // frame_bytes
                for idx in range(0, n_frames, every):
                    rows.append(
                        {
                            "path": path,
                            "frame_idx": idx,
                            "frame": payload[
                                idx * frame_bytes : (idx + 1) * frame_bytes
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])

    return binary_df.select("path", "content").mapInPandas(_frames, _FRAME_SCHEMA)


_AUDIO_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("content", BinaryType(), False),
    ]
)


def resample_audio(binary_df: DataFrame, target_rate: int = 8000) -> DataFrame:
    """REAL audio transform: decode PCM WAV samples, nearest-sample
    resample to ``target_rate`` (the audio twin of the image
    nearest-neighbor resize — index map ``floor(i·rate/target)``), and
    re-encode.  Pure stdlib + numpy over Arrow batches; binary in →
    binary out, per-row, no shuffle — the map-only scan shape every
    100 TB media pass must have.  Non-WAV blobs raise
    ``NotImplementedError`` (no silent passthrough: a pipeline that
    thinks it resampled everything must be told it didn't)."""
    import numpy as np

    from r_e_hive__spark.functions import media_codec as MC

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if not MC.is_wav(raw):
                    raise NotImplementedError(
                        "resample_audio supports PCM WAV (built-in codec); "
                        "compressed audio needs an external decoder"
                    )
                samples, rate, bits = MC.wav_decode(raw)
                n = len(samples)
                n_out = max(1, int(n * target_rate / rate)) if n else 0
                idx = (np.arange(n_out) * rate // target_rate).astype(int)
                idx = np.minimum(idx, max(0, n - 1))
                out = MC.wav_encode_pcm(samples[idx], target_rate, bits)
                rows.append(
                    {
                        "path": path,
                        "sample_rate": target_rate,
                        "n_samples": int(n_out),
                        "content": out,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_SCHEMA.fields]
            )

    return binary_df.select("path", "content").mapInPandas(
        _resample, _AUDIO_SCHEMA
    )


_AUDIO_FEAT_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("rms", DoubleType(), False),
        StructField("peak", IntegerType(), False),
    ]
)


def audio_features(binary_df: DataFrame, window: int = 256) -> DataFrame:
    """Windowed RMS/peak over decoded PCM WAV — the real feature-extract
    stage (featurize_blobs is the format-agnostic byte-histogram twin).
    One output row per ``window`` samples (channel-averaged); 4-dp RMS
    for cross-run hash stability."""
    import numpy as np

    from r_e_hive__spark.functions import media_codec as MC

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if not MC.is_wav(raw):
                    raise NotImplementedError("audio_features supports PCM WAV")
                samples, _rate, _bits = MC.wav_decode(raw)
                mono = samples.mean(axis=1)
                for wi in range(0, len(mono), window):
                    chunk = mono[wi : wi + window]
                    # peak over the RAW per-channel samples, not the
                    # channel average: int(0.9) would report quiet-but-
                    # live audio as peak=0 (false silence)
                    raw_win = samples[wi : wi + window]
                    rows.append(
                        {
                            "path": path,
                            "window_idx": wi // window,
                            "rms": round(
                                float(np.sqrt((chunk * chunk).mean())), 4
                            ),
                            "peak": int(np.abs(raw_win).max()),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _AUDIO_FEAT_SCHEMA.fields]
            )

    return binary_df.select("path", "content").mapInPandas(
        _feat, _AUDIO_FEAT_SCHEMA
    )
