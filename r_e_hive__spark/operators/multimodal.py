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
                    meta = decode_image_stub(bytes(content))
                except NotImplementedError:
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
