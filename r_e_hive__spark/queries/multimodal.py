"""Declared queries: multimodal binary columns (SURVEY.md §2.11 X7, §2.1 S6).

Rows-only (the oracle has no binary-file reader); exactness is asserted in
tests/test_multimodal.py against the deterministic fixture generator.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from r_e_hive__spark.operators.multimodal import (
    extract_metadata,
    read_binary_dir,
    write_blob_fixtures,
)
from r_e_hive__spark.queries import query

_BLOB_DIR = None


def _blob_dir() -> str:
    global _BLOB_DIR
    if _BLOB_DIR is None:
        _BLOB_DIR = tempfile.mkdtemp(prefix="rehive_blobs_")
        write_blob_fixtures(_BLOB_DIR)
    return _BLOB_DIR


@query(
    "x7_multimodal_metadata",
    None,  # binaryFile source: no oracle view (rows-only)
    survey_rows=("X7", "S6"),
    doc="binaryFile ingest + Arrow-batched metadata extraction (stub decode).",
)
def x7_multimodal_metadata(spark, sf_dir):
    """Binary artifact ingest (payment-proof analog, render-complete-
    deploy.js:181-195) → mapInPandas header decode → typed metadata."""
    blobs = read_binary_dir(spark, _blob_dir())
    meta = extract_metadata(blobs)
    return (
        meta.select(
            F.regexp_extract("path", r"(proof_\d+\.bin)$", 1).alias("file_name"),
            "length",
            "kind",
            "width",
            "height",
            "payload_bytes",
        )
        .orderBy("file_name")
    )
