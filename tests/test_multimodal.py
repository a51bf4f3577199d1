"""Multimodal binary-column plumbing tests (X7)."""

from __future__ import annotations

import pytest

from r_e_hive__spark.operators.multimodal import (
    decode_image_stub,
    extract_metadata,
    read_binary_dir,
    write_blob_fixtures,
)


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    write_blob_fixtures(str(d), n=12)
    return str(d)


def test_binary_source_schema(spark, blob_dir):
    df = read_binary_dir(spark, blob_dir)
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    assert df.count() == 12


def test_metadata_extraction(spark, blob_dir):
    meta = extract_metadata(read_binary_dir(spark, blob_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in meta.collect()}
    assert len(rows) == 12
    r0 = rows["proof_0000.bin"]
    assert (r0["kind"], r0["width"], r0["height"], r0["payload_bytes"]) == (
        "image", 16, 16, 64,
    )
    r5 = rows["proof_0005.bin"]
    assert r5["kind"] == "video" and r5["payload_bytes"] == 69


def test_stub_rejects_real_formats():
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"\x89PNG\r\n\x1a\nxxxx")
