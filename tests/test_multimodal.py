"""Multimodal binary-column plumbing tests (X7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_featurize_shape_and_determinism(spark, blob_dir):
    from r_e_hive__spark.operators.multimodal import featurize_blobs

    feats = featurize_blobs(read_binary_dir(spark, blob_dir))
    rows = {r["path"].rsplit("/", 1)[-1]: r["feature"] for r in feats.collect()}
    assert len(rows) == 12
    v = rows["proof_0000.bin"]
    assert len(v) == 32
    assert abs(sum(v) - 1.0) < 1e-5  # L1-normalized histogram
    # deterministic across runs/partitionings
    again = {
        r["path"].rsplit("/", 1)[-1]: r["feature"]
        for r in featurize_blobs(
            read_binary_dir(spark, blob_dir).repartition(5)
        ).collect()
    }
    assert again == rows


def test_resize_caps_long_side(spark, blob_dir):
    from r_e_hive__spark.operators.multimodal import (
        extract_metadata,
        resize_images_stub,
    )

    resized = resize_images_stub(read_binary_dir(spark, blob_dir), max_side=32)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in resized.collect()}
    assert len(rows) == 12
    assert all(max(r["width"], r["height"]) <= 32 for r in rows.values())
    # output blobs still decode with the same metadata pipeline
    meta = extract_metadata(
        resized.withColumnRenamed("content", "content").select(
            "path", F.lit(0).alias("length"), "content"
        )
    )
    assert meta.where(F.col("kind").isNull()).count() == 0


def test_frame_sampling_only_videos(spark, blob_dir):
    from r_e_hive__spark.operators.multimodal import (
        extract_metadata,
        sample_frames_stub,
    )

    src = read_binary_dir(spark, blob_dir)
    frames = sample_frames_stub(src, frame_bytes=16, every=2)
    got = frames.collect()
    n_videos = (
        extract_metadata(src).where(F.col("kind") == "video").count()
    )
    assert n_videos > 0
    assert set(r["path"].rsplit("/", 1)[-1][-8:-4] for r in got) == {
        f"{i:04d}" for i in range(12) if i % 3 == 2
    }
    assert all(r["frame_idx"] % 2 == 0 for r in got)
    assert all(len(r["frame"]) == 16 for r in got)
