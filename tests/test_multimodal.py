"""Multimodal plumbing: binary payload column + Arrow-batched
mapInPandas feature extraction (the decode itself is a deterministic
stub; the Spark-side schema/batching is the part under test)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark_airflow_weather_etl_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
)


def test_extract_features_roundtrip(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "x" * 700), (2, "bytes")],
        ["doc_id", "text"],
    )
    out = {r.asset_id: r for r in extract_features(attach_payload(docs)).collect()}
    assert out[0].media_type == "image"
    assert out[1].media_type == "audio"
    assert out[2].media_type == "video"
    assert out[1].n_bytes == 700
    assert out[1].width == 700 % 640 + 16
    assert out[1].height == (700 * 7) % 480 + 16
    assert out[0].checksum == hashlib.md5(b"hello world").hexdigest()


def test_real_decode_is_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def _assets(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i} " + "payload bytes " * (10 + i)) for i in range(12)],
        ["doc_id", "text"],
    )
    return attach_payload(docs)


def test_resize_only_touches_images(spark):
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        resize_images,
    )

    assets = _assets(spark)
    out = resize_images(assets, max_bytes=64).collect()
    n_images = assets.where("media_type = 'image'").count()
    assert len(out) == n_images
    assert all(len(r.payload) <= 64 for r in out)
    assert all(16 <= r.width < 656 and 16 <= r.height < 496 for r in out)


def test_frame_sample_row_multiplying(spark):
    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        sample_frames,
    )

    assets = _assets(spark)
    out = sample_frames(assets, frame_bytes=50, every=2).collect()
    vids = {r.asset_id: r.payload for r in
            assets.where("media_type = 'video'").collect()}
    assert {r.asset_id for r in out} <= set(vids)
    for r in out:
        b = bytes(vids[r.asset_id])
        assert bytes(r.frame) == b[r.frame_idx * 50:(r.frame_idx + 1) * 50]
        assert r.frame_idx % 2 == 0


def test_decode_ppm_reference():
    """The dependency-free netpbm decoder against the committed
    fixture asset: header (with comment) parses, sample plane is
    complete, and truncation/garbage raise."""
    import pathlib

    import pytest

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        decode_ppm,
    )

    data = pathlib.Path("fixtures/asset_4x3.ppm").read_bytes()
    w, h, pixels = decode_ppm(data)
    assert (w, h) == (4, 3)
    assert len(pixels) == 4 * 3 * 3
    assert pixels[:3] == bytes([0, 7, 14])  # (x=0,y=0) of the formula
    with pytest.raises(ValueError):
        decode_ppm(data[:-1])  # truncated plane
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")  # wrong magic
    # P5 (grayscale): one channel per sample
    w5, h5, px5 = decode_ppm(b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4]))
    assert (w5, h5, px5) == (2, 2, bytes([1, 2, 3, 4]))


def test_extract_features_real_ppm_decode(spark):
    """The NON-fake branch of extract_features runs end-to-end in CI:
    real header decode inside the Arrow batch, fake branch untouched."""
    import hashlib
    import pathlib

    from pyspark_airflow_weather_etl_spark.operators.multimodal import (
        extract_features,
    )

    data = pathlib.Path("fixtures/asset_4x3.ppm").read_bytes()
    assets = spark.createDataFrame(
        [(1, "image", bytearray(data)), (2, "image", bytearray(data))],
        "asset_id long, media_type string, payload binary",
    )
    rows = {
        r.asset_id: r
        for r in extract_features(assets, decode="ppm").collect()
    }
    assert rows[1].width == 4 and rows[1].height == 3
    assert rows[1].n_bytes == len(data)
    assert rows[1].checksum == hashlib.md5(data).hexdigest()
    assert rows[2].width == 4  # batch path, not a single-row special case
