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
