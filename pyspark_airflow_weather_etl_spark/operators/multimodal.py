"""Multimodal column plumbing: binary payloads + typed metadata.

North-star extension: image/audio/video travel as opaque ``binary``
columns with a typed metadata struct (schemas.MEDIA_ASSET); decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so payload
bytes cross the JVM↔Python boundary once per batch, never per row.

The container has no image/audio codecs, so the real decoders are
stubbed (import-gated); ``extract_features`` uses a deterministic
fake decode — the Spark-side plumbing (schema, batching, UDF
signature) is the real, tested part, and the fake is SQL-expressible
so even the pandas path is oracle-checked.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL, absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image decode needs PIL; use the deterministic fake path"
        ) from e
    raise NotImplementedError("wire PIL.Image.open(io.BytesIO(payload)) here")


def decode_ppm(payload: bytes) -> tuple[int, int, bytes]:
    """Dependency-free netpbm decoder (binary PPM ``P6`` / PGM
    ``P5``) — the one REAL decode path that runs in this container
    (no PIL needed): header = magic, then whitespace-separated width,
    height, maxval tokens with ``#``-to-newline comments allowed,
    then the raw sample plane. Returns (width, height, pixels).

    This is the non-fake branch of :func:`extract_features`
    (``decode='ppm'``): tiny by design, but it exercises the full
    real-decoder contract — bytes in from the Arrow batch, header
    validation, ValueError on truncation/garbage — so swapping in a
    codec-backed decoder changes one function, not the plumbing."""
    if len(payload) < 2 or payload[0:1] != b"P" or payload[1:2] not in b"56":
        raise ValueError("not a binary PPM/PGM payload (magic != P5/P6)")
    channels = 3 if payload[1:2] == b"6" else 1
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and payload[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header")
        vals.append(int(payload[start:pos]))
    width, height, maxval = vals
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    pos += 1  # the single whitespace byte after maxval
    need = width * height * channels
    pixels = payload[pos : pos + need]
    if len(pixels) < need:
        raise ValueError(
            f"truncated PPM: need {need} sample bytes, have {len(pixels)}"
        )
    return width, height, pixels


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize MEDIA_ASSET rows from the documents fixture: the
    utf-8 text bytes stand in for an encoded media payload."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        media_type.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
    )


def extract_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decode='fake'`` derives width/height from the payload length
    (deterministic, so the whole pandas path hash-checks against a SQL
    oracle). ``decode='ppm'`` runs the REAL header decode
    (:func:`decode_ppm` — dependency-free, so the non-fake branch
    executes in this container's CI; a codec-backed deployment swaps
    the decoder and keeps every other line). Both branches share
    schema, batching, and the JVM↔Python boundary discipline."""
    if decode not in ("fake", "ppm"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def _fake_dims(b: bytes) -> tuple[int, int]:
        n = len(b)
        return n % 640 + 16, (n * 7) % 480 + 16

    def _ppm_dims(b: bytes) -> tuple[int, int]:
        w, h, _ = decode_ppm(b)
        return w, h

    dim_fn = _fake_dims if decode == "fake" else _ppm_dims

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].map(bytes)
            dims = payloads.map(dim_fn)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(assets: DataFrame, max_bytes: int = 256) -> DataFrame:
    """Image resize as Arrow-batched mapInPandas over image assets.

    The fake 'resize' truncates the payload to ``max_bytes`` and
    derives the new dimensions from the truncated length — both
    deterministic byte/arithmetic ops, so the whole path (filter →
    batch → per-batch transform → binary out) is oracle-checked with
    substring/length SQL. A real deployment replaces the two marked
    lines with decode → thumbnail → re-encode and keeps the rest:
    partitioning, batch shape, and schema are the engineered part.
    Only rows with media_type='image' are touched — the filter happens
    BEFORE the Python boundary, so audio/video bytes never leave the
    JVM."""

    def _fake_resize(b: bytes) -> bytes:  # <- real: decode+thumbnail
        return bytes(b)[:max_bytes]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(_fake_resize)
            n = resized.map(len)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": (n % 640 + 16).astype("int32"),
                    "height": ((n * 7) % 480 + 16).astype("int32"),
                    "payload": resized,
                }
            )

    return assets.where(F.col("media_type") == "image").mapInPandas(
        batches, RESIZED_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 100, every: int = 4
) -> DataFrame:
    """Video frame sampling: one output row per kept frame — the
    row-multiplying mapInPandas shape (explode across the Arrow
    boundary). The fake treats each ``frame_bytes`` payload chunk as
    one encoded frame and keeps every ``every``-th; a real deployment
    swaps the chunker for a container demuxer (pyav et al.) and keeps
    the batching, schema, and video-only JVM-side filter. Sampled
    frames are byte slices, so the oracle reproduces them with
    substring arithmetic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_frame = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, every):
                    out_id.append(asset_id)
                    out_idx.append(i)
                    out_frame.append(b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame": pd.Series(out_frame, dtype="object"),
                }
            )

    return assets.where(F.col("media_type") == "video").mapInPandas(
        batches, FRAME_SCHEMA
    )
