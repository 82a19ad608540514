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


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The fake decode derives width/height from the payload length
    (deterministic, so the whole pandas path hash-checks against a SQL
    oracle); a real deployment swaps ``_fake_decode`` for the codec
    call and keeps every other line.
    """

    def _fake_decode(n: int) -> tuple[int, int]:
        return n % 640 + 16, (n * 7) % 480 + 16

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes = pdf["payload"].map(len)
            dims = n_bytes.map(_fake_decode)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)
