"""Streaming and multimodal query-catalog entries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.exact import SQL_AVG, SQL_DSUM
from ..operators.multimodal import attach_payload, extract_features
from ..sources.tables import load_table
from ..streaming.rollup import run_streaming_daily_rollup
from .registry import register


@register(
    "streaming_daily_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           min(value) AS min_value,
           max(value) AS max_value,
           {SQL_AVG('value', 'avg_value')},
           {SQL_DSUM('value', 'sum_value')},
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def streaming_daily_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gold daily rollup executed as a real Structured Streaming
    query (tumbling 1-day event-time window + 1-day watermark,
    availableNow over the bounded fixture) — and hash-checked against
    the same SQL oracle as the batch version, proving batch/stream
    parity."""
    return run_streaming_daily_rollup(spark, sf_dir)


@register(
    "multimodal_features",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(length(text) % 640 + 16 AS INT) AS width,
           CAST((length(text) * 7) % 480 + 16 AS INT) AS height,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through Arrow-batched
    mapInPandas (operators.multimodal): documents' utf-8 bytes stand
    in for encoded media; the deterministic fake decode makes even the
    pandas path oracle-checkable. (Oracle's length(text) equals byte
    length because the fixture corpus is ASCII.)"""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_payload(docs))
