"""Streaming exactly-once dedup: ``dropDuplicatesWithinWatermark``.

The reference's idempotency contract is batch-shaped: re-delivered
days are collapsed by the keyed UPSERT
(/root/reference/dags/weather_daily_etl.py:197-209). At streaming
latency the same guarantee is per-EVENT: an at-least-once source
(Kafka replays, file re-delivery) hands the query duplicate rows, and
``dropDuplicatesWithinWatermark`` drops re-occurrences of an event id
while only keeping state for ids newer than the watermark — bounded
state, unbounded stream (SURVEY.md §2.9 "streaming" row).

The fixture exercise doubles part of the stream deterministically
(every third event re-delivered) and rolls up the deduped stream;
the DuckDB oracle computes the same rollup over the original table —
equality proves every injected duplicate was dropped and nothing
else was.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC
from .rollup import read_events_stream

_run_ids = itertools.count()


def dedup_events_stream(events: DataFrame) -> DataFrame:
    """Drop re-deliveries of the same ``event_id`` within the 1-day
    watermark window. State: one (event_id) entry per event seen in
    the last watermark interval — the watermark is what makes the
    state bounded; plain ``dropDuplicates`` on a stream would grow
    state forever."""
    return events.withWatermark("ts", "1 day").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_streaming_dedup_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery simulation → dedup → daily rollup.

    The duplicate feed is the stream unioned with a filtered copy of
    itself (every ``event_id % 3 == 0`` delivered twice) — a
    deterministic stand-in for source replay. The rollup of the
    deduped stream must equal the batch rollup of the pristine table.
    """
    from ..session import streaming_session

    spark = streaming_session(spark)
    events = read_events_stream(spark, sf_dir)
    redelivered = events.where(F.col("event_id") % 3 == 0)
    feed = events.unionByName(redelivered)
    rolled = (
        dedup_events_stream(feed)
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
    )
    name = f"stream_dedup_{next(_run_ids)}"
    q = (
        rolled.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.table(name)
