"""Stateful streaming: applyInPandasWithState sessionizer vs the
batch gaps-and-islands ground truth, and dropDuplicatesWithinWatermark
as the streaming dedup/idempotency analogue (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.plans.relational import (
    sessionize_user_events,
)
from pyspark_airflow_weather_etl_spark.schemas import EVENTS_RAW
from pyspark_airflow_weather_etl_spark.sources.tables import load_table
from pyspark_airflow_weather_etl_spark.streaming.sessionize import run_sessionize

from conftest import SF_DIR


def test_stateful_sessionize_matches_batch(spark):
    stream_sessions = {
        (r.user_id, r.session_seq): (r.n_events, r.start_us, r.end_us)
        for r in run_sessionize(spark, SF_DIR).collect()
    }
    batch = {
        (r.user_id, r.session_seq): r.n_events
        for r in sessionize_user_events(spark, SF_DIR).collect()
    }
    # Bounded input: each user's LAST session stays open in the
    # stateful query (no more data ever arrives to close it), so the
    # stream must emit exactly batch minus one trailing session per
    # user — and every emitted session must match the batch one.
    assert stream_sessions, "stream emitted no closed sessions"
    for (uid, seq), (n, start, end) in stream_sessions.items():
        assert batch[(uid, seq)] == n, f"user {uid} session {seq}"
        assert start <= end
    users = {u for u, _ in batch}
    assert len(batch) - len(stream_sessions) == len(users)


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming dedup: the same bronze batch arriving twice (the
    reference's re-run scenario) must come out once."""
    src = tmp_path / "dup_events"
    src.mkdir()
    ev = load_table(spark, SF_DIR, "events").limit(200)
    raw = ev.select(
        "event_id",
        F.unix_micros("ts").alias("us"),
        "user_id",
        "event_type",
        "value",
        "props",
    ).withColumn("ts", (F.col("us") * 1000)).drop("us")
    pdf = raw.toPandas()
    import pandas as pd

    both = pd.concat([pdf, pdf])  # exact duplicate batch
    both.to_parquet(src / "a.parquet", index=False)

    stream = (
        spark.readStream.schema(EVENTS_RAW)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    out = spark.table("dedup_stream")
    assert out.count() == 200
    assert out.select("event_id").distinct().count() == 200
