"""Structured Streaming analogues of the reference's daily batch.

The reference ingests an hourly event stream one day at a time via
Airflow scheduling (/root/reference/dags/weather_daily_etl.py:73-128);
semantically that is a tumbling 1-day window over an event-time
stream. Here the same rollup runs as a real Structured Streaming
query — watermark for late data, windowed aggregation, and a
stateful sessionizer — exercised over the fixture ``events`` table
with ``availableNow`` (bounded backfill), which is exactly how the
same code would run continuously against a live source.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..session import apply_runtime_confs
from ..sources.tables import events_read_plan

_run_ids = itertools.count()


def _is_directory(spark: SparkSession, path: str) -> bool:
    """Directory-vs-file probe through the Hadoop FileSystem API, so
    the answer is correct for ANY URI scheme the session can read
    (hdfs://, s3a://, file:). ``os.path.isdir`` silently answers
    False for every non-local URI, which would route a directory-
    layout ``events.parquet/`` on an object store into the filename-
    glob branch — where the glob matches zero part-files and the
    stream emits nothing. Falls back to ``os.path.isdir`` only if the
    JVM gateway is unavailable (plain local paths, tests without a
    session)."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.isDirectory(jpath))
    except Exception:
        import os

        return os.path.isdir(path)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the fixture events parquet (explicit
    schema — streaming requires it; inference is impossible on an
    unbounded source). The ``ts`` physical type is probed from the
    footers (sources.tables.events_read_plan) so nanos-as-long and
    native-micros fixtures both read correctly.

    Handles both physical layouts ``events.parquet`` has shipped in:
    a single FILE (the fixture quirk — streamed from the parent dir
    with a glob so the source doesn't try to list the file as a
    directory) and a DIRECTORY of part-files (the production norm at
    scale — streamed from the directory itself; a filename glob would
    match zero part-files and silently stream nothing, the failure
    mode the ×8 state-pressure bench probe caught)."""
    apply_runtime_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema, rebuild = events_read_plan(path, spark)
    if _is_directory(spark, path):
        raw = spark.readStream.schema(schema).parquet(path)
    else:
        raw = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
    if rebuild:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def streaming_daily_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-day event-time window per event_type with a 1-day
    watermark: the streaming form of the gold daily rollup
    (gold_openmeteo.py:20-27). State per (day, type) only — bounded by
    the watermark, so it runs forever without state growth."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (
                F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value")
            ).alias("avg_value"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "min_value",
            "max_value",
            "avg_value",
            "sum_value",
            "n_events",
        )
    )


def run_streaming_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the streaming rollup over the bounded fixture with
    availableNow and return the complete result from the memory sink.

    ``complete`` output mode emits every window including the one the
    watermark hasn't closed yet, which is what makes the result
    comparable 1:1 with the batch/oracle rollup.
    """
    from ..session import streaming_session

    spark = streaming_session(spark)
    name = f"stream_rollup_{next(_run_ids)}"
    q = (
        streaming_daily_rollup(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
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
