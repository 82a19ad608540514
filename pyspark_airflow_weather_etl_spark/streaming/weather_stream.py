"""The reference's whole pipeline at streaming latency.

The reference runs bronze→silver→gold once per day via Airflow
scheduling (/root/reference/dags/weather_daily_etl.py:217). Here the
same dataflow is a Structured Streaming job: new bronze JSON files
are discovered by the file source as days land, flattened with the
SAME flatten_hourly operator the batch path uses, and folded into the
gold serving table by a keyed foreachBatch merge — so backfill and
live tail are one code path, and re-delivered files cannot double-
count (the merge replaces by (y,m,d)).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import upsert
from ..operators.weather import flatten_hourly
from ..sources.writers import read_serving_table, write_serving_version
from ..schemas import BRONZE_WEATHER
from ..session import apply_runtime_confs

_run_ids = itertools.count()


def read_bronze_stream(spark: SparkSession, bronze_path: str) -> DataFrame:
    apply_runtime_confs(spark)
    return (
        spark.readStream.schema(BRONZE_WEATHER)
        .option("maxFilesPerTrigger", "10")
        .json(bronze_path)
    )


def _gold_batch(silver_batch: DataFrame) -> DataFrame:
    """Per-batch daily rollup (same aggregate family as the batch
    gold — gold_openmeteo.py:20-27 — plus n_hours so re-merged
    partial days stay inspectable)."""
    return silver_batch.groupBy("y", "m", "d").agg(
        F.min("temperature_c").alias("min_temp_c"),
        F.max("temperature_c").alias("max_temp_c"),
        F.avg("temperature_c").alias("avg_temp_c"),
        F.sum("precip_mm").alias("precip_mm_sum"),
        F.avg("humidity_pct").alias("avg_humidity_pct"),
        F.count("*").alias("n_hours"),
    )


def run_weather_stream(
    spark: SparkSession,
    bronze_path: str,
    gold_path: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Process all currently-available bronze files into the gold
    serving table (availableNow); on a live deployment drop the
    trigger and the same query tails the landing path forever.

    Day-level caveat shared with the reference: a single day's
    document set must arrive within one micro-batch for its rollup to
    be complete — with one JSON document per (day, location) (the
    bronze contract) that holds by construction; re-delivery of a
    day's file replaces, never duplicates, via the keyed merge."""
    from ..session import streaming_session

    spark = streaming_session(spark)

    def merge_batch(bronze_batch: DataFrame, batch_id: int) -> None:
        s = bronze_batch.sparkSession
        gold_update = _gold_batch(flatten_hourly(bronze_batch))
        try:
            target = read_serving_table(s, gold_path)
        except FileNotFoundError:
            # never written — crashed swaps are recovered inside
            # read_serving_table, so this cannot silently re-init
            target = s.createDataFrame([], gold_update.schema)
        merged = upsert(target, gold_update, ["y", "m", "d"], how="last")
        write_serving_version(merged, gold_path)

    name = f"weather_stream_{next(_run_ids)}"
    writer = (
        read_bronze_stream(spark, bronze_path)
        .writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .queryName(name)
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        q.awaitTermination()
    finally:
        q.stop()
