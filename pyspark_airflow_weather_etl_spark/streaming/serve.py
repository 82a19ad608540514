"""Streaming serving sink: foreachBatch + keyed upsert.

The reference's serving step is a per-day batch UPSERT into Postgres
(/root/reference/dags/weather_daily_etl.py:160-214). The streaming
form: a windowed aggregation in update mode feeds ``foreachBatch``,
and each micro-batch MERGEs into the serving table via the same
join-based upsert the batch path uses (operators.merge.upsert) — one
code path for both latencies, idempotent under replays because the
merge is keyed.

The serving table is published through the versioned pointer
protocol (writers.write_serving_version / read_serving_table): each
micro-batch writes a new complete version directory and flips a tiny
pointer file, so a crash at any point — including mid-swap — leaves
readers on a complete version, never a partial or missing table.
Swap the writer for writers.write_jdbc against a real store.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC
from ..operators.merge import upsert
from ..sources.writers import read_serving_table, write_serving_version
from .rollup import read_events_stream

_run_ids = itertools.count()


def _daily_rollup_update(events: DataFrame) -> DataFrame:
    """Update-mode windowed rollup keyed by (day, event_type)."""
    return (
        events.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
            "event_type",
            "sum_value",
            "n_events",
        )
    )


def stream_upsert_daily(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Run the streaming rollup and MERGE every micro-batch into the
    parquet serving table at ``target_path``.

    With ``checkpoint_dir`` set, restarts resume from the committed
    offsets: a re-run over already-processed input is a no-op
    (exactly-once progress tracking). Without it, a re-run replays
    everything — and converges to the same table anyway, because the
    keyed merge is idempotent. Both properties are tested.
    """
    from ..session import streaming_session

    spark = streaming_session(spark)
    keys = ["day", "event_type"]

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            target = read_serving_table(s, target_path)
        except FileNotFoundError:
            # Genuinely never written (no complete version and no
            # pointer) — NOT merely a crashed swap: read_serving_table
            # recovers from those itself. A broad except here would
            # silently re-initialize the table to one micro-batch.
            target = s.createDataFrame([], batch.schema)
        merged = upsert(target, batch, keys, how="last")
        write_serving_version(merged, target_path)

    name = f"serve_{next(_run_ids)}"
    writer = (
        _daily_rollup_update(read_events_stream(spark, sf_dir))
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
