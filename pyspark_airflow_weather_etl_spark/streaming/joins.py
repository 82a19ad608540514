"""Stream-stream joins (SURVEY.md §2.9 streaming).

A purchase stream joined to a view stream on user within a time
bound — the streaming form of the batch range join
(plans.temporal.range_join_views_before_purchase). Both sides carry
watermarks and the join condition bounds event time in BOTH
directions, which is what lets Structured Streaming evict join state:
a buffered view can be dropped once the purchase watermark passes
view_ts + 1 hour, so state is O(window), not O(stream).

Over the bounded fixture (one availableNow micro-batch) the result is
exactly the batch join, which is why the catalog entry carries a full
DuckDB oracle rather than a rows-only check.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .rollup import read_events_stream

_run_ids = itertools.count()


def stream_stream_view_purchase(
    views: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Inner stream-stream join: every (view, purchase) pair for the
    same user with the purchase in [view_ts, view_ts + 1 hour].

    The equi-key (user_id) anchors the state-store partitioning; the
    two-sided time bound + watermarks bound the buffered state."""
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", "1 hour")
    p = purchases.select(
        F.col("user_id").alias("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", "1 hour")
    return (
        v.join(
            p,
            (F.col("v_user_id") == F.col("user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .select("user_id", "view_id", "purchase_id")
    )


def run_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the view⨝purchase stream-stream join over the bounded
    fixture (availableNow → memory sink) and return the joined rows."""
    from ..session import streaming_session

    spark = streaming_session(spark)
    ev = read_events_stream(spark, sf_dir)
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    name = f"stream_join_{next(_run_ids)}"
    q = (
        stream_stream_view_purchase(views, purchases)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against the
    static customer dimension, rolled up per market segment.

    The static side is a plain batch DataFrame — Spark broadcasts it
    into every micro-batch (stream-static joins are stateless: no
    watermark, no join state, the dimension is simply re-resolved per
    batch, which is also what makes slowly-changing dimensions pick
    up updates between batches at no extra cost). This is the
    streaming form of the classic fact⨝dim enrichment every
    reference-style ingest does right after landing."""
    from ..functions.exact import DEC
    from ..session import streaming_session
    from ..sources.tables import load_table

    spark = streaming_session(spark)
    customers = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = read_events_stream(spark, sf_dir).join(
        F.broadcast(customers),
        F.col("user_id") == F.col("c_custkey"),
    )
    rolled = enriched.groupBy(
        F.col("c_mktsegment").alias("mktsegment")
    ).agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        F.count("*").alias("n_events"),
    )
    name = f"stream_static_{next(_run_ids)}"
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
