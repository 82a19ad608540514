"""Streaming ingest quality gate: every arriving document batch
appends one metrics row to a sidecar audit table — row count, char
mass, short-document count, and an alert flag — so corpus regressions
(a crawler suddenly shipping stubs) surface at ingest latency instead
of after a training run. The governance counterpart of the serving
rollup: the metrics table is append-only history, one row per
micro-batch.

Everything emitted is INTEGER (counts and sums, never means), so the
audit rows are bit-identical across engines and re-runs — downstream
dashboards divide; the engine doesn't. The alert rule is an integer
cross-multiplication (``n_short * denom > n_docs * numer`` ⇔
short-fraction > numer/denom) for the same reason.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_run_ids = itertools.count()

METRICS_SCHEMA = (
    "batch_key long, n_docs long, sum_chars long, n_short long, "
    "alert boolean"
)


def batch_quality_metrics(
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    short_chars: int = 200,
    alert_numer: int = 1,
    alert_denom: int = 10,
    batch_key_expr: F.Column | None = None,
) -> DataFrame:
    """One metrics row for a document batch. ``batch_key`` identifies
    the batch in the audit table — by default the minimum id (stable
    for deterministic batch composition; a production deployment
    passes its own ingest-batch id)."""
    key = (
        batch_key_expr
        if batch_key_expr is not None
        else F.min(F.col(id_col))
    )
    return batch.agg(
        key.cast("long").alias("batch_key"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("sum_chars"),
        F.sum(
            F.when(F.length(text_col) < short_chars, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_short"),
    ).select(
        "batch_key",
        "n_docs",
        "sum_chars",
        "n_short",
        (
            F.col("n_short") * F.lit(int(alert_denom))
            > F.col("n_docs") * F.lit(int(alert_numer))
        ).alias("alert"),
    )


def run_streaming_quality_monitor(
    spark: SparkSession,
    docs_path: str,
    metrics_path: str,
    schema,
    checkpoint_dir: str | None = None,
    short_chars: int = 200,
    max_files_per_trigger: int = 1,
) -> None:
    """Tail ``docs_path``; append one quality row per micro-batch to
    ``metrics_path``. ``availableNow`` drains what's there; a live
    deployment drops the trigger. The append inside foreachBatch is
    at-least-once under crash-replay — audit consumers dedup by
    ``batch_key`` (rows for a replayed batch are byte-identical)."""
    from ..session import streaming_session

    spark = streaming_session(spark)

    def process(batch: DataFrame, batch_id: int) -> None:
        (
            batch_quality_metrics(batch, short_chars=short_chars)
            .write.mode("append")
            .parquet(metrics_path)
        )

    name = f"quality_mon_{next(_run_ids)}"
    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(docs_path)
        .writeStream.foreachBatch(process)
        .outputMode("append")
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


def read_quality_metrics(spark: SparkSession, metrics_path: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).parquet(metrics_path)
