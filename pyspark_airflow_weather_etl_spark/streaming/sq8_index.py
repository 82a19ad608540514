"""Streaming SQ8 vector-index maintenance — the ANN twin of
streaming/bm25_index and streaming/phrase_index: embedding rows
arrive as micro-batches and each batch APPENDS byte codes
(``operators.similarity.sq8_index_append``) at O(batch) cost under
its own ``batch=`` partition.

The quantizer params FREEZE at the first batch (the
``sq8_index_append`` contract), so every later micro-batch encodes
with the stored min/scale — the streamed index is probe-equivalent to
an incremental batch build with the same batch decomposition, and
probe-identical after ``sq8_index_compact``. Each batch's
``clamped_frac`` (the drift guard: the fraction of values outside the
frozen per-dimension range that clamped to 0/255) is recorded under
``{index}/drift`` as an append-only log — the monitoring surface that
schedules a full rebuild when a corpus shift degrades coarse recall
(the exact re-rank keeps RESULTS correct meanwhile; only the
overfetch cut's recall drifts). Crash-replay and duplicate delivery
are absorbed by the batch-keyed dynamic partition overwrite.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.similarity import sq8_index_append


def run_streaming_sq8_index(
    spark: SparkSession,
    vec_path: str,
    index_path: str,
    schema,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> list[dict]:
    """Tail ``vec_path``; per micro-batch append SQ8 codes to
    ``index_path`` and log the batch's drift guard. Runs with
    availableNow and blocks until the staged files drain; returns the
    per-batch append reports (batch id, rows, clamped_frac) in batch
    order."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vec_path)
    )
    reports: list[dict] = []

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # sq8_index_append writes the batch-keyed drift row itself
        reports.append(
            sq8_index_append(batch_df, index_path, batch_id, id_col, vec_col)
        )

    writer = stream.writeStream.foreachBatch(_append).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
    return sorted(reports, key=lambda r: r["batch"])
