"""Streaming positional (phrase) index maintenance — the phrase twin
of streaming/bm25_index: documents arrive as micro-batches and each
batch APPENDS positional postings
(``operators.retrieval.positional_index_append``) at O(batch) cost —
batch-keyed ``(token, doc_id, pos)`` rows under ``batch=/pfx=``.

Positions are a pure per-document function (no cross-batch statistics
exist at all), so the index after ANY batch decomposition is
probe-equivalent to the one-shot build — a phrase probe of the
streamed index hash-matches the same DuckDB oracle as the ad-hoc
``phrase_counts`` entry. Crash-replay and duplicate delivery are
absorbed by the dynamic-partition-overwrite batch keying; at crawl
cadence the accreted deltas fold through
``operators.retrieval.positional_index_compact`` (the published-
version lifecycle, CLI ``maintain compact-index --kind positional``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.retrieval import positional_index_append


def run_streaming_phrase_index(
    spark: SparkSession,
    doc_path: str,
    index_path: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Tail ``doc_path``; per micro-batch append positional postings
    to ``index_path``. Runs with availableNow and blocks until the
    staged files drain."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(doc_path)
    )

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        positional_index_append(
            batch_df, index_path, batch_id, id_col, text_col
        )

    writer = stream.writeStream.foreachBatch(_append).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
