"""Streaming BM25 index maintenance — the retrieval counterpart of
streaming/incremental_dedup: documents arrive as micro-batches and
each batch APPENDS to the at-rest postings index
(``operators.retrieval.bm25_index_append``) at O(batch) cost — batch-
keyed postings under ``batch=/pfx=``, additive term-stats and corpus-
scalar deltas.

Because document frequency and the corpus scalars are additive over
disjoint batches and postings rows are a pure per-document function,
the index after ANY batch decomposition is probe-equivalent to the
one-shot build — so a probe of the streamed index hash-matches the
same DuckDB oracle as the ad-hoc ``bm25_topk`` entry. Crash-replay
and duplicate delivery are absorbed by the dynamic-partition-
overwrite batch keying (pinned in tests/test_retrieval.py and the
streaming replay test).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.retrieval import bm25_index_append


def run_streaming_bm25_index(
    spark: SparkSession,
    doc_path: str,
    index_path: str,
    schema,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> None:
    """Tail ``doc_path``; per micro-batch append postings + stats
    deltas to ``index_path``. Runs with availableNow and blocks until
    the staged files drain."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(doc_path)
    )

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        bm25_index_append(batch_df, index_path, batch_id, id_col, text_col)

    writer = stream.writeStream.foreachBatch(_append).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
