"""Streaming IVF-PQ index maintenance — the code-at-rest twin of
streaming/sq8_index: embedding rows arrive as micro-batches and each
batch APPENDS coarse-cell-assigned PQ codes
(``operators.pq.ivfpq_index_append``) at O(batch) cost under its own
``batch=`` partition.

BOTH quantizers freeze at the first batch (the ``ivfpq_index_append``
contract: coarse centroids + PQ codebooks train once and persist in
the tree), so every later micro-batch assigns and encodes against the
stored artifacts — the streamed index is probe-equivalent to an
incremental batch build with the same batch decomposition, and
probe-identical after ``ivfpq_index_compact`` (both pinned in
tests/test_streaming_serve.py). Crash-replay and duplicate delivery
are absorbed by the fail-closed manifest ordering + batch-keyed
dynamic partition overwrite the append already implements.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..operators.pq import ivfpq_index_append


def run_streaming_ivfpq_index(
    spark: SparkSession,
    vec_path: str,
    index_path: str,
    schema,
    m: int = 8,
    n_codes: int = 16,
    n_cells: int = 16,
    opq: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 1,
) -> list[dict]:
    """Tail ``vec_path``; per micro-batch append IVF-PQ codes to
    ``index_path``. Runs with availableNow and blocks until the
    staged files drain; returns the per-batch append reports
    (batch id, rows) in batch order."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(vec_path)
    )
    reports: list[dict] = []

    def _append(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        reports.append(
            ivfpq_index_append(
                batch_df.select(id_col, vec_col),
                index_path,
                batch_id,
                m=m,
                n_codes=n_codes,
                n_cells=n_cells,
                opq=opq,
                id_col=id_col,
                vec_col=vec_col,
            )
        )

    writer = stream.writeStream.foreachBatch(_append).trigger(
        availableNow=True
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    writer.start().awaitTermination()
    return sorted(reports, key=lambda r: r["batch"])
