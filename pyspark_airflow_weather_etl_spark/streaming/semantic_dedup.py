"""Streaming semantic dedup against a GROWING at-rest cell index —
the embedding-family edition of :mod:`.incremental_dedup`'s crawl
loop: every arriving batch of vectors assigns against the STORED
centroid table (written once at bootstrap, never retrained), emits
drop decisions from exact-cosine verification within its touched
cells against everything that came before plus itself, then appends
its own assigned rows — becoming "history" for the next batch.
Per-batch cost is O(batch + touched-cell rows), never O(corpus).

Exactness: SemDeDup's drop rule (drop the higher id of every
verified near-dup pair) is MONOTONE and a pair's members are first
co-present exactly when the later-arriving one lands, so the union
of all emitted drops equals the one-shot run's drop set REGARDLESS
of arrival order — the final kept corpus hash-matches the same
DuckDB oracle as the one-shot ``semantic_dedup_fixed_cells`` entry.

Crash-replay idempotency: index appends are batch-keyed dynamic-
overwrite partitions (``rows/ivf_cell=<c>/batch=<id>`` —
operators.similarity.semantic_index_append_fixed), so a replayed
batch overwrites its own partitions, and its cross read excludes
them via the ``before_batch`` snapshot filter. Drop rows are
appended at-least-once (byte-identical on replay; readers
``distinct()`` by id), the standard foreachBatch contract.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    semantic_dedup_incremental_fixed,
    semantic_index_append_fixed,
)

_run_ids = itertools.count()

DROPS_SCHEMA = "vec_id long, ivf_cell long"


def run_streaming_semantic_dedup(
    spark: SparkSession,
    vec_path: str,
    index_path: str,
    drops_path: str,
    schema,
    checkpoint_dir: str | None = None,
    threshold: float = 0.4,
    max_files_per_trigger: int = 1,
) -> None:
    """Tail ``vec_path`` for embedding files; per micro-batch emit
    drop decisions to ``drops_path`` (append) and fold the batch's
    assigned rows into ``index_path/rows``. The centroid table at
    ``index_path/centroids`` must exist BEFORE the stream starts
    (operators.similarity.semantic_centroids_write_fixed — the
    bootstrap artifact every batch assigns against). ``availableNow``
    drains the staged files batch-by-batch; a live deployment drops
    the trigger and tails forever."""
    from ..session import streaming_session

    spark = streaming_session(spark)

    def process(batch: DataFrame, batch_id: int) -> None:
        drops = semantic_dedup_incremental_fixed(
            batch, index_path, threshold=threshold, before_batch=batch_id
        )
        # drops BEFORE the append: the incremental read must see the
        # index WITHOUT this batch (before_batch also guards a replay
        # against its own crashed-attempt partitions)
        drops.write.mode("append").parquet(drops_path)
        semantic_index_append_fixed(batch, index_path, batch_id=batch_id)

    name = f"sem_dedup_{next(_run_ids)}"
    writer = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(vec_path)
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


def read_kept(spark: SparkSession, index_path: str, drops_path: str) -> DataFrame:
    """The surviving corpus so far: all appended rows minus every
    emitted drop (distinct by id — drops replay at-least-once).
    Explicit drops schema: the path may hold only _SUCCESS markers
    when nothing collided."""
    from ..sources.rawstore import read_raw_store

    rows = read_raw_store(spark, f"{index_path}/rows").select(
        "vec_id", F.col("ivf_cell").cast("long").alias("ivf_cell")
    )
    drops = (
        spark.read.schema(DROPS_SCHEMA)
        .parquet(drops_path)
        .select("vec_id")
        .distinct()
    )
    return rows.join(drops, "vec_id", "left_anti")
