"""Distributed prefix-sum / global-rank primitive.

Any global order (shuffle position, token-axis offset, budget cumsum)
needs exactly ONE full-data shuffle: the ``repartitionByRange`` on the
order keys. The naive formulation — a window ``PARTITION BY
spark_partition_id()`` for the per-partition local rank — silently
adds a SECOND full-data exchange (``hashpartitioning(__pid)``),
because Catalyst cannot know that a range-partitioned frame is also
clustered by its own partition id. At 100 TB that doubles the
dominant cost of the operator. This module keeps the local step
partition-local:

- rank-only (:func:`ranged_rank`): ``sortWithinPartitions`` (local
  sort, no exchange) then decode ``monotonically_increasing_id`` —
  Spark's documented layout puts the partition index in the upper 31
  bits and the 0-based in-partition record number in the lower 33
  (``pyspark.sql.functions.monotonically_increasing_id``), and the
  projection sits above the sort, so the record number IS the local
  rank in key order. Pure JVM, whole-stage codegen, zero second
  exchange — this is the path for wide pass-through frames, where a
  ``PARTITION BY __pid`` window would re-shuffle the entire corpus.
- rank+cumsum (:func:`ranged_cumsum`): the per-partition running sum
  via a window ``PARTITION BY spark_partition_id()``. This DOES cost
  a second ``hashpartitioning(__pid)`` exchange — but the frame is
  NARROW BY CONTRACT (callers project down to id + order key + value
  first, ~16-24 bytes/row), so the exchange moves the narrow frame,
  not the corpus. Measured A/B on this box at 5M rows, 32 threads:
  narrow-exchange window 1.0-1.6 s steady-state vs an Arrow-batched
  ``mapInPandas`` running cumsum 1.8-3.2 s (and 17 s first-call
  Python-fleet warm-up vs 7 s) — the Arrow round-trip of every row
  costs more than re-shuffling the same bytes JVM-side, so the
  window form is the right physical plan for narrow frames. Do NOT
  "optimize" this back to mapInPandas without re-measuring.

Both return ``(local, offsets)``: ``local`` adds ``__pid`` /
``__local_rn`` (1-based) / optionally ``__local_cum``; ``offsets`` is
the one-row-per-partition totals table with ``__rank_offset`` /
``__cum_offset`` — the count/sum of all EARLIER partitions, prefix-
summed with a window over that tiny axis (its ``SinglePartition``
exchange moves one row per partition, by design) and broadcast back
by callers.

``local`` is persisted (:mod:`..caching`) because two plan branches
consume it (the totals aggregate and the row-level join side);
without the cache a nondeterministic upstream could evaluate the
range partitioning differently per branch and corrupt every global
index. ``order_by`` must be a total order — callers append a unique
id tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import claim_group, persist_into

_LOW33 = (1 << 33) - 1


def _offsets(local: DataFrame, with_cum: bool) -> DataFrame:
    """Per-partition totals + prefix offsets, with a loud-failure
    invariant (ADVICE r8): ``max(__local_rn)`` must equal
    ``count(*)`` in every partition. The id-decode path derives
    ``__local_rn`` from ``monotonically_increasing_id``'s bit layout;
    a partition beyond 2^33 rows or a future Catalyst reordering of
    the nondeterministic projection would corrupt ranks SILENTLY
    (offsets built from max() stay self-consistent with the corrupt
    values). Dense 1..count ranks are the one property every failure
    mode breaks, so the equality check — riding the same tiny
    aggregate, asserted in-plan so laziness is preserved — turns
    silent corruption into a job failure for ~zero cost."""
    aggs = [
        F.max("__local_rn").alias("__part_rows"),
        F.count(F.lit(1)).alias("__part_cnt"),
    ]
    if with_cum:
        aggs.append(F.max("__local_cum").alias("__part_sum"))
    totals = (
        local.groupBy("__pid")
        .agg(*aggs)
        .withColumn(
            "__part_rows",
            F.when(
                F.col("__part_rows") == F.col("__part_cnt"),
                F.col("__part_rows"),
            )
            .otherwise(
                F.raise_error(
                    F.concat_ws(
                        " ",
                        F.lit(
                            "ranged rank decode corrupted: partition"
                        ),
                        F.col("__pid"),
                        F.lit("max(__local_rn)"),
                        F.col("__part_rows"),
                        F.lit("!= count(*)"),
                        F.col("__part_cnt"),
                    )
                )
            )
            .cast("long"),
        )
        .drop("__part_cnt")
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "__rank_offset",
        F.coalesce(F.sum("__part_rows").over(w_off), F.lit(0)).cast("long"),
    )
    if with_cum:
        offsets = offsets.withColumn(
            "__cum_offset",
            F.coalesce(F.sum("__part_sum").over(w_off), F.lit(0)).cast(
                "long"
            ),
        )
    return offsets


def ranged_rank(
    df: DataFrame,
    order_by: list[Column],
    partitions: int | None,
    cache_group: str,
) -> tuple[DataFrame, DataFrame]:
    """Global rank scaffolding via the JVM id-decode (module
    docstring). ``local`` keeps every input column — safe for wide
    pass-through frames, nothing crosses the Python boundary."""
    spark = df.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_by).sortWithinPartitions(
        *order_by
    )
    local = (
        ranged.withColumn("__mid", F.monotonically_increasing_id())
        .withColumn(
            "__pid", F.shiftrightunsigned("__mid", 33).cast("int")
        )
        .withColumn(
            "__local_rn",
            (F.col("__mid").bitwiseAND(F.lit(_LOW33)) + F.lit(1)).cast(
                "long"
            ),
        )
        .drop("__mid")
    )
    caches = claim_group(cache_group)
    local = persist_into(caches, local)
    return local, _offsets(local, with_cum=False)


def ranged_cumsum(
    df: DataFrame,
    order_by: list[Column],
    partitions: int | None,
    cache_group: str,
    value_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Global rank + running sum of ``value_col`` (module docstring).
    Callers MUST project ``df`` down to id/order/value columns first —
    the per-partition window re-clusters the frame on
    ``hashpartitioning(__pid)``, and that exchange is cheap only
    because the frame is narrow. The explicit ROWS frame keeps the
    cumsum on ROWS semantics (the default for an ordered window is
    RANGE, which sums ORDER-BY peers together — ``order_by`` must be
    a total order anyway)."""
    spark = df.sparkSession
    parts = partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_by).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    caches = claim_group(cache_group)
    local = persist_into(
        caches,
        ranged.withColumn(
            "__local_rn", F.count(F.lit(1)).over(w_local).cast("long")
        ).withColumn(
            "__local_cum", F.sum(value_col).over(w_local).cast("long")
        ),
    )
    return local, _offsets(local, with_cum=True)
