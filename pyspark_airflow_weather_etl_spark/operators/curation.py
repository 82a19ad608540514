"""Corpus-curation operators for training-data pipelines: global
deterministic shuffling, token-budget selection, and per-source caps.

North-star extensions beyond the reference surface (SURVEY.md §2.9 —
the reference, `/root/reference/spark_jobs/*.py`, has no ordering or
sampling operators at all; its only row governor is the `limit(1)`
at silver_openmeteo.py:28). Everything here is JVM built-ins inside
whole-stage codegen; the one structural ingredient is the distributed
prefix-sum / global-rank pattern shared with
:func:`..operators.text.pack_sequences` — a bare
``Window.orderBy(...)`` with no partitioning is a single-task global
sort that cannot survive 100 TB, so every global order here is:

1. ``repartitionByRange(order_keys)`` — contiguous sorted key ranges
   per partition (the same shuffle ANY global order needs, and the
   only full-data shuffle these operators perform);
2. per-partition ``row_number``/cumsum via a window PARTITIONED BY the
   physical partition id (parallel, zero cross-partition traffic);
3. a per-partition totals table — one row per partition — prefix-
   summed on the driver-side-tiny axis and broadcast back.

The ranged frame is persisted (:mod:`..caching`) because two plan
branches consume it (the totals table and the row-level join side);
without the cache a nondeterministic upstream could assign different
``__pid`` values per branch and silently corrupt every global index
(same guard as pack_sequences, ADVICE r7 medium).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..caching import claim_group, persist_into
from .text import token_count


def _ranged_with_local_rank(
    df: DataFrame,
    order_by: list[Column],
    partitions: int | None,
    cache_group: str,
    cumsum_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared steps 1-3 of the distributed global rank: returns
    ``(local, offsets)`` where ``local`` carries ``__pid``,
    ``__local_rn`` (1-based per-partition row_number) and — when
    ``cumsum_col`` is given — ``__local_cum`` (per-partition running
    sum of that column), and ``offsets`` maps ``__pid`` to the count
    (``__rank_offset``) and sum (``__cum_offset``) of all EARLIER
    partitions. ``order_by`` must be a total order (callers append a
    unique id tiebreaker) — ties would make the rank nondeterministic
    on any engine."""
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
    local = ranged.withColumn("__local_rn", F.count(F.lit(1)).over(w_local))
    if cumsum_col is not None:
        local = local.withColumn(
            "__local_cum", F.sum(cumsum_col).over(w_local)
        )
    local = persist_into(caches, local)
    aggs = [F.max("__local_rn").alias("__part_rows")]
    if cumsum_col is not None:
        aggs.append(F.max("__local_cum").alias("__part_sum"))
    totals = local.groupBy("__pid").agg(*aggs)
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "__rank_offset",
        F.coalesce(F.sum("__part_rows").over(w_off), F.lit(0)).cast("long"),
    )
    if cumsum_col is not None:
        offsets = offsets.withColumn(
            "__cum_offset",
            F.coalesce(F.sum("__part_sum").over(w_off), F.lit(0)).cast(
                "long"
            ),
        )
    return local, offsets


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle — the example-order randomization
    step before training-batch assembly. Every row gets a
    pseudorandom but reproducible ``shuffle_key`` (md5 of the unique
    id salted with ``seed`` — md5, not xxhash64, so any engine can
    replay the permutation) and a materialized 1-based ``pos`` index
    in shuffle-key order.

    ``pos`` is a DISTRIBUTED global rank (module docstring): the only
    full shuffle is the ``repartitionByRange`` on the key — which
    also leaves the output physically laid out in shuffle order, so a
    downstream sequential reader (pack_sequences, epoch streaming)
    gets the permuted order for free without re-sorting. Changing
    ``seed`` yields an independent permutation per epoch.
    """
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    ).alias("shuffle_key")
    base = df.withColumn("shuffle_key", key)
    order = [F.col("shuffle_key"), F.col(id_col)]
    local, offsets = _ranged_with_local_rank(
        base, order, partitions, "global_shuffle"
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__rank_offset")), "__pid"
        )
        .withColumn(
            "pos", (F.col("__local_rn") + F.col("__rank_offset")).cast("long")
        )
        .drop("__pid", "__local_rn", "__rank_offset")
    )


def token_budget_select(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "n_chars",
    budget_numer: int = 3,
    budget_denom: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """Quality-ordered token-budget selection — "keep the best
    documents until the corpus hits N tokens", the data-mixing
    primitive for fixed-token-budget pretraining runs. Documents are
    ranked by ``(score_col DESC, id)`` and kept while the running
    token total stays within ``budget_numer/budget_denom`` of the
    corpus's total tokens (integer arithmetic end-to-end, so the cut
    point is bit-identical across engines — no float budget).

    The running total is the distributed prefix sum (module
    docstring), ordered by quality instead of id; the grand total is
    the sum of the per-partition totals table — one tiny aggregate,
    broadcast back with the offsets, so the budget needs NO second
    scan of the corpus. Output: kept rows with ``n_tokens`` and the
    running ``cum_tokens`` (≤ budget by construction).
    """
    base = df.select(
        F.col(id_col),
        F.col(score_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    order = [F.col(score_col).desc(), F.col(id_col)]
    local, offsets = _ranged_with_local_rank(
        base, order, partitions, "token_budget_select", cumsum_col="n_tokens"
    )
    budget = offsets.agg(
        F.expr(
            f"(sum(__part_sum) * {int(budget_numer)})"
            f" div {int(budget_denom)}"
        )
        .cast("long")
        .alias("__budget")
    )
    return (
        local.join(
            F.broadcast(offsets.select("__pid", "__cum_offset")), "__pid"
        )
        .crossJoin(F.broadcast(budget))
        .withColumn(
            "cum_tokens",
            (F.col("__local_cum") + F.col("__cum_offset")).cast("long"),
        )
        .where(F.col("cum_tokens") <= F.col("__budget"))
        .select(id_col, score_col, "n_tokens", "cum_tokens")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    k: int = 10,
    order_by: list[Column] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source document cap — the anti-domination guard (a handful
    of crawl domains must not drown the mixture): keep at most ``k``
    rows per ``group_col``, best-first by ``order_by`` (default:
    ``n_chars DESC, id`` — longest first, id tiebreak).

    Pure grouped window (``row_number`` PARTITIONED BY the group) —
    no global order is needed, so this is one hash shuffle on the
    group key and scales linearly; a skewed mega-source is bounded by
    the window's per-partition stream (rank is emitted in order, but
    Spark still sorts the group — for adversarial single-source
    corpora pre-aggregate a per-source count and route giant sources
    through a sampled pre-filter first)."""
    order = order_by or [F.col("n_chars").desc(), F.col(id_col)]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
