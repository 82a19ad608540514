"""Exact distributed quantiles — global order statistics WITHOUT a
global sort (north-star surface; complements the engine's
approx_percentile sketch entry and the per-group `percentile`
aggregate, both of which either approximate or sort whole groups).

The selection recipe: collapse the column to a NARROW value-count
frame (one hash aggregation — ~16 bytes per DISTINCT value, however
many rows the corpus has), take the distributed prefix sum of the
counts in value order (:mod:`.prefix` — the engine's one-range-
exchange cumsum over a narrow frame), and each requested quantile is
the MINIMUM value whose cumulative count reaches its integer target
rank ``ceil(p * n)``. No row of the corpus is ever globally sorted;
nothing wider than (value, count) shuffles; every rank boundary is
integer arithmetic (targets via cross-multiplied ceiling division —
no float thresholds), and the returned values are untouched input
values, so the result is bit-identical on any engine — the DuckDB
oracle replays the same min-where-cum>=target rule.

Quantile definition: type-1 / lower (the inverse-CDF step function) —
``Q(p) = min { v : |{x <= v}| >= ceil(p*n) }`` for ``p`` in (0, 1].
Deliberately NOT the interpolated definition: interpolation
manufactures values that are not in the data and reintroduces float
arithmetic at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .prefix import ranged_cumsum


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    probs: list[tuple[int, int]],
    partitions: int | None = None,
) -> DataFrame:
    """Exact type-1 quantiles of ``value_col`` at each ``p_num/p_den``
    in ``probs``. Output ``(p_num, p_den, value)`` — one row per
    requested quantile. NULLs are excluded (they have no order
    position). Raises on an empty prob list or p outside (0, 1]."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for num, den in probs:
        if not (0 < num <= den):
            raise ValueError(f"quantile fraction out of (0,1]: {num}/{den}")
    counts = (
        df.select(F.col(value_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    local, offsets = ranged_cumsum(
        counts, [F.col("__v")], partitions, "exact_quantiles", "__cnt"
    )
    total = offsets.agg(
        F.sum("__part_sum").cast("long").alias("__n")
    )
    probs_df = local.sparkSession.createDataFrame(
        [(int(n), int(d)) for n, d in probs], "p_num long, p_den long"
    )
    cum = (
        local.join(
            F.broadcast(offsets.select("__pid", "__cum_offset")), "__pid"
        )
        .withColumn(
            "__cum",
            (F.col("__local_cum") + F.col("__cum_offset")).cast("long"),
        )
        .select("__v", "__cum")
    )
    # narrow frame x handful of probs; target rank = ceil(p*n) via
    # integer ceiling division
    return (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(probs_df))
        .withColumn(
            "__target",
            F.expr("(p_num * __n + p_den - 1) div p_den").cast("long"),
        )
        .where(F.col("__cum") >= F.col("__target"))
        .groupBy("p_num", "p_den")
        .agg(F.min("__v").alias("value"))
    )


def exact_quantiles_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[tuple[int, int]],
) -> DataFrame:
    """Exact type-1 quantiles PER GROUP — the per-group complement of
    :func:`exact_quantiles`, and the scale-shaped alternative to the
    built-in ``percentile`` aggregate (which buffers and sorts every
    group's raw values): the corpus collapses map-side to
    ``(group, value, count)`` — the only thing that shuffles — the
    cumulative count is a window over the NARROW count rows within
    each group (cost ~ distinct values per group, not rows per
    group), and each quantile is the min value whose cumulative
    count reaches ``ceil(p * n_g)`` for that group's own ``n_g``.
    Output ``(group_col, p_num, p_den, value)``. NULL values are
    excluded; NULL groups are kept as their own group (they are real
    rows with an order statistic)."""
    from pyspark.sql.window import Window

    if not probs:
        raise ValueError("probs must be non-empty")
    for num, den in probs:
        if not (0 < num <= den):
            raise ValueError(f"quantile fraction out of (0,1]: {num}/{den}")
    counts = (
        df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn(
        "__cum", F.sum("__cnt").over(w).cast("long")
    ).withColumn(
        "__n",
        F.sum("__cnt")
        .over(Window.partitionBy("__g"))
        .cast("long"),
    )
    probs_df = df.sparkSession.createDataFrame(
        [(int(n), int(d)) for n, d in probs], "p_num long, p_den long"
    )
    return (
        cum.crossJoin(F.broadcast(probs_df))
        .withColumn(
            "__target",
            F.expr("(p_num * __n + p_den - 1) div p_den").cast("long"),
        )
        .where(F.col("__cum") >= F.col("__target"))
        .groupBy("__g", "p_num", "p_den")
        .agg(F.min("__v").alias("value"))
        .withColumnRenamed("__g", group_col)
    )
