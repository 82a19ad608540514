"""Keyed upsert (MERGE) — the reference's serving-layer contract.

Reproduces the Postgres dedup-CTE + ``ON CONFLICT DO UPDATE`` step
(/root/reference/dags/weather_daily_etl.py:186-209) as a pure-Spark
join-based merge: collapse duplicate source keys first (Delta/SQL
MERGE requires unique source keys too), then
``target ANTI-JOIN updates  UNION  updates``.

Idempotency contract (SURVEY.md §2.6): applying the same batch twice
yields the same table — tests/test_merge.py asserts it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_AVG_OK = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def collapse_duplicates(
    df: DataFrame, keys: Sequence[str], how: str = "avg"
) -> DataFrame:
    """One row per key before merging.

    ``how='avg'`` is bug-compatible with the reference, which averages
    *every* metric across duplicate rows — including min_temp_c /
    max_temp_c (weather_daily_etl.py:188-193: AVG-of-min, not
    min-of-min). It therefore requires every value column to be
    numeric — ``F.avg`` on a string/timestamp column silently yields
    NULL, which would destroy data, so non-numeric value columns are a
    hard error here. ``how='last'`` keeps the row with the highest
    sort key instead (the usual last-writer-wins) and works for any
    column types.
    """
    value_cols = [c for c in df.columns if c not in keys]
    if how == "avg":
        non_numeric = [
            f.name
            for f in df.schema.fields
            if f.name in value_cols and not isinstance(f.dataType, _AVG_OK)
        ]
        if non_numeric:
            raise TypeError(
                "collapse_duplicates(how='avg') averages every value "
                f"column, but {non_numeric} are not numeric (F.avg would "
                "silently NULL them); use how='last' for mixed-type rows"
            )
        return df.groupBy(*keys).agg(
            *[F.avg(c).alias(c) for c in value_cols]
        )
    if how == "last":
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in value_cols]
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
    raise ValueError(f"unknown collapse mode: {how}")


def upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str], how: str = "avg"
) -> DataFrame:
    """Last-writer-wins keyed merge: rows of ``target`` whose key
    appears in ``updates`` are replaced; new keys are inserted.

    Equivalent to ``MERGE INTO target USING updates ON keys WHEN
    MATCHED UPDATE * WHEN NOT MATCHED INSERT *``. The anti-join
    shuffles both sides on the key once; when updates are small
    (a daily batch against years of history) Catalyst broadcasts them
    and the target never shuffles at all.
    """
    collapsed = collapse_duplicates(updates, keys, how)
    # Re-cast to the target's exact schema: avg() widens ints to
    # double, and unionByName would otherwise propagate that widening
    # into the merged table, silently mutating the serving schema.
    target_types = {f.name: f.dataType for f in target.schema.fields}
    collapsed = collapsed.select(
        *[F.col(c).cast(target_types[c]).alias(c) for c in target.columns]
    )
    keep = target.join(collapsed, list(keys), "left_anti")
    return keep.unionByName(collapsed)


def scd2_compact(
    df: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """SCD type-2 history compaction from a change stream — the CDC
    counterpart of :func:`upsert` (which keeps only the latest state):
    per key, order observations by (ts, tiebreak), collapse
    consecutive runs of the same state, and emit one VERSIONED
    validity interval per run — ``(key, state, valid_from_us,
    valid_to_us, version)``, ``valid_to_us`` null for the current
    state. This is the standard warehouse history table built from a
    raw event/CDC feed (Kimball SCD2), and the inverse question
    "state as of time T" becomes one range predicate on the output.

    Null-safe run detection (``IS DISTINCT FROM``): a run of null
    states collapses like any other; epoch-microsecond interval
    bounds (integer) keep the output engine-portable.

    Scale shape: two windows over the SAME (key → ts, tiebreak)
    ordering — one shuffle, the second window reuses the
    partitioning; no joins, no state bigger than a partition's run
    boundaries."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    marked = df.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.lag(state_col).over(w).alias("__prev"),
        F.row_number().over(w).alias("__rn"),
    )
    starts = marked.where(
        (F.col("__rn") == 1)
        | ~F.col(state_col).eqNullSafe(F.col("__prev"))
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return starts.select(
        F.col(key_col),
        F.col(state_col),
        F.unix_micros(F.col(ts_col)).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w2)).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
    )


def scd2_point_in_time(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 history
    (:func:`scd2_compact` output): each fact row joins the ONE
    validity interval active at its timestamp —
    ``valid_from_us ≤ ts < valid_to_us`` with the open (null
    ``valid_to_us``) interval catching everything current. The
    standard PIT join that makes the history table useful downstream
    (feature stores, "dimension as of the order date" joins) — and
    the reason SCD2 materializes intervals at all: the as-of question
    becomes one range predicate instead of a per-row window scan of
    the raw feed.

    Scale shape: an equi-join on the key (shuffle both sides on it)
    with the interval predicate evaluated as the join residual — per
    key the history is its version count (small), so the fan-out is
    bounded and the matched row is unique by the interval-tiling
    invariant (tests assert exactly-one-match)."""
    fa = facts.alias("f")
    ha = history.alias("h")
    cond = (
        (F.col(f"f.{key_col}") == F.col(f"h.{key_col}"))
        & (F.unix_micros(F.col(f"f.{ts_col}")) >= F.col("h.valid_from_us"))
        & (
            F.col("h.valid_to_us").isNull()
            | (F.unix_micros(F.col(f"f.{ts_col}")) < F.col("h.valid_to_us"))
        )
    )
    return fa.join(ha, cond).select(
        F.col(f"f.{key_col}").alias(key_col),
        F.unix_micros(F.col(f"f.{ts_col}")).alias("ts_us"),
        F.col("h.version").alias("version"),
        F.col("h.valid_from_us").alias("valid_from_us"),
    )
