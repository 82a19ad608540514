"""As-of (point-in-time) join — a temporal operator Spark lacks.

``asof_join(left, right)`` attaches to each left row the most recent
right row with ``right.ts <= left.ts`` for the same key.

Scale design — the union-window formulation, NOT a range join:
tag both sides, union them, and run one window pass per key ordered
by (ts, side): a running ``last(right_value, ignoreNulls)`` carries
the latest right row forward onto every left row. Cost is one shuffle
on the key and one sort per partition — O(n log n) — where the naive
``left.ts >= right.ts`` conditional join materializes O(n_left ×
n_right) per key before filtering. This is how kdb/QuestDB-style asof
semantics map onto a shuffle engine.

Ties: a right row at exactly left.ts matches (sorted before the left
row via the side tag); duplicate right rows on one (key, ts) are
collapsed to the highest sort-order row first, so the result is
deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row + latest right values at or
    before its timestamp (nulls when no prior right row exists)."""
    keys = [key] if isinstance(key, str) else list(key)

    # Deterministic: one right row per (key, ts) — keep the last by
    # value sort order.
    wdedup = Window.partitionBy(*keys, right_ts).orderBy(
        *[F.col(c).desc() for c in right_values]
    )
    r = (
        right.withColumn("__rn", F.row_number().over(wdedup))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    left_cols = left.columns
    # side=0 sorts right rows before left rows at equal ts, so an
    # exactly-simultaneous right row is visible to the left row.
    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.lit(1).alias("__side"),
        F.col(left_ts).alias("__ts"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"__r_{c}")
          for c in right_values],
    )
    r_tagged = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in keys else F.col(c)
          for c in left_cols],
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    unioned = l_tagged.unionByName(r_tagged)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left_cols],
        F.col("__side"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_values
        ],
    )
    return carried.where(F.col("__side") == 1).drop("__side")
