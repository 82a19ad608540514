"""Data-quality gates for pipeline layers.

The reference's only quality signal is a row-count echo in the upsert
psql step (/root/reference/dags/weather_daily_etl.py:183-184). Here
the checks are declarative expectations evaluated in ONE pass over
the data (a single aggregate job computes every violation count), and
``observe()`` attaches zero-cost metrics to a job the pipeline runs
anyway — no extra scan at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    #: boolean Column: True where the row VIOLATES the expectation
    violation: Column


def expect_not_null(*cols: str) -> list[Expectation]:
    return [
        Expectation(f"not_null_{c}", F.col(c).isNull()) for c in cols
    ]


def expect_in_range(col: str, lo: float, hi: float) -> Expectation:
    return Expectation(
        f"range_{col}", ~F.col(col).between(lo, hi) | F.col(col).isNull()
    )


def expect_unique_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows whose key occurs more than once (empty = unique)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    return (
        df.withColumn("__n", F.count("*").over(w))
        .where(F.col("__n") > 1)
        .drop("__n")
    )


def check(df: DataFrame, expectations: Sequence[Expectation]) -> dict[str, int]:
    """Violation count per expectation — ONE aggregate over one scan,
    however many expectations."""
    row = df.agg(
        *[
            F.count(F.when(e.violation, 1)).alias(e.name)
            for e in expectations
        ]
    ).first()
    return {e.name: row[e.name] for e in expectations}


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile in long format — ONE aggregate pass over
    one scan, however many columns: (column_name, n_rows, n_non_null,
    n_distinct, min_value, max_value). The wide agg row unpivots via
    ``stack``; min/max are cast to string so heterogeneous column
    types share one schema.

    n_distinct is exact (COUNT DISTINCT — Spark plans the multi-
    distinct agg with an Expand, one pass over the scan); at 100 TB
    swap in ``approx_count_distinct`` per column for a single-agg
    sketch pass — exact is kept here because the DuckDB oracle
    hash-checks the values."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    stack_args = ", ".join(
        f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_non_null, n_distinct, min_value, max_value)",
        "n_rows",
    ).select(
        "column_name", "n_rows", "n_non_null", "n_distinct",
        "min_value", "max_value",
    )


def with_metrics(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach observe() counters to a DataFrame: the metrics are
    collected as a side effect of whatever action runs next (a write,
    a count) — no second pass. Read ``observation.get`` after the
    action completes."""
    obs = Observation(name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}")
            for c in df.columns[:8]
        ],
    )
    return observed, obs
