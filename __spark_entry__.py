"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine lives in ``pyspark_airflow_weather_etl_spark``; every
catalog entry (plans/) registers its Spark callable and its ANSI-SQL
oracle side by side, so this module is a thin re-export.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_airflow_weather_etl_spark import plans  # noqa: E402
from pyspark_airflow_weather_etl_spark.plans import relational  # noqa: E402

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped grouped aggregate over lineitem — the reference's
    gold-rollup aggregate family (min/max/avg/sum —
    /root/reference/spark_jobs/gold_openmeteo.py:20-27) generalized to
    a grouped hash-agg (SURVEY.md §7 Phase 1).
    """
    return relational.q1_pricing_summary(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    north-star extensions). Each callable takes (spark, sf_dir) and
    returns a DataFrame; computed columns are aliased identically to
    the oracle SQL."""
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for the genuinely
    non-SQL-expressible ops: MinHash/SimHash/SRP-LSH, which get
    rows-only checks plus pytest self-consistency tests)."""
    return plans.oracles()
