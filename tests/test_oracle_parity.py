"""Replicates the correctness driver's check for every catalog entry
that declares an oracle: row count, column set, and order-insensitive
*exact* value equality between the Spark plan and the DuckDB SQL at
sf0.001. Exactness (not tolerance) is the bar because the driver
hash-compares values — functions.exact documents how the plans earn
bit-identical floats.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark_airflow_weather_etl_spark.plans import REGISTRY

from conftest import SF_DIR

WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def _values_equal(a, b) -> bool:
    if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
        an = a is None or (isinstance(a, float) and math.isnan(a))
        bn = b is None or (isinstance(b, float) and math.isnan(b))
        return an == bn
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    q = REGISTRY[name]
    got = _normalize(q.fn(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(q.oracle).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y)
            for i, (x, y) in enumerate(zip(ga, wa))
            if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    """Oracle-less entries must at least execute and return a stable
    schema (the driver's weaker rows-only check)."""
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.columns
    assert df.count() >= 0
