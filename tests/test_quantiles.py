"""Exact distributed quantiles (operators.quantiles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.quantiles import (
    exact_quantiles,
)


def test_matches_sorted_definition(spark):
    """Type-1 quantile == element at index ceil(p*n)-1 of the sorted
    multiset (duplicates included)."""
    vals = [5.0, 1.0, 3.0, 3.0, 2.0, 9.0, 7.0, 3.0, 2.0, 8.0, 6.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    probs = [(1, 11), (1, 2), (3, 4), (1, 1)]
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles(df, "x", probs).collect()
    }
    s = sorted(vals)
    for num, den in probs:
        target = -(-num * len(s) // den)  # ceil
        assert got[(num, den)] == s[target - 1], (num, den)


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (2.0,)], "x double"
    )
    got = exact_quantiles(df, "x", [(1, 1)]).collect()
    assert got[0]["value"] == 3.0  # max of the 3 non-null values


def test_duplicate_heavy_column(spark):
    """A column that is one value 990 times and another 10 times:
    p50 lands on the heavy value, p100 on the light one."""
    rows = [(1.0,)] * 990 + [(2.0,)] * 10
    df = spark.createDataFrame(rows, "x double")
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles(df, "x", [(1, 2), (1, 1)]).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(1, 1)] == 2.0


def test_bad_probs_raise(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [(0, 1)])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [(3, 2)])


def test_no_corpus_sort_in_plan(spark):
    """The scale claim: no global sort of the input — the only range
    exchange is over the narrow (value, count) frame, and every
    unbounded window sits above the tiny per-partition totals, not
    the corpus."""
    from conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = exact_quantiles(orders, "o_totalprice", [(1, 2)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the corpus-side aggregation must be partial before any exchange
    assert "partial" in plan.lower()
    # every range exchange is over the NARROW counts frame (__v), and
    # the corpus column is never globally sorted (the persisted
    # narrow subtree repeats textually in the printed plan, so count
    # kinds, not occurrences)
    assert "Exchange rangepartitioning(__v" in plan
    assert "rangepartitioning(o_totalprice" not in plan
    assert "Sort [o_totalprice" not in plan


def test_group_quantiles_match_per_group_sorted(spark):
    from pyspark_airflow_weather_etl_spark.operators.quantiles import (
        exact_quantiles_by_group,
    )

    rows = [("a", float(v)) for v in [5, 1, 3, 3, 2]] + [
        ("b", float(v)) for v in [9, 7, 3]
    ] + [(None, 4.0), (None, 6.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    probs = [(1, 2), (1, 1)]
    got = {
        (r["g"], r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_by_group(df, "g", "x", probs).collect()
    }
    data = {"a": [1, 2, 3, 3, 5], "b": [3, 7, 9], None: [4, 6]}
    for g, vals in data.items():
        for num, den in probs:
            target = -(-num * len(vals) // den)
            assert got[(g, num, den)] == vals[target - 1], (g, num, den)


def test_group_quantiles_plan_shuffles_counts_only(spark):
    """The group windows run over the aggregated (group, value,
    count) frame: partial aggregation collapses the corpus map-side
    before the one hash exchange, and no corpus-row sort appears."""
    from conftest import SF_DIR

    from pyspark_airflow_weather_etl_spark.operators.quantiles import (
        exact_quantiles_by_group,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = exact_quantiles_by_group(
        orders, "o_orderstatus", "o_totalprice", [(1, 2)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()
    assert "rangepartitioning" not in plan
