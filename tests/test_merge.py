"""Upsert/merge contract tests (SURVEY.md §2.6 U1-U2): keyed
last-writer-wins merge with duplicate-source collapse, idempotent
under re-application — the engine's replacement for the reference's
Postgres ON CONFLICT upsert (weather_daily_etl.py:186-209).
"""

from __future__ import annotations

import pytest

from pyspark_airflow_weather_etl_spark.operators.merge import (
    collapse_duplicates,
    upsert,
)

KEYS = ["y", "m", "d"]
COLS = ["y", "m", "d", "min_temp_c", "max_temp_c"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_collapse_avg_is_reference_semantics(spark):
    """The reference AVGs every metric across duplicate keys —
    including min/max (weather_daily_etl.py:188-193). Bug-compatible
    by default, documented."""
    stage = _df(spark, [(2024, 3, 1, 10.0, 20.0), (2024, 3, 1, 12.0, 30.0)])
    out = collapse_duplicates(stage, KEYS).collect()
    assert len(out) == 1
    assert out[0].min_temp_c == 11.0  # AVG-of-min, as the reference does
    assert out[0].max_temp_c == 25.0


def test_upsert_updates_and_inserts(spark):
    target = _df(spark, [(2024, 3, 1, 1.0, 2.0), (2024, 3, 2, 3.0, 4.0)])
    updates = _df(spark, [(2024, 3, 2, 9.0, 9.5), (2024, 3, 3, 5.0, 6.0)])
    merged = {(r.y, r.m, r.d): r for r in upsert(target, updates, KEYS).collect()}
    assert len(merged) == 3
    assert merged[(2024, 3, 1)].min_temp_c == 1.0  # untouched
    assert merged[(2024, 3, 2)].min_temp_c == 9.0  # updated
    assert merged[(2024, 3, 3)].min_temp_c == 5.0  # inserted


def test_upsert_is_idempotent(spark):
    """Applying the same batch twice == applying it once (the
    reference's re-run/backfill guarantee, README.md:82)."""
    target = _df(spark, [(2024, 3, 1, 1.0, 2.0)])
    updates = _df(spark, [(2024, 3, 1, 7.0, 8.0), (2024, 3, 2, 3.0, 4.0)])
    once = upsert(target, updates, KEYS)
    twice = upsert(once, updates, KEYS)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_upsert_collapses_duplicate_source_keys(spark):
    target = spark.createDataFrame(
        [], "y int, m int, d int, min_temp_c double, max_temp_c double"
    )
    updates = _df(
        spark, [(2024, 3, 1, 10.0, 20.0), (2024, 3, 1, 20.0, 40.0)]
    )
    out = upsert(target, updates, KEYS).collect()
    assert len(out) == 1
    assert out[0].min_temp_c == 15.0


def test_collapse_avg_rejects_non_numeric_value_columns(spark):
    """F.avg on a string column silently yields NULL — a default-mode
    upsert over mixed-type rows would destroy data, so it must raise."""
    stage = spark.createDataFrame(
        [(2024, 3, 1, 10.0, "sunny")],
        "y int, m int, d int, min_temp_c double, sky string",
    )
    with pytest.raises(TypeError, match="not numeric"):
        collapse_duplicates(stage, KEYS, how="avg")


def test_upsert_preserves_target_schema_dtypes(spark):
    """avg() widens ints to double; the merge must cast back so the
    serving table's schema never silently mutates across upserts."""
    target = spark.createDataFrame(
        [(2024, 3, 1, 5)], "y int, m int, d int, n_hours int"
    )
    updates = spark.createDataFrame(
        [(2024, 3, 2, 7)], "y int, m int, d int, n_hours int"
    )
    merged = upsert(target, updates, KEYS)
    assert merged.schema == target.schema
