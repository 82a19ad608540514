"""End-to-end test of the reference's medallion semantics: bronze
JSON (struct-of-parallel-arrays) → silver hourly fact → gold daily
rollup → partitioned sink, including the dynamic-partition-overwrite
idempotency fix (SURVEY.md §2.1 S6, §2.6 U3).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark import schemas
from pyspark_airflow_weather_etl_spark.operators.weather import (
    daily_rollup,
    flatten_hourly,
    read_bronze,
    write_partitioned,
)


def _doc(day: str, lat: float, n_hours: int = 24) -> dict:
    return {
        "latitude": lat,
        "longitude": 13.4,
        "timezone": "UTC",
        "hourly": {
            "time": [f"{day}T{h:02d}:00" for h in range(n_hours)],
            "temperature_2m": [10.0 + h * 0.5 for h in range(n_hours)],
            "relative_humidity_2m": [50.0 + h for h in range(n_hours)],
            "precipitation": [0.1 * h for h in range(n_hours)],
        },
    }


@pytest.fixture()
def bronze_dir(tmp_path):
    root = tmp_path / "bronze"
    for day, lat in [("2024-03-01", 52.52), ("2024-03-02", 48.85)]:
        y, m, d = day[:4], day[5:7], day[8:10]
        p = root / f"y={y}/m={m}/d={d}"
        p.mkdir(parents=True)
        (p / f"openmeteo_{day}.json").write_text(json.dumps(_doc(day, lat)))
    return str(root)


def test_bronze_to_silver_schema_and_rows(spark, bronze_dir):
    silver = flatten_hourly(read_bronze(spark, bronze_dir))
    assert silver.schema == schemas.SILVER_WEATHER
    rows = silver.collect()
    assert len(rows) == 48  # 2 days × 24 hours
    first = min(rows, key=lambda r: (r.y, r.m, r.d, r.event_ts))
    assert first.temperature_c == 10.0
    assert first.y == 2024 and first.m == 3 and first.d == 1
    assert first.lat == 52.52


def test_multiline_pretty_json(spark, tmp_path):
    p = tmp_path / "b" / "y=2024/m=03/d=09"
    p.mkdir(parents=True)
    (p / "doc.json").write_text(json.dumps(_doc("2024-03-09", 50.0), indent=2))
    silver = flatten_hourly(read_bronze(spark, str(tmp_path / "b"), multiline=True))
    assert silver.count() == 24


def test_gold_rollup_matches_reference_aggregates(spark, bronze_dir):
    gold = daily_rollup(flatten_hourly(read_bronze(spark, bronze_dir)))
    row = {(r.y, r.m, r.d): r for r in gold.collect()}[(2024, 3, 1)]
    temps = [10.0 + h * 0.5 for h in range(24)]
    assert row.min_temp_c == min(temps)
    assert row.max_temp_c == max(temps)
    assert abs(row.avg_temp_c - sum(temps) / 24) < 1e-9
    assert abs(row.precip_mm_sum - sum(0.1 * h for h in range(24))) < 1e-9
    assert abs(row.avg_humidity_pct - sum(50.0 + h for h in range(24)) / 24) < 1e-9


def test_dynamic_partition_overwrite_is_idempotent(spark, bronze_dir, tmp_path):
    """Re-running one day must rewrite only that day's partition —
    the reference's static overwrite clobbers every partition
    (silver_openmeteo.py:62-69), which is the bug this asserts against."""
    out = str(tmp_path / "silver")
    silver = flatten_hourly(read_bronze(spark, bronze_dir))
    write_partitioned(silver, out)
    before = spark.read.parquet(out).count()
    assert before == 48

    # Re-run ONLY day 2 (a daily incremental re-run).
    day2 = silver.where(F.col("d") == 2)
    write_partitioned(day2, out)
    after = spark.read.parquet(out)
    assert after.count() == 48, "static overwrite would have clobbered day 1"
    assert after.where(F.col("d") == 1).count() == 24


def test_missing_metric_schema_evolution(spark, tmp_path):
    """A bronze doc without the precipitation array (API field drop /
    add — SURVEY.md §7 hard-point e) must keep its rows, with nulls
    for the missing metric only."""
    doc = _doc("2024-03-05", 51.0)
    del doc["hourly"]["precipitation"]
    p = tmp_path / "b" / "y=2024/m=03/d=05"
    p.mkdir(parents=True)
    (p / "doc.json").write_text(json.dumps(doc))
    silver = flatten_hourly(read_bronze(spark, str(tmp_path / "b")))
    rows = silver.collect()
    assert len(rows) == 24
    assert all(r.precip_mm is None for r in rows)
    assert all(r.temperature_c is not None for r in rows)


def test_duplicate_documents_deduped(spark, bronze_dir, tmp_path):
    """Two copies of the same day's document (the reference guards
    this with limit(1) — silver_openmeteo.py:28) must flatten to one
    row per hour, not two."""
    day, lat = "2024-03-06", 40.0
    p = tmp_path / "b" / "y=2024/m=03/d=06"
    p.mkdir(parents=True)
    (p / "doc1.json").write_text(json.dumps(_doc(day, lat)))
    (p / "doc2.json").write_text(json.dumps(_doc(day, lat)))
    silver = flatten_hourly(read_bronze(spark, str(tmp_path / "b")))
    assert silver.count() == 24
    assert flatten_hourly(
        read_bronze(spark, str(tmp_path / "b")), dedupe=False
    ).count() == 48


def test_rerun_same_day_no_duplicates(spark, bronze_dir, tmp_path):
    out = str(tmp_path / "silver")
    silver = flatten_hourly(read_bronze(spark, bronze_dir))
    write_partitioned(silver, out)
    write_partitioned(silver, out)  # full re-run
    assert spark.read.parquet(out).count() == 48
