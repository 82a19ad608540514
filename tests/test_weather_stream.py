"""The full weather pipeline at streaming latency: days arriving
incrementally must yield the same gold table as batch processing, and
re-delivery must not double-count."""

from __future__ import annotations

import json

from pyspark_airflow_weather_etl_spark.operators.weather import (
    daily_rollup,
    flatten_hourly,
    read_bronze,
)
from pyspark_airflow_weather_etl_spark.sources.writers import read_serving_table
from pyspark_airflow_weather_etl_spark.streaming.weather_stream import (
    run_weather_stream,
)

from test_weather import _doc


def _write_day(root, day, lat):
    p = root / f"y={day[:4]}/m={day[5:7]}/d={day[8:10]}"
    p.mkdir(parents=True, exist_ok=True)
    (p / f"doc_{lat}.json").write_text(json.dumps(_doc(day, lat)))


def test_incremental_days_match_batch(spark, tmp_path):
    bronze = tmp_path / "bronze"
    gold = str(tmp_path / "gold")
    ckpt = str(tmp_path / "ckpt")

    # Day 1 arrives; stream processes it.
    _write_day(bronze, "2024-03-01", 52.5)
    run_weather_stream(spark, str(bronze), gold, checkpoint_dir=ckpt)
    assert read_serving_table(spark, gold).count() == 1

    # Days 2 and 3 land later; resume from the checkpoint — only the
    # new files are read, and the gold table grows incrementally.
    _write_day(bronze, "2024-03-02", 48.8)
    _write_day(bronze, "2024-03-03", 40.1)
    run_weather_stream(spark, str(bronze), gold, checkpoint_dir=ckpt)

    got = {
        (r.y, r.m, r.d): (r.min_temp_c, r.max_temp_c, r.avg_temp_c,
                          r.precip_mm_sum, r.avg_humidity_pct)
        for r in read_serving_table(spark, gold).collect()
    }
    batch = {
        (r.y, r.m, r.d): (r.min_temp_c, r.max_temp_c, r.avg_temp_c,
                          r.precip_mm_sum, r.avg_humidity_pct)
        for r in daily_rollup(
            flatten_hourly(read_bronze(spark, str(bronze)))
        ).collect()
    }
    assert got == batch
    assert len(got) == 3

    # Full re-delivery (fresh checkpoint): keyed merge keeps the
    # table identical — the reference's re-run guarantee.
    run_weather_stream(spark, str(bronze), gold, checkpoint_dir=None)
    again = {
        (r.y, r.m, r.d): (r.min_temp_c, r.max_temp_c, r.avg_temp_c,
                          r.precip_mm_sum, r.avg_humidity_pct)
        for r in read_serving_table(spark, gold).collect()
    }
    assert again == got
