"""Batch↔stream parity: the streaming daily rollup must equal the
batch daily rollup over the same bounded input (the oracle-parity
suite already checks both against DuckDB; this checks them against
each other directly, including schema)."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.plans.relational import events_daily_rollup
from pyspark_airflow_weather_etl_spark.streaming.rollup import (
    run_streaming_daily_rollup,
)

from conftest import SF_DIR


def test_stream_equals_batch(spark):
    batch = {
        (r.day, r.event_type): (r.min_value, r.max_value, r.avg_value,
                                r.sum_value, r.n_events)
        for r in events_daily_rollup(spark, SF_DIR).collect()
    }
    stream = {
        (r.day, r.event_type): (r.min_value, r.max_value, r.avg_value,
                                r.sum_value, r.n_events)
        for r in run_streaming_daily_rollup(spark, SF_DIR).collect()
    }
    assert batch == stream
