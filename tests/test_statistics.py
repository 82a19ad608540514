"""Sketch accuracy bounds: the approximate aggregates that replace
exact computation at scale must land near their exact counterparts."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.plans.statplans import (
    approx_distinct_users,
    approx_percentile_prices,
)

from conftest import SF_DIR


def test_hll_within_5_percent(spark):
    for r in approx_distinct_users(spark, SF_DIR).collect():
        assert abs(r.approx_users - r.exact_users) <= max(1, 0.05 * r.exact_users), (
            f"{r.event_type}: approx {r.approx_users} vs exact {r.exact_users}"
        )


def test_approx_percentile_close_to_exact(spark):
    for r in approx_percentile_prices(spark, SF_DIR).collect():
        rel = abs(r.approx_p50 - r.exact_p50) / r.exact_p50
        assert rel <= 0.05, f"{r.o_orderstatus}: rel err {rel}"
