"""Data-quality gates: single-pass expectation checks, unique-key
probe, and observe()-attached metrics collected from a write."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.quality import (
    check,
    expect_in_range,
    expect_not_null,
    expect_unique_key,
    with_metrics,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def test_check_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 120.0), (None, 5.0)],
        "k long, v double",
    )
    got = check(
        df,
        [*expect_not_null("k", "v"), expect_in_range("v", 0, 100)],
    )
    assert got == {"not_null_k": 1, "not_null_v": 1, "range_v": 2}


def test_unique_key_probe(spark):
    orders = load_table(spark, SF_DIR, "orders")
    assert expect_unique_key(orders, ["o_orderkey"]).count() == 0
    li = load_table(spark, SF_DIR, "lineitem")
    # lineitem's (orderkey, linenumber) is NOT unique in the fixture —
    # the probe must surface that honestly.
    assert expect_unique_key(li, ["l_orderkey", "l_linenumber"]).count() > 0


def test_observe_metrics_from_write(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    observed, obs = with_metrics(ev)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    metrics = obs.get
    assert metrics["n_rows"] == ev.count()
    assert metrics["nulls_event_id"] == 0
