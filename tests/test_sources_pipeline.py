"""HTTP source (injected fetcher), distributed fetch, JDBC writer
config, and the range-parameterized pipeline runner."""

from __future__ import annotations

import json
from datetime import date

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.pipeline import WeatherPipeline
from pyspark_airflow_weather_etl_spark.schemas import GOLD_WEATHER
from pyspark_airflow_weather_etl_spark.sources.http import (
    fetch_distributed,
    read_http_json,
)
from pyspark_airflow_weather_etl_spark.sources.writers import jdbc_writer

from test_weather import _doc  # reuse the bronze document factory


def test_read_http_json_with_injected_fetcher(spark):
    served = {
        "https://api.test/v1?d=2024-03-01": json.dumps(_doc("2024-03-01", 52.5)),
        "https://api.test/v1?d=2024-03-02": json.dumps(_doc("2024-03-02", 48.8)),
    }
    df = read_http_json(spark, list(served), served.__getitem__)
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].hourly.time[0] == "2024-03-01T00:00"
    assert df.schema.fieldNames() == ["latitude", "longitude", "timezone", "hourly"]


def test_fetch_distributed_runs_on_executors(spark):
    keys = spark.range(20).select(
        F.concat(F.lit("https://api.test/item/"), F.col("id")).alias("url")
    )

    def factory():
        return lambda url: f"body-of-{url.rsplit('/', 1)[1]}"

    out = {r.url: r.body for r in fetch_distributed(keys, "url", factory).collect()}
    assert len(out) == 20
    assert out["https://api.test/item/7"] == "body-of-7"


def test_jdbc_writer_is_configured_not_started(spark):
    df = spark.createDataFrame([(2024, 3, 1, 1.0)], "y int, m int, d int, v double")
    w = jdbc_writer(df, "jdbc:postgresql://db:5432/x", "stage", "u", "p")
    # Configured DataFrameWriter; .save() needs a driver jar (absent
    # here by design) — the contract is the option set.
    assert w is not None


def test_pipeline_backfill_and_serve(spark, tmp_path):
    import test_weather

    bronze = tmp_path / "bronze"
    for day in ["2024-03-01", "2024-03-02", "2024-03-03"]:
        p = bronze / f"y={day[:4]}/m={day[5:7]}/d={day[8:10]}"
        p.mkdir(parents=True)
        (p / "doc.json").write_text(json.dumps(test_weather._doc(day, 50.0)))

    pipe = WeatherPipeline(
        spark,
        bronze_path=str(bronze),
        silver_path=str(tmp_path / "silver"),
        gold_path=str(tmp_path / "gold"),
    )
    gold = pipe.backfill(date(2024, 3, 1), date(2024, 3, 2))
    assert gold.count() == 2  # day 3 excluded by the range predicate

    # serving merge: start empty, apply twice → idempotent
    target = spark.createDataFrame([], GOLD_WEATHER)
    once = pipe.serve(target, date(2024, 3, 1), date(2024, 3, 2))
    twice = pipe.serve(once, date(2024, 3, 1), date(2024, 3, 2))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == 2
