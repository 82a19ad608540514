"""Pipeline runner: the reference's 5-task Airflow DAG as one
parameterized function chain (SURVEY.md §2.8 O1-O5, §3).

The reference's topology — extract → silver → gold → stage → upsert,
each task a fresh spark-submit container templated on ``{{ ds }}``
(weather_daily_etl.py:59-217) — collapses here into composable
DataFrame stages behind one SparkSession. Orchestration (the date)
is a *parameter of the plan*, not a process topology: a backfill is
one call with a range predicate, not N serialized DAG runs
(README.md:86-102 does it with a shell loop and max_active_runs=1).

The reference's remaining orchestration-level semantics map as:
- O3 retry policy (retries 1-2 @ 2 min, weather_daily_etl.py:53-57):
  engine-level now — ``sources.http.with_retry`` wraps every fetch
  in bounded exponential backoff, so transient upstream failures
  retry per-request instead of per-task; a scheduler MAY still add
  whole-stage retries on top.
- O5 task isolation (one container per stage): out of engine scope
  by design — stages share one session here; process isolation is a
  scheduler concern and adds nothing to query semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.merge import upsert
from .operators.weather import daily_rollup, flatten_hourly, read_bronze
from .sources.writers import write_parquet_partitioned


@dataclass
class WeatherPipeline:
    """Bronze → silver → gold → serving for a date range."""

    spark: SparkSession
    bronze_path: str
    silver_path: str
    gold_path: str
    keys: tuple[str, ...] = field(default=("y", "m", "d"))

    def _day_filter(self, df: DataFrame, start: date, end: date) -> DataFrame:
        d = F.make_date("y", "m", "d")
        return df.where(
            (d >= F.lit(start.isoformat()).cast("date"))
            & (d <= F.lit(end.isoformat()).cast("date"))
        )

    def run_silver(self, start: date, end: date) -> DataFrame:
        """One job for the whole range — partition-pruned by the
        y/m/d predicate (the reference builds per-day paths in the
        driver instead: silver_openmeteo.py:15,23)."""
        silver = self._day_filter(
            flatten_hourly(read_bronze(self.spark, self.bronze_path)), start, end
        )
        write_parquet_partitioned(silver, self.silver_path, self.keys)
        return silver

    def run_gold(self, start: date, end: date) -> DataFrame:
        silver = self.spark.read.parquet(self.silver_path)
        gold = daily_rollup(self._day_filter(silver, start, end))
        write_parquet_partitioned(gold, self.gold_path, self.keys)
        return gold

    def serve(self, target: DataFrame, start: date, end: date) -> DataFrame:
        """The idempotent serving merge (replaces the reference's
        Postgres stage + ON CONFLICT upsert, weather_daily_etl.py:
        160-214). Returns the merged serving table; persist it with
        write_parquet_partitioned or writers.write_jdbc."""
        gold = self._day_filter(
            self.spark.read.parquet(self.gold_path), start, end
        )
        return upsert(target, gold.select(*target.columns), list(self.keys))

    def backfill(self, start: date, end: date) -> DataFrame:
        """The reference's 10-day sequential-trigger backfill as one
        range-parameterized run."""
        self.run_silver(start, end)
        return self.run_gold(start, end)
