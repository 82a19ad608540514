"""The reference pipeline's semantic core as oracle-checked catalog
entries.

Round 1 left the actual reference transforms (bronze→silver flatten,
gold rollup, serving upsert) pytest-only; these entries give them the
same external DuckDB-hash verification as every relational query:

- ``weather_flatten_hourly`` — arrays_zip → explode → flat hourly fact
  (/root/reference/spark_jobs/silver_openmeteo.py:28-56), run over a
  committed bronze JSON fixture (``fixtures/bronze_weather``) that
  includes a duplicate document landing and a document missing one
  metric array (schema evolution). Oracle: DuckDB ``read_json`` +
  lockstep ``unnest``.
- ``weather_daily_rollup`` — the gold aggregate set
  (gold_openmeteo.py:22-26) over the flattened fixture, with
  DECIMAL(18,6) accumulation for engine-exact SUM/AVG.
- ``merge_upsert_daily`` — the serving MERGE contract
  (dags/weather_daily_etl.py:186-209) as collapse + anti-join ∪
  updates, against a window/row_number + FULL OUTER oracle.

The fixture path is resolved relative to the repo root so the entries
run from any cwd; sf_dir is unused by the two weather entries (the
bronze fixture IS their input — the point is the JSON shape, not the
scale) and feeds the merge entry's events-table derivation.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import SQL_AVG, SQL_DSUM
from ..operators.merge import upsert
from ..operators.weather import daily_rollup, flatten_hourly, read_bronze
from ..session import apply_runtime_confs
from ..sources.tables import load_table
from .registry import register

BRONZE_FIXTURE = str(
    (Path(__file__).resolve().parents[2] / "fixtures" / "bronze_weather")
)

# DuckDB equivalent of the bronze scan + flatten: explicit columns (no
# inference, mirroring schemas.BRONZE_WEATHER), lockstep unnest of the
# parallel arrays, the same null-array fallback for a missing metric,
# DISTINCT for the duplicate-document landing.
_FLAT_CTE = f"""
WITH bronze AS (
  SELECT * FROM read_json('{BRONZE_FIXTURE}/**/*.json',
    columns={{latitude: 'DOUBLE', longitude: 'DOUBLE', timezone: 'VARCHAR',
             hourly: 'STRUCT(time VARCHAR[], temperature_2m DOUBLE[],
                             relative_humidity_2m DOUBLE[],
                             precipitation DOUBLE[])'}})
), flat AS (
  SELECT DISTINCT
    latitude AS lat, longitude AS lon, timezone AS tz,
    unnest(hourly.temperature_2m) AS temperature_c,
    unnest(hourly.relative_humidity_2m) AS humidity_pct,
    unnest(coalesce(hourly.precipitation,
                    list_transform(hourly.time, x -> NULL::DOUBLE)))
        AS precip_mm,
    strptime(unnest(hourly.time), '%Y-%m-%dT%H:%M') AS event_ts
  FROM bronze
), silver AS (
  SELECT lat, lon, tz, temperature_c, humidity_pct, precip_mm, event_ts,
         CAST(year(event_ts) AS INT) AS y,
         CAST(month(event_ts) AS INT) AS m,
         CAST(day(event_ts) AS INT) AS d
  FROM flat
)
"""


@register(
    "weather_flatten_hourly",
    oracle=_FLAT_CTE + "SELECT * FROM silver",
)
def weather_flatten_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's signature transform (silver_openmeteo.py:28-56):
    struct-of-parallel-arrays JSON → arrays_zip → explode → flat hourly
    fact, with in-plan y/m/d and (location, hour) dedupe. The fixture
    exercises the two hard cases: a duplicate document landing and a
    document missing the precipitation array (nulls, not lost rows)."""
    apply_runtime_confs(spark)
    return flatten_hourly(read_bronze(spark, BRONZE_FIXTURE))


@register(
    "weather_daily_rollup",
    oracle=_FLAT_CTE
    + f"""
    SELECT y, m, d,
           min(temperature_c) AS min_temp_c,
           max(temperature_c) AS max_temp_c,
           {SQL_AVG('temperature_c', 'avg_temp_c')},
           {SQL_DSUM('precip_mm', 'precip_mm_sum')},
           {SQL_AVG('humidity_pct', 'avg_humidity_pct')}
    FROM silver
    GROUP BY y, m, d
    """,
)
def weather_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold daily rollup (gold_openmeteo.py:22-26) over the flattened
    bronze fixture — one grouped aggregate covering every day (the
    reference runs one job per day). ``exact=True`` uses DECIMAL(18,6)
    accumulation so SUM/AVG hash-match DuckDB bit-for-bit."""
    apply_runtime_confs(spark)
    return daily_rollup(
        flatten_hourly(read_bronze(spark, BRONZE_FIXTURE)), exact=True
    )


@register(
    "merge_upsert_daily",
    oracle="""
    WITH target AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events
      WHERE ts < TIMESTAMP '2024-01-21'
      GROUP BY 1
    ), raw_updates AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             min(value) AS min_value,
             max(value) AS max_value
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-15'
      GROUP BY 1, event_type
    ), collapsed AS (
      SELECT day, min_value, max_value
      FROM (
        SELECT day, min_value, max_value,
               row_number() OVER (
                 PARTITION BY day
                 ORDER BY min_value DESC, max_value DESC
               ) AS rn
        FROM raw_updates
      )
      WHERE rn = 1
    )
    SELECT coalesce(u.day, t.day) AS day,
           CASE WHEN u.day IS NOT NULL THEN u.min_value
                ELSE t.min_value END AS min_value,
           CASE WHEN u.day IS NOT NULL THEN u.max_value
                ELSE t.max_value END AS max_value
    FROM target t FULL OUTER JOIN collapsed u ON t.day = u.day
    """,
)
def merge_upsert_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The serving upsert contract (weather_daily_etl.py:186-209):
    updates with duplicate keys (one rollup row per (day, event_type))
    are collapsed to one row per key, then MERGEd into a daily target —
    matched keys replaced, new keys inserted. ``how='last'`` keeps the
    highest-sorting duplicate; the oracle replays the same collapse
    with row_number and the merge with FULL OUTER JOIN + key-presence
    CASE."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    target = (
        ev.where(F.col("ts") < F.lit("2024-01-21").cast("timestamp"))
        .groupBy(day)
        .agg(F.min("value").alias("min_value"), F.max("value").alias("max_value"))
    )
    updates = (
        ev.where(F.col("ts") >= F.lit("2024-01-15").cast("timestamp"))
        .groupBy(day, F.col("event_type"))
        .agg(F.min("value").alias("min_value"), F.max("value").alias("max_value"))
        .drop("event_type")
    )
    return upsert(target, updates, ["day"], how="last")
