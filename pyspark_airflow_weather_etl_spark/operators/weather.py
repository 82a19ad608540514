"""The reference pipeline's semantic core, as reusable operators.

Bronze→Silver→Gold for the hourly-weather data model (SURVEY.md §1):

- ``flatten_hourly`` is the reference's signature transformation —
  struct-of-parallel-arrays → arrays_zip → explode → flat hourly fact
  (/root/reference/spark_jobs/silver_openmeteo.py:28-56) — generalized
  to any set of parallel metric arrays and to *many* documents per
  batch (the reference's ``limit(1)`` kept exactly one; here multiple
  locations/days flow through one plan).
- ``daily_rollup`` is gold_openmeteo.py:20-27 generalized from a
  one-partition global aggregate to a grouped aggregate over all days
  (one job for any date range — no per-day driver loop).

Partition keys are int end-to-end (fixes the string/int mismatch in
the reference, SURVEY.md §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas

#: metric array fields inside the bronze ``hourly`` struct → silver names
METRICS = {
    "temperature_2m": "temperature_c",
    "relative_humidity_2m": "humidity_pct",
    "precipitation": "precip_mm",
}


def read_bronze(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """Bronze scan with an explicit schema — no inference pass
    (the reference infers: silver_openmeteo.py:24; at 100 TB that is
    a full extra read). ``multiline=True`` for pretty-printed API
    dumps (one document spanning lines); the default line-delimited
    mode is splittable and preferred for large landings."""
    return (
        spark.read.schema(schemas.BRONZE_WEATHER)
        .option("multiLine", str(multiline).lower())
        .json(path)
    )


def flatten_hourly(bronze: DataFrame, dedupe: bool = True) -> DataFrame:
    """Unpivot columnar-JSON time-series → one row per hour.

    arrays_zip aligns the parallel arrays positionally; explode is a
    narrow op (no shuffle) so flattening scales with input splits.
    y/m/d derive from event_ts *in the plan* — not driver-side string
    slicing (SURVEY.md §2.4 D2) — so one job covers any date range and
    the writer's partitionBy sees real columns.

    Schema evolution: a document missing a metric array (the API adds
    or drops a field) yields nulls for that metric — the explicit
    bronze schema makes the field nullable instead of silently
    re-inferring a different shape (SURVEY.md §7 hard-point e).

    Duplicate documents: the reference keeps one arbitrary document
    per day via ``limit(1)`` (silver_openmeteo.py:28); ``dedupe=True``
    generalizes that to dropDuplicates on the (location, hour) key —
    deterministic, and correct when a day's directory holds several
    documents for *different* locations.
    """
    # A document missing one metric array must not vanish: arrays_zip
    # of a NULL array is NULL and explode(NULL) drops the row, so each
    # metric falls back to a null-array shaped like `time`.
    null_like_time = F.transform(
        F.col("hourly.time"), lambda _: F.lit(None).cast("double")
    )
    zipped = bronze.select(
        F.col("latitude").alias("lat"),
        F.col("longitude").alias("lon"),
        F.col("timezone").alias("tz"),
        F.explode(
            F.arrays_zip(
                F.col("hourly.time").alias("time"),
                *[
                    F.coalesce(F.col(f"hourly.{src}"), null_like_time).alias(src)
                    for src in METRICS
                ],
            )
        ).alias("row"),
    )
    ts = F.to_timestamp(F.col("row.time"))
    flat = zipped.select(
        "lat",
        "lon",
        "tz",
        *[
            F.col(f"row.{src}").cast("double").alias(dst)
            for src, dst in METRICS.items()
        ],
        ts.alias("event_ts"),
        F.year(ts).alias("y"),
        F.month(ts).alias("m"),
        F.dayofmonth(ts).alias("d"),
    )
    if dedupe:
        flat = flat.dropDuplicates(["lat", "lon", "event_ts"])
    return flat


def daily_rollup(silver: DataFrame, exact: bool = False) -> DataFrame:
    """Gold: per-day min/max/avg temperature, precip sum, avg humidity
    (exact aggregate set of gold_openmeteo.py:22-26). Partial+final
    hash aggregation — one narrow shuffle of day-level groups.

    ``exact=True`` switches SUM/AVG to the DECIMAL(18,6) accumulation
    of ``functions.exact`` — order- and engine-independent results for
    oracle hash-comparison and reproducible re-runs (the plain float
    path is cheaper and fine for serving)."""
    if exact:
        from ..functions.exact import avg_of, dsum

        return silver.groupBy("y", "m", "d").agg(
            F.min("temperature_c").alias("min_temp_c"),
            F.max("temperature_c").alias("max_temp_c"),
            avg_of("temperature_c", "avg_temp_c"),
            dsum("precip_mm", "precip_mm_sum"),
            avg_of("humidity_pct", "avg_humidity_pct"),
        )
    return silver.groupBy("y", "m", "d").agg(
        F.min("temperature_c").alias("min_temp_c"),
        F.max("temperature_c").alias("max_temp_c"),
        F.avg("temperature_c").alias("avg_temp_c"),
        F.sum("precip_mm").alias("precip_mm_sum"),
        F.avg("humidity_pct").alias("avg_humidity_pct"),
    )


def write_partitioned(df: DataFrame, path: str, keys: tuple[str, ...] = ("y", "m", "d")) -> None:
    """Partitioned parquet sink with *dynamic* partition overwrite:
    re-running a day rewrites only that day's partitions. The
    reference's static ``mode("overwrite")`` silently clobbers every
    previously written partition (silver_openmeteo.py:62-69 —
    SURVEY.md §2.1 S6), which this engine deliberately fixes. No
    ``coalesce(1)``: small-file control belongs to AQE +
    maxRecordsPerFile, not a parallelism collapse."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*keys)
        .parquet(path)
    )
