"""Fixture-table loaders: explicit-schema parquet scans.

Every scan declares its StructType (no inference — SURVEY.md §1.3) so
Catalyst can prune columns and push filters into the parquet reader
without a footer-merge pass over 100 TB of files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..session import apply_runtime_confs


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table from ``{sf_dir}/{name}.parquet``.

    ``events.ts`` arrives as parquet TIMESTAMP(NANOS); Spark 4 reads
    nanos only as a long (``spark.sql.legacy.parquet.nanosAsLong``),
    so the column is re-expressed as a micros timestamp *in the plan*
    (`ts div 1000` stays integer arithmetic — a double division would
    lose precision above 2^53 ns).
    """
    apply_runtime_confs(spark)
    schema = schemas.FIXTURES.get(name)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in schemas.FIXTURES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
