"""Sinks (SURVEY.md §2.1 S2/S6/S7).

- ``write_json_partitioned``: the raw landing sink — hive-layout JSON,
  generalizing the reference's boto3 put_object of one file per day
  (weather_daily_etl.py:35-50) to a distributed write.
- ``write_parquet_partitioned``: columnar layer sink with *dynamic*
  partition overwrite (the S6 fix; the reference's static overwrite
  clobbers every partition) and no ``coalesce(1)`` anti-pattern —
  file sizing belongs to maxRecordsPerFile/AQE, not a parallelism
  collapse.
- ``write_jdbc``: the serving stage sink (load_gold_to_pg.py:36-43).
  Import/driver-gated: this container ships no JDBC driver jar, so
  the call path is exercised by asserting the exact writer config.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_json_partitioned(
    df: DataFrame, path: str, keys: Sequence[str] = ("y", "m", "d")
) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*keys)
        .json(path)
    )


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    keys: Sequence[str] = ("y", "m", "d"),
    max_records_per_file: int = 5_000_000,
) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*keys)
        .parquet(path)
    )


def overwrite_parquet_swap(df: DataFrame, path: str) -> None:
    """Overwrite ``path`` with ``df`` even when ``df`` READS from
    ``path`` (the read-merge-rewrite serving pattern).

    A plain ``mode('overwrite')`` on the source path is unsafe: Spark
    deletes the target before the job finishes, so any task retry or
    lost cached block recomputes from a partially-deleted input and
    silently truncates the table. Instead: materialize fully into a
    sibling temp directory (the source stays intact for recomputes),
    then swap via the Hadoop FileSystem API — delete target, rename
    temp into place. A crash between delete and rename leaves the
    complete temp directory on disk (recoverable), never a silent
    truncation. On a real deployment prefer a transactional table
    format (Delta/Iceberg MERGE), which makes the swap a metadata op.
    """
    spark = df.sparkSession
    tmp = path.rstrip("/") + ".__swap_tmp__"
    df.write.mode("overwrite").parquet(tmp)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dest = jvm.org.apache.hadoop.fs.Path(path)
    src = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = dest.getFileSystem(conf)
    if fs.exists(dest):
        fs.delete(dest, True)
    if not fs.rename(src, dest):
        raise IOError(f"rename {tmp} -> {path} failed; data is at {tmp}")


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    mode: str = "append",
):
    """Configured-but-not-started JDBC append writer (stage-table
    load). Call ``.save()`` on the result where a driver jar exists;
    pair with operators.merge.upsert for the idempotent serving merge
    the reference does in raw SQL (weather_daily_etl.py:197-206)."""
    return (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", 10_000)
    )


def write_jdbc(df: DataFrame, url: str, table: str, user: str, password: str,
               **kw) -> None:
    jdbc_writer(df, url, table, user, password, **kw).save()
