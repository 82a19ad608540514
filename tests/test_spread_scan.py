"""spread_small_scan must spread a many-tiny-files scan even when the
file count exceeds core count: Spark bin-packs tiny files into few
FilePartitions, so file count alone never proves parallelism."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.dedup import (
    _bytes_conf,
    spread_small_scan,
)


def test_many_tiny_files_still_spread(spark, tmp_path):
    target = spark.sparkContext.defaultParallelism
    n_files = target + 4  # more files than cores, each a few rows
    for i in range(n_files):
        spark.range(i * 10, i * 10 + 10).withColumn(
            "text", F.lit("tiny doc payload")
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"f{i}.parquet")
        )
    df = spark.read.parquet(str(tmp_path / "*.parquet"))
    assert len(df.inputFiles()) >= n_files
    # Bin-packing collapses the tiny files into fewer splits than
    # cores — the exact situation the old file-count short-circuit
    # misjudged.
    assert df.rdd.getNumPartitions() < target
    spread = spread_small_scan(df)
    assert spread.rdd.getNumPartitions() >= target
    assert spread.count() == n_files * 10


def test_large_scan_short_circuits(spark):
    """A scan whose packing mass guarantees >= target splits must be
    returned untouched (no repartition node)."""
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    big = spark.range(0, 1000)  # not a file scan: inputFiles() == []
    # range has defaultParallelism partitions already — no-op path
    out = spread_small_scan(big)
    assert out.rdd.getNumPartitions() >= 1
    assert "Repartition" not in out._jdf.queryExecution().logical().toString()


def test_bytes_conf_parsing(spark):
    spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
    assert (
        _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 0)
        == 128 * 1024**2
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    assert (
        _bytes_conf(spark, "spark.sql.files.maxPartitionBytes", 0)
        == 134217728
    )
    assert _bytes_conf(spark, "spark.graft.nonexistent.conf", 7) == 7
