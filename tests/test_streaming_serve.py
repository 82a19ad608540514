"""foreachBatch streaming upsert: the streaming serving table must
equal the batch rollup, and replaying the whole stream must be
idempotent (keyed merge semantics — the reference's re-run guarantee
at streaming latency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.functions.exact import DEC
from pyspark_airflow_weather_etl_spark.sources.tables import load_table
from pyspark_airflow_weather_etl_spark.sources.writers import (
    read_serving_table,
    write_serving_version,
)
from pyspark_airflow_weather_etl_spark.streaming.serve import stream_upsert_daily

from conftest import SF_DIR


def _batch_truth(spark):
    ev = load_table(spark, SF_DIR, "events")
    return {
        (r.day, r.event_type): (r.sum_value, r.n_events)
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }


def test_stream_upsert_matches_batch_and_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "serving")
    stream_upsert_daily(spark, SF_DIR, target)
    got = {
        (r.day, r.event_type): (r.sum_value, r.n_events)
        for r in read_serving_table(spark, target).collect()
    }
    assert got == _batch_truth(spark)

    # Replay the entire stream into the same target (fresh checkpoint
    # → every event re-delivered): keyed upsert must converge to the
    # same table, not double counts.
    stream_upsert_daily(spark, SF_DIR, target)
    again = {
        (r.day, r.event_type): (r.sum_value, r.n_events)
        for r in read_serving_table(spark, target).collect()
    }
    assert again == got


def test_checkpointed_restart_is_noop(spark, tmp_path):
    """With a persistent checkpoint, a restart resumes from committed
    offsets and reprocesses nothing (exactly-once progress)."""
    target = str(tmp_path / "serving")
    ckpt = str(tmp_path / "ckpt")
    stream_upsert_daily(spark, SF_DIR, target, checkpoint_dir=ckpt)
    first = sorted(map(tuple, read_serving_table(spark, target).collect()))

    # Poison the target: if the restart reprocessed anything, the
    # merge would repair/change rows and the poison would vanish.
    # (Publishing the poisoned table is itself a self-referencing
    # versioned write — the protocol handles read-modify-publish.)
    cur = read_serving_table(spark, target)
    poison = spark.createDataFrame(
        [("9999-01-01", "poison", 1.0, 1)], cur.schema
    )
    write_serving_version(cur.unionByName(poison), target)

    stream_upsert_daily(spark, SF_DIR, target, checkpoint_dir=ckpt)
    after = sorted(map(tuple, read_serving_table(spark, target).collect()))
    assert ("9999-01-01", "poison", 1.0, 1) in after, "restart must not rewrite"
    assert len(after) == len(first) + 1
