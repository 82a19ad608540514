"""Round-17 streaming state-store probe (VERDICT r16 #6): measure the
RocksDB state store provider against the default HDFS-backed one on
the worst-scaling streaming key's pipeline (streaming_dedup_rollup:
dropDuplicatesWithinWatermark state + windowed agg state), interleaved
median-of-N with result-equality asserts — adopt RocksDB in
streaming_session() only if it wins here; either way the measured
record is committed.

The pipeline body mirrors streaming.dedup.run_streaming_dedup_rollup
exactly, except the state-store provider is set explicitly on the
cloned session (newSession() does not inherit a parent's runtime
confs, so the production helper cannot be probed from outside).

Usage: python scripts/rocksdb_state_probe_r17.py [runs] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_airflow_weather_etl_spark.functions.exact import DEC  # noqa: E402
from pyspark_airflow_weather_etl_spark.session import (  # noqa: E402
    get_spark,
    streaming_session,
)
from pyspark_airflow_weather_etl_spark.streaming.dedup import (  # noqa: E402
    dedup_events_stream,
)
from pyspark_airflow_weather_etl_spark.streaming.rollup import (  # noqa: E402
    read_events_stream,
)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)

_seq = iter(range(10**9))


def run_once(spark, sf_dir: str, provider: str):
    s = streaming_session(spark)
    s.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    events = read_events_stream(s, sf_dir)
    redelivered = events.where(F.col("event_id") % 3 == 0)
    feed = events.unionByName(redelivered)
    rolled = (
        dedup_events_stream(feed)
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            "event_type",
        )
        .agg(
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
    )
    name = f"rocksdb_probe_{next(_seq)}"
    q = (
        rolled.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return sorted(map(tuple, s.table(name).collect()))


def _median(s):
    s = sorted(s)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = get_spark(
        app_name="rocksdb-probe-r17",
        cpus=int(cpus),
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    samples = {"hdfs": [], "rocksdb": []}
    answers = {}
    for _ in range(runs):
        for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            t0 = time.perf_counter()
            r = run_once(spark, sf_dir, provider)
            samples[label].append(time.perf_counter() - t0)
            answers.setdefault(label, r)
    assert answers["hdfs"] == answers["rocksdb"], (
        "state store provider changed the answer"
    )
    record = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "runs": runs,
        "streaming_dedup_rollup_hdfs": round(_median(samples["hdfs"]), 3),
        "streaming_dedup_rollup_rocksdb": round(
            _median(samples["rocksdb"]), 3
        ),
        "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
    }
    line = json.dumps(record)
    print(line)
    if len(sys.argv) > 2:
        with open(sys.argv[2], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
