"""Regression lock for the round-5 events.ts corruption: the loader
must read BOTH physical encodings the driver has shipped — parquet
TIMESTAMP(NANOS) (surfaced as nanos-long) and native timestamp[us] —
to identical timestamps, in batch and streaming form. Mixed-writer
lakes make this drift the norm at 100 TB; never hardcode an encoding."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark_airflow_weather_etl_spark.sources.tables import (
    events_read_plan,
    events_ts_is_integral,
    load_table,
)
from pyspark_airflow_weather_etl_spark.streaming.rollup import (
    read_events_stream,
)

from conftest import SF_DIR

_US = [
    1704067200_000000,  # 2024-01-01 00:00:00 UTC
    1704070800_500000,
    1706654716_220708,
]


def _write_events(path, ts_array):
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 11, 10], pa.int64()),
            "event_type": pa.array(["view", "click", "view"]),
            "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(t, path)


def _fixture_dirs(tmp_path):
    micros_dir = tmp_path / "micros"
    nanos_dir = tmp_path / "nanos"
    micros_dir.mkdir()
    nanos_dir.mkdir()
    _write_events(
        str(micros_dir / "events.parquet"),
        pa.array(_US, pa.timestamp("us")),
    )
    _write_events(
        str(nanos_dir / "events.parquet"),
        pa.array([u * 1000 for u in _US], pa.timestamp("ns")),
    )
    return str(micros_dir), str(nanos_dir)


def test_footer_probe_classifies_encodings(tmp_path):
    micros_dir, nanos_dir = _fixture_dirs(tmp_path)
    # timestamp[us] -> native TimestampType read, no rebuild
    assert not events_ts_is_integral(f"{micros_dir}/events.parquet")
    plan_schema, rebuild = events_read_plan(f"{micros_dir}/events.parquet")
    assert not rebuild and str(plan_schema["ts"].dataType) == "TimestampType()"
    # parquet TIMESTAMP(NANOS) (pyarrow: timestamp[ns]) -> Spark can
    # only surface it as nanos-long -> integral path with rebuild
    assert events_ts_is_integral(f"{nanos_dir}/events.parquet")
    plan_schema, rebuild = events_read_plan(f"{nanos_dir}/events.parquet")
    assert rebuild and str(plan_schema["ts"].dataType) == "LongType()"


def test_both_encodings_read_equal_batch_and_stream(spark, tmp_path):
    micros_dir, nanos_dir = _fixture_dirs(tmp_path)
    batches = {}
    for label, d in (("micros", micros_dir), ("nanos", nanos_dir)):
        df = load_table(spark, d, "events")
        assert str(df.schema["ts"].dataType) == "TimestampType()"
        batches[label] = sorted(
            (r.event_id, r.ts) for r in df.select("event_id", "ts").collect()
        )
    assert batches["micros"] == batches["nanos"]
    assert batches["micros"][0][1].year == 2024

    streams = {}
    for label, d in (("micros", micros_dir), ("nanos", nanos_dir)):
        q = (
            read_events_stream(spark, d)
            .select("event_id", "ts")
            .writeStream.format("memory")
            .queryName(f"enc_{label}")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
        finally:
            q.stop()
        streams[label] = sorted(
            (r.event_id, r.ts) for r in spark.table(f"enc_{label}").collect()
        )
    assert streams["micros"] == streams["nanos"] == batches["micros"]


def test_real_fixture_spans_thirty_days(spark):
    """The production symptom: 30 days of fixture events must not
    compress. Guard the actual testdata read."""
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_DIR, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert (hi - lo).days >= 25


def test_schema_drift_guard_raises(spark, tmp_path):
    """If the driver ships a fixture whose physical type would be
    silently misread by the declared schema (the r5 failure class),
    load_table must refuse loudly instead of corrupting values."""
    import pytest
    import pyarrow as pa
    import pyarrow.parquet as pq

    # orders declares o_orderdate: timestamp; ship it as a plain long
    t = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderstatus": pa.array(["O"]),
            "o_totalprice": pa.array([1.0], pa.float64()),
            "o_orderdate": pa.array([1704067200], pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT"]),
            "o_clerk": pa.array(["c"]),
            "o_shippriority": pa.array([0], pa.int32()),
            "o_comment": pa.array(["x"]),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    with pytest.raises(ValueError, match="schema drift"):
        load_table(spark, str(tmp_path), "orders")


def test_schema_drift_guard_passes_real_fixtures(spark):
    for name in ("orders", "lineitem", "events", "documents"):
        assert load_table(spark, SF_DIR, name).limit(1).count() >= 0


def test_mixed_encoding_dir_refuses_loudly(spark, tmp_path):
    """A dir holding BOTH nanos and micros part-files has no single
    sound read plan — the probe must raise, never let the first
    file's encoding silently misread the second (the r5 corruption
    class, directory-internal edition)."""
    import pytest

    from pyspark_airflow_weather_etl_spark.sources.tables import (
        MixedEncodingError,
    )

    mixed = tmp_path / "events.parquet"
    mixed.mkdir()
    _write_events(
        str(mixed / "part-0.parquet"), pa.array(_US, pa.timestamp("us"))
    )
    _write_events(
        str(mixed / "part-1.parquet"),
        pa.array([u * 1000 for u in _US], pa.timestamp("ns")),
    )
    with pytest.raises(MixedEncodingError, match="mixed ts encodings"):
        events_ts_is_integral(str(mixed))
    # the Spark-fallback path must propagate, not silently re-probe
    with pytest.raises(MixedEncodingError):
        events_read_plan(str(mixed), spark)
    with pytest.raises(MixedEncodingError):
        load_table(spark, str(tmp_path), "events")


def test_homogeneous_multifile_dir_still_reads(tmp_path):
    """Two files that agree must classify fine (no false refusal)."""
    d = tmp_path / "homog"
    d.mkdir()
    for i in range(2):
        _write_events(
            str(d / f"part-{i}.parquet"),
            pa.array([u * 1000 for u in _US], pa.timestamp("ns")),
        )
    assert events_ts_is_integral(str(d))


def test_drift_guard_checks_every_part_file(spark, tmp_path):
    """A clean first file must not vouch for a drifted sibling."""
    import pytest

    def orders_table(date_array):
        return pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([1.0], pa.float64()),
                "o_orderdate": date_array,
                "o_orderpriority": pa.array(["1-URGENT"]),
                "o_clerk": pa.array(["c"]),
                "o_shippriority": pa.array([0], pa.int32()),
                "o_comment": pa.array(["x"]),
            }
        )

    d = tmp_path / "orders.parquet"
    d.mkdir()
    pq.write_table(
        orders_table(pa.array([1704067200_000000], pa.timestamp("us"))),
        str(d / "part-0.parquet"),
    )
    pq.write_table(
        orders_table(pa.array([1704067200], pa.int64())),
        str(d / "part-1.parquet"),
    )
    with pytest.raises(ValueError, match="schema drift"):
        load_table(spark, str(tmp_path), "orders")


def test_drift_guard_rejects_ns_under_declared_temporal(spark, tmp_path):
    """timestamp[ns] is sanctioned ONLY against an integral declared
    type (the events rebuild). Under a declared TimestampType Spark
    would die later with an unactionable nanosAsLong convert error —
    the guard must raise the explanatory one up front."""
    import pytest

    t = pa.table(
        {
            "o_orderkey": pa.array([1], pa.int64()),
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderstatus": pa.array(["O"]),
            "o_totalprice": pa.array([1.0], pa.float64()),
            "o_orderdate": pa.array(
                [1704067200_000000000], pa.timestamp("ns")
            ),
            "o_orderpriority": pa.array(["1-URGENT"]),
            "o_clerk": pa.array(["c"]),
            "o_shippriority": pa.array([0], pa.int32()),
            "o_comment": pa.array(["x"]),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    with pytest.raises(ValueError, match="schema drift"):
        load_table(spark, str(tmp_path), "orders")


def test_spark_fallback_probe_is_cached():
    """When pyarrow can't open the path, the Spark fallback probe
    must run ONCE per path, not once per load_table call — at 100 TB
    the fallback is a remote file listing."""
    from pyspark.sql import types as T

    from pyspark_airflow_weather_etl_spark.sources import tables

    calls = {"n": 0}

    class _FakeDF:
        schema = {"ts": T.StructField("ts", T.LongType())}

    class _FakeReader:
        def parquet(self, path):
            calls["n"] += 1
            return _FakeDF()

    class _FakeSpark:
        read = _FakeReader()

    tables._SPARK_PROBE_CACHE.clear()
    bogus = "hdfs://nowhere/events.parquet"
    for _ in range(3):
        schema, rebuild = events_read_plan(bogus, _FakeSpark())
        assert rebuild
    assert calls["n"] == 1


def test_directory_layout_events_stream_reads_all_parts(spark, tmp_path):
    """events.parquet as a DIRECTORY of part-files (the production
    layout at scale) must stream every part: the old filename glob
    matched zero part-files and silently streamed nothing — caught by
    the x8 state-pressure bench probe."""
    d = tmp_path / "events.parquet"
    d.mkdir()
    _write_events(
        str(d / "part-0.parquet"), pa.array(_US, pa.timestamp("us"))
    )
    _write_events(
        str(d / "part-1.parquet"),
        pa.array([u + 3_600_000_000 for u in _US], pa.timestamp("us")),
    )
    batch = sorted(
        (r.event_id, r.ts)
        for r in load_table(spark, str(tmp_path), "events")
        .select("event_id", "ts")
        .collect()
    )
    assert len(batch) == 6
    q = (
        read_events_stream(spark, str(tmp_path))
        .select("event_id", "ts")
        .writeStream.format("memory")
        .queryName("enc_dirlayout")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    streamed = sorted(
        (r.event_id, r.ts) for r in spark.table("enc_dirlayout").collect()
    )
    assert streamed == batch
