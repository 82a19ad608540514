"""Upsert/merge contract tests (SURVEY.md §2.6 U1-U2): keyed
last-writer-wins merge with duplicate-source collapse, idempotent
under re-application — the engine's replacement for the reference's
Postgres ON CONFLICT upsert (weather_daily_etl.py:186-209).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.merge import (
    collapse_duplicates,
    upsert,
)

KEYS = ["y", "m", "d"]
COLS = ["y", "m", "d", "min_temp_c", "max_temp_c"]


def _df(spark, rows):
    return spark.createDataFrame(rows, COLS)


def test_collapse_avg_is_reference_semantics(spark):
    """The reference AVGs every metric across duplicate keys —
    including min/max (weather_daily_etl.py:188-193). Bug-compatible
    by default, documented."""
    stage = _df(spark, [(2024, 3, 1, 10.0, 20.0), (2024, 3, 1, 12.0, 30.0)])
    out = collapse_duplicates(stage, KEYS).collect()
    assert len(out) == 1
    assert out[0].min_temp_c == 11.0  # AVG-of-min, as the reference does
    assert out[0].max_temp_c == 25.0


def test_upsert_updates_and_inserts(spark):
    target = _df(spark, [(2024, 3, 1, 1.0, 2.0), (2024, 3, 2, 3.0, 4.0)])
    updates = _df(spark, [(2024, 3, 2, 9.0, 9.5), (2024, 3, 3, 5.0, 6.0)])
    merged = {(r.y, r.m, r.d): r for r in upsert(target, updates, KEYS).collect()}
    assert len(merged) == 3
    assert merged[(2024, 3, 1)].min_temp_c == 1.0  # untouched
    assert merged[(2024, 3, 2)].min_temp_c == 9.0  # updated
    assert merged[(2024, 3, 3)].min_temp_c == 5.0  # inserted


def test_upsert_is_idempotent(spark):
    """Applying the same batch twice == applying it once (the
    reference's re-run/backfill guarantee, README.md:82)."""
    target = _df(spark, [(2024, 3, 1, 1.0, 2.0)])
    updates = _df(spark, [(2024, 3, 1, 7.0, 8.0), (2024, 3, 2, 3.0, 4.0)])
    once = upsert(target, updates, KEYS)
    twice = upsert(once, updates, KEYS)
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


def test_upsert_collapses_duplicate_source_keys(spark):
    target = spark.createDataFrame(
        [], "y int, m int, d int, min_temp_c double, max_temp_c double"
    )
    updates = _df(
        spark, [(2024, 3, 1, 10.0, 20.0), (2024, 3, 1, 20.0, 40.0)]
    )
    out = upsert(target, updates, KEYS).collect()
    assert len(out) == 1
    assert out[0].min_temp_c == 15.0


def test_collapse_avg_rejects_non_numeric_value_columns(spark):
    """F.avg on a string column silently yields NULL — a default-mode
    upsert over mixed-type rows would destroy data, so it must raise."""
    stage = spark.createDataFrame(
        [(2024, 3, 1, 10.0, "sunny")],
        "y int, m int, d int, min_temp_c double, sky string",
    )
    with pytest.raises(TypeError, match="not numeric"):
        collapse_duplicates(stage, KEYS, how="avg")


def test_upsert_preserves_target_schema_dtypes(spark):
    """avg() widens ints to double; the merge must cast back so the
    serving table's schema never silently mutates across upserts."""
    target = spark.createDataFrame(
        [(2024, 3, 1, 5)], "y int, m int, d int, n_hours int"
    )
    updates = spark.createDataFrame(
        [(2024, 3, 2, 7)], "y int, m int, d int, n_hours int"
    )
    merged = upsert(target, updates, KEYS)
    assert merged.schema == target.schema


class TestScd2Compact:
    def test_runs_collapse_and_intervals_tile(self, spark):
        """Hand-checkable stream: consecutive repeats collapse, each
        interval's valid_to equals the next version's valid_from, and
        the current state stays open."""
        from pyspark_airflow_weather_etl_spark.operators.merge import (
            scd2_compact,
        )

        rows = [
            (1, "a", 100, 1),
            (1, "a", 200, 2),   # repeat: same run
            (1, "b", 300, 3),   # change
            (1, "b", 400, 4),
            (1, "a", 500, 5),   # back to a: NEW version, not merged
            (2, None, 100, 6),  # null state run
            (2, None, 150, 7),
            (2, "x", 200, 8),
        ]
        df = spark.createDataFrame(
            rows, "k long, s string, t long, e long"
        ).select(
            "k",
            "s",
            F.timestamp_micros(F.col("t")).alias("t"),
            "e",
        )
        got = {
            (r.k, r.version): (r.s, r.valid_from_us, r.valid_to_us)
            for r in scd2_compact(df, "k", "s", "t", "e").collect()
        }
        assert got == {
            (1, 1): ("a", 100, 300),
            (1, 2): ("b", 300, 500),
            (1, 3): ("a", 500, None),
            (2, 1): (None, 100, 200),
            (2, 2): ("x", 200, None),
        }

    def test_asof_reconstruction(self, spark):
        """The history table answers 'state as of T' correctly: for
        sampled (user, T), the interval containing T carries the same
        event_type as the latest raw event at or before T."""
        from pyspark_airflow_weather_etl_spark.operators.merge import (
            scd2_compact,
        )
        from pyspark_airflow_weather_etl_spark.sources.tables import (
            load_table,
        )
        from conftest import SF_DIR

        ev = load_table(spark, SF_DIR, "events")
        hist = scd2_compact(
            ev, "user_id", "event_type", "ts", "event_id"
        ).cache()
        raw = (
            ev.select(
                "user_id", "event_type", F.unix_micros("ts").alias("us"),
                "event_id",
            )
            .collect()
        )
        by_user = {}
        for r in raw:
            by_user.setdefault(r.user_id, []).append(r)
        h = hist.collect()
        intervals = {}
        for r in h:
            intervals.setdefault(r.user_id, []).append(r)
        import random

        rng = random.Random(0)
        users = sorted(by_user)[:10]
        for u in users:
            evs = sorted(by_user[u], key=lambda r: (r.us, r.event_id))
            t = evs[rng.randrange(len(evs))].us
            latest = [r for r in evs if r.us <= t][-1]
            live = [
                r
                for r in intervals[u]
                if r.valid_from_us <= t
                and (r.valid_to_us is None or t < r.valid_to_us)
            ]
            assert len(live) == 1, (u, t, live)
            assert live[0].event_type == latest.event_type
        hist.unpersist()

    def test_point_in_time_exactly_one_match(self, spark):
        """The interval-tiling invariant makes the PIT join total and
        unique: every fact matches exactly one interval, and the
        matched state equals the fact's own event_type (the fact IS
        an observation of the state)."""
        from pyspark_airflow_weather_etl_spark.operators.merge import (
            scd2_compact,
            scd2_point_in_time,
        )
        from pyspark_airflow_weather_etl_spark.sources.tables import (
            load_table,
        )
        from conftest import SF_DIR

        ev = load_table(spark, SF_DIR, "events").limit(500).cache()
        hist = scd2_compact(ev, "user_id", "event_type", "ts", "event_id")
        got = scd2_point_in_time(ev, hist, "user_id", "ts")
        n_facts = ev.count()
        assert got.count() == n_facts  # total: no fact dropped
        assert (
            got.groupBy("user_id", "ts_us").count().where("count > 2").count()
            == 0
        )  # unique per (user, ts) up to ts collisions
        ev.unpersist()
