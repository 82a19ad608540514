"""pack_sequences invariants: the distributed prefix-sum must lay
documents on one contiguous token axis (no gaps, no overlaps) and be
partition-count-invariant — the property that makes the parallel
composition equal the sequential packing the DuckDB oracle replays."""

from __future__ import annotations

from pyspark_airflow_weather_etl_spark.operators.text import pack_sequences
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR

BUDGET = 64


def _packed(spark, partitions):
    docs = load_table(spark, SF_DIR, "documents").limit(200)
    return (
        pack_sequences(
            docs, "doc_id", "text", budget=BUDGET, partitions=partitions
        )
        .orderBy("start_offset")
        .collect()
    )


def test_axis_is_contiguous_and_bins_correct(spark):
    rows = _packed(spark, partitions=8)
    assert rows, "fixture produced no packed documents"
    pos = 0
    for r in rows:
        assert r.start_offset == pos, "gap or overlap on the token axis"
        pos += r.n_tokens
        assert r.bin_start == r.start_offset // BUDGET
        assert r.bin_end == (pos - 1) // BUDGET
        assert r.bin_start <= r.bin_end
    # at least one fixture document must cross a bin boundary for the
    # span semantics to be exercised
    assert any(r.bin_end > r.bin_start for r in rows)


def test_partition_count_invariance(spark):
    one = _packed(spark, partitions=1)
    many = _packed(spark, partitions=13)  # odd count -> ragged ranges
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_bins_are_full_except_last(spark):
    from pyspark_airflow_weather_etl_spark.operators.text import pack_bins

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    bins = (
        pack_bins(docs, "doc_id", "text", budget=BUDGET, partitions=8)
        .orderBy("bin_id")
        .collect()
    )
    assert len(bins) > 2
    for r in bins[:-1]:
        assert r.n_tokens == BUDGET
        assert len(r.bin_text.split(" ")) == BUDGET
    last = bins[-1]
    assert 0 < last.n_tokens <= BUDGET
    # bin ids are the dense range 0..n-1 (no gaps: every window of the
    # token axis is materialized)
    assert [r.bin_id for r in bins] == list(range(len(bins)))


def test_offsets_consistent_under_nondeterministic_upstream(spark):
    """The per-partition cumsum frame is persisted so __pid is
    assigned once; with a nondeterministic upstream (rand() filter,
    different rows per evaluation) an unpersisted plan could evaluate
    the range partitioning differently in the totals branch vs the
    join branch and corrupt global offsets. The contiguity invariant
    must hold regardless of what subset the upstream produced."""
    from pyspark.sql import functions as F

    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(400)
        .where(F.rand() < 0.7)  # nondeterministic: re-eval != first eval
    )
    rows = (
        pack_sequences(docs, "doc_id", "text", budget=BUDGET, partitions=7)
        .orderBy("start_offset")
        .collect()
    )
    assert rows, "sampled upstream produced no packed documents"
    pos = 0
    for r in rows:
        assert r.start_offset == pos, "gap or overlap on the token axis"
        pos += r.n_tokens
