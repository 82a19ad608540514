"""Property-based tests (hypothesis): the as-of join against a
pandas brute-force reference, and upsert idempotency/merge laws over
random batches. SURVEY.md §5 calls for property tests the reference
never had."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_airflow_weather_etl_spark.operators.asof import asof_join
from pyspark_airflow_weather_etl_spark.operators.merge import upsert

# One (key, ts, value) event table: few keys, colliding timestamps.
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=99),  # value
    ),
    min_size=1,
    max_size=25,
)


def _brute_force_asof(left_rows, right_rows):
    out = {}
    for i, (k, ts, _v) in enumerate(left_rows):
        best = None
        for rk, rts, rv in right_rows:
            if rk == k and rts <= ts and (best is None or rts > best[0]
                                          or (rts == best[0] and rv > best[1])):
                best = (rts, rv)
        out[i] = best[1] if best else None
    return out


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(left=events_strategy, right=events_strategy)
def test_asof_join_matches_brute_force(spark, left, right):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts, _v) in enumerate(left)],
        "row_id long, k long, ts long",
    )
    # collapse right duplicates per (k, ts) to max value, as the
    # operator's documented tie rule does
    rdf = spark.createDataFrame(
        [(k, ts, v) for k, ts, v in right], "k long, ts long, v long"
    )
    got = {
        r.row_id: r.v_asof
        for r in asof_join(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts", right_values=["v"]
        ).collect()
    }
    want = _brute_force_asof(
        [(k, ts, v) for k, ts, v in left], [(k, ts, v) for k, ts, v in right]
    )
    assert got == want


batch_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=0,
    max_size=15,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(target=batch_strategy, batch=batch_strategy)
def test_upsert_laws(spark, target, batch):
    tdf = spark.createDataFrame(
        pd.DataFrame(target, columns=["k", "v"]), "k long, v double"
    ).dropDuplicates(["k"])
    bdf = spark.createDataFrame(
        pd.DataFrame(batch, columns=["k", "v"]), "k long, v double"
    )
    once = upsert(tdf, bdf, ["k"])
    twice = upsert(once, bdf, ["k"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    # Idempotency: re-applying the same batch changes nothing.
    assert a == b
    # Key-uniqueness: the merged table has one row per key.
    keys = [k for k, _ in a]
    assert len(keys) == len(set(keys))
    # Every batch key's value comes from the batch (last-writer-wins).
    batch_keys = {k for k, _ in batch}
    merged = dict(a)
    for k in batch_keys:
        vals = [v for bk, v in batch if bk == k]
        assert abs(merged[k] - sum(vals) / len(vals)) < 1e-9


# (id, n_tokens) corpora with duplicate-free ids, adversarial sizes.
corpus_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # id
        st.integers(min_value=1, max_value=40),  # n_tokens
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=corpus_strategy, parts=st.integers(min_value=1, max_value=7))
def test_ranged_cumsum_matches_sequential_reference(spark, rows, parts):
    """The distributed prefix sum must equal the single-threaded
    scan for ANY corpus and ANY partition count — the property the
    per-SF oracles sample but hypothesis drives through adversarial
    shapes (single row, all-equal values, id gaps, 1..7 partitions)."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.prefix import (
        ranged_cumsum,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    local, offsets = ranged_cumsum(
        df, [F.col("doc_id")], parts, "prop_cumsum", value_col="n_tokens"
    )
    offs = {o["__pid"]: o for o in (r.asDict() for r in offsets.collect())}
    got = {}
    for r in (row.asDict() for row in local.collect()):
        o = offs[r["__pid"]]
        got[r["doc_id"]] = (
            r["__local_rn"] + o["__rank_offset"],
            r["__local_cum"] + o["__cum_offset"],
        )
    seq = sorted(rows)
    cum = 0
    for rank, (doc_id, n) in enumerate(seq, start=1):
        cum += n
        assert got[doc_id] == (rank, cum), (doc_id, got[doc_id], (rank, cum))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=corpus_strategy, parts=st.integers(min_value=1, max_value=9))
def test_ranged_rank_matches_sequential_reference(spark, rows, parts):
    """The id-decode global rank (the OTHER prefix path — JVM
    monotonically_increasing_id decode, no window) must equal the
    single-threaded sort rank for any corpus and partition count,
    including partition counts far above the row count (empty
    partitions contribute zero to the offsets)."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.prefix import (
        ranged_rank,
    )

    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    local, offsets = ranged_rank(
        df, [F.col("doc_id")], parts, "prop_rank"
    )
    offs = {o["__pid"]: o for o in (r.asDict() for r in offsets.collect())}
    got = {
        r["doc_id"]: r["__local_rn"] + offs[r["__pid"]]["__rank_offset"]
        for r in (row.asDict() for row in local.collect())
    }
    for rank, (doc_id, _n) in enumerate(sorted(rows), start=1):
        assert got[doc_id] == rank, (doc_id, got[doc_id], rank)


def test_offsets_raise_loudly_on_corrupt_local_rank(spark):
    """ADVICE r8: a broken id-decode (partition >2^33 rows, or a
    Catalyst reordering of the nondeterministic projection) makes
    max(__local_rn) diverge from count(*) — dense 1..count ranks are
    the property every failure mode breaks. _offsets must fail the
    job, not build self-consistent offsets from the corrupt max."""
    import pytest

    from pyspark_airflow_weather_etl_spark.operators.prefix import _offsets

    # healthy: ranks dense 1..count per partition
    ok = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 1)], "__pid int, __local_rn long"
    )
    offs = {r["__pid"]: r["__rank_offset"] for r in _offsets(ok, False).collect()}
    assert offs == {0: 0, 1: 2}

    # corrupt: partition 0 claims max rank 5 with only 2 rows
    bad = spark.createDataFrame(
        [(0, 1), (0, 5), (1, 1)], "__pid int, __local_rn long"
    )
    with pytest.raises(Exception, match="ranged rank decode corrupted"):
        _offsets(bad, False).collect()


def test_funnel_requires_strict_stage_order(spark):
    """A user who clicks BEFORE their first view must not count at the
    view>click stage; equal timestamps do not advance (strict >)."""
    from pyspark_airflow_weather_etl_spark.plans.temporal import (
        funnel_view_click_purchase,
    )
    import pyspark_airflow_weather_etl_spark.plans.temporal as T
    from pyspark.sql import functions as F

    rows = [
        # u1: proper view -> click -> purchase
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 01:00:00", "click"),
        (1, "2024-01-01 02:00:00", "purchase"),
        # u2: click precedes the first view -> stalls at 'view'
        (2, "2024-01-01 00:30:00", "click"),
        (2, "2024-01-01 01:00:00", "view"),
        # u3: click at EXACTLY the view timestamp -> strict > stalls
        (3, "2024-01-02 00:00:00", "view"),
        (3, "2024-01-02 00:00:00", "click"),
        # u4: purchase only -> never enters the funnel
        (4, "2024-01-03 00:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    orig = T.load_table
    T.load_table = lambda s, d, n: ev
    try:
        got = {
            r.stage: r.n_users
            for r in funnel_view_click_purchase(spark, "ignored").collect()
        }
    finally:
        T.load_table = orig
    assert got == {"view": 3, "view>click": 1, "view>click>purchase": 1}


# Random micro-corpora over a 6-word vocabulary: heavy tf/df
# collisions, empty-ish docs, repeated tokens — the regime where a
# BM25 implementation bug (df vs tf swap, length-norm slip, tie
# handling) actually shows.
_vocab = ["u", "v", "w", "x", "y", "z"]
docs_strategy = st.lists(
    st.lists(
        st.sampled_from(_vocab), min_size=1, max_size=8
    ).map(" ".join),
    min_size=1,
    max_size=10,
)
query_strategy = st.lists(
    st.sampled_from(_vocab), min_size=1, max_size=3
).map(" ".join)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_strategy, q=query_strategy)
def test_bm25_scores_match_reference_on_random_corpora(spark, texts, q):
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_topk,
    )
    from tests.test_retrieval import py_bm25_micro

    corpus = list(enumerate(texts))
    df = spark.createDataFrame(corpus, "doc_id bigint, text string")
    got = {
        (r.query_id, r.doc_id): r.score_micro
        for r in bm25_topk(df, [(1, q)], k=100).collect()
    }
    # the engine scores DISTINCT query terms (qtf = 1, the standard
    # practical BM25) — mirror that in the reference
    want = py_bm25_micro(corpus, {1: sorted(set(q.split(" ")))})
    assert got == want


def test_daily_anomaly_rule_matches_float_two_sigma(spark):
    """The integer cross-multiplied rule equals |x-mean| > 2*stddev
    (population) on a hand-built series with one clear spike."""
    import statistics

    from pyspark_airflow_weather_etl_spark.plans import temporal as T
    from pyspark.sql import functions as F

    counts = [100, 102, 98, 101, 99, 100, 240, 97, 103, 100]
    rows = []
    eid = 0
    for d, c in enumerate(counts, start=1):
        for _ in range(c):
            rows.append((eid, f"2024-02-{d:02d} 12:00:00")); eid += 1
    ev = spark.createDataFrame(rows, "event_id bigint, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    orig = T.load_table
    T.load_table = lambda s, dd, n: ev
    try:
        got = {
            r.day: r.is_anomaly
            for r in T.events_daily_anomalies(spark, "ignored").collect()
        }
    finally:
        T.load_table = orig
    mu = statistics.mean(counts)
    sd = statistics.pstdev(counts)
    for d, c in enumerate(counts, start=1):
        assert got[f"2024-02-{d:02d}"] == (abs(c - mu) > 2 * sd), (d, c)
    assert got["2024-02-07"] is True
