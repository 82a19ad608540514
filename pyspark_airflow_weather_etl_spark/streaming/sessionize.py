"""Stateful streaming sessionization (applyInPandasWithState).

The custom-stateful-operator pattern (SURVEY.md §2.9 'streaming'):
per-user session windows with a 30-minute inactivity gap, maintained
as explicit GroupState so the query runs unbounded. The batch
equivalent (plans.relational.sessionize_user_events, gaps-and-islands
via windows) is the oracle-checked ground truth; tests assert the
stateful path agrees with it on bounded input.

State per key is one open session (start/end/count) — O(users), not
O(events); the processing-time timeout closes idle sessions so state
cannot grow without bound on a live stream.

Ordering caveat: rows are sorted per group *within* a micro-batch,
but a row older than the open session's end arriving in a LATER
micro-batch would extend rather than backfill (state keeps only the
open session). On a live source, bound that with the upstream
watermark; for a strict event-time treatment use event-time timers
(transformWithState) instead of this processing-time form. (TWS is
unavailable in this container: its driver worker requires the
`protobuf` package — ROADMAP.md item 4 records the probe.)
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .rollup import read_events_stream

GAP_US = 30 * 60 * 1_000_000

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        seq, n, s, e = state.get
        state.remove()
        yield pd.DataFrame(
            [[user_id, seq, n, s, e]], columns=SESSION_SCHEMA.fieldNames()
        )
        return

    ts = (
        pd.concat(list(pdfs))["ts_us"].sort_values().tolist()
    )
    if state.exists:
        seq, n, start, end = state.get
    else:
        seq, n, start, end = 0, 0, None, None

    closed: list[list[int]] = []
    for t in ts:
        if start is None:
            seq, n, start, end = seq + 1, 1, t, t
        elif t - end > GAP_US:
            closed.append([user_id, seq, n, start, end])
            seq, n, start, end = seq + 1, 1, t, t
        else:
            # max(), not t: a cross-batch out-of-order row with t < end
            # must not rewind the session end — a rewound end could push
            # the NEXT row past GAP_US and spuriously split the session.
            n, end = n + 1, max(end, t)
    state.update((seq, n, start, end))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)  # close after 1h idle
    except Exception:
        pass  # NoTimeout mode (bounded backfill)
    if closed:
        yield pd.DataFrame(closed, columns=SESSION_SCHEMA.fieldNames())


def sessionize_stream(
    events: DataFrame, timeout: bool = True
) -> DataFrame:
    """events (with ts) → closed session rows per user.

    ``timeout=True`` (live streams): idle sessions close after 1 h of
    processing time, bounding state. ``timeout=False`` (bounded
    backfills): timeouts can never usefully fire — there is no later
    batch — so skip the timeout machinery entirely.
    """
    prepared = events.select(
        "user_id", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


_run_ids = itertools.count()


def run_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded run over the fixture events. availableNow feeds every
    row, then one final empty trigger fires the timeouts — but with
    bounded input the last session per user stays open unless timed
    out, so tests compare only the *closed* sessions against the
    batch ground truth."""
    from ..session import streaming_session

    spark = streaming_session(spark)
    name = f"sessionize_{next(_run_ids)}"
    q = (
        sessionize_stream(read_events_stream(spark, sf_dir), timeout=False)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    return spark.table(name)
