"""Temporal join catalog: as-of (point-in-time) and range joins —
operators the reference lacks entirely (SURVEY.md §2.9 'joins') and
Spark has no native form for; the as-of uses the union-window
formulation from operators.asof (one shuffle, no range explosion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import merge as M
from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import register


@register(
    "asof_purchase_prior_view",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ), purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           v.view_event_id AS view_event_id_asof,
           epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
    FROM purchases p ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    view at-or-before it. The engine's union-window as-of is checked
    against DuckDB's *native* ASOF JOIN — two independent
    implementations of the same semantics."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
        .withColumn("vts", F.col("ts"))
    )
    joined = asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_values=["view_event_id", "vts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("view_event_id_asof"),
        (F.unix_micros("ts") - F.unix_micros("vts_asof")).alias("gap_us"),
    )


@register(
    "range_join_views_before_purchase",
    oracle="""
    SELECT p.event_id, p.user_id, count(v.event_id) AS n_views_prior_hour
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR
     AND v.ts <  p.ts
    GROUP BY p.event_id, p.user_id
    """,
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: views in the hour before each purchase.
    The equi-key (user_id) anchors the shuffle; the time band is a
    post-join predicate — so this stays a hash/sort-merge join, never
    a cross product, and AQE splits skewed users."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_event_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("v_ts"),
    )
    return (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("v_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("v_ts") < F.col("ts")),
            "left",
        )
        .groupBy("event_id", "user_id")
        .agg(F.count("v_event_id").alias("n_views_prior_hour"))
    )


_SCD2_ORACLE = """
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, event_type, ts, event_id
      FROM o WHERE rn = 1 OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type,
           epoch_us(ts) AS valid_from_us,
           epoch_us(LEAD(ts) OVER w2) AS valid_to_us,
           CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
    FROM s
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register("scd2_event_state_history", oracle=_SCD2_ORACLE)
def scd2_event_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history compaction (operators.merge.scd2_compact):
    the per-user event_type change stream collapsed into versioned
    validity intervals — consecutive repeats merge, each state change
    opens a new interval, the current state stays open (null
    valid_to). The Kimball SCD2 history table built from a raw CDC
    feed with two same-ordering windows and one shuffle; hash-exact
    vs the DuckDB window replay (epoch-microsecond bounds)."""
    ev = load_table(spark, sf_dir, "events")
    return M.scd2_compact(ev, "user_id", "event_type", "ts", "event_id")


@register(
    "scd2_point_in_time_lookup",
    oracle=_SCD2_ORACLE.replace(
        """
    SELECT user_id, event_type,""",
        """
    , hist AS (
    SELECT user_id, event_type,""",
        1,
    )
    + """
    )
    SELECT e.user_id,
           epoch_us(e.ts) AS ts_us,
           h.version,
           h.valid_from_us
    FROM events e JOIN hist h
      ON e.user_id = h.user_id
     AND epoch_us(e.ts) >= h.valid_from_us
     AND (h.valid_to_us IS NULL OR epoch_us(e.ts) < h.valid_to_us)
    """,
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators.merge.scd2_point_in_time): every
    event looks up the ONE SCD2 validity interval active at its
    timestamp — the feature-store / "dimension as of the fact date"
    join that is the reason SCD2 materializes intervals. Equi-join on
    the key with the interval predicate as join residual; exactly one
    match per fact by the interval-tiling invariant (pinned in
    tests/test_merge.py). Hash-exact vs the DuckDB replay of history
    construction + the same interval join."""
    ev = load_table(spark, sf_dir, "events")
    hist = M.scd2_compact(ev, "user_id", "event_type", "ts", "event_id")
    return M.scd2_point_in_time(ev, hist, "user_id", "ts")


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS ord, 'view' AS stage,
             CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
      UNION ALL
      SELECT 2, 'view>click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
      UNION ALL
      SELECT 3, 'view>click>purchase',
             CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
    ) ORDER BY ord
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, strictly
    increasing FIRST-occurrence timestamps per user): users counted at
    a stage only if they completed every earlier stage FIRST. Staged
    conditional aggregations chained by user-keyed joins — each stage
    frame is user-sized and SHRINKS monotonically, events shuffle once
    per stage on user_id and text/props never move. (The one-pass
    alternative — collect_list of each user's full event history and
    scan it — builds per-user arrays that blow up on power-law users
    at 100 TB; the staged form keeps state at one row per qualifying
    user.) All counts exact integers; the DuckDB oracle replays the
    same staged mins."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    rows = None
    for ord_, stage, frame in (
        (1, "view", s1),
        (2, "view>click", s2),
        (3, "view>click>purchase", s3),
    ):
        r = frame.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users")
        ).select(
            F.lit(ord_).alias("__ord"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("__ord").select("stage", "n_users")


@register(
    "retention_cohorts_events",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(datediff('day', f.cohort_day, a.day) AS BIGINT)
             AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN first_day f ON a.user_id = f.user_id
    WHERE datediff('day', f.cohort_day, a.day) <= 7
    GROUP BY f.cohort_day, day_offset
    """,
)
def retention_cohorts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-activity day,
    counted as retained on each later day they return (offsets 0–7).
    Two narrow aggregations over (user_id, day) plus one user-keyed
    join — the classic warehouse retention query, exact integers,
    dates rendered as strings for cross-engine hashing. At scale the
    distinct-(user, day) collapse happens map-side before any join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    activity = ev.distinct()
    first_day = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        activity.join(first_day, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("bigint"),
        )
        .where(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


@register(
    "events_daily_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY day
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_events) AS BIGINT) AS sx,
             CAST(SUM(n_events * n_events) AS BIGINT) AS sq
      FROM daily
    )
    SELECT CAST(day AS VARCHAR) AS day, n_events,
           (n * n_events - sx) * (n * n_events - sx)
             > 4 * (n * sq - sx * sx) AS is_anomaly
    FROM daily CROSS JOIN s
    """,
)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly flags with an INTEGER-EXACT 2-sigma rule:
    |x − mean| > 2·stddev cross-multiplied to
    (n·x − S)² > 4·(n·Q − S²) so no float (mean, sqrt, division) ever
    touches the boundary — bit-identical on any engine, no epsilon.
    One narrow daily rollup, one one-row broadcast aggregate, one
    codegen flag — the monitoring query a pipeline runs on every
    ingest ledger."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day")
    )
    daily = ev.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    stats = F.broadcast(
        daily.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("n_events").cast("bigint").alias("sx"),
            F.sum(F.col("n_events") * F.col("n_events"))
            .cast("bigint")
            .alias("sq"),
        )
    )
    d = F.col("n") * F.col("n_events") - F.col("sx")
    return daily.crossJoin(stats).select(
        F.col("day").cast("string").alias("day"),
        "n_events",
        (d * d > 4 * (F.col("n") * F.col("sq") - F.col("sx") * F.col("sx")))
        .alias("is_anomaly"),
    )
