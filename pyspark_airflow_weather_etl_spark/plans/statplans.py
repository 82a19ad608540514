"""Statistical / sampling catalog: exact percentiles, approximate
sketches, deterministic hash sampling, histograms."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import SQL_DSUM, dsum
from ..sources.tables import load_table
from .registry import register


@register(
    "percentile_price_quartiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
           round(quantile_cont(o_totalprice, 0.50), 6) AS p50,
           round(quantile_cont(o_totalprice, 0.75), 6) AS p75
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def percentile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ≡
    DuckDB `quantile_cont`, both linear-interpolation on the sorted
    set; rounded to 6 dp to absorb the one interpolation multiply).
    At 100 TB prefer approx_percentile with a tuned accuracy — exact
    percentile sorts each group."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        *[
            F.round(F.percentile("o_totalprice", q), 6).alias(name)
            for q, name in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75")]
        ]
    )


@register(
    "two_phase_skew_agg",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           {SQL_DSUM('l_quantity', 'sum_l_quantity')}
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def two_phase_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salt→partial→final skew-proof aggregation (operators.scale.
    two_phase_agg) hash-checked against the plain GROUP BY — the
    rewrite is an identity on results, only the shuffle shape changes
    (a 3-value group key like l_returnflag is exactly the giant-group
    case where one reducer would otherwise take the whole table)."""
    from ..functions.exact import DEC
    from ..operators.scale import two_phase_agg

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast(DEC).alias("l_quantity")
    )
    out = two_phase_agg(li, ["l_returnflag"], sums=["l_quantity"])
    return out.select(
        "l_returnflag",
        "n_rows",
        F.col("sum_l_quantity").cast("double").alias("sum_l_quantity"),
    )


@register(
    "salted_join_identity",
    oracle=f"""
    SELECT n_name,
           COUNT(*) AS n_customers,
           {SQL_DSUM('c_acctbal', 'total_balance')}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def salted_join_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The explicit salted join (operators.scale.salted_join — left
    keys spread over 8 salts, dimension replicated to every salt)
    hash-checked against the plain equi-join: correctness is
    invariant, only the key distribution changes."""
    from ..operators.scale import salted_join

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    return (
        salted_join(cust, nation, ["c_nationkey"], salts=8)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_balance"),
        )
    )


@register("approx_percentile_prices")  # t-digest sketch: engine-specific
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch that replaces the exact
    per-group sort at 100 TB. Rows-only driver check; pytest bounds
    the sketch against the exact percentile."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(1000)).alias(
            "approx_p50"
        ),
        F.percentile("o_totalprice", 0.5).alias("exact_p50"),
    )


@register("approx_distinct_users")  # HLL sketch: engine-specific, no oracle
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the sketch that replaces exact COUNT(DISTINCT) at 100 TB (no
    giant shuffle of distinct keys). Rows-only driver check; pytest
    asserts the sketch lands within 5% of exact."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


@register(
    "deterministic_sample_orders",
    oracle=f"""
    SELECT o_orderstatus,
           count(*) AS n_sampled,
           {SQL_DSUM('o_totalprice', 'sampled_total')}
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    GROUP BY o_orderstatus
    """,
)
def deterministic_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based ~1/16 sample: md5(key) prefix filter. Unlike
    df.sample(seed), the sample set is a pure function of the data —
    stable across partitionings, engines, and re-runs (which is what
    you want for reproducible eval splits at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.where(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0"
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_sampled"),
            dsum("o_totalprice", "sampled_total"),
        )
    )


@register(
    "correlation_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS price_qty_covar,
           round(stddev_samp(l_quantity), 6) AS qty_stddev
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def correlation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, sample stddev (both engines use the same co-moment
    definitions; rounding absorbs summation-order ulps — corr/stddev
    are scale-free so 6 dp, covariance is price-scaled so 2 dp)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
            "price_qty_corr"
        ),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
            "price_qty_covar"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
    )


@register(
    "linear_regression_aggs",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def linear_regression_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit as aggregates (regr_slope/intercept/r2) — the one-pass
    distributed regression both engines define by the same co-moment
    formulas; rounding scaled to each statistic (slope/r2 are ~unit
    scale, intercept is price-scaled)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n"),
    )


@register(
    "histogram_order_values",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
           count(*) AS n_orders
    FROM orders
    GROUP BY 1
    """,
)
def histogram_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram via floor-division bucketing (integer-
    exact, so engine-identical)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.floor(F.col("o_totalprice") / 50000).cast("int").alias("bucket")
        )
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT p.column_name,
           (SELECT COUNT(*) FROM orders) AS n_rows,
           p.n_non_null, p.n_distinct, p.min_value, p.max_value
    FROM (
      SELECT 'o_orderkey' AS column_name,
             COUNT(o_orderkey) AS n_non_null,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
      FROM orders
      UNION ALL
      SELECT 'o_custkey', COUNT(o_custkey), COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(o_orderstatus),
             COUNT(DISTINCT o_orderstatus),
             CAST(MIN(o_orderstatus) AS VARCHAR),
             CAST(MAX(o_orderstatus) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(o_orderpriority),
             COUNT(DISTINCT o_orderpriority),
             CAST(MIN(o_orderpriority) AS VARCHAR),
             CAST(MAX(o_orderpriority) AS VARCHAR)
      FROM orders
    ) p
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling query (operators.quality.
    profile_columns): per-column non-null / exact-distinct / min /
    max over orders in a single aggregate scan, unpivoted to long
    form — the profiling primitive a 100 TB ingest runs per layer
    (the reference's only quality signal is a COUNT(*) echo,
    weather_daily_etl.py:183-184). String/long columns only here:
    double→string formatting differs across engines, so the oracle
    sticks to types with canonical text forms."""
    from ..operators.quality import profile_columns

    return profile_columns(
        load_table(spark, sf_dir, "orders"),
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )


_EXACT_QUANTILES_ORACLE = """
    WITH c AS (
      SELECT o_totalprice AS v, COUNT(*) AS cnt
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
    ), n AS (SELECT SUM(cnt) AS n FROM c),
    cum AS (SELECT v, SUM(cnt) OVER (ORDER BY v) AS cum FROM c),
    p(p_num, p_den) AS (VALUES (1,4),(1,2),(3,4),(9,10),(99,100))
    SELECT CAST(p_num AS BIGINT) AS p_num,
           CAST(p_den AS BIGINT) AS p_den,
           MIN(v) AS value
    FROM cum, p
    WHERE cum >= (p_num * (SELECT n FROM n) + p_den - 1) // p_den
    GROUP BY 1, 2
"""


@register("exact_quantiles_orders", oracle=_EXACT_QUANTILES_ORACLE)
def exact_quantiles_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL quantiles by distributed selection
    (operators.quantiles.exact_quantiles): p25/p50/p75/p90/p99 of
    o_totalprice as type-1 (lower) order statistics — min value whose
    cumulative count reaches ceil(p*n). No global sort and no
    single-reducer pass: the corpus collapses to a narrow
    (value, count) frame, the count prefix-sum rides the engine's
    one-range-exchange scaffolding, and rank targets are integer
    ceiling divisions. Returned values are untouched input doubles,
    so the oracle matches bit-for-bit — the exact complement of the
    approx_percentile sketch entry (rows-only by necessity) and of
    the per-group `percentile` aggregate (which sorts each group)."""
    from ..operators.quantiles import exact_quantiles

    orders = load_table(spark, sf_dir, "orders")
    return exact_quantiles(
        orders, "o_totalprice", [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]
    )


_GROUP_QUANTILES_ORACLE = """
    WITH c AS (
      SELECT o_orderstatus AS g, o_totalprice AS v, COUNT(*) AS cnt
      FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
    ), cum AS (
      SELECT g, v, SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cum,
             SUM(cnt) OVER (PARTITION BY g) AS n
      FROM c
    ), p(p_num, p_den) AS (VALUES (1,2),(9,10),(99,100))
    SELECT g AS o_orderstatus, CAST(p_num AS BIGINT) AS p_num,
           CAST(p_den AS BIGINT) AS p_den, MIN(v) AS value
    FROM cum, p WHERE cum >= (p_num * n + p_den - 1) // p_den
    GROUP BY 1, 2, 3
"""


@register("exact_quantiles_by_status", oracle=_GROUP_QUANTILES_ORACLE)
def exact_quantiles_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles by selection
    (operators.quantiles.exact_quantiles_by_group): p50/p90/p99 of
    o_totalprice per order status, computed over the narrow
    (group, value, count) frame — window cost scales with DISTINCT
    values per group, not rows per group, unlike the built-in
    `percentile` aggregate, which buffers and sorts every group's raw
    values (the percentile_price_quartiles entry documents that
    caveat; this is the answer to it). Min-of-untouched-values, so
    hash-exact against the DuckDB replay."""
    from ..operators.quantiles import exact_quantiles_by_group

    orders = load_table(spark, sf_dir, "orders")
    return exact_quantiles_by_group(
        orders, "o_orderstatus", "o_totalprice", [(1, 2), (9, 10), (99, 100)]
    )
