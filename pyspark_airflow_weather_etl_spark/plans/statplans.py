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
