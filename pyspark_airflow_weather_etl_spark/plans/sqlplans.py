"""SQL-API catalog: queries expressed once in a shared ANSI dialect
and executed verbatim by BOTH engines — Spark runs the text through
``spark.sql`` over registered temp views, DuckDB runs the identical
text as the oracle. Exercises the engine's SQL surface (subqueries,
EXISTS, grouping sets, NTILE) exactly as a SQL-first consumer of the
reference would use it."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .registry import register


def _sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(sql)


TPCH_Q4_LATE_ORDERS = """
    SELECT o_orderpriority, count(*) AS n_late
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL '90' DAY)
    GROUP BY o_orderpriority
"""


@register("sql_q4_late_orders", oracle=TPCH_Q4_LATE_ORDERS)
def sql_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape through the SQL API: correlated EXISTS over the
    fact table (Catalyst decorrelates it to a left-semi join) — the
    identical SQL text is the oracle."""
    return _sql(spark, sf_dir, TPCH_Q4_LATE_ORDERS)


ABOVE_NATION_AVG = """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
               / COUNT(*)
        FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey)
"""


@register("sql_above_nation_avg", oracle=ABOVE_NATION_AVG)
def sql_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated to an aggregate +
    join). The subquery average uses the DECIMAL-exact form so the
    comparison threshold is bit-identical across engines."""
    return _sql(spark, sf_dir, ABOVE_NATION_AVG)


GROUPING_SETS_ORDERS = """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           count(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("sql_grouping_sets_orders", oracle=GROUPING_SETS_ORDERS)
def sql_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube):
    one Expand + single aggregate pass."""
    return _sql(spark, sf_dir, GROUPING_SETS_ORDERS)


LATERAL_TOP_CUSTOMER = """
    SELECT n_name, t.top_custkey, t.bal
    FROM nation, LATERAL (
      SELECT c_custkey AS top_custkey, c_acctbal AS bal
      FROM customer
      WHERE c_nationkey = n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 1) t
"""


@register("sql_lateral_top_customer", oracle=LATERAL_TOP_CUSTOMER)
def sql_lateral_top_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with per-row ORDER BY/LIMIT — the
    top-1-per-outer-row pattern as first-class SQL (Catalyst
    decorrelates it; the window-rank form is its plan twin)."""
    return _sql(spark, sf_dir, LATERAL_TOP_CUSTOMER)


NTILE_PRICE_QUARTILES = """
    SELECT quartile,
           count(*) AS n_orders,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM (SELECT o_totalprice,
                 CAST(NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT)
                   AS quartile
          FROM orders)
    GROUP BY quartile
"""


@register("sql_ntile_price_quartiles", oracle=NTILE_PRICE_QUARTILES)
def sql_ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing over a global ordering (fully tie-broken via
    o_orderkey so bucket boundaries are deterministic)."""
    return _sql(spark, sf_dir, NTILE_PRICE_QUARTILES)


RECURSIVE_CALENDAR = """
    WITH RECURSIVE days(d) AS (
      SELECT DATE '1998-03-01' AS d
      UNION ALL
      SELECT d + INTERVAL '1' DAY FROM days WHERE d < DATE '1998-03-31'
    )
    SELECT CAST(d AS STRING) AS day, count(o_orderkey) AS n_orders
    FROM days LEFT JOIN orders ON CAST(o_orderdate AS DATE) = d
    GROUP BY d
"""


@register("sql_recursive_calendar", oracle=RECURSIVE_CALENDAR)
def sql_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE) generating a calendar
    spine, left-joined to order counts — densification that surfaces
    zero-order days, which a plain GROUP BY can never produce. The
    identical recursive text runs on both engines."""
    return _sql(spark, sf_dir, RECURSIVE_CALENDAR)
