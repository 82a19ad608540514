"""Additional TPC-H-shaped relational coverage (SURVEY.md §2.9).

Five more canonical OLAP shapes over the fixture tables, adapted to
the columns the fixtures carry (no partsupp table, no
commit/receipt dates): scan-only aggregate (q6), conditional-ratio
aggregate over a fact⨝dim join (q14), aggregate → global-max
join-back (q15), correlated-average quantity filter (q17), and a
multi-join rollup by nation and year (q9 shape). All money sums use
DECIMAL(18,6) accumulation (functions.exact) so both engines produce
bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import DEC, SQL_DSUM, avg_of, dsum
from ..sources.tables import load_table
from .registry import register


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {SQL_DSUM('l_extendedprice * l_discount', 'revenue')}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate <  TIMESTAMP '1998-07-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure scan-aggregate — every predicate pushes to
    the parquet scan (range on shipdate, band on discount, bound on
    quantity), no join, no shuffle beyond the single-row final
    aggregate. The canonical predicate-pushdown probe."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
               THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1998-03-01'
      AND l_shipdate <  TIMESTAMP '1998-04-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: conditional-ratio aggregate over a fact⨝dim
    join — share of one month's revenue from PROMO parts. part is
    broadcast; the ratio is one IEEE division of two exact decimal
    sums, so it is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    zero = F.lit(0).cast(DEC)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'total_revenue')}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: quarterly revenue per supplier, then the
    supplier(s) hitting the global maximum — aggregate feeding a
    broadcast single-row max joined back (the q2 min-per-group
    pattern at global scope). Exact decimal sums make the equality
    join safe where float sums would tie-break differently per
    engine."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey AS pk,
             0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                    / COUNT(l_quantity)) AS qty_cap
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#9' AND l_quantity < qty_cap
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: correlated average — lineitems below 20% of
    their part's mean quantity, for one brand. The correlated scalar
    subquery decorrelates to a per-part aggregate joined back on the
    part key; the cap is one IEEE multiply of an exact decimal mean,
    so the < comparison agrees across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * (F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                       / F.count("l_quantity"))).alias("qty_cap")
    )
    part = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#9")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg, li.l_partkey == pavg.pk)
        .where(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
    SELECT n_name,
           CAST(date_part('year', o_orderdate) AS INT) AS o_year,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'profit')}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, o_year
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (adapted: no partsupp in the fixtures, so profit
    is discounted revenue): multi-join rollup by supplier nation and
    order year for one part type. Fact-fact join on the order key;
    supplier, nation, and the filtered part side all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            "n_name", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "profit"))
    )
