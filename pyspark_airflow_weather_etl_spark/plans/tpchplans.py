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


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate
                                            + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (adapted: no commit/receipt dates in the
    fixtures, so "late" is shipping >60 days after the order date):
    the sole supplier to blame for a finished order's delay. The one
    relational shape the rest of the catalog doesn't exercise —
    EXISTS and NOT EXISTS correlated on the SAME fact table with
    different predicates — decorrelated to a left-semi join (some
    OTHER supplier touched the order) followed by a left-anti join
    (no OTHER supplier was late) on the composite
    (orderkey, suppkey≠) condition, then a broadcast dim join and a
    top-k. Both correlation joins shuffle on l_orderkey — one
    exchange reused across the semi and anti stages; the count-per-
    supplier rollup and TakeOrderedAndProject ride the same idioms
    as q3/q18."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    blamed = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        blamed.join(
            F.broadcast(supp), blamed.l_suppkey == supp.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q13 shape (adapted: the comment NOT LIKE filter becomes
    a priority exclusion — same plan shape, a join-side predicate
    that cannot push below the OUTER join): how many customers placed
    0, 1, 2, … orders. A left-outer join that must preserve
    order-less customers (the 0 bucket is the query's point), a
    per-customer count, then a histogram over the counts — two
    aggregations with incompatible keys, so two shuffles, the second
    over a tiny domain. COUNT(o_orderkey) not COUNT(*): the outer
    join's null rows must count as zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q8_nation_market_share",
    oracle="""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3'
                    THEN CAST(volume AS DECIMAL(18,6))
                    ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE)
             AS mkt_share
    FROM (
      SELECT CAST(date_part('year', o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region  ON r_regionkey = n1.n_regionkey
      JOIN part    ON p_partkey = l_partkey
      WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
    )
    GROUP BY o_year
    """,
)
def q8_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one supplier nation's share of a region's
    yearly import volume — share-of-total within group via a
    conditional decimal sum over the full sum (the q14 promo-ratio
    pattern, grouped). Seven-table join: the fact-fact
    lineitem⨝orders shuffles; supplier, both nation roles, customer,
    region, and the filtered part side all broadcast (every dim is
    thousands of rows at most — at 100 TB only the two facts grow).
    The same nation table joins TWICE in different roles (supplier's
    vs customer's), which exercises plan-side alias disambiguation."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cr_key"),
    )
    region = load_table(spark, sf_dir, "region").where(
        F.col("r_name") == "AMERICA"
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "ECONOMY"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(region), F.col("cr_key") == region.r_regionkey
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
    )
    national = F.when(
        F.col("nation") == "NATION_3", vol.cast(DEC)
    ).otherwise(F.lit(0).cast(DEC))
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            (
                F.sum(national).cast("double")
                / F.sum(vol.cast(DEC)).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q11_part_value_concentration",
    oracle="""
    WITH pr AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) AS value
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_regionkey = 2
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_key, value
    FROM pr, (SELECT 2.0 * SUM(value) / COUNT(*) AS cut FROM pr) t
    WHERE value > cut
    """,
)
def q11_part_value_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q11 shape (adapted: no partsupp table, so "value" is
    shipped revenue per part from one region's suppliers): parts
    whose value exceeds a threshold derived from the total — a
    grouped aggregate HAVING against a scalar computed over the SAME
    aggregate. The threshold is 2× the mean per-part value rather
    than Q11's fixed fraction-of-total: a fixed fraction divided by
    part COUNT as the fixtures scale, emptying the result at sf0.1
    — the scale-free form keeps every SF non-trivial (12/48/516 rows
    at sf0.001/0.01/0.1) with the identical plan shape. The scalar
    is a single-row cross-joined broadcast, not a rescan (the q15
    global-max pattern with a derived threshold). Spark evaluates
    ``pr`` twice without a cache, but it is one shuffle over the
    region-filtered fact — at scale, persist if the upstream is
    expensive."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_regionkey") == 2
    )
    pr = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "value"
            )
        )
    )
    cut = pr.agg(
        (F.lit(2.0) * F.sum("value") / F.count(F.lit(1))).alias("cut")
    )
    return (
        pr.crossJoin(F.broadcast(cut))
        .where(F.col("value") > F.col("cut"))
        .select("p_key", "value")
    )


@register(
    "q12_shipping_delay_classes",
    oracle="""
    SELECT delay_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN
                                ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                    THEN 'fast'
                  WHEN l_shipdate <= o_orderdate + INTERVAL 60 DAY
                    THEN 'normal'
                  ELSE 'slow' END AS delay_class
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'
    )
    GROUP BY delay_class
    """,
)
def q12_shipping_delay_classes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q12 shape (adapted: no shipmode/commit/receipt columns,
    so the mode buckets become shipping-delay classes derived from
    timestamp arithmetic): per class, how many lines belong to
    high- vs low-priority orders — the dual conditional count over
    one fact-fact join. The CASE ladder and both counts are pure
    codegen; one shuffle for the join, one for the 3-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    )
    delay = (
        F.when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
            "fast",
        )
        .when(
            F.col("l_shipdate")
            <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            "normal",
        )
        .otherwise("slow")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(delay.alias("delay_class"), high.alias("h"))
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("h"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("h"), 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1,4,9,14,19,24,29,34)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count_by_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q16 shape (adapted: supplier attribution comes from
    lineitem instead of the absent partsupp, and the excluded-
    supplier predicate is a balance test instead of a comment LIKE):
    distinct suppliers per (brand, type, size) excluding a
    blacklist. NOT IN decorrelates to a left-anti join against the
    tiny blacklist (broadcast — NULL-key hazards don't apply, keys
    are non-null fixture ints); COUNT(DISTINCT) expands to the
    two-phase distinct-then-count aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            li.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_inventory_suppliers",
    oracle="""
    WITH q AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND EXISTS (
        SELECT 1 FROM q JOIN part ON p_partkey = q.l_partkey
        WHERE q.l_suppkey = s_suppkey AND p_type = 'PROMO'
          AND q.qty > 40.0)
    """,
)
def q20_excess_inventory_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q20 shape (adapted: availqty comes from shipped-quantity
    sums instead of the absent partsupp): one nation's suppliers who
    moved more than a threshold of any promo part in a year — a
    nested semi-join chain (supplier ⟕semi (per-(supp,part) agg ⨝
    filtered part)). The aggregate-then-semi-join decorrelation is
    the same playbook as q17's correlated average; the inner side
    reduces before the semi-join so the probe side is small."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    q = li.groupBy("l_suppkey", "l_partkey").agg(
        dsum("l_quantity", "qty")
    )
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_type") == "PROMO"
    )
    movers = (
        q.join(F.broadcast(part), q.l_partkey == part.p_partkey)
        .where(F.col("qty") > 40.0)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_3"
    )
    return (
        supp.join(
            F.broadcast(nation),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "q22_dormant_customer_balances",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(c_acctbal) AS v
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             AS totacctbal
    FROM customer JOIN nation ON n_nationkey = c_nationkey, avg_bal
    WHERE c_acctbal > avg_bal.v
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    GROUP BY n_name
    """,
)
def q22_dormant_customer_balances(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H-Q22 shape (adapted: no phone column, so country codes
    become nations, and "never ordered" — impossible in the dense
    fixture — becomes "no order since 2001"): well-funded dormant
    accounts per nation. Composes the scalar-average broadcast
    (q11/q17's decorrelation), an anti-join against a date-filtered
    order set, and a grouped decimal rollup — the one canonical
    shape combining all three."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        avg_of("c_acctbal", "v")
    )
    recent = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("v"))
        .join(
            F.broadcast(recent),
            cust.c_custkey == F.col("o_custkey"),
            "left_anti",
        )
        .join(
            F.broadcast(nation),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )
