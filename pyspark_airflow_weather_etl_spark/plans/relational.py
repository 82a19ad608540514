"""Relational query catalog: scans → projections → joins → aggregates →
windows → set ops → rollup/cube → scalar functions.

Generalizes the reference's operator surface (SURVEY.md §2): its only
aggregate is a per-day global min/max/avg/sum (gold_openmeteo.py:20-27)
and it has *no* joins/windows/set-ops (§2.9) — these queries supply the
full relational layer a consumer of the reference would need next.

Scale notes baked into each plan:
- dimension joins (region/nation/customer/supplier/part) are
  explicitly `F.broadcast` — at 100 TB the fact side never shuffles
  for them;
- fact-fact joins (orders⨝lineitem) shuffle on the join key and rely
  on AQE skew splitting;
- sums feeding cross-engine comparison use exact decimal accumulation
  (functions.exact) — also what makes re-runs reproducible at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import DEC, SQL_AVG, SQL_DSUM, avg_of, dsum
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------- Q1


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity', 'sum_qty')},
           {SQL_DSUM('l_extendedprice', 'sum_base_price')},
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {SQL_DSUM('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {SQL_AVG('l_quantity', 'avg_qty')},
           {SQL_AVG('l_extendedprice', 'avg_price')},
           {SQL_AVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship grouped aggregate (TPC-H-Q1 shape). The exact
    min/max/avg/sum aggregate family of the reference's gold rollup
    (/root/reference/spark_jobs/gold_openmeteo.py:20-27), generalized
    from a per-partition global agg to a grouped hash-agg — Spark's
    HashAggregateExec does partial (map-side) + final aggregation, so
    only one narrow shuffle of pre-aggregated groups at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            avg_of("l_quantity", "avg_qty"),
            avg_of("l_extendedprice", "avg_price"),
            avg_of("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ------------------------------------------------------------- joins


@register(
    "q3_top_unshipped_orders",
    oracle=f"""
    SELECT l_orderkey,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3 shape: selective dim filter → fact-fact join → grouped
    agg → top-k. customer is broadcast (no shuffle of orders);
    orders⨝lineitem shuffles on orderkey; top-10 runs as
    TakeOrderedAndProject (no global sort materialization)."""
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "order_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=f"""
    SELECT n_name,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5 shape: five-way join with a region filter. All four
    dimension sides broadcast; the only shuffle is orders⨝lineitem on
    orderkey + the final small group-by."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q2_min_per_group_joinback",
    oracle="""
    WITH best AS (
      SELECT s_nationkey AS nk, min(s_acctbal) AS min_bal
      FROM supplier GROUP BY s_nationkey
    )
    SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
    FROM supplier s JOIN best b
      ON s.s_nationkey = b.nk AND s.s_acctbal = b.min_bal
    """,
)
def q2_min_per_group_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: the aggregate-then-join-back pattern — compute
    a per-group extreme (min supplier balance per nation), then rejoin
    to recover the full row(s) achieving it (the decorrelated form of
    a correlated MIN subquery)."""
    supp = load_table(spark, sf_dir, "supplier")
    best = supp.groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return supp.join(
        F.broadcast(best),
        (supp.s_nationkey == best.nk) & (supp.s_acctbal == best.min_bal),
    ).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           {SQL_DSUM('l_quantity', 'total_qty')}
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 180)
    GROUP BY c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 shape: HAVING over a grouped sum feeding an IN
    subquery (a left-semi join after decorrelation) — big orders and
    who placed them."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", "q"))
        .where(F.col("q") > 180)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(dsum("l_quantity", "total_qty"))
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {SQL_DSUM('volume', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(date_part('year', l_shipdate) AS INT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: two roles of the same dimension (nation as
    supplier-side and customer-side) with a symmetric OR predicate —
    the dimension broadcasts twice under different aliases."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@register(
    "q10_returned_revenue",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: revenue lost to returns, top-20 customers —
    selective fact filter pushed to the scan, dims broadcast, top-k
    heap at the end."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {SQL_DSUM('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
            AND l_quantity BETWEEN 1 AND 30)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
            AND l_quantity BETWEEN 10 AND 40))
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: disjunctive multi-column predicates across
    both join sides — Catalyst pushes the common conjuncts and keeps
    the OR as a join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "null_semantics",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(nullif(o_orderpriority, '5-LOW')) AS n_not_low,
           COUNT(*) FILTER (WHERE nullif(o_orderpriority, '5-LOW') IS NULL)
             AS n_low_as_null,
           COALESCE(min(nullif(o_orderpriority, '5-LOW')), 'ALL-LOW') AS min_prio,
           COUNT(*) FILTER (WHERE nullif(o_orderpriority, '5-LOW')
                            IS NOT DISTINCT FROM NULL) AS n_null_safe_eq
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: NULLIF-manufactured nulls, COUNT's
    null-skipping, COALESCE defaults, and null-safe equality (Spark
    <=> ≡ SQL IS NOT DISTINCT FROM). The fixtures are null-free, so
    the nulls are manufactured in-plan."""
    orders = load_table(spark, sf_dir, "orders")
    masked = F.nullif(F.col("o_orderpriority"), F.lit("5-LOW"))
    return orders.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count(masked).alias("n_not_low"),
        F.count(F.when(masked.isNull(), 1)).alias("n_low_as_null"),
        F.coalesce(F.min(masked), F.lit("ALL-LOW")).alias("min_prio"),
        F.count(F.when(masked.eqNullSafe(F.lit(None)), 1)).alias(
            "n_null_safe_eq"
        ),
    )


@register(
    "semi_join_big_spenders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 100000)
    """,
)
def semi_join_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: customers having at least one order over 100k.
    Semi joins never widen rows, so the probe side streams through
    without duplication — the right plan for existence checks at scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 100000)
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "anti_join_no_pending",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'P')
    """,
)
def anti_join_no_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no pending order — the merge
    primitive the engine's upsert is built on (operators.merge)."""
    cust = load_table(spark, sf_dir, "customer")
    pending = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "P"
    )
    return cust.join(
        pending, cust.c_custkey == pending.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ------------------------------------------------------------ windows


@register(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER. One shuffle on the partition
    key; Spark 3.5+ pushes the rn<=3 predicate into the window sort
    (WindowGroupLimit), so each group keeps only k rows pre-shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "window_order_value_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice - LAG(o_totalprice) OVER w AS delta,
           LEAD(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_order_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD over a deterministic (date, key) ordering: change in
    order value between consecutive orders of one customer."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "window_running_customer_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_customer_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer. Accumulates in DECIMAL so the
    result is independent of the window implementation's summation
    order (Spark streams the frame; DuckDB uses a segment tree —
    double accumulation would diverge in the last bits)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double")
        .alias("running_total"),
    )


@register(
    "window_rank_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           first_value(o_orderkey) OVER w AS cheapest_order,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER
             (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
              ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             AS neighbourhood_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: percent_rank / cume_dist (rounded —
    internal division), first_value, nth_value over an unbounded
    frame, and a sliding ±1-row decimal sum. One shuffle; every
    window shares the (custkey | price, key) sort."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_near = w.rowsBetween(-1, 1)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.nth_value("o_orderkey", 2).over(w_all).alias("second_cheapest"),
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w_near)
        .cast("double")
        .alias("neighbourhood_total"),
    )


# ------------------------------------------------------- sorts / topk


@register(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: ORDER BY + LIMIT compiles to
    TakeOrderedAndProject — each partition keeps a k-heap; no global
    sort is ever materialized, so this is O(k) memory at any scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ------------------------------------------------------------ set ops


@register(
    "setop_cust_fulfilled_and_open",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_cust_fulfilled_and_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (deduplicating): customers with both fulfilled and
    open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "setop_cust_fulfilled_only",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_cust_fulfilled_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (deduplicating): fulfilled-only customers."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(o)


@register(
    "setop_union_segments",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
    """,
)
def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (deduplicating) of two customer selections."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_mktsegment"
    )
    b = cust.where(F.col("c_acctbal") > 5000).select("c_custkey", "c_mktsegment")
    return a.unionByName(b).distinct()


# -------------------------------------------- distinct / rollup / cube


@register(
    "distinct_customers_per_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def distinct_customers_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT + exact COUNT(DISTINCT) per group (Spark expands this to
    a two-phase aggregate automatically)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@register(
    "rollup_pricing_by_flag_status",
    oracle=f"""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           {SQL_DSUM('l_quantity', 'sum_qty')},
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: per-(flag,status), per-flag subtotal, grand total."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", "sum_qty"), F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "cube_orders_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping combinations in
    one pass (Spark Expand + single hash aggregate)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


# --------------------------------------------------- scalar functions


@register(
    "scalar_string_part_catalog",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substring(p_type, 1, 4) AS type_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, '/', p_type) AS brand_type,
           replace(p_name, ' ', '_') AS name_snake,
           CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INT) AS brand_num
    FROM part
    """,
)
def scalar_string_part_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions (upper/substring/length/concat/replace/
    regexp_extract) — all JVM built-ins inside whole-stage codegen."""
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.regexp_extract("p_brand", "[0-9]+", 0).cast("int").alias("brand_num"),
    )


@register(
    "scalar_math_order_buckets",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 50000  THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice', 'total')},
           round(sqrt(avg_price), 6) AS sqrt_avg,
           round(ln(avg_price), 6) AS ln_avg
    FROM (
      SELECT o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER () AS DOUBLE)
               / COUNT(*) OVER () AS avg_price
      FROM orders
    )
    GROUP BY 1, round(sqrt(avg_price), 6), round(ln(avg_price), 6)
    """,
)
def scalar_math_order_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + math scalars (sqrt exact per IEEE; ln
    rounded to 6 dp since libm implementations differ in the last
    ulp). The global average comes from a broadcast single-row
    aggregate cross-joined back — NOT a partition-less window, which
    would funnel the whole table through one task at scale."""
    orders = load_table(spark, sf_dir, "orders")
    global_avg = orders.agg(
        (
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double")
            / F.count("*")
        ).alias("avg_price")
    )
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        orders.crossJoin(F.broadcast(global_avg))
        .select(
            bucket.alias("bucket"),
            F.col("o_totalprice"),
            F.round(F.sqrt(F.col("avg_price")), 6).alias("sqrt_avg"),
            F.round(F.log(F.col("avg_price")), 6).alias("ln_avg"),
        )
        .groupBy("bucket", "sqrt_avg", "ln_avg")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total"))
        .select("bucket", "n_orders", "total", "sqrt_avg", "ln_avg")
    )


@register(
    "scalar_date_order_months",
    oracle=f"""
    SELECT CAST(date_part('year', o_orderdate) AS INT) AS order_year,
           CAST(date_part('month', o_orderdate) AS INT) AS order_month,
           strftime(min(o_orderdate), '%Y-%m-%d') AS first_day,
           COUNT(*) AS n_orders,
           {SQL_DSUM('o_totalprice', 'month_total')}
    FROM orders
    GROUP BY 1, 2
    """,
)
def scalar_date_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction done in the plan, not the driver — the
    reference slices dates in Python/Jinja (SURVEY.md §2.4 D2), which
    can't parallelize or prune."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "month_total"),
        )
    )


@register(
    "json_props_extract",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {SQL_DSUM("CAST(json_extract_string(props, '$.k') AS INT)", 'k_sum')},
           COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50)
             AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string scalar extraction (get_json_object) + filtered
    aggregate — the events.props column is a JSON document per row."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum(k, "k_sum"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
    )


@register(
    "full_outer_nation_activity",
    oracle="""
    WITH cust_n AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp_n AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM cust_n c FULL OUTER JOIN supp_n s ON c.nationkey = s.nationkey
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two pre-aggregated sides (nations with only
    customers, only suppliers, or both). Pre-aggregating before the
    join keeps the outer join key-cardinality-sized."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'retail_price' AS metric, p_retailprice AS value FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide metric columns → (key, metric, value) long
    form — Spark's native unpivot (Expand, narrow, no shuffle)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        "p_partkey", ["retail_price", "size"], "metric", "value"
    )


@register(
    "array_agg_order_ids",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(CAST(o_orderkey AS VARCHAR) ORDER BY o_orderkey), ',')
             AS order_ids,
           count(*) AS n_orders
    FROM orders
    WHERE o_totalprice > 250000
    GROUP BY o_custkey
    """,
)
def array_agg_order_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered collect: per-customer sorted id list joined to one
    string (collect_list is unordered by contract — array_sort makes
    the result partitioning-independent)."""
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") > 250000
    )
    return orders.groupBy("o_custkey").agg(
        F.array_join(
            F.array_sort(F.collect_list(F.col("o_orderkey"))).cast(
                "array<string>"
            ),
            ",",
        ).alias("order_ids"),
        F.count("*").alias("n_orders"),
    )


@register(
    "date_arithmetic_shipping",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS days_to_ship,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           CAST(date_diff('day', o_orderdate, l_shipdate) > 30 AS BOOLEAN) AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_linenumber = 1 AND o_orderkey % 100 = 0
    """,
)
def date_arithmetic_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic in the plan: datediff, interval addition,
    derived booleans (the reference does all date math driver-side —
    SURVEY.md §2.4 D2)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    orders = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderkey") % 100 == 0
    )
    days = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            days.alias("days_to_ship"),
            F.date_format(
                F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
            ).alias("due_date"),
            (days > 30).alias("late"),
        )
    )


@register(
    "from_json_typed_props",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) BETWEEN 40 AND 60
    """,
)
def from_json_typed_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with an explicit schema (from_json, not
    per-path get_json_object): one parse per row however many fields
    are read, and the struct then filters/projects like any column."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", "k INT")
    )
    return parsed.where(F.col("p.k").between(40, 60)).select(
        "event_id", "event_type", F.col("p.k").alias("k")
    )


# --------------------------------------- time-series (weather analog)


@register(
    "events_daily_rollup",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           min(value) AS min_value,
           max(value) AS max_value,
           {SQL_AVG('value', 'avg_value')},
           {SQL_DSUM('value', 'sum_value')},
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's gold daily rollup (min/max/avg/sum per day —
    gold_openmeteo.py:20-27), generalized from one-partition-per-job
    to a single grouped aggregate over all days and keyed sub-series
    (event_type stands in for the weather location)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            avg_of("value", "avg_value"),
            dsum("value", "sum_value"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "pivot_daily_event_values",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {SQL_DSUM("CASE WHEN event_type = 'view'     THEN value END", 'view')},
           {SQL_DSUM("CASE WHEN event_type = 'click'    THEN value END", 'click')},
           {SQL_DSUM("CASE WHEN event_type = 'signup'   THEN value END", 'signup')},
           {SQL_DSUM("CASE WHEN event_type = 'purchase' THEN value END", 'purchase')},
           {SQL_DSUM("CASE WHEN event_type = 'error'    THEN value END", 'error')}
    FROM events
    GROUP BY 1
    """,
)
def pivot_daily_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: day × event_type matrix of value sums. Explicit value
    list, so Spark skips the extra distinct-values job and compiles to
    one aggregate pass."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", ["view", "click", "signup", "purchase", "error"])
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )


@register(
    "sliding_window_event_stats",
    oracle=f"""
    WITH assigned AS (
      SELECT date_trunc('day', ts) AS win_start, value FROM events
      UNION ALL
      SELECT date_trunc('day', ts) - INTERVAL 1 DAY, value FROM events
    )
    SELECT strftime(win_start, '%Y-%m-%d') AS window_start,
           COUNT(*) AS n_events,
           {SQL_DSUM('value', 'sum_value')}
    FROM assigned
    GROUP BY win_start
    """,
)
def sliding_window_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) event-time windows: 2-day windows advancing
    1 day, so every event lands in two windows (Spark's window() with
    a slide emits one row per covering window — the oracle expresses
    the same assignment as a UNION of the two shifted buckets)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            dsum("value", "sum_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "session_window_native",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_seq
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native session_window (30-min gap) checked against the
    independent gaps-and-islands SQL formulation — two definitions of
    'session' proven equivalent on the same data."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("win"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


@register(
    "sessionize_user_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_seq
      FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS span_us
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def sessionize_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (gaps-and-islands, 30-min inactivity): the batch
    equivalent of the streaming stateful operator in
    streaming.sessionize — lag → new-session flag → running count →
    per-session rollup. One shuffle on user_id; every window reuses
    that partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | ((us - F.unix_micros(F.lag("ts").over(w))) > 1_800_000_000),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("span_us"),
        )
    )
