"""Persisted co-bucketed layouts for the heavy fact-fact joins.

The amortized-shuffle story (SURVEY.md §7 Phase 5): orders and
lineitem are written ONCE as hash-bucketed tables on the order key
(operators.scale.write_bucketed); every subsequent join or aggregation
on that key then runs with ZERO exchange — the shuffle is paid at
write time and amortized over the whole query mix. At 100 TB this is
the difference between re-shuffling 100 TB per query and never
shuffling the fact tables at all.

``q3_bucketed_layout`` / ``q18_bucketed_layout`` are semantically
identical to q3/q18 (they share the same DuckDB oracles — the driver
hash-checks both), but their fact-fact joins read the bucketed
layout. tests/test_plan_shapes.py asserts the physical difference:
no Exchange feeds the orders⨝lineitem SortMergeJoin in the bucketed
plans, while the plain-parquet plans shuffle both sides.
"""

from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum
from ..operators.scale import write_bucketed
from ..sources.tables import load_table
from .registry import REGISTRY, register


def bucketed_fixture_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per session) and return the co-bucketed
    (orders, lineitem) table names for ``sf_dir``. 16 buckets on the
    order key, sorted within buckets, so joins need neither exchange
    nor sort.

    The name tag is a DETERMINISTIC digest of ``sf_dir`` (Python's
    ``hash()`` is salted per process — it would mint fresh table
    names and leak the previous run's bucketed dirs every run), and
    "already built" is read from the session catalog itself rather
    than a process-global cache, so a new SparkSession in the same
    process rebuilds instead of returning names it never registered."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    names = (f"orders_bkt_{tag}", f"lineitem_bkt_{tag}")
    if all(spark.catalog.tableExists(n) for n in names):
        return names
    for n in names:  # tolerate a half-built pair from a dead session
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    root = tempfile.mkdtemp(prefix="bucketed_fixture_")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        names[0],
        ["o_orderkey"],
        16,
        f"{root}/orders",
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        names[1],
        ["l_orderkey"],
        16,
        f"{root}/lineitem",
        sort_cols=["l_orderkey"],
    )
    return names


@register(
    "q3_bucketed_layout",
    oracle=REGISTRY["q3_top_unshipped_orders"].oracle,
)
def q3_bucketed_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q3 with its orders⨝lineitem join reading the co-bucketed
    layout: same result, same oracle, no exchange on either fact side
    (the 16-bucket hash layout satisfies the join's distribution
    requirement; the in-bucket sort satisfies the sort requirement)."""
    orders_t, li_t = bucketed_fixture_tables(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.table(orders_t).where(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = spark.table(li_t).where(
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
    "q18_bucketed_layout",
    oracle=REGISTRY["q18_large_volume_customers"].oracle,
)
def q18_bucketed_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 against the bucketed layout: the big-order HAVING aggregate,
    the semi-join back onto lineitem, AND the orders join all key on
    the order key — with the bucketed layout every one of them is
    exchange-free (the plain-parquet form shuffles lineitem twice and
    orders once)."""
    orders_t, li_t = bucketed_fixture_tables(spark, sf_dir)
    li = spark.table(li_t)
    orders = spark.table(orders_t)
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
