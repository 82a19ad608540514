"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query executes through the noop sink (full plan runs, nothing
is written, no driver-side collect skew). Times are end-to-end per
query including planning, measured after a small session warm-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark_airflow_weather_etl_spark.plans import REGISTRY  # noqa: E402
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402

#: Headline set: one per operator family, weighted toward the plans
#: whose scaling behaviour matters (fact-fact joins, windows,
#: inverted-index self-joins, streaming).
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "q5_nation_revenue",
    "q7_volume_shipping",
    "q10_returned_revenue",
    "q19_disjunctive_predicates",
    "sql_q4_late_orders",
    "window_top_orders_per_customer",
    "window_running_customer_total",
    "sessionize_user_events",
    "asof_purchase_prior_view",
    "range_join_views_before_purchase",
    "events_daily_rollup",
    "topk_orders_by_price",
    "cube_orders_status_priority",
    "json_props_extract",
    "token_frequency",
    "dedup_exact_documents",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_capped",
    "minhash_near_dup_pairs",
    "cosine_topk_bruteforce",
    "srp_ann_topk",
    "srp_ann_topk_at_rest",
    "ivf_ann_topk",
    "ivf_ann_topk_at_rest",
    "embedding_near_dup_blocked",
    "pairwise_topk_per_label",
    "multimodal_features",
    "streaming_daily_rollup",
]


def _layout_comparison(spark, sf_dir: str) -> dict[str, float]:
    """Measure the amortized-layout story: the same orders⨝lineitem
    aggregation against (a) plain parquet (shuffle both sides) and
    (b) pre-bucketed tables (zero exchange). The bucketed write is
    setup, not measurement — at scale it is paid once and amortized
    over every downstream join on the key."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.scale import (
        bucketed_tables_join,
        write_bucketed,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    tmp = tempfile.mkdtemp(prefix="bench_buckets_")
    write_bucketed(orders, "bench_orders_b", ["o_orderkey"], 16,
                   f"{tmp}/orders", sort_cols=["o_orderkey"])
    write_bucketed(li, "bench_lineitem_b", ["o_orderkey"], 16,
                   f"{tmp}/lineitem", sort_cols=["o_orderkey"])

    def agg(df):
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), F.sum("l_quantity").alias("q")
        )

    out: dict[str, float] = {}
    # Force the conditions where the exchange matters: no broadcast
    # fallback, high shuffle partitions (a 1000-executor cluster's
    # setting — at local sf0.1 the exchange is otherwise too cheap to
    # see). The bucketed path's plan has zero exchanges either way
    # (asserted in tests/test_plan_shapes.py); this makes the
    # shuffled path pay what it would pay at scale.
    forced = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "400",
    }
    old_confs = {k: spark.conf.get(k) for k in forced}
    for k, v in forced.items():
        spark.conf.set(k, v)
    try:
        t0 = time.perf_counter()
        agg(orders.join(li, "o_orderkey")).write.format("noop").mode(
            "overwrite"
        ).save()
        out["join_shuffled"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        agg(
            bucketed_tables_join(
                spark, "bench_orders_b", "bench_lineitem_b", ["o_orderkey"]
            )
        ).write.format("noop").mode("overwrite").save()
        out["join_bucketed"] = round(time.perf_counter() - t0, 3)
    finally:
        for k, v in old_confs.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS bench_orders_b")
        spark.sql("DROP TABLE IF EXISTS bench_lineitem_b")
    return out


def _layout_skipping(spark, sf_dir: str) -> dict[str, float]:
    """Sorted-layout data skipping: the same narrow o_orderdate range
    scan against (a) the fixture's unsorted parquet (every file spans
    the full date range — min/max stats prune nothing) and (b) a
    range-partitioned + sorted rewrite (tight per-file stats — the
    scan touches ~1/16 of the files). Write cost is ingest-time,
    amortized over every range query."""
    import tempfile

    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.operators.scale import write_sorted
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="bench_sorted_") + "/orders"
    write_sorted(orders, tmp, ["o_orderdate"], files_per_write=16)

    pred = (
        (F.col("o_orderdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-03-08").cast("timestamp"))
    )

    def probe(df):
        return df.where(pred).agg(
            F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
        )

    out: dict[str, float] = {}
    t0 = time.perf_counter()
    n_plain = probe(orders).collect()[0]["n"]
    out["range_scan_unsorted"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    n_sorted = probe(spark.read.parquet(tmp)).collect()[0]["n"]
    out["range_scan_sorted"] = round(time.perf_counter() - t0, 3)
    assert n_plain == n_sorted, "layout changed the answer"
    return out


def _skew_comparison(spark, sf_dir: str) -> dict[str, float]:
    """Hot-key join three ways at the same result hash: plain SMJ
    (one straggler task owns the hot key), AQE skew-join (runtime
    splits the oversized partition), and explicit salting
    (operators.scale.salted_join — deterministic pre-spread for skew
    AQE can't fix, e.g. when the hot partition's *build* lookups, not
    its size, dominate). Skew is synthesized deterministically: half
    of lineitem maps to one key, the rest spread over 999."""
    from pyspark.sql import functions as F

    from pyspark_airflow_weather_etl_spark.functions.exact import dsum
    from pyspark_airflow_weather_etl_spark.operators.scale import salted_join
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    skewed = li.select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0))
        .otherwise(F.pmod("l_orderkey", F.lit(1000)))
        .cast("long")
        .alias("k"),
        F.col("l_quantity").alias("v"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )

    def agg(j):
        return j.groupBy("w").agg(
            F.count("*").alias("n"), dsum("v", "sv")
        )

    out: dict[str, float] = {}
    forced = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.shuffle.partitions": "64",
    }
    # adaptive.enabled is toggled inside the experiment — snapshot it
    # with the rest so the finally restores the caller's value, not a
    # hardcoded one
    old = {
        k: spark.conf.get(k)
        for k in [*forced, "spark.sql.adaptive.enabled"]
    }
    for k, v in forced.items():
        spark.conf.set(k, v)
    results = {}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        t0 = time.perf_counter()
        results["plain"] = sorted(map(tuple, agg(skewed.join(dim, "k")).collect()))
        out["join_skew_plain"] = round(time.perf_counter() - t0, 3)

        spark.conf.set("spark.sql.adaptive.enabled", "true")
        t0 = time.perf_counter()
        results["aqe"] = sorted(map(tuple, agg(skewed.join(dim, "k")).collect()))
        out["join_skew_aqe"] = round(time.perf_counter() - t0, 3)

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        t0 = time.perf_counter()
        results["salted"] = sorted(
            map(tuple, agg(salted_join(skewed, dim, ["k"])).collect())
        )
        out["join_skew_salted"] = round(time.perf_counter() - t0, 3)
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    # same result hash on all three paths (decimal sums: exact)
    assert results["plain"] == results["aqe"] == results["salted"], (
        "skew rewrites changed the answer"
    )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    # Warm up the JVM codegen + Hadoop FS/parquet reader paths so the
    # first measured query doesn't pay one-time session init.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Build the at-rest LSH index before timing: signature-at-write is
    # ingest-time cost, amortized over every probe (same treatment as
    # the bucketed-table write in _layout_comparison).
    from pyspark_airflow_weather_etl_spark.plans.simplans import (
        ivf_index_path,
        srp_index_path,
    )

    srp_index_path(spark, sf_dir)
    ivf_index_path(spark, sf_dir)

    # Warm the shingle-HOF codegen/JIT path on a 200-doc slice: the
    # generated shingle-eval methods take several seconds of C2
    # compilation on first use (measured 15 s cold vs 2 s steady for
    # ngram_jaccard_pairs); per-query numbers should reflect steady
    # state, not whichever dedup query happens to run first.
    from pyspark_airflow_weather_etl_spark.operators.dedup import jaccard_pairs
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    jaccard_pairs(
        load_table(spark, sf_dir, "documents").limit(200), "doc_id", "text"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    timings.update(_layout_comparison(spark, sf_dir))
    timings.update(_skew_comparison(spark, sf_dir))
    timings.update(_layout_skipping(spark, sf_dir))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
