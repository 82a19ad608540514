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
    "minhash_near_dup_pairs",
    "cosine_topk_bruteforce",
    "srp_ann_topk",
    "ivf_ann_topk",
    "pairwise_topk_per_label",
    "multimodal_features",
    "streaming_daily_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="bench")

    # Warm up the JVM codegen + Hadoop FS/parquet reader paths so the
    # first measured query doesn't pay one-time session init.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

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
