"""One-variant worker for the join_bucketed A/B (BASELINE.md round-9
adjudication of the r8 1.11→2.81 s drift): replicate bench.py's
_layout_comparison bucketed variant — same scaled facts, same bucketed
table build (untimed setup), same forced confs, same three-query mix —
against the repo tree given as argv[1], print one JSON line of per-run
seconds. The driver interleaves invocations across the two trees so
neither variant's samples all land in one of this box's documented
multi-minute contention windows (scripts/ab_pairwise.py discipline;
naive back-to-back A/B produced a phantom +0.47 s in round 7).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_bucketed.py <repo_root> [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

repo = os.path.abspath(sys.argv[1])
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, repo)

from pyspark.sql import functions as F  # noqa: E402

from pyspark_airflow_weather_etl_spark.functions.exact import dsum  # noqa: E402
from pyspark_airflow_weather_etl_spark.operators.scale import (  # noqa: E402
    bucketed_tables_join,
    write_bucketed,
)
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402
from pyspark_airflow_weather_etl_spark.sources.tables import (  # noqa: E402
    load_table,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_bucketed")
spark.range(1_000_000).selectExpr("sum(id)").collect()

# Same ×4 scaled facts bench.py's _layout_comparison uses.
factor = 4
orders = load_table(spark, sf_dir, "orders")
li = load_table(spark, sf_dir, "lineitem")
shift = orders.agg(F.max("o_orderkey")).first()[0] + 1
rep = spark.range(factor).select(F.col("id").alias("__rep"))
orders_big = (
    orders.crossJoin(F.broadcast(rep))
    .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * shift)
    .drop("__rep")
)
li_big = (
    li.crossJoin(F.broadcast(rep))
    .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__rep") * shift)
    .drop("__rep")
    .withColumnRenamed("l_orderkey", "o_orderkey")
)
tmp = tempfile.mkdtemp(prefix="ab_bucketed_")
write_bucketed(orders_big, "ab_orders_b", ["o_orderkey"], 32,
               f"{tmp}/orders", sort_cols=["o_orderkey"])
write_bucketed(li_big, "ab_lineitem_b", ["o_orderkey"], 32,
               f"{tmp}/lineitem", sort_cols=["o_orderkey"])

for k, v in {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.shuffle.partitions": "400",
}.items():
    spark.conf.set(k, v)


def mix(j):
    return [
        j.groupBy("o_orderstatus").agg(
            F.count("*").alias("n"), dsum("l_quantity", "q")
        ),
        j.groupBy("o_orderpriority").agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
            )
        ),
        j.groupBy("o_orderstatus", F.year("o_orderdate").alias("y")).agg(
            F.count("*").alias("n"), dsum("l_extendedprice", "s")
        ),
    ]


j = bucketed_tables_join(spark, "ab_orders_b", "ab_lineitem_b", ["o_orderkey"])
for q in mix(j):  # warm-up pass, untimed (bench times it mid-suite, warm)
    q.collect()

samples = []
for _ in range(runs):
    t0 = time.perf_counter()
    for q in mix(j):
        q.collect()
    samples.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"repo": repo, "samples": samples}))
spark.sql("DROP TABLE IF EXISTS ab_orders_b")
spark.sql("DROP TABLE IF EXISTS ab_lineitem_b")
spark.stop()
shutil.rmtree(tmp, ignore_errors=True)
