"""One-variant worker for the ngram_jaccard_pairs_capped A/B
(BASELINE.md round-7 adjudication): run the capped query N times in
THIS process against the repo tree given as argv[1] and print one
JSON line of per-run seconds. The driver interleaves invocations of
this worker across the two trees so no variant's samples all land in
one of the box's contention windows.

Usage: python scripts/ab_capped.py <repo_root> [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.abspath(sys.argv[1])
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, repo)

from pyspark_airflow_weather_etl_spark.operators.dedup import (  # noqa: E402
    jaccard_pairs,
)
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402
from pyspark_airflow_weather_etl_spark.sources.tables import (  # noqa: E402
    load_table,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_capped")

# Same warm-ups bench.py applies before this query: JVM/reader paths
# and the shingle-HOF codegen (C2 compilation of the generated
# shingle-eval methods costs seconds on first use).
spark.range(1_000_000).selectExpr("sum(id)").collect()
docs = load_table(spark, sf_dir, "documents")
jaccard_pairs(docs.limit(200), "doc_id", "text").write.format("noop").mode(
    "overwrite"
).save()

# Mirror bench.py's cache discipline: release operator caches AFTER
# each timed run, outside the timing window. Without this, HEAD's
# claim_group pays the previous run's blocking unpersist INSIDE the
# timed window — a cost bench never measures (it releases between
# queries) — and the A/B reads as a phantom kernel regression
# (measured +0.4 s/run, round 7). Import-guarded: the r4 tree has no
# caching module; there we approximate with clearCache.
try:
    from pyspark_airflow_weather_etl_spark.caching import (  # noqa: E402
        release_cached,
    )
except ImportError:
    def release_cached() -> None:
        spark.catalog.clearCache()

release_cached()
samples = []
for _ in range(runs):
    t0 = time.perf_counter()
    jaccard_pairs(
        docs, "doc_id", "text", threshold=0.5, n=3, max_df=5
    ).write.format("noop").mode("overwrite").save()
    samples.append(round(time.perf_counter() - t0, 3))
    release_cached()
print(json.dumps({"repo": repo, "samples": samples}))
spark.stop()
