"""One-variant worker for the pairwise_topk_per_label A/B
(BASELINE.md round-8 adjudication of the r7 +31% drift on the exact
path): run the exact-path query N times in THIS process against the
repo tree given as argv[1] and print one JSON line of per-run
seconds. The driver interleaves invocations of this worker across
the two trees so no variant's samples all land in one of the box's
contention windows (same discipline as scripts/ab_capped.py — naive
back-to-back A/B produced a phantom +0.47 s in round 7).

Usage: python scripts/ab_pairwise.py <repo_root> [runs]
"""

from __future__ import annotations

import inspect
import json
import os
import sys
import time

repo = os.path.abspath(sys.argv[1])
runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
sys.path.insert(0, repo)

from pyspark_airflow_weather_etl_spark.operators.similarity import (  # noqa: E402
    pairwise_topk_per_label,
)
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402
from pyspark_airflow_weather_etl_spark.sources.tables import (  # noqa: E402
    load_table,
)

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_pairwise")

# Same warm-ups bench.py applies: JVM/reader paths, then one small
# run of the query itself so arrow-UDF worker startup and codegen are
# out of the timed samples (bench times it mid-suite, warm).
spark.range(1_000_000).selectExpr("sum(id)").collect()
emb = load_table(spark, sf_dir, "embeddings")

# The hot-label guard landed in r7; the r6 tree has no such kwarg.
# Both trees must run the same EXACT plan — pass the disable knob
# only where it exists.
kwargs = {"k": 3}
if "hot_label_threshold" in inspect.signature(
    pairwise_topk_per_label
).parameters:
    kwargs["hot_label_threshold"] = None

pairwise_topk_per_label(emb.limit(200), **kwargs).write.format("noop").mode(
    "overwrite"
).save()

# Mirror bench.py's cache discipline (release AFTER the timed window;
# see ab_capped.py for the phantom-regression note).
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
    pairwise_topk_per_label(emb, **kwargs).write.format("noop").mode(
        "overwrite"
    ).save()
    samples.append(round(time.perf_counter() - t0, 3))
    release_cached()
print(json.dumps({"repo": repo, "samples": samples}))
spark.stop()
