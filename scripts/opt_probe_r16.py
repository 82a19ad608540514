"""Focused before/after timing probes for the round-16 optimization
targets — the bench's own discipline (replicated inputs written to
parquet as untimed setup, interleaved median-of-N, release_cached
between samples) but scoped to ONE operator family per invocation so
a probe runs in minutes, not the full bench's ~45.

Usage: python scripts/opt_probe_r16.py <probe> [runs]
  probe ∈ {bm25, phrase, prox, bm25_1x, phrase_1x}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pyspark_airflow_weather_etl_spark.caching import release_cached  # noqa: E402
from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402
from pyspark_airflow_weather_etl_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _median(s):
    s = sorted(s)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def _replicated_docs(spark, factor: int, tmp: str):
    docs = load_table(spark, SF_DIR, "documents")
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(factor).select(F.col("id").alias("__rep"))
    big = (
        docs.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * shift)
        .drop("__rep")
    )
    big.write.parquet(f"{tmp}/docs")
    return spark.read.parquet(f"{tmp}/docs")


def main() -> None:
    probe = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name=f"opt-probe-{probe}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_prf_expand,
        bm25_topk,
        phrase_counts,
        proximity_counts,
    )
    from pyspark_airflow_weather_etl_spark.plans.retrievalplans import (
        BM25_QUERIES,
        PHRASES,
        PROX_PAIRS,
    )

    out: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix=f"opt_probe_{probe}_")
    try:
        if probe in ("bm25", "phrase", "prox"):
            big = _replicated_docs(spark, 32, tmp)
            if probe == "bm25":
                plan = [
                    ("bm25_adhoc_32x",
                     lambda: bm25_topk(big, BM25_QUERIES, k=10)),
                    ("bm25_prf_adhoc_32x",
                     lambda: bm25_prf_expand(
                         big, BM25_QUERIES,
                         k_feedback=10, n_expansion=3, k=10)),
                ]
            elif probe == "phrase":
                plan = [("phrase_adhoc_32x",
                         lambda: phrase_counts(big, PHRASES))]
            else:
                plan = [("prox_adhoc_32x",
                         lambda: proximity_counts(
                             big, PROX_PAIRS, window=3))]
        else:
            docs = load_table(spark, SF_DIR, "documents")
            if probe == "bm25_1x":
                plan = [
                    ("bm25_topk_documents",
                     lambda: bm25_topk(docs, BM25_QUERIES, k=10)),
                    ("bm25_prf_expanded_topk",
                     lambda: bm25_prf_expand(
                         docs, BM25_QUERIES,
                         k_feedback=10, n_expansion=3, k=10)),
                ]
            else:
                plan = [
                    ("phrase_match_documents",
                     lambda: phrase_counts(docs, PHRASES)),
                    ("proximity_counts_1x",
                     lambda: proximity_counts(docs, PROX_PAIRS, window=3)),
                ]
        samples: dict[str, list[float]] = {k: [] for k, _ in plan}
        results: dict[str, list] = {}
        for _ in range(runs):
            for key, build in plan:
                spark.sparkContext.setJobDescription(f"opt-probe {key}")
                t0 = time.perf_counter()
                r = sorted(map(tuple, build().collect()))
                samples[key].append(time.perf_counter() - t0)
                prev = results.setdefault(key, r)
                assert prev == r, f"{key} unstable across runs"
                release_cached()
        for key, s in samples.items():
            out[key] = round(_median(s), 3)
        print(json.dumps({"probe": probe, "runs": runs, "timings": out,
                          "all_samples": {k: [round(x, 3) for x in v]
                                          for k, v in samples.items()}}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
