"""Round-17 drift adjudication (VERDICT r16 #2): committed, reproducible
timings for the families whose BENCH_r16 numbers drifted 1.4-2.1x vs
BENCH_r15 on code that `git diff` proves unchanged —
``phrase_at_rest_compacted`` / ``phrase_at_rest_16deltas`` and
``bpe_train_24_merges_batch8`` — plus the ``dedup_clusters_*`` triple,
which round 17 DID change (fused canon+repartition, one-job star-forest
convergence check), so its numbers here are an after-measurement, not a
drift record.

Methodology = bench.py's own probe functions (same replicated inputs,
interleaved median-of-N, result-equality asserts), same engine session
shape ($SPARK_GRAFT_CPUS cores, $SPARK_GRAFT_SF_DIR data). Output: one
JSON line with this box's numbers next to the BENCH_r15/BENCH_r16
driver records, so the adjudication lives in the repo instead of in a
round note.

Usage: python scripts/drift_probe_r17.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_airflow_weather_etl_spark.session import get_spark  # noqa: E402

#: driver-recorded values for the flagged keys (BENCH_r15 raw tail /
#: BENCH_r16.json), committed here so the comparison is self-contained.
REFERENCE = {
    "phrase_at_rest_16deltas": {"r15": 0.685, "r16": 1.341},
    "phrase_at_rest_compacted": {"r15": 0.435, "r16": 0.898},
    "bpe_train_24_merges_batch8": {"r15": 6.528, "r16": 9.194},
    "dedup_clusters_star": {"r15": 3.104, "r16": 5.341},
    "dedup_clusters_label": {"r15": 1.076, "r16": 2.145},
    "dedup_clusters_star_ckpt": {"r15": 3.134, "r16": 6.084},
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    spark = get_spark(
        app_name="drift-probe-r17",
        cpus=int(cpus),
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm-up

    import bench

    out: dict[str, float] = {}
    out.update(bench._phrase_compaction_probe(spark, sf_dir))
    out.update(bench._bpe_probe(spark, sf_dir))
    out.update(bench._cc_algorithm_probe(spark, sf_dir))
    record = {
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "bench_runs": bench.BENCH_RUNS,
        "now": out,
        "reference": REFERENCE,
    }
    line = json.dumps(record)
    print(line)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
