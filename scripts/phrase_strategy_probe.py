"""Phrase/NEAR at-rest strategy crossover probe — measures the
'loop' (per-query plan branches) vs 'set' (one data-driven broadcast
plan) dispatch band that `_SET_STRATEGY_MIN` encodes
(operators/retrieval.py), on the ×32 corpus the bench's scale probe
uses, at several query-set sizes.

The round-12 constant (9) came from one fixture-scale pair (3-phrase
loop 0.56 s vs set 1.1 s; 300-phrase set 4.4 s where loop hits the
analyzer wall). This probe re-derives the band reproducibly: for each
query-set size it times both strategies (interleaved median-of-3,
result equality asserted) and prints one JSON line per (size,
strategy).

Usage: python scripts/phrase_strategy_probe.py [--factor 32]
       [--sizes 3,9,30,100,300]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=32)
    ap.add_argument("--sizes", default="3,9,30,100,300")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        phrase_match_at_rest,
        positional_index_write,
    )
    from pyspark_airflow_weather_etl_spark.session import get_spark
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("phrase-strategy-probe")
    docs = load_table(spark, sf_dir, "documents")
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    rep = spark.range(args.factor).select(F.col("id").alias("__rep"))
    big = (
        docs.crossJoin(F.broadcast(rep))
        .withColumn("doc_id", F.col("doc_id") + F.col("__rep") * shift)
        .drop("__rep")
    )
    tmp = tempfile.mkdtemp(prefix="phrase_strategy_")
    big.write.parquet(f"{tmp}/docs")
    positional_index_write(spark.read.parquet(f"{tmp}/docs"), f"{tmp}/index")

    sizes = [int(x) for x in args.sizes.split(",")]
    # DISTINCT phrases, mined from the corpus (top bigrams by count,
    # deterministic order) — duplicated query strings would make both
    # strategies scale with the duplication factor, not the workload
    # the index tokenizes by single-space split (operators.text.tokens)
    # — mine bigrams with the SAME tokenization so phrases match
    toks = docs.select(F.split(F.col("text"), " ").alias("t"))
    bigrams = (
        toks.select(
            F.explode(
                F.expr(
                    "filter(zip_with(t, slice(t, 2, size(t)),"
                    " (a, b) -> concat_ws(' ', a, b)),"
                    " s -> instr(s, ' ') > 1)"
                )
            ).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "bg")
        .limit(max(sizes))
        .collect()
    )
    base = [r.bg for r in bigrams]
    if len(base) < max(sizes):
        # not enough distinct grams at this corpus: disambiguate by id
        base = base + [
            base[i % len(base)] for i in range(max(sizes) - len(base))
        ]
    for size in sizes:
        queries = [(i, base[i]) for i in range(min(size, len(base)))]
        samples = {"loop": [], "set": []}
        answers = {}
        for _ in range(args.runs):
            for strat in ("loop", "set"):
                t0 = time.monotonic()
                r = sorted(map(tuple, phrase_match_at_rest(
                    spark, f"{tmp}/index", queries, strategy=strat
                ).collect()))
                samples[strat].append(time.monotonic() - t0)
                answers.setdefault(strat, r)
        assert answers["loop"] == answers["set"], f"diverged at size {size}"
        for strat in ("loop", "set"):
            med = sorted(samples[strat])[len(samples[strat]) // 2]
            print(json.dumps({
                "n_queries": size, "strategy": strat,
                "sec": round(med, 3),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
