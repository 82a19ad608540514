"""CLI entry points — the reference's per-stage spark-submit scripts
(/root/reference/spark_jobs/silver_openmeteo.py:5-10 argparse
pattern) folded into one parameterized command.

    python -m pyspark_airflow_weather_etl_spark.cli backfill \
        --bronze data/bronze --silver data/silver --gold data/gold \
        --start 2024-03-01 --end 2024-03-10

    python -m pyspark_airflow_weather_etl_spark.cli query \
        --name q1_pricing_summary --sf-dir /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import sys
from datetime import date

from .pipeline import WeatherPipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pyspark-analytics-engine")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_back = sub.add_parser("backfill", help="bronze→silver→gold for a date range")
    p_back.add_argument("--bronze", required=True)
    p_back.add_argument("--silver", required=True)
    p_back.add_argument("--gold", required=True)
    p_back.add_argument("--start", required=True, type=date.fromisoformat)
    p_back.add_argument("--end", required=True, type=date.fromisoformat)

    p_query = sub.add_parser("query", help="run one catalog query")
    p_query.add_argument("--name", required=True)
    p_query.add_argument("--sf-dir", required=True)
    p_query.add_argument("--limit", type=int, default=20)

    p_list = sub.add_parser("list", help="list catalog queries")

    p_cur = sub.add_parser(
        "curate",
        help="dedup→decontaminate→prune→cap→budget→shuffle→shards release",
    )
    p_cur.add_argument("--input", required=True, help="documents parquet")
    p_cur.add_argument("--out", required=True, help="shard output dir")
    p_cur.add_argument("--per-source-cap", type=int, default=None)
    p_cur.add_argument(
        "--budget-tenths", type=int, default=None,
        help="keep best docs up to N/10 of corpus tokens",
    )
    p_cur.add_argument("--seed", type=int, default=42, help="epoch seed")
    p_cur.add_argument("--shard-rows", type=int, default=1024)
    p_cur.add_argument(
        "--score-col", default=None,
        help="quality-score column for prune/budget stages "
        "(default: n_chars if present, else derived length(text))",
    )

    args = parser.parse_args(argv)

    if args.cmd == "list":
        from .plans import REGISTRY

        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name}  [{kind}]  {q.doc.splitlines()[0] if q.doc else ''}")
        return 0

    spark = get_spark(app_name=f"engine-{args.cmd}")
    try:
        if args.cmd == "backfill":
            pipe = WeatherPipeline(
                spark,
                bronze_path=args.bronze,
                silver_path=args.silver,
                gold_path=args.gold,
            )
            gold = pipe.backfill(args.start, args.end)
            print(f"gold rows written: {gold.count()}")
        elif args.cmd == "query":
            from .plans import REGISTRY

            if args.name not in REGISTRY:
                print(f"unknown query {args.name!r}; try `list`", file=sys.stderr)
                return 2
            REGISTRY[args.name].fn(spark, args.sf_dir).show(
                args.limit, truncate=False
            )
        elif args.cmd == "curate":
            from .operators.curation import curate_corpus

            counts = curate_corpus(
                spark.read.parquet(args.input),
                args.out,
                per_source_cap=args.per_source_cap,
                budget_numer=args.budget_tenths,
                budget_denom=10,
                seed=args.seed,
                shard_rows=args.shard_rows,
                score_col=args.score_col,
            )
            for stage, n in counts.items():
                print(f"{stage}: {n}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
