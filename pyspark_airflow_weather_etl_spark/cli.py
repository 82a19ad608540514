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
        "--near-dup-threshold", type=float, default=None,
        help="enable MinHash fuzzy dedup at this Jaccard threshold",
    )
    p_cur.add_argument(
        "--score-col", default=None,
        help="quality-score column for prune/budget stages "
        "(default: n_chars if present, else derived length(text))",
    )
    p_cur.add_argument(
        "--dsir-target", default=None,
        help="target-corpus parquet: enable DSIR importance "
        "resampling toward this distribution",
    )
    p_cur.add_argument(
        "--dsir-keep-tenths", type=int, default=5,
        help="DSIR keeps N/10 of the pool (default 5)",
    )
    p_cur.add_argument(
        "--dsir-gumbel-seed", type=int, default=None,
        help="Gumbel-resample instead of hard top-fraction",
    )
    p_cur.add_argument(
        "--benchmark", default=None,
        help="eval-suite parquet: drop docs whose distinct n-gram "
        "overlap with the suite exceeds --decontam-tenths/10",
    )
    p_cur.add_argument("--decontam-tenths", type=int, default=1)
    p_cur.add_argument("--decontam-n", type=int, default=5)
    p_cur.add_argument(
        "--gopher", action="store_true",
        help="open with the Gopher rule gate (published defaults)",
    )
    p_cur.add_argument(
        "--gopher-min-stopwords", type=int, default=2,
        help="stopword tripwire threshold for --gopher",
    )
    p_cur.add_argument(
        "--classifier-artifact", default=None,
        help="trained quality-classifier artifact dir (classify "
        "train): enable the learned gate after the rule stages",
    )
    p_cur.add_argument(
        "--classifier-min-score", type=float, default=None,
        help="hard score threshold for the learned gate (default: "
        "GPT-3 Pareto lottery)",
    )
    p_cur.add_argument(
        "--classifier-alpha", type=int, default=9,
        help="Pareto alpha for the learned-gate lottery",
    )
    p_cur.add_argument(
        "--drop-ppl-tail", action="store_true",
        help="CCNet perplexity gate: drop the worst surprisal third "
        "of the surviving pool (corpus-LM ranking)",
    )
    p_cur.add_argument(
        "--split-keep", default=None,
        help="curate only this hash-assigned split (e.g. train); "
        "validation/test stay held out by hash",
    )
    p_cur.add_argument(
        "--split-pcts", default="train:98,validation:1,test:1",
        help="ordered name:percent list summing to 100",
    )
    p_cur.add_argument(
        "--split-salt", default="split-v1",
        help="salt for the split hash (version the holdout)",
    )

    p_cls = sub.add_parser(
        "classify",
        help="train a quality-classifier artifact, or score documents",
    )
    p_cls.add_argument(
        "action", choices=["train", "score"],
        help="train: labeled corpus -> artifact; score: corpus + "
        "artifact -> scores (+ Pareto keep verdicts)",
    )
    p_cls.add_argument("--input", required=True, help="documents parquet")
    p_cls.add_argument("--artifact", required=True, help="artifact path")
    p_cls.add_argument("--out", help="score output parquet (score only)")
    p_cls.add_argument("--text-col", default="text")
    p_cls.add_argument("--id-col", default="doc_id")
    p_cls.add_argument(
        "--label-col", default="y",
        help="train: 0/1 label column in --input",
    )
    p_cls.add_argument("--dim", type=int, default=64)
    p_cls.add_argument("--iters", type=int, default=40)
    p_cls.add_argument("--lr", type=float, default=6.0)
    p_cls.add_argument("--alpha", type=int, default=9)

    p_mnt = sub.add_parser(
        "maintain",
        help="table maintenance: seal batch-keyed raw stores, compact "
        "small files, verify a shard epoch",
    )
    p_mnt.add_argument(
        "action",
        choices=[
            "seal", "compact", "verify-epoch", "compact-index", "sq8-drift",
        ],
    )
    p_mnt.add_argument("--path", required=True, help="store/table root")
    p_mnt.add_argument(
        "--keep-last", type=int, default=1,
        help="seal: protect the N highest batch ids (1 = safe while "
        "the stream is paused between triggers; 0 = quiesced full seal)",
    )
    p_mnt.add_argument(
        "--bucket-col", default="kb",
        help="seal: hive bucket column of the store (e.g. kb, "
        "ivf_cell); ignored for flat stores",
    )
    p_mnt.add_argument(
        "--target-file-mb", type=int, default=128,
        help="seal/compact: output file sizing",
    )
    p_mnt.add_argument(
        "--partition-cols", default="",
        help="compact: comma-separated hive partition columns",
    )
    p_mnt.add_argument(
        "--id-col", default="doc_id", help="verify-epoch: id column"
    )
    p_mnt.add_argument(
        "--dst", help="compact-index: published-versions root"
    )
    p_mnt.add_argument(
        "--kind", choices=["bm25", "positional", "sq8", "ivf", "srp"],
        default="bm25",
        help="compact-index: which index family --path holds",
    )
    p_mnt.add_argument(
        "--forward-index", action="store_true",
        help="compact-index (bm25): also fold the docterms tree",
    )
    p_mnt.add_argument(
        "--repair", choices=["auto", "always", "never"], default="auto",
        help="compact-index (bm25): fold re-delivered doc_ids "
        "latest-batch-wins and recompute statistics (auto: exactly "
        "when the append manifest reports possible overlap)",
    )
    p_mnt.add_argument(
        "--when-worth-it", action="store_true",
        help="compact-index: run the measured cost model (linear "
        "per-delta probe tax vs one-time rewrite) and compact only "
        "if probe savings before the next maintenance window exceed "
        "the rewrite cost",
    )
    p_mnt.add_argument(
        "--per-delta-sec", type=float, default=0.078,
        help="compact-index: measured probe overhead per extra delta "
        "(default: BENCH_r11 16-delta pair slope)",
    )
    p_mnt.add_argument(
        "--expected-probes", type=int, default=10,
        help="compact-index: probes expected before the next "
        "maintenance window",
    )
    p_mnt.add_argument(
        "--rewrite-floor-sec", type=float, default=2.0,
        help="compact-index: publish_version fixed rewrite cost",
    )
    p_mnt.add_argument(
        "--rewrite-mb-per-sec", type=float, default=50.0,
        help="compact-index: assumed rewrite throughput",
    )
    p_mnt.add_argument(
        "--refit-threshold", type=float, default=0.02,
        help="sq8-drift: live clamped-value fraction above which a "
        "re-fit is recommended",
    )
    p_mnt.add_argument(
        "--refit", action="store_true",
        help="sq8-drift: if the report recommends it, re-fit the "
        "quantizer over the at-rest vectors and publish the rebuilt "
        "index under --dst",
    )
    p_mnt.add_argument(
        "--live", choices=["full", "sample", "off"], default="sample",
        help="sq8-drift: live-estimate mode — exact recount (opt-in; "
        "full index scan), seeded sample (default; estimator stderr "
        "= sqrt(p(1-p)/n_sampled_values), ~4e-5 at 1%% of a 1e9-value "
        "index vs the 0.02 threshold), or decide from the per-batch "
        "drift log alone",
    )
    p_mnt.add_argument(
        "--sample-fraction", type=float, default=0.01,
        help="sq8-drift: row fraction for --live sample",
    )
    p_mnt.add_argument(
        "--backfill", action="store_true",
        help="sq8-drift: first synthesize the per-batch drift log "
        "from the at-rest tree (idempotent; for indexes written "
        "before the log existed)",
    )

    p_tok = sub.add_parser(
        "tokenize",
        help="train a tokenizer artifact, or encode documents with one",
    )
    p_tok.add_argument(
        "action", choices=["train", "encode"],
        help="train: corpus -> artifact; encode: corpus + artifact -> ids",
    )
    p_tok.add_argument("--input", required=True, help="documents parquet")
    p_tok.add_argument("--artifact", required=True, help="artifact path")
    p_tok.add_argument(
        "--family", choices=["bpe", "unigram", "unigram-em"], default="bpe"
    )
    p_tok.add_argument("--out", help="encode output parquet (encode only)")
    p_tok.add_argument("--text-col", default="text")
    p_tok.add_argument("--id-col", default="doc_id")
    p_tok.add_argument("--num-merges", type=int, default=1024)
    p_tok.add_argument("--vocab-size", type=int, default=8192)
    p_tok.add_argument(
        "--max-seed", type=int, default=None,
        help="unigram seed-inventory cap (default: 4x --vocab-size, so "
        "the requested vocab size is always reachable)",
    )
    p_tok.add_argument(
        "--min-freq", type=int, default=2,
        help="unigram: drop seed pieces rarer than this",
    )
    p_tok.add_argument("--max-piece-len", type=int, default=8)
    p_tok.add_argument("--em-iters", type=int, default=3)

    p_idx = sub.add_parser(
        "index",
        help="build or append to the BM25 postings index",
    )
    p_idx.add_argument("--input", required=True, help="documents parquet")
    p_idx.add_argument("--index", required=True, help="index directory")
    p_idx.add_argument(
        "--batch-id", type=int, default=0,
        help="append batch id (same id replays idempotently)",
    )
    p_idx.add_argument("--text-col", default="text")
    p_idx.add_argument("--id-col", default="doc_id")

    p_srch = sub.add_parser(
        "search",
        help="BM25 top-k against an index built with `index`",
    )
    p_srch.add_argument("--index", required=True, help="index directory")
    p_srch.add_argument(
        "--query", required=True, action="append",
        help="query string (repeatable; query_id = position)",
    )
    p_srch.add_argument("--k", type=int, default=10)

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

            classifier_model = None
            if args.classifier_artifact:
                from .operators.classifier import load_classifier

                classifier_model = load_classifier(
                    spark, args.classifier_artifact
                )
            counts = curate_corpus(
                spark.read.parquet(args.input),
                args.out,
                per_source_cap=args.per_source_cap,
                budget_numer=args.budget_tenths,
                budget_denom=10,
                seed=args.seed,
                shard_rows=args.shard_rows,
                score_col=args.score_col,
                near_dup_threshold=args.near_dup_threshold,
                dsir_target=(
                    spark.read.parquet(args.dsir_target)
                    if args.dsir_target
                    else None
                ),
                dsir_keep_numer=args.dsir_keep_tenths,
                dsir_keep_denom=10,
                dsir_gumbel_seed=args.dsir_gumbel_seed,
                benchmark_df=(
                    spark.read.parquet(args.benchmark)
                    if args.benchmark
                    else None
                ),
                decontam_frac_numer=args.decontam_tenths,
                decontam_frac_denom=10,
                decontam_n=args.decontam_n,
                gopher_rules=(
                    {"min_stopwords": args.gopher_min_stopwords}
                    if args.gopher
                    else None
                ),
                classifier_model=classifier_model,
                classifier_min_score=args.classifier_min_score,
                classifier_pareto_alpha=args.classifier_alpha,
                ppl_drop_bucket=(
                    "tail" if args.drop_ppl_tail else None
                ),
                split_keep=args.split_keep,
                split_pcts=(
                    [
                        (n, int(p))
                        for n, p in (
                            kv.split(":") for kv in args.split_pcts.split(",")
                        )
                    ]
                    if args.split_keep
                    else None
                ),
                split_salt=args.split_salt,
            )
            for stage, n in counts.items():
                print(f"{stage}: {n}")
        elif args.cmd == "classify":
            from .operators import classifier as CL

            docs = spark.read.parquet(args.input)
            if args.text_col not in docs.columns:
                print(
                    f"input has no column {args.text_col!r}; columns: "
                    f"{docs.columns}",
                    file=sys.stderr,
                )
                return 2
            if args.action == "train":
                if args.label_col not in docs.columns:
                    print(
                        f"train needs label column {args.label_col!r};"
                        f" columns: {docs.columns}",
                        file=sys.stderr,
                    )
                    return 2
                model = CL.train_quality_classifier(
                    docs,
                    args.label_col,
                    id_col=args.id_col,
                    text_col=args.text_col,
                    dim=args.dim,
                    iters=args.iters,
                    lr=args.lr,
                )
                CL.save_classifier(spark, model, args.artifact)
                print(
                    f"classifier: dim={model['dim']} bias="
                    f"{model['bias']:.6f} -> {args.artifact}"
                )
            else:
                if not args.out:
                    print("score requires --out", file=sys.stderr)
                    return 2
                model = CL.load_classifier(spark, args.artifact)
                scored = CL.pareto_flags(
                    CL.score_quality_classifier(
                        docs, model, args.id_col, args.text_col
                    ),
                    args.id_col,
                    alpha=args.alpha,
                )
                scored.write.mode("overwrite").parquet(args.out)
                print(f"scored -> {args.out}")
        elif args.cmd == "maintain":
            if args.action == "seal":
                from .sources.rawstore import seal_batches

                st = seal_batches(
                    spark,
                    args.path,
                    keep_last=args.keep_last,
                    target_file_bytes=args.target_file_mb * 1024 * 1024,
                    bucket_col=args.bucket_col or None,
                )
                for k, v in st.items():
                    print(f"{k}: {v}")
            elif args.action == "compact":
                from .operators.scale import compact_table

                cols = tuple(
                    c for c in args.partition_cols.split(",") if c
                )
                before, after = compact_table(
                    spark,
                    args.path,
                    partition_cols=cols,
                    target_file_bytes=args.target_file_mb * 1024 * 1024,
                )
                print(f"files: {before} -> {after}")
            elif args.action == "sq8-drift":
                from .operators.similarity import (
                    sq8_drift_backfill,
                    sq8_drift_report,
                    sq8_index_refit,
                )

                if args.backfill:
                    n = sq8_drift_backfill(spark, args.path)
                    print(f"drift log backfilled: {n} batch rows")
                report = sq8_drift_report(
                    spark,
                    args.path,
                    refit_threshold=args.refit_threshold,
                    live=args.live,
                    sample_fraction=args.sample_fraction,
                )
                for k, v in report.items():
                    print(f"{k}: {v}")
                if args.refit and report["refit_recommended"]:
                    if not args.dst:
                        print("--refit requires --dst", file=sys.stderr)
                        return 2
                    v = sq8_index_refit(spark, args.path, args.dst)
                    print(f"refit published: {v}")
            elif args.action == "compact-index":
                from .operators.retrieval import (
                    bm25_index_compact,
                    compaction_cost_model,
                    positional_index_compact,
                )

                if not args.dst:
                    print("compact-index requires --dst", file=sys.stderr)
                    return 2
                model = compaction_cost_model(
                    spark,
                    args.path,
                    kind=args.kind,
                    per_delta_sec=args.per_delta_sec,
                    expected_probes=args.expected_probes,
                    rewrite_floor_sec=args.rewrite_floor_sec,
                    rewrite_mb_per_sec=args.rewrite_mb_per_sec,
                )
                for k, v in model.items():
                    print(f"{k}: {v}")
                if args.when_worth_it and not model["worth_it"]:
                    print(
                        "declined: expected probe savings "
                        f"({model['probe_savings_sec']}s) do not cover "
                        f"the rewrite ({model['rewrite_cost_sec']}s)"
                    )
                    return 0
                if args.kind == "bm25":
                    v = bm25_index_compact(
                        spark, args.path, args.dst,
                        forward_index=args.forward_index,
                        repair=args.repair,
                    )
                elif args.kind == "sq8":
                    from .operators.similarity import sq8_index_compact

                    v = sq8_index_compact(spark, args.path, args.dst)
                elif args.kind == "ivf":
                    from .operators.similarity import ivf_index_compact

                    v = ivf_index_compact(spark, args.path, args.dst)
                elif args.kind == "srp":
                    from .operators.similarity import srp_index_compact

                    v = srp_index_compact(spark, args.path, args.dst)
                else:
                    v = positional_index_compact(spark, args.path, args.dst)
                print(f"published: {v}")
            else:
                from .operators.curation import verify_epoch

                bad = verify_epoch(spark, args.path, args.id_col)
                rows = bad.collect()
                if not rows:
                    print("epoch OK")
                else:
                    for r in rows:
                        print(
                            f"shard {r.shard}: stored n={r.stored_n_rows} "
                            f"digest={r.stored_ids_digest} vs actual "
                            f"n={r.actual_n_rows} digest={r.actual_ids_digest}"
                        )
                    return 1
        elif args.cmd == "tokenize":
            docs = spark.read.parquet(args.input)
            if args.text_col not in docs.columns:
                print(
                    f"input has no column {args.text_col!r}; columns: "
                    f"{docs.columns}",
                    file=sys.stderr,
                )
                return 2
            if args.action == "train":
                if args.family == "bpe":
                    from .operators import bpe as B

                    merges = B.bpe_train(
                        docs, args.text_col, num_merges=args.num_merges
                    )
                    B.bpe_save_merges(spark, merges, args.artifact)
                    print(f"bpe: {len(merges)} merges -> {args.artifact}")
                else:
                    from .operators import unigram as U

                    train = (
                        U.unigram_train_em
                        if args.family == "unigram-em"
                        else U.unigram_train
                    )
                    max_seed = (
                        args.max_seed
                        if args.max_seed is not None
                        else max(4 * args.vocab_size, 200)
                    )
                    counts = train(
                        docs,
                        args.text_col,
                        max_piece_len=args.max_piece_len,
                        vocab_size=args.vocab_size,
                        min_freq=args.min_freq,
                        max_seed=max_seed,
                        em_iters=args.em_iters,
                    )
                    U.unigram_save_vocab(spark, counts, args.artifact)
                    print(
                        f"{args.family}: {len(counts)} pieces -> "
                        f"{args.artifact}"
                    )
            else:
                if not args.out:
                    print("encode requires --out", file=sys.stderr)
                    return 2
                if args.family == "bpe":
                    from .operators import bpe as B

                    enc = B.bpe_encode(
                        docs,
                        B.bpe_load_merges(spark, args.artifact),
                        args.id_col,
                        args.text_col,
                    )
                else:
                    from .operators import unigram as U

                    enc = U.unigram_encode(
                        docs,
                        U.unigram_load_vocab(spark, args.artifact),
                        max_piece_len=args.max_piece_len,
                        id_col=args.id_col,
                        text_col=args.text_col,
                    )
                enc.write.mode("overwrite").parquet(args.out)
                print(f"encoded -> {args.out}")
        elif args.cmd == "index":
            from .operators.retrieval import bm25_index_append

            bm25_index_append(
                spark.read.parquet(args.input),
                args.index,
                batch_id=args.batch_id,
                id_col=args.id_col,
                text_col=args.text_col,
            )
            print(f"indexed batch {args.batch_id} -> {args.index}")
        elif args.cmd == "search":
            from .operators.retrieval import bm25_topk_at_rest

            queries = [(i + 1, q) for i, q in enumerate(args.query)]
            bm25_topk_at_rest(spark, args.index, queries, k=args.k).show(
                args.k * len(queries), truncate=False
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
