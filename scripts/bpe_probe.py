"""BPE training-ceiling probe — the reproducible form of BASELINE.md's
round-12 measurement ("512 merges at batch_rounds=64"), now with a
--recount A/B so the incremental pair-frequency maintenance win is a
re-runnable number instead of a one-off note.

The sf0.1 fixture corpus exhausts its mergeable pairs at ~89 merges
(~28 distinct words), so the probe inflates the vocabulary
deterministically: every token gets a 2-hex md5 spelling variant keyed
by doc_id % 50, yielding ~1.4k distinct words whose pair structure
keeps 512 merges busy — the shape where per-round recount cost decides
the 32k-vocab wall time.

Usage:
    python scripts/bpe_probe.py [--merges 512] [--batch 64]
        [--recount incremental|full|both] [--adaptive]
Prints one JSON line per run: mode, merges, seconds, merges/sec, and
the md5 of the learned rule list (both modes must agree).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def inflated_corpus(spark, sf_dir: str):
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    key = (F.col("doc_id") % 50).cast("string")
    toks = F.split(F.col("text"), r"\s+")
    variant = F.transform(
        toks,
        lambda t: F.concat(
            t, F.substring(F.md5(F.concat(t, key)), 1, 2)
        ),
    )
    return docs.select(
        "doc_id", F.concat_ws(" ", variant).alias("text")
    )


_BASES = [
    "ab", "cd", "ef", "gh", "ij", "kl", "mn", "op", "qr", "st", "uv",
    "wx", "yz", "abc", "def", "ghi", "jkl", "mno", "pqr", "stu",
    "vwx", "yza", "bcd", "efg", "hij", "klm", "nop", "qrs",
]


def synthetic_corpus(spark, n_docs: int, words_per_doc: int = 50):
    """A morphology-shaped Zipf corpus: every word is a concatenation
    of 5 'morphemes' drawn from a 28-item base set, indexed by the
    base-28 digits of a log-uniform (Zipf-ish) rank over 28^5 — so
    distinct-word count scales with n_docs (≈2.3M at n_docs=400k),
    word frequencies are heavy-tailed, and SPELLINGS share long
    substrings the way natural text does. That last property is what
    the uniform-hex variant lacks: with skewed bigram statistics,
    late merges touch <1% of distinct words (the deep-training regime
    the incremental recount serves), while early merges touch
    40-100% — both regimes are represented, like a real corpus."""
    import math

    base_arr = F.array(*[F.lit(b) for b in _BASES])
    v = 28 ** 5

    def word(i):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            (F.col("id") / 2).cast("bigint").cast("string"),
                            F.lit("_"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16 ** 8))
        )
        k = F.floor(F.exp(u * F.lit(float(math.log(v))))).cast("bigint") % v
        parts = [
            F.element_at(
                base_arr,
                (((k / (28 ** p)).cast("bigint") % 28) + 1).cast("int"),
            )
            for p in range(5)
        ]
        return F.concat(*parts)

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(F.sequence(F.lit(0), F.lit(words_per_doc - 1)), word),
        ).alias("text"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--recount", default="both",
                    choices=["driver", "incremental", "full", "auto",
                             "both", "all"])
    ap.add_argument("--adaptive", action="store_true")
    ap.add_argument("--synth", type=int, default=0,
                    help="use the synthetic corpus with N docs "
                         "(~25·N distinct words) instead of the "
                         "vocab-inflated fixture corpus")
    args = ap.parse_args()

    from pyspark_airflow_weather_etl_spark.operators.bpe import bpe_train
    from pyspark_airflow_weather_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bpe-probe")
    corpus = (
        synthetic_corpus(spark, args.synth) if args.synth
        else inflated_corpus(spark, sf_dir)
    ).localCheckpoint()
    corpus.count()  # warm: corpus build priced out of both arms
    modes = (
        ["incremental", "full"] if args.recount == "both"
        else ["driver", "incremental", "full"] if args.recount == "all"
        else [args.recount]
    )
    fps = []
    for mode in modes:
        t0 = time.monotonic()
        merges = bpe_train(
            corpus,
            num_merges=args.merges,
            min_freq=2,
            batch_rounds=args.batch,
            adaptive=args.adaptive,
            recount=mode,
        )
        dt = time.monotonic() - t0
        fp = hashlib.md5(
            json.dumps(
                [(m.rank, m.left, m.right, m.freq) for m in merges]
            ).encode()
        ).hexdigest()[:12]
        fps.append(fp)
        print(json.dumps({
            "mode": mode, "merges": len(merges), "sec": round(dt, 1),
            "merges_per_sec": round(len(merges) / dt, 2), "rules_md5": fp,
        }), flush=True)
    if len(set(fps)) > 1:
        print("RULE LISTS DIVERGED", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
