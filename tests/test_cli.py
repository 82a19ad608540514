"""CLI surface (cli.main): the subcommands a user actually types,
driven in-process against tmp fixtures — pins argument wiring and
exit codes so a flag rename can't silently strand the documented
commands."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.cli import main

from conftest import SF_DIR


class _NoStop:
    """Delegating session proxy whose stop() is a no-op — cli.main
    stops its session on exit, and in-process tests must not take the
    suite's shared SparkSession down with it."""

    def __init__(self, s):
        self._s = s

    def __getattr__(self, name):
        return getattr(self._s, name)

    def stop(self):
        pass


@pytest.fixture(autouse=True)
def _cli_shares_suite_session(spark, monkeypatch):
    import pyspark_airflow_weather_etl_spark.cli as cli_mod

    monkeypatch.setattr(
        cli_mod, "get_spark", lambda **kw: _NoStop(spark)
    )


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    p = str(tmp_path / "docs")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80).write.parquet(
        p
    )
    return p


def test_curate_cli_with_gopher_and_dsir(spark, tmp_path, docs_parquet, capsys):
    target = str(tmp_path / "target")
    spark.read.parquet(docs_parquet).limit(20).select(
        "doc_id", "text"
    ).write.parquet(target)
    out = str(tmp_path / "rel")
    rc = main([
        "curate", "--input", docs_parquet, "--out", out,
        "--shard-rows", "32",
        "--gopher", "--gopher-min-stopwords", "1",
        "--dsir-target", target, "--dsir-keep-tenths", "5",
        "--drop-ppl-tail",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "after_gopher_rules:" in printed and "after_dsir:" in printed
    assert "after_perplexity_filter:" in printed
    assert spark.read.parquet(out).count() > 0


def test_maintain_seal_and_verify_epoch(spark, tmp_path, docs_parquet, capsys):
    # batch-keyed store
    store = str(tmp_path / "store")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    for b in range(3):
        (
            spark.range(b * 10, b * 10 + 10)
            .select(
                F.col("id"),
                (F.col("id") % 2).cast("int").alias("kb"),
                F.lit(b).alias("batch"),
            )
            .write.mode("overwrite")
            .partitionBy("kb", "batch")
            .parquet(store)
        )
    rc = main(["maintain", "seal", "--path", store, "--keep-last", "1"])
    assert rc == 0
    assert "sealed_now: [0, 1]" in capsys.readouterr().out

    # epoch + manifest, clean then tampered
    from pyspark_airflow_weather_etl_spark.operators.curation import (
        write_shard_manifest,
        write_training_shards,
    )

    epoch = str(tmp_path / "epoch")
    write_training_shards(
        spark.read.parquet(docs_parquet), epoch, "doc_id", shard_rows=16
    )
    write_shard_manifest(spark, epoch, "doc_id")
    assert main(["maintain", "verify-epoch", "--path", epoch]) == 0
    assert "epoch OK" in capsys.readouterr().out
    os.remove(glob.glob(f"{epoch}/shard=1/part-*.parquet")[0])
    assert main(["maintain", "verify-epoch", "--path", epoch]) == 1
    assert "shard 1" in capsys.readouterr().out


def test_tokenize_cli_train_and_encode(spark, tmp_path, docs_parquet, capsys):
    art = str(tmp_path / "bpe_art")
    rc = main([
        "tokenize", "train", "--input", docs_parquet,
        "--artifact", art, "--family", "bpe", "--num-merges", "8",
    ])
    assert rc == 0
    enc = str(tmp_path / "encoded")
    rc = main([
        "tokenize", "encode", "--input", docs_parquet,
        "--artifact", art, "--family", "bpe", "--out", enc,
    ])
    assert rc == 0
    assert spark.read.parquet(enc).count() > 0


def test_query_and_list(capsys):
    assert main(["list"]) == 0
    assert "q1_pricing_summary" in capsys.readouterr().out
    rc = main([
        "query", "--name", "q1_pricing_summary", "--sf-dir", SF_DIR,
        "--limit", "3",
    ])
    assert rc == 0
    assert main(["query", "--name", "no_such_query", "--sf-dir", SF_DIR]) == 2


def test_tokenize_cli_unigram_vocab_size_reachable(
    spark, tmp_path, docs_parquet, monkeypatch
):
    """--vocab-size must actually be reachable: the seed-inventory cap
    defaults to 4x the requested vocab (not a hardcoded 200), and
    --max-seed/--min-freq pass through to the trainer."""
    import pyspark_airflow_weather_etl_spark.operators.unigram as U

    seen = {}

    def fake_train(df, text_col, **kw):
        seen.update(kw)
        return {"a": 10, "b": 5}

    monkeypatch.setattr(U, "unigram_train", fake_train)
    art = str(tmp_path / "uni_art")
    rc = main([
        "tokenize", "train", "--input", docs_parquet,
        "--artifact", art, "--family", "unigram",
        "--vocab-size", "500",
    ])
    assert rc == 0
    assert seen["vocab_size"] == 500
    assert seen["max_seed"] == 2000  # 4x vocab, not the 200 default
    assert seen["min_freq"] == 2
    rc = main([
        "tokenize", "train", "--input", docs_parquet,
        "--artifact", art, "--family", "unigram",
        "--vocab-size", "500", "--max-seed", "777", "--min-freq", "3",
    ])
    assert rc == 0
    assert seen["max_seed"] == 777 and seen["min_freq"] == 3


def test_classify_cli_train_score_and_curate_gate(
    spark, tmp_path, docs_parquet, capsys
):
    """classify train -> artifact; classify score -> verdict parquet;
    curate --classifier-artifact threads the learned gate."""
    labeled = str(tmp_path / "labeled")
    spark.read.parquet(docs_parquet).select(
        "doc_id", "text", (F.col("doc_id") % 2).cast("int").alias("y")
    ).write.parquet(labeled)
    art = str(tmp_path / "clf_art")
    rc = main([
        "classify", "train", "--input", labeled, "--artifact", art,
        "--dim", "16", "--iters", "2",
    ])
    assert rc == 0
    assert "classifier: dim=16" in capsys.readouterr().out
    scored = str(tmp_path / "scored")
    rc = main([
        "classify", "score", "--input", docs_parquet,
        "--artifact", art, "--out", scored,
    ])
    assert rc == 0
    out = spark.read.parquet(scored)
    assert set(out.columns) == {"doc_id", "score", "kept"}
    assert out.count() == spark.read.parquet(docs_parquet).count()
    rel = str(tmp_path / "rel")
    rc = main([
        "curate", "--input", docs_parquet, "--out", rel,
        "--shard-rows", "32", "--classifier-artifact", art,
        "--classifier-min-score", "0.0",
    ])
    assert rc == 0
    assert "after_classifier:" in capsys.readouterr().out


def test_curate_cli_split_holdout(spark, tmp_path, docs_parquet, capsys):
    out = str(tmp_path / "rel_split")
    rc = main([
        "curate", "--input", docs_parquet, "--out", out,
        "--shard-rows", "32", "--split-keep", "train",
        "--split-pcts", "train:90,validation:5,test:5",
        "--split-salt", "v2",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "after_split_holdout:" in printed
    n_in = spark.read.parquet(docs_parquet).count()
    assert 0 < spark.read.parquet(out).count() < n_in


def test_index_and_search_cli(spark, tmp_path, docs_parquet, capsys):
    idx = str(tmp_path / "bm25_idx")
    assert main([
        "index", "--input", docs_parquet, "--index", idx,
    ]) == 0
    assert main([
        "search", "--index", idx, "--query", "hash join table", "--k", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "score_micro" in out and "rnk" in out
    # incremental append with a new batch id extends the same index
    assert main([
        "index", "--input", docs_parquet, "--index", idx,
        "--batch-id", "1",
    ]) == 0


def test_maintain_compact_index_when_worth_it(
    spark, tmp_path, docs_parquet, capsys
):
    """The cadence policy: a 16-delta tree's expected probe savings
    cover the rewrite, so --when-worth-it compacts and publishes; a
    2-delta tree declines (nothing published); and the decision flips
    with the knobs (a long probe horizon makes even 2 deltas pay)."""
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_append,
        bm25_index_current,
    )

    docs = spark.read.parquet(docs_parquet)
    deep = str(tmp_path / "deep")
    shallow = str(tmp_path / "shallow")
    for b in range(16):
        bm25_index_append(docs.where(F.col("doc_id") % 16 == b), deep, b)
    for b in range(2):
        bm25_index_append(docs.where(F.col("doc_id") % 2 == b), shallow, b)

    # 16 deltas: compacts (savings 15*0.078*10 = 11.7s > ~2s rewrite)
    rc = main(
        ["maintain", "compact-index", "--path", deep,
         "--dst", str(tmp_path / "deep_dst"), "--when-worth-it"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "worth_it: True" in out and "published: v-" in out
    assert bm25_index_current(spark, str(tmp_path / "deep_dst"))

    # 2 deltas: declines, publishes nothing
    rc = main(
        ["maintain", "compact-index", "--path", shallow,
         "--dst", str(tmp_path / "shallow_dst"), "--when-worth-it"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "worth_it: False" in out and "declined" in out
    assert not (tmp_path / "shallow_dst").exists()

    # same 2-delta tree, 1000-probe horizon: now worth it
    rc = main(
        ["maintain", "compact-index", "--path", shallow,
         "--dst", str(tmp_path / "shallow_dst"), "--when-worth-it",
         "--expected-probes", "1000"]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "published: v-" in out


def test_maintain_compact_index_positional(
    spark, tmp_path, docs_parquet, capsys
):
    """compact-index --kind positional folds phrase-position deltas
    through the same policy and the published version answers phrase
    probes identically to the delta tree."""
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_current,
        phrase_match_at_rest,
        positional_index_append,
    )

    docs = spark.read.parquet(docs_parquet)
    src = str(tmp_path / "pos_src")
    for b in range(3):
        positional_index_append(docs.where(F.col("doc_id") % 3 == b), src, b)
    rc = main(
        ["maintain", "compact-index", "--path", src, "--kind", "positional",
         "--dst", str(tmp_path / "pos_dst")]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "published: v-" in out
    live = bm25_index_current(spark, str(tmp_path / "pos_dst"))
    phrases = [(1, "the quick"), (2, "brown fox")]
    assert sorted(
        map(tuple, phrase_match_at_rest(spark, live, phrases).collect())
    ) == sorted(
        map(tuple, phrase_match_at_rest(spark, src, phrases).collect())
    )


def test_maintain_compact_index_srp(spark, tmp_path, capsys):
    """compact-index --kind srp folds an SRP lifecycle delta tree
    through the same policy and the published version answers probes
    identically to the delta tree (round 15 — the last index family
    to join the CLI's compaction surface)."""
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        bm25_index_current,
    )
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        srp_index_append,
        srp_index_topk,
    )
    from pyspark_airflow_weather_etl_spark.sources.tables import load_table

    emb = load_table(spark, SF_DIR, "embeddings").where(
        F.col("vec_id") < 200
    )
    src = str(tmp_path / "srp_src")
    srp_index_append(emb.where(F.col("vec_id") % 2 == 0), src, 0)
    srp_index_append(emb.where(F.col("vec_id") % 2 == 1), src, 1)
    rc = main(
        ["maintain", "compact-index", "--path", src, "--kind", "srp",
         "--dst", str(tmp_path / "srp_dst")]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "published: v-" in out
    live = bm25_index_current(spark, str(tmp_path / "srp_dst"))
    q = [
        float(x)
        for x in emb.where(F.col("vec_id") == 7).first()["embedding"]
    ]
    assert sorted(
        map(tuple, srp_index_topk(spark, live, q, k=10).collect())
    ) == sorted(map(tuple, srp_index_topk(spark, src, q, k=10).collect()))
