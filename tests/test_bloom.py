"""Portable Bloom-filter membership (operators.bloom): the no-false-
negative guarantee, bounded false positives, result-equality of the
pre-filtered path with the plain exact join, artifact round-trip,
null-key safety, and the map-side plan shape the 100 TB story rests
on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators import bloom as B
from pyspark_airflow_weather_etl_spark.operators.governance import (
    ngram_phrases,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _split(spark):
    docs = _docs(spark)
    return (
        docs.where(F.col("doc_id") % 13 != 0),
        docs.where(F.col("doc_id") % 13 == 0),
    )


def _filter_over(spark, keys: list[str], bits_per_key=16, k=4):
    m_bits = B.sized_m_bits(len(keys), bits_per_key)
    df = spark.createDataFrame([(s,) for s in keys], "k string")
    words = B.bloom_collect(B.bloom_build(df, "k", m_bits, k), m_bits)
    return words, m_bits, k


def test_no_false_negatives(spark):
    """The Bloom guarantee: every inserted key flags maybe=True."""
    keys = [f"key-{i}" for i in range(500)]
    words, m_bits, k = _filter_over(spark, keys)
    df = spark.createDataFrame([(s,) for s in keys], "k string")
    flagged = B.with_bloom_flag(df, words, "k", m_bits, k)
    assert flagged.where(~F.col("maybe_member")).count() == 0


def test_false_positive_rate_bounded(spark):
    """Disjoint probe keys: measured fp rate stays within ~4x the
    analytic (1-e^(-k n/m))^k ≈ 0.24 % at 16 bits/key, k=4 (the 4x
    slack covers small-sample noise at 2000 probes)."""
    keys = [f"key-{i}" for i in range(500)]
    words, m_bits, k = _filter_over(spark, keys)
    probes = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], "k string"
    )
    fp = (
        B.with_bloom_flag(probes, words, "k", m_bits, k)
        .where("maybe_member")
        .count()
    )
    analytic = (1 - math.exp(-k * 500 / m_bits)) ** k
    assert fp / 2000 <= max(4 * analytic, 0.01), (fp, analytic)


def test_null_key_flags_false(spark):
    """NULL keys must flag False (never reach element_at with a null
    index — the engine's documented ANSI codegen anomaly)."""
    keys = ["a", "b"]
    words, m_bits, k = _filter_over(spark, keys)
    df = spark.createDataFrame([("a",), (None,)], "k string")
    got = {
        r["k"]: r["maybe_member"]
        for r in B.with_bloom_flag(df, words, "k", m_bits, k).collect()
    }
    assert got["a"] is True
    assert got[None] is False


def test_save_load_round_trip(spark, tmp_path):
    keys = [f"key-{i}" for i in range(100)]
    words, m_bits, k = _filter_over(spark, keys)
    path = str(tmp_path / "bloom")
    B.bloom_save(spark, words, m_bits, k, path)
    words2, m2, k2 = B.bloom_load(spark, path)
    assert (words2, m2, k2) == (words, m_bits, k)


def test_prefiltered_equals_plain_exact_join(spark):
    """decontaminate_bloom == the sketch-free any-hit anti-join: the
    exact verify removes every false positive, so the filter changes
    the plan and not the answer."""
    pool, bench = _split(spark)
    kept = B.decontaminate_bloom(pool, bench)
    bfp = (
        bench.select(F.explode(ngram_phrases("text", 5)).alias("g"))
        .select(F.md5("g").alias("fp"))
        .distinct()
    )
    contaminated = (
        pool.select("doc_id", F.explode(ngram_phrases("text", 5)).alias("g"))
        .select("doc_id", F.md5("g").alias("fp"))
        .join(bfp, "fp", "semi")
        .select("doc_id")
        .distinct()
    )
    plain = pool.select("doc_id").join(contaminated, "doc_id", "anti")
    got = {r["doc_id"] for r in kept.collect()}
    want = {r["doc_id"] for r in plain.collect()}
    assert got == want
    assert len(want) < pool.count()  # the fixture really drops docs
    # audit columns: kept docs have zero verified hits by construction
    assert kept.where(F.col("n_hits") != 0).count() == 0


def test_maybe_counts_dominate_true_hits(spark):
    """Sketch-level sanity on the fixture: n_maybe >= true verified
    hits per doc (no false negatives), and the fp excess across the
    corpus is a small fraction of all grams."""
    pool, bench = _split(spark)
    maybe = B.ngram_bloom_counts(pool, bench)
    bfp = (
        bench.select(F.explode(ngram_phrases("text", 5)).alias("g"))
        .select(F.md5("g").alias("fp"))
        .distinct()
    )
    true_hits = (
        pool.select("doc_id", F.explode(ngram_phrases("text", 5)).alias("g"))
        .select("doc_id", F.md5("g").alias("fp"))
        .join(bfp, "fp", "semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
    )
    j = maybe.join(true_hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        "n_maybe",
        F.coalesce("n_true", F.lit(0)).alias("n_true"),
    )
    rows = j.collect()
    assert all(r["n_maybe"] >= r["n_true"] for r in rows)
    total_grams = sum(r["n_grams"] for r in rows)
    fp_excess = sum(r["n_maybe"] - r["n_true"] for r in rows)
    assert fp_excess / max(total_grams, 1) < 0.02


def test_probe_is_map_side(spark):
    """The scale claim, pinned on the physical plan: flagging a
    corpus-sized gram table against the filter introduces NO shuffle
    — the only join is the broadcast of the one-row word array.
    (Everything below the bloom filter runs inside the scan stage.)"""
    pool, bench = _split(spark)
    bfp = (
        bench.select(F.explode(ngram_phrases("text", 5)).alias("g"))
        .select(F.md5("g").alias("fp"))
        .distinct()
    )
    n = bfp.count()
    m_bits = B.sized_m_bits(n)
    words = B.bloom_collect(B.bloom_build(bfp, "fp", m_bits, 4), m_bits)
    grams = pool.select(
        "doc_id", F.explode(ngram_phrases("text", 5)).alias("g")
    ).select("doc_id", F.md5("g").alias("fp"))
    flagged = B.with_bloom_flag(grams, words, "fp", m_bits, 4)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


@pytest.mark.parametrize("bits_per_key", [8, 16, 32])
def test_sizing_formula(bits_per_key):
    for n in [1, 2, 31, 32, 33, 1000]:
        m = B.sized_m_bits(n, bits_per_key)
        assert m % 32 == 0
        assert m >= bits_per_key * n
        assert m < bits_per_key * n + 32
