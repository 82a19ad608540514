"""Corpus governance: takedown by content fingerprint, eval-set
decontamination by token n-gram overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.governance import (
    apply_takedown,
    decontaminate,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_takedown_removes_content_duplicates_too(spark):
    """A byte-identical copy of a taken-down text under ANOTHER id
    must be removed as well — takedown keys on content, not ids."""
    docs = _docs(
        spark,
        [
            (0, "remove me please"),
            (1, "keep me around"),
            (2, "remove me please"),  # copy of doc 0, different id
            (3, "also kept"),
        ],
    )
    blocklist = spark.createDataFrame([(0,)], "doc_id long")
    kept = sorted(r.doc_id for r in apply_takedown(docs, blocklist).collect())
    assert kept == [1, 3]  # 0 (listed) and 2 (same content) both gone


def test_takedown_unlisted_corpus_untouched(spark):
    docs = _docs(spark, [(0, "a"), (1, "b")])
    blocklist = spark.createDataFrame([(99,)], "doc_id long")
    assert apply_takedown(docs, blocklist).count() == 2


def test_decontaminate_matches_token_boundaries_only(spark):
    """'quick brown fox' as a token trigram must NOT match a document
    where the words appear non-adjacently or inside other tokens."""
    docs = _docs(
        spark,
        [
            (0, "the quick brown fox jumps"),  # contaminated
            (1, "quick brown foxes are here"),  # 'foxes' != 'fox'
            (2, "quick and brown fox"),  # not adjacent
            (3, "quick brown fox"),  # exact
        ],
    )
    kept = sorted(
        r.doc_id
        for r in decontaminate(docs, ["quick brown fox"], n=3).collect()
    )
    assert kept == [1, 2]


def test_decontaminate_rejects_wrong_arity_phrase(spark):
    docs = _docs(spark, [(0, "a b c")])
    with pytest.raises(ValueError):
        decontaminate(docs, ["two tokens"], n=3)


def test_stratified_sample_deterministic_and_proportional(spark):
    from pyspark_airflow_weather_etl_spark.operators.governance import (
        stratified_sample,
    )

    docs = spark.range(8000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 2)).alias("source"),
    )
    frac = {"s0": 0.25, "s1": 1.0}
    a = stratified_sample(docs, "source", frac, "doc_id")
    counts = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["s1"] == 4000  # frac 1.0 keeps everything
    assert 800 <= counts["s0"] <= 1200  # ~25% of 4000
    # pure function of the data: same rows under a different partitioning
    b = stratified_sample(docs.repartition(13), "source", frac, "doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )
    # unlisted stratum is dropped
    c = stratified_sample(docs, "source", {"s0": 0.25}, "doc_id")
    assert c.where(F.col("source") == "s1").count() == 0


class TestTemperatureMix:
    """temperature_mix: alpha<1 must upweight small sources, hit the
    overall quota within md5-quantization tolerance, and stay a pure
    function of the data (partitioning-invariant)."""

    def test_upweights_small_sources_and_hits_quota(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            temperature_mix,
        )

        docs = load_table(spark, SF_DIR, "documents")
        total = docs.count()
        base = {
            r["source"]: r["n"]
            for r in docs.groupBy("source").agg(
                F.count("*").alias("n")
            ).collect()
        }
        mixed = temperature_mix(
            docs, "source", "doc_id", alpha=0.5, target_fraction=0.25
        )
        kept = {
            r["source"]: r["n"]
            for r in mixed.groupBy("source").agg(
                F.count("*").alias("n")
            ).collect()
        }
        # overall quota: within quantization + md5-uniformity slack
        total_kept = sum(kept.values())
        assert abs(total_kept - 0.25 * total) / total < 0.05
        # alpha=0.5 upweights: the smallest source keeps a strictly
        # higher fraction than the largest
        smallest = min(base, key=base.get)
        largest = max(base, key=base.get)
        if base[smallest] < base[largest]:  # fixture has size spread
            f_small = kept.get(smallest, 0) / base[smallest]
            f_large = kept.get(largest, 0) / base[largest]
            assert f_small > f_large

    def test_partitioning_invariant(self, spark):
        from pyspark_airflow_weather_etl_spark.operators.governance import (
            temperature_mix,
        )

        docs = load_table(spark, SF_DIR, "documents")
        ids = lambda d: sorted(
            r.doc_id
            for r in temperature_mix(d, "source", "doc_id").select(
                "doc_id"
            ).collect()
        )
        assert ids(docs.repartition(3)) == ids(docs.repartition(17))
