"""Corpus governance: takedown by content fingerprint, eval-set
decontamination by token n-gram overlap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.governance import (
    apply_takedown,
    decontaminate,
)


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
