"""Cache-ownership contract (caching.py): operator-internal persists
are group-tracked, bounded across repeated calls, and fully released
by release_cached() — the leak that pressured late-run bench queries
must not regrow."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.caching import release_cached
from pyspark_airflow_weather_etl_spark.operators.dedup import (
    jaccard_pairs,
    minhash_near_duplicates,
    portable_minhash_pairs,
)
from pyspark_airflow_weather_etl_spark.operators.similarity import (
    embedding_near_duplicates_blocked,
)
from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_repeated_calls_do_not_grow_storage(spark):
    release_cached()
    base = _n_persistent(spark)
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)

    for _ in range(3):
        minhash_near_duplicates(docs, "doc_id", "text").count()
        jaccard_pairs(docs, "doc_id", "text", max_df=50).count()
        portable_minhash_pairs(docs, "doc_id", "text").count()
        embedding_near_duplicates_blocked(emb).count()

    # At most ONE invocation's caches per operator group may be live
    # (2 frames each for minhash/jaccard/portable/blocked = 8), no
    # matter how many times the operators ran.
    assert _n_persistent(spark) - base <= 8

    release_cached()
    assert _n_persistent(spark) <= base


def test_result_correct_after_release(spark):
    """Consuming a result after its cache group was released must
    still be correct (lineage recompute), just uncached."""
    docs = load_table(spark, SF_DIR, "documents").limit(100)
    dup = docs.limit(5).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    corpus = docs.unionByName(dup)
    pairs = minhash_near_duplicates(corpus, "doc_id", "text")
    release_cached()  # dropped BEFORE the action
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    expected = {(d, d + 10_000) for d in [r.doc_id for r in docs.limit(5).collect()]}
    assert expected <= got


def test_orphaned_invocation_does_not_leak(spark):
    """If a group is re-claimed while an earlier invocation is still
    building, the earlier invocation's subsequent persists must not
    land in the orphaned list (where nothing would release them) —
    they self-release instead."""
    from pyspark_airflow_weather_etl_spark.caching import (
        claim_group,
        persist_into,
    )

    release_cached()
    base = _n_persistent(spark)

    stale = claim_group("race_probe")      # invocation A starts
    fresh = claim_group("race_probe")      # invocation B re-claims
    df = spark.range(10).toDF("x")
    out = persist_into(stale, df)          # A persists late
    out.count()
    assert stale == []                     # not tracked in orphan list
    assert _n_persistent(spark) == base    # and not left persisted

    # the live list still tracks and releases normally
    df2 = persist_into(fresh, spark.range(5).toDF("y"))
    df2.count()
    assert _n_persistent(spark) == base + 1
    release_cached("race_probe")
    assert _n_persistent(spark) == base
