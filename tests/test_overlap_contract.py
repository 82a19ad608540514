"""The duplicate-delivery (overlap) contract, audited family by family
(VERDICT r15 #3): docs/overlap_contract.md declares one strategy per
index lifecycle family — fold latest-wins (sq8/ivf/srp/ivfpq), guard
(bm25), in-plan repair (positional), replace + content-idempotent
kernel (semantic), self-exclusion (minhash). This suite builds a
NON-disjoint tree per family and asserts the declared strategy
actually ENGAGES — the cheapest way to keep the eight-family contract
from drifting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.sources.tables import load_table

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return (
        load_table(spark, SF_DIR, "embeddings")
        .where(F.col("vec_id") < 80)
        .select("vec_id", "embedding")
        .cache()
    )


def _negated(emb, vid):
    return emb.where(F.col("vec_id") == vid).select(
        "vec_id", F.transform("embedding", lambda v: -v).alias("embedding")
    )


def _qvec(emb, vid):
    return [
        float(x)
        for x in emb.where(F.col("vec_id") == vid).first()["embedding"]
    ]


# --- fold families: sq8 / ivf / srp / ivfpq --------------------------------
#
# One uniform probe-semantics check per family: batch 0 delivers ids
# 0..79, batch 1 RE-delivers id 7 negated (overlapping ranges, so the
# manifest cannot prove disjoint). The declared fold must (a) appear
# in the analyzed plan (max_by) and (b) serve the NEWEST row — querying
# with id 7's ORIGINAL vector must find its stored (negated) twin at
# cosine -1 / squared distance > 0, never the stale +1 row.


def _sq8(emb, path):
    from pyspark_airflow_weather_etl_spark.operators import similarity as S

    S.sq8_index_append(emb, path, 0)
    S.sq8_index_append(_negated(emb, 7), path, 1)
    spark = emb.sparkSession
    return S.sq8_topk_at_rest(spark, path, _qvec(emb, 7), k=80)


def _ivf(emb, path):
    from pyspark_airflow_weather_etl_spark.operators import similarity as S

    S.ivf_index_append(emb, path, 0, n_cells=4)
    S.ivf_index_append(_negated(emb, 7), path, 1, n_cells=4)
    spark = emb.sparkSession
    return S.ivf_index_topk(spark, path, _qvec(emb, 7), k=80, nprobe=4)


def _srp(emb, path):
    """SRP needs care the cell families don't: a re-delivery that
    hashes to DIFFERENT buckets is invisible to the pruned probe by
    the documented prune-before-fold contract (the probe serves the
    newest PROBED row). To observe the fold itself, batch 1
    re-delivers id 7 as u' = u + ε·z with ε sized from the planes'
    sign margins so u' PROVABLY shares u's full 32-bit signature
    (asserted) while pointing measurably elsewhere — the new row then
    sits in every probed bucket and the fold must prefer it."""
    import numpy as np

    from pyspark_airflow_weather_etl_spark.operators import similarity as S
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        _hyperplanes,
    )

    spark = emb.sparkSession
    u = np.asarray(_qvec(emb, 7), dtype=np.float64)
    z = np.asarray(_qvec(emb, 11), dtype=np.float64)
    planes = _hyperplanes(64, 32)
    du = planes @ u
    eps = 0.9 * np.abs(du).min() / np.abs(planes @ z).max()
    up = u + eps * z
    assert ((planes @ up >= 0) == (du >= 0)).all()  # same signature
    S.srp_index_append(emb, path, 0)
    redelivered = spark.createDataFrame(
        [(7, [float(x) for x in up])],
        "vec_id bigint, embedding array<float>",
    )
    S.srp_index_append(redelivered, path, 1)
    return S.srp_index_topk(spark, path, _qvec(emb, 7), k=80)


def _ivfpq(emb, path):
    from pyspark_airflow_weather_etl_spark.operators import pq as PQ

    PQ.ivfpq_index_append(emb, path, 0, m=8, n_codes=8, n_cells=4)
    PQ.ivfpq_index_append(_negated(emb, 7), path, 1, m=8, n_codes=8,
                          n_cells=4)
    spark = emb.sparkSession
    return PQ.ivfpq_index_topk(
        spark, path, _qvec(emb, 7), k=80, nprobe=4, rerank=200
    )


@pytest.mark.parametrize(
    "family,build",
    [("sq8", _sq8), ("ivf", _ivf), ("srp", _srp), ("ivfpq", _ivfpq)],
    ids=["sq8", "ivf", "srp", "ivfpq"],
)
def test_fold_families_serve_latest_row(
    spark, emb, tmp_path, family, build
):
    probe = build(emb, str(tmp_path / family))
    plan = probe._jdf.queryExecution().analyzed().toString()
    assert "max_by" in plan, f"{family}: fold not armed on overlap"
    rows = {r[0]: r[1] for r in probe.collect()}
    if 7 not in rows:
        return  # pruned away entirely — stale row equally unservable
    score = float(rows[7])
    if family == "ivfpq":  # l2_d2 of the NEGATED vector vs original
        assert score > 1.0, score
    elif family == "srp":  # cosine of the ε-perturbed twin: < 1, ≈ 1
        assert 0.99 < score < 0.9999995, score
    else:  # cosine of the negated vector vs original
        assert score == pytest.approx(-1.0, abs=1e-5), score


# --- bm25: guard (cannot fold pre-aggregated statistics) -------------------


def test_bm25_guard_engages_on_overlap(spark, tmp_path):
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        OverlappingBatchesError,
        OverlapWarning,
        bm25_index_append,
        bm25_topk_at_rest,
    )

    docs = spark.createDataFrame(
        [(0, "hash join table"), (1, "merge join key"), (2, "scan table")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "bm25")
    bm25_index_append(docs.where(F.col("doc_id") <= 1), path, 0)
    r = bm25_index_append(docs.where(F.col("doc_id") >= 1), path, 1)
    assert r["maybe_overlap"] is True
    queries = [(1, "join")]
    with pytest.warns(OverlapWarning):
        bm25_topk_at_rest(spark, path, queries, k=5).collect()
    with pytest.raises(OverlappingBatchesError):
        bm25_topk_at_rest(
            spark, path, queries, k=5, on_overlap="raise"
        ).collect()


# --- positional/phrase: repair in-plan -------------------------------------


def test_positional_repair_engages_on_duplicate_delivery(spark, tmp_path):
    from pyspark_airflow_weather_etl_spark.operators.retrieval import (
        phrase_counts,
        phrase_match_at_rest,
        positional_index_append,
    )

    docs = spark.createDataFrame(
        [(0, "big hash join on the hash join key"), (1, "hash join twice")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "pos")
    positional_index_append(docs, path, 0)
    positional_index_append(docs, path, 1)  # full duplicate delivery
    want = sorted(
        map(
            tuple,
            phrase_counts(docs, [(1, "hash join")]).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            phrase_match_at_rest(spark, path, [(1, "hash join")]).collect(),
        )
    )
    assert got == want  # the in-plan distinct repaired the double rows


# --- semantic: replace + content-idempotent kernel -------------------------


def test_semantic_replay_is_replacement_across_cells(spark, emb, tmp_path):
    from pyspark_airflow_weather_etl_spark.operators import similarity as S

    path = str(tmp_path / "sem")
    # bootstrap centroids only (the curationplans k-means loop shape);
    # rows arrive via batch-keyed appends
    cents = S.ivf_train_centroids(emb, n_cells=4)
    spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(cents)],
        "cell_id int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    S.semantic_index_append(
        emb.where(F.col("vec_id") < 40), path, batch_id=0
    )
    # replay batch 0 with DIFFERENT content (negated vectors land in
    # different cells): no stale leaf may survive anywhere
    S.semantic_index_append(
        emb.where(F.col("vec_id") < 40).select(
            "vec_id",
            F.transform("embedding", lambda v: -v).alias("embedding"),
        ),
        path,
        batch_id=0,
    )
    rows = spark.read.parquet(f"{path}/rows")
    assert rows.count() == 40  # one row per id — no stale duplicates
    # the kernel's drop decisions stay distinct under co-present ids
    drops = S.semantic_dedup_incremental(
        emb.where(F.col("vec_id") < 8), path, threshold=0.0
    )
    assert drops.count() == drops.distinct().count()


# --- minhash: self-exclusion on replay -------------------------------------


def test_minhash_replay_excludes_own_batch_partition(spark):
    from pyspark_airflow_weather_etl_spark.operators.dedup import (
        _portable_hashed,
        _portable_sig,
        portable_minhash_dedup_incremental,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today"),
            (1, "completely different text about database hash joins"),
        ],
        "doc_id bigint, text string",
    )
    hashed = _portable_hashed(docs, "doc_id", "text", 3).select(
        "doc_id", _portable_sig().alias("sig"), "h"
    )
    idx = hashed.withColumn(
        "batch", F.when(F.col("doc_id") == 0, 0).otherwise(1)
    )
    replay = docs.where(F.col("doc_id") == 1)  # batch 1 replays
    # WITHOUT the exclusion the replay finds its own crashed first
    # attempt as a phantom corpus twin...
    phantom = portable_minhash_dedup_incremental(
        replay, idx, threshold=0.5
    ).collect()
    assert (1, 1) in {(r.corpus_id, r.new_id) for r in phantom}
    # ...and the declared strategy (batch != batch_id pruning, the
    # streaming loop's read) removes exactly that pair
    clean = portable_minhash_dedup_incremental(
        replay, idx.where(F.col("batch") != 1), threshold=0.5
    ).collect()
    assert (1, 1) not in {(r.corpus_id, r.new_id) for r in clean}
