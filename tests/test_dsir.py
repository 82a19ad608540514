"""DSIR importance resampling (operators.dsir): behavioral contracts
beyond the catalog entries' DuckDB hash-parity — does selection
actually move the kept distribution toward the target, is the Gumbel
resample a reproducible pure function of (id, seed), and are the
weights the additive bag-of-features quantity the estimator assumes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_key,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def planted(spark):
    """Target speaks 'alpha'; the raw pool is half alpha-dialect, half
    zeta-dialect, ids interleaved so selection can't cheat on id."""
    target = _corpus(
        spark,
        [(1000 + i, "alpha beta gamma alpha beta") for i in range(20)],
    )
    raw_rows = []
    for i in range(40):
        if i % 2 == 0:
            raw_rows.append((i, "alpha beta gamma beta alpha gamma"))
        else:
            raw_rows.append((i, "zeta eta theta zeta eta theta"))
    return _corpus(spark, raw_rows), target


def test_weights_rank_target_like_docs_higher(spark, planted):
    raw, target = planted
    w = {
        r.doc_id: r.log_weight
        for r in dsir_log_weights(raw, target, n_buckets=32).collect()
    }
    alpha = [w[i] for i in range(0, 40, 2)]
    zeta = [w[i] for i in range(1, 40, 2)]
    assert min(alpha) > max(zeta)


def test_hard_selection_recovers_planted_half(spark, planted):
    raw, target = planted
    kept = dsir_select(
        raw, target, n_buckets=32, keep_numer=1, keep_denom=2
    )
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == list(range(0, 40, 2))  # exactly the alpha dialect
    # fraction is the integer cut of the WHOLE raw pool
    assert len(ids) == 40 // 2


def test_weights_are_additive_in_features(spark):
    """Two raw docs with identical text get identical weights, and a
    doc whose text is another's concatenated twice has ~2× the weight
    (exactly 2× in unigram features; the one extra seam bigram is the
    only deviation — bounded by one λ)."""
    target = _corpus(spark, [(100, "a b c")])
    raw = _corpus(
        spark, [(0, "a b"), (1, "a b"), (2, "a b a b")]
    )
    rows = {
        r.doc_id: r
        for r in dsir_log_weights(raw, target, n_buckets=16).collect()
    }
    assert rows[0].log_weight == rows[1].log_weight
    assert rows[0].n_feats == 3 and rows[2].n_feats == 7
    # doubled doc = 2× base + the seam bigram "b a"
    seam = rows[2].log_weight - 2 * rows[0].log_weight
    lam_bound = abs(rows[0].log_weight) + abs(rows[2].log_weight) + 1
    assert abs(seam) < lam_bound


def test_gumbel_pure_function_of_id_and_seed(spark, planted):
    raw, target = planted
    a = sorted(
        r.doc_id
        for r in dsir_select(
            raw, target, n_buckets=32, keep_denom=2, gumbel_seed=7
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in dsir_select(
            raw, target, n_buckets=32, keep_denom=2, gumbel_seed=7
        ).collect()
    )
    assert a == b and len(a) == 20
    # a different seed is a different draw: the perturbed keys change
    # even when the planted weight gap is too wide for the noise to
    # flip the selected SET (Gumbel σ ≈ 1.28 « the dialect gap here)
    k7 = sorted(
        (r.doc_id, r.sel_key)
        for r in dsir_select(
            raw, target, n_buckets=32, keep_denom=2, gumbel_seed=7
        ).collect()
    )
    k8 = sorted(
        (r.doc_id, r.sel_key)
        for r in dsir_select(
            raw, target, n_buckets=32, keep_denom=2, gumbel_seed=8
        ).collect()
    )
    assert [x[1] for x in k7] != [x[1] for x in k8]
    # resampling still prefers target-like docs, but (unlike hard
    # top-k) can admit some low-weight docs — softmax tails
    alpha_frac = sum(1 for i in a if i % 2 == 0) / len(a)
    assert alpha_frac >= 0.6


def test_gumbel_key_distribution_sane(spark):
    """The md5-derived uniforms feeding the Gumbel draw cover (0,1)
    reasonably: over 1000 ids the empirical mean of u sits near 0.5
    (a broken byte-slice would collapse the range)."""
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        gumbel_key("doc_id", seed=3).alias("g"),
    )
    # invert: u = exp(-exp(-g)); mean over many ids ≈ 0.5
    mean_u = df.select(
        F.avg(F.exp(-F.exp(-F.col("g")))).alias("m")
    ).first().m
    assert 0.45 < mean_u < 0.55


def test_empty_target_is_well_defined(spark):
    """T=0 still yields finite weights (Laplace smoothing): every
    bucket's target prob is 1/(0+B) — selection degrades to an
    inverse-raw-frequency preference, not NaN/error."""
    target = _corpus(spark, []).where(F.lit(False))
    raw = _corpus(spark, [(0, "a b"), (1, "c d")])
    rows = dsir_log_weights(raw, target, n_buckets=8).collect()
    assert len(rows) == 2
    assert all(
        r.log_weight == r.log_weight  # not NaN
        and abs(r.log_weight) < 1e6
        for r in rows
    )
