"""Distributed exact PCA (operators.pca): the integer-moment Arrow
accumulation must reproduce a single-machine numpy PCA bit-for-bit,
the factorization must be orthonormal / variance-ordered /
sign-unique, the projection must carry the variance it claims, and
the whole thing must be partitioning-invariant.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators import pca as P

from conftest import SF_DIR


def _emb(spark, n=300):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(n)


def _ref_train(X, k):
    """Independent replay with the SAME quantization contract."""
    Xm = np.rint(X * P.MICRO).astype("int64")
    n = len(Xm)
    s = Xm.sum(axis=0, dtype=object)  # exact python ints
    ss = np.zeros((X.shape[1], X.shape[1]), dtype=object)
    for row in Xm:
        ss += np.outer(row, row)
    S = np.array([float(int(v)) for v in s])
    SS = np.array([[float(int(v)) for v in r] for r in ss])
    mean = S / n / P.MICRO
    C = SS / n / (P.MICRO * P.MICRO) - np.outer(mean, mean)
    w, v = np.linalg.eigh(C)
    idx = np.argsort(w)[::-1][:k]
    comps = []
    for col in idx:
        vec = v[:, col]
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        comps.append(vec)
    return mean, np.array(comps), np.array([max(w[c], 0.0) for c in idx])


def test_parity_with_numpy_reference(spark):
    df = _emb(spark, 200).cache()
    model = P.pca_train(df, "embedding", k=8)
    X = np.stack(
        [r.embedding for r in df.orderBy("vec_id").collect()]
    ).astype("float64")
    mean, comps, eig = _ref_train(X, 8)
    assert model["mean"] == [float(x) for x in mean]
    assert model["components"] == [[float(x) for x in c] for c in comps]
    # projection parity at 6 dp
    got = {
        r.vec_id: r.pca_vec
        for r in P.pca_project(df, model).collect()
    }
    ids = [r.vec_id for r in df.orderBy("vec_id").collect()]
    Y = np.round((X - mean) @ comps.T, 6)
    for i, vid in enumerate(ids):
        assert got[vid] == [float(x) for x in Y[i]]
    df.unpersist()


def test_orthonormal_variance_ordered(spark):
    model = P.pca_train(_emb(spark), "embedding", k=12)
    W = np.array(model["components"])
    assert np.abs(W @ W.T - np.eye(12)).max() < 1e-9
    eig = model["eigvals"]
    assert eig == sorted(eig, reverse=True)
    assert eig[0] > 0
    # projected variance per axis ~= eigenvalue (exact moments, so
    # the match is to float precision, not sampling luck)
    df = _emb(spark)
    Y = np.stack(
        [r.pca_vec for r in P.pca_project(df, model).collect()]
    )
    var = Y.var(axis=0)
    assert np.allclose(var, eig, rtol=1e-4, atol=1e-9)


def test_partitioning_invariance(spark):
    df = _emb(spark, 250)
    m1 = P.pca_train(df.repartition(1), "embedding", k=6)
    m2 = P.pca_train(df.repartition(17), "embedding", k=6)
    assert m1 == m2


def test_artifact_round_trip(spark, tmp_path):
    df = _emb(spark, 100)
    model = P.pca_train(df, "embedding", k=4)
    P.pca_save(spark, model, str(tmp_path / "pca"))
    back = P.pca_load(spark, str(tmp_path / "pca"))
    assert back == model


def test_reduction_preserves_neighborhoods(spark):
    """The point of the operator: when the data HAS low-rank
    structure (the real-embedding case — the near-isotropic synthetic
    fixture does not, top-16/64 eigvals carry only ~45% variance),
    the k-d projection preserves cosine neighborhoods. Planted
    8-d structure + small ambient noise → recall ≥ 0.9."""
    rng = np.random.default_rng(3)
    basis = np.linalg.qr(rng.normal(size=(64, 8)))[0]  # 64x8
    Z = rng.normal(size=(200, 8)) * np.array([8, 7, 6, 5, 4, 3, 2, 1])
    X = Z @ basis.T + 0.05 * rng.normal(size=(200, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    model = P.pca_train(df, "embedding", k=8)
    # the planted spectrum is recovered in order
    assert model["eigvals"][0] > model["eigvals"][7] > 0.5
    Y = np.stack(
        [
            r.pca_vec
            for r in P.pca_project(df, model).orderBy("vec_id").collect()
        ]
    )
    Xf = np.stack(
        [r.embedding for r in df.orderBy("vec_id").collect()]
    ).astype("float64")

    def topk(M, q, k=10):
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        sims = Mn @ Mn[q]
        sims[q] = -2
        return set(np.argsort(-sims)[:k])

    hits = tot = 0
    for q in range(0, 200, 10):
        full = topk(Xf, q)
        red = topk(Y, q)
        hits += len(full & red)
        tot += len(full)
    assert hits / tot >= 0.9, hits / tot


def test_reduced_topk_exact_on_low_rank(spark):
    """pca_reduced_topk (coarse L2 in PCA space + exact full-space
    cosine re-rank): on planted low-rank data the reduced scan plus
    overfetch recovers the exact brute-force top-k."""
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    rng = np.random.default_rng(5)
    basis = np.linalg.qr(rng.normal(size=(64, 8)))[0]
    Z = rng.normal(size=(300, 8)) * np.array([8, 7, 6, 5, 4, 3, 2, 1])
    X = Z @ basis.T + 0.05 * rng.normal(size=(300, 64))
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(300)],
        "vec_id long, embedding array<float>",
    )
    model = P.pca_train(df, "embedding", k=8)
    hits = tot = 0
    for qid in (3, 77, 150):
        q = [float(x) for x in X[qid]]
        got = {
            r["vec_id"]
            for r in P.pca_reduced_topk(df, model, q, k=10).collect()
        }
        want = {
            r["vec_id"] for r in brute_force_topk(df, q, k=10).collect()
        }
        hits += len(got & want)
        tot += len(want)
    assert hits / tot >= 0.9, hits / tot


def test_reduced_topk_fixture_recall(spark):
    """On the near-isotropic fixture embeddings, 32 of 64 axes (~70%
    variance) with overfetch 8 still reach recall ≥ 0.8 vs exact
    brute force — the honest operating point the catalog entry uses
    (16 axes measured ~0.7 at overfetch 8; documented, not used)."""
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    model = P.pca_train(emb, "embedding", k=32)
    hits = tot = 0
    for qid in (7, 42):
        q = list(emb.where(F.col("vec_id") == qid).first()["embedding"])
        got = {
            r["vec_id"]
            for r in P.pca_reduced_topk(emb, model, q, k=10).collect()
        }
        want = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
        hits += len(got & want)
        tot += len(want)
    emb.unpersist()
    assert hits / tot >= 0.8, hits / tot


def test_reduced_topk_fixed_self_hit_and_recall(spark):
    """The hash-exact twin route: the query itself survives the
    integer-coarse cut at distance 0 and re-ranks to cosine 1.0 at
    rank 1; recall vs exact brute force matches the trained route's
    operating band (the fixed rotation is a blunter bottleneck than
    the eigenbasis, so the floor is looser — the twin's job is
    pinning the machinery, the trained entry owns quality)."""
    from pyspark_airflow_weather_etl_spark.operators.similarity import (
        brute_force_topk,
    )

    from conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()
    q = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    rows = P.pca_reduced_topk_fixed(emb, q, k=10, kdim=8).collect()
    assert len(rows) == 10
    assert rows[0]["vec_id"] == 7 and rows[0]["cosine"] == 1.0
    got = {r["vec_id"] for r in rows}
    want = {r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()}
    emb.unpersist()
    assert len(got & want) >= 3, (got, want)
