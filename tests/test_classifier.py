"""Trained quality classifier (operators.classifier): fastText-style
hashed-presence logistic model with the repo's integer micro-count
determinism contract.

Pinned here:
- EXACT training parity with an independent numpy reference (the
  unigram-EM discipline: quantized integer aggregation + one numpy
  float64 sigmoid step makes distributed training bit-reproducible);
- the model actually learns: held-out AUC on a separable synthetic
  corpus AND on the fixture's rule-derived labels;
- bit-determinism under different input partitionings;
- the GPT-3 Pareto lottery: high scores always survive, the draw is
  a deterministic function of the id;
- artifact save/load round-trip.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from pyspark_airflow_weather_etl_spark.operators import classifier as C
from pyspark_airflow_weather_etl_spark.operators.text import gopher_filter

from conftest import SF_DIR


def _ref_bucket(tok: str, dim: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim


def _ref_train(rows, dim, iters, lr, l2, lr_decay=0.0):
    """Independent replay: rows = [(text, y)]. Must match
    operators.classifier bit-for-bit (same quantization, same numpy
    float64 math)."""
    feats, ntoks, ys = [], [], []
    for text, y in rows:
        toks = text.split(" ")
        feats.append(sorted({_ref_bucket(t, dim) for t in toks}))
        ntoks.append(len(toks))
        ys.append(y)
    n = len(rows)
    w = [0.0] * dim
    w_len = 0.0
    bias = 0.0
    for it in range(iters):
        lr_t = lr / (1.0 + lr_decay * it)
        wq = [int(round(x * C.MICRO_W)) for x in w]
        g = [0] * dim
        gl = 0
        gb = 0
        for bs, nt, y in zip(feats, ntoks, ys):
            mm = sum(wq[b] for b in bs)
            xl = np.float64(nt) / np.float64(C.LEN_SCALE)
            margin = np.float64(mm) / C.MICRO_W + w_len * xl + bias
            r = 1.0 / (1.0 + np.exp(-np.float64(margin))) - y
            cb = int(np.rint(r * C.MICRO_R))
            for b in bs:
                g[b] += cb
            gl += int(np.rint(r * xl * C.MICRO_R))
            gb += cb
        for b in range(dim):
            w[b] -= lr_t * (g[b] / C.MICRO_R / n + l2 * w[b])
        w_len -= lr_t * (gl / C.MICRO_R / n + l2 * w_len)
        bias -= lr_t * (gb / C.MICRO_R / n)
    return w, w_len, bias


def _ref_score(text, model):
    dim = model["dim"]
    toks = text.split(" ")
    wq = [int(round(x * C.MICRO_W)) for x in model["weights"]]
    mm = sum(wq[b] for b in {_ref_bucket(t, dim) for t in toks})
    xl = np.float64(len(toks)) / np.float64(C.LEN_SCALE)
    margin = (
        np.float64(mm) / C.MICRO_W + model["w_len"] * xl + model["bias"]
    )
    return float(np.round(1.0 / (1.0 + np.exp(-np.float64(margin))), 6))


def test_training_parity_with_numpy_reference(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(60)
        .select("doc_id", "text")
    )
    labeled = gopher_filter(docs, min_stopwords=1).select(
        "doc_id", "text", F.col("passes").cast("int").alias("y")
    )
    model = C.train_quality_classifier(
        labeled, "y", dim=32, iters=4, lr=4.0, l2=1e-4, lr_decay=0.15
    )
    rows = [(r.text, r.y) for r in labeled.orderBy("doc_id").collect()]
    w_ref, wl_ref, b_ref = _ref_train(
        rows, dim=32, iters=4, lr=4.0, l2=1e-4, lr_decay=0.15
    )
    assert model["bias"] == b_ref
    assert model["w_len"] == wl_ref
    assert model["weights"] == w_ref
    # scoring parity too
    scored = {
        r.doc_id: r.score
        for r in C.score_quality_classifier(labeled, model).collect()
    }
    for r in labeled.collect():
        assert scored[r.doc_id] == _ref_score(r.text, model)


def _synthetic(spark, n=400, seed=7):
    """Separable corpus: positive docs sample from one vocab pool,
    negative from another, with a small shared pool."""
    rng = np.random.default_rng(seed)
    pos_pool = [f"good{i}" for i in range(40)]
    neg_pool = [f"bad{i}" for i in range(40)]
    shared = [f"common{i}" for i in range(20)]
    rows = []
    for i in range(n):
        y = int(i % 2 == 0)
        pool = pos_pool if y else neg_pool
        k = int(rng.integers(20, 60))
        toks = [
            str(rng.choice(pool if rng.random() < 0.7 else shared))
            for _ in range(k)
        ]
        rows.append((i, " ".join(toks), y))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


def _auc(scored):
    pos = sorted(r.score for r in scored if r.y == 1)
    neg = sorted(r.score for r in scored if r.y == 0)
    wins = sum((p > q) + 0.5 * (p == q) for p in pos for q in neg)
    return wins / (len(pos) * len(neg))


def test_learns_separable_corpus_auc(spark):
    df = _synthetic(spark).cache()
    train = df.where(F.col("doc_id") % 5 != 0)
    held = df.where(F.col("doc_id") % 5 == 0)
    model = C.train_quality_classifier(
        train, "y", dim=64, iters=10, lr=2.0
    )
    scored = (
        C.score_quality_classifier(held, model)
        .join(held.select("doc_id", "y"), "doc_id")
        .collect()
    )
    assert _auc(scored) >= 0.95, _auc(scored)
    df.unpersist()


def test_learns_fixture_rule_labels(spark):
    """The catalog recipe end-to-end: distill the (fixture-tuned)
    Gopher gate into the classifier; the binding rules are word count
    and stopword presence, both expressible by presence+length
    features, so in-sample AUC must be solidly above chance."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    labeled = gopher_filter(docs, min_stopwords=1).select(
        "doc_id", "text", F.col("passes").cast("int").alias("y")
    )
    model = C.train_quality_classifier(labeled, "y")
    scored = (
        C.score_quality_classifier(labeled, model)
        .join(labeled.select("doc_id", "y"), "doc_id")
        .collect()
    )
    assert _auc(scored) >= 0.85, _auc(scored)


def test_bit_determinism_under_repartition(spark):
    df = _synthetic(spark, n=120)
    m1 = C.train_quality_classifier(
        df.repartition(1), "y", dim=32, iters=3
    )
    m2 = C.train_quality_classifier(
        df.repartition(17, "text"), "y", dim=32, iters=3
    )
    assert m1 == m2


def test_pareto_select_contract(spark):
    df = spark.createDataFrame(
        [
            (i, float(s))
            for i, s in enumerate([1.0] * 50 + [0.7] * 50 + [0.0] * 50)
        ],
        "doc_id long, score double",
    )
    kept = C.pareto_select(df).collect()
    ids = {r.doc_id for r in kept}
    # score 1.0 always survives (draw > 0)
    assert sum(1 for i in ids if i < 50) == 50
    # mid scores survive at the heavy-tail rate (2-s)^-alpha ~ 9%:
    # the deterministic md5 draw keeps exactly 4 of these 50
    mid = sum(1 for i in ids if 50 <= i < 100)
    assert 0 < mid < 15, mid
    # score 0.0 is effectively gone ((2)^-9 ~ 0.2%)
    assert sum(1 for i in ids if i >= 100) <= 1
    # deterministic
    again = {r.doc_id for r in C.pareto_select(df).collect()}
    assert ids == again
    # the audit form partitions the input exactly
    flags = C.pareto_flags(df)
    assert flags.count() == 150
    assert {
        r.doc_id for r in flags.where("kept = 1").collect()
    } == ids


def test_artifact_round_trip(spark, tmp_path):
    df = _synthetic(spark, n=80)
    model = C.train_quality_classifier(df, "y", dim=16, iters=2)
    C.save_classifier(spark, model, str(tmp_path / "art"))
    back = C.load_classifier(spark, str(tmp_path / "art"))
    assert back == model
