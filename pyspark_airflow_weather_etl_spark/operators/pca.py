"""Distributed exact PCA over an embedding column — the dimension-
reduction leg of the vector family (project 64-d → k-d before
IVF/SRP blocking cuts candidate volume; the standard recipe in every
large-scale ANN stack, and the unrotated cousin of the OPQ rotation
in :mod:`.pq`). North-star extension, no reference file.

Spark-first, with the repo's determinism contract:

- **Moment accumulation** is the Arrow-matmul idiom: each Arrow batch
  quantizes its vectors to integer micro-units (1e-6 — a pure
  per-value function of the input floats) and accumulates Σx and
  Σx·xᵀ as int64 numpy matmuls (bounded: |x_micro| ≤ ~1e6, batch
  ≤ 10k rows ⇒ partial sums ≪ 2^63); the d + d² partials then
  aggregate across partitions as DECIMAL(38,0) — EXACT at any corpus
  size, no float accumulation order anywhere. One corpus pass, one
  tiny (d²-row) shuffle.
- **Eigendecomposition** runs on the driver over the exact integer
  moments converted to float64 once — d×d is model-sized (the
  k-means-centroid / BPE-artifact discipline). Component signs are
  pinned (largest-|coefficient| entry positive) so the factorization
  is unique, not just the subspace.
- **Projection** is a single Arrow matmul pass, rounded to 6 dp (the
  float-column idiom).

An independent numpy reference reproduces train + project bit-for-bit
(tests/test_pca.py) — same quantization, same float64 conversion.
"""

from __future__ import annotations

from math import floor as math_floor

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def moment_partials(df: DataFrame, vec_col: str, d: int) -> DataFrame:
    """Per-Arrow-batch EXACT moment partials as ``(i, j, v)`` int64
    rows: row (-1,-1) carries the count, (i,-1) the Σx micro-sums,
    (i,j≥i) the upper-triangle Σx·xᵀ micro²-sums. Integer partials
    are EXACTLY additive, which is what makes the streaming
    accumulation (:mod:`...streaming.pca_stream`) bit-identical to
    the one-shot batch train."""
    import numpy as np

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.rint(
                np.stack(pdf[vec_col].to_numpy()) * MICRO
            ).astype("int64")
            s = X.sum(axis=0)
            ss = X.T @ X
            rows = [
                {"i": -1, "j": -1, "v": int(len(pdf))},
                *({"i": int(i), "j": -1, "v": int(s[i])} for i in range(d)),
                *(
                    {"i": int(i), "j": int(j), "v": int(ss[i, j])}
                    for i in range(d)
                    for j in range(i, d)
                ),
            ]
            yield pd.DataFrame(rows)

    return df.select(vec_col).mapInPandas(part, "i int, j int, v long")


def _moments(df: DataFrame, vec_col: str, d: int):
    """EXACT corpus moments from integer micro-quantized vectors:
    returns (n, sum_micro[d], sumsq_micro2[d][d]) as Python ints."""
    rows = (
        moment_partials(df, vec_col, d)
        .groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))
        .collect()
    )
    return moments_from_rows(rows, d)


def moments_from_rows(rows, d: int):
    """Decode aggregated ``(i, j, v)`` rows (any source — one-shot
    aggregation or the streaming store) into (n, s, ss) ints."""
    n = 0
    s = [0] * d
    ss = [[0] * d for _ in range(d)]
    for r in rows:
        i, j, v = int(r["i"]), int(r["j"]), int(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            ss[i][j] = v
            ss[j][i] = v
    return n, s, ss


def train_from_moments(n: int, s, ss, d: int, k: int) -> dict:
    """Driver-side factorization over exact integer moments — shared
    by the one-shot and streaming paths (bit-identical by
    construction: integer moments are exactly additive)."""
    import numpy as np

    if n < 2:
        raise ValueError("pca_train: need at least 2 vectors")
    S = np.array(s, dtype="float64")
    SS = np.array(ss, dtype="float64")
    mean = S / n / MICRO
    # C = E[xxT] - mean meanT, from the exact integer moments
    C = SS / n / (MICRO * MICRO) - np.outer(mean, mean)
    w, v = np.linalg.eigh(C)  # ascending
    idx = np.argsort(w)[::-1][: int(k)]
    comps = []
    eig = []
    for col in idx:
        vec = v[:, col]
        # sign pin: the largest-|coefficient| entry is positive
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
        eig.append(float(max(w[col], 0.0)))
    return {
        "d": int(d),
        "k": int(k),
        "n": int(n),
        "mean": [float(x) for x in mean],
        "components": comps,
        "eigvals": eig,
    }


def pca_train(df: DataFrame, vec_col: str = "embedding", k: int = 16) -> dict:
    """Fit PCA; returns the artifact ``{d, k, n, mean, components,
    eigvals}`` with ``components`` the k×d row-major principal axes
    (orthonormal, variance-ordered, sign-pinned)."""
    d = len(df.select(vec_col).first()[0])
    n, s, ss = _moments(df, vec_col, d)
    return train_from_moments(n, s, ss, d, k)


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the principal axes: ``(id,
    pca_vec array<double>)`` with coordinates rounded to 6 dp. One
    Arrow matmul pass; the model ships as a closure constant
    (model-sized)."""
    import numpy as np

    mean = np.array(model["mean"], dtype="float64")
    W = np.array(model["components"], dtype="float64")  # k x d

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            Y = np.round((X - mean) @ W.T, 6)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "pca_vec": list(map(list, Y))}
            )

    return df.select(id_col, vec_col).mapInPandas(
        part, f"{id_col} long, pca_vec array<double>"
    )


def fixed_rotation(k: int, d: int) -> list[list[int]]:
    """The deterministic integer rotation of the portable twin:
    ``W[r][j] = ((r*31 + j*17) % 7) - 3`` — small ints an external
    engine regenerates from the formula alone."""
    return [
        [((r * 31 + j * 17) % 7) - 3 for j in range(d)] for r in range(k)
    ]


def pca_project_fixed(
    df: DataFrame,
    k: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Portable hash-exact twin of :func:`pca_project` — the
    kmeans_cluster_fixed / pq_encode_fixed pattern: the trained float
    eigenbasis (engine-specific LAPACK, rows-only checkable) is
    replaced by the :func:`fixed_rotation` integer matrix, and the
    mean-centered projection is computed in EXACT integer arithmetic
    so DuckDB replays it bit-for-bit. Returns (id, r, y): for
    quantized vectors xq = floor(x*scale) with corpus column sums S
    and row count n,

        y[r] = n * Σ_j xq_j·W[r][j] − Σ_j S_j·W[r][j]
             = n · (W(xq − S/n))_r        — centering without division.

    Scale shape: one corpus-width aggregation for (n, S) — d sum
    COLUMNS, not a posexplode (the kmeans lesson: exploding multiplies
    the partial-agg input by d) — whose single row is a bounded driver
    artifact re-entering as plan literals; the projection itself is a
    JVM-side zip_with/aggregate per component, no shuffle, no Python.
    Overflow: |xq| ≤ scale·max|x|, |W| ≤ 3, so |y| < n·d·3·scale·max|x|
    — at 1e12 rows and unit-normalized 64-d vectors still < 2^63."""
    q = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "bigint"
            ),
        ).alias("xq"),
    )
    d = len(q.select("xq").first()[0])
    agg = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.col("xq")[j]).cast("bigint").alias(f"s{j}")
            for j in range(d)
        ],
    ).collect()[0]
    n = int(agg["n"])
    S = [int(agg[f"s{j}"]) for j in range(d)]
    W = fixed_rotation(k, d)
    const = [sum(S[j] * W[r][j] for j in range(d)) for r in range(k)]
    ys = []
    for r in range(k):
        wr = F.array(*[F.lit(int(w)).cast("bigint") for w in W[r]])
        dot = F.aggregate(
            F.zip_with("xq", wr, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        ys.append(
            (F.lit(n).cast("bigint") * dot - F.lit(const[r]).cast("bigint"))
        )
    return q.select(
        F.col(id_col), F.posexplode(F.array(*ys)).alias("r", "y")
    ).select(F.col(id_col), F.col("r").cast("bigint").alias("r"), "y")


def pca_reduced_topk_fixed(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    kdim: int = 8,
    scale: int = 1000,
    overfetch: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Portable hash-exact twin of :func:`pca_reduced_topk` — the
    at-rest-family pattern (pq_adc_topk_fixed, kmeans_cluster_fixed)
    applied to the PCA-bottleneck ANN route: the trained eigenbasis is
    replaced by the :func:`fixed_rotation` integer matrix, the coarse
    ranking is EXACT integer Euclidean distance in that reduced space
    (the :func:`pca_project_fixed` algebra — y = n·W·xq − W·S, so
    mean-centering needs no division), and the overfetched candidates
    are re-ranked by exact full-space cosine at 6 dp. Every stage of
    the coarse-then-exact machinery — quantize, center, rotate,
    integer distance, deterministic overfetch cut, float re-rank — is
    replayed by the DuckDB oracle bit-for-bit, leaving only the eigh
    itself to the rows-only entry.

    Overflow: |y| < n·d·3·scale·max|x| (≈1e9 at sf0.1); squared
    differences are summed as DECIMAL(38,0) (HUGEINT on the oracle
    side), exact far beyond bigint range."""
    from .similarity import cosine_similarity

    q = df.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
                "bigint"
            ),
        ).alias("xq"),
    )
    d = len(q.select("xq").first()[0])
    agg = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[
            F.sum(F.col("xq")[j]).cast("bigint").alias(f"s{j}")
            for j in range(d)
        ],
    ).collect()[0]
    n = int(agg["n"])
    S = [int(agg[f"s{j}"]) for j in range(d)]
    W = fixed_rotation(kdim, d)
    const = [sum(S[j] * W[r][j] for j in range(d)) for r in range(kdim)]
    xq_q = [int(math_floor(float(x) * scale)) for x in query_vec]
    yq = [
        n * sum(xq_q[j] * W[r][j] for j in range(d)) - const[r]
        for r in range(kdim)
    ]
    ys = []
    for r in range(kdim):
        wr = F.array(*[F.lit(int(w)).cast("bigint") for w in W[r]])
        dot = F.aggregate(
            F.zip_with("xq", wr, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        ys.append(
            F.lit(n).cast("bigint") * dot - F.lit(const[r]).cast("bigint")
        )
    yq_col = F.array(*[F.lit(int(v)).cast("bigint") for v in yq])
    d2 = F.aggregate(
        F.zip_with(
            F.array(*ys),
            yq_col,
            lambda a, b: ((a - b).cast("decimal(19,0)"))
            * ((a - b).cast("decimal(19,0)")),
        ),
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, x: acc + x,
    )
    coarse = (
        q.select(F.col(id_col), d2.alias("__d2"))
        .orderBy(F.col("__d2").asc(), F.col(id_col))
        .limit(int(overfetch * k))
    )
    qfull = F.array(*[F.lit(float(x)) for x in query_vec])
    rerank = coarse.join(df.select(id_col, vec_col), id_col).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), qfull), 6).alias("cosine"),
    )
    return rerank.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def pca_save(spark, model: dict, path: str) -> None:
    """Persist the artifact (component rows + one-row meta — the
    tokenizer-artifact layout)."""
    rows = [
        (int(r), model["eigvals"][r], model["components"][r])
        for r in range(model["k"])
    ]
    spark.createDataFrame(
        rows, schema="r int, eigval double, axis array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/components")
    spark.createDataFrame(
        [(model["d"], model["k"], model["n"], model["mean"])],
        schema="d int, k int, n long, mean array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def pca_load(spark, path: str) -> dict:
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    comp = {
        int(r["r"]): (float(r["eigval"]), [float(x) for x in r["axis"]])
        for r in spark.read.parquet(f"{path}/components").collect()
    }
    return {
        "d": int(meta["d"]),
        "k": int(meta["k"]),
        "n": int(meta["n"]),
        "mean": [float(x) for x in meta["mean"]],
        "components": [comp[r][1] for r in range(int(meta["k"]))],
        "eigvals": [comp[r][0] for r in range(int(meta["k"]))],
    }


def pca_reduced_topk(
    df: DataFrame,
    model: dict,
    query_vec: list[float],
    k: int = 10,
    overfetch: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN through the PCA bottleneck — the reduced-dimension scan
    that makes a brute-force pass affordable at corpus scale: rank
    candidates by EUCLIDEAN distance in the k'-dim PCA space (~k'/d
    of the full scan's arithmetic and cache traffic — with k'=16 of
    d=64, a 4x cheaper coarse pass; the complement of the PQ route,
    which compresses codes instead of axes), keep the top
    ``overfetch * k`` (TakeOrderedAndProject — O(candidates) memory),
    then EXACTLY re-rank only those by full-space cosine. Recall is
    governed by the variance the dropped axes carried; on genuinely
    low-rank corpora the coarse pass loses almost nothing
    (tests/test_pca.py pins recall on planted low-rank structure and
    documents the near-isotropic-fixture caveat).

    The coarse distance uses the SAME rounded 6 dp projections as
    :func:`pca_project` (determinism contract), computed JVM-side
    from the broadcast-literal projected query."""
    import numpy as np

    from .similarity import cosine_similarity

    mean = np.array(model["mean"], dtype="float64")
    W = np.array(model["components"], dtype="float64")
    qr = np.round((np.array(query_vec, dtype="float64") - mean) @ W.T, 6)
    proj = pca_project(df, model, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in qr])
    coarse = (
        proj.select(
            id_col,
            F.aggregate(
                F.zip_with(
                    "pca_vec", q, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("__d2"),
        )
        .orderBy(F.col("__d2").asc(), F.col(id_col))
        .limit(int(overfetch * k))
    )
    qfull = F.array(*[F.lit(float(x)) for x in query_vec])
    rerank = coarse.join(df.select(id_col, vec_col), id_col).select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), qfull), 6).alias("cosine"),
    )
    return rerank.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)
