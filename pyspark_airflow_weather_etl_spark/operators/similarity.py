"""Similarity search over an embedding column (array<float>).

North-star extension (SURVEY.md §2.9): brute-force cosine top-k as
the exact baseline, and a random-hyperplane (SRP) LSH variant as the
scale path — at 100 TB the LSH bucket join touches a small candidate
set per query instead of every vector.

Everything is JVM expressions (zip_with/aggregate fold — see
functions.vectors); scores are therefore deterministic regardless of
partitioning. The hyperplanes are generated driver-side from a fixed
seed and enter the plan as literals (at 64 dims × 16 planes that is
a ~4 KB literal — broadcast-trivial).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity, dot

SEED = 42


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against one query vector.

    The query enters the plan as a literal array (no join, no
    broadcast variable); ranking is TakeOrderedAndProject — a per-
    partition k-heap, so memory is O(k) however many vectors scan by.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return rng.standard_normal((n_planes, dim))


def srp_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 16,
    vec_col: str = "embedding",
    out_col: str = "srp_bucket",
) -> DataFrame:
    """Signed-random-projection signature: one bit per hyperplane
    (sign of <v, r_i>), packed into a long bucket id. Cosine-similar
    vectors agree on most signs, so they land in the same bucket with
    high probability."""
    planes = _hyperplanes(dim, n_planes)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = (
            F.when(dot(F.col(vec_col), p) >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return df.withColumn(out_col, bucket)


def srp_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict the exact ranking to vectors whose SRP
    bucket is within ``max_hamming`` bits of the query's bucket, then
    brute-force only those. Probe buckets are enumerated driver-side
    (n_planes choose ≤max_hamming ids) and pushed down as an IN filter
    → partition-prunable when the table is written bucketed by
    srp_bucket. Recall is tested against brute_force_topk."""
    planes = _hyperplanes(dim, n_planes)
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = 0
    for i, plane in enumerate(planes):
        if float(np.dot(qv, plane)) >= 0:
            qbits |= 1 << i
    probes = {qbits}
    if max_hamming >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    if max_hamming >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    with_sig = srp_signature(embeddings, dim, n_planes, vec_col)
    candidates = with_sig.where(F.col("srp_bucket").isin([int(p) for p in probes]))
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)


def pairwise_topk_per_label(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """All-pairs top-k restricted to a blocking key (label): the
    grouped-blocking pattern that keeps all-pairs similarity from
    being a global cross join. Within each block: equi-join on the
    key, exact cosine, per-vector rank."""
    from pyspark.sql import Window

    a = embeddings.select(
        F.col(group_col),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = embeddings.select(
        F.col(group_col),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    scored = (
        a.join(b, group_col)
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            group_col,
            "id_a",
            "id_b",
            F.round(
                cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
