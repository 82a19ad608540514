"""Distributed k-means clustering over an embedding column.

North-star extension (no reference file — the reference has no vector
ops at all): corpus clustering is a first-class training-data
curation primitive (topic bucketing, diversity sampling, SemDeDup's
own quantizer). The existing ``similarity.ivf_train_centroids`` trains
on a bounded driver-side sample (the FAISS recipe); this module adds
the FULL-CORPUS Lloyd iteration in its standard distributed shape
(Spark MLlib's): each round is ONE corpus scan (assignment, no
shuffle of the vectors themselves) + a tiny k-row aggregate of dim
sum/avg columns (per-dimension aggregates, NOT a posexplode — the
explode form multiplies the aggregate's input by dim),
with the k×dim centroid frame round-tripping through the driver —
a driver-bounded iteration exactly like ``graph.dedup_clusters``'s
label propagation and ``bpe.bpe_train``'s merge loop.

Two forms:

- :func:`kmeans_cluster_fixed` — the portable hash-exact twin:
  vectors floor-quantize to integers once, centroid updates are
  floor-divided integer means, assignment is the exact integer
  Σ(a−b)² argmin with ties to the lowest cell. Every iteration is
  deterministic on any engine and any partitioning, so the WHOLE
  unrolled loop replays bit-for-bit in DuckDB SQL
  (plans/kmeansplans.py builds the iteration-unrolled oracle) — the
  ``semantic_dedup_fixed_cells`` pattern applied to an iterative
  algorithm.
- :func:`kmeans_train_distributed` — the float production shape:
  Arrow-batched matmul assignment (same decision statistic as
  ``similarity.ivf_assign``) + per-dimension avg aggregation. Returns
  the trained centroids for use with the existing IVF/SemDeDup
  operators; tests/test_kmeans.py checks it against a numpy Lloyd
  replay.

Scale: per iteration the corpus is scanned once; the only shuffle is
the partial-aggregated groupBy over cell — k rows × dim aggregate
columns after map-side combine, bytes not gigabytes. Centroids
(k·dim doubles) broadcast as plan literals. 100 TB cost = iters ×
one scan, the floor for any exact Lloyd."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..caching import claim_group, persist_into


def _int_qv(vec_col: str, scale: int) -> F.Column:
    """floor(x·scale) as BIGINT — floor, not round: round-half
    semantics differ across engines."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast(
            "long"
        ),
    )


def _int_argmin_cell(cents: list[list[int]]) -> F.Column:
    """Index of the nearest integer centroid by exact Σ(a−b)², ties to
    the lowest index: an array of k pure-JVM folds + array_position of
    the min (array_position returns the FIRST match — the tiebreak)."""
    scores = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.array(*[F.lit(int(v)) for v in c]),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            for c in cents
        ]
    )
    return (
        F.array_position(scores, F.array_min(scores)) - 1
    ).cast("long")


def kmeans_cluster_fixed(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Portable full-corpus Lloyd: (id, cell) after ``iters`` exact
    integer iterations from the deterministic init cells = the k
    lowest-id rows' quantized vectors.

    Iteration is driver-bounded (centroids are k·dim ints — they
    round-trip through the driver and re-enter the next scan as plan
    literals, the label-propagation/BPE precedent), and every step is
    integer-exact: quantize once, assign by Σ(a−b)² argmin (ties →
    lowest cell), update each coordinate to floor(Σv / n) (double
    division is exact enough to floor correctly for |Σv| < 2⁵³ and
    the ≥1/n gap between a non-integer quotient and the nearest
    integer — documented in plans/kmeansplans.py where the DuckDB
    oracle replays the identical arithmetic). A cell that loses all
    members keeps its previous centroid, so the codebook shape is
    stable."""
    caches = claim_group("kmeans_cluster_fixed")
    base = persist_into(
        caches,
        embeddings.select(
            F.col(id_col), _int_qv(vec_col, scale).alias("qv")
        ),
    )
    cents = [
        [int(v) for v in r.qv]
        for r in base.where(F.col(id_col) < k).orderBy(id_col).collect()
    ]
    if len(cents) < k:
        raise ValueError(f"need {k} init rows with {id_col} < {k}")
    dim = len(cents[0])
    for _ in range(iters):
        assigned = base.withColumn("cell", _int_argmin_cell(cents))
        # per-dimension column aggregates, NOT posexplode: the explode
        # form multiplies the aggregate's input rows by dim (64× the
        # corpus through the partial agg); dim sum columns keep the
        # scan at corpus width and the partial-agg output at k rows
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at(F.col("qv"), p + 1)).alias(f"s{p}")
                    for p in range(dim)
                ],
            )
            .collect()
        )
        new = {
            r.cell: [
                int(np.floor(float(r[f"s{p}"]) / float(r.n)))
                for p in range(dim)
            ]
            for r in sums
            if r.cell is not None
        }
        cents = [new.get(c, cents[c]) for c in range(k)]
    return base.select(
        F.col(id_col), _int_argmin_cell(cents).alias("cell")
    )


def kmeans_train_distributed(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Full-corpus float Lloyd, the production trainer: Arrow matmul
    assignment (−2·x@cᵀ+|c|², the ``ivf_assign`` statistic) + one
    (cell, dim)-grouped avg per round. Init = the k lowest-id vectors
    (deterministic). Returns (k, dim) float64 centroids, drop-in for
    ``ivf_assign`` / ``ivf_index_write`` / ``semantic_dedup``.

    Float partial sums make the last-ulp of each mean partition-order
    dependent — this trainer is for quality (it sees the whole corpus,
    not a sample), not for hash-exact oracles; the exactness story
    lives in :func:`kmeans_cluster_fixed`."""
    from .similarity import ivf_assign

    caches = claim_group("kmeans_train_distributed")
    base = persist_into(
        caches,
        embeddings.select(F.col(id_col), F.col(vec_col)),
    )
    init = base.where(F.col(id_col) < k).orderBy(id_col).collect()
    if len(init) < k:
        raise ValueError(f"need {k} init rows with {id_col} < {k}")
    cents = np.asarray(
        [[float(x) for x in r[vec_col]] for r in init], dtype=np.float64
    )
    dim = cents.shape[1]
    for _ in range(iters):
        rows = (
            ivf_assign(base, cents, vec_col)
            .groupBy("ivf_cell")
            .agg(
                *[
                    F.avg(
                        F.element_at(F.col(vec_col), p + 1).cast("double")
                    ).alias(f"m{p}")
                    for p in range(dim)
                ]
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            if r.ivf_cell is not None:
                new[r.ivf_cell] = [r[f"m{p}"] for p in range(dim)]
        cents = new
    return cents


def diversity_sample_fixed(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 3,
    per_cell: int = 40,
    seed: int = 42,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster-balanced diversity sampling: cap the corpus at
    ``per_cell`` rows per k-means cell, sampled by a reproducible md5
    shuffle within each cell — the cluster-based selection recipe
    (cap the over-represented modes instead of sampling uniformly,
    so the kept set spans the embedding space). Composes the portable
    integer Lloyd (:func:`kmeans_cluster_fixed`) with the md5
    within-group shuffle idiom of ``curation.interleave_sources``, so
    the WHOLE pipeline — 3 training iterations, assignment, in-cell
    sampling rank — replays bit-for-bit in the DuckDB oracle.

    Output: (id, cell, cell_rank) for the kept rows, cell_rank the
    1-based md5 sampling rank within the cell.

    Scale shape: clustering is iters corpus scans (see
    :func:`kmeans_cluster_fixed`); the cap is one grouped window over
    (cell) — group-limit pushdown applies, the same shape as
    ``cap_per_group``."""
    from pyspark.sql import Window

    cells = kmeans_cluster_fixed(
        embeddings, k, iters, scale, id_col, vec_col
    )
    key = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )
    w = Window.partitionBy("cell").orderBy(key, F.col(id_col))
    return (
        cells.withColumn(
            "cell_rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("cell_rank") <= per_cell)
        .select(id_col, "cell", "cell_rank")
    )
