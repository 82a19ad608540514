"""k-means clustering catalog entry over the ``embeddings`` table.

The oracle is the ITERATION-UNROLLED replay of the exact integer
Lloyd loop (operators.kmeans.kmeans_cluster_fixed): because every
step — floor quantization, Σ(a−b)² argmin with lowest-cell ties,
floor-divided integer centroid means, empty-cell carry-over — is
integer-deterministic, three iterations unroll into a single chain of
CTEs that DuckDB replays bit-for-bit. This is the
``semantic_dedup_fixed_cells`` portable-twin pattern extended to an
ITERATIVE algorithm (the BPE trainer's rows-only gap closed for
clustering: here the whole training loop is hash-exact).

Floor-division exactness note (both engines compute
``floor(CAST(SUM AS DOUBLE) / n)``): Σv is < 2⁵³ so the double holds
it exactly; if the true quotient is an integer the division is exact,
and if not it is ≥ 1/n away from any integer while the division error
is < 1 ulp (~2⁻³⁰ at these magnitudes) — the floor cannot differ."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import kmeans as KM
from ..sources.tables import load_table
from .registry import register


def _unrolled_oracle(k: int, iters: int, dim: int, scale: int) -> str:
    head = f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS qv
      FROM embeddings
    ), c0 AS (
      SELECT vec_id AS cell, qv AS cv FROM q WHERE vec_id < {k}
    )"""
    body = []
    for i in range(1, iters + 1):
        body.append(f""", a{i} AS (
      SELECT vec_id, cell FROM (
        SELECT q.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(list_zip(q.qv, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), c.cell) AS rn
        FROM q CROSS JOIN c{i - 1} c) r
      WHERE rn = 1
    ), m{i} AS (
      SELECT a.cell, p.pos,
             CAST(floor(CAST(SUM(q.qv[p.pos + 1]) AS DOUBLE) / COUNT(*))
                  AS BIGINT) AS val
      FROM a{i} a JOIN q USING (vec_id)
      CROSS JOIN (SELECT unnest(range({dim})) AS pos) p
      GROUP BY a.cell, p.pos
    ), c{i} AS (
      SELECT c.cell, COALESCE(l.cv2, c.cv) AS cv
      FROM c{i - 1} c LEFT JOIN (
        SELECT cell, list(val ORDER BY pos) AS cv2
        FROM m{i} GROUP BY cell) l USING (cell)
    )""")
    final = f""", afin AS (
      SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM (
        SELECT q.vec_id, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
                 list_sum(list_transform(list_zip(q.qv, c.cv),
                   z -> (z[1] - z[2]) * (z[1] - z[2]))), c.cell) AS rn
        FROM q CROSS JOIN c{iters} c) r
      WHERE rn = 1
    )"""
    return head + "".join(body) + final


def _unrolled_oracle_select(k: int, iters: int, dim: int, scale: int) -> str:
    return (
        _unrolled_oracle(k, iters, dim, scale)
        + "\n    SELECT vec_id, cell FROM afin\n    "
    )


@register(
    "kmeans_cluster_fixed_embeddings",
    oracle=_unrolled_oracle_select(k=8, iters=3, dim=64, scale=1000),
)
def kmeans_cluster_fixed_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Full-corpus k-means clustering, portable twin
    (operators.kmeans.kmeans_cluster_fixed): k=8 cells seeded from the
    8 lowest-id rows, 3 exact integer Lloyd iterations (floor-
    quantized vectors, Σ(a−b)² argmin ties→lowest, floor-div centroid
    means, empty cells carry over), final (vec_id, cell) assignment.
    The DuckDB oracle replays the ENTIRE unrolled training loop
    bit-for-bit — hash-exact evidence for an iterative trainer."""
    emb = load_table(spark, sf_dir, "embeddings")
    return KM.kmeans_cluster_fixed(emb, k=8, iters=3, scale=1000)


@register(
    "diversity_sample_embeddings",
    oracle=_unrolled_oracle(k=8, iters=3, dim=64, scale=1000)
    + """
    SELECT vec_id, cell, cell_rank FROM (
      SELECT vec_id, cell,
             CAST(ROW_NUMBER() OVER (PARTITION BY cell ORDER BY
               md5(CAST(vec_id AS VARCHAR) || ':42'), vec_id)
               AS BIGINT) AS cell_rank
      FROM afin) r
    WHERE cell_rank <= 40
    """,
)
def diversity_sample_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-balanced diversity sampling
    (operators.kmeans.diversity_sample_fixed): cap the corpus at 40
    rows per k-means cell, chosen by a reproducible md5 shuffle within
    each cell — over-represented modes are capped instead of dominating
    a uniform sample, so the kept set spans the embedding space. The
    oracle replays clustering (the full unrolled 3-iteration integer
    Lloyd) AND the in-cell sampling rank bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings")
    return KM.diversity_sample_fixed(
        emb, k=8, iters=3, per_cell=40, seed=42, scale=1000
    )
