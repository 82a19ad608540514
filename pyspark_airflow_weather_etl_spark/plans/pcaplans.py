"""PCA catalog entries (operators.pca). Rows-only: the
eigendecomposition is a driver-side step over exact distributed
moments, not one SQL query — determinism and parity are pinned by
tests/test_pca.py (bit-exact numpy-reference replay, partitioning
invariance, orthonormality, variance accounting)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import pca as P
from .registry import register


@register("pca_project_embeddings")  # rows-only: driver-side eigh
def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed exact PCA (operators.pca): integer-micro moment
    accumulation (Arrow matmul partials, DECIMAL(38,0) cross-partition
    sums — exact at any corpus size), driver-side eigh over the d×d
    moments, sign-pinned components, then one Arrow pass projecting
    every embedding to the top-16 axes at 6 dp. The
    dimension-reduction front end of the IVF/SRP ANN stack."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = P.pca_train(emb, "embedding", k=16)
    out = P.pca_project(emb, model, "vec_id", "embedding")
    # scalar columns hash-compare portably; arrays don't (the
    # feature_hash_embed note) — emit the coordinates as a string
    return out.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("pca_vec"),
                lambda x: F.format_number(x, 6),
            ),
            " ",
        ).alias("pca_text"),
    )


@register("streaming_pca_project_embeddings")  # rows-only: driver eigh
def streaming_pca_project_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PCA maintained at ingest latency (streaming.pca_stream):
    embeddings arrive as five micro-batches, each folds into exact
    integer moment rows (batch-keyed), and the artifact cut from the
    store is BIT-IDENTICAL to the one-shot batch train — integer
    moments are exactly additive, so the streaming decomposition
    provably loses nothing (model-equality + crash-replay pytests in
    tests/test_streaming.py). Output: the same projection as
    pca_project_embeddings, driven by the streamed model."""
    import glob
    import os
    import tempfile

    from ..streaming.pca_stream import (
        pca_train_from_store,
        run_streaming_pca_moments,
    )

    tmp = tempfile.mkdtemp(prefix="stream_pca_")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    watch = f"{tmp}/in"
    os.makedirs(watch, exist_ok=True)
    for i in range(5):
        stage = f"{tmp}/stage_{i}"
        emb.where(F.col("vec_id") % 5 == i).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
        dst = f"{watch}/batch_{i:03d}.parquet"
        os.rename(part, dst)
        os.utime(dst, (1_700_000_000 + i * 60,) * 2)
    run_streaming_pca_moments(
        spark,
        watch,
        f"{tmp}/moments",
        emb.schema,
        "embedding",
        d=64,
        checkpoint_dir=f"{tmp}/ckpt",
    )
    model = pca_train_from_store(spark, f"{tmp}/moments", d=64, k=16)
    out = P.pca_project(emb, model, "vec_id", "embedding")
    return out.select(
        "vec_id",
        F.array_join(
            F.transform(
                F.col("pca_vec"), lambda x: F.format_number(x, 6)
            ),
            " ",
        ).alias("pca_text"),
    )


@register("pca_reduced_ann_topk")  # rows-only: driver-side eigh
def pca_reduced_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN through the PCA bottleneck (operators.pca.pca_reduced_topk):
    coarse Euclidean ranking in the 32-axis PCA space (~half the full
    scan's arithmetic; the complement of the PQ route, which
    compresses codes instead of axes), overfetched top-80 candidates,
    then exact full-space cosine re-rank to top-10. Rows-only (the
    model is a driver-side eigh over exact distributed moments);
    recall vs exact brute force is pinned in tests/test_pca.py —
    exact-recovery on planted low-rank structure, ≥0.8 on the
    near-isotropic fixture at this operating point."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = list(emb.where(F.col("vec_id") == 7).first()["embedding"])
    model = P.pca_train(emb, "embedding", k=32)
    return P.pca_reduced_topk(emb, model, q, k=10)


# Shared replay of the fixed-rotation integer projection (k=8, d=64,
# scale=1000): ends at a `y` CTE of (vec_id, r, y). MATERIALIZED —
# the ANN-twin tail references it twice (corpus side + query side)
# and DuckDB re-evaluates non-materialized multi-referenced CTEs.
_PCA_FIXED_CTE = """
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS xq
      FROM embeddings
    ), ex AS (
      SELECT p.pos AS j,
             CAST(SUM(q.xq[p.pos + 1]) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM q CROSS JOIN (SELECT unnest(range(64)) AS pos) p
      GROUP BY p.pos
    ), w AS (
      SELECT rr.r, jj.j,
             CAST(((rr.r * 31 + jj.j * 17) % 7) - 3 AS BIGINT) AS w
      FROM (SELECT unnest(range(8)) AS r) rr
      CROSS JOIN (SELECT unnest(range(64)) AS j) jj
    ), nn AS (
      SELECT MAX(n) AS n FROM ex
    ), cst AS (
      SELECT w.r, CAST(SUM(ex.s * w.w) AS BIGINT) AS c
      FROM w JOIN ex ON w.j = ex.j GROUP BY w.r
    ), proj AS (
      SELECT q.vec_id, w.r,
             CAST(SUM(q.xq[w.j + 1] * w.w) AS BIGINT) AS dot
      FROM q CROSS JOIN w
      GROUP BY q.vec_id, w.r
    ), y AS MATERIALIZED (
      SELECT p.vec_id, CAST(p.r AS BIGINT) AS r,
             CAST(nn.n * p.dot - c.c AS BIGINT) AS y
      FROM proj p JOIN cst c ON p.r = c.r CROSS JOIN nn
    )
    """

_PCA_FIXED_ORACLE = _PCA_FIXED_CTE + """
    SELECT vec_id, r, y FROM y
    """

_PCA_ANN_FIXED_ORACLE = _PCA_FIXED_CTE + """
    , y0 AS (SELECT r, y AS y0 FROM y WHERE vec_id = 7),
    d2 AS (
      SELECT y.vec_id,
             SUM(CAST(y.y - y0.y0 AS HUGEINT)
                 * CAST(y.y - y0.y0 AS HUGEINT)) AS d2
      FROM y JOIN y0 USING (r) GROUP BY y.vec_id
    ), cand AS (SELECT vec_id FROM d2 ORDER BY d2, vec_id LIMIT 80),
    qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7)
    SELECT e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        CAST(qv.qv AS DOUBLE[])), 6)
             AS cosine
    FROM embeddings e JOIN cand USING (vec_id), qv
    ORDER BY cosine DESC, e.vec_id LIMIT 10
    """


@register("pca_reduced_ann_topk_fixed", oracle=_PCA_ANN_FIXED_ORACLE)
def pca_reduced_ann_topk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable hash-exact twin of the PCA-bottleneck ANN route
    (operators.pca.pca_reduced_topk_fixed): coarse ranking by EXACT
    integer Euclidean distance in the fixed-rotation 8-axis space
    (the pca_project_fixed algebra — quantize, divisionless center,
    integer rotate), a deterministic overfetched top-80 cut, then
    exact full-space cosine re-rank to top-10 at 6 dp. Pins the
    ENTIRE coarse-then-exact machinery — distances summed as
    DECIMAL(38,0)/HUGEINT so both engines are exact — leaving only
    the eigh to the rows-only pca_reduced_ann_topk entry."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [
        float(x)
        for x in emb.where(F.col("vec_id") == 7).first()["embedding"]
    ]
    return P.pca_reduced_topk_fixed(emb, q, k=10, kdim=8, scale=1000)


@register("pca_project_fixed_embeddings", oracle=_PCA_FIXED_ORACLE)
def pca_project_fixed_embeddings(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable hash-exact twin of the PCA projection
    (operators.pca.pca_project_fixed — the kmeans_cluster_fixed
    pattern): the trained eigenbasis is replaced by a deterministic
    integer rotation and mean-centering is done in exact integer
    arithmetic (y = n·W·xq − W·S — centering without a division), so
    the DuckDB oracle replays quantization, corpus column sums, and
    every projection coordinate bit-for-bit. Pins the ENTIRE
    projection machinery — quantize, center, rotate, emit — leaving
    only the eigh itself to the rows-only entries."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return P.pca_project_fixed(emb, k=8, scale=1000)
