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
