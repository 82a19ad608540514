"""Vector expressions over ``array<float>`` columns — JVM-side only.

Cosine/dot/norm are ``zip_with`` + ``aggregate`` higher-order
functions. HOFs are CodegenFallback in Spark — they evaluate
interpreted — but the fold is still the fastest exact JVM form:
unrolling the dot into a fixed-width expression tree
(a[0]*b[0] + a[1]*b[1] + …, which DOES codegen) measured ~60%
SLOWER at dim=64, because 2×64 bounds/null-checked GetArrayItem
calls cost more than one interpreted pass over the array data.
(Bit-identical sums either way; don't re-try the unroll without
re-measuring.) The remaining speedup for pair-verify hot paths is
numpy vectorization, which reorders the float sum and breaks exact
oracle parity — see ROADMAP.

``aggregate`` is a sequential left fold — its summation order is
deterministic, which keeps scores reproducible across partitionings
(SURVEY.md §4's similarity note) and equal to the sequential-sum
DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<float|double> columns (double out)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a, b) ∈ [-1, 1]; null-safe on zero vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def pair_dot_arrow() -> "callable":
    """Arrow-batched row-wise dot product over two array columns —
    the vectorized form of ``dot`` for pair-verify HOT paths (the
    per-candidate fold after an LSH/blocking join is the dominant
    cost of embedding near-dup at sf0.1; one einsum per Arrow batch
    replaces one interpreted fold per row).

    Summation order differs from the sequential fold (BLAS/pairwise
    vs left fold), so raw sums can differ by O(1e-13) relative —
    callers MUST consume this through a coarse round (the catalog
    rounds cosines to 6 dp) for cross-engine comparability; the
    oracle-parity suite pins that contract at sf0.01 and the
    near-dup pytest at sf0.001. Exact-fold form stays available via
    ``impl='expr'`` at every call site."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _pdot(va: pd.Series, vb: pd.Series) -> pd.Series:
        mask = va.notna().to_numpy() & vb.notna().to_numpy()
        out = np.full(len(va), np.nan)
        if mask.any():
            A = np.vstack(va[mask].to_numpy()).astype(np.float64)
            B = np.vstack(vb[mask].to_numpy()).astype(np.float64)
            out[mask] = np.einsum("ij,ij->i", A, B)
        return pd.Series(out)

    return _pdot
