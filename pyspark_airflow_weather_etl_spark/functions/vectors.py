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
