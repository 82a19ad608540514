"""Vector expressions over ``array<float>`` columns — JVM-side only.

Cosine/dot/norm are expressed with ``zip_with`` + ``aggregate`` higher-
order functions, so similarity search stays inside whole-stage codegen
(no Python boundary). ``aggregate`` is a sequential left fold — its
summation order is deterministic, which keeps scores reproducible
across partitionings (SURVEY.md §4's similarity note).
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
