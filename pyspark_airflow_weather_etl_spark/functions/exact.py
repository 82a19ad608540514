"""Deterministic aggregate expressions for cross-engine comparison.

Floating-point SUM is order-dependent; a Spark sum and a DuckDB sum
of the same 600 k doubles differ in the last bits, which breaks
value-hash comparison (and makes re-runs of a skew-rebalanced plan
non-reproducible at 100 TB). The fix: per-row double arithmetic is
IEEE-deterministic, so cast each term to DECIMAL(18,6) *before*
summing — the decimal sum is exact, hence order- and engine-
independent — then present the result as a double.

``dsum`` / ``avg_of`` are the engine-side halves; ``SQL_DSUM`` /
``SQL_AVG`` are the ANSI-SQL templates the oracle uses so both sides
compute bit-identical values.

Scale 6 matters: money columns carry 2 decimals, so 3-factor terms
like extprice·(1−disc)·(1+tax) have exactly 6 — they sit ON the
scale-6 grid and the cast never rounds. At scale 4 those values are
exact *half-way* ties, and Spark (HALF_UP) vs DuckDB (HALF_EVEN)
round them apart — observed as a 3e-4 drift in TPC-H Q1 sum_charge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM(col) presented as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def avg_of(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, in doubles.

    One IEEE division of two engine-identical operands — deterministic
    across engines, unlike a native double AVG.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c)
    ).alias(alias)


def SQL_DSUM(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def SQL_AVG(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
