"""Query catalog: named (Spark plan, DuckDB oracle) pairs.

Each entry is one operator/query from SURVEY.md §2 (or a north-star
extension). Keeping the Spark callable and its ANSI-SQL oracle in one
``@register`` site is what keeps column names and semantics in sync —
the correctness driver hash-compares them at sf0.01.

Oracle-less entries (``oracle=None``) are genuinely non-SQL-expressible
ops (MinHash-LSH banding, streaming state); the driver records a
rows-only check for those and pytest adds self-consistency assertions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
