"""Registry machinery for the query catalog.

Each entry pairs a Spark query (``fn(spark, sf_dir) -> DataFrame``) with
an equivalent ANSI-SQL oracle that DuckDB runs on the same Parquet
tables. The driver compares row count + schema + order-insensitive
value hash, sorting columns by name — so every computed column is
aliased identically on both sides, and float aggregates go through
exact DECIMAL accumulation before a final cast to DOUBLE (bitwise-equal
results regardless of accumulation order).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str
    tags: tuple = ()


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple = (),
):
    """Decorator: add a query to the catalog.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator
    (custom stateful streaming, iterative algorithms); the driver then
    records a weaker rows-only check.
    """

    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        doc = (fn.__doc__ or "").strip().splitlines()
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle.strip() if oracle else None,
            description=description or (doc[0] if doc else ""),
            tags=tuple(tags),
        )
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle
    }
