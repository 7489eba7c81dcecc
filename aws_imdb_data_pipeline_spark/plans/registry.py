"""Registry machinery for oracle-paired queries.

Contract (see /root/repo/__spark_entry__.py): each query is a callable
``(spark, sf_dir) -> DataFrame``; the oracle is equivalent DuckDB SQL
over views named after the parquet tables. Column names must match
exactly (the driver sorts columns by name before value-hashing), and
floating-point aggregates are rounded to the same precision on both
sides so summation-order differences between engines can't flip a bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    operators: tuple[str, ...]  # SURVEY.md §2 ids this query exercises


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, operators: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, operators=operators)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in REGISTRY.items() if s.oracle is not None}
