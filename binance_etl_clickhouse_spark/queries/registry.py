"""Registry plumbing for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryEntry:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    survey_ref: str  # SURVEY.md §2 operator ids this query pins


QUERIES: dict[str, QueryEntry] = {}


def register(name: str, oracle: str | None, survey_ref: str):
    """Decorator: add a Spark query builder to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QueryEntry(name=name, spark=fn, oracle=oracle, survey_ref=survey_ref)
        return fn

    return deco


def queries_map() -> dict[str, SparkQuery]:
    return {name: e.spark for name, e in QUERIES.items()}


def oracle_sql_map() -> dict[str, str]:
    return {name: e.oracle for name, e in QUERIES.items() if e.oracle is not None}
