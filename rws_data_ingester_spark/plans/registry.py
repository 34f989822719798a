"""Registry mapping query name → (Spark callable, DuckDB oracle SQL).

Each registered callable has signature ``(spark, sf_dir) -> DataFrame``.
``oracle`` is ANSI SQL DuckDB runs over the same parquet tables (the driver
pre-registers views named after the tables); ``None`` marks an op the
oracle can't express (approx/streaming/network) → rows-only check.

Registration rules that keep the hash-check green (SURVEY.md §5.2):
- alias every computed column identically in Spark and SQL;
- ROUND floating-point aggregates on BOTH sides (parallel double summation
  is order-nondeterministic in the low bits);
- render timestamps to strings on both sides (Spark session-TZ timestamps
  vs DuckDB naive timestamps would hash differently);
- cast DuckDB integer sums/counts to BIGINT (DuckDB widens to HUGEINT);
- every LIMIT is preceded by an ORDER BY over a unique key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check


REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = RegisteredQuery(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def oracle_pairs() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
