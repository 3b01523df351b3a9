"""Query registry: one entry per operator from SURVEY.md §2.

Each entry pairs
  - a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` (DataFrame API /
    spark.sql — declarative, Catalyst-optimized), and
  - an equivalent ANSI-SQL oracle string executable by DuckDB over the same
    parquet tables (None for non-SQL-expressible ops -> driver does a weaker
    rows-only check).

Column names are aliased identically on both sides (the driver sorts columns
by name before value-hashing).

Float determinism: ``sum(double)`` is order-dependent, so Spark (parallel
partial aggregation) and DuckDB (its own order) would differ in low bits and
fail a hash compare.  Every aggregated double therefore goes through exact
DECIMAL arithmetic and is cast to double at the end — identical bits on both
engines regardless of execution order.  See plans/relational.py helpers.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Entry:
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()


QUERIES: dict[str, Entry] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Entry(fn=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def query_map() -> dict[str, QueryFn]:
    _load_all()
    return {name: e.fn for name, e in QUERIES.items()}


def oracle_map() -> dict[str, str]:
    _load_all()
    return {name: e.oracle for name, e in QUERIES.items() if e.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # imports are side-effecting: each module registers its queries
    import kwack_spark.plans.relational  # noqa: F401
    import kwack_spark.plans.functions_corpus  # noqa: F401
    import kwack_spark.plans.pipeline  # noqa: F401
    import kwack_spark.plans.ingest_corpus  # noqa: F401

    _LOADED = True
