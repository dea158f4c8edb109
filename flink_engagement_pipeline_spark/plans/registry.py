"""Query registry: the single source of truth for the engine's declared
query surface.

Each implemented operator is declared here as a :class:`QuerySpec` — a
named pair of (Spark callable, DuckDB oracle SQL).
``__spark_entry__.py``'s ``queries()`` / ``oracle_sql()``, the pytest
oracle suite, and ``bench.py`` all read from this registry, so a query
cannot pass tests without also being exposed to the driver's
correctness gate. Coverage of SURVEY.md §2 is exactly the set of
registered names — nothing is claimed beyond what is registered.

Determinism contract (hash-matching oracle):
- session timezone pinned UTC (session.py);
- float aggregation goes through DECIMAL so Spark and DuckDB sum
  exactly the same values regardless of partial-agg order, then casts
  back to DOUBLE (see queries_core);
- every computed column is aliased identically in both dialects.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # part of the bench.py headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None,
    doc: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""),
            bench=bench, tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
