"""Query registry: name -> (PySpark callable, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here via the
``@query`` decorator; ``__spark_entry__.py`` exposes the registry to the
driver. Invariants enforced by convention (tested in
``tests/test_oracle_parity.py``):

- the Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- every computed column is aliased identically in the Spark code and the
  oracle SQL (the driver sorts columns by name before value-hashing);
- floating-point aggregates are rounded (2-6 dp) on BOTH sides so
  engine-order-dependent low bits can't flip the hash;
- queries with ``oracle=None`` are non-SQL-expressible (custom/stateful)
  and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries as an import side effect.
_QUERY_MODULES = (
    "delta_lake_optimizations_spark.queries.relational",
    "delta_lake_optimizations_spark.queries.tpch_extra",
    "delta_lake_optimizations_spark.queries.tpch_full",
    "delta_lake_optimizations_spark.queries.windows",
    "delta_lake_optimizations_spark.queries.setops",
    "delta_lake_optimizations_spark.queries.scalar",
    "delta_lake_optimizations_spark.queries.events",
    "delta_lake_optimizations_spark.queries.vectors",
    "delta_lake_optimizations_spark.operators.dedup",
    "delta_lake_optimizations_spark.operators.components",
    "delta_lake_optimizations_spark.operators.similarity",
    "delta_lake_optimizations_spark.operators.ivf",
    "delta_lake_optimizations_spark.operators.asof",
    "delta_lake_optimizations_spark.operators.pipeline",
    "delta_lake_optimizations_spark.operators.rangejoin",
    "delta_lake_optimizations_spark.operators.bm25",
    "delta_lake_optimizations_spark.operators.textstats",
    "delta_lake_optimizations_spark.operators.quality",
    "delta_lake_optimizations_spark.operators.sampling",
    "delta_lake_optimizations_spark.operators.multimodal",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None
    headline: bool = False  # include in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}
_LOADED = False


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation (decorator)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, headline=headline, tags=tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _LOADED = True


def registry() -> dict[str, QueryDef]:
    _load()
    return dict(_REGISTRY)


def all_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items()}


def all_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}


def headline_queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in registry().items() if q.headline}
