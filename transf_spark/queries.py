"""Declared-query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and ``bench.py``.

Each operator module registers its queries with :func:`register`; importing
this module pulls in every operator module so the registry is complete.

A query = (name, builder, oracle SQL | None).
- builder: ``(spark, sf_dir) -> DataFrame`` — lazy; caller decides to collect.
- oracle: ANSI SQL DuckDB runs on the same parquet (views pre-registered by
  the driver).  ``None`` ⇒ rows-only check (binary/stateful/streaming ops).

Column-name parity rule: every computed column is aliased identically in the
Spark plan and the oracle SQL — the driver sorts columns by name and
value-hashes, so names and values must both line up.
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
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    category: str
    origin: str  # "R#" reference citation or "EXT"


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, *, oracle: str | None, category: str, origin: str):
    """Decorator: add a query builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, category, origin)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all_modules()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all_modules()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_all_modules() -> None:
    """Import every operator module (each registers its queries on import)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid circulars (operator modules import `register`).
    from transf_spark.operators import (  # noqa: F401
        relational,
        scalars,
        transfer,
        dedup,
        similarity,
        text,
        multimodal,
        pipeline,
        sql_api,
        clustering,
    )
    from transf_spark.sources import formats  # noqa: F401
    from transf_spark.streaming import stateful, windows  # noqa: F401

    _LOADED = True
