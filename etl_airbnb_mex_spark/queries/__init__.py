"""Oracle-checked query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver
runs both at sf=0.01 and compares row-count + schema + order-insensitive
value-hash — so every computed column is aliased identically on both
sides, float aggregates are rounded to the same dp on both sides, and
sums over doubles go through DECIMAL so they are exact and
partition-order-independent (SURVEY.md §7.4.12).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


_loaded = False


def _load() -> None:
    global _loaded
    if not _loaded:
        from . import core  # noqa: F401
        from . import extensions  # noqa: F401
        _loaded = True
