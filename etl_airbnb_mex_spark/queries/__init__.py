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


#: Driver-surface ordering. The round-1 driver verified only the FIRST 50
#: registry entries in iteration order, so the highest-value operators —
#: the LLM-training-data pipeline and §2.10 event windows — must sit
#: immediately after the 37 core reference ops (VERDICT.md round 1,
#: "Next round" #2). Entries named here come first, in this order; every
#: other entry follows in registration order. Gated O(n²) demos
#: (ngram_jaccard) and redundant variants are pushed to the very end by
#: _DEMOTED so a truncated check spends its budget on operators users hit.
_PRIORITY: tuple[str, ...] = (
    "sentiment_score",      # F13 — the one §2 row that was local-only in r1
    "dedup_text_exact",
    "knn_cosine",
    "token_topn",
    "quality_filter",
    "window_tumbling_agg",
    "window_session_agg",
    "dataset_split",
    "agg_rollup",
    "pivot_counts",
    "sentiment_dist",
    "window_sliding_agg",
    "token_count_bpe",
)

_DEMOTED: tuple[str, ...] = ("dedup_simhash", "ngram_jaccard")


def _ordered() -> list[QuerySpec]:
    _load()
    core_first = [s for s in REGISTRY.values() if s.spark.__module__.endswith(".core")]
    rest = [
        s for s in REGISTRY.values()
        if not s.spark.__module__.endswith(".core")
        and s.name not in _PRIORITY and s.name not in _DEMOTED
    ]
    prio = [REGISTRY[n] for n in _PRIORITY if n in REGISTRY]
    demoted = [REGISTRY[n] for n in _DEMOTED if n in REGISTRY]
    return core_first + prio + rest + demoted


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.spark for spec in _ordered()}


def all_oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered()
        if spec.oracle is not None
    }


_loaded = False


def _load() -> None:
    global _loaded
    if not _loaded:
        from . import core  # noqa: F401
        from . import extensions  # noqa: F401
        _loaded = True
