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


#: Driver-surface ordering. The driver verifies only the FIRST 50
#: registry entries in iteration order, so each round the window must
#: rotate to the entries with the weakest driver provenance (VERDICT.md
#: round 2, "Next round" #2/#4). Round-3 window = the 35 oracle-bearing
#: entries NEVER driver-checked (CORRECTNESS_r01 ∪ r02, incl.
#: join_salted_skew per ADVICE.md) + the 13 entries whose r1 green rows
#: went stale when operators/joins.py / setops / windows changed + the 2
#: highest-value rows-only entries, = exactly 50. The 63 already-green
#: r1/r2 rows follow in registration order; gated O(n²) demos stay last.
_PRIORITY: tuple[str, ...] = (
    # -- 35 oracle-bearing, never driver-checked --
    "window_range_frame",       # freshly fixed (NTZ cast) — verify first
    "join_salted_skew",
    "group_collect",
    "agg_cube",
    "agg_grouping_sets",
    "window_dense_rank",
    "window_first_last",
    "window_ntile",
    "window_cume_dist",
    "json_extract",
    "token_count",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "cosine_near_dup",
    "pii_scrub",
    "repetition_ratio",
    "tfidf_topk",
    "bigram_topn",
    "sample_stratified",
    "decontaminate",
    "embedding_centroids",
    "join_multiway_revenue",
    "subquery_above_avg",
    "merge_upsert_snapshot",
    "unpivot_metrics",
    "linreg_by_group",
    "percentile_by_group",
    "sequence_pack",
    "join_range_binned",
    "interval_occupancy",
    "join_asof_forward",
    "scd2_intervals",
    "dq_checks",
    "histogram_equidepth",
    # -- 13 stale-r1 entries (code changed after their green rows) --
    "join_inner_fk",
    "join_broadcast_dim",
    "join_left_semi",
    "join_left_anti",
    "join_range_theta",
    "join_asof",
    "set_union_by_name",
    "set_intersect",
    "set_except",
    "set_except_all",
    "window_rank_topn",
    "window_moving_avg",
    "window_lag_delta",
    # -- 2 rows-only entries with the most scale-critical plans --
    "dedup_minhash",
    "near_dedup_corpus",
)

_DEMOTED: tuple[str, ...] = ("dedup_simhash", "ngram_jaccard")


def _ordered() -> list[QuerySpec]:
    _load()
    prio = [REGISTRY[n] for n in _PRIORITY if n in REGISTRY]
    rest = [
        s for s in REGISTRY.values()
        if s.name not in _PRIORITY and s.name not in _DEMOTED
    ]
    demoted = [REGISTRY[n] for n in _DEMOTED if n in REGISTRY]
    return prio + rest + demoted


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
