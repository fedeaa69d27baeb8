"""Oracle-checked query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (when SQL-expressible) the equivalent DuckDB oracle SQL. The driver
runs both at sf=0.01 and compares row-count + schema + order-insensitive
value-hash — so every computed column is aliased identically on both
sides, float aggregates are rounded to the same dp on both sides, and
sums over doubles go through DECIMAL so they are exact and
partition-order-independent (SURVEY.md §7.4.12).

Oracle design rules (each learned from a driver failure class):
  1. Alias every computed column identically on both sides.
  2. Round float aggregates to the same dp on both sides; sum doubles
     through DECIMAL for partition-order independence.
  3. CAST integer sums to BIGINT in the oracle SQL: DuckDB types
     ``sum(BIGINT)`` as HUGEINT, which the driver's pandas conversion
     renders float64 (``555.0``) while Spark emits bigint ``555`` —
     hash mismatch with identical values (CORRECTNESS_r04:
     entropy_by_group, rare_label_collapse). The local replica
     (oracle.py) now fetches via pandas and compares type-strictly,
     so a bare-HUGEINT column fails in pytest before it can reach
     the driver.
  4. No array/map/struct output columns — render to_json/array_join.
  5. No DateType output columns: DuckDB DATE pandas-converts to a
     midnight Timestamp ('2020-01-03 00:00:00') while Spark DateType
     stays datetime.date ('2020-01-03') — identical values, driver
     hash mismatch. Render dates as date_format/strftime strings or
     cast BOTH sides to timestamp (the local gate rejects DateType
     up front, oracle.py).
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
#: round 4, "Next round" #2). Round-5 window = the 41 oracle-bearing
#: round-4 additions never driver-checked + the 2 entries whose
#: HUGEINT oracle hashes failed in r4 (now CAST ... AS BIGINT) + the 4
#: never-ran rows-only plans + the 3 stalest refresh candidates
#: = exactly 50. With this window, every oracle-bearing entry has a
#: driver CORRECTNESS row from some round — provenance debt closes.
#: Already-green rows follow in registration order; gated O(n²) demos
#: stay last.
_PRIORITY: tuple[str, ...] = (
    # -- the 2 r4 hash failures, oracle SQL fixed (CAST AS BIGINT) --
    "entropy_by_group",
    "rare_label_collapse",
    # -- highest-information oracle twins (VERDICT r4 stretch #8) --
    "graph_reachability",
    "pit_lookup",
    # -- 39 more oracle-bearing round-4 additions, never checked --
    "weighted_median",
    "ab_test_ztest",
    "skyline_pareto",
    "unigram_logprob",
    "ewma_smooth",
    "grouped_split",
    "snapshot_diff",
    "subquery_correlated_qty",
    "having_join_bigorders",
    "antijoin_wealthy_inactive",
    "join_spatial_grid",
    "fuzzy_vocab_pairs",
    "corpus_divergence",
    "inverted_index",
    "time_rollup_multigrain",
    "intervals_merge",
    "agg_incremental_merge",
    "segment_overlap",
    "sample_weighted_topk",
    "embedding_quantize",
    "sample_k_per_group",
    "rolling_median",
    "quality_gate_by_group",
    "event_transitions",
    "mixture_resample",
    "unicode_normalize",
    "boilerplate_ngram_frac",
    "sliding_distinct_users",
    "attribution_last_touch",
    "rolling_zscore",
    "session_path_topn",
    "doc_length_band_filter",
    "interarrival_stats",
    "source_mix_report",
    "ship_delay_priority",
    "promo_revenue_share",
    "supplier_revenue_concentration",
    "pareto_revenue_share",
    "repeat_purchase_rate",
    # -- 4 rows-only plans never driver-ran (driver records rows/err) --
    "bpe_merges",
    "hll_distinct_rollup",
    "image_near_dup",
    "kcore_parts",
    # -- 3 stalest refresh candidates (files changed since last green) --
    "tfidf_topk",
    "knn_cosine",
    "join_inner_fk",
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
        from . import advanced  # noqa: F401
        from . import decision  # noqa: F401
        from . import llmprep  # noqa: F401
        _loaded = True
