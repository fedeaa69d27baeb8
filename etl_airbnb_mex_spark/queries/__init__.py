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
#: rotate to the entries with the weakest driver provenance. Round 10
#: rotation (VERDICT r9 "Next round" #1): FIRST q1_pricing_summary —
#: its query+oracle were rewritten to integer cents in r9 AFTER its
#: last driver row (r6), the one entry whose current code has never
#: been driver-checked — then everything whose code changes THIS
#: round (the two rows-only→oracle conversions knn_cosine_ivf /
#: pagerank_parts, the q5/q9 integer-cents rewrites, and the three
#: global_order_prefix consumers whose bucket expression gained ±Inf
#: handling), then the verdict's 37-entry r3/r4-provenance queue
#: verbatim, then 5 of the oldest remaining age-refresh rows. After
#: this window no entry's provenance predates r5 except the 5-entry
#: r5/r6 join-family tail listed below. Every name here was
#: re-verified by the local oracle replica this session before the
#: window was frozen.
_PRIORITY: tuple[str, ...] = (
    # -- rewritten in r9, no driver row on current code (VERDICT #1) --
    "q1_pricing_summary",
    # -- code changed in r10 (this round) --
    "knn_cosine_ivf",      # r10: rows-only → pinned-quantizer oracle
    "pagerank_parts",      # r10: rows-only → unrolled-SQL oracle
    "kcore_parts",         # r10: rows-only → fixed-round-peel oracle
    "q5_local_supplier_volume",  # r10: integer-cents revenue sum
    "q9_product_margin",   # r10: integer-cents margin sum
    "gini_concentration",  # r10: global_order_prefix ±Inf buckets
    "roc_auc",             # r10: global_order_prefix ±Inf buckets
    "roc_auc_exact",       # r10: global_order_prefix ±Inf buckets
    # -- the r3/r4-provenance age-refresh queue (VERDICT r9 #1) --
    "window_lag_delta",
    "anomaly_zscore",
    "centroid_assign",
    "chi_square_assoc",
    "cohort_retention",
    "corr_matrix",
    "describe_stats",
    "dup_ngram_frac",
    "feature_scale",
    "ffill_timeseries",
    "funnel_conversion",
    "gopher_quality_signals",
    "histogram",
    "histogram2d",
    "join_bloom_prefilter",
    "key_skew_profile",
    "mad_robust",
    "mode_by_group",
    "mode_value",
    "mom_growth",
    "monthly_active_users",
    "monthly_cumulative",
    "monthly_gapfill",
    "null_profile",
    "outliers_iqr",
    "pct_of_total",
    "percentiles",
    "pivot_wide",
    "sample_weighted",
    "scalar_stats",
    "sessionize_ids",
    "target_encode",
    "topn_by_count",
    "twap_by_user",
    "vocab_prune",
    "winsorize_stats",
    "zipf_slope",
    # -- oldest remaining age-refresh rows (r4/r6 provenance) --
    "dup_fullrow_count",
    "dup_key_count",
    "dedup_by_key",
    "dedup_text_exact",
)
# Still-stale after this window — queue for round 11: the r5/r6 join
# family join_broadcast_dim / join_left_semi / join_left_anti /
# join_range_theta / join_asof / join_asof_forward / join_salted_skew
# (none changed since their green rows — pure age refresh; they ceded
# their slots to this round's code changes, join_broadcast_dim to the
# late kcore_parts conversion).

#: Emptied in round 7: dedup_simhash / ngram_jaccard graduated into the
#: window (they were the last entries with no driver row ever). The
#: mechanism stays for any future deliberately-tail-ordered demo.
_DEMOTED: tuple[str, ...] = ()


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
        from . import mleval  # noqa: F401
        _loaded = True
