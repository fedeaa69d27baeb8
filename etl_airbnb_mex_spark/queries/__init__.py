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
#: round 3, "Next round" #1/#4). Round-4 window = the 21 oracle-bearing
#: round-3 additions never driver-checked + the 10 r2-green stats/topn/
#: core entries whose files changed in r3 + cosine_near_dup (rewritten
#: this round to the bucketed scale-safe form) + the scale-critical
#: rows-only plans (corpus_pipeline, pagerank_parts, knn_cosine_ivf,
#: knn_cosine_lsh, near_dup_components, doc_winnowing,
#: ngram_jaccard_verified, approx_distinct, percentiles_approx) + new
#: round-4 entries. Already-green r1-r3 rows follow in registration
#: order; gated O(n²) demos stay last.
_PRIORITY: tuple[str, ...] = (
    # -- 21 oracle-bearing round-3 additions, never driver-checked --
    "funnel_conversion",
    "cohort_retention",
    "sessionize_ids",
    "vocab_prune",
    "feature_scale",
    "sample_weighted",
    "anomaly_zscore",
    "dup_ngram_frac",
    "join_bloom_prefilter",
    "monthly_gapfill",
    "monthly_cumulative",
    "mad_robust",
    "mode_by_group",
    "centroid_assign",
    "key_skew_profile",
    "mom_growth",
    "chi_square_assoc",
    "twap_by_user",
    "ffill_timeseries",
    "copurchase_pairs",
    "monthly_active_users",
    # -- 10 r2-green entries whose files changed in r3 (stale rows) --
    "percentiles",
    "describe_stats",
    "outliers_iqr",
    "null_profile",
    "corr_matrix",
    "histogram",
    "topn_by_count",
    "mode_value",
    "pct_of_total",
    "scalar_stats",
    # -- rewritten this round: bucketed LSH form, no BNLJ --
    "cosine_near_dup",
    # -- scale-critical rows-only plans (driver records rows/err) --
    "corpus_pipeline",
    "pagerank_parts",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "near_dup_components",
    "doc_winnowing",
    "ngram_jaccard_verified",
    "approx_distinct",
    "percentiles_approx",
    # -- round-4 additions (appended as they are registered) --
    "pivot_wide",
    "entropy_by_group",
    "winsorize_stats",
    "rare_label_collapse",
    "target_encode",
    "gopher_quality_signals",
    "zipf_slope",
    "histogram2d",
    "triangle_count",
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
        _loaded = True
