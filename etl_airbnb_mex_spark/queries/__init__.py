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
#: rotate to the entries with the weakest driver provenance. Round 12
#: rotation = exactly the queue frozen in r11 (VERDICT r11 "Next
#: round" #1) plus this round's lockstep slots: FIRST the ten entries
#: whose code changed in r12 — the lockstep rule (changed code must
#: get a fresh driver row the same round) outranks everything — then
#: hll_distinct_rollup (rows-only; ceded its r11 slot, the last entry
#: whose provenance predates r5) and the full 33-entry r6-provenance
#: queue, alphabetical. 10 + 34 = 44 slots; 6 spare. After this round
#: no oracle-bearing entry's provenance predates r8 (the r6 batch was
#: untouched code re-verified here; r7 had no entries of its own).
#: Every name was re-verified by the local oracle replica this
#: session before the window was frozen.
_PRIORITY: tuple[str, ...] = (
    # -- code changed in r13 (lockstep rule) --
    "q5_local_supplier_volume",  # r13: fact-rooted join order, isin
    #                      nationkey pushdown, driver-side dim
    #                      resolution (16 -> 7 jobs)
    "percentiles",        # r13: bucket-select gained dp=None/keep_n
    #                      params (shared operator code path)
    "filter_quantile",    # r13: shares exact_percentiles_bucket_select
    "describe_stats",     # r13: exact quantiles re-based on
    #                      bucket-select (VERDICT r12 #10)
    "outliers_iqr",       # r13: same, + keep_n fused count
    "pagerank_parts",     # r13: magnitude-aware rounding guard band
    #                      (ADVICE r12 #1)
    "join_inner_fk",      # r13: aggregate pushed below the join +
    #                      SHUFFLE_HASH build (serial broadcast build
    #                      was 2.25s of the 4.0s sf24 wall)
    "scalar_stats",       # r13: median re-based on bucket-select
    "mad_robust",         # r13: both medians re-based on bucket-select
    "q9_product_margin",  # r13: margin computed before the orderkey
    #                      exchange (24B vs 48B rows), int-year orders
    #                      projection
    "approx_distinct",    # VERDICT r12 #5: rows-only provenance was
    #                      r4 — eight rounds stale, the only entry
    #                      predating r8
    # -- the r8-provenance cohort (VERDICT r12 #6): oldest
    #    oracle-bearing entries, none code-touched since r8 --
    "agg_rollup",
    "amenities_flags",
    "bool_encode",
    "bool_encode_narrow",
    "calibration_bins",
    "clean_price",
    "clean_price_null",
    "conditional_agg",
    "dataset_split",
    "date_normalize",
    "date_parts",
    "feature_hashing",
    "groupby_multi_agg",
    "ks_drift_binned",
    "lang_id_ngram",
    "map_categories",
    "mutual_info",
    "numeric_coerce",
    "parse_array",
    "pivot_counts",
    "psi_drift",
    "quality_filter",
    "sample_stratified",
    "semantic_dedup_clusters",
    "sentiment_dist",
    "sentiment_score",
    "split_leakage_audit",
    "string_length",
    "text_clean",
    "title_case",
    "token_count_bpe",
    "token_topn",
    "window_moving_avg",
    "window_rank_topn",
    "window_session_agg",
    "window_sliding_agg",
    "window_tumbling_agg",
    "woe_iv",
)
# Round-13 window: 7 lockstep/stale slots + the full 38-entry r8
# cohort = 45 of 50; 5 spare. After this round the oldest provenance
# anywhere becomes r9 (the 43-entry r9 batch is the r14 queue).
# Round-14 queue: rotate the r9-provenance cohort plus r14 lockstep
# slots.

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
