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
    # -- code changed in r15 (lockstep rule) --
    "join_inner_fk_bucketed",  # r15: bucketed_table now asserts the
    #                      one-file-per-bucket invariant on every
    #                      attach path before the sort-trust flag
    #                      applies (VERDICT r14 #2 / ADVICE r14 #2)
    "q21_bucketed",       # r15: same bucketed_table change
    "q5_bucketed",        # r15: same bucketed_table change
    "q9_product_margin",  # r15: body refactored into the frame-
    #                      parameterized _q9_from_frames builder for
    #                      the layout A/B (plan identical; lockstep on
    #                      code-touch)
    # -- new entry this round (never driver-checked before):
    #    q9's orderkey-co-bucket twin, VERDICT r14 #1 --
    "q9_bucketed",
    # -- the r10-provenance cohort (VERDICT r14 #5): oldest
    #    oracle-bearing entries, none code-touched since r10 --
    "anomaly_zscore",
    "centroid_assign",
    "chi_square_assoc",
    "cohort_retention",
    "corr_matrix",
    "dedup_by_key",
    "dedup_text_exact",
    "dup_fullrow_count",
    "dup_key_count",
    "dup_ngram_frac",
    "feature_scale",
    "ffill_timeseries",
    "funnel_conversion",
    "gini_concentration",
    "gopher_quality_signals",
    "histogram",
    "histogram2d",
    "join_bloom_prefilter",
    "key_skew_profile",
    "mode_by_group",
    "mode_value",
    "mom_growth",
    "monthly_active_users",
    "monthly_cumulative",
    "monthly_gapfill",
    "null_profile",
    "pct_of_total",
    "pivot_wide",
    "q1_pricing_summary",
    "roc_auc_exact",
    "sample_weighted",
    "sessionize_ids",
    "target_encode",
    "topn_by_count",
    "twap_by_user",
    "vocab_prune",
    "window_lag_delta",
    "winsorize_stats",
    "zipf_slope",
    # -- spare slots filled with the head of the r11 cohort (the
    #    next-oldest provenance, alphabetical — an early start on the
    #    r16 rotation queue) --
    "ab_test_ztest",
    "agg_incremental_merge",
    "antijoin_wealthy_inactive",
    "attribution_last_touch",
    "boilerplate_ngram_frac",
    "corpus_divergence",
)
# Round-15 window: 4 lockstep slots (the bucketed twins — their
# shared bucketed_table gained the one-file-per-bucket assertion,
# VERDICT r14 #2 — plus q9's builder extraction) + the new
# q9_bucketed twin + the full 39-entry r10 cohort + the 6
# alphabetically-first r11-cohort entries in the spare slots =
# 50 of 50. After this round the oldest provenance anywhere becomes
# r11 (40 entries remain there for the r16 queue). Every cohort
# name re-verified by the local oracle replica this session before
# the window was frozen.

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
        from . import bucketed  # noqa: F401  (after decision/extensions:
        #                        the twins reuse their oracle SQL)
        _loaded = True
