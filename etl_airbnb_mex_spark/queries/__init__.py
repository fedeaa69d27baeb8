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
    # -- code changed in r12 (lockstep rule) --
    "copurchase_pairs",   # r12: double-explode pair expansion landed
    "triangle_count",     # r12: shares _basket_pair_counts
    "basket_lift",        # r12: shares _basket_pair_counts
    "knn_cosine_ivf",     # r12: ivf_probe_pinned 1-row contract guard
    "pagerank_parts",     # r12: rounding-boundary guard band in-plan
    "roc_auc",            # r12: grid-bounded plain-window prefix
    "percentiles",        # r12: NaN filter now inside sortrank/bracket
    #                       AND re-registered on the bucket-select
    #                       plan (exact sort only inside target
    #                       buckets — inverted 0.26x at sf24)
    "percentiles_approx",  # r12: shares the percentiles() dispatcher
    #                        (rows-only driver check)
    "histogram_equidepth",  # r12: integer floor-division bin
    "filter_quantile",    # r12: p95 threshold re-based on the
    #                       bucket-select plan (the percentile()
    #                       aggregate buffer was its 100 TB OOM risk)
    # -- the frozen r12 queue: hll + the 33 r6-provenance entries --
    "hll_distinct_rollup",
    "activity_streaks",
    "bigram_surprisal",
    "bigram_topn",
    "date_range",
    "doc_chunk_overlap",
    "golden_record_merge",
    "hard_negative_mining",
    "heavy_hitters_sketch",
    "interval_occupancy",
    "join_asof",
    "join_asof_forward",
    "join_broadcast_dim",
    "join_left_anti",
    "join_left_semi",
    "join_range_binned",
    "join_range_theta",
    "join_salted_skew",
    "lang_id_confusion",
    "monthly_counts",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q19_disjunctive_revenue",
    "q20_excess_shipments",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "rfm_segments",
    "scd2_intervals",
)
# Round-13 queue: nothing is structurally owed — every oracle-bearing
# entry's provenance will be r8+ once CORRECTNESS_r12 lands. Rotate
# forward the OLDEST provenance (the r8 batch) plus any r13
# code-change lockstep slots.

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
