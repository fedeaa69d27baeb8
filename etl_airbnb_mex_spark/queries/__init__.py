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
    # -- code changed in r16 (lockstep rule) --
    "approx_distinct",     # r16: converted to bounded-assertion form
    #                      with an oracle — (exact, within_10pct) —
    #                      VERDICT r15 #1; first driver hash ever
    "percentiles_approx",  # r16: same conversion (exact quartiles +
    #                      sketch-in-bracket boolean)
    "hll_distinct_rollup",  # r16: same conversion (per-month exact +
    #                      within_10pct)
    "bpe_merges",          # r16: gained the unrolled 10-round DuckDB
    #                      trainer oracle — the driver now asserts the
    #                      exact merge sequence
    "q5_local_supplier_volume",  # VERDICT r15 wrong-#1: its shared
    #                      _q5_from_frames builder was code-touched in
    #                      r15 (custkey_first branch) without a fresh
    #                      driver row — lockstep applied one round late
    # -- new entry this round (never driver-checked before):
    #    the IVF build→probe lifecycle, VERDICT r15 #5 --
    "ivf_build_probe",
    # -- r16 lockstep, second batch (VERDICT r15 #3): the shared
    #    _q9_from_frames builder gained the cents_encoded path and the
    #    twin moved onto the cents-encoded li_ok_q9c layout (ratio
    #    2.08→1.58 at sf24, sidecar q9_twin_ab) — both call sites get
    #    fresh driver rows the same round --
    "q9_product_margin",
    "q9_bucketed",
    # -- the r11-provenance cohort (VERDICT r15 #2): oldest
    #    oracle-bearing entries, none code-touched since r11 --
    "doc_length_band_filter",
    "embedding_quantize",
    "entropy_by_group",
    "event_transitions",
    "ewma_smooth",
    "fuzzy_vocab_pairs",
    "graph_reachability",
    "grouped_split",
    "having_join_bigorders",
    "interarrival_stats",
    "intervals_merge",
    "inverted_index",
    "join_spatial_grid",
    "kcore_parts",
    "knn_cosine",
    "mixture_resample",
    "pareto_revenue_share",
    "pit_lookup",
    "promo_revenue_share",
    "quality_gate_by_group",
    "rare_label_collapse",
    "repeat_purchase_rate",
    "rolling_median",
    "rolling_zscore",
    "sample_k_per_group",
    "sample_weighted_topk",
    "segment_overlap",
    "session_path_topn",
    "ship_delay_priority",
    "skyline_pareto",
    "sliding_distinct_users",
    "snapshot_diff",
    "source_mix_report",
    "subquery_correlated_qty",
    "supplier_revenue_concentration",
    "tfidf_topk",
    "time_rollup_multigrain",
    "unicode_normalize",
    "unigram_logprob",
    "weighted_median",
    # -- spare slots filled with the head of the r12 cohort (the
    #    next-oldest provenance, alphabetical — an early start on the
    #    r17 rotation queue) --
    "activity_streaks",
    "basket_lift",
)
# Round-16 window: 7 lockstep slots (the four sketch entries
# converted to bounded-assertion oracles — their first driver hash
# ever, VERDICT r15 #1; q5_local_supplier_volume, whose shared
# builder was touched in r15 without a fresh row, VERDICT r15 #2; and
# the q9 pair, whose shared builder gained the cents_encoded path
# this round, VERDICT r15 #3) + the new ivf_build_probe lifecycle
# entry (VERDICT r15 #5) + the full 40-entry r11 cohort (bpe_merges
# was its 41st member and sits in the lockstep slots) + the 2
# alphabetically-first r12-cohort entries in the spare slots = 50 of
# 50. After this round the oldest provenance anywhere becomes r12.
# Every cohort name re-verified by the local oracle replica this
# session before the window was frozen.

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
