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
#: rotate to the entries with the weakest driver provenance. Round 11
#: rotation (VERDICT r10 "Next round" #1): FIRST the four entries
#: whose code changed this round — the lockstep rule (changed code
#: must get a fresh driver row the same round) outranks everything;
#: percentiles_approx is here because the NaN-as-missing unification
#: sits in the shared percentiles() dispatcher on its code path —
#: then the verdict's r5-provenance queue (every entry whose latest
#: driver row is r5, recomputed from CORRECTNESS_r01-r10 this
#: session), except hll_distinct_rollup, which ceded its slot to
#: percentiles_approx: both are rows-only, hll's operator is
#: untouched since its r5 row, and the "nothing oracle-checked
#: predates r6" goal binds oracle-bearing entries only (hll rotates
#: in r12). The r10 verdict's "+3 oldest r6" likewise ceded to the
#: code changes; round 12's queue is the 33 r6-provenance entries
#: (listed below) + hll_distinct_rollup + this round's deferred
#: ADVICE items. Every name here was re-verified by the local oracle
#: replica this session before the window was frozen.
_PRIORITY: tuple[str, ...] = (
    # -- code changed in r11 (lockstep rule) --
    "histogram_equidepth",  # r11: re-registered on the lazy prefix path
    "percentiles",          # r11: NaN-as-missing on every method
    "percentiles_approx",   # r11: shares the percentiles() dispatcher,
    #                         whose new up-front NaN filter is on its
    #                         code path too (rows-only driver check)
    "kcore_parts",          # r11: peel budget tied to oracle rounds
    # -- the full r5-provenance queue (VERDICT r10 #1), alphabetical --
    "ab_test_ztest",
    "agg_incremental_merge",
    "antijoin_wealthy_inactive",
    "attribution_last_touch",
    "boilerplate_ngram_frac",
    "bpe_merges",
    "corpus_divergence",
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
)
# Round-12 queue (schedule fixed now, per VERDICT r10 #1):
# hll_distinct_rollup (rows-only, ceded its r11 slot — see above)
# plus the 33 r6-provenance entries — activity_streaks, bigram_surprisal,
# bigram_topn, date_range, doc_chunk_overlap, golden_record_merge,
# hard_negative_mining, heavy_hitters_sketch, interval_occupancy,
# join_asof, join_asof_forward, join_broadcast_dim, join_left_anti,
# join_left_semi, join_range_binned, join_range_theta,
# join_salted_skew, lang_id_confusion, monthly_counts,
# q10_returned_items, q13_customer_distribution, q15_top_supplier,
# q16_parts_supplier_cnt, q19_disjunctive_revenue, q20_excess_shipments,
# q2_min_cost_supplier, q3_shipping_priority, q4_order_priority,
# q6_forecast_revenue, q7_volume_shipping, q8_market_share,
# rfm_segments, scd2_intervals — plus the two ADVICE r10 items
# deferred from r11 BECAUSE they would have touched code without a
# free window slot: the knn_cosine_ivf single-query-contract guard
# (operators/similarity.py:ivf_probe_pinned) and the pagerank_parts
# rounding-boundary note (operators/graph.py:round_ranks), and the
# measured-but-deferred double-explode pair expansion
# (BENCH_SIDECAR scale_trend.notes.copurchase_pairs: -18% at sf4;
# touching _basket_pair_counts implicates copurchase_pairs /
# triangle_count / basket_lift — 3 more slots). 33 + 5 changed
# entries = 38 slots; 12 spare for other r12 code changes.

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
