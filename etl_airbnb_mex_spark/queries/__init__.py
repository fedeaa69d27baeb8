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
#: rotate to the entries with the weakest driver provenance. After
#: round 5 every oracle-bearing entry has a green driver row from some
#: round. Round-6 window = the 23 round-6 additions (TPC-H suite +
#: LLM-prep batch, never driver-checked) + 27 refresh slots for the
#: entries whose implementing files changed most recently after their
#: last green row (joins.py r4+r5: the r3 join family; dedup.py /
#: corpus.py / timeseries.py / setops.py r4: their r2/r3 rows).
#: Still-stale after this window (code unchanged since r2, lowest
#: risk): the functions-family F1-F21 rows in queries/core.py —
#: rotate those in round 7.
_PRIORITY: tuple[str, ...] = (
    # -- round-6 TPC-H decision-support suite (queries/decision.py) --
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_margin",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_cnt",
    "q19_disjunctive_revenue",
    "q20_excess_shipments",
    "q21_waiting_suppliers",
    # -- round-6 LLM-prep batches (queries/llmprep.py) --
    "lang_id_confusion",
    "lang_id_ngram",
    "doc_chunk_overlap",
    "semantic_dedup_clusters",
    "basket_lift",
    "gini_concentration",
    "rfm_segments",
    "ks_drift_binned",
    "hard_negative_mining",
    "bigram_surprisal",
    "split_leakage_audit",
    "heavy_hitters_sketch",
    "activity_streaks",
    "golden_record_merge",
    # -- refresh: joins.py changed r4+r5 after these r3 rows --
    "join_asof",
    "join_asof_forward",
    "join_broadcast_dim",
    "join_left_anti",
    "join_left_semi",
    "join_range_binned",
    "join_range_theta",
    "join_salted_skew",
    # -- refresh: dedup.py changed r4 after these r2/r3 rows --
    "dedup_minhash",
    "near_dedup_corpus",
    "decontaminate",
    "dedup_by_key",
    "dedup_text_exact",
    "dup_fullrow_count",
    "dup_key_count",
    # -- refresh: corpus.py changed r4+r6 after this r3 row --
    "bigram_topn",
    # -- refresh: timeseries.py changed r4 after these r2/r3 rows --
    "monthly_counts",
    "date_range",
    "interval_occupancy",
    "scd2_intervals",
)
# Displaced refresh candidates for the round-7 window (files changed
# r4, rows r2/r3; displaced by the 7 late round-6 additions —
# never-checked entries outrank stale refreshes): token_topn,
# doc_fingerprint, set_union_by_name, set_intersect, set_except,
# sample_stratified, dataset_split.

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
