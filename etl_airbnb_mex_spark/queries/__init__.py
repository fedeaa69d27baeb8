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
#: rotate to the entries with the weakest driver provenance. Round 9
#: rotation (VERDICT r8 "Next round" #1, two rounds overdue): FIRST the
#: two plans rewritten in r8 with zero driver rows on current code
#: (gini_concentration, triangle_count), then everything whose code
#: changes THIS round (roc_auc scale-safe registration + the new
#: roc_auc_exact, cosine_near_dup b6 params, basket_lift /
#: copurchase_pairs pair-expansion port, and the ELEVEN rows-only→
#: oracle conversions: near_dup_components, doc_winnowing,
#: image_near_dup, ngram_jaccard, ngram_jaccard_verified,
#: dedup_simhash, knn_cosine_lsh, video_frame_dedup, dedup_minhash,
#: near_dedup_corpus, corpus_pipeline — the last three doubling as the
#: r7 changed-after-freeze queue), then decontaminate, then the 29
#: r3-era rows whose implementing files changed since (queued verbatim
#: from the r7/r8 comments below). Every name here was re-verified by
#: the local oracle replica this session before the window was frozen.
_PRIORITY: tuple[str, ...] = (
    # -- rewritten in r8, no driver row on current code (VERDICT #1) --
    "gini_concentration",
    "triangle_count",
    # -- code changed in r9 (this round) --
    "roc_auc",             # r9: scale-safe quantized-grid registration
    "roc_auc_exact",       # NEW r9: bit-exact form, never driver-ran
    "cosine_near_dup",     # r9: b6 parameters (scale-safe >16k vectors)
    "basket_lift",         # r9: in-row pair-expansion edge build
    "copurchase_pairs",    # r9: in-row pair-expansion edge build
    "near_dup_components",  # r9: rows-only → WITH RECURSIVE oracle
    "doc_winnowing",       # r9: rows-only → oracle conversion
    "image_near_dup",      # r9: rows-only → oracle conversion
    "ngram_jaccard",       # r9: rows-only → oracle conversion
    "ngram_jaccard_verified",  # r9: rows-only → portable-candidate oracle
    "dedup_simhash",       # r9: rows-only → portable-hash oracle
    "knn_cosine_lsh",      # r9: rows-only → plane-literal oracle
    "video_frame_dedup",   # r9: rows-only → recursive-chain dhash oracle
    "q21_waiting_suppliers",  # r9: single-pass in-row sole-late rewrite
    "join_inner_fk",       # r9: integer-cents revenue sum
    # -- r7 changed-after-freeze queue (no row on current code) --
    "dedup_minhash",
    "near_dedup_corpus",
    "decontaminate",
    "corpus_pipeline",
    # -- r3-era rows whose implementing files changed since --
    "set_union_by_name",
    "set_intersect",
    "set_except",
    "set_except_all",
    "doc_fingerprint",
    "token_count",
    "lang_id",
    "quality_score",
    "pii_scrub",
    "repetition_ratio",
    "group_collect",
    "agg_cube",
    "window_dense_rank",
    "window_first_last",
    "window_ntile",
    "window_cume_dist",
    "json_extract",
    "agg_grouping_sets",
    "embedding_centroids",
    "window_range_frame",
    "join_multiway_revenue",
    "subquery_above_avg",
    "merge_upsert_snapshot",
    "unpivot_metrics",
    "linreg_by_group",
    "percentile_by_group",
    "sequence_pack",
    "dq_checks",
    "histogram_equidepth",
)
# Still-stale after this window — queue for round 10: the r4 rows not
# admitted above (describe_stats / scalar_stats / null_profile /
# corr_matrix / outliers_iqr / histogram / percentiles — ceded their
# slots to the eleven r9 rows-only→oracle conversions, the never-ran
# roc_auc_exact, and the changed-in-r9 q21 rewrite, all of which have
# no driver row on their current code/oracle — plus window_lag_delta,
# topn_by_count, mode_value, pct_of_total, sample_weighted,
# dup_fullrow_count, dup_key_count, dedup_by_key, dedup_text_exact,
# and the r5/r6 join family join_broadcast_dim / join_left_semi /
# join_left_anti / join_range_theta / join_asof / join_salted_skew
# (join_inner_fk claimed a slot: its revenue sum changed in r9).
# None have changed code since their green rows — pure age refresh.

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
