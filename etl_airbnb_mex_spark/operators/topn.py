"""Frequency / top-N / percent-of-total operators (SURVEY.md §2.5 A2–A3,
§2.7 O1).

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject — a true
distributed top-k (per-partition heap + driver merge), never a global
sort. Every top-N carries a deterministic tie-break on the key
(SURVEY.md §7.4.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topn_by_count(df: DataFrame, key: str, k: int) -> DataFrame:
    """A2/O1 — value_counts().head(k) with deterministic ties: order by
    count desc, then key asc (nb:cell8:9,27,49)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(k)
    )


def pct_of_total(df: DataFrame, key: str, dp: int = 4) -> DataFrame:
    """A3 — per-category count + percent of total. The total comes from an
    empty-frame window (single exchange of the tiny aggregate, not a
    second scan of the input).

    Reference: count/len(df)*100 (nb:cell8:12,30,52).
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return counts.select(
        key,
        "cnt",
        F.round(F.col("cnt") / total * 100, dp).alias("pct"),
    ).orderBy(F.desc("cnt"), F.asc(key))


def mode(df: DataFrame, key: str) -> DataFrame:
    """A2 variant — most frequent value (nb:cell14:40-45), deterministic
    tie-break by key."""
    return topn_by_count(df, key, 1)


def key_skew_profile(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Heavy-hitter profile for a join/aggregation key: the top-k keys
    with row count, percent of total, and cumulative percent — the
    diagnostic you run BEFORE picking a skew strategy (salt factor,
    AQE skew-join thresholds, broadcast candidates). A key holding >20%
    of rows is the 45.9%-hot-neighbourhood case the reference's data
    exhibits (SURVEY.md §4.3).

    Plan: one hash agg by key, top-k via TakeOrderedAndProject (never a
    global sort), the total as a broadcast 1-row scalar (NOT a window
    over the counts axis — distinct keys can be billions at 100 TB),
    and the cumulative window runs over the k surviving rows only.

    DECIDED (r16/r17 optimization rounds, do not re-examine): the
    total-count aggregate + broadcast crossJoin stays. Folding the
    total into an unpartitioned window over the counts frame — the
    r16 fold that removed ~2 AQE stage jobs from the percentile/WoE
    family — is legal only where the windowed frame is BOUNDED BY
    CONSTRUCTION; here the frame is one row per distinct key, which is
    input-shaped. A keyed-total variant (caller supplies a
    bounded-cardinality contract for ``key``) would admit the fold,
    but no registered consumer can promise it, and an operator knob
    that is safe only under an unverifiable promise is a scale hazard,
    not an optimization. Same verdict applies to
    :func:`topn_by_count`/:func:`mode` if a total is ever added there.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc(key))
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    w = (
        Window.orderBy(F.desc("cnt"), F.asc(key))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return top.select(
        key,
        "cnt",
        F.round(F.col("cnt") / F.col("__total") * 100, 4).alias("pct"),
        F.round(
            F.sum("cnt").over(w) / F.col("__total") * 100, 4
        ).alias("cum_pct"),
    ).orderBy(F.desc("cnt"), F.asc(key))


def mode_by_group(df: DataFrame, group: str, key: str) -> DataFrame:
    """Per-group mode: the most frequent ``key`` within each ``group``
    (ties break by key asc). The grouped generalization of :func:`mode`.

    Plan: one (group, key) hash agg, then one window partitioned by
    group ranking by count — both stages shuffle on group-prefixed keys
    so the window reuses the aggregation's partitioning pattern; no
    global sort, no collect.
    """
    counts = df.groupBy(group, key).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(group).orderBy(F.desc("cnt"), F.asc(key))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(group, key, "cnt")
        .orderBy(group)
    )


def collapse_rare_labels(
    df: DataFrame,
    label_col: str,
    min_count: int,
    other: str = "OTHER",
) -> DataFrame:
    """Rare-category collapse: labels seen fewer than ``min_count``
    times fold into ``other`` — the standard cardinality cap before
    one-hot/target encoding (long-tail categories carry no signal and
    blow up feature width).

    Plan: label hash agg → in-row CASE on the count → second hash agg
    over the collapsed label. Both shuffles key on the label, and the
    second agg's input is one row per DISTINCT original label (already
    cardinality-, not corpus-, sized). Returns (label, n) sorted by
    n desc, label asc.
    """
    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).alias("__c"))
    collapsed = F.when(
        F.col("__c") >= min_count, F.col(label_col)
    ).otherwise(F.lit(other))
    return (
        counts.groupBy(collapsed.alias(label_col))
        .agg(F.sum("__c").alias("n"))
        .orderBy(F.desc("n"), F.asc(label_col))
    )
