"""Set operations (SURVEY.md §2.8 — engine extensions; none in the
reference). Thin, but declared as first-class operators so coverage is
explicit: unionByName (schema-aligned append — the Spark idiom for the
reference's per-collection extract loop S2), intersect, except."""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_by_name(a: DataFrame, b: DataFrame, allow_missing: bool = False) -> DataFrame:
    return a.unionByName(b, allowMissingColumns=allow_missing)


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def split_by_hash(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: int = 2654435761,
) -> DataFrame:
    """Deterministic dataset split (train/val/test) for training-data
    pipelines: bucket = (key · Knuth-multiplier) mod 2³² mod 100, ranges
    assigned by cumulative fraction. Pure integer arithmetic — the same
    row lands in the same split on every run, every engine, every
    partitioning (unlike randomSplit), and rows never move between
    splits when the corpus grows. Adds a ``split`` column.
    """
    from pyspark.sql import functions as F

    # (k·salt) mod 2³² computed without int64 overflow: reduce the key to
    # 32 bits first, then split k = hi·2¹⁶ + lo so every intermediate
    # stays < 2⁴⁹ ((a·c) mod m == ((a mod m)·c) mod m keeps it exact).
    # The naive key*salt wraps silently above key ≈ 3.5e9 in Spark
    # (ANSI off) but *raises* in engines with checked BIGINT arithmetic,
    # breaking the same-split-everywhere guarantee. Negative keys are
    # normalized by pmod, so every engine that lacks pmod can mirror
    # this with ((k % 2³²) + 2³²) % 2³².
    k = F.pmod(F.col(key).cast("long"), F.lit(2 ** 32))
    hi = F.floor(k / F.lit(2 ** 16)).cast("long")
    lo = F.pmod(k, F.lit(2 ** 16))
    h = F.pmod(
        F.pmod(hi * F.lit(salt), F.lit(2 ** 32)) * F.lit(2 ** 16)
        + lo * F.lit(salt),
        F.lit(2 ** 32),
    )
    bucket = F.pmod(h, F.lit(100))
    expr = None
    cum = 0.0
    for name, frac in fractions.items():
        cum += frac
        cond = bucket < F.lit(int(round(cum * 100)))
        expr = (
            F.when(cond, name) if expr is None
            else expr.when(cond, name)
        )
    return df.withColumn("split", expr.otherwise("rest"))


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
