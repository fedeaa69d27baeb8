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


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)
