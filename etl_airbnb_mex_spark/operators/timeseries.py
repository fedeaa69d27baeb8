"""Time-series / event-window operators (SURVEY.md §2.5 A11–A12, §2.10).

Batch-mode window()/session_window() aggregations are used here — the
identical expressions run under Structured Streaming in
``streaming/windows.py`` with watermarks; batch mode is the
oracle-checkable face of the same operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import month_trunc


def monthly_counts(df: DataFrame, ts_col: str) -> DataFrame:
    """A11 — month truncation + count + sort by month (nb:cell10:26-28).
    Month emitted as a 'yyyy-MM-dd' string for cross-engine hash parity."""
    return (
        df.groupBy(
            F.date_format(month_trunc(ts_col), "yyyy-MM-dd").alias("month")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("month")
    )


def date_range(df: DataFrame, ts_col: str) -> DataFrame:
    """A12 — min/max over a date column (nb:cell10:22-24)."""
    return df.agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("min_ts"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
    )


def tumbling_window_agg(
    df: DataFrame, ts_col: str, duration: str = "1 hour",
    group_cols: list[str] | None = None, value_col: str | None = None,
) -> DataFrame:
    """§2.10 — tumbling event-time window aggregation (batch mode; the
    streaming variant adds withWatermark and runs the same plan)."""
    group_cols = group_cols or []
    aggs = [F.count(F.lit(1)).alias("cnt")]
    if value_col:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), *group_cols)
        .agg(*aggs)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            *group_cols,
            "cnt",
            *(["sum_value"] if value_col else []),
        )
        .orderBy("window_start", *group_cols)
    )


def session_window_agg(
    df: DataFrame, ts_col: str, key: str, gap: str = "30 minutes",
) -> DataFrame:
    """§2.10 — session windows per key with a fixed inactivity gap (batch
    mode). Oracle-expressible via gaps-and-islands SQL (lag + cumulative
    flag sum), which is exactly how the check is written."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            key,
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "cnt",
        )
        .orderBy(key, "session_start")
    )
